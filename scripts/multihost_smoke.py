"""Two-process multi-host smoke test on CPU (BASELINE config C5 logic).

Spawns N worker processes that bootstrap jax.distributed on localhost,
partition a synthetic fast5 file list, basecall their shards with a
tiny model, write per-host FASTQ shards, barrier, and merge on host 0.
Validates: initialize_multihost, partition_files_for_host,
host_shard_path, merge_host_shards, cross-process barrier — everything
except real ICI/DCN.

    python scripts/multihost_smoke.py [n_procs]
"""

from __future__ import annotations

import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
from nanodecoder_tpu.config import tiny_test_config
from nanodecoder_tpu.decode.engine import StreamingBasecaller
from nanodecoder_tpu.models.model import init_model
from nanodecoder_tpu.parallel.multihost import (
    initialize_multihost, partition_files_for_host, host_shard_path,
    merge_host_shards, barrier)

pid_arg = int(sys.argv[1]); n_procs = int(sys.argv[2]); workdir = sys.argv[3]
pid, pcount = initialize_multihost(
    coordinator="localhost:%(port)d", num_processes=n_procs, process_id=pid_arg)
assert pcount == n_procs, (pid, pcount)

files = sorted(os.path.join(workdir, f) for f in os.listdir(workdir)
               if f.endswith(".fast5"))
mine = partition_files_for_host(files)
config = tiny_test_config()
params = init_model(jax.random.PRNGKey(0), config.model)
caller = StreamingBasecaller(params, config)
out_path = os.path.join(workdir, "out.fastq")
with open(host_shard_path(out_path), "w") as out:
    meter = caller.run(mine, out)
print(f"host {pid}: {meter.n_reads} reads from {len(mine)} files", flush=True)
barrier("basecall-done")
merge_host_shards(out_path)
barrier("merge-done")
if pid == 0:
    text = open(out_path).read()
    n = text.count("@")
    print(f"host 0: merged FASTQ has {n} records", flush=True)
    assert n == 6, n
"""


def _free_port() -> int:
    import socket

    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    port = _free_port()
    workdir = tempfile.mkdtemp(prefix="mh_smoke_")
    # Build 4 fast5 files x ~1-2 reads = 6 reads total.
    import h5py
    import numpy as np

    sys.path.insert(0, REPO)
    from nanodecoder_tpu.train.data import SimSpec, simulate_read

    spec = SimSpec()
    levels = spec.level_table()
    rng = np.random.default_rng(0)
    rid = 0
    for fi in range(4):
        with h5py.File(os.path.join(workdir, f"f{fi}.fast5"), "w") as f:
            for _ in range(2 if fi < 2 else 1):
                _s, sig = simulate_read(rng, 200, spec, levels)
                raw = f.create_group(f"read_r{rid}/Raw")
                raw.attrs["read_id"] = f"r{rid}".encode()
                raw.create_dataset("Signal", data=(sig * 500).astype(np.int16))
                rid += 1

    code = WORKER % {"repo": REPO, "port": port}
    procs = []
    for i in range(n):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", code, str(i), str(n), workdir],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    ok = True
    for i, p in enumerate(procs):
        out, _ = p.communicate(timeout=600)
        print(f"--- worker {i} (rc={p.returncode}) ---")
        print("\n".join(l for l in out.splitlines() if "WARNING" not in l))
        ok &= p.returncode == 0
    print("MULTIHOST SMOKE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
