"""Two-process multi-host smoke as a pytest (VERDICT r1 item 7 — the
manual scripts/multihost_smoke.py promoted so shard-merge / barrier
regressions fail `pytest tests/`).

Spawns 2 OS processes that bootstrap jax.distributed on localhost,
partition a synthetic fast5 list, basecall per-host shards, barrier,
and merge on host 0 (SURVEY.md §2.5 per-host files + host-0 merge).
"""

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_two_process_shard_merge():
    env = dict(os.environ)
    # The smoke's workers force CPU themselves; keep the parent's env.
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "multihost_smoke.py"), "2"],
        capture_output=True, text=True, timeout=540, env=env,
    )
    assert r.returncode == 0, f"stdout:\n{r.stdout}\nstderr:\n{r.stderr}"
    assert "merged FASTQ has 6 records" in r.stdout, r.stdout
