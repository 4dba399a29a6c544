"""Multi-host bootstrap + per-host work partitioning.

Reference analog (SURVEY.md §2.5): torch.distributed NCCL process
groups with -master_ip/-master_port rendezvous.  TPU-native: one
`jax.distributed.initialize()` call; the runtime wires ICI within a
slice and DCN across hosts.  Inference work is share-nothing: each host
statically owns a slice of the fast5 file list and writes its own
FASTQ shard; host 0 merges (SURVEY.md §2.5 — per-host files + final
concat is the chosen design).
"""

from __future__ import annotations

import os

import jax

from nanodecoder_tpu.utils.logging import get_logger

log = get_logger("multihost")


def initialize_multihost(coordinator: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> tuple[int, int]:
    """Initialize jax.distributed when running multi-process.

    With TPU pod metadata present, jax.distributed.initialize() needs no
    arguments; explicit args support manual bring-up.  Safe to call in
    single-process runs (no-op).  Returns (process_index, process_count).
    """
    want_init = (
        coordinator is not None
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
        or os.environ.get("MEGASCALE_COORDINATOR_ADDRESS")
        or (num_processes or 0) > 1
    )
    # NB: do NOT touch jax.process_count()/jax.devices() before
    # initialize() — any backend-initializing call makes it too late.
    if want_init:
        kwargs = {}
        if coordinator:
            kwargs["coordinator_address"] = coordinator
        if num_processes:
            kwargs["num_processes"] = num_processes
        if process_id is not None:
            kwargs["process_id"] = process_id
        try:
            jax.distributed.initialize(**kwargs)
        except RuntimeError as e:  # already initialized (e.g. re-entry)
            if "already" not in str(e):
                raise
    pid, pcount = jax.process_index(), jax.process_count()
    log.info("process %d / %d, %d local / %d global devices",
             pid, pcount, jax.local_device_count(), jax.device_count())
    return pid, pcount


def partition_files_for_host(files: list[str],
                             process_index: int | None = None,
                             process_count: int | None = None) -> list[str]:
    """Static strided partition of the (sorted) input file list — every
    host basecalls a disjoint subset; deterministic given the list."""
    pid = jax.process_index() if process_index is None else process_index
    pcount = jax.process_count() if process_count is None else process_count
    return files[pid::pcount]


def host_shard_path(out_path: str, process_index: int | None = None) -> str:
    """Per-host output shard name: out.fastq -> out.fastq.shard00003."""
    pid = jax.process_index() if process_index is None else process_index
    return f"{out_path}.shard{pid:05d}"


def merge_host_shards(out_path: str, process_count: int | None = None) -> None:
    """Host 0 concatenates all shards into `out_path` (call after a
    cross-host barrier, e.g. a tiny psum or blocking collective)."""
    from nanodecoder_tpu.io.fastx import merge_fastx_shards

    if jax.process_index() != 0:
        return
    pcount = jax.process_count() if process_count is None else process_count
    shards = [host_shard_path(out_path, i) for i in range(pcount)]
    shards = [s for s in shards if os.path.exists(s)]
    merge_fastx_shards(shards, out_path, delete_shards=True)
    log.info("merged %d shards -> %s", len(shards), out_path)


def barrier(name: str = "barrier") -> None:
    """Cross-process barrier via a tiny all-reduce (works on any mesh)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
