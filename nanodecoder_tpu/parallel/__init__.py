"""Device mesh, shardings, and multi-host bootstrap.

Reference analog: onmt/utils/distributed.py — the reference's entire
distributed backend is a NCCL gradient all-reduce plus per-GPU process
spawn (SURVEY.md §2.4/§2.5).  TPU-native equivalent: one
`jax.sharding.Mesh` with a `data` axis; weights replicated, the chunk
stream sharded; XLA inserts collectives (psum for grads) from sharding
annotations.  Multi-host runs bootstrap via
`jax.distributed.initialize` and merge per-host FASTQ shards.
"""

from nanodecoder_tpu.parallel.mesh import MeshPlan, make_mesh_plan  # noqa: F401
from nanodecoder_tpu.parallel.multihost import (  # noqa: F401
    initialize_multihost,
    partition_files_for_host,
    host_shard_path,
)
