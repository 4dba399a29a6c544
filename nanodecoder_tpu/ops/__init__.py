"""Pallas TPU kernels — the framework's native-code tier.

The reference has NO native components (pure Python/PyTorch,
SURVEY.md §2.3); the TPU build's equivalents are mandated by the north
star instead: Pallas kernels for the decode-hot-loop attention
(query length 1 against a KV cache) and the fused beam step.
Every kernel has a jnp reference implementation; tests compare the two
in interpreter mode on CPU (SURVEY.md §4 consequence 1).
"""

from nanodecoder_tpu.ops.attention import decode_attention, decode_attention_reference  # noqa: F401
