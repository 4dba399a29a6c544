"""Model zoo: encoders, decoders, shared modules — functional JAX pytrees.

Reference analog: onmt/encoders, onmt/decoders, onmt/modules,
onmt/models, onmt/model_builder (SURVEY.md §2.1).  Re-designed for XLA:
params are plain nested-dict pytrees, every apply function is pure and
jit-friendly, and the decoder exposes an explicit incremental-step API
(KV cache in, KV cache out) so the whole decode loop can live inside
one `lax.while_loop` on device (SURVEY.md §3.2).
"""

from nanodecoder_tpu.models.model import (  # noqa: F401
    init_model,
    encode,
    decode_step,
    decode_teacher_forced,
    init_decode_state,
)
