"""On-device decoding: greedy + vectorized beam search.

Reference analog: onmt/translate/ — Translator, BeamSearch,
GreedySearch, PenaltyBuilder, TranslationBuilder (SURVEY.md §2.1).

The reference drives one decoder step per Python iteration with a
host<->device round trip per token (SURVEY.md §3.2 — its key
inefficiency).  Here the entire decode loop (embed -> decoder step ->
generator -> search advance -> state reorder) is a single jitted
`lax.while_loop`; the host sees only the final token matrix.
"""

from nanodecoder_tpu.decode.greedy import greedy_decode  # noqa: F401
from nanodecoder_tpu.decode.beam import beam_decode  # noqa: F401
from nanodecoder_tpu.decode.penalties import length_penalty  # noqa: F401
from nanodecoder_tpu.decode.translator import Translator  # noqa: F401
