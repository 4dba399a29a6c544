"""Target vocabulary for basecalling.

The reference (an OpenNMT-py derivative, SURVEY.md §2.2) uses torchtext
Fields with a target vocab of the 4 DNA bases plus specials
(<blank>/pad, <s>, </s>, <unk>).  There is no source vocab: the source
side is continuous signal, embedded by the conv front-end.

We keep the same logical alphabet but fix the id layout statically —
the vocab is tiny and static, so there is nothing to "build" at
preprocess time.  Layout (PAD=0 matters: padded targets contribute zero
loss; BOS/EOS drive the decode loop):

    0 <pad>   1 <s>(BOS)   2 </s>(EOS)   3 <unk>   4 A   5 C   6 G   7 T

Vocab size 8 pads naturally into a single VPU lane group; the beam
topk width is beam*8 (SURVEY.md §2.2 notes this shapes the fused beam
kernel).
"""

from __future__ import annotations

import dataclasses

import numpy as np

PAD_ID = 0
BOS_ID = 1
EOS_ID = 2
UNK_ID = 3
BASES = "ACGT"


@dataclasses.dataclass(frozen=True)
class Vocab:
    """Static token<->id mapping for the basecaller target side."""

    itos: tuple[str, ...] = ("<pad>", "<s>", "</s>", "<unk>", "A", "C", "G", "T")

    @property
    def size(self) -> int:
        return len(self.itos)

    @property
    def stoi(self) -> dict[str, int]:
        return {s: i for i, s in enumerate(self.itos)}

    def encode(self, seq: str, add_bos: bool = False, add_eos: bool = False) -> np.ndarray:
        """Base string -> int32 ids (unknown chars -> <unk>)."""
        table = self.stoi
        ids = [table.get(c, UNK_ID) for c in seq.upper()]
        if add_bos:
            ids = [BOS_ID] + ids
        if add_eos:
            ids = ids + [EOS_ID]
        return np.asarray(ids, dtype=np.int32)

    def decode(self, ids) -> str:
        """Int ids -> base string.  Stops at EOS; skips PAD/BOS/UNK."""
        out = []
        for i in np.asarray(ids).reshape(-1):
            i = int(i)
            if i == EOS_ID:
                break
            if i in (PAD_ID, BOS_ID, UNK_ID):
                continue
            out.append(self.itos[i])
        return "".join(out)


DNA_VOCAB = Vocab()
