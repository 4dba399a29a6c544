"""Logging setup (reference analog: onmt/utils/logging.py)."""

from __future__ import annotations

import logging
import sys

_FORMAT = "[%(asctime)s %(levelname)s %(name)s] %(message)s"
_configured = False


def get_logger(name: str = "nanodecoder_tpu", level: int = logging.INFO) -> logging.Logger:
    global _configured
    if not _configured:
        handler = logging.StreamHandler(sys.stderr)
        handler.setFormatter(logging.Formatter(_FORMAT, datefmt="%H:%M:%S"))
        root = logging.getLogger("nanodecoder_tpu")
        root.addHandler(handler)
        root.setLevel(level)
        root.propagate = False
        _configured = True
    # Parent every logger under the package hierarchy so the single
    # handler applies (a bare name would propagate to the python root,
    # which drops INFO records).
    if not name.startswith("nanodecoder_tpu"):
        name = f"nanodecoder_tpu.{name}"
    return logging.getLogger(name)
