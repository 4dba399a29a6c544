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
    return logging.getLogger(name)
