"""Structured logging factory (reference C5, ``src/utils/logging.py:4-15``):
idempotent stdout logger with a pipe-delimited structured format, no
propagation (keeps Spark's own log4j noise separate).
"""

from __future__ import annotations

import logging
import sys

_FORMAT = "%(asctime)s | %(levelname)s | %(name)s | %(message)s"


def get_logger(name: str | None = None, level: str = "INFO") -> logging.Logger:
    logger = logging.getLogger(name or __name__)
    if logger.handlers:
        return logger
    logger.setLevel(level.upper())
    handler = logging.StreamHandler(sys.stdout)
    handler.setFormatter(logging.Formatter(_FORMAT))
    logger.addHandler(handler)
    logger.propagate = False
    return logger
