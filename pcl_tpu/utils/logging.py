"""Leveled console logging (reference: common/include/pcl/console/print.h:74-125).

PCL exposes PCL_ERROR/WARN/INFO/DEBUG printf macros with a global verbosity
level; we map onto Python's logging with one shared logger namespace.
"""

from __future__ import annotations

import logging
import os

_ROOT = "pcl_tpu"

_LEVELS = {
    "ALWAYS": logging.CRITICAL,
    "ERROR": logging.ERROR,
    "WARN": logging.WARNING,
    "INFO": logging.INFO,
    "DEBUG": logging.DEBUG,
    "VERBOSE": 5,
}


def get_logger(name: str = "") -> logging.Logger:
    full = f"{_ROOT}.{name}" if name else _ROOT
    return logging.getLogger(full)


def set_verbosity(level: str) -> None:
    """Set global verbosity (reference: pcl::console::setVerbosityLevel)."""
    logging.getLogger(_ROOT).setLevel(_LEVELS[level.upper()])


def _init() -> None:
    logger = logging.getLogger(_ROOT)
    if not logger.handlers:
        handler = logging.StreamHandler()
        handler.setFormatter(logging.Formatter("[%(name)s %(levelname)s] %(message)s"))
        logger.addHandler(handler)
    logger.setLevel(_LEVELS.get(os.environ.get("PCL_TPU_VERBOSITY", "WARN").upper(), logging.WARNING))


_init()
