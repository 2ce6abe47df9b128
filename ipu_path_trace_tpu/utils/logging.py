"""spdlog-style logging (reference: src/logging.hpp, src/main.cpp:71-90).

Pattern mirrors the reference's `[%H:%M:%S.%f] [%L] [%t] %v` and the same
seven CLI-selectable levels.
"""

from __future__ import annotations

import logging
import threading

_LEVELS = {
    "trace": 5,
    "debug": logging.DEBUG,
    "info": logging.INFO,
    "warn": logging.WARNING,
    "err": logging.ERROR,
    "critical": logging.CRITICAL,
    "off": logging.CRITICAL + 10,
}

# Level 5 ("trace") needs a global name; the single-letter rendering of
# the standard levels happens inside _Formatter so embedding applications
# keep their own INFO/WARNING/... level names untouched.
logging.addLevelName(5, "T")
_LETTER = {"TRACE": "T", "T": "T", "DEBUG": "D", "INFO": "I",
           "WARNING": "W", "ERROR": "E", "CRITICAL": "C"}


class _Formatter(logging.Formatter):
    def format(self, record):
        record.tid = threading.get_native_id()
        record.levelname = _LETTER.get(record.levelname, record.levelname[:1])
        return super().format(record)


_logger = logging.getLogger("ipu_path_trace_tpu")
if not _logger.handlers:
    _handler = logging.StreamHandler()
    _handler.setFormatter(
        _Formatter("[%(asctime)s.%(msecs)03d] [%(levelname)s] [%(tid)d] %(message)s", "%H:%M:%S")
    )
    _logger.addHandler(_handler)
    _logger.setLevel(logging.INFO)
    _logger.propagate = False


def logger() -> logging.Logger:
    return _logger


def set_log_level(level: str) -> None:
    """Set one of: trace, debug, info, warn, err, critical, off."""
    if level not in _LEVELS:
        raise ValueError(f"Invalid log-level: '{level}'")
    _logger.setLevel(_LEVELS[level])


def trace(msg, *args):
    _logger.log(5, msg, *args)
