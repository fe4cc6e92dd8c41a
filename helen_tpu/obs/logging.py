"""Structured logging for helen_tpu.

Replaces the reference's TextColor ANSI constants + raw sys.stderr writes
(reference TextColor.py, e.g. CallConsensusInterface.py:94) with a standard
logging-based logger that still renders colored, timestamped lines on a TTY
and plain lines when redirected.
"""
from __future__ import annotations

import logging
import os
import sys
import time

_COLORS = {
    "DEBUG": "\033[90m",
    "INFO": "\033[32m",
    "WARNING": "\033[93m",
    "ERROR": "\033[91m",
    "CRITICAL": "\033[91m",
}
_RESET = "\033[0m"


class _Formatter(logging.Formatter):
    def __init__(self, use_color: bool):
        super().__init__()
        self.use_color = use_color

    def format(self, record: logging.LogRecord) -> str:
        ts = time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(record.created))
        level = record.levelname
        msg = record.getMessage()
        line = f"[{ts}] {level} {record.name}: {msg}"
        if self.use_color and level in _COLORS:
            return f"{_COLORS[level]}{line}{_RESET}"
        return line


_configured = False


def _configure() -> None:
    global _configured
    if _configured:
        return
    handler = logging.StreamHandler(sys.stderr)
    use_color = sys.stderr.isatty() and os.environ.get("NO_COLOR") is None
    handler.setFormatter(_Formatter(use_color))
    root = logging.getLogger("helen_tpu")
    root.addHandler(handler)
    level = os.environ.get("HELEN_TPU_LOG_LEVEL", "INFO").upper()
    try:
        root.setLevel(level)
    except ValueError:
        # a bad env value must not crash every CLI at import time
        root.setLevel(logging.INFO)
        root.warning("unknown HELEN_TPU_LOG_LEVEL=%r; using INFO", level)
    root.propagate = False
    _configured = True


def get_logger(name: str = "helen_tpu") -> logging.Logger:
    _configure()
    if name != "helen_tpu" and not name.startswith("helen_tpu."):
        name = f"helen_tpu.{name}"
    return logging.getLogger(name)


#: module-level convenience logger
log = get_logger()
