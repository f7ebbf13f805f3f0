"""Leveled, process-0-gated, ANSI-colored logger.

Parity: reference ``simseg/utils/logger.py:55-139`` — levels
DEBUG/INFO/EMPH/WARNING/ERROR/FATAL, caller ``file:line`` prefix, root-only
default gating, optional rank-0 file sink. On TPU pods the gate is
``jax.process_index() == 0`` instead of torch rank.
"""

from __future__ import annotations

import inspect
import os
import sys
import time
from typing import Any, Optional, TextIO

_LEVELS = {"DEBUG": 10, "INFO": 20, "EMPH": 25, "WARNING": 30, "ERROR": 40, "FATAL": 50}
_COLORS = {
    "DEBUG": "\033[37m",
    "INFO": "",
    "EMPH": "\033[1;32m",
    "WARNING": "\033[1;33m",
    "ERROR": "\033[1;31m",
    "FATAL": "\033[1;41m",
}
_RESET = "\033[0m"


def _process_index() -> int:
    try:
        import jax
        return jax.process_index()
    except Exception:
        return 0


class Logger:
    def __init__(self) -> None:
        self.level = _LEVELS.get(os.environ.get("SIMSEG_LOG_LEVEL", "INFO").upper(), 20)
        self._file: Optional[TextIO] = None
        self._use_color = sys.stdout.isatty()

    def set_level(self, level: str) -> None:
        self.level = _LEVELS[level.upper()]

    def set_file(self, path: str) -> None:
        """Attach a file sink on process 0 (parity: logger.py:41-52)."""
        if _process_index() != 0:
            return
        os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
        self._file = open(path, "a")

    def _caller(self) -> str:
        frame = inspect.currentframe()
        # walk out of logger frames
        for _ in range(3):
            if frame is not None:
                frame = frame.f_back
        if frame is None:
            return "?"
        return f"{os.path.basename(frame.f_code.co_filename)}:{frame.f_lineno}"

    def _log(self, level: str, *args: Any, root_only: bool = True) -> None:
        if _LEVELS[level] < self.level:
            return
        if root_only and _process_index() != 0:
            return
        ts = time.strftime("%Y-%m-%d %H:%M:%S")
        msg = " ".join(str(a) for a in args)
        line = f"[{ts}][{level}][{self._caller()}] {msg}"
        if self._use_color and _COLORS[level]:
            print(f"{_COLORS[level]}{line}{_RESET}", flush=True)
        else:
            print(line, flush=True)
        if self._file is not None:
            self._file.write(line + "\n")
            self._file.flush()

    def debug(self, *args: Any, root_only: bool = True) -> None:
        self._log("DEBUG", *args, root_only=root_only)

    def info(self, *args: Any, root_only: bool = True) -> None:
        self._log("INFO", *args, root_only=root_only)

    def emph(self, *args: Any, root_only: bool = True) -> None:
        self._log("EMPH", *args, root_only=root_only)

    def warning(self, *args: Any, root_only: bool = True) -> None:
        self._log("WARNING", *args, root_only=root_only)

    def error(self, *args: Any, root_only: bool = True) -> None:
        self._log("ERROR", *args, root_only=root_only)

    def fatal(self, *args: Any, root_only: bool = True) -> None:
        self._log("FATAL", *args, root_only=root_only)
        raise SystemExit(1)


logger = Logger()
