"""Leveled logging (print.hpp:21-67 parity).

The reference ships four stdout printers: `PrintInfo`, `PrintDebug`
(compiled out unless a debug build), `PrintWarning`,
`PrintAndThrowError` (raises), and `PrintSynced` (mutex-guarded for
thread pools).  The TPU build keeps the same tiers as runtime-switchable
functions; `MIMI_TPU_LOG` (debug|info|warning|error) or `set_level`
select the threshold — default "info", so `print_debug` is silent like
the reference's NDEBUG build.
"""

from __future__ import annotations

import os
import sys
import threading

_LEVELS = {"debug": 10, "info": 20, "warning": 30, "error": 40}
_level = _LEVELS.get(
    os.environ.get("MIMI_TPU_LOG", "info").lower(), 20
)
_lock = threading.Lock()


def set_level(name: str) -> None:
    global _level
    try:
        _level = _LEVELS[name.lower()]
    except KeyError:
        raise ValueError(
            f"unknown log level {name!r}; one of {sorted(_LEVELS)}"
        ) from None


def get_level() -> str:
    for k, v in _LEVELS.items():
        if v == _level:
            return k
    return str(_level)


def _emit(tag, args, stream=None):
    print("mimi -", *args, file=stream or sys.stdout, flush=True)


def print_info(*args) -> None:
    """PrintInfo (print.hpp:21-27)."""
    if _level <= 20:
        _emit("info", args)


def print_debug(*args) -> None:
    """PrintDebug (print.hpp:30-38; NDEBUG-gated in the reference —
    here gated on the 'debug' level)."""
    if _level <= 10:
        _emit("debug", args)


def print_warning(*args) -> None:
    """PrintWarning (print.hpp:41-46): always tagged, stderr."""
    if _level <= 30:
        with _lock:
            print(
                "mimi - WARNING -", *args, file=sys.stderr, flush=True
            )


def print_and_throw_error(*args):
    """PrintAndThrowError (print.hpp:48-55): raises RuntimeError with
    the same message it prints."""
    msg = " ".join(str(a) for a in args)
    with _lock:
        print("mimi - ERROR -", msg, file=sys.stderr, flush=True)
    raise RuntimeError(msg)


def print_synced(*args) -> None:
    """PrintSynced (print.hpp:58-67): lock-guarded (the reference uses
    it from thread pools; host-side threads here)."""
    if _level <= 20:
        with _lock:
            _emit("synced", args)
