"""Hierarchical wall-clock tracing (bench-utils/src/lib.rs:19-148).

Same nested-indent style as the reference's start_timer!/end_timer! macros;
enabled via GINGER_PRINT_TRACE=1 (the reference gates on the `print-trace`
cargo feature).  ``jax.profiler`` integration is provided for device traces.
"""

from __future__ import annotations

import os
import time
from contextlib import contextmanager

_ENABLED = os.environ.get("GINGER_PRINT_TRACE", "0") not in ("0", "", "false")
_depth = 0


class _Timer:
    __slots__ = ("msg", "t0")

    def __init__(self, msg):
        self.msg = msg
        self.t0 = time.perf_counter()


def start_timer(msg: str) -> _Timer:
    global _depth
    if _ENABLED:
        print("  " * _depth + f"Start: {msg}", flush=True)
        _depth += 1
    return _Timer(msg)


def end_timer(t: _Timer, extra: str = ""):
    global _depth
    dt = time.perf_counter() - t.t0
    if _ENABLED:
        _depth = max(0, _depth - 1)
        suffix = f" [{extra}]" if extra else ""
        print("  " * _depth + f"End:   {t.msg}{suffix} "
              f"...........{dt * 1e3:.3f}ms", flush=True)
    return dt


def add_to_trace(msg: str):
    if _ENABLED:
        print("  " * _depth + f"Trace: {msg}", flush=True)


@contextmanager
def timer(msg: str):
    t = start_timer(msg)
    try:
        yield t
    finally:
        end_timer(t)


@contextmanager
def device_trace(log_dir: str = "/tmp/gingerlib_trace"):
    """Capture a jax.profiler device trace (TensorBoard format) around a
    block — the TPU-native upgrade of the reference's wall-clock-only
    tracing.  View with `tensorboard --logdir <log_dir>`."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
