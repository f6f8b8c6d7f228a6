"""Global switch: compile hot pipelines with jax.jit or run them eagerly.

On TPU, whole-pipeline jit is essential (eager dispatch would bottleneck the
host).  On this repo's 1-core CPU CI, XLA:CPU takes tens of minutes to
compile prover/pairing-sized graphs while eager execution (whose inner
lax.scan bodies still compile, but stay small) finishes in seconds — so the
default is: jit on TPU backends, eager on CPU.  Override with
GINGERLIB_JIT=1 / GINGERLIB_JIT=0.
"""

from __future__ import annotations

import os


def use_jit() -> bool:
    v = os.environ.get("GINGERLIB_JIT", "auto").lower()
    if v in ("1", "true", "yes", "on"):
        return True
    if v in ("0", "false", "no", "off"):
        return False
    import jax
    return jax.default_backend() != "cpu"


def maybe_jit(fn):
    """jax.jit(fn) when enabled, else fn unchanged."""
    if use_jit():
        import jax
        return jax.jit(fn)
    return fn
