"""Tracing hooks — the NVTX analog (``include/internal/nvtx.h:31-56``).

Every public op wraps its body in a named trace range so that
``jax.profiler`` traces (and the XLA HLO itself, via ``jax.named_scope``)
show the library's operations by name, mirroring the reference's
hash-colored NVTX ranges around every public op and comm call.
Disabled (no-op) via ``CUDECOMP_TPU_DISABLE_TRACING=1``.
"""

from __future__ import annotations

import contextlib
import os

import jax

_DISABLED = os.environ.get("CUDECOMP_TPU_DISABLE_TRACING", "0") == "1"


@contextlib.contextmanager
def trace_range(name: str):
    """Named scope visible in HLO and profiler traces."""
    if _DISABLED:
        yield
        return
    with jax.named_scope(name), jax.profiler.TraceAnnotation(name):
        yield
