"""Pallas TPU kernels for the hot paths (SURVEY.md section 7 stage 7).

The XLA implementations in maniac_tpu.physics remain the reference/oracle
path (and the only path on CPU and for triclinic boxes); kernels here are
drop-in TPU replacements selected at trace time. Set MANIAC_PALLAS=0/1 to
force the choice (default: auto - Pallas on non-CPU backends for f32
orthogonal boxes).
"""

from __future__ import annotations

import os


def use_pair_kernel(spec) -> bool:
    """Trace-time dispatch for the Pallas pair-energy kernel."""
    mode = os.environ.get("MANIAC_PALLAS", "auto")
    if mode == "0":
        return False
    if spec.is_triclinic or spec.dtype_name != "float32":
        return False  # XLA path: 27-image search / f64 precision oracle
    if mode == "1":
        return True
    import jax
    return jax.devices()[0].platform != "cpu"
