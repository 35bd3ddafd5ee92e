"""Device-side (jax) periodic-boundary helpers.

Counterparts of the host numpy routines in maniac_tpu.geometry; semantics
match the reference (src/geometry_utils.f90:167-220 ApplyPBC, :359-415
ComputeDistance). The box kind is trace-time static (from SystemSpec), so XLA
compiles only the relevant branch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..geometry import CUBIC, ORTHORHOMBIC


def wrap_into_box(pos, spec):
    """Wrap cartesian position(s) (...,3) into [lo, lo+L)."""
    lo = spec.bounds[:, 0]
    if not spec.is_triclinic:
        return lo + jnp.mod(pos - lo, spec.box_diag)
    frac = (pos - lo) @ spec.Hinv.T
    frac = jnp.mod(frac, 1.0)
    return lo + frac @ spec.H.T


def min_image_dist2(delta, spec):
    """Squared minimum-image distance; delta shape (...,3) -> (...)."""
    if spec.box_kind in (CUBIC, ORTHORHOMBIC):
        L = spec.box_diag
        d = delta - L * jnp.round(delta / L)
        return jnp.sum(d * d, axis=-1)
    # triclinic: brute-force 27-image search (reference behaviour)
    trial = delta[..., None, :] + spec.image_shifts  # (...,27,3)
    return jnp.min(jnp.sum(trial * trial, axis=-1), axis=-1)
