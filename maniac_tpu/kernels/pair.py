"""Pallas TPU kernel for the per-move pair energy (LJ + real-space Coulomb).

This is the hot kernel of the MC step: the 2-footprint (old/new molecule
geometry) vs all-sites interaction energy, fused end-to-end in VMEM. The
pure-XLA path (physics/energy.py pair_energy_footprint) materializes several
(B, 2, A, S) temporaries per step (eps/sigma gathers, masks, the erfc
argument) - HBM traffic dominates it. Here each replica's program reads its
(3, S) position slab plus small shared tables and writes per-row sums.

Semantics match the XLA path exactly (same formulas as the reference,
src/energy_utils.f90:374-442 ComputePairInteractionEnergy_singlemol):
LJ with hard cutoff, damped Coulomb erfc(alpha r)/r with NO cutoff,
self/excluded-molecule masking, cubic/orthorhombic minimum image.
Triclinic boxes use the XLA path (the 27-image search stays there).

Key design points (see pallas_guide.md):
* positions come in transposed (3, S): lane axis = sites.
* BOTH footprint sides (old+new geometry) are packed into one
  (F = 2*A_act padded to 8, S) tile, so the whole interaction is a single
  full-sublane VPU pass; per-side energies are recovered from per-row sums.
* LJ parameters come from a compact per-(t_old, t_new)-PAIR row table
  (R^2 * F, S) shared by all replicas (broadcast under vmap, lives in VMEM
  once) - the footprint's rows are one aligned dynamic sublane slice, so
  nothing per-replica is ever gathered or materialized in HBM.
* minimum image via precomputed 1/L multipliers (no per-element divides).
* erfc is a relative-accurate f32 rational polynomial; the jax.scipy erfc
  lowering is not Mosaic-friendly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COULOMB_K

_R2_FLOOR = 1e-18

# erfcx(x) = erfc(x) e^{x^2} as a degree-9 polynomial in t = 1/(1+0.3275911x),
# least-squares fitted with relative weighting over x in [0, 9.5]. Evaluated
# in f32: |abs err| <= 3.1e-7, |rel err| <= 4.7e-6 for x < 6 - the same
# error envelope as XLA's own f32 erfc (measured 1.1e-7 / 4.7e-6), so the
# kernel matches the XLA path to f32 working precision.
_ERFCX_COEFFS = (
    0.012273162196727812, -0.21516541498666958, 0.6875869478953509,
    -0.682179947858666, 0.7005920805614151, -0.1166342824345783,
    0.2582313332019003, 0.16879952761358183, 0.18658018822068365,
    -8.372941430156162e-05)


def _erfc(x):
    """Relative-accurate f32 erfc for the VPU (see _ERFCX_COEFFS)."""
    t = 1.0 / (1.0 + 0.3275911 * x)
    acc = _ERFCX_COEFFS[0]
    for c in _ERFCX_COEFFS[1:]:
        acc = acc * t + c
    return acc * jnp.exp(-x * x)


def _pair_kernel(
        idx_ref,         # VMEM (1, 4+R+1) int32: ex_a, ex_b, pair_id, 0, n_mol
        box_ref,         # VMEM (1, 8) f32: invLx invLy invLz Lx Ly Lz alpha rc2
        post_ref,        # VMEM (3, S) replica site positions, transposed
        pt_ref,          # VMEM (3, F) packed footprint positions (old|new)
        qw_ref,          # VMEM (1, F) charge * mask * side-weight
        ljw_ref,         # VMEM (1, F) LJ row mask * side-weight (0/1)
        eps_ref,         # VMEM (R*R*F, S) shared per-type-PAIR LJ eps rows
        sig2_ref,        # VMEM (R*R*F, S) shared per-type-PAIR sigma^2 rows
        site_q_ref,      # VMEM (1, S) shared
        site_mol_ref,    # VMEM (1, S) int32 shared
        site_type_ref,   # VMEM (1, S) int32 shared
        site_midx_ref,   # VMEM (1, S) int32 shared
        out_ref,         # VMEM (F, 2) f32 per-row sums: [:, 0]=lj [:, 1]=coul
        *, R: int, S: int, F: int):
    inv_lx, inv_ly, inv_lz = box_ref[0, 0], box_ref[0, 1], box_ref[0, 2]
    lx, ly, lz = box_ref[0, 3], box_ref[0, 4], box_ref[0, 5]
    alpha, rc2 = box_ref[0, 6], box_ref[0, 7]

    # active-site mask from population counts: site_midx < n_mol[site_type],
    # unrolled over the R residue types (gather-free)
    midx = site_midx_ref[0, :]
    stype = site_type_ref[0, :]
    nsel = jnp.zeros((S,), jnp.int32)
    for r in range(R):
        nsel = jnp.where(stype == r, idx_ref[0, 4 + r], nsel)
    keep = midx < nsel
    smol = site_mol_ref[0, :]
    keep = (keep & (smol != idx_ref[0, 0]) & (smol != idx_ref[0, 1]))[None, :]

    pid = idx_ref[0, 2]
    eps = eps_ref[pl.ds(pid * F, F), :]                     # (F, S)
    sig2 = sig2_ref[pl.ds(pid * F, F), :]

    x = post_ref[0, :][None, :]                             # (1, S)
    y = post_ref[1, :][None, :]
    z = post_ref[2, :][None, :]
    sq = site_q_ref[0, :][None, :]

    px = pt_ref[0, :][:, None]                              # (F, 1)
    py = pt_ref[1, :][:, None]
    pz = pt_ref[2, :][:, None]
    dx = x - px                                             # (F, S)
    dy = y - py
    dz = z - pz
    dx = dx - lx * jnp.round(dx * inv_lx)
    dy = dy - ly * jnp.round(dy * inv_ly)
    dz = dz - lz * jnp.round(dz * inv_lz)
    r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

    inv_r2 = 1.0 / r2
    sr2 = sig2 * inv_r2
    sr6 = sr2 * sr2 * sr2
    lj = 4.0 * eps * (sr6 * sr6 - sr6)
    # select, don't multiply: excluded overlapping pairs have lj = inf
    # and inf * 0 = nan (the XLA path selects for the same reason)
    ljsel = (r2 < rc2) & keep & (ljw_ref[0, :][:, None] > 0.0)
    e_lj = jnp.sum(jnp.where(ljsel, lj, 0.0), axis=1)       # (F,)

    inv_r = jax.lax.rsqrt(r2)
    r = r2 * inv_r
    coul = qw_ref[0, :][:, None] * sq * _erfc(alpha * r) * inv_r
    e_coul = jnp.sum(jnp.where(keep, coul, 0.0), axis=1)    # (F,)

    out_ref[:, :] = jnp.stack([e_lj, e_coul], axis=1)


def pair_footprint_pallas(spec, post, pt, qw, ljw, t_old, t_new,
                          n_mol, ex_a, ex_b, *, interpret=False):
    """Single-replica call (vmap over replicas batches it).

    post: (3, S); pt: (3, F) packed old|new footprint positions; qw/ljw:
    (F,) charge*mask*weight and LJ-mask*weight rows; t_old/t_new: int32
    residue types selecting the LJ pair-row table; n_mol: (R+1,) int32;
    ex_a/ex_b: int32 excluded molecule slots. Returns (e_lj[2], e_coul[2])
    in Kelvin, summed per footprint side.
    """
    S = post.shape[-1]
    F = pt.shape[-1]
    R = spec.R
    A_act = spec.A_act
    f = spec.dtype
    if not interpret:  # CPU has no Mosaic backend; tests force the kernel
        interpret = jax.devices()[0].platform == "cpu"
    pair_id = t_old * R + t_new
    # per-replica scalars ride in full-shape VMEM rows: vmapped pallas_call
    # cannot block scalar SMEM operands
    idx = jnp.concatenate([
        jnp.stack([ex_a, ex_b, pair_id, jnp.zeros((), jnp.int32)]
                  ).astype(jnp.int32),
        n_mol.astype(jnp.int32)]).reshape(1, -1)
    inv_l = 1.0 / spec.box_diag
    box = jnp.concatenate([
        inv_l, spec.box_diag,
        jnp.stack([spec.alpha, spec.cutoff * spec.cutoff])]
    ).astype(f).reshape(1, 8)

    kernel = functools.partial(_pair_kernel, R=R, S=S, F=F)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((F, 2), f),
        in_specs=[vmem] * 12,
        out_specs=vmem,
        interpret=interpret,
    )(idx, box, post, pt.reshape(3, F), qw.reshape(1, F), ljw.reshape(1, F),
      spec.eps_pair_rows, spec.sig2_pair_rows,
      spec.site_q.reshape(1, S), spec.site_mol.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S))
    e_lj = jnp.stack([jnp.sum(out[:A_act, 0]), jnp.sum(out[A_act:, 0])])
    e_coul = jnp.stack([jnp.sum(out[:A_act, 1]),
                        jnp.sum(out[A_act:, 1])]) * COULOMB_K
    return e_lj, e_coul
