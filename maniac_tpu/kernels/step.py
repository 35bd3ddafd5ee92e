"""Fused Pallas TPU kernel for the whole MC trial step's device-heavy core.

One program per replica computes, entirely in VMEM:
  1. pair energies (LJ + no-cutoff erfc Coulomb) of the packed old|new
     footprint vs all sites - the reference's hot loop
     (src/energy_utils.f90:374-442),
  2. the structure-factor delta dA(k) on the 2-D dense grid via per-axis
     phase power tables + two static expansion matmuls + one
     (JzP, F)@(F, JxyP) MXU contraction (dA never touches HBM),
  3. the reciprocal cross-energy, total dE and the Metropolis decision
     (src/monte_carlo_utils.f90:184-226),
  4. the conditional commits: amplitudes += accf * dA and the moved
     molecule's site positions, written in place via output aliasing.

HBM traffic per replica per step is just pos (3,S) + amp 2x(JzP,JxyP)
read+write plus shared tables; the XLA glue around it only prepares the
footprint (small one-hot matmuls) and folds the scalar bookkeeping.

Semantics are identical to the XLA path in mc/moves.py + physics/energy.py
(which remains the CPU / float64 / triclinic oracle; parity is pinned by
tests/test_kernels.py in interpret mode).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COULOMB_K, TWOPI

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


def _powers(c, s, n):
    """Complex phase powers e^{i j theta}, j=0..n, from cos/sin rows (1,F).
    Returns two lists of (1, F) rows."""
    re = [jnp.ones_like(c)]
    im = [jnp.zeros_like(s)]
    for _ in range(n):
        r_new = re[-1] * c - im[-1] * s
        i_new = re[-1] * s + im[-1] * c
        re.append(r_new)
        im.append(i_new)
    return re, im


def _signed_table(re, im, k, pad_to=None):
    """(J, F) table over signed index j=-k..k (conjugates for j<0), rows
    stacked along sublanes; optionally zero-padded to pad_to rows."""
    rows_re = [re[j] for j in range(k, 0, -1)] + re
    rows_im = [-im[j] for j in range(k, 0, -1)] + im
    t_re = jnp.concatenate(rows_re, axis=0)
    t_im = jnp.concatenate(rows_im, axis=0)
    if pad_to is not None and pad_to > 2 * k + 1:
        z = jnp.zeros((pad_to - 2 * k - 1, t_re.shape[1]), t_re.dtype)
        t_re = jnp.concatenate([t_re, z], axis=0)
        t_im = jnp.concatenate([t_im, z], axis=0)
    return t_re, t_im


def _dotT(a, b):
    """(J, F) x (J, G) -> (F, G), contracting the leading dim (MXU)."""
    return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                               preferred_element_type=a.dtype)


def _step_kernel(
        iscal_ref,       # VMEM (1, W) int32: ex_a, ex_b, pair_id, start_new,
                         #   start_old, A_new, A_old, w_new, remove, n_mol...
        fscal_ref,       # VMEM (1, 8) f32: e_rest_old, e_rest_new,
                         #   e_recip_old, pref, u_acc, gate, 0, 0
        pt_ref,          # VMEM (3, F) packed footprint positions (old|new)
        qw_ref,          # VMEM (1, F) charge * mask * side-weight (Coulomb)
        ljw_ref,         # VMEM (1, F) LJ row mask * side-weight (0/1)
        wk_ref,          # VMEM (1, F) k-delta weights q*mask*(-w_old|+w_new)
        last_ref,        # VMEM (3, A_act) compaction source columns
        const_ref,       # VMEM (1, 16) f32 shared: invL(3) L(3) alpha rc2
                         #   coulomb_k inv_T c2piv ...
        h2pi_ref,        # VMEM (3, 3) shared: theta = h2pi @ r
        ex_ref,          # VMEM (Jx, JxyP) shared 0/1 jx expansion
        ey_ref,          # VMEM (Jy, JxyP) shared 0/1 jy expansion
        kw_ref,          # VMEM (JzP, JxyP) shared recip weights
        eps_ref,         # VMEM (R*R*F, S) shared LJ pair-row table
        sig2_ref,        # VMEM (R*R*F, S) shared
        site_q_ref,      # VMEM (1, S) shared
        site_mol_ref,    # VMEM (1, S) int32 shared
        site_type_ref,   # VMEM (1, S) int32 shared
        site_midx_ref,   # VMEM (1, S) int32 shared
        amp_re_ref,      # VMEM (JzP, JxyP)  [aliased to output 0]
        amp_im_ref,      # VMEM (JzP, JxyP)  [aliased to output 1]
        pos_ref,         # VMEM (3, S)       [aliased to output 2]
        amp_re_out, amp_im_out, pos_out,
        flags_out,       # VMEM (1, 8) f32: accf, e_recip_new, delta_e,
                         #   e_lj0, e_lj1, e_c0, e_c1, p_acc
        *, R: int, S: int, F: int, A_act: int,
        kx: int, ky: int, kz: int, JzP: int, ablate: str = ""):
    f32 = amp_re_ref.dtype
    inv_lx, inv_ly, inv_lz = const_ref[0, 0], const_ref[0, 1], const_ref[0, 2]
    lx, ly, lz = const_ref[0, 3], const_ref[0, 4], const_ref[0, 5]
    alpha, rc2 = const_ref[0, 6], const_ref[0, 7]
    coulomb_k, inv_t, c2piv = (const_ref[0, 8], const_ref[0, 9],
                               const_ref[0, 10])

    skip_pair = "pair" in ablate
    skip_kspace = "kspace" in ablate
    skip_pos = "pos" in ablate
    # ---- 1. pair energies (packed (F, S) pass) --------------------------
    midx = site_midx_ref[0, :]
    stype = site_type_ref[0, :]
    nsel = jnp.zeros((S,), jnp.int32)
    for r in range(R):
        nsel = jnp.where(stype == r, iscal_ref[0, 9 + r], nsel)
    keep = midx < nsel
    smol = site_mol_ref[0, :]
    keep = (keep & (smol != iscal_ref[0, 0])
            & (smol != iscal_ref[0, 1]))[None, :]

    pid = iscal_ref[0, 2]
    if "smalltbl" in ablate:
        eps = eps_ref[pl.ds(0, F), :]
        sig2 = sig2_ref[pl.ds(0, F), :]
    else:
        eps = eps_ref[pl.ds(pid * F, F), :]                 # (F, S)
        sig2 = sig2_ref[pl.ds(pid * F, F), :]

    x = pos_ref[0, :][None, :]                              # (1, S)
    y = pos_ref[1, :][None, :]
    z = pos_ref[2, :][None, :]
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
    if skip_pair:
        lj = sr2
    # select, don't multiply: excluded overlapping pairs have lj = inf and
    # inf * 0 = nan (the XLA path selects for the same reason)
    ljsel = (r2 < rc2) & keep & (ljw_ref[0, :][:, None] > 0.0)
    lj_rows = jnp.sum(jnp.where(ljsel, lj, 0.0), axis=1,
                      keepdims=True)                        # (F, 1)

    inv_r = jax.lax.rsqrt(r2)
    rr = r2 * inv_r
    if skip_pair:  # ablation: skip the transcendental-heavy Coulomb factor
        coul = qw_ref[0, :][:, None] * sq * inv_r
    else:
        coul = qw_ref[0, :][:, None] * sq * _erfc(alpha * rr) * inv_r
    c_rows = jnp.sum(jnp.where(keep, coul, 0.0), axis=1,
                     keepdims=True)                         # (F, 1)

    # per-side sums via static row masks (1-D slices trip Mosaic relayouts)
    fi = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    m_old_side = (fi < A_act).astype(lj_rows.dtype)
    m_new_side = 1.0 - m_old_side
    e_lj0 = jnp.sum(lj_rows * m_old_side)
    e_lj1 = jnp.sum(lj_rows * m_new_side)
    e_c0 = jnp.sum(c_rows * m_old_side) * coulomb_k
    e_c1 = jnp.sum(c_rows * m_new_side) * coulomb_k

    # ---- 2. structure-factor delta on the dense grid --------------------
    # Small MXU matmuls are latency-bound, so the complex arithmetic is
    # packed: one expansion matmul per axis ((J, 2F) operands carry re|im
    # stacked along F) and ONE (JzP, 2F)@(2F, 2*JxyP) contraction producing
    # d_re | d_im side by side.
    th = jnp.dot(h2pi_ref[:, :], pt_ref[:, :],
                 preferred_element_type=f32)                # (3, F)
    if skip_kspace:
        th = th * 0.0
    cxs = jnp.cos(th)
    sxs = jnp.sin(th)
    rex, imx = _powers(cxs[0:1, :], sxs[0:1, :], kx)
    rey, imy = _powers(cxs[1:2, :], sxs[1:2, :], ky)
    rez, imz = _powers(cxs[2:3, :], sxs[2:3, :], kz)
    pxT = jnp.concatenate([jnp.concatenate(rex, axis=0),
                           jnp.concatenate(imx, axis=0)], axis=1)  # (Jx, 2F)
    pyT_re, pyT_im = _signed_table(rey, imy, ky)            # (Jy, F)
    pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)         # (Jy, 2F)
    pzT_re, pzT_im = _signed_table(rez, imz, kz, pad_to=JzP)  # (JzP, F)
    pzT = jnp.concatenate([pzT_re, pzT_im], axis=1)         # (JzP, 2F)

    xe = _dotT(pxT, ex_ref[:, :])                           # (2F, JxyP)
    ye = _dotT(pyT, ey_ref[:, :])
    xe_re, xe_im = xe[:F, :], xe[F:, :]
    ye_re, ye_im = ye[:F, :], ye[F:, :]
    wkc = wk_ref[0, :][:, None]                             # (F, 1)
    t_re = (xe_re * ye_re - xe_im * ye_im) * wkc
    t_im = (xe_re * ye_im + xe_im * ye_re) * wkc
    # [t_re | t_im; -t_im | t_re] (2F, 2*JxyP): one matmul yields d_re|d_im
    t_both = jnp.concatenate(
        [jnp.concatenate([t_re, t_im], axis=1),
         jnp.concatenate([-t_im, t_re], axis=1)], axis=0)
    d_both = jnp.dot(pzT, t_both, preferred_element_type=f32)
    JXY = t_re.shape[1]
    d_re = d_both[:, :JXY]
    d_im = d_both[:, JXY:]

    # ---- 3. dE + Metropolis ---------------------------------------------
    ar = amp_re_ref[:, :]
    ai = amp_im_ref[:, :]
    kw = kw_ref[:, :]
    cross = jnp.sum(kw * (2.0 * (ar * d_re + ai * d_im)
                          + d_re * d_re + d_im * d_im))
    e_recip_old = fscal_ref[0, 2]
    e_recip_new = e_recip_old + cross * c2piv
    delta_e = (fscal_ref[0, 1] + e_lj1 + e_c1 + e_recip_new
               - fscal_ref[0, 0] - e_lj0 - e_c0 - e_recip_old)

    p_acc = jnp.minimum(1.0, fscal_ref[0, 3] * jnp.exp(-delta_e * inv_t))
    acc = (fscal_ref[0, 5] > 0.0) & (fscal_ref[0, 4] <= p_acc)
    accf = acc.astype(f32)

    # ---- 4. commits -------------------------------------------------------
    amp_re_out[:, :] = ar + accf * d_re
    amp_im_out[:, :] = ai + accf * d_im

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
    start_new = iscal_ref[0, 3]
    start_old = iscal_ref[0, 4]
    A_new = iscal_ref[0, 5]
    A_old = iscal_ref[0, 6]
    do_write = acc & (iscal_ref[0, 7] > 0)
    do_compact = acc & (iscal_ref[0, 8] > 0)
    rel_new = s_idx - start_new
    rel_old = s_idx - start_old
    in_new = do_write & (rel_new >= 0) & (rel_new < A_new)
    in_old = do_compact & (rel_old >= 0) & (rel_old < A_old)

    out = pos_ref[:, :]
    if skip_pos:
        in_new = in_new & (s_idx < 0)
        in_old = in_old & (s_idx < 0)
    for a in range(A_act):
        sel_old = ((rel_old == a) & in_old)[None, :]
        out = jnp.where(sel_old, last_ref[:, a][:, None], out)
    for a in range(A_act):
        # new molecule columns live in the packed footprint's second half
        sel_new = ((rel_new == a) & in_new)[None, :]
        out = jnp.where(sel_new, pt_ref[:, A_act + a][:, None], out)
    pos_out[:, :] = out

    zero = jnp.zeros((), f32)
    flags_out[0, :] = jnp.stack([accf, e_recip_new, delta_e,
                                 e_lj0, e_lj1, e_c0, e_c1, p_acc])


def mc_step_core_pallas(spec, pos, amp_re, amp_im, n_mol,
                        pt_pack, qw_pack, ljw_pack, wk_pack, last_cols,
                        t_old, t_new, ex_a, ex_b,
                        site_start_new, site_start_old, A_new, A_old,
                        w_new, remove_like,
                        e_rest_old, e_rest_new, e_recip_old, pref, u_acc,
                        gate, *, interpret=False):
    """Single-replica fused step core (vmap batches it). Returns
    (amp_re', amp_im', pos', accf, e_recip_new, delta_e,
     e_lj[2], e_coul[2])."""
    JzP, JxyP = spec.amp_shape
    S = pos.shape[-1]
    F = pt_pack.shape[-1]
    A_act = spec.A_act
    R = spec.R
    kx, ky, kz = spec.kmax_xyz
    f = spec.dtype
    if not interpret:  # CPU has no Mosaic backend; tests force the kernel
        interpret = jax.devices()[0].platform == "cpu"

    W = 9 + R + 1
    iscal = jnp.concatenate([
        jnp.stack([ex_a, ex_b, t_old * R + t_new, site_start_new,
                   site_start_old, A_new, A_old,
                   w_new.astype(jnp.int32), remove_like.astype(jnp.int32)]),
        n_mol]).astype(jnp.int32).reshape(1, W)
    fscal = jnp.stack([
        e_rest_old, e_rest_new, e_recip_old, pref, u_acc,
        jnp.where(gate, 1.0, 0.0), jnp.zeros((), f), jnp.zeros((), f),
    ]).astype(f).reshape(1, 8)
    consts = jnp.concatenate([
        1.0 / spec.box_diag, spec.box_diag,
        jnp.stack([spec.alpha, spec.cutoff * spec.cutoff,
                   jnp.asarray(COULOMB_K, f), 1.0 / spec.temp_K,
                   COULOMB_K * TWOPI / spec.volume]),
        jnp.zeros(5, f)]).astype(f).reshape(1, 16)

    import os
    kernel = functools.partial(
        _step_kernel, R=R, S=S, F=F, A_act=A_act,
        kx=kx, ky=ky, kz=kz, JzP=JzP,
        ablate=os.environ.get("MANIAC_KABLATE", ""))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re2, amp_im2, pos2, flags = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((3, S), f),
                   jax.ShapeDtypeStruct((1, 8), f)),
        in_specs=[vmem] * 21,
        out_specs=(vmem, vmem, vmem, vmem),
        input_output_aliases={18: 0, 19: 1, 20: 2},
        interpret=interpret,
    )(iscal, fscal, pt_pack, qw_pack.reshape(1, F), ljw_pack.reshape(1, F),
      wk_pack.reshape(1, F), last_cols, consts, spec.two_pi_Hinv,
      spec.ex_sel, spec.ey_sel, spec.k_weights,
      (spec.eps_pair_rows[:F] if "smalltbl" in os.environ.get(
          "MANIAC_KABLATE", "") else spec.eps_pair_rows),
      (spec.sig2_pair_rows[:F] if "smalltbl" in os.environ.get(
          "MANIAC_KABLATE", "") else spec.sig2_pair_rows),
      spec.site_q.reshape(1, S), spec.site_mol.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S),
      amp_re, amp_im, pos)
    e_lj = jnp.stack([flags[0, 3], flags[0, 4]])
    e_coul = jnp.stack([flags[0, 5], flags[0, 6]])
    return (amp_re2, amp_im2, pos2, flags[0, 0], flags[0, 1], flags[0, 2],
            e_lj, e_coul)
