"""Grouped Pallas step core: G replicas per program + LJ/Coulomb row
compaction.

The per-replica kernel (kernels/step.py) computes LJ AND Coulomb formulas
on every footprint row of an (F_pack, S) tile, but most atoms carry only
one of the two (TIP4P water: 1 LJ site, 3 charged sites), and shrinking
rows below 8 buys nothing at the VPU's (8, 128) tile granularity. Batching
G replicas per program makes compaction pay: this kernel runs

  * one LJ pass over (G * 2*Lmax, S) rows (eps-active atoms only),
  * one Coulomb pass over (G * 2*Qmax, S) rows (charged atoms only),
  * per-replica k-space delta + Metropolis + in-place commits.

All pair work is plain 2-D (rows, S) vector code - the replica-expanded
site rows are materialized with sublane broadcasts (rank-3 broadcast forms
compile to slower Mosaic code and hit relayout failures on lane
reductions).

Same physics as kernels/step.py / mc/moves.py (the XLA path remains the
oracle; parity is pinned in tests/test_kernels.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COULOMB_K, TWOPI
from .step import _erfc, _powers, _signed_table

_R2_FLOOR = 1e-18


def _stepg_kernel(
        iscal_ref,       # VMEM (G, W) int32: ex_a, ex_b, pid, start_new,
                         #   start_old, A_new, A_old, w_new, remove, n_mol..
        fscal_ref,       # VMEM (G, 8) f32: e_rest_old, e_rest_new,
                         #   e_recip_old, pref, u_acc, gate, 0, 0
        ptlj_ref,        # VMEM (3, G*FL) LJ-row positions, g-major
        ljw_ref,         # VMEM (1, G*FL) LJ row mask * side-weight
        ptq_ref,         # VMEM (3, G*FQ) charged-row positions, g-major
        qw_ref,          # VMEM (1, G*FQ) charge * mask * side-weight
        wk_ref,          # VMEM (1, G*FQ) k-delta weights (signed)
        newcols_ref,     # VMEM (3, G*A_act) P_new columns per replica
        lastcols_ref,    # VMEM (3, G*A_act) compaction columns per replica
        const_ref,       # VMEM (1, 16) f32 shared: invL L alpha rc2 ck invT c2piv
        h2pi_ref,        # VMEM (3, 3) shared
        ex_ref, ey_ref,  # VMEM expansions, shared
        kw_ref,          # VMEM (JzP, JxyP) shared
        epslj_ref,       # VMEM (R*R*8, S) shared compacted LJ rows
        sig2lj_ref,      # VMEM (R*R*8, S) shared
        site_q_ref, site_mol_ref, site_type_ref, site_midx_ref,  # (1, S)
        amp_re_ref, amp_im_ref, pos_ref,   # (G,JzP,JxyP) x2, (G,3,S) aliased
        amp_re_out, amp_im_out, pos_out,
        flags_out,       # VMEM (G, 8)
        *, G: int, R: int, S: int, FL: int, FQ: int, A_act: int, Lmax: int,
        Qmax: int, kx: int, ky: int, kz: int, JzP: int):
    f32 = amp_re_ref.dtype
    inv_l = (const_ref[0, 0], const_ref[0, 1], const_ref[0, 2])
    ll = (const_ref[0, 3], const_ref[0, 4], const_ref[0, 5])
    alpha, rc2 = const_ref[0, 6], const_ref[0, 7]
    coulomb_k, inv_t, c2piv = (const_ref[0, 8], const_ref[0, 9],
                               const_ref[0, 10])

    # ---- shared per-replica keep masks (1 = live site, not excluded) -----
    midx = site_midx_ref[0, :]
    stype = site_type_ref[0, :]
    smol = site_mol_ref[0, :]
    keeps = []
    for g in range(G):
        nsel = jnp.full((S,), iscal_ref[g, 9], jnp.int32) * (stype == 0)
        for r in range(1, R):
            nsel = jnp.where(stype == r, iscal_ref[g, 9 + r], nsel)
        kg = ((midx < nsel) & (smol != iscal_ref[g, 0])
              & (smol != iscal_ref[g, 1]))
        keeps.append(kg.astype(jnp.int32)[None, :])  # int rows: bool
        # concatenation lowers to an invalid i1 vreg bitcast in Mosaic

    # replica-expanded 2-D operands: each replica's (1, S) row broadcast to
    # its F footprint sublanes, all replicas stacked g-major
    def expand(F):
        xs, ys, zs, ks = [], [], [], []
        for g in range(G):
            xs.append(jnp.broadcast_to(pos_ref[g][0:1, :], (F, S)))
            ys.append(jnp.broadcast_to(pos_ref[g][1:2, :], (F, S)))
            zs.append(jnp.broadcast_to(pos_ref[g][2:3, :], (F, S)))
            ks.append(jnp.broadcast_to(keeps[g], (F, S)))
        return (jnp.concatenate(xs, 0), jnp.concatenate(ys, 0),
                jnp.concatenate(zs, 0), jnp.concatenate(ks, 0))

    def pair_r2(pt_ref, x1, y1, z1):
        px = pt_ref[0, :][:, None]                          # (G*F, 1)
        py = pt_ref[1, :][:, None]
        pz = pt_ref[2, :][:, None]
        dx = x1 - px
        dy = y1 - py
        dz = z1 - pz
        dx = dx - ll[0] * jnp.round(dx * inv_l[0])
        dy = dy - ll[1] * jnp.round(dy * inv_l[1])
        dz = dz - ll[2] * jnp.round(dz * inv_l[2])
        return jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

    # ---- LJ pass on (G*FL, S) --------------------------------------------
    epsl, sig2l = [], []
    for g in range(G):
        epsl.append(epslj_ref[pl.ds(iscal_ref[g, 2] * 8, 8), :][:FL, :])
        sig2l.append(sig2lj_ref[pl.ds(iscal_ref[g, 2] * 8, 8), :][:FL, :])
    eps = jnp.concatenate(epsl, axis=0)                     # (G*FL, S)
    sig2 = jnp.concatenate(sig2l, axis=0)
    xL, yL, zL, keepL = expand(FL)
    r2 = pair_r2(ptlj_ref, xL, yL, zL)
    inv_r2 = 1.0 / r2
    sr2 = sig2 * inv_r2
    sr6 = sr2 * sr2 * sr2
    lj = 4.0 * eps * (sr6 * sr6 - sr6)
    ljsel = (r2 < rc2) & (keepL > 0) & (ljw_ref[0, :][:, None] > 0.0)
    lj_rows = jnp.sum(jnp.where(ljsel, lj, 0.0), axis=1,
                      keepdims=True)                        # (G*FL, 1)

    # ---- Coulomb pass on (G*FQ, S) ---------------------------------------
    xQ, yQ, zQ, keepQ = expand(FQ)
    r2q = pair_r2(ptq_ref, xQ, yQ, zQ)
    inv_r = jax.lax.rsqrt(r2q)
    sq = site_q_ref[0, :][None, :]
    coul = (qw_ref[0, :][:, None] * sq
            * _erfc(alpha * (r2q * inv_r)) * inv_r)
    c_rows = jnp.sum(jnp.where(keepQ > 0, coul, 0.0), axis=1,
                     keepdims=True)                         # (G*FQ, 1)

    # ---- per-replica: k-space delta + Metropolis + commits -----------------
    def dotT(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    flag_rows = []
    for g in range(G):
        e_lj0 = jnp.sum(lj_rows[g * FL:g * FL + Lmax, :])
        e_lj1 = jnp.sum(lj_rows[g * FL + Lmax:(g + 1) * FL, :])
        e_c0 = jnp.sum(c_rows[g * FQ:g * FQ + Qmax, :]) * coulomb_k
        e_c1 = jnp.sum(c_rows[g * FQ + Qmax:(g + 1) * FQ, :]) * coulomb_k

        th = jnp.dot(h2pi_ref[:, :], ptq_ref[:, g * FQ:(g + 1) * FQ],
                     preferred_element_type=f32)            # (3, FQ)
        cxs, sxs = jnp.cos(th), jnp.sin(th)
        rex, imx = _powers(cxs[0:1, :], sxs[0:1, :], kx)
        rey, imy = _powers(cxs[1:2, :], sxs[1:2, :], ky)
        rez, imz = _powers(cxs[2:3, :], sxs[2:3, :], kz)
        pxT = jnp.concatenate([jnp.concatenate(rex, axis=0),
                               jnp.concatenate(imx, axis=0)], axis=1)
        pyT_re, pyT_im = _signed_table(rey, imy, ky)
        pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)
        pzT_re, pzT_im = _signed_table(rez, imz, kz, pad_to=JzP)
        pzT = jnp.concatenate([pzT_re, pzT_im], axis=1)
        xe = dotT(pxT, ex_ref[:, :])
        ye = dotT(pyT, ey_ref[:, :])
        xe_re, xe_im = xe[:FQ, :], xe[FQ:, :]
        ye_re, ye_im = ye[:FQ, :], ye[FQ:, :]
        wkc = wk_ref[0, g * FQ:(g + 1) * FQ][:, None]
        t_re = (xe_re * ye_re - xe_im * ye_im) * wkc
        t_im = (xe_re * ye_im + xe_im * ye_re) * wkc
        t_both = jnp.concatenate(
            [jnp.concatenate([t_re, t_im], axis=1),
             jnp.concatenate([-t_im, t_re], axis=1)], axis=0)
        d_both = jnp.dot(pzT, t_both, preferred_element_type=f32)
        JXY = t_re.shape[1]
        d_re = d_both[:, :JXY]
        d_im = d_both[:, JXY:]

        ar = amp_re_ref[g]
        ai = amp_im_ref[g]
        cross = jnp.sum(kw_ref[:, :] * (2.0 * (ar * d_re + ai * d_im)
                                        + d_re * d_re + d_im * d_im))
        e_recip_old = fscal_ref[g, 2]
        e_recip_new = e_recip_old + cross * c2piv
        delta_e = (fscal_ref[g, 1] + e_lj1 + e_c1 + e_recip_new
                   - fscal_ref[g, 0] - e_lj0 - e_c0 - e_recip_old)
        p_acc = jnp.minimum(1.0, fscal_ref[g, 3]
                            * jnp.exp(-delta_e * inv_t))
        acc = (fscal_ref[g, 5] > 0.0) & (fscal_ref[g, 4] <= p_acc)
        accf = acc.astype(f32)

        amp_re_out[g] = ar + accf * d_re
        amp_im_out[g] = ai + accf * d_im

        s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
        start_new = iscal_ref[g, 3]
        start_old = iscal_ref[g, 4]
        A_new = iscal_ref[g, 5]
        A_old = iscal_ref[g, 6]
        do_write = acc & (iscal_ref[g, 7] > 0)
        do_compact = acc & (iscal_ref[g, 8] > 0)
        rel_new = s_idx - start_new
        rel_old = s_idx - start_old
        in_new = do_write & (rel_new >= 0) & (rel_new < A_new)
        in_old = do_compact & (rel_old >= 0) & (rel_old < A_old)
        out = pos_ref[g]
        for a in range(A_act):
            sel_o = ((rel_old == a) & in_old)[None, :]
            out = jnp.where(sel_o,
                            lastcols_ref[:, g * A_act + a][:, None], out)
        for a in range(A_act):
            sel_n = ((rel_new == a) & in_new)[None, :]
            out = jnp.where(sel_n,
                            newcols_ref[:, g * A_act + a][:, None], out)
        pos_out[g] = out

        flag_rows.append(jnp.stack([accf, e_recip_new, delta_e,
                                    e_lj0, e_lj1, e_c0, e_c1, p_acc]))

    flags_out[:, :] = jnp.stack(flag_rows, axis=0)


def mc_step_core_grouped(spec, pos_g, amp_re_g, amp_im_g,
                         iscal, fscal, ptlj, ljw, ptq, qw, wk,
                         newcols, lastcols, *, interpret=False):
    """Grouped core for G replicas (the caller vmaps over B // G groups).
    pos_g (G,3,S), amp_* (G,JzP,JxyP); ptlj/ptq are (G, F, 3), ljw/qw
    (G, F), wk (G, FQ). Returns (amp_re', amp_im', pos', flags (G, 8))."""
    G = pos_g.shape[0]
    JzP, JxyP = spec.amp_shape
    S = spec.S
    FL = 2 * spec.Lmax
    FQ = 2 * spec.Qmax
    kx, ky, kz = spec.kmax_xyz
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"

    consts = jnp.concatenate([
        1.0 / spec.box_diag, spec.box_diag,
        jnp.stack([spec.alpha, spec.cutoff * spec.cutoff,
                   jnp.asarray(COULOMB_K, f), 1.0 / spec.temp_K,
                   COULOMB_K * TWOPI / spec.volume]),
        jnp.zeros(5, f)]).astype(f).reshape(1, 16)

    kernel = functools.partial(
        _stepg_kernel, G=G, R=spec.R, S=S, FL=FL, FQ=FQ, A_act=spec.A_act,
        Lmax=spec.Lmax, Qmax=spec.Qmax, kx=kx, ky=ky, kz=kz, JzP=JzP)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re2, amp_im2, pos2, flags = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, 3, S), f),
                   jax.ShapeDtypeStruct((G, 8), f)),
        in_specs=[vmem] * 23,
        out_specs=(vmem,) * 4,
        input_output_aliases={20: 0, 21: 1, 22: 2},
        interpret=interpret,
    )(iscal, fscal,
      ptlj.transpose(2, 0, 1).reshape(3, G * FL), ljw.reshape(1, G * FL),
      ptq.transpose(2, 0, 1).reshape(3, G * FQ), qw.reshape(1, G * FQ),
      wk.reshape(1, G * FQ), newcols, lastcols,
      consts, spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel, spec.k_weights,
      spec.eps_pair_lj, spec.sig2_pair_lj,
      spec.site_q.reshape(1, S), spec.site_mol.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S),
      amp_re_g, amp_im_g, pos_g)
    return amp_re2, amp_im2, pos2, flags
