"""Pallas TPU kernel running a WHOLE block of MC steps per replica.

The per-step kernel (kernels/step.py) still pays, every step, the HBM
read+write of the replica's positions and structure-factor amplitudes plus
an XLA glue layer (footprint extraction, geometry, bookkeeping). This
kernel keeps pos/com/amplitudes/populations/energies resident in
VMEM/SMEM for all nb_step steps of a block: per-block HBM traffic is one
read+write of the state plus the pre-drawn uniforms. The entire MC move
logic - move-type draw, molecule pick, geometry proposal, pair energies,
incremental structure factors, Metropolis, commits, counters - runs inside
one fori_loop in the program.

Physics is identical to mc/moves.py::mc_step_u (the XLA path remains the
CPU/f64/triclinic oracle; reference citations live there). Scope: no
reservoir, orthogonal boxes, f32 - the driver dispatches here only for
that regime (kernels/__init__.py use_block_kernel).

Mosaic survival rules used throughout: everything 2-D, dynamic column
selection via iota-compare one-hot matmuls (never dynamic lane slices or
gathers), dynamic ROW slices only at sublane-aligned offsets, per-replica
scalars in (1, N) VMEM rows, small complex matmuls packed re|im.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COULOMB_K, PROB_CREATE_DELETE, TWOPI
from .step import _erfc, _powers, _signed_table

_R2_FLOOR = 1e-18

# cst_f layout (1, 64) f32
_CF = dict(INVL=0, L=3, ALPHA=6, RC2=7, CK=8, INVT=9, C2PIV=10, PCUM=11,
           VOL=15, LO=16, H=24, ACT=40, TRANS=56, ROT=57)
# cst_i layout (1, 64) int32
_CI = dict(TYPE_A=0, TYPE_CAP=8, SITE_BASE=16, MOL_BASE=24, ACTIVE_IDS=32,
           MTOT=40)


def _step_body(t, refs, consts, statics):
    (uniforms_ref, cst_f_ref, cst_i_ref, h2pi_ref, ex_ref, ey_ref, kw_ref,
     eps_ref, sig2_ref, site_q_ref, site_mol_ref, site_type_ref,
     site_midx_ref, qrows_ref, templ_ref,
     pos_ref, com_ref, amp_re_ref, amp_im_ref,
     nmol_ref, eng_ref, cnt_ref) = refs
    (R, S, F, A_act, n_active, Mtot, kx, ky, kz, JzP) = statics
    f32 = jnp.float32

    def cf(i):
        return cst_f_ref[0, i]

    def ci(i):
        return cst_i_ref[0, i]

    u = uniforms_ref[pl.ds(t, 1), :]                        # (1, NU)
    u_move, u_cd, u_acc = u[0, 0], u[0, 1], u[0, 2]
    u_angle = u[0, 9]

    def uint(uv, n):
        return jnp.minimum((uv * n.astype(f32)).astype(jnp.int32), n - 1)

    axis = uint(u[0, 10], jnp.int32(3))

    # ---- move class (reference: src/monte_carlo.f90:50-75) ---------------
    is_trans = u_move <= cf(_CF["PCUM"])
    is_rot = (~is_trans) & (u_move <= cf(_CF["PCUM"] + 1))
    is_indel = (~is_trans) & (~is_rot) & (u_move <= cf(_CF["PCUM"] + 2))
    can_swap = n_active >= 2
    if can_swap:
        is_swap = (~is_trans) & (~is_rot) & (~is_indel)
        dead = jnp.zeros((), bool)
    else:
        is_swap = jnp.zeros((), bool)
        dead = (~is_trans) & (~is_rot) & (~is_indel)
    is_create = is_indel & (u_cd <= PROB_CREATE_DELETE)
    is_delete = is_indel & (~is_create)
    move = jnp.where(is_create, 0, jnp.where(is_delete, 1,
            jnp.where(is_trans, 2, jnp.where(is_rot, 3, 4))))

    insert_like = is_create | is_swap
    remove_like = is_delete | is_swap
    w_old = is_trans | is_rot | is_delete | is_swap
    w_new = is_trans | is_rot | is_create | is_swap

    # ---- picks ------------------------------------------------------------
    i1 = uint(u[0, 11], jnp.int32(n_active))
    di = 1 + uint(u[0, 12], jnp.int32(max(n_active - 1, 1)))
    i2 = jax.lax.rem(i1 + di, jnp.int32(n_active))

    def sel_i(base, idx):  # unrolled dynamic pick from cst_i row
        out = ci(base)
        for r in range(1, max(n_active, 1)):
            out = jnp.where(idx == r, ci(base + r), out)
        return out

    t1 = sel_i(_CI["ACTIVE_IDS"], i1)
    t2 = sel_i(_CI["ACTIVE_IDS"], i2) if can_swap else t1
    t_old = t1
    t_new = jnp.where(is_swap, t2, t1)

    def sel_r(base, tt):  # unrolled per-type pick
        out = ci(base)
        for r in range(1, R):
            out = jnp.where(tt == r, ci(base + r), out)
        return out

    def sel_rf(base, tt):
        out = cf(base)
        for r in range(1, R):
            out = jnp.where(tt == r, cf(base + r), out)
        return out

    # population counts live in SMEM scratch nmol_ref (R+1,)
    def nmol_at(tt):
        out = nmol_ref[0]
        for r in range(1, R):
            out = jnp.where(tt == r, nmol_ref[r], out)
        return out

    n_old = nmol_at(t_old)
    n_new = nmol_at(t_new)
    m_old = uint(u[0, 13], jnp.maximum(n_old, 1))

    A_old = sel_r(_CI["TYPE_A"], t_old)
    A_new = sel_r(_CI["TYPE_A"], t_new)
    cap_new = sel_r(_CI["TYPE_CAP"], t_new)

    valid = jnp.where(is_create, True,
                      jnp.where(is_rot, (n_old > 0) & (A_old > 1),
                                n_old > 0)) & (~dead)
    cap_blocked = insert_like & (n_new >= cap_new)

    # ---- footprint --------------------------------------------------------
    mol_slot_old = sel_r(_CI["MOL_BASE"], t_old) + m_old
    site_start_old = sel_r(_CI["SITE_BASE"], t_old) + m_old * A_old
    slot_new = jnp.where(
        insert_like,
        sel_r(_CI["MOL_BASE"], t_new) + jnp.minimum(n_new, cap_new - 1),
        mol_slot_old)
    site_start_new = jnp.where(
        insert_like,
        sel_r(_CI["SITE_BASE"], t_new)
        + jnp.minimum(n_new, cap_new - 1) * A_new,
        site_start_old)
    last_idx = jnp.maximum(n_old - 1, 0)
    slot_last = sel_r(_CI["MOL_BASE"], t_old) + last_idx
    start_last = sel_r(_CI["SITE_BASE"], t_old) + last_idx * A_old

    # columns via one-hot matmuls (dynamic lane slices are not a thing)
    s_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * A_act), 0)
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (S, 2 * A_act), 1)
    # int-select then ONE compare (selecting between bools lowers to an
    # i8->i1 truncation Mosaic rejects)
    base_sel = jnp.where(a_iota < A_act, site_start_old, start_last)
    tgt = jnp.where(a_iota < A_act, a_iota, a_iota - A_act)
    oh = ((s_iota - base_sel) == tgt).astype(f32)
    cols2 = jnp.dot(pos_ref[:, :], oh, preferred_element_type=f32)  # (3,2A)
    P_oldT = cols2[:, :A_act]                               # (3, A_act)
    last_cols = cols2[:, A_act:]

    m_iota = jax.lax.broadcasted_iota(jnp.int32, (Mtot + 1, 2), 0)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (Mtot + 1, 2), 1)
    ohc = (m_iota == jnp.where(c_iota == 0, mol_slot_old,
                               slot_last)).astype(f32)
    comcols = jnp.dot(com_ref[:, :], ohc, preferred_element_type=f32)  # (3,2)
    com_old = comcols[:, 0:1]                               # (3, 1)
    com_last = comcols[:, 1:2]

    off_oldT = P_oldT - com_old                             # (3, A_act)

    # per-type charges (one row select, unrolled)
    qrow_old = qrows_ref[pl.ds(0, 1), :]
    qrow_new = qrows_ref[pl.ds(0, 1), :]
    for r in range(1, R):
        qrow_old = jnp.where(t_old == r, qrows_ref[pl.ds(r, 1), :], qrow_old)
        qrow_new = jnp.where(t_new == r, qrows_ref[pl.ds(r, 1), :], qrow_new)

    # insertion template columns (3, A_act) for t_new
    tmplT = templ_ref[:, pl.ds(0, A_act)]
    # templates stored (3, R*A_act) with static per-type column blocks
    for r in range(1, R):
        tmplT = jnp.where(t_new == r,
                          templ_ref[:, pl.ds(r * A_act, A_act)], tmplT)
    off_srcT = jnp.where(insert_like, tmplT, off_oldT)

    # ---- rotation matrix, entrywise scalars (Mosaic rejects tiny
    # reshapes like (9,)->(3,3)) ---------------------------------------------
    theta_rot = jnp.where(is_rot, (u_angle - 0.5) * cf(_CF["ROT"]), 0.0)
    c, s = jnp.cos(theta_rot), jnp.sin(theta_rot)
    one = jnp.ones((), f32)
    zero = jnp.zeros((), f32)

    def sel3(a0, a1, a2):  # pick by rotation axis
        return jnp.where(axis == 0, a0, jnp.where(axis == 1, a1, a2))

    # rows of R_x / R_y / R_z (reference: src/helper_utils.f90:39-77)
    rax = ((sel3(one, c, c), sel3(zero, zero, -s), sel3(zero, s, zero)),
           (sel3(zero, zero, s), sel3(c, one, c), sel3(-s, zero, zero)),
           (sel3(zero, -s, zero), sel3(s, zero, zero), sel3(c, c, one)))
    # uniform SO(3) for template insertions (Shoemake; see mc/moves.py)
    a_ = jnp.sqrt(1.0 - u[0, 15])
    b_ = jnp.sqrt(u[0, 15])
    t2_, t3_ = TWOPI * u[0, 16], TWOPI * u[0, 17]
    qw_, qx_ = a_ * jnp.sin(t2_), a_ * jnp.cos(t2_)
    qy_, qz_ = b_ * jnp.sin(t3_), b_ * jnp.cos(t3_)
    runi = ((1 - 2 * (qy_ * qy_ + qz_ * qz_), 2 * (qx_ * qy_ - qw_ * qz_),
             2 * (qx_ * qz_ + qw_ * qy_)),
            (2 * (qx_ * qy_ + qw_ * qz_), 1 - 2 * (qx_ * qx_ + qz_ * qz_),
             2 * (qy_ * qz_ - qw_ * qx_)),
            (2 * (qx_ * qz_ - qw_ * qy_), 2 * (qy_ * qz_ + qw_ * qx_),
             1 - 2 * (qx_ * qx_ + qy_ * qy_)))
    rm = [[jnp.where(insert_like, runi[i][j], rax[i][j])
           for j in range(3)] for i in range(3)]

    # ---- new COM, per component --------------------------------------------
    uds = (u[0, 3] - 0.5, u[0, 4] - 0.5, u[0, 5] - 0.5)
    ufr = (u[0, 6], u[0, 7], u[0, 8])
    com_new_c = []
    for i in range(3):
        lo_i = cf(_CF["LO"] + i)
        L_i = cf(_CF["L"] + i)
        com_o_i = com_old[i, 0]
        trans_i = lo_i + jax.lax.rem(
            com_o_i + uds[i] * cf(_CF["TRANS"]) - lo_i + 4.0 * L_i, L_i)
        ins_i = lo_i + (cf(_CF["H"] + 3 * i) * ufr[0]
                        + cf(_CF["H"] + 3 * i + 1) * ufr[1]
                        + cf(_CF["H"] + 3 * i + 2) * ufr[2])
        com_new_c.append(jnp.where(is_trans, trans_i,
                                   jnp.where(is_create, ins_i, com_o_i)))

    # rotate + place: P_new row i = com_new_i + sum_j rm[i][j]*off_src row j
    off_rows = [off_srcT[i:i + 1, :] for i in range(3)]     # (1, A_act) each
    P_newT = jnp.concatenate(
        [com_new_c[i] + rm[i][0] * off_rows[0] + rm[i][1] * off_rows[1]
         + rm[i][2] * off_rows[2] for i in range(3)], axis=0)  # (3, A_act)

    # ---- packed footprint -------------------------------------------------
    pad = F - 2 * A_act
    ptT = jnp.concatenate(
        [P_oldT, P_newT] + ([jnp.zeros((3, pad), f32)] if pad else []),
        axis=1)                                             # (3, F)
    fa = jax.lax.broadcasted_iota(jnp.int32, (1, F), 1)
    aw_old = ((fa < A_act) & (fa < A_old)
              & jnp.broadcast_to(w_old, (1, F))).astype(f32)
    aw_new = ((fa >= A_act) & (fa < A_act + A_new)
              & jnp.broadcast_to(w_new, (1, F))).astype(f32)
    qrow2 = jnp.concatenate(
        [qrow_old[:, :A_act], qrow_new[:, :A_act]]
        + ([jnp.zeros((1, pad), f32)] if pad else []), axis=1)
    qw_pack = qrow2 * (aw_old + aw_new)                     # (1, F)
    ljw_pack = aw_old + aw_new
    wk_pack = qrow2 * (aw_new - aw_old)

    # ---- pair energies (same math as kernels/step.py) ----------------------
    midx = site_midx_ref[0, :]
    stype = site_type_ref[0, :]
    nsel = jnp.full((S,), nmol_ref[0], jnp.int32) * (stype == 0)
    for r in range(1, R):
        nsel = jnp.where(stype == r, nmol_ref[r], nsel)
    ex_a = jnp.where(w_old, mol_slot_old, jnp.int32(Mtot + 1))
    ex_b = slot_new
    smol = site_mol_ref[0, :]
    keep = ((midx < nsel) & (smol != ex_a) & (smol != ex_b))[None, :]

    pid = t_old * R + t_new
    eps = eps_ref[pl.ds(pid * F, F), :]
    sig2 = sig2_ref[pl.ds(pid * F, F), :]

    x = pos_ref[0, :][None, :]
    y = pos_ref[1, :][None, :]
    z = pos_ref[2, :][None, :]
    sq = site_q_ref[0, :][None, :]
    dx = x - ptT[0, :][:, None]
    dy = y - ptT[1, :][:, None]
    dz = z - ptT[2, :][:, None]
    dx = dx - cf(_CF["L"]) * jnp.round(dx * cf(_CF["INVL"]))
    dy = dy - cf(_CF["L"] + 1) * jnp.round(dy * cf(_CF["INVL"] + 1))
    dz = dz - cf(_CF["L"] + 2) * jnp.round(dz * cf(_CF["INVL"] + 2))
    r2 = jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

    inv_r2 = 1.0 / r2
    sr2 = sig2 * inv_r2
    sr6 = sr2 * sr2 * sr2
    lj = 4.0 * eps * (sr6 * sr6 - sr6)
    ljsel = (r2 < cf(_CF["RC2"])) & keep & (ljw_pack[0, :][:, None] > 0.0)
    lj_rows = jnp.sum(jnp.where(ljsel, lj, 0.0), axis=1, keepdims=True)
    inv_r = jax.lax.rsqrt(r2)
    coul = (qw_pack[0, :][:, None] * sq
            * _erfc(cf(_CF["ALPHA"]) * (r2 * inv_r)) * inv_r)
    c_rows = jnp.sum(jnp.where(keep, coul, 0.0), axis=1, keepdims=True)

    fi = jax.lax.broadcasted_iota(jnp.int32, (F, 1), 0)
    m0 = (fi < A_act).astype(f32)
    e_lj0 = jnp.sum(lj_rows * m0)
    e_lj1 = jnp.sum(lj_rows * (1.0 - m0))
    e_c0 = jnp.sum(c_rows * m0) * cf(_CF["CK"])
    e_c1 = jnp.sum(c_rows * (1.0 - m0)) * cf(_CF["CK"])

    # ---- intra + self -----------------------------------------------------
    # intra: (erfc(ar)-1)/r over i<j within the footprint side
    def intra_side(PT, qrow, Aside, gate_):
        dxi = PT[0, :][:, None] - PT[0, :][None, :]
        dyi = PT[1, :][:, None] - PT[1, :][None, :]
        dzi = PT[2, :][:, None] - PT[2, :][None, :]
        dxi = dxi - cf(_CF["L"]) * jnp.round(dxi * cf(_CF["INVL"]))
        dyi = dyi - cf(_CF["L"] + 1) * jnp.round(dyi * cf(_CF["INVL"] + 1))
        dzi = dzi - cf(_CF["L"] + 2) * jnp.round(dzi * cf(_CF["INVL"] + 2))
        ri2 = jnp.maximum(dxi * dxi + dyi * dyi + dzi * dzi, _R2_FLOOR)
        ri = jnp.sqrt(ri2)
        qq = qrow[0, :A_act][:, None] * qrow[0, :A_act][None, :]
        ia = jax.lax.broadcasted_iota(jnp.int32, (A_act, A_act), 0)
        ja = jax.lax.broadcasted_iota(jnp.int32, (A_act, A_act), 1)
        msk = (ia < ja) & (ja < Aside) & (ri2 > 1e-16)
        e = qq * (_erfc(cf(_CF["ALPHA"]) * ri) - 1.0) / ri
        return jnp.where(gate_, jnp.sum(jnp.where(msk, e, 0.0))
                         * cf(_CF["CK"]), 0.0)

    i_old = intra_side(P_oldT, qrow_old, A_old, remove_like & valid)
    i_new = intra_side(P_newT, qrow_new, A_new, insert_like)
    self_old = sel_rf(_CF["ACT"] + 8, t_old)  # self energies at ACT+8..
    self_new = sel_rf(_CF["ACT"] + 8, t_new)
    s_old = jnp.where(remove_like, self_old, 0.0)
    s_new = jnp.where(insert_like, self_new, 0.0)

    # ---- structure-factor delta (same as kernels/step.py) ------------------
    th = jnp.dot(h2pi_ref[:, :], ptT, preferred_element_type=f32)  # (3, F)
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

    def dotT(a, b):
        return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    xe = dotT(pxT, ex_ref[:, :])
    ye = dotT(pyT, ey_ref[:, :])
    xe_re, xe_im = xe[:F, :], xe[F:, :]
    ye_re, ye_im = ye[:F, :], ye[F:, :]
    wkc = wk_pack[0, :][:, None]
    t_re = (xe_re * ye_re - xe_im * ye_im) * wkc
    t_im = (xe_re * ye_im + xe_im * ye_re) * wkc
    t_both = jnp.concatenate(
        [jnp.concatenate([t_re, t_im], axis=1),
         jnp.concatenate([-t_im, t_re], axis=1)], axis=0)
    d_both = jnp.dot(pzT, t_both, preferred_element_type=f32)
    JXY = t_re.shape[1]
    d_re = d_both[:, :JXY]
    d_im = d_both[:, JXY:]

    ar = amp_re_ref[:, :]
    ai = amp_im_ref[:, :]
    cross = jnp.sum(kw_ref[:, :] * (2.0 * (ar * d_re + ai * d_im)
                                    + d_re * d_re + d_im * d_im))
    e_recip_old = eng_ref[0, 0]
    e_recip_new = e_recip_old + cross * cf(_CF["C2PIV"])

    delta_e = (e_lj1 + e_c1 + s_new + i_new + e_recip_new
               - e_lj0 - e_c0 - s_old - i_old - e_recip_old)

    # ---- acceptance --------------------------------------------------------
    V = cf(_CF["VOL"])
    act_new = sel_rf(_CF["ACT"], t_new)
    act_old = sel_rf(_CF["ACT"], t_old)
    pref = jnp.where(insert_like, act_new * V / (n_new.astype(f32) + 1.0),
                     1.0)
    pref = pref * jnp.where(remove_like,
                            n_old.astype(f32) / (act_old * V), 1.0)
    p_acc = jnp.minimum(1.0, pref * jnp.exp(-delta_e * cf(_CF["INVT"])))
    gate = valid & (~cap_blocked)
    acc = gate & (u_acc <= p_acc)
    accf = acc.astype(f32)

    # ---- commits ------------------------------------------------------------
    amp_re_ref[:, :] = ar + accf * d_re
    amp_im_ref[:, :] = ai + accf * d_im

    s_idx = jax.lax.broadcasted_iota(jnp.int32, (1, S), 1)[0, :]
    do_write = acc & w_new
    do_compact = acc & remove_like
    rel_new = s_idx - site_start_new
    rel_old = s_idx - site_start_old
    in_new = do_write & (rel_new >= 0) & (rel_new < A_new)
    in_old = do_compact & (rel_old >= 0) & (rel_old < A_old)
    out = pos_ref[:, :]
    for a in range(A_act):
        sel_o = ((rel_old == a) & in_old)[None, :]
        out = jnp.where(sel_o, last_cols[:, a][:, None], out)
    for a in range(A_act):
        sel_n = ((rel_new == a) & in_new)[None, :]
        out = jnp.where(sel_n, P_newT[:, a][:, None], out)
    pos_ref[:, :] = out

    mi = jax.lax.broadcasted_iota(jnp.int32, (1, Mtot + 1), 1)[0, :]
    cn31 = jnp.concatenate(
        [com_new_c[i] * jnp.ones((1, 1), f32) for i in range(3)], axis=0)
    comv = com_ref[:, :]
    comv = jnp.where((do_compact & (mi == mol_slot_old))[None, :],
                     com_last, comv)
    comv = jnp.where((do_write & (mi == slot_new))[None, :], cn31, comv)
    com_ref[:, :] = comv

    # populations (SMEM scratch)
    for r in range(R):
        nmol_ref[r] = nmol_ref[r] + jnp.where(
            acc & insert_like & (t_new == r), 1, 0) - jnp.where(
            acc & remove_like & (t_old == r), 1, 0)

    # energies: eng row = [recip, lj, coul, self, intra, tot, 0, 0]
    zero = jnp.zeros((), f32)
    eng = eng_ref[0:1, :]
    upd = jnp.stack([
        jnp.where(acc, e_recip_new - e_recip_old, 0.0),
        accf * (e_lj1 - e_lj0),
        accf * (e_c1 - e_c0),
        accf * (s_new - s_old),
        accf * (i_new - i_old),
        accf * delta_e, zero, zero])[None, :]
    eng_ref[0:1, :] = eng + upd

    # counters (2, 8) f32: trials row 0, accepts row 1, cols = move type;
    # col 5 = capacity-overflow rejections
    cm = jax.lax.broadcasted_iota(jnp.int32, (2, 8), 1)
    cr = jax.lax.broadcasted_iota(jnp.int32, (2, 8), 0)
    inc = (((cm == move) & (((cr == 0) & valid) | ((cr == 1) & acc)))
           | ((cm == 5) & (cr == 0) & valid & cap_blocked)).astype(f32)
    cnt_ref[:, :] = cnt_ref[:, :] + inc
    return t + 1


def _block_kernel(uniforms_ref, cst_f_ref, cst_i_ref, h2pi_ref, ex_ref,
                  ey_ref, kw_ref, eps_ref, sig2_ref, site_q_ref,
                  site_mol_ref, site_type_ref, site_midx_ref, qrows_ref,
                  templ_ref, nmol_in_ref, eng_in_ref,
                  pos_ref, com_ref, amp_re_ref, amp_im_ref,
                  pos_out, com_out, amp_re_out, amp_im_out,
                  nmol_out, eng_out, cnt_out,
                  nmol_scr, *, n_steps, R, S, F, A_act, n_active, Mtot,
                  kx, ky, kz, JzP):
    # aliased state flows through the refs; scalar state in scratch
    for r in range(R + 1):
        nmol_scr[r] = nmol_in_ref[0, r]
    eng_out[0:1, :] = eng_in_ref[0:1, :]
    cnt_out[:, :] = jnp.zeros((2, 8), jnp.float32)
    pos_out[:, :] = pos_ref[:, :]
    com_out[:, :] = com_ref[:, :]
    amp_re_out[:, :] = amp_re_ref[:, :]
    amp_im_out[:, :] = amp_im_ref[:, :]

    refs = (uniforms_ref, cst_f_ref, cst_i_ref, h2pi_ref, ex_ref, ey_ref,
            kw_ref, eps_ref, sig2_ref, site_q_ref, site_mol_ref,
            site_type_ref, site_midx_ref, qrows_ref, templ_ref,
            pos_out, com_out, amp_re_out, amp_im_out,
            nmol_scr, eng_out, cnt_out)
    statics = (R, S, F, A_act, n_active, Mtot, kx, ky, kz, JzP)

    def body(t, carry):
        _step_body(t, refs, None, statics)
        return carry

    jax.lax.fori_loop(0, n_steps, body, 0)
    # whole-row store (Mosaic rejects scalar stores to VMEM)
    nmol_out[0:1, :] = jnp.stack(
        [nmol_scr[i] for i in range(8)]).reshape(1, 8)


def run_block_pallas(spec, state, uniforms, *, interpret=False):
    """Run n_steps MC steps for ONE replica entirely in one Pallas program
    (vmap over replicas batches it). uniforms: (n_steps, N_UNIFORMS).
    Returns the updated (pos, com, amp_re, amp_im, n_mol, energy,
    counter_delta, overflow_delta)."""
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"
    JzP, JxyP = spec.amp_shape
    S = spec.S
    F = spec.F_pack
    A_act = spec.A_act
    R = spec.R
    kx, ky, kz = spec.kmax_xyz
    n_steps = uniforms.shape[0]

    cst_f = jnp.zeros(64, f)
    cst_f = cst_f.at[_CF["INVL"]:_CF["INVL"] + 3].set(1.0 / spec.box_diag)
    cst_f = cst_f.at[_CF["L"]:_CF["L"] + 3].set(spec.box_diag)
    cst_f = cst_f.at[_CF["ALPHA"]].set(spec.alpha)
    cst_f = cst_f.at[_CF["RC2"]].set(spec.cutoff * spec.cutoff)
    cst_f = cst_f.at[_CF["CK"]].set(COULOMB_K)
    cst_f = cst_f.at[_CF["INVT"]].set(1.0 / spec.temp_K)
    cst_f = cst_f.at[_CF["C2PIV"]].set(COULOMB_K * TWOPI / spec.volume)
    cst_f = cst_f.at[_CF["PCUM"]:_CF["PCUM"] + 4].set(spec.p_cum)
    cst_f = cst_f.at[_CF["VOL"]].set(spec.volume)
    cst_f = cst_f.at[_CF["LO"]:_CF["LO"] + 3].set(spec.bounds[:, 0])
    cst_f = cst_f.at[_CF["H"]:_CF["H"] + 9].set(spec.H.reshape(-1))
    cst_f = cst_f.at[_CF["ACT"]:_CF["ACT"] + R].set(spec.type_activity)
    cst_f = cst_f.at[_CF["ACT"] + 8:_CF["ACT"] + 8 + R].set(
        spec.type_self_energy)
    cst_f = cst_f.at[_CF["TRANS"]].set(state.trans_step)
    cst_f = cst_f.at[_CF["ROT"]].set(state.rot_step)
    cst_f = cst_f.reshape(1, 64)

    cst_i = jnp.zeros(64, jnp.int32)
    cst_i = cst_i.at[_CI["TYPE_A"]:_CI["TYPE_A"] + R].set(spec.type_A)
    cst_i = cst_i.at[_CI["TYPE_CAP"]:_CI["TYPE_CAP"] + R].set(spec.type_cap)
    cst_i = cst_i.at[_CI["SITE_BASE"]:_CI["SITE_BASE"] + R].set(
        spec.type_site_base)
    cst_i = cst_i.at[_CI["MOL_BASE"]:_CI["MOL_BASE"] + R].set(
        spec.type_mol_base)
    cst_i = cst_i.at[_CI["ACTIVE_IDS"]:_CI["ACTIVE_IDS"] + spec.n_active].set(
        spec.active_type_ids)
    cst_i = cst_i.reshape(1, 64)

    # templates (3, R*A_act): per-type column blocks
    templ = spec.type_template_off.transpose(2, 0, 1).reshape(3, R * A_act)

    nmol_in = jnp.zeros((1, 8), jnp.int32).at[0, :R + 1].set(state.n_mol)
    eng_in = jnp.zeros((1, 8), f).at[0, :6].set(state.energy)

    kernel = functools.partial(
        _block_kernel, n_steps=n_steps, R=R, S=S, F=F, A_act=A_act,
        n_active=spec.n_active, Mtot=spec.Mtot,
        kx=kx, ky=ky, kz=kz, JzP=JzP)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((3, S), f),          # pos
                   jax.ShapeDtypeStruct((3, spec.Mtot + 1), f),  # com
                   jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((1, 8), jnp.int32),   # n_mol
                   jax.ShapeDtypeStruct((1, 8), f),           # energy
                   jax.ShapeDtypeStruct((2, 8), f)),          # counters
        in_specs=[vmem] * 21,
        out_specs=(vmem,) * 7,
        input_output_aliases={17: 0, 18: 1, 19: 2, 20: 3},
        scratch_shapes=[pltpu.SMEM((8,), jnp.int32)],
        interpret=interpret,
    )(uniforms, cst_f, cst_i, spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel,
      spec.k_weights, spec.eps_pair_rows, spec.sig2_pair_rows,
      spec.site_q.reshape(1, S), spec.site_mol.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S),
      spec.type_q_rows, templ, nmol_in, eng_in,
      state.pos, state.com, state.amp_re, state.amp_im)
    pos, com, amp_re, amp_im, nmol, eng, cnt = outs
    return pos, com, amp_re, amp_im, nmol[0, :R + 1], eng[0, :6], cnt
