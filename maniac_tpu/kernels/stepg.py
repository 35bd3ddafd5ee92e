"""Grouped Pallas step core: G replicas per program + LJ/Coulomb row
compaction + static-framework spatial windows + far-field grid.

The per-replica kernel (kernels/step.py) computes LJ AND Coulomb formulas
on every footprint row of an (F_pack, S) tile, but most atoms carry only
one of the two (TIP4P water: 1 LJ site, 3 charged sites), and shrinking
rows below 8 buys nothing at the VPU's (8, 128) tile granularity. Batching
G replicas per program makes compaction pay: this kernel runs

  * one LJ pass over (G * 2*Lmax, cols) rows (eps-active atoms only),
  * one Coulomb pass over (G * 2*Qmax, cols) rows (charged atoms only),
  * ONE shared phase-table build for all G replicas' k-space updates
    (the per-replica build was a storm of (1, FQ)-row ops - latency-bound),
  * per-replica k-space delta + Metropolis + in-place commits.

With the static-framework split (spec.fw_split, physics/fwsplit.py) the
column space shrinks dramatically: the framework never moves, so its sites
live in a sort-axis-ordered ghost-padded SPEC table and each (replica,
side) touches only a spatial window of it - a dynamic lane slice whose
start is precomputed in the XLA glue from the side's COM. The guest
columns (the only mutable ones) are the [guest_base, S) suffix of the
site array. The framework's long-range Coulomb response beyond the short
window is the precomputed far-field coefficient grid, contracted against
all G replicas' footprint phase tables in one MXU pass, reusing the same
shared power tables as the main dense k-grid.

Footprint operands come in TWO layouts: FQ-packed (3, G*FQ) for the pair
passes (no dead rows) and FK-padded (3, G*FK), FK = roundup(2*Qmax, 8),
for the phase tables, so every per-replica slice of the shared tables is
sublane/lane aligned.

All pair work is plain 2-D (rows, cols) vector code - the replica-expanded
site rows are materialized with sublane broadcasts of multi-row slices
(Mosaic cannot broadcast single-row slices at unaligned lane offsets;
rank-3 broadcast forms compile slower and hit relayout failures).

Same physics as the XLA path in mc/moves.py + physics/energy.py (which
remains the oracle; parity is pinned in tests/test_kernels.py and
tests/test_fwsplit.py)."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ds128(start, size):
    """Dynamic lane slice with a 128-aligned start (chunk/window blocks).

    The multiple_of hint lets Mosaic emit aligned vreg copies instead of
    lane-rotation sequences for the dynamic column offset.
    """
    return pl.ds(pl.multiple_of(start, 128), size)

from ..constants import COULOMB_K, TWOPI
from .common import _erfc, _powers, _signed_table, dot1h, dot3

_R2_FLOOR = 1e-18


def _stepg_kernel(
        iscal_ref,       # VMEM (G, W) int32: ex_a, ex_b, pid, start_new,
                         #   start_old, A_new, A_old, w_new, remove,
                         #   n_mol[R+1], wstartL0, wstartL1, wstartC0,
                         #   wstartC1 (fw window block starts)
        fscal_ref,       # VMEM (G, 8) f32: e_rest_old, e_rest_new,
                         #   e_recip_old, pref, u_acc, gate, 0, 0
        ptlj_ref,        # VMEM (3, G*FL) LJ-row positions, g-major
        ljw_ref,         # VMEM (1, G*FL) LJ row mask * side-weight
        ptq_ref,         # VMEM (3, G*FQ) charged-row positions, g-major
        qw_ref,          # VMEM (1, G*FQ) charge * mask * side-weight
        ptk_ref,         # VMEM (3, G*FK) charged rows, 8-padded per g
        qwk_ref,         # VMEM (1, G*FK) charge weights, 8-padded
        wkk_ref,         # VMEM (1, G*FK) signed k-delta weights, 8-padded
        newcols_ref,     # VMEM (3, G*A_act) P_new columns per replica
        lastcols_ref,    # VMEM (3, G*A_act) compaction columns per replica
        const_ref,       # VMEM (1, 16) f32 shared: invL L alpha rc2 ck invT
                         #   c2piv alpha2 rc2sq2 fw_d0
        h2pi_ref,        # VMEM (3, 3) shared
        ex_ref, ey_ref,  # VMEM expansions, shared
        kw_ref,          # VMEM (JzP, JxyP) shared
        epslj_ref,       # VMEM (nA*nA*8, GS) active-pair LJ rows, guest cols
        sig2lj_ref,      # VMEM (nA*nA*8, GS)
        site_q_ref, site_mol_ref, site_type_ref, site_midx_ref,  # (1, GS)
        fwpq_ref,        # VMEM (4, SG) ghosted sorted framework x/y/z/q
        fweps_ref,       # VMEM (nA*nA*8, SG) active-pair LJ blocks
        fwsig2_ref,      # VMEM (nA*nA*8, SG)
        c2re_ref,        # VMEM (Jz2P, Jxy2P) far-field coefficients
        c2im_ref,
        ex2_ref, ey2_ref,  # VMEM grid2 expansions
        amp_re_ref, amp_im_ref, pos_ref,   # (G,JzP,JxyP) x2, (G,3,S) aliased
        amp_re_out, amp_im_out, pos_out,
        flags_out,       # VMEM (G, 8)
        *, G: int, R: int, nA: int, S: int, FL: int, FQ: int, FK: int,
        A_act: int,
        Lmax: int, Qmax: int, kx: int, ky: int, kz: int, JzP: int,
        fw_on: bool, gbase: int, SG: int, WL: int, WC: int,
        kx2: int, ky2: int, kz2: int, Jz2P: int, fw_axis: int,
        ggr2: float = 0.0, vv3: bool = False, ablate: str = ""):
    f32 = amp_re_ref.dtype
    inv_l = (const_ref[0, 0], const_ref[0, 1], const_ref[0, 2])
    ll = (const_ref[0, 3], const_ref[0, 4], const_ref[0, 5])
    alpha, rc2 = const_ref[0, 6], const_ref[0, 7]
    coulomb_k, inv_t, c2piv = (const_ref[0, 8], const_ref[0, 9],
                               const_ref[0, 10])
    alpha2, rc2sq2, fw_d0 = (const_ref[0, 11], const_ref[0, 12],
                             const_ref[0, 13])
    # exact-token gates ("fw" in "fwmath" is True as a substring test;
    # see blockg.py)
    ablate = frozenset(t for t in ablate.split(",") if t)
    skip_guest = "guest" in ablate
    skip_fw = "fw" in ablate
    skip_far = "far" in ablate
    skip_kspace = "kspace" in ablate
    skip_kstruct = "kstruct" in ablate
    skip_pos = "pos" in ablate
    JxyP_ = kw_ref.shape[1]
    cols0 = gbase if fw_on else 0          # first mutable (guest) column
    GS = S - cols0
    i_nm = 9                               # iscal col of n_mol[0]
    i_w = 9 + R + 1                        # iscal col of the window starts

    def pair_r2(pt_ref, x1, y1, z1, image_axis_mask=(True, True, True)):
        px = pt_ref[0, :][:, None]                          # (G*F, 1)
        py = pt_ref[1, :][:, None]
        pz = pt_ref[2, :][:, None]
        dx = x1 - px
        dy = y1 - py
        dz = z1 - pz
        if image_axis_mask[0]:
            dx = dx - ll[0] * jnp.round(dx * inv_l[0])
        if image_axis_mask[1]:
            dy = dy - ll[1] * jnp.round(dy * inv_l[1])
        if image_axis_mask[2]:
            dz = dz - ll[2] * jnp.round(dz * inv_l[2])
        return jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

    # the framework ghost table handles its own periodic images along the
    # sort axis; min-imaging dz there would remap far ghosts ONTO sites
    # already in the window (double counting)
    fw_imask = tuple(ax != fw_axis for ax in range(3))

    # ---- guest pair passes: dynamic loop over LIVE 128-col chunks ---------
    # Guest molecules occupy a compacted prefix of each type block, so the
    # glue passes the number of chunks that intersect any live molecule
    # (iscal col i_w+4); dead capacity padding costs nothing.
    n_live = iscal_ref[0, i_w + 4]

    def guest_chunk(ci, carry):
        ljacc, cacc = carry
        b = ci * 128                        # guest-relative (sliced tables)
        midc = site_midx_ref[0, _ds128(b, 128)]
        styc = site_type_ref[0, _ds128(b, 128)]
        smoc = site_mol_ref[0, _ds128(b, 128)]
        sqc = site_q_ref[0:1, _ds128(b, 128)]
        keeps_c = []
        pgs = []
        for g in range(G):
            nsel = jnp.full((128,), iscal_ref[g, i_nm],
                            jnp.int32) * (styc == 0)
            for r in range(1, R):
                nsel = jnp.where(styc == r, iscal_ref[g, i_nm + r], nsel)
            kg = ((midc < nsel) & (smoc != iscal_ref[g, 0])
                  & (smoc != iscal_ref[g, 1]))
            keeps_c.append(kg.astype(jnp.int32)[None, :])
            # pos_ref is the FULL (3, S) array - absolute column offset
            pgs.append(pos_ref[g, :, _ds128(cols0 + b, 128)])  # (3, 128)

        def expand_c(F):
            ones = jnp.ones((F, 1), jnp.int32)
            xs, ys, zs, ks = [], [], [], []
            for g in range(G):
                xs.append(jnp.broadcast_to(pgs[g][0:1, :], (F, 128)))
                ys.append(jnp.broadcast_to(pgs[g][1:2, :], (F, 128)))
                zs.append(jnp.broadcast_to(pgs[g][2:3, :], (F, 128)))
                ks.append(keeps_c[g] * ones)
            return (jnp.concatenate(xs, 0), jnp.concatenate(ys, 0),
                    jnp.concatenate(zs, 0), jnp.concatenate(ks, 0))

        epsl, sig2l = [], []
        for g in range(G):
            if nA == 1:
                epsl.append(epslj_ref[0:8, _ds128(b, 128)][:FL, :])
                sig2l.append(sig2lj_ref[0:8, _ds128(b, 128)][:FL, :])
            else:
                # Mosaic rejects dynamic sublane offsets it cannot prove
                # 8-aligned; gate the nA*nA static 8-row blocks by the
                # active-pair id instead (nA is tiny)
                pid_g = iscal_ref[g, 2]
                e_acc = s_acc = None
                for p in range(nA * nA):
                    w = (pid_g == p).astype(f32)
                    se = epslj_ref[p * 8:p * 8 + 8,
                                   _ds128(b, 128)][:FL, :] * w
                    ss = sig2lj_ref[p * 8:p * 8 + 8,
                                    _ds128(b, 128)][:FL, :] * w
                    e_acc = se if e_acc is None else e_acc + se
                    s_acc = ss if s_acc is None else s_acc + ss
                epsl.append(e_acc)
                sig2l.append(s_acc)
        eps = jnp.concatenate(epsl, axis=0)                 # (G*FL, 128)
        sig2 = jnp.concatenate(sig2l, axis=0)
        xL, yL, zL, keepL = expand_c(FL)
        r2 = pair_r2(ptlj_ref, xL, yL, zL)
        inv_r2 = 1.0 / r2
        sr2 = sig2 * inv_r2
        sr6 = sr2 * sr2 * sr2
        lj = 4.0 * eps * (sr6 * sr6 - sr6)
        ljsel = (r2 < rc2) & (keepL > 0) & (ljw_ref[0, :][:, None] > 0.0)
        ljacc = ljacc + jnp.sum(jnp.where(ljsel, lj, 0.0), axis=1,
                                keepdims=True)

        xQ, yQ, zQ, keepQ = expand_c(FQ)
        r2q = pair_r2(ptq_ref, xQ, yQ, zQ)
        inv_r = jax.lax.rsqrt(r2q)
        coul = (qw_ref[0, :][:, None] * sqc
                * _erfc(alpha * (r2q * inv_r)) * inv_r)
        csel = keepQ > 0
        if ggr2:
            # guest<->guest honest Coulomb cutoff (DIVERGENCES.md #22)
            csel = csel & (r2q < ggr2)
        cacc = cacc + jnp.sum(jnp.where(csel, coul, 0.0), axis=1,
                              keepdims=True)
        return (ljacc, cacc)

    lj0 = jnp.zeros((G * FL, 1), f32)
    c0g = jnp.zeros((G * FQ, 1), f32)
    if skip_guest:
        lj_rows, c_rows = lj0, c0g
    else:
        lj_rows, c_rows = jax.lax.fori_loop(0, n_live, guest_chunk,
                                            (lj0, c0g))

    if fw_on and not skip_fw:
        fx, fy, fz, feps, fsig2 = [], [], [], [], []
        for g in range(G):
            for side in range(2):
                c0 = iscal_ref[g, i_w + side] * 128
                blk = fwpq_ref[:, _ds128(c0, WL)]            # (4, WL)
                fx.append(jnp.broadcast_to(blk[0:1, :], (Lmax, WL)))
                fy.append(jnp.broadcast_to(blk[1:2, :], (Lmax, WL)))
                fz.append(jnp.broadcast_to(blk[2:3, :], (Lmax, WL)))
                if nA == 1:
                    feps.append(fweps_ref[side * Lmax:(side + 1) * Lmax,
                                          _ds128(c0, WL)])
                    fsig2.append(fwsig2_ref[side * Lmax:(side + 1) * Lmax,
                                            _ds128(c0, WL)])
                else:
                    # static row blocks gated by the active-pair id (see
                    # the guest-chunk note on Mosaic sublane alignment)
                    pid_g = iscal_ref[g, 2]
                    fe = fs = None
                    for p in range(nA * nA):
                        w = (pid_g == p).astype(f32)
                        r0 = p * 8 + side * Lmax
                        se = fweps_ref[r0:r0 + Lmax, _ds128(c0, WL)] * w
                        ss = fwsig2_ref[r0:r0 + Lmax, _ds128(c0, WL)] * w
                        fe = se if fe is None else fe + se
                        fs = ss if fs is None else fs + ss
                    feps.append(fe)
                    fsig2.append(fs)
        fxc = jnp.concatenate(fx, 0)                        # (G*FL, WL)
        fyc = jnp.concatenate(fy, 0)
        fzc = jnp.concatenate(fz, 0)
        fepsc = jnp.concatenate(feps, 0)
        fsig2c = jnp.concatenate(fsig2, 0)
        r2f = pair_r2(ptlj_ref, fxc, fyc, fzc, fw_imask)
        sr2f = fsig2c / r2f
        sr6f = sr2f * sr2f * sr2f
        ljf = 4.0 * fepsc * (sr6f * sr6f - sr6f)
        self_f = (r2f < rc2) & (ljw_ref[0, :][:, None] > 0.0)
        lj_rows = lj_rows + jnp.sum(jnp.where(self_f, ljf, 0.0), axis=1,
                                    keepdims=True)

    # ---- Coulomb pass: framework window -----------------------------------
    if fw_on and not skip_fw:
        cx, cy, cz, cq = [], [], [], []
        for g in range(G):
            for side in range(2):
                c0 = iscal_ref[g, i_w + 2 + side] * 128
                blk = fwpq_ref[:, _ds128(c0, WC)]            # (4, WC)
                cx.append(jnp.broadcast_to(blk[0:1, :], (Qmax, WC)))
                cy.append(jnp.broadcast_to(blk[1:2, :], (Qmax, WC)))
                cz.append(jnp.broadcast_to(blk[2:3, :], (Qmax, WC)))
                cq.append(jnp.broadcast_to(blk[3:4, :], (Qmax, WC)))
        cxc = jnp.concatenate(cx, 0)                        # (G*FQ, WC)
        cyc = jnp.concatenate(cy, 0)
        czc = jnp.concatenate(cz, 0)
        cqc = jnp.concatenate(cq, 0)
        r2c = pair_r2(ptq_ref, cxc, cyc, czc, fw_imask)
        inv_rc = jax.lax.rsqrt(r2c)
        coulf = (qw_ref[0, :][:, None] * cqc
                 * _erfc(alpha2 * (r2c * inv_rc)) * inv_rc)
        c_rows = c_rows + jnp.sum(jnp.where(r2c < rc2sq2, coulf, 0.0),
                                  axis=1, keepdims=True)

    def dotT(a, b):
        # phase-power -> k-grid expansion: b is a 0/1 SELECTOR, so the
        # 3-pass split read is BIT-EXACT at half the MXU passes of the
        # "highest" pin (kernels/common.py dot1h)
        return dot1h(a, b, (((0,), (0,)), ((), ())), split="a")

    # ---- shared phase power tables for ALL replicas (8-padded layout) -----
    # One (3, G*FK) build replaces G per-replica table builds; the same
    # power lists feed both the main k-grid and the far-field grid.
    GFK = G * FK
    if not skip_kstruct:
        # phase angles from POSITIONS: exact f32 VPU FMAs (a dot would
        # bf16-round the positions at DEFAULT or cost 6 MXU passes)
        ptk_c = ptk_ref[:, :]
        th_all = jnp.concatenate(
            [h2pi_ref[i, 0] * ptk_c[0:1, :] + h2pi_ref[i, 1] * ptk_c[1:2, :]
             + h2pi_ref[i, 2] * ptk_c[2:3, :] for i in range(3)],
            axis=0)                                         # (3, G*FK)
        if skip_kspace:
            th_all = th_all * 0.0
        cA, sA = jnp.cos(th_all), jnp.sin(th_all)
        nx = max(kx, kx2 if fw_on else 0)
        ny = max(ky, ky2 if fw_on else 0)
        nz = max(kz, kz2 if fw_on else 0)
        rex, imx = _powers(cA[0:1, :], sA[0:1, :], nx)
        rey, imy = _powers(cA[1:2, :], sA[1:2, :], ny)
        rez, imz = _powers(cA[2:3, :], sA[2:3, :], nz)

        wkrow = wkk_ref[0:1, :]
        pxT = jnp.concatenate(
            [jnp.concatenate([rex[j] * wkrow for j in range(kx + 1)], 0),
             jnp.concatenate([imx[j] * wkrow for j in range(kx + 1)], 0)],
            axis=1)                                         # (Jx, 2*GFK)
        pyT_re, pyT_im = _signed_table(rey[:ky + 1], imy[:ky + 1], ky)
        pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)     # (Jy, 2*GFK)
        pzT_re, pzT_im = _signed_table(rez[:kz + 1], imz[:kz + 1], kz,
                                       pad_to=JzP)          # (JzP, GFK)
        xe = dotT(pxT, ex_ref[:, :])                        # (2*GFK, JxyP)
        ye = dotT(pyT, ey_ref[:, :])
        t_re_all = xe[:GFK] * ye[:GFK] - xe[GFK:] * ye[GFK:]
        t_im_all = xe[:GFK] * ye[GFK:] + xe[GFK:] * ye[:GFK]

    # ---- far-field grid term (all G replicas in one MXU contraction) ------
    if fw_on and not skip_far and not skip_kstruct:
        qwrow = qwk_ref[0:1, :]
        px2 = jnp.concatenate(
            [jnp.concatenate([rex[j] * qwrow for j in range(kx2 + 1)], 0),
             jnp.concatenate([imx[j] * qwrow for j in range(kx2 + 1)], 0)],
            axis=1)                                         # (Jx2, 2*GFK)
        py2T_re, py2T_im = _signed_table(rey[:ky2 + 1], imy[:ky2 + 1], ky2)
        py2 = jnp.concatenate([py2T_re, py2T_im], axis=1)
        pz2T_re, pz2T_im = _signed_table(rez[:kz2 + 1], imz[:kz2 + 1], kz2,
                                         pad_to=Jz2P)
        xe2 = dotT(px2, ex2_ref[:, :])                      # (2*GFK, Jxy2P)
        ye2 = dotT(py2, ey2_ref[:, :])
        t2_re = xe2[:GFK] * ye2[:GFK] - xe2[GFK:] * ye2[GFK:]
        t2_im = xe2[:GFK] * ye2[GFK:] + xe2[GFK:] * ye2[:GFK]

        def dotL(a, b):  # contract the lane axis: (J, X) x (N, X) -> (J, N)
            # value-x-value: 3-pass bf16 on hardware, exact in interpret
            # (see blockg dotZ note)
            if vv3:
                return dot3(a, b, (((1,), (1,)), ((), ())))
            return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                       preferred_element_type=f32)

        c_re = c2re_ref[:, :]
        c_im = c2im_ref[:, :]
        M1 = dotL(c_re, t2_re) + dotL(c_im, t2_im)          # (Jz2P, GFK)
        M2 = dotL(c_im, t2_re) - dotL(c_re, t2_im)
        efar = jnp.sum(pz2T_re * M1 + pz2T_im * M2,
                       axis=0, keepdims=True)               # (1, GFK)
        efar = efar + fw_d0 * qwrow
    elif fw_on:
        efar = jnp.zeros((1, GFK), f32)
    else:
        efar = None

    # ---- per-replica: k-space delta + Metropolis + commits -----------------
    flag_rows = []
    for g in range(G):
        e_lj0 = jnp.sum(lj_rows[g * FL:g * FL + Lmax, :])
        e_lj1 = jnp.sum(lj_rows[g * FL + Lmax:(g + 1) * FL, :])
        e_c0 = jnp.sum(c_rows[g * FQ:g * FQ + Qmax, :]) * coulomb_k
        e_c1 = jnp.sum(c_rows[g * FQ + Qmax:(g + 1) * FQ, :]) * coulomb_k
        if fw_on:
            e_c0 = e_c0 + jnp.sum(efar[0:1, g * FK:g * FK + Qmax])
            e_c1 = e_c1 + jnp.sum(efar[0:1, g * FK + Qmax:g * FK + 2 * Qmax])

        ar = amp_re_ref[g]
        ai = amp_im_ref[g]
        if skip_kstruct:
            d_re = jnp.zeros((JzP, JxyP_), f32)
            d_im = jnp.zeros((JzP, JxyP_), f32)
            cross = jnp.sum(kw_ref[:, :] * (ar * d_re + ai * d_im))
        else:
            sl = slice(g * FK, (g + 1) * FK)
            t_re = t_re_all[sl]
            t_im = t_im_all[sl]
            t_both = jnp.concatenate(
                [jnp.concatenate([t_re, t_im], axis=1),
                 jnp.concatenate([-t_im, t_re], axis=1)], axis=0)
            pzT_g = jnp.concatenate([pzT_re[:, sl], pzT_im[:, sl]], axis=1)
            if vv3:  # see blockg dotZ note
                d_both = dot3(pzT_g, t_both)
            else:
                d_both = jnp.dot(pzT_g, t_both,
                                 preferred_element_type=f32)
            d_re = d_both[:, :JxyP_]
            d_im = d_both[:, JxyP_:]
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

        # commits touch only guest columns; frozen columns copy through
        s_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, GS), 1)[0, :]
                 + cols0)
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
        if skip_pos:
            in_new = in_new & (s_idx < 0)
            in_old = in_old & (s_idx < 0)
        out = pos_ref[g][:, cols0:]
        for a in range(A_act):
            sel_o = ((rel_old == a) & in_old)[None, :]
            out = jnp.where(sel_o,
                            lastcols_ref[:, g * A_act + a][:, None], out)
        for a in range(A_act):
            sel_n = ((rel_new == a) & in_new)[None, :]
            out = jnp.where(sel_n,
                            newcols_ref[:, g * A_act + a][:, None], out)
        if cols0:
            pos_out[g, :, :cols0] = pos_ref[g][:, :cols0]
            pos_out[g, :, cols0:] = out
        else:
            pos_out[g] = out

        flag_rows.append(jnp.stack([accf, e_recip_new, delta_e,
                                    e_lj0, e_lj1, e_c0, e_c1, p_acc]))

    flags_out[:, :] = jnp.stack(flag_rows, axis=0)


def mc_step_core_grouped(spec, pos_g, amp_re_g, amp_im_g,
                         iscal, fscal, ptlj, ljw, ptq, qw, wk,
                         newcols, lastcols, *, interpret=False):
    """Grouped core for G replicas (the caller vmaps over B // G groups).
    pos_g (G,3,S), amp_* (G,JzP,JxyP); ptlj/ptq are (G, F, 3), ljw/qw
    (G, F), wk (G, FQ). iscal (G, W) carries the fw window block starts in
    its last 4 columns when spec.fw_split. Returns
    (amp_re', amp_im', pos', flags (G, 8))."""
    G = pos_g.shape[0]
    JzP, JxyP = spec.amp_shape
    S = spec.S
    gb = spec.guest_base if spec.fw_split else 0
    FL = 2 * spec.Lmax
    FQ = 2 * spec.Qmax
    FK = ((FQ + 7) // 8) * 8
    kx, ky, kz = spec.kmax_xyz
    kx2, ky2, kz2 = spec.kmax2_xyz
    Jz2P, _ = spec.amp2_shape
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"

    consts = jnp.concatenate([
        1.0 / spec.box_diag, spec.box_diag,
        jnp.stack([spec.alpha, spec.cutoff * spec.cutoff,
                   jnp.asarray(COULOMB_K, f), 1.0 / spec.temp_K,
                   COULOMB_K * TWOPI / spec.volume,
                   spec.alpha2, spec.rcut2 * spec.rcut2, spec.fw_d0]),
        jnp.zeros(2, f)]).astype(f).reshape(1, 16)

    # 8-padded per-replica charged-row operands for the shared phase tables
    pad = ((0, 0), (0, FK - FQ), (0, 0))
    ptk = jnp.pad(ptq, pad).transpose(2, 0, 1).reshape(3, G * FK)
    qwk = jnp.pad(qw, pad[:2]).reshape(1, G * FK)
    wkk = jnp.pad(wk, pad[:2]).reshape(1, G * FK)

    import os
    kernel = functools.partial(
        _stepg_kernel, G=G, R=spec.R, nA=spec.n_active, S=S, FL=FL, FQ=FQ,
        FK=FK, A_act=spec.A_act, Lmax=spec.Lmax, Qmax=spec.Qmax,
        kx=kx, ky=ky, kz=kz, JzP=JzP,
        fw_on=spec.fw_split, gbase=spec.guest_base, SG=spec.fw_SG,
        WL=spec.fw_WL, WC=spec.fw_WC, kx2=kx2, ky2=ky2, kz2=kz2,
        Jz2P=Jz2P, fw_axis=spec.fw_axis,
        ggr2=(spec.gg_rcut * spec.gg_rcut if spec.gg_cut else 0.0),
        vv3=not interpret,
        ablate=os.environ.get("MANIAC_KABLATE", ""))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re2, amp_im2, pos2, flags = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, 3, S), f),
                   jax.ShapeDtypeStruct((G, 8), f)),
        in_specs=[vmem] * 32,
        out_specs=(vmem,) * 4,
        input_output_aliases={29: 0, 30: 1, 31: 2},
        # the shared all-G phase/far-field tables exceed the default 16 MB
        # scoped-vmem limit; v5e has 128 MB of physical VMEM
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(iscal, fscal,
      ptlj.transpose(2, 0, 1).reshape(3, G * FL), ljw.reshape(1, G * FL),
      ptq.transpose(2, 0, 1).reshape(3, G * FQ), qw.reshape(1, G * FQ),
      ptk, qwk, wkk, newcols, lastcols,
      consts, spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel, spec.k_weights,
      spec.eps_pair_lj[:, gb:], spec.sig2_pair_lj[:, gb:],
      spec.site_q.reshape(1, S)[:, gb:], spec.site_mol.reshape(1, S)[:, gb:],
      spec.site_type.reshape(1, S)[:, gb:],
      spec.site_midx.reshape(1, S)[:, gb:],
      spec.fw_pq_g, spec.fw_eps_g, spec.fw_sig2_g,
      spec.c2_re, spec.c2_im, spec.ex2_sel, spec.ey2_sel,
      amp_re_g, amp_im_g, pos_g)
    return amp_re2, amp_im2, pos2, flags
