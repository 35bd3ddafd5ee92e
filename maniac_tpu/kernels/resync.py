"""Pallas TPU kernel for full structure-factor resynthesis (the per-block
f32 drift bound, DIVERGENCES.md #13).

The XLA path (physics/energy.py full_amplitudes) materializes
(chunk, JxyP) expansion temporaries per site chunk; under vmap at bench
scale that is ~45 GB of HBM traffic per resync (~100 ms/block). Here the
whole synthesis accumulates in VMEM: HBM traffic is one read of positions
and one write of the amplitudes (~130 MB at B=1024).

Math identical to physics/energy.py::_separable_amp summed over all active
sites; E_RECIP is recomputed from the fresh amplitudes in the same pass.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..constants import COULOMB_K, TWOPI
from .common import _powers, _signed_table, dot1h


def _live_regions(spec, lo: int, CH: int):
    """Per-type (lo_chunk, capacity_chunks, A_t, type_id) tuples covering
    [lo, S), CH-aligned; returns None if some region base/size is not a
    CH multiple (caller falls back to CH=128, which always aligns)."""
    bases = list(spec.site_base_list) + [spec.S]
    regs = []
    for r in range(spec.R):
        b0, b1 = bases[r], bases[r + 1]
        if b1 <= lo or b1 == b0:
            continue
        if b0 < lo or (b0 - lo) % CH or (b1 - b0) % CH:
            return None
        regs.append(((b0 - lo) // CH, (b1 - b0) // CH,
                     int(spec.A_list[r]), r))
    return tuple(regs)


def _resync_kernel(nmol_ref,       # VMEM (1, 8) int32 populations
                   eng_ref,        # VMEM (1, 8) f32 running energy components
                   pos_ref,        # VMEM (3, S)
                   h2pi_ref,       # VMEM (3, 3) shared
                   ex_ref,         # VMEM (Jx, JxyP) shared
                   ey_ref,         # VMEM (Jy, JxyP) shared
                   kw_ref,         # VMEM (JzP, JxyP) shared
                   site_q_ref,     # VMEM (1, S) shared
                   site_type_ref,  # VMEM (1, S) int32 shared
                   site_midx_ref,  # VMEM (1, S) int32 shared
                   fw_re_ref,      # VMEM (JzP, JxyP) constant fw amplitudes
                   fw_im_ref,
                   amp_re_out, amp_im_out,
                   eng_out,        # (1, 8): energy with E_RECIP/E_TOT fixed
                   *, R: int, S: int, CH: int, kx: int, ky: int, kz: int,
                   JzP: int, lo: int, regions: tuple):
    f32 = jnp.float32
    # the frozen framework's contribution is constant - start from it and
    # synthesize only the mutable guest columns [lo, S)
    amp_re_out[:, :] = fw_re_ref[:, :]
    amp_im_out[:, :] = fw_im_ref[:, :]

    def chunk_body(ci, _):
        # CH==128 chunks start 128-aligned: hint Mosaic (lane-aligned copy)
        st = lo + ci * CH
        sl = pl.ds(pl.multiple_of(st, 128) if CH % 128 == 0 else st, CH)
        pos_c = pos_ref[:, sl]                              # (3, CH)
        midx = site_midx_ref[0:1, sl][0, :]
        stype = site_type_ref[0:1, sl][0, :]
        nsel = jnp.full((CH,), nmol_ref[0, 0], jnp.int32) * (stype == 0)
        for r in range(1, R):
            nsel = jnp.where(stype == r, nmol_ref[0, r], nsel)
        w = jnp.where(midx < nsel, site_q_ref[0:1, sl][0, :], 0.0)[None, :]
        # phase angles from POSITIONS: exact f32 VPU FMAs
        th = jnp.concatenate(
            [h2pi_ref[i, 0] * pos_c[0:1, :] + h2pi_ref[i, 1] * pos_c[1:2, :]
             + h2pi_ref[i, 2] * pos_c[2:3, :] for i in range(3)], axis=0)
        rex, imx = _powers(jnp.cos(th[0:1, :]), jnp.sin(th[0:1, :]), kx)
        rey, imy = _powers(jnp.cos(th[1:2, :]), jnp.sin(th[1:2, :]), ky)
        rez, imz = _powers(jnp.cos(th[2:3, :]), jnp.sin(th[2:3, :]), kz)
        pxT = jnp.concatenate([jnp.concatenate(rex, axis=0),
                               jnp.concatenate(imx, axis=0)], axis=1)
        pyT_re, pyT_im = _signed_table(rey, imy, ky)
        pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)
        pzT_re, pzT_im = _signed_table(rez, imz, kz, pad_to=JzP)
        pzT = jnp.concatenate([pzT_re, pzT_im], axis=1)     # (JzP, 2CH)

        def dotT(a, b):
            # phase-power -> k-grid expansion (0/1 selector): bit-exact
            # 3-pass split read (kernels/common.py dot1h)
            return dot1h(a, b, (((0,), (0,)), ((), ())), split="a")

        xe = dotT(pxT, ex_ref[:, :])                        # (2CH, JxyP)
        ye = dotT(pyT, ey_ref[:, :])
        xe_re, xe_im = xe[:CH, :], xe[CH:, :]
        ye_re, ye_im = ye[:CH, :], ye[CH:, :]
        wc = w[0, :][:, None]
        t_re = (xe_re * ye_re - xe_im * ye_im) * wc
        t_im = (xe_re * ye_im + xe_im * ye_re) * wc
        t_both = jnp.concatenate(
            [jnp.concatenate([t_re, t_im], axis=1),
             jnp.concatenate([-t_im, t_re], axis=1)], axis=0)
        d_both = jnp.dot(pzT, t_both, preferred_element_type=f32)
        JXY = t_re.shape[1]
        amp_re_out[:, :] = amp_re_out[:, :] + d_both[:, :JXY]
        amp_im_out[:, :] = amp_im_out[:, :] + d_both[:, JXY:]
        return 0

    # only the live molecule prefix of each type region carries nonzero
    # weights (w masks midx >= n), so the synthesis loops stop at the
    # occupancy bound per region - bit-identical (skipped chunks add 0.0)
    for lo_c, reg_c, A_t, r in regions:
        nmax = jnp.max(nmol_ref[:, r])
        n_c = jnp.minimum((nmax * A_t + CH - 1) // CH, reg_c)
        jax.lax.fori_loop(lo_c, lo_c + n_c, chunk_body, 0)

    # eng slot 7 carries C * 2pi / V (a traced spec constant)
    e_recip = jnp.sum(kw_ref[:, :] * (amp_re_out[:, :] ** 2
                                      + amp_im_out[:, :] ** 2)) \
        * eng_ref[0, 7]
    # energy row layout: [E_RECIP, lj, coul, self, intra, E_TOT, 0, 0]
    e_tot_new = eng_ref[0, 5] + e_recip - eng_ref[0, 0]
    tot_sel = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)[0, :]
    row = eng_ref[0, :]
    row = jnp.where(tot_sel == 0, e_recip, row)
    row = jnp.where(tot_sel == 5, e_tot_new, row)
    eng_out[0, :] = row


def resync_pallas(spec, state, *, interpret=False):
    """Single-replica amplitude resynthesis (vmap batches it). Returns
    (amp_re, amp_im, energy)."""
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"
    JzP, JxyP = spec.amp_shape
    S = spec.S
    kx, ky, kz = spec.kmax_xyz
    lo = spec.guest_base if spec.fw_split else 0
    # chunk must divide the synthesized range AND be a multiple of 128
    # (lane-aligned dynamic ref slices; bases/S are 128-aligned)
    CH, regions = 128, None
    for c in (512, 384, 256):
        if (S - lo) % c == 0:
            regions = _live_regions(spec, lo, c)
            if regions is not None:
                CH = c
                break
    if regions is None:
        regions = _live_regions(spec, lo, 128)

    nmol = jnp.zeros((1, 8), jnp.int32).at[0, :spec.R + 1].set(state.n_mol)
    eng = jnp.zeros((1, 8), f).at[0, :6].set(state.energy)
    eng = eng.at[0, 7].set(COULOMB_K * TWOPI / spec.volume)

    kernel = functools.partial(
        _resync_kernel, R=spec.R, S=S, CH=CH, kx=kx, ky=ky, kz=kz, JzP=JzP,
        lo=lo, regions=regions)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re, amp_im, eng2 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((JzP, JxyP), f),
                   jax.ShapeDtypeStruct((1, 8), f)),
        in_specs=[vmem] * 12,
        out_specs=(vmem, vmem, vmem),
        interpret=interpret,
    )(nmol, eng, state.pos, spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel,
      spec.k_weights, spec.site_q.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S),
      spec.fw_amp_re.astype(f), spec.fw_amp_im.astype(f))
    return amp_re, amp_im, eng2[0, :6]


def _resyncg_kernel(nmol_ref,       # VMEM (G, 8) int32
                    eng_ref,        # VMEM (G, 8) f32
                    pos_ref,        # VMEM (G, 3, S)
                    h2pi_ref, ex_ref, ey_ref, kw_ref,
                    site_q_ref, site_type_ref, site_midx_ref,   # (1, S)
                    fw_re_ref, fw_im_ref,
                    amp_re_out,     # VMEM (G, JzP, JxyP)
                    amp_im_out,
                    eng_out,        # VMEM (G, 8)
                    *, G: int, R: int, S: int, CH: int, kx: int, ky: int,
                    kz: int, JzP: int, lo: int, regions: tuple):
    """Grouped resynthesis: G replicas per program. The per-chunk phase
    tables are built for ALL replicas at once on (1, G*CH) rows (the
    per-replica version was launch-overhead bound at B=1024); only the
    final (JzP, 2CH)@(2CH, 2JxyP) contraction is per replica."""
    f32 = jnp.float32
    for g in range(G):
        amp_re_out[g] = fw_re_ref[:, :]
        amp_im_out[g] = fw_im_ref[:, :]



    def chunk_body(ci, _):
        # CH==128 chunks start 128-aligned: hint Mosaic (lane-aligned copy)
        st = lo + ci * CH
        sl = pl.ds(pl.multiple_of(st, 128) if CH % 128 == 0 else st, CH)
        midx = site_midx_ref[0:1, sl][0, :]
        stype = site_type_ref[0:1, sl][0, :]
        sq = site_q_ref[0:1, sl][0, :]
        # batched phase tables: all replicas' chunk columns side by side
        pos_cat = jnp.concatenate(
            [pos_ref[g, :, sl] for g in range(G)], axis=1)   # (3, G*CH)
        # phase angles from POSITIONS: exact f32 VPU FMAs
        th = jnp.concatenate(
            [h2pi_ref[i, 0] * pos_cat[0:1, :]
             + h2pi_ref[i, 1] * pos_cat[1:2, :]
             + h2pi_ref[i, 2] * pos_cat[2:3, :] for i in range(3)], axis=0)
        rex, imx = _powers(jnp.cos(th[0:1, :]), jnp.sin(th[0:1, :]), kx)
        rey, imy = _powers(jnp.cos(th[1:2, :]), jnp.sin(th[1:2, :]), ky)
        rez, imz = _powers(jnp.cos(th[2:3, :]), jnp.sin(th[2:3, :]), kz)
        # fold per-replica active-site weights into the x tables
        ws = []
        for g in range(G):
            nsel = jnp.full((CH,), nmol_ref[g, 0], jnp.int32) * (stype == 0)
            for r in range(1, R):
                nsel = jnp.where(stype == r, nmol_ref[g, r], nsel)
            ws.append(jnp.where(midx < nsel, sq, 0.0)[None, :])
        wrow = jnp.concatenate(ws, axis=1)                   # (1, G*CH)
        pxT = jnp.concatenate(
            [jnp.concatenate([r * wrow for r in rex], axis=0),
             jnp.concatenate([i * wrow for i in imx], axis=0)],
            axis=1)                                          # (Jx, 2*G*CH)
        pyT_re, pyT_im = _signed_table(rey, imy, ky)
        pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)
        pzT_re, pzT_im = _signed_table(rez, imz, kz, pad_to=JzP)

        def dotT(a, b):
            # phase-power -> k-grid expansion (0/1 selector): bit-exact
            # 3-pass split read (kernels/common.py dot1h)
            return dot1h(a, b, (((0,), (0,)), ((), ())), split="a")

        GCH = G * CH
        xe = dotT(pxT, ex_ref[:, :])                         # (2*GCH, JxyP)
        ye = dotT(pyT, ey_ref[:, :])
        t_re = xe[:GCH] * ye[:GCH] - xe[GCH:] * ye[GCH:]
        t_im = xe[:GCH] * ye[GCH:] + xe[GCH:] * ye[:GCH]
        for g in range(G):
            gsl = slice(g * CH, (g + 1) * CH)
            t_both = jnp.concatenate(
                [jnp.concatenate([t_re[gsl], t_im[gsl]], axis=1),
                 jnp.concatenate([-t_im[gsl], t_re[gsl]], axis=1)], axis=0)
            pzT_g = jnp.concatenate([pzT_re[:, gsl], pzT_im[:, gsl]],
                                    axis=1)                  # (JzP, 2CH)
            d_both = jnp.dot(pzT_g, t_both, preferred_element_type=f32)
            JXY = t_re.shape[1]
            amp_re_out[g] = amp_re_out[g] + d_both[:, :JXY]
            amp_im_out[g] = amp_im_out[g] + d_both[:, JXY:]
        return 0

    # only the live molecule prefix of each type region carries nonzero
    # weights (w masks midx >= n), so the synthesis loops stop at the
    # occupancy bound per region - bit-identical (skipped chunks add 0.0)
    for lo_c, reg_c, A_t, r in regions:
        nmax = jnp.max(nmol_ref[:, r])
        n_c = jnp.minimum((nmax * A_t + CH - 1) // CH, reg_c)
        jax.lax.fori_loop(lo_c, lo_c + n_c, chunk_body, 0)

    rows = []
    for g in range(G):
        e_recip = jnp.sum(kw_ref[:, :] * (amp_re_out[g] ** 2
                                          + amp_im_out[g] ** 2)) \
            * eng_ref[g, 7]
        e_tot_new = eng_ref[g, 5] + e_recip - eng_ref[g, 0]
        tot_sel = jax.lax.broadcasted_iota(jnp.int32, (1, 8), 1)[0, :]
        row = eng_ref[g, :]
        row = jnp.where(tot_sel == 0, e_recip, row)
        row = jnp.where(tot_sel == 5, e_tot_new, row)
        rows.append(row)
    eng_out[:, :] = jnp.stack(rows, axis=0)


def resync_pallas_grouped(spec, states_g, *, interpret=False):
    """Grouped resynthesis for G replicas in one program. states_g has a
    leading G axis. Returns (amp_re (G,...), amp_im, energy (G, 6))."""
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"
    G = states_g.n_mol.shape[0]
    JzP, JxyP = spec.amp_shape
    S = spec.S
    kx, ky, kz = spec.kmax_xyz
    lo = spec.guest_base if spec.fw_split else 0
    CH, regions = 128, None
    for c in (256,):
        if (S - lo) % c == 0:
            regions = _live_regions(spec, lo, c)
            if regions is not None:
                CH = c
                break
    if regions is None:
        regions = _live_regions(spec, lo, 128)

    nmol = jnp.zeros((G, 8), jnp.int32).at[:, :spec.R + 1].set(
        states_g.n_mol)
    eng = jnp.zeros((G, 8), f).at[:, :6].set(states_g.energy)
    eng = eng.at[:, 7].set(COULOMB_K * TWOPI / spec.volume)

    kernel = functools.partial(
        _resyncg_kernel, G=G, R=spec.R, S=S, CH=CH, kx=kx, ky=ky, kz=kz,
        JzP=JzP, lo=lo, regions=regions)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    amp_re, amp_im, eng2 = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, 8), f)),
        in_specs=[vmem] * 12,
        out_specs=(vmem, vmem, vmem),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(nmol, eng, states_g.pos, spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel,
      spec.k_weights, spec.site_q.reshape(1, S),
      spec.site_type.reshape(1, S), spec.site_midx.reshape(1, S),
      spec.fw_amp_re.astype(f), spec.fw_amp_im.astype(f))
    return amp_re, amp_im, eng2[:, :6]
