"""Grouped WHOLE-BLOCK Pallas kernel: G replicas x n_steps per program.

The per-step grouped kernel (kernels/stepg.py) still pays, every step, the
HBM read+write of G replicas' positions and amplitudes, the re-read of the
shared tables, and an XLA glue layer (proposal, footprint one-hots,
bookkeeping). Here the whole block runs inside ONE program: state
(pos/com/amplitudes/populations/energies/counters) stays resident in VMEM
for all n_steps steps, the tables are DMA'd once per block, and the
proposal logic is VECTORIZED ACROSS THE G REPLICA LANES - every per-move
scalar (move class, molecule pick, gates, COM components, rotation-matrix
entries, acceptance) is a (1, G) lane row, so the in-kernel glue costs a
few hundred row ops per step instead of G serial scalar storms (the
failure mode of the per-replica block kernel, kernels/block.py).

Scope (dispatch-gated in kernels/__init__.py): float32, orthorhombic,
ONE active residue type (n_active == 1 - no swap), no reservoir, grouped
LJ rows (2*Lmax <= 8). The single active type makes every per-type select
a trace-time constant and every footprint-extraction matrix static. The
static-framework split (fw_split) is supported and is the intended
regime; fw_split=False also works (cols0 = 0).

Physics identical to mc/moves.py (the XLA oracle); the pair/k-space/
far-field section mirrors kernels/stepg.py line for line. Parity is
pinned by tests/test_blockg.py.

Uniform stream layout: (n_steps, NU*G), quantity-major columns
(u[q*G + g] = uniform q of replica g), drawn from the SAME per-replica
keys as the scan path so trajectories match it exactly.
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

# const row layout (1, 32) f32
_CF = dict(INVL=0, L=3, ALPHA=6, RC2=7, CK=8, INVT=9, C2PIV=10, PCUM=11,
           VOL=15, LO=16, H=19, TRANS=28, ROT=29, ALPHA2=30, RC2SQ2=31)
# second const row (1, 8) f32: activity, self_energy, fw_d0
_CG = dict(ACT=0, SELF=1, FWD0=2)
# int const row (1, 16): A, cap, site_base, mol_base, Mtot
_CI = dict(A=0, CAP=1, SB=2, MB=3, MTOT=4)


def _blockg_kernel(
        uniforms_ref,    # VMEM (n_steps, NU*G) quantity-major uniforms
        cstf_ref,        # VMEM (1, 32) f32 constants
        cstg_ref,        # VMEEM (1, 8) f32 per-type constants
        csti_ref,        # VMEM (1, 16) int32 constants
        h2pi_ref, ex_ref, ey_ref, kw_ref,
        epslj_ref,       # VMEM (8, GS) single-type LJ rows, guest cols
        sig2lj_ref,      # VMEM (8, GS)
        site_q_ref, site_mol_ref, site_type_ref, site_midx_ref,  # (1, GS)
        qrow_ref,        # VMEM (1, A) site charges of the active type
        templ_ref,       # VMEM (3, A) rigid insertion template
        fwpq_ref,        # VMEM (4, SG)
        fweps_ref,       # VMEM (8, SG)
        fwsig2_ref,      # VMEM (8, SG)
        fwbm_ref,        # VMEM (1, NBG) per-block max sort coordinate
        c2re_ref, c2im_ref, ex2_ref, ey2_ref,
        nmol_in_ref,     # VMEM (1, G) int32 initial populations (type T)
        eng_in_ref,      # VMEM (8, G) f32 initial energy components
        trans_ref,       # VMEM (1, G) per-replica translation step
        rot_ref,         # VMEM (1, G) per-replica rotation step
        pos_ref, com_ref, amp_re_ref, amp_im_ref,   # aliased state
        pos_out, com_out, amp_re_out, amp_im_out,
        nmol_out,        # VMEM (1, G) int32
        eng_out,         # VMEM (8, G)
        cnt_out,         # VMEM (16, G) trials rows 0-4, accepts 8-12,
                         #   overflow rejections row 5
        *, n_steps: int, NU: int, G: int, S: int, A: int, Lmax: int,
        Qmax: int, kx: int, ky: int, kz: int, JzP: int,
        fw_on: bool, gbase: int, SG: int, NBG: int, WL: int, WC: int,
        kx2: int, ky2: int, kz2: int, Jz2P: int, fw_axis: int,
        lj_atoms: tuple, q_atoms: tuple, ablate: str = ""):
    f32 = jnp.float32
    skip_guest = "guest" in ablate
    skip_fw = "fw" in ablate
    skip_far = "far" in ablate
    skip_kstruct = "kstruct" in ablate
    skip_pos = "pos" in ablate
    skip_fpread = "fpread" in ablate
    skip_ampc = "ampc" in ablate
    FL, FQ = 2 * Lmax, 2 * Qmax
    FK = ((FQ + 7) // 8) * 8
    JxyP_ = kw_ref.shape[1]
    cols0 = gbase if fw_on else 0
    GS = S - cols0

    def cf(i):
        return cstf_ref[0, i]

    ll = (cf(_CF["L"]), cf(_CF["L"] + 1), cf(_CF["L"] + 2))
    inv_l = (cf(_CF["INVL"]), cf(_CF["INVL"] + 1), cf(_CF["INVL"] + 2))
    alpha, rc2 = cf(_CF["ALPHA"]), cf(_CF["RC2"])
    coulomb_k, inv_t, c2piv = cf(_CF["CK"]), cf(_CF["INVT"]), cf(_CF["C2PIV"])
    alpha2, rc2sq2 = cf(_CF["ALPHA2"]), cf(_CF["RC2SQ2"])
    fw_d0 = cstg_ref[0, _CG["FWD0"]]
    activity = cstg_ref[0, _CG["ACT"]]
    self_e = cstg_ref[0, _CG["SELF"]]
    A_i = csti_ref[0, _CI["A"]]
    cap_i = csti_ref[0, _CI["CAP"]]
    SB = csti_ref[0, _CI["SB"]]
    MB = csti_ref[0, _CI["MB"]]
    Mtot = csti_ref[0, _CI["MTOT"]]
    MP = com_ref.shape[2]                      # Mtot + 1 columns

    # ---- static expansion / selection matrices (hoisted, trace consts) ----
    GA = G * A
    rga = jax.lax.broadcasted_iota(jnp.int32, (G, GA), 0)
    cga = jax.lax.broadcasted_iota(jnp.int32, (G, GA), 1)
    E_exp = (rga == cga // A).astype(f32)                  # (G, GA) expand
    # atom-extraction: EA (GA, A*G), col a*G+g -> row g*A+a
    r1 = jax.lax.broadcasted_iota(jnp.int32, (GA, A * G), 0)
    c1 = jax.lax.broadcasted_iota(jnp.int32, (GA, A * G), 1)
    E_atom = ((r1 // A == c1 % G) & (r1 % A == c1 // G)).astype(f32)
    # LJ/charged row selection (static single-type patterns)
    GFL, GFQ, GFK = G * FL, G * FQ, G * FK

    def sel_mat(atoms, Fh, F):
        # (GA, G*F): col g*F + side*Fh + j <- row g*A + atoms[j], per side
        rr = jax.lax.broadcasted_iota(jnp.int32, (GA, G * F), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (GA, G * F), 1)
        gmatch = (rr // A) == (cc // F)
        a_of = jnp.full((GA, G * F), -1, jnp.int32)
        jcol = cc % F
        for side in range(2):
            for j, aj in enumerate(atoms):
                a_of = jnp.where(jcol == side * Fh + j, aj, a_of)
        return (gmatch & ((rr % A) == a_of)).astype(f32)

    E_lj = sel_mat(lj_atoms, Lmax, FL)                     # (GA, GFL)
    E_q = sel_mat(q_atoms, Qmax, FQ)                       # (GA, GFQ)
    E_k = sel_mat(q_atoms, Qmax, FK)                       # (GA, GFK)
    # side-of-column rows
    side_fl = ((jax.lax.broadcasted_iota(jnp.int32, (1, GFL), 1) % FL)
               >= Lmax)
    side_fq = ((jax.lax.broadcasted_iota(jnp.int32, (1, GFQ), 1) % FQ)
               >= Qmax)
    ik = jax.lax.broadcasted_iota(jnp.int32, (1, GFK), 1) % FK
    side_fk = (ik >= Qmax) & (ik < FQ)
    live_fk = ik < FQ
    # per-column charge patterns
    qpat_q = jnp.zeros((1, GFQ), f32)
    qpat_k = jnp.zeros((1, GFK), f32)
    iq = jax.lax.broadcasted_iota(jnp.int32, (1, GFQ), 1) % FQ
    for j, aj in enumerate(q_atoms):
        qv = qrow_ref[0, aj]
        qpat_q = jnp.where((iq % Qmax == j) & (iq // Qmax <= 1), qv, qpat_q)
        qpat_k = jnp.where(((ik % Qmax) == j) & live_fk, qv, qpat_k)
    # templ tiling: (3, A) -> (3, GA) with col g*A+a = templ[:, a]
    rt = jax.lax.broadcasted_iota(jnp.int32, (A, GA), 0)
    ct = jax.lax.broadcasted_iota(jnp.int32, (A, GA), 1)
    E_tile = (rt == ct % A).astype(f32)                    # (A, GA)
    templ_tiled = jnp.dot(templ_ref[:, :], E_tile,
                          preferred_element_type=f32)      # (3, GA)
    qrow_tiled = jnp.dot(qrow_ref[:, :], E_tile,
                         preferred_element_type=f32)       # (1, GA)

    # (G, G*F) static expansion of per-replica rows to footprint layouts
    def g_exp_mat(F):
        rr = jax.lax.broadcasted_iota(jnp.int32, (G, G * F), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (G, G * F), 1)
        return (rr == cc // F).astype(f32)

    Eg_fl = g_exp_mat(FL)
    Eg_fq = g_exp_mat(FQ)
    Eg_fk = g_exp_mat(FK)

    fw_imask = tuple(ax != fw_axis for ax in range(3))

    # copy initial state into the aliased outputs / running rows
    pos_out[...] = pos_ref[...]
    com_out[...] = com_ref[...]
    amp_re_out[...] = amp_re_ref[...]
    amp_im_out[...] = amp_im_ref[...]
    nmol_out[...] = nmol_in_ref[...]
    eng_out[...] = eng_in_ref[...]
    cnt_out[...] = jnp.zeros((16, G), f32)

    def step_body(t, carry):
        u = uniforms_ref[pl.ds(t, 1), :]                    # (1, NU*G)

        def urow(q):
            return u[0:1, q * G:(q + 1) * G]                # (1, G)

        # ---- move class (vectorized rows) --------------------------------
        um = urow(0)
        is_trans = um <= cf(_CF["PCUM"])
        is_rot = (~is_trans) & (um <= cf(_CF["PCUM"] + 1))
        is_indel = (~is_trans) & (~is_rot) & (um <= cf(_CF["PCUM"] + 2))
        dead = (~is_trans) & (~is_rot) & (~is_indel)
        is_create = is_indel & (urow(1) <= PROB_CREATE_DELETE)
        is_delete = is_indel & (~is_create)
        move = jnp.where(is_create, 0, jnp.where(is_delete, 1,
                jnp.where(is_trans, 2, jnp.where(is_rot, 3, 4))))
        insert = is_create
        remove = is_delete
        w_old = is_trans | is_rot | is_delete
        w_new = is_trans | is_rot | is_create

        def uint(uu, n):
            return jnp.minimum((uu * n.astype(f32)).astype(jnp.int32),
                               n - 1)

        n_row = nmol_out[0:1, :]                            # (1, G) int32
        nf = n_row.astype(f32)
        m_old = uint(urow(13), jnp.maximum(n_row, 1))
        # int-select then one compare (bool-branch selects lower to an
        # i8->i1 truncation Mosaic rejects)
        has_rotatable = (n_row > 0).astype(jnp.int32) * (1 if A > 1 else 0)
        valid_i = jnp.where(is_create, 1,
                            jnp.where(is_rot, has_rotatable,
                                      (n_row > 0).astype(jnp.int32)))
        valid = (valid_i > 0) & (~dead)
        cap_blocked = insert & (n_row >= cap_i)

        site_start_old = SB + m_old * A_i                   # (1, G)
        mol_slot_old = MB + m_old
        nmin = jnp.minimum(n_row, cap_i - 1)
        slot_new = jnp.where(insert, MB + nmin, mol_slot_old)
        site_start_new = jnp.where(insert, SB + nmin * A_i, site_start_old)
        last = jnp.maximum(n_row - 1, 0)
        start_last = SB + last * A_i
        slot_last = MB + last

        # ---- per-replica COM + footprint reads (small one-hot matmuls) ---
        comcols = []
        fpcols = []
        for g in range(G):
            if skip_fpread:
                comcols.append(jnp.zeros((3, 2), f32))
                fpcols.append(jnp.zeros((3, 2 * A), f32))
                continue
            mi = jax.lax.broadcasted_iota(jnp.int32, (MP, 2), 0)
            cisel = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (MP, 2), 1) == 0,
                mol_slot_old[0, g], slot_last[0, g])
            ohc = (mi == cisel).astype(f32)
            comcols.append(jnp.dot(com_out[g], ohc,
                                   preferred_element_type=f32))  # (3, 2)
            si = jax.lax.broadcasted_iota(jnp.int32, (GS, 2 * A), 0) + cols0
            ai = jax.lax.broadcasted_iota(jnp.int32, (GS, 2 * A), 1)
            base_sel = jnp.where(ai < A, site_start_old[0, g],
                                 start_last[0, g])
            tgt = jnp.where(ai < A, ai, ai - A)
            oh = ((si - base_sel) == tgt).astype(f32)
            fpcols.append(jnp.dot(pos_out[g][:, cols0:], oh,
                                  preferred_element_type=f32))   # (3, 2A)
        com_old = jnp.concatenate([c[:, 0:1] for c in comcols], 1)  # (3, G)
        com_last = jnp.concatenate([c[:, 1:2] for c in comcols], 1)
        P_oldT = jnp.concatenate([c[:, :A] for c in fpcols], 1)    # (3, GA)
        last_cols = jnp.concatenate([c[:, A:] for c in fpcols], 1)  # (3, GA)

        com_old_exp = jnp.dot(com_old, E_exp,
                              preferred_element_type=f32)   # (3, GA)
        off_old = P_oldT - com_old_exp
        insert_exp = jnp.dot(insert.astype(f32), E_exp,
                             preferred_element_type=f32)    # (1, GA)
        off_src = jnp.where(insert_exp > 0, templ_tiled, off_old)

        # ---- rotation rows ----------------------------------------------
        axis_r = uint(urow(10), jnp.int32(3))
        theta = jnp.where(is_rot, (urow(9) - 0.5) * rot_ref[0:1, :], 0.0)
        c_, s_ = jnp.cos(theta), jnp.sin(theta)
        one = jnp.ones((1, G), f32)
        zero = jnp.zeros((1, G), f32)

        def sel3(a0, a1, a2):
            return jnp.where(axis_r == 0, a0,
                             jnp.where(axis_r == 1, a1, a2))

        rax = ((sel3(one, c_, c_), sel3(zero, zero, -s_),
                sel3(zero, s_, zero)),
               (sel3(zero, zero, s_), sel3(c_, one, c_),
                sel3(-s_, zero, zero)),
               (sel3(zero, -s_, zero), sel3(s_, zero, zero),
                sel3(c_, c_, one)))
        a_ = jnp.sqrt(1.0 - urow(15))
        b_ = jnp.sqrt(urow(15))
        t2_, t3_ = TWOPI * urow(16), TWOPI * urow(17)
        qw_, qx_ = a_ * jnp.sin(t2_), a_ * jnp.cos(t2_)
        qy_, qz_ = b_ * jnp.sin(t3_), b_ * jnp.cos(t3_)
        runi = ((1 - 2 * (qy_ * qy_ + qz_ * qz_),
                 2 * (qx_ * qy_ - qw_ * qz_), 2 * (qx_ * qz_ + qw_ * qy_)),
                (2 * (qx_ * qy_ + qw_ * qz_),
                 1 - 2 * (qx_ * qx_ + qz_ * qz_),
                 2 * (qy_ * qz_ - qw_ * qx_)),
                (2 * (qx_ * qz_ - qw_ * qy_),
                 2 * (qy_ * qz_ + qw_ * qx_),
                 1 - 2 * (qx_ * qx_ + qy_ * qy_)))
        rm_rows = jnp.concatenate(
            [jnp.where(insert, runi[i][j], rax[i][j])
             for i in range(3) for j in range(3)], axis=0)  # (9, G)
        rm_exp = jnp.dot(rm_rows, E_exp,
                         preferred_element_type=f32)        # (9, GA)

        # ---- new COM rows -----------------------------------------------
        com_new_rows = []
        for i in range(3):
            lo_i, L_i = cf(_CF["LO"] + i), cf(_CF["L"] + i)
            ud = urow(3 + i) - 0.5
            # identical formula to physics/pbc.py::wrap_into_box
            tr_i = lo_i + jnp.mod(
                com_old[i:i + 1, :] + ud * trans_ref[0:1, :] - lo_i, L_i)
            ins_i = lo_i + (cf(_CF["H"] + 3 * i) * urow(6)
                            + cf(_CF["H"] + 3 * i + 1) * urow(7)
                            + cf(_CF["H"] + 3 * i + 2) * urow(8))
            com_new_rows.append(jnp.where(
                is_trans, tr_i,
                jnp.where(is_create, ins_i, com_old[i:i + 1, :])))
        com_new = jnp.concatenate(com_new_rows, axis=0)     # (3, G)
        com_new_exp = jnp.dot(com_new, E_exp,
                              preferred_element_type=f32)   # (3, GA)
        P_newT = jnp.concatenate(
            [com_new_exp[i:i + 1, :]
             + rm_exp[3 * i + 0:3 * i + 1, :] * off_src[0:1, :]
             + rm_exp[3 * i + 1:3 * i + 2, :] * off_src[1:2, :]
             + rm_exp[3 * i + 2:3 * i + 3, :] * off_src[2:3, :]
             for i in range(3)], axis=0)                    # (3, GA)

        # ---- intra + self (batched atom extraction) ----------------------
        def intra(PT, gate_row):
            X = jnp.dot(PT, E_atom, preferred_element_type=f32)  # (3, A*G)
            acc = jnp.zeros((1, G), f32)
            for a in range(A):
                for b in range(a + 1, A):
                    dxs = []
                    for i in range(3):
                        d = (X[i:i + 1, a * G:(a + 1) * G]
                             - X[i:i + 1, b * G:(b + 1) * G])
                        d = d - ll[i] * jnp.round(d * inv_l[i])
                        dxs.append(d)
                    ri2 = jnp.maximum(dxs[0] * dxs[0] + dxs[1] * dxs[1]
                                      + dxs[2] * dxs[2], _R2_FLOOR)
                    ri = jnp.sqrt(ri2)
                    qq = qrow_ref[0, a] * qrow_ref[0, b]
                    acc = acc + jnp.where(
                        ri2 > 1e-16,
                        qq * (_erfc(alpha * ri) - 1.0) / ri, 0.0)
            return jnp.where(gate_row, acc * coulomb_k, 0.0)

        i_old = intra(P_oldT, remove & valid)
        i_new = intra(P_newT, insert)
        s_old = jnp.where(remove, self_e, 0.0)
        s_new = jnp.where(insert, self_e, 0.0)
        e_rest_old = s_old + i_old                          # (1, G)
        e_rest_new = s_new + i_new

        # ---- footprint operands (static-matrix extraction) ---------------
        # old side occupies cols with side==0, new side side==1:
        ptlj = jnp.where(side_fl,
                         jnp.dot(P_newT, E_lj, preferred_element_type=f32),
                         jnp.dot(P_oldT, E_lj, preferred_element_type=f32))
        ptq = jnp.where(side_fq,
                        jnp.dot(P_newT, E_q, preferred_element_type=f32),
                        jnp.dot(P_oldT, E_q, preferred_element_type=f32))
        ptk = jnp.where(side_fk,
                        jnp.dot(P_newT, E_k, preferred_element_type=f32),
                        jnp.dot(P_oldT, E_k, preferred_element_type=f32))
        # side gates expanded to the row layouts (static matmuls)
        wof = w_old.astype(f32)
        wnf = w_new.astype(f32)

        def gx(row, E):
            return jnp.dot(row, E, preferred_element_type=f32)

        ljw = jnp.where(side_fl, gx(wnf, Eg_fl), gx(wof, Eg_fl))  # (1, GFL)
        qw = qpat_q * jnp.where(side_fq, gx(wnf, Eg_fq),
                                gx(wof, Eg_fq))             # (1, GFQ)
        livef = live_fk.astype(f32)
        qwk = qpat_k * jnp.where(side_fk, gx(wnf, Eg_fk),
                                 gx(wof, Eg_fk) * livef)
        wkk = qpat_k * (jnp.where(side_fk, gx(wnf, Eg_fk), 0.0)
                        - jnp.where(side_fk, 0.0,
                                    gx(wof, Eg_fk) * livef))

        # ---- fw window starts (vectorized over lanes) --------------------
        if fw_on:
            zo = com_old[fw_axis:fw_axis + 1, :]            # (1, G)
            zn = com_new[fw_axis:fw_axis + 1, :]
            starts = []
            for zc, rcw, W in ((zo, cstg_ref[0, 3], WL),
                               (zn, cstg_ref[0, 3], WL),
                               (zo, cstg_ref[0, 4], WC),
                               (zn, cstg_ref[0, 4], WC)):
                cnt = jnp.zeros((1, G), jnp.int32)
                for nb in range(NBG):
                    cnt = cnt + (fwbm_ref[0, nb] < zc - rcw).astype(jnp.int32)
                starts.append(jnp.clip(cnt, 0, NBG - W // 128))
            stL0, stL1, stC0, stC1 = starts
        # ---- exclusion scalars -------------------------------------------
        exa = jnp.where(w_old, mol_slot_old, Mtot + 1)      # (1, G)
        exb = slot_new

        # ---- guest pair passes: loop over live chunks --------------------
        n_live_c = (jnp.max(n_row) * A + 127) // 128
        n_live_c = jnp.minimum(n_live_c, GS // 128)

        def pair_r2(pt, x1, y1, z1, imask=(True, True, True)):
            px = pt[0, :][:, None]
            py = pt[1, :][:, None]
            pz = pt[2, :][:, None]
            dx = x1 - px
            dy = y1 - py
            dz = z1 - pz
            if imask[0]:
                dx = dx - ll[0] * jnp.round(dx * inv_l[0])
            if imask[1]:
                dy = dy - ll[1] * jnp.round(dy * inv_l[1])
            if imask[2]:
                dz = dz - ll[2] * jnp.round(dz * inv_l[2])
            return jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

        def guest_chunk(ci, carry):
            ljacc, cacc = carry
            b = ci * 128
            midc = site_midx_ref[0, pl.ds(b, 128)]
            smoc = site_mol_ref[0, pl.ds(b, 128)]
            styc = site_type_ref[0, pl.ds(b, 128)]
            sqc = site_q_ref[0:1, pl.ds(b, 128)]
            keeps_c = []
            pgs = []
            for g in range(G):
                nsel = jnp.where(styc < 99,
                                 jnp.full((128,), n_row[0, g], jnp.int32),
                                 0)
                kg = ((midc < nsel) & (smoc != exa[0, g])
                      & (smoc != exb[0, g]))
                keeps_c.append(kg.astype(jnp.int32)[None, :])
                pgs.append(pos_out[g, :, pl.ds(cols0 + b, 128)])

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

            eps = jnp.concatenate(
                [epslj_ref[:FL, pl.ds(b, 128)]] * G, axis=0)
            sig2 = jnp.concatenate(
                [sig2lj_ref[:FL, pl.ds(b, 128)]] * G, axis=0)
            xL, yL, zL, keepL = expand_c(FL)
            r2 = pair_r2(ptlj, xL, yL, zL)
            inv_r2 = 1.0 / r2
            sr2 = sig2 * inv_r2
            sr6 = sr2 * sr2 * sr2
            ljv = 4.0 * eps * (sr6 * sr6 - sr6)
            ljsel = (r2 < rc2) & (keepL > 0) & (ljw[0, :][:, None] > 0.0)
            ljacc = ljacc + jnp.sum(jnp.where(ljsel, ljv, 0.0), axis=1,
                                    keepdims=True)
            xQ, yQ, zQ, keepQ = expand_c(FQ)
            r2q = pair_r2(ptq, xQ, yQ, zQ)
            inv_r = jax.lax.rsqrt(r2q)
            coul = (qw[0, :][:, None] * sqc
                    * _erfc(alpha * (r2q * inv_r)) * inv_r)
            cacc = cacc + jnp.sum(jnp.where(keepQ > 0, coul, 0.0), axis=1,
                                  keepdims=True)
            return (ljacc, cacc)

        if skip_guest:
            lj_rows = jnp.zeros((GFL, 1), f32)
            c_rows = jnp.zeros((GFQ, 1), f32)
        else:
            lj_rows, c_rows = jax.lax.fori_loop(
                0, n_live_c, guest_chunk,
                (jnp.zeros((GFL, 1), f32), jnp.zeros((GFQ, 1), f32)))

        # ---- fw window passes --------------------------------------------
        if fw_on and not skip_fw:
            fx, fy, fz, feps, fsig2 = [], [], [], [], []
            for g in range(G):
                for side, st in ((0, stL0), (1, stL1)):
                    c0 = st[0, g] * 128
                    blk = fwpq_ref[:, pl.ds(c0, WL)]
                    fx.append(jnp.broadcast_to(blk[0:1, :], (Lmax, WL)))
                    fy.append(jnp.broadcast_to(blk[1:2, :], (Lmax, WL)))
                    fz.append(jnp.broadcast_to(blk[2:3, :], (Lmax, WL)))
                    feps.append(fweps_ref[pl.ds(side * Lmax, Lmax),
                                          pl.ds(c0, WL)])
                    fsig2.append(fwsig2_ref[pl.ds(side * Lmax, Lmax),
                                            pl.ds(c0, WL)])
            r2f = pair_r2(ptlj, jnp.concatenate(fx, 0),
                          jnp.concatenate(fy, 0), jnp.concatenate(fz, 0),
                          fw_imask)
            sr2f = jnp.concatenate(fsig2, 0) / r2f
            sr6f = sr2f * sr2f * sr2f
            ljf = 4.0 * jnp.concatenate(feps, 0) * (sr6f * sr6f - sr6f)
            self_f = (r2f < rc2) & (ljw[0, :][:, None] > 0.0)
            lj_rows = lj_rows + jnp.sum(jnp.where(self_f, ljf, 0.0),
                                        axis=1, keepdims=True)

            cx, cy, cz, cq = [], [], [], []
            for g in range(G):
                for side, st in ((0, stC0), (1, stC1)):
                    c0 = st[0, g] * 128
                    blk = fwpq_ref[:, pl.ds(c0, WC)]
                    cx.append(jnp.broadcast_to(blk[0:1, :], (Qmax, WC)))
                    cy.append(jnp.broadcast_to(blk[1:2, :], (Qmax, WC)))
                    cz.append(jnp.broadcast_to(blk[2:3, :], (Qmax, WC)))
                    cq.append(jnp.broadcast_to(blk[3:4, :], (Qmax, WC)))
            r2c = pair_r2(ptq, jnp.concatenate(cx, 0),
                          jnp.concatenate(cy, 0), jnp.concatenate(cz, 0),
                          fw_imask)
            inv_rc = jax.lax.rsqrt(r2c)
            coulf = (qw[0, :][:, None] * jnp.concatenate(cq, 0)
                     * _erfc(alpha2 * (r2c * inv_rc)) * inv_rc)
            c_rows = c_rows + jnp.sum(jnp.where(r2c < rc2sq2, coulf, 0.0),
                                      axis=1, keepdims=True)

        def dotT(a, b):
            return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32)

        # ---- shared phase tables + far field (same as stepg) -------------
        if skip_kstruct and skip_far:
            th_all = jnp.dot(h2pi_ref[:, :], ptk * 0.0,
                             preferred_element_type=f32)
        else:
            th_all = jnp.dot(h2pi_ref[:, :], ptk, preferred_element_type=f32)
        cA, sA = jnp.cos(th_all), jnp.sin(th_all)
        nx = max(kx, kx2 if fw_on else 0)
        ny = max(ky, ky2 if fw_on else 0)
        nz = max(kz, kz2 if fw_on else 0)
        rex, imx = _powers(cA[0:1, :], sA[0:1, :], nx)
        rey, imy = _powers(cA[1:2, :], sA[1:2, :], ny)
        rez, imz = _powers(cA[2:3, :], sA[2:3, :], nz)
        wkrow = wkk
        pxT = jnp.concatenate(
            [jnp.concatenate([rex[j] * wkrow for j in range(kx + 1)], 0),
             jnp.concatenate([imx[j] * wkrow for j in range(kx + 1)], 0)],
            axis=1)
        pyT_re, pyT_im = _signed_table(rey[:ky + 1], imy[:ky + 1], ky)
        pyT = jnp.concatenate([pyT_re, pyT_im], axis=1)
        pzT_re, pzT_im = _signed_table(rez[:kz + 1], imz[:kz + 1], kz,
                                       pad_to=JzP)
        xe = dotT(pxT, ex_ref[:, :])
        ye = dotT(pyT, ey_ref[:, :])
        t_re_all = xe[:GFK] * ye[:GFK] - xe[GFK:] * ye[GFK:]
        t_im_all = xe[:GFK] * ye[GFK:] + xe[GFK:] * ye[:GFK]

        if fw_on and not skip_far:
            px2 = jnp.concatenate(
                [jnp.concatenate([rex[j] * qwk for j in range(kx2 + 1)], 0),
                 jnp.concatenate([imx[j] * qwk for j in range(kx2 + 1)], 0)],
                axis=1)
            py2T_re, py2T_im = _signed_table(rey[:ky2 + 1], imy[:ky2 + 1],
                                             ky2)
            py2 = jnp.concatenate([py2T_re, py2T_im], axis=1)
            pz2T_re, pz2T_im = _signed_table(rez[:kz2 + 1], imz[:kz2 + 1],
                                             kz2, pad_to=Jz2P)
            xe2 = dotT(px2, ex2_ref[:, :])
            ye2 = dotT(py2, ey2_ref[:, :])
            t2_re = xe2[:GFK] * ye2[:GFK] - xe2[GFK:] * ye2[GFK:]
            t2_im = xe2[:GFK] * ye2[GFK:] + xe2[GFK:] * ye2[:GFK]

            def dotL(a, b):
                return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                           preferred_element_type=f32)

            c_re = c2re_ref[:, :]
            c_im = c2im_ref[:, :]
            M1 = dotL(c_re, t2_re) + dotL(c_im, t2_im)
            M2 = dotL(c_im, t2_re) - dotL(c_re, t2_im)
            efar = jnp.sum(pz2T_re * M1 + pz2T_im * M2, axis=0,
                           keepdims=True) + fw_d0 * qwk    # (1, GFK)
        elif fw_on:
            efar = jnp.zeros((1, GFK), f32)

        # ---- per-replica k-space + Metropolis + commits -------------------
        eng_row = eng_out[0:8, :]                           # (8, G)
        # bool rows cannot be read as scalars on TPU - go through int32
        ins_i = insert.astype(jnp.int32)
        rem_i = remove.astype(jnp.int32)
        val_i = valid.astype(jnp.int32)
        cb_i = cap_blocked.astype(jnp.int32)
        wnew_i = w_new.astype(jnp.int32)
        acc_rows = []
        ecomp_rows = []
        for g in range(G):
            e_lj0 = jnp.sum(lj_rows[g * FL:g * FL + Lmax, :])
            e_lj1 = jnp.sum(lj_rows[g * FL + Lmax:(g + 1) * FL, :])
            e_c0 = jnp.sum(c_rows[g * FQ:g * FQ + Qmax, :]) * coulomb_k
            e_c1 = jnp.sum(c_rows[g * FQ + Qmax:(g + 1) * FQ, :]) \
                * coulomb_k
            if fw_on:
                e_c0 = e_c0 + jnp.sum(efar[0:1, g * FK:g * FK + Qmax])
                e_c1 = e_c1 + jnp.sum(
                    efar[0:1, g * FK + Qmax:g * FK + 2 * Qmax])

            ar = amp_re_out[g]
            ai = amp_im_out[g]
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
                pzT_g = jnp.concatenate([pzT_re[:, sl], pzT_im[:, sl]],
                                        axis=1)
                d_both = jnp.dot(pzT_g, t_both, preferred_element_type=f32)
                d_re = d_both[:, :JxyP_]
                d_im = d_both[:, JxyP_:]
                cross = jnp.sum(
                    kw_ref[:, :] * (2.0 * (ar * d_re + ai * d_im)
                                    + d_re * d_re + d_im * d_im))
            e_recip_old = eng_row[0, g]
            e_recip_new = e_recip_old + cross * c2piv
            delta_e = (e_rest_new[0, g] + e_lj1 + e_c1 + e_recip_new
                       - e_rest_old[0, g] - e_lj0 - e_c0 - e_recip_old)
            pref = jnp.where(ins_i[0, g] > 0,
                             activity * cf(_CF["VOL"]) / (nf[0, g] + 1.0),
                             1.0)
            pref = pref * jnp.where(rem_i[0, g] > 0,
                                    nf[0, g] / (activity * cf(_CF["VOL"])),
                                    1.0)
            p_acc = jnp.minimum(1.0, pref * jnp.exp(-delta_e * inv_t))
            gate = (val_i[0, g] > 0) & (cb_i[0, g] == 0)
            acc = gate & (urow(2)[0, g] <= p_acc)
            accf = acc.astype(f32)

            if not skip_ampc:
                amp_re_out[g] = ar + accf * d_re
                amp_im_out[g] = ai + accf * d_im

            s_idx = (jax.lax.broadcasted_iota(jnp.int32, (1, GS), 1)[0, :]
                     + cols0)
            do_write = acc & (wnew_i[0, g] > 0)
            do_compact = acc & (rem_i[0, g] > 0)
            rel_new = s_idx - site_start_new[0, g]
            rel_old = s_idx - site_start_old[0, g]
            in_new = do_write & (rel_new >= 0) & (rel_new < A)
            in_old = do_compact & (rel_old >= 0) & (rel_old < A)
            if skip_pos:
                in_new = in_new & (s_idx < 0)
                in_old = in_old & (s_idx < 0)
            out = pos_out[g][:, cols0:]
            for a in range(A):
                sel_o = ((rel_old == a) & in_old)[None, :]
                out = jnp.where(sel_o, last_cols[:, g * A + a][:, None],
                                out)
            for a in range(A):
                sel_n = ((rel_new == a) & in_new)[None, :]
                out = jnp.where(sel_n, P_newT[:, g * A + a][:, None], out)
            pos_out[g, :, cols0:] = out

            mi2 = jax.lax.broadcasted_iota(jnp.int32, (1, MP), 1)[0, :]
            comv = com_out[g]
            comv = jnp.where((do_compact & (mi2 == mol_slot_old[0, g]))
                             [None, :], com_last[:, g:g + 1], comv)
            comv = jnp.where((do_write & (mi2 == slot_new[0, g]))[None, :],
                             com_new[:, g:g + 1], comv)
            com_out[g] = comv

            acc_rows.append(accf)
            ecomp_rows.append(jnp.stack(
                [jnp.where(acc, e_recip_new - e_recip_old, 0.0),
                 accf * (e_lj1 - e_lj0), accf * (e_c1 - e_c0),
                 accf * (s_new[0, g] - s_old[0, g]),
                 accf * (i_new[0, g] - i_old[0, g]),
                 accf * delta_e, jnp.zeros((), f32), jnp.zeros((), f32)]))

        accr = jnp.stack(acc_rows).reshape(1, G)            # (1, G)
        eng_out[0:8, :] = eng_row + jnp.stack(ecomp_rows, axis=1)

        n_new_row = (nmol_out[0:1, :]
                     + jnp.where((accr > 0) & insert, 1, 0)
                     - jnp.where((accr > 0) & remove, 1, 0))
        nmol_out[0:1, :] = n_new_row

        cm = jax.lax.broadcasted_iota(jnp.int32, (16, G), 0)
        mv16 = jnp.broadcast_to(move, (16, G))
        valid16 = jnp.broadcast_to(valid, (16, G))
        acc16 = jnp.broadcast_to(accr > 0, (16, G))
        cb16 = jnp.broadcast_to(cap_blocked & valid, (16, G))
        inc = (((cm == mv16) & valid16)
               | ((cm == mv16 + 8) & acc16)
               | ((cm == 5) & cb16)).astype(f32)
        cnt_out[:, :] = cnt_out[:, :] + inc
        return carry

    jax.lax.fori_loop(0, n_steps, step_body, 0)


def run_block_grouped(spec, states_g, uniforms_qmajor, *, interpret=False):
    """Run n_steps MC steps for G replicas in ONE Pallas program.
    states_g: SimState with leading G axis; uniforms_qmajor:
    (n_steps, NU*G), quantity-major. Returns (pos, com, amp_re, amp_im,
    n_mol_row (G,), energy (G, 6), counters (16, G))."""
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"
    G = states_g.n_mol.shape[0]
    JzP, JxyP = spec.amp_shape
    S = spec.S
    T = spec.active_list.index(True)            # static (single active type)
    A = spec.A_list[T]
    kx, ky, kz = spec.kmax_xyz
    kx2, ky2, kz2 = spec.kmax2_xyz
    Jz2P, _ = spec.amp2_shape
    gb = spec.guest_base if spec.fw_split else 0
    n_steps = uniforms_qmajor.shape[0]
    from ..mc.moves import N_UNIFORMS

    # single-type static atom patterns (spec meta)
    lj_atoms = tuple(spec.lj_idx_list[T][:spec.Lmax])
    q_atoms = tuple(spec.q_idx_list[T][:spec.Qmax])

    cstf = jnp.zeros(32, f)
    cstf = cstf.at[_CF["INVL"]:_CF["INVL"] + 3].set(1.0 / spec.box_diag)
    cstf = cstf.at[_CF["L"]:_CF["L"] + 3].set(spec.box_diag)
    cstf = cstf.at[_CF["ALPHA"]].set(spec.alpha)
    cstf = cstf.at[_CF["RC2"]].set(spec.cutoff * spec.cutoff)
    cstf = cstf.at[_CF["CK"]].set(COULOMB_K)
    cstf = cstf.at[_CF["INVT"]].set(1.0 / spec.temp_K)
    cstf = cstf.at[_CF["C2PIV"]].set(COULOMB_K * TWOPI / spec.volume)
    cstf = cstf.at[_CF["PCUM"]:_CF["PCUM"] + 4].set(spec.p_cum)
    cstf = cstf.at[_CF["VOL"]].set(spec.volume)
    cstf = cstf.at[_CF["LO"]:_CF["LO"] + 3].set(spec.bounds[:, 0])
    cstf = cstf.at[_CF["H"]:_CF["H"] + 9].set(spec.H.reshape(-1))
    # TRANS/ROT const slots unused (per-replica rows are passed instead)
    cstf = cstf.at[_CF["ALPHA2"]].set(spec.alpha2)
    cstf = cstf.at[_CF["RC2SQ2"]].set(spec.rcut2 * spec.rcut2)
    cstf = cstf.reshape(1, 32)
    cstg = jnp.zeros(8, f)
    cstg = cstg.at[_CG["ACT"]].set(spec.type_activity[T])
    cstg = cstg.at[_CG["SELF"]].set(spec.type_self_energy[T])
    cstg = cstg.at[_CG["FWD0"]].set(spec.fw_d0)
    cstg = cstg.at[3].set(spec.fw_rcw_lj)
    cstg = cstg.at[4].set(spec.fw_rcw_c)
    cstg = cstg.reshape(1, 8)
    csti = jnp.zeros(16, jnp.int32)
    csti = csti.at[_CI["A"]].set(spec.type_A[T])
    csti = csti.at[_CI["CAP"]].set(spec.type_cap[T])
    csti = csti.at[_CI["SB"]].set(spec.type_site_base[T])
    csti = csti.at[_CI["MB"]].set(spec.type_mol_base[T])
    csti = csti.at[_CI["MTOT"]].set(spec.Mtot)
    csti = csti.reshape(1, 16)

    NBG = spec.fw_SG // 128
    kernel = functools.partial(
        _blockg_kernel, n_steps=n_steps, NU=N_UNIFORMS, G=G, S=S, A=A,
        Lmax=spec.Lmax, Qmax=spec.Qmax, kx=kx, ky=ky, kz=kz, JzP=JzP,
        fw_on=spec.fw_split, gbase=gb, SG=spec.fw_SG, NBG=NBG,
        WL=spec.fw_WL, WC=spec.fw_WC, kx2=kx2, ky2=ky2, kz2=kz2,
        Jz2P=Jz2P, fw_axis=spec.fw_axis, lj_atoms=lj_atoms, q_atoms=q_atoms)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    MP = spec.Mtot + 1
    nmol_in = states_g.n_mol[:, T].astype(jnp.int32).reshape(1, G)
    eng_in = jnp.concatenate(
        [states_g.energy.T.astype(f),
         jnp.zeros((2, G), f)], axis=0)                     # (8, G)
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, 3, S), f),
                   jax.ShapeDtypeStruct((G, 3, MP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((1, G), jnp.int32),
                   jax.ShapeDtypeStruct((8, G), f),
                   jax.ShapeDtypeStruct((16, G), f)),
        in_specs=[vmem] * 32,
        out_specs=(vmem,) * 7,
        input_output_aliases={28: 0, 29: 1, 30: 2, 31: 3},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(uniforms_qmajor, cstf, cstg, csti,
      spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel, spec.k_weights,
      spec.eps_pair_lj[:8, gb:], spec.sig2_pair_lj[:8, gb:],
      spec.site_q.reshape(1, S)[:, gb:],
      spec.site_mol.reshape(1, S)[:, gb:],
      spec.site_type.reshape(1, S)[:, gb:],
      spec.site_midx.reshape(1, S)[:, gb:],
      spec.type_q_rows[T].reshape(1, spec.A_act)[:, :A],
      spec.type_template_off[T].T[:, :A],
      spec.fw_pq_g, spec.fw_eps_g[:8], spec.fw_sig2_g[:8],
      spec.fw_blockmax.reshape(1, NBG),
      spec.c2_re, spec.c2_im, spec.ex2_sel, spec.ey2_sel,
      nmol_in, eng_in,
      states_g.trans_step.astype(f).reshape(1, G),
      states_g.rot_step.astype(f).reshape(1, G),
      states_g.pos, states_g.com, states_g.amp_re, states_g.amp_im)
    return outs
