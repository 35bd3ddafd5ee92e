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

Scope (dispatch-gated in kernels/__init__.py): float32, grouped LJ rows
(2*Lmax <= 8), and either the static-framework split (fw_split) or no
inactive residue types at all. Triclinic boxes are served with the same
27-image minimum-image search as the XLA oracle (physics/pbc.py,
reference src/geometry_utils.f90:359-415) in the pair/intra passes and a
fractional-coordinate COM wrap; the static-framework split itself stays
orthorhombic-only (physics/fwsplit.py gate), so triclinic programs always
run with fw_on=False. Multi-active-species
systems (n_active >= 2, including the swap move the reference declares but
never dispatches, src/monte_carlo.f90:60) and reservoir systems are
served: per-type constants become per-replica (1, G) rows selected by the
drawn type ordinal, footprint-extraction matrices are blended from nA
static per-type patterns, LJ tables are indexed by the ACTIVE-pair id with
a per-replica dynamic row slice (as in stepg), and reservoir geometry
sampling plus push/pop bookkeeping run in-kernel on aliased reservoir
state. When n_active == 1 and there is no reservoir, every one of those
constructs collapses at trace time to the single-type program.

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
from .common import _erfc, _signed_table, dot1h, dot3


def _gsel_env() -> bool:
    """Multi-species guest-chunk LJ table read mode (MANIAC_GSEL).

    'dot' (default): per-chunk (GFL, nA*nA*8) x (nA*nA*8, CW) dot1h with
    the per-step E_dyn_fm pair-id selection matrix.
    'bcast': per-species sublane broadcasts from the DIAGONAL pid blocks
    + a per-step one-hot species mask blend - the insight is that
    footprint row f only needs ONE species (i_old for old-side rows,
    i_new for new-side), so nA candidate planes suffice, not nA*nA, and
    the nA==1 fast path's broadcast trick applies per species. Both are
    bit-exact (one-hot masks, 0/1 selectors)."""
    import os
    return os.environ.get("MANIAC_GSEL", "dot") == "bcast"


def _fwfuse_env(interpret: bool) -> bool:
    """Fused fw Coulomb pass (MANIAC_FWFUSE=1, or 'force' in interpret
    mode): ONE (Qmax*2G, W) elementwise pass over Qmax-tiled window
    planes replaces the per-atom loop of (2G, W) passes - same vector
    math, Qmax x fewer op issues, at the cost of materializing the tiled
    planes and a (2G, Qmax*2G) block-sum matmul for the atom fold. The
    atom fold reassociates the f32 sum (lane-sum per atom then atom fold,
    vs elementwise atom accumulation then lane-sum), so energies differ
    by ~1 ulp from the per-atom path; decisions on the parity fixtures
    must still match (tests/test_blockg.py::test_blockg_parity_fwfuse)."""
    import os
    v = os.environ.get("MANIAC_FWFUSE", "0")
    return v == "force" or (not interpret and v == "1")


def _kdiag_env(interpret: bool) -> bool:
    """Opt-in merged block-diagonal d contraction (MANIAC_KDIAG=1, or
    'force' in interpret mode). MEASURED NON-LEVER on v5e: 1.176 vs 0.709
    ms/step on the flagship - the G-tiled masked (GJz, 2GFK) operand costs
    more VPU traffic than the per-g small-matmul storm it removes (the d
    section alone is only ~0.02 ms, kstruct-minus-phase ablation). Kept as
    an A/B switch; bit-identical to the per-g path (zero terms are exact)."""
    import os
    v = os.environ.get("MANIAC_KDIAG", "0")
    return v == "force" or (not interpret and v == "1")

_R2_FLOOR = 1e-18


def _th_fma(h2pi_ref, ptk):
    """(3, 3) x (3, F) as nine scalar-row FMAs (exact f32, no MXU)."""
    return jnp.concatenate(
        [h2pi_ref[i, 0] * ptk[0:1, :] + h2pi_ref[i, 1] * ptk[1:2, :]
         + h2pi_ref[i, 2] * ptk[2:3, :] for i in range(3)], axis=0)


def _ds128(start, size):
    """Dynamic lane slice whose start is 128-aligned by construction.

    Every dynamic column offset in this kernel is a block index * 128
    (guest chunks, fw window starts); the multiple_of hint lets Mosaic
    emit aligned vreg copies instead of lane-rotation sequences.
    """
    return pl.ds(pl.multiple_of(start, 128), size)

# const row layout (1, 144) f32; HINV (9) and IMG (27 lattice image shift
# vectors, row-major) are only populated for triclinic boxes
_CF = dict(INVL=0, L=3, ALPHA=6, RC2=7, CK=8, INVT=9, C2PIV=10, PCUM=11,
           VOL=15, LO=16, H=19, TRANS=28, ROT=29, ALPHA2=30, RC2SQ2=31,
           RH=32, HINV=48, IMG=57)
# per-active-type const rows (nA, 8) f32: activity, self_energy, fw_d0,
# fw half-windows (rows 2-4 identical across types)
_CG = dict(ACT=0, SELF=1, FWD0=2, RCWL=3, RCWC=4)
# per-active-type int rows (nA, 16): A, cap, site_base, mol_base, Mtot,
# reservoir site_base / mol_base / cap
_CI = dict(A=0, CAP=1, SB=2, MB=3, MTOT=4, RSB=5, RMB=6, RCAP=7)


def _blockg_kernel(
        uniforms_ref,    # VMEM (n_steps, NU*G) quantity-major uniforms
        cstf_ref,        # VMEM (1, 144) f32 constants
        cstg_ref,        # VMEM (nA, 8) f32 per-type constants
        csti_ref,        # VMEM (nA, 16) int32 per-type constants
        h2pi_ref, ex_ref, ey_ref, kw_ref,
        epslj_ref,       # VMEM (nA*nA*8, GS) active-pair LJ rows, guest cols
        sig2lj_ref,      # VMEM (nA*nA*8, GS)
        site_q_ref, site_mol_ref, site_type_ref, site_midx_ref,  # (1, GS)
        qrow_ref,        # VMEM (nA, A) site charges per active type
        templ_ref,       # VMEM (3*nA, A) rigid insertion templates
        fwpq_ref,        # VMEM (4, SG)
        fweps_ref,       # VMEM (nA*nA*8, SG)
        fwsig2_ref,      # VMEM (nA*nA*8, SG)
        fwbm_ref,        # VMEM (1, NBG) per-block max sort coordinate
        c2zy_ref,        # VMEM (2*Jz2P*JyB, 2*Jx2P) zy-packed far coeffs
        nmol_in_ref,     # VMEM (nA, G) int32 initial populations
        eng_in_ref,      # VMEM (8, G) f32 initial energy components
        trans_ref,       # VMEM (1, G) per-replica translation step
        rot_ref,         # VMEM (1, G) per-replica rotation step
        resn_in_ref,     # VMEM (nA, G) int32 reservoir populations
        pos_ref, com_ref, amp_re_ref, amp_im_ref,   # aliased state
        resoff_ref,      # VMEM (G, 3, SresP) reservoir offsets (aliased)
        rescom_ref,      # VMEM (G, 3, MresP) reservoir COMs (aliased)
        fwcomb_ref,      # VMEM (4+4*Lmax, SG) stacked x/y/z/q + eps(2 sides)
                         #   + sig2(2 sides) fw table (fw fast path; else
                         #   (1, 128) dummy)
        pos_out, com_out, amp_re_out, amp_im_out,
        nmol_out,        # VMEM (nA, G) int32
        eng_out,         # VMEM (8, G)
        cnt_out,         # VMEM (16, G) trials rows 0-4, accepts 8-12,
                         #   overflow rejections row 5, reservoir drops row 6
        resoff_out, rescom_out,
        resn_out,        # VMEM (nA, G) int32
        # fw-window scratch (present iff fw_on): x/y/z/eps/sig2 (GFL, WL)
        # + x/y/z/q (GFQ, WC) staging buffers written by direct row stores
        *scratch_refs,
        n_steps: int, NU: int, G: int, S: int, A: int, Lmax: int,
        Qmax: int, kx: int, ky: int, kz: int, JzP: int,
        fw_on: bool, gbase: int, SG: int, NBG: int, WL: int, WC: int,
        kx2: int, ky2: int, kz2: int, Jz2P: int, fw_axis: int,
        nA: int, A_ts: tuple, aids: tuple, has_res: bool,
        lj_atoms_ts: tuple, q_atoms_ts: tuple, sb_off_ts: tuple = (),
        kmerge: bool = False, onewin: bool = False, tricl: bool = False,
        ggr2: float = 0.0, vv3: bool = False, kdiag: bool = False,
        gsel: bool = False, fwfuse: bool = False, ablate: str = ""):
    f32 = jnp.float32
    # exact-token ablation gates: substring tests silently compounded
    # ("fw" in "fwmath" is True, so MANIAC_KABLATE=fwmath removed the
    # WHOLE fw section - every pre-r5 'fwmath' attribution was really
    # the full fw cost)
    ablate = frozenset(t for t in ablate.split(",") if t)
    skip_guest = "guest" in ablate
    skip_fw = "fw" in ablate
    skip_far = "far" in ablate
    skip_kstruct = "kstruct" in ablate
    skip_pos = "pos" in ablate
    skip_fpread = "fpread" in ablate
    skip_ampc = "ampc" in ablate
    skip_intra = "intra" in ablate
    skip_prop = "prop" in ablate
    skip_ktab = "ktab" in ablate
    skip_ft = "ft" in ablate
    force_rej = "rej" in ablate
    # fine-grained glue gates; only meaningful combined with 'rej' (they
    # corrupt energies/decisions, which 'rej' makes side-effect-free)
    skip_win = "win" in ablate      # fw window start count matmuls
    skip_com = "com" in ablate      # COM commit selects/stores
    skip_met = "met" in ablate      # Metropolis prefactor/exp chain
    skip_cnt = "cnt" in ablate      # counter update
    skip_eng = "eng" in ablate      # energy-component accumulation
    skip_stage = "stage" in ablate  # fw window staging stores only
    skip_fwmath = "fwmath" in ablate  # fw LJ/C elementwise only
    skip_phase = "phase" in ablate  # phase powers + k structure tables
    skip_gexp = "gexp" in ablate    # per-atom footprint extraction only
    skip_gmath = "gmath" in ablate  # guest-chunk pair math only
    skip_glj = "glj" in ablate      # guest-chunk LJ atom loop only
    skip_gc = "gc" in ablate        # guest-chunk Coulomb atom loop only
    FL, FQ = 2 * Lmax, 2 * Qmax
    FK = ((FQ + 7) // 8) * 8
    JxyP_ = kw_ref.shape[1]
    cols0 = gbase if fw_on else 0
    GS = S - cols0
    SresP = resoff_ref.shape[2]
    MresP = rescom_ref.shape[2]

    def cf(i):
        return cstf_ref[0, i]

    ll = (cf(_CF["L"]), cf(_CF["L"] + 1), cf(_CF["L"] + 2))
    inv_l = (cf(_CF["INVL"]), cf(_CF["INVL"] + 1), cf(_CF["INVL"] + 2))
    alpha, rc2 = cf(_CF["ALPHA"]), cf(_CF["RC2"])
    coulomb_k, inv_t, c2piv = cf(_CF["CK"]), cf(_CF["INVT"]), cf(_CF["C2PIV"])
    alpha2, rc2sq2 = cf(_CF["ALPHA2"]), cf(_CF["RC2SQ2"])
    if tricl:
        # triclinic box: minimum image is a brute-force 27-image search
        # (matching physics/pbc.py::min_image_dist2 / the reference's
        # src/geometry_utils.f90:359-415); the shift vectors are loop
        # invariants read once from the constants row
        hinv = tuple(cf(_CF["HINV"] + i) for i in range(9))
        hmat = tuple(cf(_CF["H"] + i) for i in range(9))
        img = tuple((cf(_CF["IMG"] + 3 * s), cf(_CF["IMG"] + 3 * s + 1),
                     cf(_CF["IMG"] + 3 * s + 2)) for s in range(27))
    fw_d0 = cstg_ref[0, _CG["FWD0"]]
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
    # LJ/charged row selection (static per-type patterns)
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

    E_lj_ts = [sel_mat(lj_atoms_ts[t], Lmax, FL) for t in range(nA)]
    E_q_ts = [sel_mat(q_atoms_ts[t], Qmax, FQ) for t in range(nA)]
    E_k_ts = [sel_mat(q_atoms_ts[t], Qmax, FK) for t in range(nA)]
    # side-of-column rows (defined below) get BAKED into merged selectors:
    # rows 0..GA-1 select from the old-side positions, rows GA.. from the
    # new side, so ONE 3-pass dot1h on the stacked (3, 2GA) operand
    # replaces an old/new "highest" dot pair + where (12 MXU passes and
    # a select per table). Each output column still has exactly one
    # nonzero selector entry, so the read stays BIT-exact (dot1h).
    side_fl = ((jax.lax.broadcasted_iota(jnp.int32, (1, GFL), 1) % FL)
               >= Lmax)
    side_fq = ((jax.lax.broadcasted_iota(jnp.int32, (1, GFQ), 1) % FQ)
               >= Qmax)
    ik = jax.lax.broadcasted_iota(jnp.int32, (1, GFK), 1) % FK
    side_fk = (ik >= Qmax) & (ik < FQ)
    live_fk = ik < FQ

    def sel_both(E, side_row):
        # (2GA, GF) merged selector: old-side columns read rows 0..GA-1,
        # new-side columns rows GA.. (pad columns are all-zero either way)
        s = side_row.astype(f32)
        return jnp.concatenate([E * (1.0 - s), E * s], axis=0)

    E_ljb_ts = [sel_both(E_lj_ts[t], side_fl) for t in range(nA)]
    E_qb_ts = [sel_both(E_q_ts[t], side_fq) for t in range(nA)]
    E_kb_ts = [sel_both(E_k_ts[t], side_fk) for t in range(nA)]
    # per-column charge patterns, one per active type
    iq = jax.lax.broadcasted_iota(jnp.int32, (1, GFQ), 1) % FQ
    qpat_q_ts, qpat_k_ts = [], []
    for t in range(nA):
        qq_t = jnp.zeros((1, GFQ), f32)
        qk_t = jnp.zeros((1, GFK), f32)
        for j, aj in enumerate(q_atoms_ts[t]):
            qv = qrow_ref[t, aj]
            qq_t = jnp.where((iq % Qmax == j) & (iq // Qmax <= 1), qv, qq_t)
            qk_t = jnp.where(((ik % Qmax) == j) & live_fk, qv, qk_t)
        qpat_q_ts.append(qq_t)
        qpat_k_ts.append(qk_t)
    # templ tiling: (3, A) -> (3, GA) with col g*A+a = templ[:, a]
    rt = jax.lax.broadcasted_iota(jnp.int32, (A, GA), 0)
    ct = jax.lax.broadcasted_iota(jnp.int32, (A, GA), 1)
    E_tile = (rt == ct % A).astype(f32)                    # (A, GA)
    templ_tiled_ts = [jnp.dot(templ_ref[3 * t:3 * t + 3, :], E_tile,
                              preferred_element_type=f32)  # (3, GA)
                      for t in range(nA)]

    # (G, G*F) static expansion of per-replica rows to footprint layouts
    def g_exp_mat(F):
        rr = jax.lax.broadcasted_iota(jnp.int32, (G, G * F), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (G, G * F), 1)
        return (rr == cc // F).astype(f32)

    Eg_fl = g_exp_mat(FL)
    Eg_fq = g_exp_mat(FQ)
    Eg_fk = g_exp_mat(FK)

    # (G*F, G) side-sum matrices: ONE matmul turns the per-row pair
    # accumulators into per-replica (1, G) energy rows (the kernel is
    # op-issue bound; 4*G scalar reduces were on the critical path)
    def side_sum_mat(F, Fh):
        rr = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 1)
        g_of = rr // F
        j = rr % F
        old = ((cc == g_of) & (j < Fh)).astype(f32)
        new = ((cc == g_of) & (j >= Fh) & (j < 2 * Fh)).astype(f32)
        return old, new

    E_sum_fl = side_sum_mat(FL, Lmax)
    E_sum_fq = side_sum_mat(FQ, Qmax)

    # vectorized guest-chunk constants: the chunk pass builds its (GF, 128)
    # operands with matmuls against these instead of per-replica Python
    # loops (G slice+broadcast+concat issues per operand; the kernel is
    # issue-bound away from the MXU)
    I_G = (jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
           == jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)).astype(f32)

    def col_of(row):
        # (1, G) -> (G, 1) without a relayout transpose
        return jax.lax.dot_general(I_G, row, (((1,), (1,)), ((), ())),
                                   preferred_element_type=f32)

    # per-footprint-atom column selectors for the guest pass: the pass
    # operates on NATIVE (G, 128) chunk data with the footprint side
    # unrolled over its atoms, so each atom f needs its x/y/z/weight as
    # per-replica (G, 1) columns. E_fsel_*[f] picks column g*F+f of the
    # (rows, G*F) footprint operands for every g (one small matmul per
    # atom per STEP - the per-chunk (G*F+G*FQ, G) broadcast matmuls of
    # the old layout were 62% of the bigS step).
    def fsel_mats(F):
        rr = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 1)
        return [(rr == cc * F + f).astype(f32) for f in range(F)]

    E_fsel_fl = fsel_mats(FL)
    E_fsel_fq = fsel_mats(FQ)
    # merged-lane companions (hardware layout: when every footprint table
    # width is a whole number of 128-lane tiles, ONE wide read + static
    # lane slices replaces the per-table / per-atom small-matmul storms;
    # each output element still sums exactly one nonzero product, so the
    # dot1h reads stay BIT-exact and CPU/XLA parity holds unchanged)
    MERGE_FT = (GFL % 128 == 0) and (GFQ % 128 == 0) and (GFK % 128 == 0)
    if MERGE_FT:
        E_ftb_cat_ts = [jnp.concatenate([E_ljb_ts[t], E_qb_ts[t],
                                         E_kb_ts[t]], axis=1)
                        for t in range(nA)]
        E_ftb_cat = E_ftb_cat_ts[0]
        Eg_cat = jnp.concatenate([Eg_fl, Eg_fq, Eg_fk], axis=1)

        def fselT_mat(F):
            # (F*G, G*F): row f*G+g selects col g*F+f - the pre-transposed
            # stack of fsel_mats(F), built directly from iotas (an
            # in-kernel .T of the stack would be a relayout copy)
            rr = jax.lax.broadcasted_iota(jnp.int32, (F * G, G * F), 0)
            cc = jax.lax.broadcasted_iota(jnp.int32, (F * G, G * F), 1)
            return ((cc % F == rr // G) & (cc // F == rr % G)).astype(f32)

        E_fselT_fl = fselT_mat(FL)
        E_fselT_fq = fselT_mat(FQ)
    # f-major (row f*G + g) companions of E_tile_lj / E_sum_*: eps table
    # row selection and old|new side sums for the tiled guest pass
    rtf_ = jax.lax.broadcasted_iota(jnp.int32, (GFL, FL), 0)
    ctf_ = jax.lax.broadcasted_iota(jnp.int32, (GFL, FL), 1)
    E_tile_fm = (ctf_ == rtf_ // G).astype(f32)            # (GFL, FL)

    def side_sum_fm(F, Fh):
        rr = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 0)
        cc = jax.lax.broadcasted_iota(jnp.int32, (G * F, G), 1)
        gmatch = cc == rr % G
        old = (gmatch & (rr // G < Fh)).astype(f32)
        new = (gmatch & (rr // G >= Fh)).astype(f32)
        return old, new

    E_sum_fl_fm = side_sum_fm(FL, Lmax)
    E_sum_fq_fm = side_sum_fm(FQ, Qmax)

    def sumrow_fm(rows, E):
        return jax.lax.dot_general(rows, E, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    def row_of(col):
        # (G, 1) -> (1, G) without a relayout transpose
        return jax.lax.dot_general(col, I_G, (((0,), (0,)), ((), ())),
                                   preferred_element_type=f32)

    # per-replica footprint-read / commit window constants: W2-col
    # 128-aligned slices cover any A-atom span incl. a 128-boundary
    # straddle; (W2, A) iota planes build the per-(g, side) one-hot
    # extraction / placement matrices
    mi_G = jax.lax.broadcasted_iota(jnp.int32, (G, MP), 1).astype(f32)
    W2 = min(256, S)
    lane_w2 = jax.lax.broadcasted_iota(jnp.int32, (1, W2), 1)
    # batched footprint-read/commit constants: the per-(g, side) (W2, A)
    # one-hot matmuls issue 2*G tiny MXU ops per direction per step
    # (latency-bound); instead ONE (W2, GA) one-hot serves every replica
    # at once. Each output element still sums exactly one nonzero
    # product (the window offset places one lane per (g, atom) column),
    # so the dot1h split stays BIT-exact and parity with the XLA path
    # holds unchanged.
    iw2g = jax.lax.broadcasted_iota(jnp.int32, (W2, GA), 0)   # lane w
    ag2 = jax.lax.broadcasted_iota(jnp.int32, (W2, GA), 1) % A
    iw2gT = jax.lax.broadcasted_iota(jnp.int32, (GA, W2), 1)
    ag2T = jax.lax.broadcasted_iota(jnp.int32, (GA, W2), 0) % A
    # (3G, GA) block-diagonal mask + (3, 3G) coordinate-gather selector
    CM3 = ((jax.lax.broadcasted_iota(jnp.int32, (3 * G, GA), 0) // 3)
           == (jax.lax.broadcasted_iota(jnp.int32, (3 * G, GA), 1) // A)
           ).astype(f32)
    SEL3 = ((jax.lax.broadcasted_iota(jnp.int32, (3, 3 * G), 1) % 3)
            == jax.lax.broadcasted_iota(jnp.int32, (3, 3 * G), 0)
            ).astype(f32)
    # (GA, G) column expansion (for per-column window offsets)
    E_cexp = ((jax.lax.broadcasted_iota(jnp.int32, (GA, G), 0) // A)
              == jax.lax.broadcasted_iota(jnp.int32, (GA, G), 1)
              ).astype(f32)

    def exp_off(row):
        # (1, G) int window-offset row -> (1, GA): offsets are < W2 <= 256,
        # bf16-exact, so ONE DEFAULT-precision dot is exact
        return jnp.dot(row.astype(f32), E_exp, preferred_element_type=f32,
                       precision=jax.lax.Precision.DEFAULT).astype(jnp.int32)

    def exp_off_col(row):
        # (1, G) int window-offset row -> (GA, 1) without a relayout
        return jax.lax.dot_general(
            E_cexp, col_of(row.astype(f32)), (((1,), (0,)), ((), ())),
            preferred_element_type=f32,
            precision=jax.lax.Precision.DEFAULT).astype(jnp.int32)

    # intra pair constants: the A*(A-1)/2 intra-molecular pairs vectorized
    # into lanes (col p*G + g), instead of a per-pair loop of (1, G) ops
    PAIRS = tuple((a, b) for a in range(A) for b in range(a + 1, A))
    NPAIR = len(PAIRS)
    if NPAIR:
        PGI = NPAIR * G
        rr_p = jax.lax.broadcasted_iota(jnp.int32, (GA, PGI), 0)
        cc_p = jax.lax.broadcasted_iota(jnp.int32, (GA, PGI), 1)
        a_sel = jnp.full((GA, PGI), -1, jnp.int32)
        b_sel = jnp.full((GA, PGI), -1, jnp.int32)
        for p, (pa, pb) in enumerate(PAIRS):
            inp = (cc_p // G) == p
            a_sel = jnp.where(inp, pa, a_sel)
            b_sel = jnp.where(inp, pb, b_sel)
        gmatch_p = (rr_p // A) == (cc_p % G)
        E_pa = (gmatch_p & ((rr_p % A) == a_sel)).astype(f32)
        E_pb = (gmatch_p & ((rr_p % A) == b_sel)).astype(f32)
        rs_p = jax.lax.broadcasted_iota(jnp.int32, (PGI, G), 0)
        cs_p = jax.lax.broadcasted_iota(jnp.int32, (PGI, G), 1)
        E_psum = ((rs_p % G) == cs_p).astype(f32)
        qq_pat_ts = []
        for t in range(nA):
            qq_t = jnp.zeros((1, PGI), f32)
            for p, (pa, pb) in enumerate(PAIRS):
                qq_t = jnp.where(
                    jax.lax.broadcasted_iota(jnp.int32, (1, PGI), 1)
                    // G == p, qrow_ref[t, pa] * qrow_ref[t, pb], qq_t)
            qq_pat_ts.append(qq_t)
        if nA > 1:
            # per-replica row -> (1, PGI) expansion (col p*G + g <- g)
            E_gp = ((jax.lax.broadcasted_iota(jnp.int32, (G, PGI), 0)
                     == jax.lax.broadcasted_iota(jnp.int32, (G, PGI), 1)
                     % G)).astype(f32)

    # per-active-pair static row-selection patterns: with the per-step
    # replica gating folded in (E_dyn_fm in step_body), the multi-species
    # guest-chunk LJ tables become ONE (GFL, nA*nA*8) x (nA*nA*8, 128)
    # matmul per chunk instead of per-replica gated slices
    if nA > 1:
        P8 = nA * nA * 8
        rr8 = jax.lax.broadcasted_iota(jnp.int32, (GFL, P8), 0)
        cc8 = jax.lax.broadcasted_iota(jnp.int32, (GFL, P8), 1)
        # f-major (row f*G + g) selection patterns for the guest pass:
        # atom f's (G, 128) eps/sig2 block is then a CONTIGUOUS sublane
        # slice of the per-chunk selection matmul's output
        E_pid_fm = [(cc8 == p * 8 + rr8 // G).astype(f32)
                    for p in range(nA * nA)]
        rgf = jax.lax.broadcasted_iota(jnp.int32, (G, GFL), 0)
        cgf = jax.lax.broadcasted_iota(jnp.int32, (G, GFL), 1)
        Eg_fl_fm = (rgf == cgf % G).astype(f32)            # (G, GFL) f-major

    fw_imask = tuple(ax != fw_axis for ax in range(3))

    if fw_on:
        # fw window-start constants: block-max sort coords as a column
        # (identity contraction, no relayout) + a ones row for the count
        ib1_ = jax.lax.broadcasted_iota(jnp.int32, (NBG, NBG), 0)
        ib2_ = jax.lax.broadcasted_iota(jnp.int32, (NBG, NBG), 1)
        fwbm_col = jax.lax.dot_general(
            (ib1_ == ib2_).astype(f32), fwbm_ref[0:1, :],
            (((1,), (1,)), ((), ())), preferred_element_type=f32)  # (NBG, 1)
        ones_nb = jnp.ones((1, NBG), f32)
    # single-store staged fw regime (ALL fw systems; fw_split is
    # orthorhombic-only so fw never coexists with tricl): scratch rows are
    # (g, side) pairs gs = 2g + side. fw_ride marks the extra-specialized
    # nA==1 && Lmax==1 sub-regime where the staged eps/sig2 planes need no
    # per-replica species blending and the LJ pass can ride the LJ atom's
    # Coulomb iteration. The pre-r5 general path (per-(g, side) value
    # broadcasts into 9 scratch tables + per-(g, side) E_dyn row-selection
    # matmuls) measured 0.573 ms/step of the 1.213 ms mixed step and was
    # deleted in favor of this staging for every (nA, Lmax).
    fw_ride = fw_on and nA == 1 and Lmax == 1
    if fw_on:
        # per-atom operand selector: footprint row g*FQ + side*Qmax + j
        # -> col j*2G + 2g + side. ONE (4, GFQ) x (GFQ, Qmax*2G) matmul
        # yields every atom's x/y/z/qw in the scratch (g, side) layout, so
        # the C pass loops j over the staged window planes directly instead
        # of expanding them to (GFQ, WC) with 4 one-hot matmuls
        rfc_ = jax.lax.broadcasted_iota(jnp.int32, (GFQ, Qmax * 2 * G), 0)
        cfc_ = jax.lax.broadcasted_iota(jnp.int32, (GFQ, Qmax * 2 * G), 1)
        E_fwJ = (cfc_ == (rfc_ % Qmax) * 2 * G + 2 * (rfc_ // FQ)
                 + (rfc_ % FQ) // Qmax).astype(f32)
        # (g, side) -> per-replica side-sum / species-selection matrices
        # (row 2g + side): E_gs[0] sums (or selects) the old side, E_gs[1]
        # the new side. At Lmax == 1 E_gs == E_sum_fl exactly.
        E_gs = side_sum_mat(2, 1)
    if fw_on and fwfuse:
        # fused-C-pass operands (see _fwfuse_env): an identity for the
        # (1, Q2G) row -> (Q2G, 1) column reads, and the atom-fold
        # block-sum (row 2g+side sums cols j*2G + 2g+side). The fold is a
        # SUMMATION matrix -> plain dot under the "highest" pin (dot1h's
        # split would change the f32 accumulation order).
        Q2G = Qmax * 2 * G
        iq1 = jax.lax.broadcasted_iota(jnp.int32, (Q2G, Q2G), 0)
        iq2 = jax.lax.broadcasted_iota(jnp.int32, (Q2G, Q2G), 1)
        I_Q2G = (iq1 == iq2).astype(f32)
        E_fwsum = (jax.lax.broadcasted_iota(jnp.int32, (2 * G, Q2G), 0)
                   == jax.lax.broadcasted_iota(jnp.int32, (2 * G, Q2G), 1)
                   % (2 * G)).astype(f32)
    if fw_on and not fw_ride:
        # LJ-atom companion of E_fwJ: footprint row g*FL + side*Lmax + j
        # -> col j*2G + 2g + side (one matmul stages every LJ atom's
        # x/y/z/weight in the scratch (g, side) layout)
        rfl_ = jax.lax.broadcasted_iota(jnp.int32, (GFL, Lmax * 2 * G), 0)
        cfl_ = jax.lax.broadcasted_iota(jnp.int32, (GFL, Lmax * 2 * G), 1)
        E_fwL = (cfl_ == (rfl_ % Lmax) * 2 * G + 2 * (rfl_ // FL)
                 + (rfl_ % FL) // Lmax).astype(f32)
    if fw_on:
        # far-grid static dims (see the zy-packed far contraction)
        Jy2_ = 2 * ky2 + 1
        JyB_ = ((Jy2_ + 7) // 8) * 8
        Jx2_ = kx2 + 1
        Jx2P_ = ((Jx2_ + 7) // 8) * 8

    # merged k-space cross/commit operands (see the d-matmul section):
    # a (G*JzP, G) block-sum matrix and a G-tiled copy of the k weights
    # turn 64 per-replica (JzP, JxyP) reductions + amp commits into one
    # big elementwise pass + two small matmuls
    onewin = onewin and fw_on
    nfw_scr = 0 if not fw_on else (1 if onewin else 2)
    kdiag = kdiag and kmerge
    dscr = scratch_refs[nfw_scr] if (kmerge and not kdiag) else None
    if kmerge:
        GJz = G * JzP
        rz = jax.lax.broadcasted_iota(jnp.int32, (GJz, G), 0)
        cz = jax.lax.broadcasted_iota(jnp.int32, (GJz, G), 1)
        E_kz = (rz // JzP == cz).astype(f32)
        kw_tiled = jnp.concatenate([kw_ref[:, :]] * G, axis=0)  # (GJz, JxyP)
    # merged block-diagonal d contraction: ONE (GJz, 2GFK) x (2GFK, 2JxyP)
    # dot replaces the G-iteration storm of small (JzP, 2FK) matmuls +
    # scratch stores. The block-diag operand is a G-tiled [pzT_re | pzT_im]
    # value under a static mask (zero terms are exact, so per-output sums
    # carry the same nonzero products). OPT-IN (see _kdiag_env): measured
    # SLOWER than the per-g loop on v5e.
    if kdiag:
        ud = jax.lax.broadcasted_iota(jnp.int32, (GJz, 2 * GFK), 0)
        vd = jax.lax.broadcasted_iota(jnp.int32, (GJz, 2 * GFK), 1)
        bd_mask = ((vd % GFK) // FK == ud // JzP).astype(f32)

    # copy initial state into the aliased outputs / running rows
    pos_out[...] = pos_ref[...]
    com_out[...] = com_ref[...]
    amp_re_out[...] = amp_re_ref[...]
    amp_im_out[...] = amp_im_ref[...]
    nmol_out[...] = nmol_in_ref[...]
    eng_out[...] = eng_in_ref[...]
    cnt_out[...] = jnp.zeros((16, G), f32)
    resoff_out[...] = resoff_ref[...]
    rescom_out[...] = rescom_ref[...]
    resn_out[...] = resn_in_ref[...]

    def step_body(t, carry):
        u = uniforms_ref[pl.ds(t, 1), :]                    # (1, NU*G)

        def urow(q):
            return u[0:1, q * G:(q + 1) * G]                # (1, G)

        # ---- move class (vectorized rows) --------------------------------
        um = urow(0)
        is_trans = um <= cf(_CF["PCUM"])
        is_rot = (~is_trans) & (um <= cf(_CF["PCUM"] + 1))
        is_indel = (~is_trans) & (~is_rot) & (um <= cf(_CF["PCUM"] + 2))
        if nA >= 2:
            # the swap move is live (reference declares it but never
            # dispatches it, src/monte_carlo.f90:60)
            is_swap = (~is_trans) & (~is_rot) & (~is_indel)
            dead = jnp.zeros_like(is_swap)
        else:
            is_swap = jnp.zeros_like(is_trans)
            dead = (~is_trans) & (~is_rot) & (~is_indel)
        is_create = is_indel & (urow(1) <= PROB_CREATE_DELETE)
        is_delete = is_indel & (~is_create)
        move = jnp.where(is_create, 0, jnp.where(is_delete, 1,
                jnp.where(is_trans, 2, jnp.where(is_rot, 3, 4))))
        insert = is_create | is_swap
        remove = is_delete | is_swap
        w_old = is_trans | is_rot | is_delete | is_swap
        w_new = is_trans | is_rot | is_create | is_swap

        def uint(uu, n):
            if isinstance(n, int):
                n = jnp.int32(n)
            return jnp.minimum((uu * n.astype(f32)).astype(jnp.int32),
                               n - 1)

        # ---- per-replica type ordinals + per-type constant rows ----------
        if nA >= 2:
            i1 = uint(urow(11), nA)                         # (1, G) int32
            di = 1 + uint(urow(12), nA - 1)
            i2 = (i1 + di) % nA
            i_old = i1
            i_new = jnp.where(is_swap, i2, i1)
            if gsel:
                # per-species one-hot side masks for the broadcast-blend
                # guest table read (see _gsel_env): f-major (GFL, 1)
                # column, rows f*G+g - old-side blocks (f < Lmax) gate on
                # i_old, new-side on i_new. Exact 0/1 values.
                m_sp = [jnp.concatenate(
                    [col_of((i_old == t).astype(f32))] * Lmax
                    + [col_of((i_new == t).astype(f32))] * Lmax, axis=0)
                    for t in range(nA)]                     # (GFL, 1)
            else:
                pid_row = i_old * nA + i_new                # LJ table block
                # per-step dynamic f-major row-selection matrix for the
                # guest pass (see E_pid_fm)
                E_dyn_fm = jnp.zeros((GFL, nA * nA * 8), f32)
                for p in range(nA * nA):
                    mrow = jnp.dot((pid_row == p).astype(f32), Eg_fl_fm,
                                   preferred_element_type=f32)  # (1, GFL)
                    E_dyn_fm = E_dyn_fm + E_pid_fm[p] * mrow[0, :][:, None]
        else:
            i_old = i_new = None

        def ti(col, idx):
            v = csti_ref[0, col]
            if nA == 1 or idx is None:
                return v
            out = jnp.full((1, G), v, jnp.int32)
            for tt in range(1, nA):
                out = jnp.where(idx == tt, csti_ref[tt, col], out)
            return out

        def tf(col, idx):
            v = cstg_ref[0, col]
            if nA == 1 or idx is None:
                return v
            out = jnp.full((1, G), v, f32)
            for tt in range(1, nA):
                out = jnp.where(idx == tt, cstg_ref[tt, col], out)
            return out

        def nrow_of(ref, idx):
            out = ref[0:1, :]
            if nA == 1 or idx is None:
                return out
            for tt in range(1, nA):
                out = jnp.where(idx == tt, ref[tt:tt + 1, :], out)
            return out

        A_old_r = ti(_CI["A"], i_old)
        A_new_r = ti(_CI["A"], i_new)
        cap_new = ti(_CI["CAP"], i_new)
        SB_old = ti(_CI["SB"], i_old)
        SB_new = ti(_CI["SB"], i_new)
        MB_old = ti(_CI["MB"], i_old)
        MB_new = ti(_CI["MB"], i_new)
        act_old = tf(_CG["ACT"], i_old)
        act_new = tf(_CG["ACT"], i_new)
        self_old = tf(_CG["SELF"], i_old)
        self_new = tf(_CG["SELF"], i_new)

        n_old_row = nrow_of(nmol_out, i_old)                # (1, G) int32
        n_new_row = nrow_of(nmol_out, i_new)
        m_old = uint(urow(13), jnp.maximum(n_old_row, 1))
        # int-select then one compare (bool-branch selects lower to an
        # i8->i1 truncation Mosaic rejects)
        if nA == 1:
            rot_ok = ((n_old_row > 0).astype(jnp.int32)
                      * (1 if A_ts[0] > 1 else 0))
        else:
            rot_ok = ((n_old_row > 0).astype(jnp.int32)
                      * (A_old_r > 1).astype(jnp.int32))
        valid_i = jnp.where(is_create, 1,
                            jnp.where(is_rot, rot_ok,
                                      (n_old_row > 0).astype(jnp.int32)))
        valid = (valid_i > 0) & (~dead)
        if has_res:
            # empty reservoir blocks insertions of that species (the
            # reference would read a stale slot, create_molecule.f90:188)
            resn_new_row = nrow_of(resn_out, i_new)
            valid = valid & ((~insert) | (resn_new_row > 0))
        cap_blocked = insert & (n_new_row >= cap_new)

        site_start_old = SB_old + m_old * A_old_r           # (1, G)
        mol_slot_old = MB_old + m_old
        nmin = jnp.minimum(n_new_row, cap_new - 1)
        slot_new = jnp.where(insert, MB_new + nmin, mol_slot_old)
        site_start_new = jnp.where(insert, SB_new + nmin * A_new_r,
                                   site_start_old)
        last = jnp.maximum(n_old_row - 1, 0)
        start_last = SB_old + last * A_old_r
        slot_last = MB_old + last

        # ---- COM + footprint reads ----------------------------------------
        # COM reads stay batched across replica lanes ((G, MP) compare
        # planes + masked row-sums: exact, one nonzero term); position
        # footprint reads are per-replica dynamic window slices (below)
        slot_old_c = col_of(mol_slot_old.astype(f32))       # (G, 1)
        slot_last_c = col_of(slot_last.astype(f32))
        # old-side window bases: shared by the footprint reads and the
        # position commits (must live outside the fpread ablation gate)
        c0o_row = jnp.minimum((site_start_old // 128) * 128, S - W2)
        if skip_fpread:
            com_old = jnp.zeros((3, G), f32)
            com_last = jnp.zeros((3, G), f32)
            P_oldT = jnp.zeros((3, GA), f32)
            last_cols = jnp.zeros((3, GA), f32)
        else:
            mask_o = mi_G == slot_old_c                     # (G, MP)
            mask_l = mi_G == slot_last_c
            rows_o, rows_l = [], []
            for i in range(3):
                cg = com_out[:, i, :]                       # (G, MP)
                rows_o.append(row_of(jnp.sum(
                    jnp.where(mask_o, cg, 0.0), axis=1, keepdims=True)))
                rows_l.append(row_of(jnp.sum(
                    jnp.where(mask_l, cg, 0.0), axis=1, keepdims=True)))
            com_old = jnp.concatenate(rows_o, 0)            # (3, G)
            com_last = jnp.concatenate(rows_l, 0)
            # footprint reads: per-replica 128-aligned W2-col window
            # slices (W2 = min(256, S) always covers the straddle of an
            # A-atom molecule across a 128 boundary), stacked to (3G, W2)
            # and extracted with ONE (W2, GA) one-hot matmul per side.
            # O(1) per step per replica like the old per-(g, side) form
            # (the live-prefix chunk scan before it was O(occupancy)),
            # but 2 batched dot1h calls replace 2*G tiny latency-bound
            # MXU issues. Bit-identical: every output element of both the
            # extraction and the (3, 3G) coordinate gather sums exactly
            # one nonzero product (see dot1h).
            c0l_row = jnp.minimum((start_last // 128) * 128, S - W2)
            do_exp = exp_off(site_start_old - c0o_row)      # (1, GA)
            dl_exp = exp_off(start_last - c0l_row)
            BLKo = jnp.concatenate(
                [pos_out[g, :, _ds128(c0o_row[0, g], W2)]
                 for g in range(G)], 0)                     # (3G, W2)
            BLKl = jnp.concatenate(
                [pos_out[g, :, _ds128(c0l_row[0, g], W2)]
                 for g in range(G)], 0)
            OHo = (iw2g == do_exp + ag2).astype(f32)        # (W2, GA)
            OHl = (iw2g == dl_exp + ag2).astype(f32)
            P_oldT = dot1h(SEL3, dot1h(BLKo, OHo, split="a") * CM3,
                           split="b")                       # (3, GA)
            last_cols = dot1h(SEL3, dot1h(BLKl, OHl, split="a") * CM3,
                              split="b")

        com_old_exp = dot1h(com_old, E_exp, split="a")      # (3, GA)
        off_old = P_oldT - com_old_exp
        # 0/1 x 0/1: bf16-exact at any precision - ONE pass
        insert_exp = jnp.dot(insert.astype(f32), E_exp,
                             preferred_element_type=f32,
                             precision=jax.lax.Precision.DEFAULT)  # (1, GA)

        # ---- insertion geometry source -----------------------------------
        if has_res:
            # reservoir molecule pick of type i_new: offsets used verbatim
            # (reference convention, src/create_molecule.f90:166-189)
            RSB_new = ti(_CI["RSB"], i_new)
            RMB_new = ti(_CI["RMB"], i_new)
            res_pick = uint(urow(14), jnp.maximum(resn_new_row, 1))
            res_src = RSB_new + res_pick * A_new_r          # (1, G)
            res_last = jnp.maximum(resn_new_row - 1, 0)
            res_last_start = RSB_new + res_last * A_new_r
            pop_slot = RMB_new + res_pick
            last_slot_res = RMB_new + res_last
            # reservoir reads stay per-replica: batched strided reads of
            # the (G, 3, SresP) reservoir refs compile and pass single-
            # program, but CRASH the TPU worker under the multi-program
            # vmapped launch (16 programs, B=1024) - found on hardware,
            # invisible to interpret-mode tests
            rcols = []
            rcomc = []
            for g in range(G):
                sri = jax.lax.broadcasted_iota(jnp.int32, (SresP, 2 * A), 0)
                ari = jax.lax.broadcasted_iota(jnp.int32, (SresP, 2 * A), 1)
                bsel = jnp.where(ari < A, res_src[0, g],
                                 res_last_start[0, g])
                tgt_r = jnp.where(ari < A, ari, ari - A)
                ohr = ((sri - bsel) == tgt_r).astype(f32)
                rcols.append(dot1h(resoff_out[g], ohr,
                                   split="a"))              # (3, 2A)
                mri = jax.lax.broadcasted_iota(jnp.int32, (MresP, 1), 0)
                ohm = (mri == last_slot_res[0, g]).astype(f32)
                rcomc.append(dot1h(rescom_out[g], ohm,
                                   split="a"))              # (3, 1)
            res_off_cols = jnp.concatenate([c[:, :A] for c in rcols], 1)
            res_lastoff_cols = jnp.concatenate([c[:, A:] for c in rcols], 1)
            rescom_last = jnp.concatenate(rcomc, 1)         # (3, G)
            off_src = jnp.where(insert_exp > 0, res_off_cols, off_old)
        else:
            if nA == 1:
                templ_sel = templ_tiled_ts[0]
            else:
                # small ints x 0/1: bf16-exact, ONE pass
                inew_exp = jnp.dot(i_new.astype(f32), E_exp,
                                   preferred_element_type=f32,
                                   precision=jax.lax.Precision.DEFAULT)
                templ_sel = templ_tiled_ts[0]
                for tt in range(1, nA):
                    templ_sel = jnp.where(inew_exp == tt,
                                          templ_tiled_ts[tt], templ_sel)
            off_src = jnp.where(insert_exp > 0, templ_sel, off_old)

        # ---- rotation rows ----------------------------------------------
        if skip_prop:
            com_new = com_old
            com_new_exp = com_old_exp
            P_newT = P_oldT
        else:
            axis_r = uint(urow(10), jnp.int32(3))
            theta = jnp.where(is_rot, (urow(9) - 0.5) * rot_ref[0:1, :],
                              0.0)
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
            if has_res:
                # reservoir geometry is used as-is: theta is already gated
                # to rotations only, so inserts see the identity matrix
                rm_rows = jnp.concatenate(
                    [rax[i][j] for i in range(3) for j in range(3)],
                    axis=0)
            else:
                a_ = jnp.sqrt(1.0 - urow(15))
                b_ = jnp.sqrt(urow(15))
                t2_, t3_ = TWOPI * urow(16), TWOPI * urow(17)
                qw_, qx_ = a_ * jnp.sin(t2_), a_ * jnp.cos(t2_)
                qy_, qz_ = b_ * jnp.sin(t3_), b_ * jnp.cos(t3_)
                runi = ((1 - 2 * (qy_ * qy_ + qz_ * qz_),
                         2 * (qx_ * qy_ - qw_ * qz_),
                         2 * (qx_ * qz_ + qw_ * qy_)),
                        (2 * (qx_ * qy_ + qw_ * qz_),
                         1 - 2 * (qx_ * qx_ + qz_ * qz_),
                         2 * (qy_ * qz_ - qw_ * qx_)),
                        (2 * (qx_ * qz_ - qw_ * qy_),
                         2 * (qy_ * qz_ + qw_ * qx_),
                         1 - 2 * (qx_ * qx_ + qy_ * qy_)))
                rm_rows = jnp.concatenate(
                    [jnp.where(insert, runi[i][j], rax[i][j])
                     for i in range(3) for j in range(3)], axis=0)  # (9, G)
            rm_exp = dot1h(rm_rows, E_exp, split="a")       # (9, GA)

            # ---- new COM rows -------------------------------------------
            if tricl:
                # wrap through fractional coordinates (same formula as
                # physics/pbc.py::wrap_into_box triclinic branch)
                disp = [com_old[i:i + 1, :]
                        + (urow(3 + i) - 0.5) * trans_ref[0:1, :]
                        - cf(_CF["LO"] + i) for i in range(3)]
                frac = [jnp.mod(hinv[3 * i] * disp[0]
                                + hinv[3 * i + 1] * disp[1]
                                + hinv[3 * i + 2] * disp[2], 1.0)
                        for i in range(3)]
                tr_rows = [cf(_CF["LO"] + i) + hmat[3 * i] * frac[0]
                           + hmat[3 * i + 1] * frac[1]
                           + hmat[3 * i + 2] * frac[2] for i in range(3)]
            com_new_rows = []
            for i in range(3):
                lo_i, L_i = cf(_CF["LO"] + i), cf(_CF["L"] + i)
                ud = urow(3 + i) - 0.5
                if tricl:
                    tr_i = tr_rows[i]
                else:
                    # identical formula to physics/pbc.py::wrap_into_box
                    tr_i = lo_i + jnp.mod(
                        com_old[i:i + 1, :] + ud * trans_ref[0:1, :] - lo_i,
                        L_i)
                ins_i = lo_i + (cf(_CF["H"] + 3 * i) * urow(6)
                                + cf(_CF["H"] + 3 * i + 1) * urow(7)
                                + cf(_CF["H"] + 3 * i + 2) * urow(8))
                com_new_rows.append(jnp.where(
                    is_trans, tr_i,
                    jnp.where(is_create, ins_i, com_old[i:i + 1, :])))
            com_new = jnp.concatenate(com_new_rows, axis=0)  # (3, G)
            com_new_exp = dot1h(com_new, E_exp, split="a")  # (3, GA)
            P_newT = jnp.concatenate(
                [com_new_exp[i:i + 1, :]
                 + rm_exp[3 * i + 0:3 * i + 1, :] * off_src[0:1, :]
                 + rm_exp[3 * i + 1:3 * i + 2, :] * off_src[1:2, :]
                 + rm_exp[3 * i + 2:3 * i + 3, :] * off_src[2:3, :]
                 for i in range(3)], axis=0)                # (3, GA)

        # ---- intra + self (all pairs vectorized into lanes) ---------------
        def intra(PT, gate_row, idx):
            if NPAIR == 0:
                return jnp.zeros((1, G), f32)
            # positions x one-nonzero pair selectors: bit-exact 3-pass
            XA = dot1h(PT, E_pa, split="a")                 # (3, PGI)
            XB = dot1h(PT, E_pb, split="a")
            if tricl:
                dxi = XA[0:1, :] - XB[0:1, :]
                dyi = XA[1:2, :] - XB[1:2, :]
                dzi = XA[2:3, :] - XB[2:3, :]
                ri2 = None
                for sx, sy, sz in img:
                    tx = dxi + sx
                    ty = dyi + sy
                    tz = dzi + sz
                    r2i = tx * tx + ty * ty + tz * tz
                    ri2 = r2i if ri2 is None else jnp.minimum(ri2, r2i)
                ri2 = jnp.maximum(ri2, _R2_FLOOR)
            else:
                ds = []
                for i in range(3):
                    d = XA[i:i + 1, :] - XB[i:i + 1, :]
                    d = d - ll[i] * jnp.round(d * inv_l[i])
                    ds.append(d)
                ri2 = jnp.maximum(ds[0] * ds[0] + ds[1] * ds[1]
                                  + ds[2] * ds[2], _R2_FLOOR)
            ri = jnp.sqrt(ri2)
            qq = qq_pat_ts[0]
            if nA > 1:
                idx_pg = jnp.dot(idx.astype(f32), E_gp,
                                 preferred_element_type=f32,
                                 precision=jax.lax.Precision.DEFAULT
                                 )  # (1, PGI): small ints x 0/1, exact
                for tt in range(1, nA):
                    qq = jnp.where(idx_pg == tt, qq_pat_ts[tt], qq)
            vals = jnp.where(ri2 > 1e-16,
                             qq * (_erfc(alpha * ri) - 1.0) / ri, 0.0)
            acc = jnp.dot(vals, E_psum,
                          preferred_element_type=f32)       # (1, G)
            return jnp.where(gate_row, acc * coulomb_k, 0.0)

        if skip_intra:
            i_old_e = jnp.zeros((1, G), f32)
            i_new_e = jnp.zeros((1, G), f32)
        else:
            i_old_e = intra(P_oldT, remove & valid, i_old)
            i_new_e = intra(P_newT, insert, i_new)
        s_old = jnp.where(remove, self_old, 0.0)
        s_new = jnp.where(insert, self_new, 0.0)
        e_rest_old = s_old + i_old_e                        # (1, G)
        e_rest_new = s_new + i_new_e

        # ---- footprint operands (static-matrix extraction) ---------------
        # old side occupies cols with side==0, new side side==1:
        P_both = jnp.concatenate([P_oldT, P_newT], axis=1)  # (3, 2GA)
        if skip_ft:
            ptlj = jnp.zeros((3, GFL), f32)
            ptq = jnp.zeros((3, GFQ), f32)
            ptk = jnp.zeros((3, GFK), f32)
            qpat_q = jnp.zeros((1, GFQ), f32)
            qpat_k = jnp.zeros((1, GFK), f32)
        elif nA == 1 and MERGE_FT:
            # ONE wide 3-pass read serves all three footprint tables
            # (static lane slices split it back; widths are whole
            # 128-lane tiles, values bit-identical to per-table reads)
            pt_all = dot1h(P_both, E_ftb_cat, split="a")
            ptlj = pt_all[:, :GFL]
            ptq = pt_all[:, GFL:GFL + GFQ]
            ptk = pt_all[:, GFL + GFQ:]
            qpat_q = qpat_q_ts[0]
            qpat_k = qpat_k_ts[0]
        elif nA == 1:
            # merged-side selectors: ONE bit-exact 3-pass read per table
            # (was an old/new "highest" dot pair + where: 12 passes each)
            ptlj = dot1h(P_both, E_ljb_ts[0], split="a")
            ptq = dot1h(P_both, E_qb_ts[0], split="a")
            ptk = dot1h(P_both, E_kb_ts[0], split="a")
            qpat_q = qpat_q_ts[0]
            qpat_k = qpat_k_ts[0]
        else:
            # per-side type gates expanded to the footprint layouts:
            # 0/1 x 0/1, bf16-exact at any precision - ONE pass each
            def g01(row, E):
                return jnp.dot(row.astype(f32), E,
                               preferred_element_type=f32,
                               precision=jax.lax.Precision.DEFAULT)

            if MERGE_FT:
                go_cat_ts = [g01(i_old == tt, Eg_cat) for tt in range(nA)]
                gn_cat_ts = [g01(i_new == tt, Eg_cat) for tt in range(nA)]
                go_fl = [r[:, :GFL] for r in go_cat_ts]
                gn_fl = [r[:, :GFL] for r in gn_cat_ts]
                go_fq = [r[:, GFL:GFL + GFQ] for r in go_cat_ts]
                gn_fq = [r[:, GFL:GFL + GFQ] for r in gn_cat_ts]
                go_fk = [r[:, GFL + GFQ:] for r in go_cat_ts]
                gn_fk = [r[:, GFL + GFQ:] for r in gn_cat_ts]
            else:
                go_fl = [g01(i_old == tt, Eg_fl) for tt in range(nA)]
                gn_fl = [g01(i_new == tt, Eg_fl) for tt in range(nA)]
                go_fq = [g01(i_old == tt, Eg_fq) for tt in range(nA)]
                gn_fq = [g01(i_new == tt, Eg_fq) for tt in range(nA)]
                go_fk = [g01(i_old == tt, Eg_fk) for tt in range(nA)]
                gn_fk = [g01(i_new == tt, Eg_fk) for tt in range(nA)]
            ptlj = jnp.zeros((3, GFL), f32)
            ptq = jnp.zeros((3, GFQ), f32)
            ptk = jnp.zeros((3, GFK), f32)
            qpat_q = jnp.zeros((1, GFQ), f32)
            qpat_k = jnp.zeros((1, GFK), f32)
            for tt in range(nA):
                # side-merged 3-pass read x side-merged type gate: value
                # per column identical to the old per-side dot pair
                if MERGE_FT:
                    pt_all_t = dot1h(P_both, E_ftb_cat_ts[tt], split="a")
                    ptlj_t = pt_all_t[:, :GFL]
                    ptq_t = pt_all_t[:, GFL:GFL + GFQ]
                    ptk_t = pt_all_t[:, GFL + GFQ:]
                else:
                    ptlj_t = dot1h(P_both, E_ljb_ts[tt], split="a")
                    ptq_t = dot1h(P_both, E_qb_ts[tt], split="a")
                    ptk_t = dot1h(P_both, E_kb_ts[tt], split="a")
                ptlj = ptlj + (jnp.where(side_fl, gn_fl[tt], go_fl[tt])
                               * ptlj_t)
                ptq = ptq + (jnp.where(side_fq, gn_fq[tt], go_fq[tt])
                             * ptq_t)
                ptk = ptk + (jnp.where(side_fk, gn_fk[tt], go_fk[tt])
                             * ptk_t)
                qpat_q = qpat_q + jnp.where(side_fq, gn_fq[tt],
                                            go_fq[tt]) * qpat_q_ts[tt]
                qpat_k = qpat_k + jnp.where(side_fk, gn_fk[tt],
                                            go_fk[tt]) * qpat_k_ts[tt]
        # side gates expanded to the row layouts (static matmuls)
        wof = w_old.astype(f32)
        wnf = w_new.astype(f32)

        def gx(row, E):
            # 0/1 row x 0/1 expansion: bf16-exact - ONE DEFAULT pass
            return jnp.dot(row, E, preferred_element_type=f32,
                           precision=jax.lax.Precision.DEFAULT)

        if MERGE_FT:
            # ONE one-pass expansion per side over the concatenated
            # layouts (lane slices split it back; was 6 small dots)
            gn_cat = gx(wnf, Eg_cat)
            go_cat = gx(wof, Eg_cat)
            gn_l, go_l = gn_cat[:, :GFL], go_cat[:, :GFL]
            gn_q = gn_cat[:, GFL:GFL + GFQ]
            go_q = go_cat[:, GFL:GFL + GFQ]
            gn_k = gn_cat[:, GFL + GFQ:]
            go_k = go_cat[:, GFL + GFQ:]
        else:
            gn_l, go_l = gx(wnf, Eg_fl), gx(wof, Eg_fl)
            gn_q, go_q = gx(wnf, Eg_fq), gx(wof, Eg_fq)
            gn_k, go_k = gx(wnf, Eg_fk), gx(wof, Eg_fk)
        ljw = jnp.where(side_fl, gn_l, go_l)                # (1, GFL)
        qw = qpat_q * jnp.where(side_fq, gn_q, go_q)        # (1, GFQ)
        livef = live_fk.astype(f32)
        wkk = qpat_k * (jnp.where(side_fk, gn_k, 0.0)
                        - jnp.where(side_fk, 0.0, go_k * livef))

        # ---- f-major footprint columns for the guest pass ------------------
        # stack x/y/z/weight, select atom f's per-replica column block with
        # one static matmul, flip (4, G) -> (G, 4) with one identity
        # contraction, then stack the per-atom blocks f-major: row f*G + g.
        # ONCE PER STEP. The chunk pass then rebuilds the old fused
        # (F*G, 128) math shape - which the VPU pipelines ~10x better than
        # per-atom (G, 128) passes - with plain sublane TILING of the
        # (G, 128) chunk reads instead of the old per-chunk one-hot
        # broadcast matmuls (those were ~30% of the bigS step).
        opl = jnp.concatenate([ptlj, ljw], axis=0)          # (4, GFL)
        opq = jnp.concatenate([ptq, qw], axis=0)            # (4, GFQ)

        def atom_cols(op, E_f):
            # positions/charges x 0/1 selectors: bit-exact 3-pass reads
            sel = dot1h(op, E_f, split="a")                         # (4, G)
            return dot1h(I_G, sel, (((1,), (1,)), ((), ())),
                         split="b")                                 # (G, 4)

        if skip_gexp:
            fcl = jnp.zeros((GFL, 4), f32)
            fcq = jnp.zeros((GFQ, 4), f32)
        elif MERGE_FT:
            # pre-transposed selector stacks: ONE 3-pass read per table
            # replaces FL+FQ atom_cols calls (6 small matmuls each);
            # row f*G+g layout and values identical
            fcl = dot1h(E_fselT_fl, opl, (((1,), (1,)), ((), ())),
                        split="b")                          # (FL*G, 4)
            fcq = dot1h(E_fselT_fq, opq, (((1,), (1,)), ((), ())),
                        split="b")
        else:
            fcl = jnp.concatenate(
                [atom_cols(opl, E_fsel_fl[f]) for f in range(FL)], axis=0)
            fcq = jnp.concatenate(
                [atom_cols(opq, E_fsel_fq[f]) for f in range(FQ)], axis=0)

        # ---- fw window starts (one compare plane + count matmul each) ----
        if fw_on and skip_win:
            z0i = jnp.zeros((1, G), jnp.int32)
            stL0 = stL1 = stC0 = stC1 = z0i
        elif fw_on:
            zo = com_old[fw_axis:fw_axis + 1, :]            # (1, G)
            zn = com_new[fw_axis:fw_axis + 1, :]
            want = ((zo, cstg_ref[0, 3], WL), (zn, cstg_ref[0, 3], WL))
            if not onewin:
                want += ((zo, cstg_ref[0, 4], WC), (zn, cstg_ref[0, 4], WC))
            starts = []
            for zc, rcw, W in want:
                below = (fwbm_col < (zc - rcw)).astype(f32)  # (NBG, G)
                # 0/1 count sum: integer-exact at any precision - ONE pass
                cnt = jnp.dot(ones_nb, below,
                              preferred_element_type=f32,
                              precision=jax.lax.Precision.DEFAULT
                              ).astype(jnp.int32)
                starts.append(jnp.clip(cnt, 0, NBG - W // 128))
            if onewin:
                # rcw_lj == rcw_c and WL == WC: one window serves both
                # passes (the rcut2 default makes this the common case)
                stL0, stL1 = starts
                stC0, stC1 = stL0, stL1
            else:
                stL0, stL1, stC0, stC1 = starts
        # ---- exclusion scalars -------------------------------------------
        exa = jnp.where(w_old, mol_slot_old, Mtot + 1)      # (1, G)
        exb = slot_new
        # per-replica COLUMNS for the vectorized chunk masks (values are
        # small ints, exact in f32)
        exa_c = col_of(exa.astype(f32))                     # (G, 1)
        exb_c = col_of(exb.astype(f32))
        if nA == 1:
            ncol_ts = [col_of(nmol_out[0:1, :].astype(f32))]
        else:
            ncol_ts = [col_of(nmol_out[tt:tt + 1, :].astype(f32))
                       for tt in range(nA)]

        # ---- guest pair passes: loop over live chunks --------------------
        # per-type loops (nA >= 2): each type's region is 128-aligned and
        # capacity-padded, so a single scan to the global live end walks
        # the dead padding between type regions (~0.14 ms/step on the
        # two-active bench); instead each type gets its own fori_loop
        # over only its live chunks (static base from sb_off_ts)
        #
        # GW: lane width of one loop iteration, in 128-chunks. Wider slabs
        # cut per-iteration issue overhead and pipeline the VPU math
        # better (isolated sweep, tools/gpass_bench.py: 1.08 -> 0.80
        # us/chunk at GW=8); masks already neutralize in-slab dead sites,
        # so overshoot costs only arithmetic. nA >= 2 keeps GW=1 (type
        # regions are 128- but not GW*128-aligned).
        GW = 1
        if nA == 1:
            # MANIAC_GW overrides the slab width (must divide the chunk
            # count; larger slabs amortize per-iteration issue overhead -
            # the guest pass is 76% of the bigS step, docs/performance.md)
            import os as _os
            env_gw = int(_os.environ.get("MANIAC_GW", "0") or 0)
            if env_gw > 0 and (GS // 128) % env_gw == 0:
                GW = env_gw
            else:
                GW = next((w for w in (8, 4, 2) if (GS // 128) % w == 0), 1)
            n_live_c = (jnp.max(nmol_out[0:1, :]) * A + 128 * GW - 1) \
                // (128 * GW)
            n_live_c = jnp.minimum(n_live_c, GS // (128 * GW))

        def pair_r2c(px, py, pz, x1, y1, z1, imask=(True, True, True)):
            dx = x1 - px
            dy = y1 - py
            dz = z1 - pz
            if tricl:
                # 27-image search (fw windows never coexist with tricl,
                # so imask is always the full-image default here)
                assert imask == (True, True, True)
                r2m = None
                for sx, sy, sz in img:
                    tx = dx + sx
                    ty = dy + sy
                    tz = dz + sz
                    r2i = tx * tx + ty * ty + tz * tz
                    r2m = r2i if r2m is None else jnp.minimum(r2m, r2i)
                return jnp.maximum(r2m, _R2_FLOOR)
            if imask[0]:
                dx = dx - ll[0] * jnp.round(dx * inv_l[0])
            if imask[1]:
                dy = dy - ll[1] * jnp.round(dy * inv_l[1])
            if imask[2]:
                dz = dz - ll[2] * jnp.round(dz * inv_l[2])
            return jnp.maximum(dx * dx + dy * dy + dz * dz, _R2_FLOOR)

        def pair_r2(pt, x1, y1, z1, imask=(True, True, True)):
            return pair_r2c(pt[0, :][:, None], pt[1, :][:, None],
                            pt[2, :][:, None], x1, y1, z1, imask)

        def make_guest_chunk(tt_hint):
          # fused-shape guest pass, f-major rows (row f*G + g): the chunk
          # reads stay native (G, 128) and are TILED up the sublane axis to
          # (F*G, 128) (plain copies - the old per-chunk one-hot broadcast
          # matmuls they replace were ~30% of the bigS step), after which
          # the pair math runs as ONE wide fused pass per side. A per-atom
          # (G, 128) formulation measured ~10x slower: at 8 vregs per op
          # the VPU is latency-bound on the round/rsqrt/exp chain, while
          # the (F*G, 128) shape pipelines it across 16-48 vregs.
          CW = 128 * (GW if nA == 1 else 1)  # lane width per iteration
          def guest_chunk(ci, carry):
            ljacc, cacc = carry
            b = ci * CW
            midf = site_midx_ref[0:1, _ds128(b, CW)].astype(f32)  # (1,CW)
            smof = site_mol_ref[0:1, _ds128(b, CW)].astype(f32)
            styc = site_type_ref[0:1, _ds128(b, CW)]
            sqc = site_q_ref[0:1, _ds128(b, CW)]
            excl = (smof != exa_c) & (smof != exb_c)        # (G, CW)
            if nA == 1:
                kcol = (styc < 99) & (midf < ncol_ts[0]) & excl
            else:
                # chunk lies inside type tt_hint's region: one type compare
                # (padding columns carry an invalid type id)
                kcol = ((styc == aids[tt_hint])
                        & (midf < ncol_ts[tt_hint]) & excl)
            xc = pos_out[:, 0, _ds128(cols0 + b, CW)]       # (G, CW)
            yc = pos_out[:, 1, _ds128(cols0 + b, CW)]
            zc = pos_out[:, 2, _ds128(cols0 + b, CW)]
            def tile(v, F):
                return jnp.concatenate([v] * F, axis=0)     # (F*G, 128)

            if skip_gmath:
                # keep the chunk reads live without any pair math
                keep = jnp.sum(xc + yc + zc + kcol.astype(f32) + sqc,
                               axis=1, keepdims=True)       # (G, 1)
                ljacc = ljacc + tile(keep, FL)
                cacc = cacc + tile(keep, FQ)
                return (ljacc, cacc)

            if not skip_glj:
                xa, ya, za = tile(xc, FL), tile(yc, FL), tile(zc, FL)
                kL = tile(kcol, FL)
                if nA == 1:
                    # f-major tiling (row f*G+g = table row f) as plain
                    # sublane broadcasts: exact in f32 and MXU-free (the
                    # one-hot E_tile_fm dot costs 6 MXU passes per chunk
                    # under the engine's "highest" matmul precision pin)
                    eps = jnp.concatenate(
                        [jnp.broadcast_to(epslj_ref[f:f + 1, _ds128(b, CW)],
                                          (G, CW)) for f in range(FL)],
                        axis=0)                              # (GFL, CW)
                    sig2 = jnp.concatenate(
                        [jnp.broadcast_to(sig2lj_ref[f:f + 1, _ds128(b, CW)],
                                          (G, CW)) for f in range(FL)],
                        axis=0)
                elif gsel:
                    # per-species broadcast planes from the DIAGONAL pid
                    # blocks (row (t*nA+t)*8 + f == atom f%Lmax of species
                    # t vs the column site - identical for both sides)
                    # blended by the per-step one-hot masks: MXU-free and
                    # bit-exact (0/1 masks, exact adds of zeros)
                    def splane(tab):
                        acc = None
                        for t in range(nA):
                            base = (t * nA + t) * 8
                            p_t = jnp.concatenate(
                                [jnp.broadcast_to(
                                    tab[base + f1:base + f1 + 1,
                                        _ds128(b, CW)], (G, CW))
                                 for f1 in range(FL)], axis=0) * m_sp[t]
                            acc = p_t if acc is None else acc + p_t
                        return acc
                    eps = splane(epslj_ref)
                    sig2 = splane(sig2lj_ref)
                else:
                    # one f-major row-selection matmul per chunk: the
                    # selector is 0/1, so the 3-pass split read is
                    # bit-exact at half the "highest" passes
                    eps = dot1h(E_dyn_fm, epslj_ref[:, _ds128(b, CW)],
                                split="b")
                    sig2 = dot1h(E_dyn_fm, sig2lj_ref[:, _ds128(b, CW)],
                                 split="b")
                r2 = pair_r2c(fcl[:, 0:1], fcl[:, 1:2], fcl[:, 2:3],
                              xa, ya, za)
                inv_r2 = 1.0 / r2
                sr2 = sig2 * inv_r2
                sr6 = sr2 * sr2 * sr2
                ljv = 4.0 * eps * (sr6 * sr6 - sr6)
                ljsel = (r2 < rc2) & kL & (fcl[:, 3:4] > 0.0)
                ljacc = ljacc + jnp.sum(jnp.where(ljsel, ljv, 0.0), axis=1,
                                        keepdims=True)
            if not skip_gc:
                xq, yq, zq = tile(xc, FQ), tile(yc, FQ), tile(zc, FQ)
                kQ = tile(kcol, FQ)
                r2q = pair_r2c(fcq[:, 0:1], fcq[:, 1:2], fcq[:, 2:3],
                               xq, yq, zq)
                inv_r = jax.lax.rsqrt(r2q)
                coul = (fcq[:, 3:4] * sqc
                        * _erfc(alpha * (r2q * inv_r)) * inv_r)
                csel = kQ
                if ggr2:
                    # guest<->guest honest Coulomb cutoff (DIVERGENCES #22)
                    csel = csel & (r2q < ggr2)
                cacc = cacc + jnp.sum(jnp.where(csel, coul, 0.0), axis=1,
                                      keepdims=True)
            return (ljacc, cacc)
          return guest_chunk

        gacc = (jnp.zeros((GFL, 1), f32), jnp.zeros((GFQ, 1), f32))
        if skip_guest:
            pass
        elif nA == 1:
            gacc = jax.lax.fori_loop(0, n_live_c, make_guest_chunk(None),
                                     gacc)
        else:
            for tt in range(nA):
                lo_c = sb_off_ts[tt] // 128                 # static
                reg_chunks = (sb_off_ts[tt + 1] - sb_off_ts[tt]) // 128 \
                    if tt + 1 < nA else GS // 128 - lo_c
                n_c_t = (jnp.max(nmol_out[tt:tt + 1, :]) * A_ts[tt]
                         + 127) // 128
                n_c_t = jnp.minimum(n_c_t, reg_chunks)
                gacc = jax.lax.fori_loop(
                    lo_c, lo_c + n_c_t, make_guest_chunk(tt), gacc)
        # side sums with the f-major side matrices (one matmul each)
        g_lj0_row = sumrow_fm(gacc[0], E_sum_fl_fm[0])      # (1, G)
        g_lj1_row = sumrow_fm(gacc[0], E_sum_fl_fm[1])
        g_c0_row = sumrow_fm(gacc[1], E_sum_fq_fm[0])
        g_c1_row = sumrow_fm(gacc[1], E_sum_fq_fm[1])
        # fw window passes accumulate into (2G, 1) (g, side)-row carriers
        ljfw_rows = jnp.zeros((2 * G, 1), f32)
        cfw_rows = jnp.zeros((2 * G, 1), f32)

        # ---- fw window passes --------------------------------------------
        # Operand assembly goes through VMEM scratch written by direct row
        # stores at STATIC offsets: ONE slice + ONE strided store per
        # (g, side) from the stacked x/y/z/q + per-(species, atom) eps/sig2
        # table (fwcomb). The pass is VMEM-traffic bound
        # (docs/performance.md) and the per-(g, side) value-broadcast path
        # this replaced materialized every operand nA*nA*8-rows wide twice.
        if fw_on and not skip_fw:
            sfc = scratch_refs[0]
            scc = sfc if onewin else scratch_refs[1]
            if not skip_stage:
                for g in range(G):
                    for side, st in ((0, stL0), (1, stL1)):
                        sfc[:, 2 * g + side, :] = fwcomb_ref[
                            :, _ds128(st[0, g] * 128, WL)]
            # nA==1 + Lmax==1 (fw_ride): the LJ atom's (g, side) footprint
            # layout (g*FL + side at FL=2) coincides with the staged
            # scratch rows (2g + side), and with onewin the LJ window IS
            # the C window - so when the LJ atom also carries charge the
            # LJ pass rides that atom's C iteration and reuses its r2
            # plane (bit-exact: both operand paths are one-hot extractions
            # of the same footprint values). j_lj == -1 keeps the
            # standalone pass.
            j_lj = (q_atoms_ts[0].index(lj_atoms_ts[0][0])
                    if (fw_ride and onewin
                        and lj_atoms_ts[0][0] in q_atoms_ts[0])
                    else -1)

            if nA > 1:
                # (2G, 1) species ordinal per (g, side) row: row 2g+side
                # carries i_old[g] (side 0) / i_new[g] (side 1). E_gs is
                # 0/1 and the ordinals are small ints - exact at DEFAULT.
                sp_col = (jnp.dot(E_gs[0], col_of(i_old.astype(f32)),
                                  preferred_element_type=f32,
                                  precision=jax.lax.Precision.DEFAULT)
                          + jnp.dot(E_gs[1], col_of(i_new.astype(f32)),
                                    preferred_element_type=f32,
                                    precision=jax.lax.Precision.DEFAULT))

            def eps_planes(j):
                # staged eps/sig2 planes of LJ atom j: direct rows at
                # nA==1, per-replica species blend (row-wise gates on the
                # nA staged candidates) otherwise
                if nA == 1:
                    return sfc[4 + j], sfc[4 + Lmax + j]
                e = s = None
                for t2 in range(nA):
                    m_t = (sp_col == float(t2)).astype(f32)  # (2G, 1)
                    et = m_t * sfc[4 + t2 * Lmax + j]
                    st2 = m_t * sfc[4 + nA * Lmax + t2 * Lmax + j]
                    e = et if e is None else e + et
                    s = st2 if s is None else s + st2
                return e, s

            def fw_lj_accum(r2f, rows):
                # fw_ride regime: one staged plane each, weight gate from
                # the (1, GFL==2G) footprint weight row directly
                epsf, sig2f = eps_planes(0)                 # (2G, WL)
                sr2f = sig2f / r2f
                sr6f = sr2f * sr2f * sr2f
                ljf = 4.0 * epsf * (sr6f * sr6f - sr6f)
                self_f = (r2f < rc2) & (ljw[0, :][:, None] > 0.0)
                return rows + jnp.sum(jnp.where(self_f, ljf, 0.0),
                                      axis=1, keepdims=True)

            if not skip_fwmath and fw_ride and j_lj < 0:
                r2f = pair_r2(ptlj, sfc[0], sfc[1], sfc[2], fw_imask)
                ljfw_rows = fw_lj_accum(r2f, ljfw_rows)
            if not skip_fwmath and not fw_ride:
                # general LJ pass: loop LJ atoms over the staged window
                # planes (per-atom x/y/z/weight staged by ONE matmul)
                plw_j = dot1h(jnp.concatenate([ptlj, ljw], 0), E_fwL,
                              split="a")                    # (4, Lmax*2G)
                for j in range(Lmax):
                    blkj = plw_j[:, j * 2 * G:(j + 1) * 2 * G]
                    r2j = pair_r2(blkj[0:3], sfc[0], sfc[1], sfc[2],
                                  fw_imask)
                    epsj, sig2j = eps_planes(j)
                    sr2j = sig2j / r2j
                    sr6j = sr2j * sr2j * sr2j
                    ljfj = 4.0 * epsj * (sr6j * sr6j - sr6j)
                    selj = (r2j < rc2) & (blkj[3, :][:, None] > 0.0)
                    ljfw_rows = ljfw_rows + jnp.sum(
                        jnp.where(selj, ljfj, 0.0), axis=1, keepdims=True)
            if not onewin:
                # distinct Coulomb window: stage its x/y/z/q separately
                for g in range(G):
                    for side, st in ((0, stC0), (1, stC1)):
                        scc[:, 2 * g + side, :] = fwpq_ref[
                            :, _ds128(st[0, g] * 128, WC)]
            pqw_j = dot1h(jnp.concatenate([ptq, qw], 0), E_fwJ,
                          split="a")                        # (4, Qmax*2G)
            if fwfuse and not skip_fwmath:
                # ONE (Q2G, W) pass over Qmax-tiled window planes (see
                # _fwfuse_env). col_of-style identity dots lift the
                # per-atom scalars to (Q2G, 1) columns bit-exactly.
                def colq(i):
                    return jax.lax.dot_general(
                        I_Q2G, pqw_j[i:i + 1, :], (((1,), (1,)), ((), ())),
                        preferred_element_type=f32)          # (Q2G, 1)

                def tileq(p):
                    return jnp.concatenate([p] * Qmax, axis=0)
                r2a = pair_r2c(colq(0), colq(1), colq(2), tileq(scc[0]),
                               tileq(scc[1]), tileq(scc[2]), fw_imask)
                inv_ra = jax.lax.rsqrt(r2a)
                coulfa = (colq(3) * tileq(scc[3])
                          * _erfc(alpha2 * (r2a * inv_ra)) * inv_ra)
                ccols = jnp.sum(jnp.where(r2a < rc2sq2, coulfa, 0.0),
                                axis=1, keepdims=True)       # (Q2G, 1)
                cfw_rows = jnp.dot(E_fwsum, ccols,
                                   preferred_element_type=f32)
                if j_lj >= 0:
                    ljfw_rows = fw_lj_accum(
                        r2a[j_lj * 2 * G:(j_lj + 1) * 2 * G, :], ljfw_rows)
            else:
                cfw_acc = jnp.zeros((2 * G, WL if onewin else WC), f32)
                for j in ([] if skip_fwmath else range(Qmax)):
                    blkj = pqw_j[:, j * 2 * G:(j + 1) * 2 * G]  # (4, 2G)
                    r2c = pair_r2(blkj[0:3], scc[0], scc[1], scc[2],
                                  fw_imask)
                    inv_rc = jax.lax.rsqrt(r2c)
                    coulf = (blkj[3, :][:, None] * scc[3]
                             * _erfc(alpha2 * (r2c * inv_rc)) * inv_rc)
                    cfw_acc = cfw_acc + jnp.where(r2c < rc2sq2, coulf, 0.0)
                    if j == j_lj:
                        ljfw_rows = fw_lj_accum(r2c, ljfw_rows)
                # (2G, 1) fw C accumulator: rows are (g, side) pairs,
                # summed into e_c rows with the (g, side) side matrix E_gs
                cfw_rows = jnp.sum(cfw_acc, axis=1, keepdims=True)

        def dotT(a, b):
            # phase-power -> k-grid expansion: b is a 0/1 SELECTOR, so
            # the 3-pass split read is BIT-EXACT at half the MXU passes
            # of the "highest" pin (kernels/common.py dot1h)
            return dot1h(a, b, (((0,), (0,)), ((), ())), split="a")

        # ---- shared phase tables (main k-grid; far has its own chain) ----
        if skip_phase:
            # gate the whole phase/structure-factor build: zero tables with
            # the right shapes for the d-matmul section downstream
            pzT_re = jnp.zeros((JzP, GFK), f32)
            pzT_im = jnp.zeros((JzP, GFK), f32)
            t_re_all = jnp.zeros((GFK, JxyP_), f32)
            t_im_all = jnp.zeros((GFK, JxyP_), f32)
        elif skip_kstruct and skip_far:
            th_all = _th_fma(h2pi_ref, ptk * 0.0)
        else:
            # phase angles from POSITIONS: K=3 contraction as explicit
            # scalar-row FMAs - exact f32 on the VPU (a dot here would
            # either bf16-round the positions at DEFAULT precision or
            # cost 6 MXU passes at the engine's "highest" pin)
            th_all = _th_fma(h2pi_ref, ptk)
        if not skip_phase:
            cA, sA = jnp.cos(th_all), jnp.sin(th_all)
            nx, ny, nz = kx, ky, kz
            if skip_ktab:
                rex = [cA[0:1, :]] * (nx + 1)
                imx = [sA[0:1, :]] * (nx + 1)
                rey = [cA[1:2, :]] * (ny + 1)
                imy = [sA[1:2, :]] * (ny + 1)
                rez = [cA[2:3, :]] * (nz + 1)
                imz = [sA[2:3, :]] * (nz + 1)
            else:
                # ONE stacked recurrence for all three axes: each power step is
                # 6 ops on (3, GFK) instead of 3x6 on (1, GFK) rows (the three
                # single-row chains wasted 7/8 of the sublanes and measured
                # ~0.1 ms/step at nmax=32); per-element values are bit-identical
                nmax = max(nx, ny, nz)
                re3 = [jnp.ones_like(cA)]
                im3 = [jnp.zeros_like(sA)]
                for _ in range(nmax):
                    re3.append(re3[-1] * cA - im3[-1] * sA)
                    im3.append(re3[-2] * sA + im3[-1] * cA)
                rex = [r[0:1, :] for r in re3]
                imx = [r[0:1, :] for r in im3]
                rey = [r[1:2, :] for r in re3]
                imy = [r[1:2, :] for r in im3]
                rez = [r[2:3, :] for r in re3]
                imz = [r[2:3, :] for r in im3]
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
            # zy-packed far contraction: ONE MXU dot R = C_zy^T U over
            # K = 2*Jz2P*JyB replaces the old jz-first pipeline (four
            # K=Jz2P dots, a (Jxy2P, GFK) y-tiling concat, two
            # (Jxy2P, GFK) elementwise products and two block-sum dots).
            # U stacks the z*y phase products [U1;U2] (U1 = Re[pz*py],
            # U2 = Im[pz*py] of the signed tables); the static c2zy
            # operand (launcher-built from c2_re/c2_im, rows zy =
            # jz*JyB + jy) carries [[Cre|Cim],[Cim|-Cre]] so the single
            # dot yields the per-jx re rows (cols 0:Jx2P) and im rows
            # (cols Jx2P:) at once; the x phases close the sum.
            # The far chain runs on the FQ-layout footprint (ptq): the
            # k-space FK layout pads FQ up to a multiple of 8, so the
            # shared GFK tables carry G*(FK-FQ) dead lanes; a dedicated
            # power recurrence on (3, GFQ) cuts that padding out of the
            # U table, the packed dot and the closing x pass (values on
            # live columns are bit-identical - ptq and ptk read the same
            # positions through bit-exact selector dots).
            thq = _th_fma(h2pi_ref, ptq * 0.0 if skip_phase else ptq)
            cQ, sQ = jnp.cos(thq), jnp.sin(thq)
            nm2 = max(kx2, ky2, kz2)
            re3q = [jnp.ones_like(cQ)]
            im3q = [jnp.zeros_like(sQ)]
            for _ in range(nm2):
                re3q.append(re3q[-1] * cQ - im3q[-1] * sQ)
                im3q.append(re3q[-2] * sQ + im3q[-1] * cQ)
            reyq = [r[1:2, :] for r in re3q]
            imyq = [r[1:2, :] for r in im3q]
            rezq = [r[2:3, :] for r in re3q]
            imzq = [r[2:3, :] for r in im3q]
            py2T_re, py2T_im = _signed_table(reyq[:ky2 + 1], imyq[:ky2 + 1],
                                             ky2, pad_to=JyB_)  # (JyB, GFQ)
            pz2T_re2, pz2T_im2 = _signed_table(rezq[:kz2 + 1],
                                               imzq[:kz2 + 1],
                                               kz2, pad_to=Jz2P)

            def dotZ(a, b):
                # value-x-value contraction: 3-pass bf16 on hardware
                # (~1.5e-5 rel, inside the f32 dE envelope); exact f32
                # in interpret mode so CPU parity stays bit-exact
                if vv3:
                    return dot3(a, b, (((0,), (0,)), ((), ())))
                return jax.lax.dot_general(a, b, (((0,), (0,)), ((), ())),
                                           preferred_element_type=f32)

            u1, u2 = [], []
            for jz in range(Jz2P):
                zr = pz2T_re2[jz:jz + 1, :]
                zi = pz2T_im2[jz:jz + 1, :]
                u1.append(zr * py2T_re - zi * py2T_im)
                u2.append(zr * py2T_im + zi * py2T_re)
            U = jnp.concatenate(u1 + u2, axis=0)     # (2*Jz2P*JyB, GFQ)
            RB = dotZ(c2zy_ref[:, :], U)             # (2*Jx2P, GFQ)
            xpad = ([jnp.zeros((Jx2P_ - Jx2_, GFQ), f32)]
                    if Jx2P_ > Jx2_ else [])
            XR = jnp.concatenate([r[0:1, :] for r in re3q[:Jx2_]] + xpad,
                                 axis=0)             # (Jx2P, GFQ)
            XI = jnp.concatenate([r[0:1, :] for r in im3q[:Jx2_]] + xpad,
                                 axis=0)
            efar = (jnp.sum(XR * RB[:Jx2P_] + XI * RB[Jx2P_:],
                            axis=0, keepdims=True)
                    + fw_d0) * qw                           # (1, GFQ)
        elif fw_on:
            efar = jnp.zeros((1, GFQ), f32)

        # ---- reservoir push targets (rows shared by the per-g loop) ------
        if has_res:
            RSB_old = ti(_CI["RSB"], i_old)
            RMB_old = ti(_CI["RMB"], i_old)
            rcap_old = ti(_CI["RCAP"], i_old)
            resn_old_row = nrow_of(resn_out, i_old)
            res_full = resn_old_row >= rcap_old             # (1, G) bool
            push_idx = jnp.minimum(resn_old_row, rcap_old - 1)
            push_start = RSB_old + push_idx * A_old_r
            push_slot = RMB_old + push_idx
            # random placement in the reservoir box (centered; reference
            # convention, src/delete_molecule.f90:148-166)
            res_pos = jnp.concatenate(
                [cf(_CF["RH"] + 3 * i) * (urow(18) - 0.5)
                 + cf(_CF["RH"] + 3 * i + 1) * (urow(19) - 0.5)
                 + cf(_CF["RH"] + 3 * i + 2) * (urow(20) - 0.5)
                 for i in range(3)], axis=0)                # (3, G)

        # ---- per-replica k-space delta (d matmuls stay per-g) ------------
        # hoisted complex-packing halves: the per-g t_both assembly drops
        # from 3 concats + a negation to ONE row concat of two slices
        # (the 64-g loop is issue-bound, not MXU-bound)
        T_TOP = jnp.concatenate([t_re_all, t_im_all], axis=1)
        T_BOT = jnp.concatenate([-t_im_all, t_re_all], axis=1)

        def d_both_of(g):
            sl = slice(g * FK, (g + 1) * FK)
            t_both = jnp.concatenate([T_TOP[sl], T_BOT[sl]], axis=0)
            pzT_g = jnp.concatenate([pzT_re[:, sl], pzT_im[:, sl]],
                                    axis=1)
            if vv3:  # see dotZ: hardware-only 3-pass energy path
                return dot3(pzT_g, t_both)
            return jnp.dot(pzT_g, t_both, preferred_element_type=f32)

        if kmerge and skip_kstruct:
            # gate removes the d stores AND the cross elementwise/reduction
            # (zero-const DRE/DIM lets the compiler fold the whole section)
            DRE = jnp.zeros((GJz, JxyP_), f32)
            DIM = jnp.zeros((GJz, JxyP_), f32)
            cross_row = jnp.zeros((1, G), f32)
            # still needed by the (unskipped) amp commit; DCE'd with ampc
            AR = jnp.reshape(amp_re_out[...], (GJz, JxyP_))
            AI = jnp.reshape(amp_im_out[...], (GJz, JxyP_))
        elif kmerge:
            if kdiag:
                # ONE masked block-diagonal dot for all G structure-factor
                # deltas (see the bd_mask hoist); dot3 keeps the hardware
                # energy-path precision class of the per-g loop it replaces
                bd = jnp.concatenate(
                    [jnp.concatenate([pzT_re, pzT_im], axis=1)] * G,
                    axis=0) * bd_mask                       # (GJz, 2GFK)
                bop = jnp.concatenate([T_TOP, T_BOT], 0)    # (2GFK, 2JxyP)
                d_all = (dot3(bd, bop) if vv3 else
                         jnp.dot(bd, bop, preferred_element_type=f32))
                DRE = d_all[:, :JxyP_]
                DIM = d_all[:, JxyP_:]
            else:
                # per-g: ONE small matmul stored straight into the
                # (GJz, 2JxyP) scratch; the 2*G cross reductions and 2*G
                # amp commits become one big elementwise pass + two
                # block-sum matmuls
                for g in range(G):
                    dscr[g * JzP:(g + 1) * JzP, :] = d_both_of(g)
                DRE = dscr[:, :JxyP_]
                DIM = dscr[:, JxyP_:]
            AR = jnp.reshape(amp_re_out[...], (GJz, JxyP_))
            AI = jnp.reshape(amp_im_out[...], (GJz, JxyP_))
            Xc = kw_tiled * (2.0 * (AR * DRE + AI * DIM)
                             + DRE * DRE + DIM * DIM)
            cross_vec = jnp.sum(Xc, axis=1, keepdims=True)   # (GJz, 1)
            cross_row = jax.lax.dot_general(
                cross_vec, E_kz, (((0,), (0,)), ((), ())),
                preferred_element_type=f32)                  # (1, G)
        else:
            d_res, d_ims, cross_list = [], [], []
            for g in range(G):
                ar = amp_re_out[g]
                ai = amp_im_out[g]
                if skip_kstruct:
                    d_re = jnp.zeros((JzP, JxyP_), f32)
                    d_im = jnp.zeros((JzP, JxyP_), f32)
                    cross = jnp.sum(kw_ref[:, :] * (ar * d_re + ai * d_im))
                else:
                    d_both = d_both_of(g)
                    d_re = d_both[:, :JxyP_]
                    d_im = d_both[:, JxyP_:]
                    cross = jnp.sum(
                        kw_ref[:, :] * (2.0 * (ar * d_re + ai * d_im)
                                        + d_re * d_re + d_im * d_im))
                d_res.append(d_re)
                d_ims.append(d_im)
                cross_list.append(cross)
            cross_row = jnp.stack(cross_list).reshape(1, G)

        # ---- e-sum rows + lane-vectorized Metropolis ---------------------
        def sumrow(rows, E):
            return jax.lax.dot_general(rows, E, (((0,), (0,)), ((), ())),
                                       preferred_element_type=f32)

        e_lj0_row = g_lj0_row                               # (1, G)
        e_lj1_row = g_lj1_row
        e_c0_row = g_c0_row * coulomb_k
        e_c1_row = g_c1_row * coulomb_k
        if fw_on:
            # fw LJ/C contributions live in (g, side) rows (2G, 1); E_gs
            # == E_sum_fl at Lmax == 1 (the pre-r5 layout) so the flagship
            # sums are bit-identical
            e_lj0_row = e_lj0_row + sumrow(ljfw_rows, E_gs[0])
            e_lj1_row = e_lj1_row + sumrow(ljfw_rows, E_gs[1])
            e_c0_row = e_c0_row + sumrow(cfw_rows, E_gs[0]) * coulomb_k
            e_c1_row = e_c1_row + sumrow(cfw_rows, E_gs[1]) * coulomb_k
        if fw_on:
            e_c0_row = e_c0_row + jnp.dot(efar, E_sum_fq[0],
                                          preferred_element_type=f32)
            e_c1_row = e_c1_row + jnp.dot(efar, E_sum_fq[1],
                                          preferred_element_type=f32)
        nf_old = n_old_row.astype(f32)
        nf_new = n_new_row.astype(f32)
        e_recip_old_row = eng_out[0:1, :]
        e_recip_new_row = e_recip_old_row + cross_row * c2piv
        delta_row = (e_rest_new + e_lj1_row + e_c1_row + e_recip_new_row
                     - e_rest_old - e_lj0_row - e_c0_row - e_recip_old_row)
        if nA == 1:
            act_old_row = act_new_row = cstg_ref[0, _CG["ACT"]]
        else:
            act_old_row = act_old
            act_new_row = act_new
        pref_row = jnp.where(
            insert, act_new_row * cf(_CF["VOL"]) / (nf_new + 1.0), 1.0)
        pref_row = pref_row * jnp.where(
            remove, nf_old / (act_old_row * cf(_CF["VOL"])), 1.0)
        p_acc_row = jnp.minimum(1.0, pref_row * jnp.exp(-delta_row * inv_t))
        if skip_met:
            p_acc_row = jnp.zeros((1, G), f32)  # DCEs the pref/exp chain
        gate_row = valid & (~cap_blocked)
        accr = gate_row & (urow(2) <= p_acc_row)            # (1, G) bool
        if force_rej:
            # attribution mode: reject every move at runtime (the compare
            # is opaque to the compiler, so no commit work is DCE'd) so
            # populations - and therefore per-section cost - stay fixed
            # across MANIAC_KABLATE variants
            accr = accr & (urow(2) < -1.0)
        accf_row = accr.astype(f32)

        # ---- commits (batched strided per-coordinate selects) -------------
        if kmerge and not skip_ampc:
            # merged amp commit: accf expanded to (GJz, 1) via block-sum
            # matrix; values identical to the per-g accf * d adds
            # 0/1 x 0/1 expansion: bf16-exact at any precision, ONE pass
            accf_col = jax.lax.dot_general(
                E_kz, accf_row, (((1,), (1,)), ((), ())),
                preferred_element_type=f32,
                precision=jax.lax.Precision.DEFAULT)         # (GJz, 1)
            amp_re_out[...] = jnp.reshape(AR + accf_col * DRE,
                                          (G, JzP, JxyP_))
            amp_im_out[...] = jnp.reshape(AI + accf_col * DIM,
                                          (G, JzP, JxyP_))
        else:
            if not skip_ampc:
                for g in range(G):
                    accf = accf_row[0, g]
                    amp_re_out[g] = amp_re_out[g] + accf * d_res[g]
                    amp_im_out[g] = amp_im_out[g] + accf * d_ims[g]

        dw_col = col_of((accr & w_new).astype(f32)) > 0     # (G, 1)
        dc_col = col_of((accr & remove).astype(f32)) > 0
        # position commits: per-replica W2-col window read-modify-write at
        # the (backfilled) old start and the new start, O(1) per step like
        # the footprint reads (the chunked select scan was O(occupancy)
        # and cost 0.46 ms/step at the reference-capacity bench). Old
        # backfill lands before the new write, matching the chunked
        # path's select order; each g touches only its own pos page.
        if not skip_pos:
            dwi = (accr & w_new).astype(jnp.int32)          # (1, G)
            dci = (accr & remove).astype(jnp.int32)
            # batched commit math: ONE (3G, GA) x (GA, W2) one-hot
            # placement matmul per side builds every replica's (3, W2)
            # write image at once (vs 2*G tiny matmuls); the per-replica
            # dynamic-window read-modify-write stores remain per-g. Old
            # backfill lands before the new write (store order below),
            # matching the sequential path; bit-exact like the reads
            # (one nonzero product per output element).
            c0n_row = jnp.minimum((site_start_new // 128) * 128, S - W2)
            offo_col = exp_off_col(site_start_old - c0o_row)  # (GA, 1)
            offn_col = exp_off_col(site_start_new - c0n_row)
            valw_all = []
            for vals, off_col in ((last_cols, offo_col),
                                  (P_newT, offn_col)):
                bd = jnp.concatenate([vals] * G, 0) * CM3   # (3G, GA)
                ohp = (iw2gT == off_col + ag2T).astype(f32)  # (GA, W2)
                valw_all.append(dot1h(bd, ohp, split="a"))  # (3G, W2)
            for g in range(G):
                if nA == 1:
                    A_old_g = A_new_g = A
                else:
                    A_old_g = A_old_r[0, g]
                    A_new_g = A_new_r[0, g]
                for c0_r, st_g, gate_g, vw, A_g in (
                        (c0o_row, site_start_old[0, g], dci[0, g],
                         valw_all[0], A_old_g),
                        (c0n_row, site_start_new[0, g], dwi[0, g],
                         valw_all[1], A_new_g)):
                    c0 = c0_r[0, g]
                    off = st_g - c0
                    blk = pos_out[g, :, _ds128(c0, W2)]     # (3, W2)
                    inw = ((lane_w2 >= off) & (lane_w2 < off + A_g)
                           & (gate_g > 0))                  # (1, W2)
                    pos_out[g, :, _ds128(c0, W2)] = jnp.where(
                        inw, vw[3 * g:3 * g + 3, :], blk)

        slotn_c = col_of(slot_new.astype(f32))
        if not skip_com:
            m_cmp = dc_col & (mi_G == slot_old_c)           # (G, MP)
            m_wr = dw_col & (mi_G == slotn_c)
            for i in range(3):
                cv = com_out[:, i, :]
                cv = jnp.where(m_cmp, col_of(com_last[i:i + 1, :]), cv)
                cv = jnp.where(m_wr, col_of(com_new[i:i + 1, :]), cv)
                com_out[:, i, :] = cv

        if has_res:
            # pop the sampled reservoir molecule on accepted insertion;
            # push the removed molecule on accepted deletion (a full
            # reservoir drops it, counted in cnt row 6). Per-replica, not
            # batched: see the reservoir-read note above (strided reservoir
            # ref access crashes the multi-program launch on hardware).
            acc_i_row = accr.astype(jnp.int32)
            ins_i = insert.astype(jnp.int32)
            rem_i = remove.astype(jnp.int32)
            rfull_i = res_full.astype(jnp.int32)
            for g in range(G):
                acc = acc_i_row[0, g] > 0
                if nA == 1:
                    A_new_g = A_old_g = A
                else:
                    A_new_g = A_new_r[0, g]
                    A_old_g = A_old_r[0, g]
                do_pop = acc & (ins_i[0, g] > 0)
                do_push = acc & (rem_i[0, g] > 0) & (rfull_i[0, g] == 0)
                sr = jax.lax.broadcasted_iota(jnp.int32, (1, SresP),
                                              1)[0, :]
                rel_pop = sr - res_src[0, g]
                rel_push = sr - push_start[0, g]
                in_pop = do_pop & (rel_pop >= 0) & (rel_pop < A_new_g)
                in_push = do_push & (rel_push >= 0) & (rel_push < A_old_g)
                rout = resoff_out[g]
                for a in range(A):
                    sel_p = ((rel_push == a) & in_push)[None, :]
                    rout = jnp.where(sel_p, off_old[:, g * A + a][:, None],
                                     rout)
                for a in range(A):
                    sel_c = ((rel_pop == a) & in_pop)[None, :]
                    rout = jnp.where(
                        sel_c, res_lastoff_cols[:, g * A + a][:, None],
                        rout)
                resoff_out[g] = rout
                mr = jax.lax.broadcasted_iota(jnp.int32, (1, MresP),
                                              1)[0, :]
                rcv = rescom_out[g]
                rcv = jnp.where((do_push & (mr == push_slot[0, g]))[None, :],
                                res_pos[:, g:g + 1], rcv)
                rcv = jnp.where((do_pop & (mr == pop_slot[0, g]))[None, :],
                                rescom_last[:, g:g + 1], rcv)
                rescom_out[g] = rcv

        # ---- lane-vectorized energy-component accumulation ----------------
        zero2 = jnp.zeros((2, G), f32)
        eng_delta = jnp.concatenate(
            [jnp.where(accr, cross_row * c2piv, 0.0),
             accf_row * (e_lj1_row - e_lj0_row),
             accf_row * (e_c1_row - e_c0_row),
             accf_row * (s_new - s_old),
             accf_row * (i_new_e - i_old_e),
             accf_row * delta_row, zero2], axis=0)          # (8, G)
        if not skip_eng:
            eng_out[0:8, :] = eng_out[0:8, :] + eng_delta

        accb = accr
        if nA == 1:
            nmol_out[0:1, :] = (nmol_out[0:1, :]
                                + jnp.where(accb & insert, 1, 0)
                                - jnp.where(accb & remove, 1, 0))
        else:
            for tt in range(nA):
                nmol_out[tt:tt + 1, :] = (
                    nmol_out[tt:tt + 1, :]
                    + jnp.where(accb & insert & (i_new == tt), 1, 0)
                    - jnp.where(accb & remove & (i_old == tt), 1, 0))
        if has_res:
            do_pop_row = accb & insert
            do_push_row = accb & remove & (~res_full)
            if nA == 1:
                resn_out[0:1, :] = (resn_out[0:1, :]
                                    + jnp.where(do_push_row, 1, 0)
                                    - jnp.where(do_pop_row, 1, 0))
            else:
                for tt in range(nA):
                    resn_out[tt:tt + 1, :] = (
                        resn_out[tt:tt + 1, :]
                        + jnp.where(do_push_row & (i_old == tt), 1, 0)
                        - jnp.where(do_pop_row & (i_new == tt), 1, 0))

        cm = jax.lax.broadcasted_iota(jnp.int32, (16, G), 0)
        mv16 = jnp.broadcast_to(move, (16, G))
        valid16 = jnp.broadcast_to(valid, (16, G))
        acc16 = jnp.broadcast_to(accb, (16, G))
        cb16 = jnp.broadcast_to(cap_blocked & valid, (16, G))
        inc = (((cm == mv16) & valid16)
               | ((cm == mv16 + 8) & acc16)
               | ((cm == 5) & cb16)).astype(f32)
        if has_res:
            drop16 = jnp.broadcast_to(accb & remove & res_full, (16, G))
            inc = inc + ((cm == 6) & drop16).astype(f32)
        if not skip_cnt:
            cnt_out[:, :] = cnt_out[:, :] + inc
        return carry

    jax.lax.fori_loop(0, n_steps, step_body, 0)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def run_block_grouped(spec, states_g, uniforms_qmajor, *, interpret=False):
    """Run n_steps MC steps for G replicas in ONE Pallas program.
    states_g: SimState with leading G axis; uniforms_qmajor:
    (n_steps, NU*G), quantity-major. Returns (pos, com, amp_re, amp_im,
    n_mol (nA, G), energy (8, G), counters (16, G), res_off (G,3,SresP),
    res_com (G,3,MresP), res_n (nA, G))."""
    f = spec.dtype
    if not interpret:
        interpret = jax.devices()[0].platform == "cpu"
    G = states_g.n_mol.shape[0]
    JzP, JxyP = spec.amp_shape
    S = spec.S
    aids = tuple(r for r in range(spec.R) if spec.active_list[r])
    nA = len(aids)
    A = spec.A_act
    A_ts = tuple(spec.A_list[r] for r in aids)
    kx, ky, kz = spec.kmax_xyz
    kx2, ky2, kz2 = spec.kmax2_xyz
    Jz2P, _ = spec.amp2_shape
    gb = spec.guest_base if spec.fw_split else 0
    n_steps = uniforms_qmajor.shape[0]
    has_res = bool(spec.has_reservoir)
    from ..mc.moves import N_UNIFORMS

    # per-active-type static atom patterns (spec meta)
    lj_atoms_ts = tuple(tuple(spec.lj_idx_list[r][:spec.Lmax]) for r in aids)
    q_atoms_ts = tuple(tuple(spec.q_idx_list[r][:spec.Qmax]) for r in aids)

    tricl = bool(spec.is_triclinic)
    assert not (tricl and spec.fw_split), \
        "static-framework split is orthorhombic-only (fwsplit.py gate)"
    cstf = jnp.zeros(144, f)
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
    cstf = cstf.at[_CF["RH"]:_CF["RH"] + 9].set(spec.res_H.reshape(-1))
    if tricl:
        cstf = cstf.at[_CF["HINV"]:_CF["HINV"] + 9].set(
            spec.Hinv.reshape(-1))
        cstf = cstf.at[_CF["IMG"]:_CF["IMG"] + 81].set(
            spec.image_shifts.reshape(-1))
    cstf = cstf.reshape(1, 144)
    aidx = jnp.asarray(aids, dtype=jnp.int32)
    cstg = jnp.zeros((nA, 8), f)
    cstg = cstg.at[:, _CG["ACT"]].set(spec.type_activity[aidx])
    cstg = cstg.at[:, _CG["SELF"]].set(spec.type_self_energy[aidx])
    cstg = cstg.at[:, _CG["FWD0"]].set(spec.fw_d0)
    cstg = cstg.at[:, _CG["RCWL"]].set(spec.fw_rcw_lj)
    cstg = cstg.at[:, _CG["RCWC"]].set(spec.fw_rcw_c)
    csti = jnp.zeros((nA, 16), jnp.int32)
    csti = csti.at[:, _CI["A"]].set(spec.type_A[aidx])
    csti = csti.at[:, _CI["CAP"]].set(spec.type_cap[aidx])
    csti = csti.at[:, _CI["SB"]].set(spec.type_site_base[aidx])
    csti = csti.at[:, _CI["MB"]].set(spec.type_mol_base[aidx])
    csti = csti.at[:, _CI["MTOT"]].set(spec.Mtot)
    csti = csti.at[:, _CI["RSB"]].set(spec.res_type_site_base[aidx])
    csti = csti.at[:, _CI["RMB"]].set(spec.res_type_mol_base[aidx])
    csti = csti.at[:, _CI["RCAP"]].set(spec.res_cap[aidx])

    qrow = spec.type_q_rows[aidx][:, :A]                   # (nA, A)
    templ = spec.type_template_off[aidx].transpose(0, 2, 1).reshape(
        3 * nA, A)

    NBG = spec.fw_SG // 128
    nmol_in = states_g.n_mol[:, aidx].T.astype(jnp.int32)  # (nA, G)
    eng_in = jnp.concatenate(
        [states_g.energy.T.astype(f),
         jnp.zeros((2, G), f)], axis=0)                     # (8, G)
    if has_res:
        Sres = states_g.res_offset.shape[1]
        Mres = states_g.res_com.shape[1]
        SresP = _round_up(Sres, 128)
        MresP = _round_up(Mres, 128)
        resoff = jnp.pad(states_g.res_offset.transpose(0, 2, 1).astype(f),
                         ((0, 0), (0, 0), (0, SresP - Sres)))
        rescom = jnp.pad(states_g.res_com.transpose(0, 2, 1).astype(f),
                         ((0, 0), (0, 0), (0, MresP - Mres)))
        resn_in = states_g.res_n[:, aidx].T.astype(jnp.int32)
    else:
        SresP = MresP = 128
        resoff = jnp.zeros((G, 3, SresP), f)
        rescom = jnp.zeros((G, 3, MresP), f)
        resn_in = jnp.zeros((nA, G), jnp.int32)

    # zy-packed far-field coefficient operand: reorganize c2_re/c2_im
    # (Jz2P, Jxy2P dense, cols jx*JyB + jy) into (2*Jz2P*JyB, 2*Jx2P)
    # [[Cre|Cim],[Cim|-Cre]] so the kernel's far pass is ONE packed dot
    # against the z*y phase-product table (see the far section). Traced
    # XLA reshape/transpose, rebuilt per block launch (~1 MB, negligible).
    if spec.fw_split:
        Jy2h = 2 * ky2 + 1
        JyBh = _round_up(Jy2h, 8)
        Jx2h = kx2 + 1
        Jx2Ph = _round_up(Jx2h, 8)
        cre = spec.c2_re[:, :Jx2h * JyBh].reshape(Jz2P, Jx2h, JyBh)
        cim = spec.c2_im[:, :Jx2h * JyBh].reshape(Jz2P, Jx2h, JyBh)
        cre = jnp.transpose(cre, (0, 2, 1)).reshape(Jz2P * JyBh, Jx2h)
        cim = jnp.transpose(cim, (0, 2, 1)).reshape(Jz2P * JyBh, Jx2h)
        zpad = jnp.zeros((Jz2P * JyBh, Jx2Ph - Jx2h), spec.c2_re.dtype)
        cre = jnp.concatenate([cre, zpad], axis=1)
        cim = jnp.concatenate([cim, zpad], axis=1)
        c2zy = jnp.concatenate(
            [jnp.concatenate([cre, cim], axis=1),
             jnp.concatenate([cim, -cre], axis=1)], axis=0).astype(f)
    else:
        c2zy = jnp.zeros((8, 128), f)

    # static per-type column offsets of the guest regions (128-aligned by
    # the system.py base layout) for the per-type guest chunk loops
    sb_off_ts = tuple(int(spec.site_base_list[r]) - (gb if spec.fw_split
                                                     else 0) for r in aids)
    assert all(o % 128 == 0 for o in sb_off_ts), sb_off_ts
    assert all(b > a for a, b in zip(sb_off_ts, sb_off_ts[1:])), sb_off_ts

    import os
    kernel = functools.partial(
        _blockg_kernel, n_steps=n_steps, NU=N_UNIFORMS, G=G, S=S, A=A,
        Lmax=spec.Lmax, Qmax=spec.Qmax, kx=kx, ky=ky, kz=kz, JzP=JzP,
        fw_on=spec.fw_split, gbase=gb, SG=spec.fw_SG, NBG=NBG,
        WL=spec.fw_WL, WC=spec.fw_WC, kx2=kx2, ky2=ky2, kz2=kz2,
        Jz2P=Jz2P, fw_axis=spec.fw_axis, nA=nA, A_ts=A_ts, aids=aids,
        has_res=has_res, lj_atoms_ts=lj_atoms_ts, q_atoms_ts=q_atoms_ts,
        sb_off_ts=sb_off_ts, kmerge=(JzP % 8 == 0), vv3=not interpret,
        onewin=bool(getattr(spec, "fw_onewin", False)), tricl=tricl,
        ggr2=(spec.gg_rcut * spec.gg_rcut if spec.gg_cut else 0.0),
        kdiag=_kdiag_env(interpret), gsel=_gsel_env(),
        fwfuse=_fwfuse_env(interpret),
        ablate=os.environ.get("MANIAC_KABLATE", ""))
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    MP = spec.Mtot + 1
    if spec.fw_split:
        # staged-table rows: x/y/z/q + per-(species, LJ atom) eps/sig2.
        # The eps/sig2 row for (species t, atom j) vs a framework site
        # depends only on (t, j) - the DIAGONAL pid block (t*nA+t)*8 of
        # the nA*nA*8-row grouped table carries it at side 0 (rows
        # (t*nA+t)*8 + j); the kernel blends the nA staged candidate
        # planes per (g, side) row instead of selecting rows per replica.
        eps_rows = [spec.fw_eps_g[(t * nA + t) * 8:(t * nA + t) * 8
                                  + spec.Lmax] for t in range(nA)]
        sig_rows = [spec.fw_sig2_g[(t * nA + t) * 8:(t * nA + t) * 8
                                   + spec.Lmax] for t in range(nA)]
        fwcomb = jnp.concatenate([spec.fw_pq_g] + eps_rows + sig_rows,
                                 axis=0)       # (4 + 2*nA*Lmax, SG)
        scratch_shapes = [pltpu.VMEM(
            (4 + 2 * nA * spec.Lmax, 2 * G, spec.fw_WL), f)]
        if not getattr(spec, "fw_onewin", False):
            scratch_shapes.append(pltpu.VMEM((4, 2 * G, spec.fw_WC), f))
    else:
        fwcomb = jnp.zeros((1, 128), f)
        scratch_shapes = []
    kmerge = (JzP % 8 == 0)
    kdiag_h = _kdiag_env(interpret)
    if kmerge and not kdiag_h:
        # the merged-d scratch serves only the per-g store path; the
        # block-diagonal dot (kdiag) produces DRE/DIM as a value
        scratch_shapes.append(pltpu.VMEM((G * JzP, 2 * JxyP), f))
    outs = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((G, 3, S), f),
                   jax.ShapeDtypeStruct((G, 3, MP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((G, JzP, JxyP), f),
                   jax.ShapeDtypeStruct((nA, G), jnp.int32),
                   jax.ShapeDtypeStruct((8, G), f),
                   jax.ShapeDtypeStruct((16, G), f),
                   jax.ShapeDtypeStruct((G, 3, SresP), f),
                   jax.ShapeDtypeStruct((G, 3, MresP), f),
                   jax.ShapeDtypeStruct((nA, G), jnp.int32)),
        in_specs=[vmem] * 33,
        out_specs=(vmem,) * 10,
        input_output_aliases={26: 0, 27: 1, 28: 2, 29: 3, 30: 7, 31: 8},
        scratch_shapes=scratch_shapes,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=127 * 1024 * 1024),
        interpret=interpret,
    )(uniforms_qmajor, cstf, cstg, csti,
      spec.two_pi_Hinv, spec.ex_sel, spec.ey_sel, spec.k_weights,
      spec.eps_pair_lj[:, gb:], spec.sig2_pair_lj[:, gb:],
      spec.site_q.reshape(1, S)[:, gb:],
      spec.site_mol.reshape(1, S)[:, gb:],
      spec.site_type.reshape(1, S)[:, gb:],
      spec.site_midx.reshape(1, S)[:, gb:],
      qrow, templ,
      spec.fw_pq_g, spec.fw_eps_g, spec.fw_sig2_g,
      spec.fw_blockmax.reshape(1, NBG),
      c2zy,
      nmol_in, eng_in,
      states_g.trans_step.astype(f).reshape(1, G),
      states_g.rot_step.astype(f).reshape(1, G),
      resn_in,
      states_g.pos, states_g.com, states_g.amp_re, states_g.amp_im,
      resoff, rescom, fwcomb)
    return outs
