"""Jittable energy engine: LJ + real-space Ewald + reciprocal + corrections.

Physics matches the reference exactly (see per-function citations); the
implementation is masked dense array math over the flat site layout so the
same code path serves single moves, full-system audits, vmapped replicas and
sharded meshes.

Semantics preserved from the reference:
* LJ has a hard real-space cutoff; the damped Coulomb erfc(alpha r)/r term is
  summed over ALL pairs with no cutoff (reference quirk, both in
  src/energy_utils.f90:225-255 CoulombEnergy and :374-442 single-mol path).
* Intramolecular correction (erfc(alpha r)-1)/r applies only to ACTIVE
  residue types (reference: src/energy_utils.f90:55-81).
* Self energy: -alpha/sqrt(pi) sum(q^2) per molecule, all types
  (reference: src/energy_utils.f90:307-368).
* Reciprocal: E = C * 2*pi/V * sum_k f_k W_k |A(k)|^2 over the half-space
  k-list with symmetry form factors (reference: src/ewald_energy.f90:105-147).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.scipy.special import erfc

from ..constants import COULOMB_K, SMALL, TWOPI
from ..system import E_COUL, E_INTRA, E_LJ, E_RECIP, E_SELF, E_TOT, SystemSpec
from .pbc import min_image_dist2

_R2_FLOOR = 1e-18


def site_positions(spec: SystemSpec, state) -> jnp.ndarray:
    """Absolute site positions (S,3) = COM[mol(site)] + offset."""
    return state.com[spec.site_mol] + state.offset


def active_site_mask(spec: SystemSpec, n_mol) -> jnp.ndarray:
    """(S,) bool: site belongs to an existing molecule (pad rows excluded)."""
    return spec.site_midx < n_mol[spec.site_type]


def pair_energy_footprint(spec: SystemSpec, others_pos, others_mask,
                          mov_pos, mov_q, mov_cls, mov_mask,
                          exclude_mol_a, exclude_mol_b):
    """LJ + real-space Coulomb of footprint molecules vs all other sites.

    mov_pos: (B, A, 3); mov_q/mov_cls/mov_mask: (B, A). Returns
    (e_lj[B], e_coul[B]) in Kelvin. Pairs with sites whose molecule slot is
    exclude_mol_a or exclude_mol_b are skipped (self-molecule exclusion, and
    the removed molecule during swap moves).

    Mirrors ComputePairInteractionEnergy_singlemol
    (reference: src/energy_utils.f90:374-442).
    """
    delta = others_pos[None, None, :, :] - mov_pos[:, :, None, :]  # (B,A,S,3)
    r2 = min_image_dist2(delta, spec)                              # (B,A,S)
    r2 = jnp.maximum(r2, _R2_FLOOR)

    keep = (others_mask
            & (spec.site_mol != exclude_mol_a)
            & (spec.site_mol != exclude_mol_b))                    # (S,)
    mask = keep[None, None, :] & mov_mask[:, :, None]              # (B,A,S)

    # LJ (cutoff applies); class->site tables give one contiguous row gather
    # per footprint atom instead of a (class,class) double gather
    eps = jnp.take(spec.eps_site, mov_cls, axis=0)                 # (B,A,S)
    sig2 = jnp.take(spec.sig2_site, mov_cls, axis=0)
    inv_r2 = 1.0 / r2
    sr2 = sig2 * inv_r2
    sr6 = sr2 * sr2 * sr2
    lj = 4.0 * eps * (sr6 * sr6 - sr6)
    lj_mask = mask & (r2 < spec.cutoff * spec.cutoff)
    e_lj = jnp.sum(jnp.where(lj_mask, lj, 0.0), axis=(1, 2))

    # damped Coulomb (no cutoff; reference quirk)
    inv_r = jnp.sqrt(inv_r2)
    qq = mov_q[:, :, None] * spec.site_q[None, None, :]
    coul = qq * erfc(spec.alpha * r2 * inv_r) * inv_r
    e_coul = jnp.sum(jnp.where(mask, coul, 0.0), axis=(1, 2)) * COULOMB_K
    return e_lj, e_coul


def intra_energy(spec: SystemSpec, pos, q, mask):
    """Intramolecular Ewald correction sum_{i<j} q_i q_j (erfc(a r)-1)/r.

    pos: (..., A, 3). Reference:
    ComputeIntraResidueRealCoulombEnergySingleMol
    (src/ewald_energy.f90:371-411); uses minimum-image distances.
    """
    delta = pos[..., None, :, :] - pos[..., :, None, :]            # (...,A,A,3)
    r2 = jnp.maximum(min_image_dist2(delta, spec), _R2_FLOOR)
    r = jnp.sqrt(r2)
    qq = q[..., None, :] * q[..., :, None]
    pair_mask = mask[..., None, :] & mask[..., :, None]
    A = pos.shape[-2]
    iu = jnp.triu(jnp.ones((A, A), bool), k=1)
    pair_mask = pair_mask & iu & (r2 > SMALL * SMALL)
    e = qq * (erfc(spec.alpha * r) - 1.0) / r
    return jnp.sum(jnp.where(pair_mask, e, 0.0), axis=(-1, -2)) * COULOMB_K


def footprint_phases(spec: SystemSpec, pos):
    """theta(k) = k . r for footprint positions; pos (..., A, 3) -> (..., A, K).

    One MXU matmul replaces the reference's cached per-atom 1-D phase-factor
    tables and their save/restore copies (src/ewald_phase.f90:90-183)."""
    return pos @ spec.k_cart.T


def amp_delta_direct(spec: SystemSpec, pos, q, mask, signs):
    """Reference-style direct structure-factor update: cos/sin over the full
    (A, K) phase matrix. Kept as the precision oracle for amp_delta."""
    theta = footprint_phases(spec, pos)                  # (B,A,K)
    w = (q * mask) [..., None] * signs[:, None, None]    # (B,A,1)
    d_re = jnp.sum(w * jnp.cos(theta), axis=(0, 1))
    d_im = jnp.sum(w * jnp.sin(theta), axis=(0, 1))
    return d_re, d_im


def amp_delta(spec: SystemSpec, pos, q, mask, signs):
    """Structure-factor update dA(k) = sum_b s_b sum_a q e^{i k.r_ba}.

    pos: (B,A,3), q/mask: (B,A), signs: (B,) in {-1,0,+1}. Returns
    (d_re[K], d_im[K]). Same update as the reference's incremental A(k)
    (ComputeRecipEnergySingleMol, src/ewald_energy.f90:240-256) with its
    deletion branch fixed (the reference passes is_creation for deletions,
    src/monte_carlo_utils.f90:308 - a sign/identity bug we do not replicate).

    TPU-first evaluation: the phase factor is separable,
    e^{i k.r} = ex[|kx|] ey[|ky|]^(sy) ez[|kz|]^(sz), so we build per-axis
    power tables with ONE cos/sin per atom per axis (the reference caches the
    same tables per atom across all molecules, src/ewald_phase.f90:90-111;
    we recompute them per move, which is cheaper than its save/restore
    copies), then expand them over the k-list with static one-hot matmuls on
    the MXU - no (A, K) transcendentals anywhere.
    """
    B, A = q.shape
    BA = B * A
    theta = (pos @ spec.two_pi_Hinv.T).reshape(BA, 3)     # (BA, 3)
    c1, s1 = jnp.cos(theta), jnp.sin(theta)               # (BA, 3)

    # power tables e^{i j theta}, j = 0..kmax_pad, by repeated complex mult
    res = [jnp.ones_like(c1)]
    ims = [jnp.zeros_like(s1)]
    for _ in range(spec.kmax_pad):
        re, im = res[-1], ims[-1]
        res.append(re * c1 - im * s1)
        ims.append(re * s1 + im * c1)
    tab_re = jnp.stack(res, axis=1)                        # (BA, J, 3)
    tab_im = jnp.stack(ims, axis=1)

    # expand over the k-list: (K, J) @ (J, BA) per axis -> (K, BA), on MXU
    def expand(ax):
        oh = spec.k_onehot[ax]                             # (K, J)
        er = oh @ tab_re[:, :, ax].T
        ei = oh @ tab_im[:, :, ax].T
        return er, ei

    ex_re, ex_im = expand(0)
    ey_re, ey_im = expand(1)
    ez_re, ez_im = expand(2)
    ey_im = ey_im * spec.k_sign_y[:, None]                 # conj for ky < 0
    ez_im = ez_im * spec.k_sign_z[:, None]

    t_re = ex_re * ey_re - ex_im * ey_im
    t_im = ex_re * ey_im + ex_im * ey_re
    p_re = t_re * ez_re - t_im * ez_im                     # (K, BA)
    p_im = t_re * ez_im + t_im * ez_re

    w = ((q * mask) * signs[:, None]).reshape(BA)          # (BA,)
    d_re = p_re @ w
    d_im = p_im @ w
    return d_re, d_im


def recip_energy(spec: SystemSpec, amp_re, amp_im):
    """E_recip = C * 2*pi/V * sum_k f_k W_k |A_k|^2 (Kelvin)."""
    amp2 = amp_re * amp_re + amp_im * amp_im
    return (jnp.sum(spec.k_form * spec.k_weights * amp2)
            * COULOMB_K * TWOPI / spec.volume)


# ---------------------------------------------------------------------------
# full-system recompute (startup + drift audits)
# ---------------------------------------------------------------------------

_CHUNK = 128


def full_amplitudes(spec: SystemSpec, pos, active):
    """A(k) = sum_s q_s e^{i k.r_s} over all active sites, chunked over S."""
    S = spec.S
    qm = jnp.where(active, spec.site_q, 0.0)
    pos_c = pos.reshape(S // _CHUNK, _CHUNK, 3)
    q_c = qm.reshape(S // _CHUNK, _CHUNK)

    def body(carry, xs):
        re, im = carry
        p, q = xs
        theta = p @ spec.k_cart.T                       # (chunk, K)
        re = re + q @ jnp.cos(theta)
        im = im + q @ jnp.sin(theta)
        return (re, im), None

    init = (jnp.zeros(spec.K, dtype=pos.dtype), jnp.zeros(spec.K, dtype=pos.dtype))
    (re, im), _ = jax.lax.scan(body, init, (pos_c, q_c))
    return re, im


def full_pair_energy(spec: SystemSpec, pos, active):
    """Total LJ + real-space Coulomb over unordered inter-molecular pairs,
    chunked over rows (reference: ComputePairwiseEnergy,
    src/energy_utils.f90:83-187)."""
    S = spec.S
    pos_c = pos.reshape(S // _CHUNK, _CHUNK, 3)

    idx = jnp.arange(spec.S).reshape(S // _CHUNK, _CHUNK)

    def body(carry, xs):
        e_lj, e_c = carry
        p_chunk, i_chunk = xs
        delta = pos[None, :, :] - p_chunk[:, None, :]   # (chunk, S, 3)
        r2 = jnp.maximum(min_image_dist2(delta, spec), _R2_FLOOR)
        cls_i = spec.site_cls[i_chunk]                  # (chunk,)
        mask = (active[i_chunk][:, None] & active[None, :]
                & (spec.site_mol[i_chunk][:, None] != spec.site_mol[None, :]))
        eps = jnp.take(jnp.take(spec.eps_cls, cls_i, axis=0),
                       spec.site_cls, axis=-1)          # (chunk, S)
        sig = jnp.take(jnp.take(spec.sig_cls, cls_i, axis=0),
                       spec.site_cls, axis=-1)
        sr2 = (sig * sig) / r2
        sr6 = sr2 * sr2 * sr2
        lj = 4.0 * eps * (sr6 * sr6 - sr6)
        lj_mask = mask & (r2 < spec.cutoff * spec.cutoff)
        e_lj = e_lj + jnp.sum(jnp.where(lj_mask, lj, 0.0))
        r = jnp.sqrt(r2)
        qq = spec.site_q[i_chunk][:, None] * spec.site_q[None, :]
        coul = qq * erfc(spec.alpha * r) / r
        e_c = e_c + jnp.sum(jnp.where(mask, coul, 0.0))
        return (e_lj, e_c), None

    zero = jnp.zeros((), dtype=pos.dtype)
    (e_lj, e_c), _ = jax.lax.scan(body, (zero, zero), (pos_c, idx))
    return 0.5 * e_lj, 0.5 * e_c * COULOMB_K


def full_intra_energy(spec: SystemSpec, state, pos):
    """Sum of intramolecular corrections over ACTIVE types only."""
    total = jnp.zeros((), dtype=pos.dtype)
    base = 0
    for r in range(spec.R):
        cap, A = spec.cap_list[r], spec.A_list[r]
        region = cap * A
        if not spec.active_list[r]:
            base += region
            continue
        p = pos[base:base + region].reshape(cap, A, 3)
        q = spec.site_q[base:base + region].reshape(cap, A)
        base += region
        mask = jnp.ones((cap, A), bool)
        e_mol = intra_energy(spec, p, q, mask)          # (cap,)
        mol_mask = jnp.arange(cap) < state.n_mol[r]
        total = total + jnp.sum(jnp.where(mol_mask, e_mol, 0.0))
    return total


def system_energy(spec: SystemSpec, state):
    """Full from-scratch energy + fresh structure factors
    (reference: ComputeSystemEnergy, src/energy_utils.f90:18-35).
    Returns (energy[6], amp_re, amp_im)."""
    pos = site_positions(spec, state)
    active = active_site_mask(spec, state.n_mol)
    e_lj, e_coul = full_pair_energy(spec, pos, active)
    amp_re, amp_im = full_amplitudes(spec, pos, active)
    e_recip = recip_energy(spec, amp_re, amp_im)
    e_self = jnp.sum(spec.type_self_energy
                     * state.n_mol[: spec.R].astype(pos.dtype))
    e_intra = full_intra_energy(spec, state, pos)
    e = jnp.zeros(6, dtype=pos.dtype)
    e = e.at[E_RECIP].set(e_recip)
    e = e.at[E_LJ].set(e_lj)
    e = e.at[E_COUL].set(e_coul)
    e = e.at[E_SELF].set(e_self)
    e = e.at[E_INTRA].set(e_intra)
    e = e.at[E_TOT].set(e_recip + e_lj + e_coul + e_self + e_intra)
    return e, amp_re, amp_im
