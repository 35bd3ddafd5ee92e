#!/usr/bin/env python
"""Independent brute-force total-energy oracle.

The reference CI gates TotEng against LAMMPS (tests/integration/energy/
H2O-gas/run-test.sh:16, tolerance 0.01 kcal/mol). Neither gfortran nor the
mc-topology submodule exist in this environment, so this module is the
rebuild's external anchor: a from-first-principles periodic electrostatics +
LJ sum in pure numpy float64 that shares NO code with the engine - its own
Ewald split (explicit real-space image sums + a large dense k-grid), its own
Coulomb constant derived from scipy.constants (not maniac_tpu.constants).

Energy convention matched to MANIAC (src/energy_utils.f90:18-35):
    total = LJ(hard cutoff, minimum image, no tail correction)
          + [ exact periodic Coulomb (tinfoil boundary)
              - direct intramolecular Coulomb (minimum image) ]
(the engine's erfc/recip/self/intra decomposition telescopes to exactly
this in the converged limit; see tests/test_oracle.py).

Usage: oracle_total(pos, q, mol_id, L, lj_eps, lj_sig, cutoff) -> Kelvin.
"""

from __future__ import annotations

import numpy as np
from scipy.special import erfc

import scipy.constants as sc

# e^2 / (4 pi eps0) / kB in Kelvin * Angstrom (independent derivation)
COULOMB_K_ORACLE = (sc.elementary_charge ** 2
                    / (4.0 * np.pi * sc.epsilon_0)
                    / sc.Boltzmann / sc.angstrom)


def _as_cell(L):
    """Accept a box length (cubic) or a full (3,3) cell matrix (columns =
    lattice vectors a, b, c)."""
    L = np.asarray(L, dtype=float)
    return np.diag([float(L)] * 3) if L.ndim == 0 else L


def periodic_coulomb(pos: np.ndarray, q: np.ndarray, L,
                     alpha: float = 0.45, n_images: int = 3,
                     kmax: int = 24,
                     coulomb_k: float = COULOMB_K_ORACLE) -> float:
    """Exact periodic Coulomb energy (Kelvin) of point charges under
    tinfoil (conducting) boundary conditions - classic Ewald evaluated to
    convergence with explicit image sums. L: cubic box side or a full
    (3,3) triclinic cell matrix. O(N^2 * images); for oracle use only."""
    H = _as_cell(L)
    N = len(q)
    rij = pos[:, None, :] - pos[None, :, :]                 # (N,N,3)

    # real-space: sum over image shifts n in [-n_images, n_images]^3
    e_real = 0.0
    rng = np.arange(-n_images, n_images + 1)
    for nx in rng:
        for ny in rng:
            for nz in rng:
                shift = H @ np.array([nx, ny, nz], dtype=float)
                d = np.linalg.norm(rij + shift, axis=-1)    # (N,N)
                if nx == ny == nz == 0:
                    np.fill_diagonal(d, np.inf)
                e_real += 0.5 * np.sum(np.where(
                    d < np.inf, q[:, None] * q[None, :] * erfc(alpha * d)
                    / np.where(d > 0, d, 1.0), 0.0))

    # reciprocal space: full dense grid, exclude k = 0
    m = np.arange(-kmax, kmax + 1)
    mx, my, mz = np.meshgrid(m, m, m, indexing="ij")
    ms = np.stack([mx.ravel(), my.ravel(), mz.ravel()], axis=1)
    kvecs = 2.0 * np.pi * (ms @ np.linalg.inv(H))
    ksq = np.sum(kvecs * kvecs, axis=1)
    sel = ksq > 1e-12
    kvecs, ksq = kvecs[sel], ksq[sel]
    theta = pos @ kvecs.T                                   # (N, K)
    s_re = q @ np.cos(theta)
    s_im = q @ np.sin(theta)
    V = abs(np.linalg.det(H))
    e_recip = (2.0 * np.pi / V) * np.sum(
        np.exp(-ksq / (4.0 * alpha ** 2)) / ksq * (s_re ** 2 + s_im ** 2))

    e_self = -alpha / np.sqrt(np.pi) * np.sum(q * q)
    return (e_real + e_recip + e_self) * coulomb_k


def intramolecular_coulomb(pos: np.ndarray, q: np.ndarray,
                           mol_id: np.ndarray, L: float,
                           coulomb_k: float = COULOMB_K_ORACLE) -> float:
    """Direct (unscreened) Coulomb between sites of the same molecule,
    minimum image (reference subtracts exactly this via its
    (erfc(ar)-1)/r correction, src/ewald_energy.f90:371-411)."""
    e = 0.0
    for m in np.unique(mol_id):
        idx = np.where(mol_id == m)[0]
        for a in range(len(idx)):
            for b in range(a + 1, len(idx)):
                d = pos[idx[a]] - pos[idx[b]]
                H = _as_cell(L)
                frac = np.linalg.inv(H) @ d
                d = d - H @ np.round(frac)
                r = np.linalg.norm(d)
                if r > 1e-10:
                    e += q[idx[a]] * q[idx[b]] / r
    return e * coulomb_k


def lj_energy(pos: np.ndarray, mol_id: np.ndarray, eps: np.ndarray,
              sig: np.ndarray, L: float, cutoff: float) -> float:
    """Intermolecular 12-6 LJ, hard cutoff, minimum image, no tail
    correction (Kelvin; eps already in Kelvin). eps/sig: per-site-pair
    (N, N) tables."""
    rij = pos[:, None, :] - pos[None, :, :]
    rij -= L * np.round(rij / L)
    r2 = np.sum(rij * rij, axis=-1)
    mask = (mol_id[:, None] != mol_id[None, :]) & (r2 < cutoff ** 2)
    r2 = np.where(mask, r2, np.inf)
    sr2 = (sig ** 2) / r2
    sr6 = sr2 ** 3
    return 0.5 * float(np.sum(4.0 * eps * (sr6 ** 2 - sr6)))


def oracle_total(pos, q, mol_id, L, eps_pair, sig_pair, cutoff,
                 alpha=0.45, n_images=3, kmax=24,
                 coulomb_k=COULOMB_K_ORACLE) -> float:
    """Total energy (Kelvin) under MANIAC's convention (module docstring).

    coulomb_k: the e^2/(4 pi eps0 kB) conversion to use. The reference
    hardcodes a rounded 14.40198 eV*A (src/constants.f90:12), 1.56e-4 above
    the CODATA value; pass the engine's constant to validate the Ewald/LJ
    MATH at full precision independently of that unit-convention quirk."""
    e_c = periodic_coulomb(pos, q, L, alpha, n_images, kmax, coulomb_k)
    e_i = intramolecular_coulomb(pos, q, mol_id, L, coulomb_k)
    e_lj = lj_energy(pos, mol_id, eps_pair, sig_pair, L, cutoff)
    return e_c - e_i + e_lj
