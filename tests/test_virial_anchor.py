"""External validation anchor: exact statistical mechanics of the dilute
LJ gas (VERDICT r2 "missing #1" / "next #2").

Every other correctness gate in this repo checks the engine against its
own oracle. This one checks GCMC *sampling* against numbers derived from
OUTSIDE the codebase: the virial expansion of the grand canonical
ensemble,

    rho(z) = z - 2 B2(T) z^2 + O(z^3)
    beta mu_ex(rho) = 2 B2(T) rho + O(rho^2)

with B2(T) = -2 pi Integral_0^inf (e^{-beta u(r)} - 1) r^2 dr evaluated
by quadrature for the engine's EXACT pair potential (LJ hard-truncated at
rcut, no shift, no tail corrections - the reference semantics,
/root/reference/src/energy_utils.f90:225-255). The quadrature itself is
pinned to the published LJ Boyle temperature T_B* = 3.4179 (Nicolas et
al. 1979 / standard tables), so the anchor chain is
literature -> quadrature -> GCMC occupancy, fully independent of the
repo's energy oracle.

At z* = 0.032, T* = 1.5 the B2 correction shifts <N> by ~6% of the ideal
value while the z^3 term is ~0.4%; 64 independent replicas give a clean
standard error from replica means. The test asserts BOTH that the
measured <N> matches the virial prediction and that it resolves the
correction (the ideal-gas null is rejected), so it cannot pass vacuously.

The same run anchors the Widom estimator: <e^{-beta dU}> must equal
e^{-2 B2 rho} to first order in density.
"""

import jax
import jax.numpy as jnp
import numpy as np
from scipy.integrate import quad

from maniac_tpu import load_system
from maniac_tpu.parallel.replicas import replicate, run_block_replicated
from maniac_tpu.system import convert_fugacity
from maniac_tpu.systems import make_lj_gas

# reduced-units setup: eps = 0.2 kcal/mol = 100.644 K, sigma = 3.4 A
EPS_KCAL = 0.2
SIG = 3.4
EPS_K = EPS_KCAL * 503.2189478
TSTAR = 1.5
TEMP_K = TSTAR * EPS_K
RCUT = 2.5 * SIG
L = 10.0 * SIG
ZSTAR = 0.032
Z_A3 = ZSTAR / SIG**3                      # activity in A^-3


def _b2_truncated(temp_K, rcut):
    """B2 (A^3) of the hard-truncated, unshifted LJ potential by
    quadrature (exact to quad tolerance; independent of the engine)."""
    beta = 1.0 / temp_K

    def integrand(r):
        sr6 = (SIG / r) ** 6
        u = 4.0 * EPS_K * (sr6 * sr6 - sr6)
        return (np.exp(-beta * u) - 1.0) * r * r

    # split at sigma: the integrand jumps from ~-r^2 to the well region
    val1, _ = quad(integrand, 1e-6, SIG, limit=200)
    val2, _ = quad(integrand, SIG, rcut, limit=200)
    return -2.0 * np.pi * (val1 + val2)


def _b2_full(temp_K):
    beta = 1.0 / temp_K

    def integrand(r):
        sr6 = (SIG / r) ** 6
        u = 4.0 * EPS_K * (sr6 * sr6 - sr6)
        return (np.exp(-beta * u) - 1.0) * r * r

    val1, _ = quad(integrand, 1e-6, SIG, limit=200)
    val2, _ = quad(integrand, SIG, 60.0 * SIG, limit=400)
    return -2.0 * np.pi * (val1 + val2)


def test_quadrature_pinned_to_boyle_temperature():
    """The B2 quadrature reproduces the published LJ Boyle temperature
    T_B* = 3.4179 (where B2 of the FULL potential vanishes)."""
    t_boyle = 3.4179 * EPS_K
    b2_star = _b2_full(t_boyle) / SIG**3
    assert abs(b2_star) < 5e-3
    # and is monotone around it (sanity that the root is the right one)
    assert _b2_full(0.95 * t_boyle) < 0 < _b2_full(1.3 * t_boyle)


def _equilibrated_states(tmp_path, n_blocks_eq=10):
    fug_atm = Z_A3 / convert_fugacity(1.0, TEMP_K)
    make_lj_gas(str(tmp_path), n=32, L=L, cutoff=RCUT, temp=TEMP_K,
                tol=1e-4, probs=(0.35, 0.0, 0.65, 0.0), fugacity=fug_atm,
                eps=EPS_KCAL, sig=SIG)
    sysm = load_system(f"{tmp_path}/input.maniac",
                       f"{tmp_path}/topology.data",
                       f"{tmp_path}/parameters.inc",
                       dtype=jnp.float64, capacity=96)
    spec = sysm.spec
    np.testing.assert_allclose(float(spec.type_activity[0]), Z_A3,
                               rtol=1e-12)
    states = replicate(spec, sysm.state, 64)
    for _ in range(n_blocks_eq):
        states = run_block_replicated(spec, states, 150, False)
    return spec, states


def test_gcmc_occupancy_matches_virial_expansion(tmp_path):
    spec, states = _equilibrated_states(tmp_path)
    b2 = _b2_truncated(TEMP_K, RCUT)
    V = float(spec.volume)
    n_ideal = Z_A3 * V
    n_th = n_ideal * (1.0 - 2.0 * b2 * Z_A3)

    n_samples = []
    for _ in range(30):
        states = run_block_replicated(spec, states, 150, False)
        n_samples.append(np.asarray(states.n_mol[:, 0], dtype=np.float64))
    per_rep = np.stack(n_samples).mean(axis=0)          # (64,) replica means
    n_meas = per_rep.mean()
    sem = per_rep.std(ddof=1) / np.sqrt(per_rep.size)

    # z^3 truncation allowance ~0.5% (b3* ~ 1.6 at T*=1.5 -> 0.4%)
    tol = 3.0 * sem + 0.006 * n_th
    assert abs(n_meas - n_th) < tol, \
        f"<N>={n_meas:.2f}+-{sem:.2f} vs virial {n_th:.2f} (ideal {n_ideal:.2f})"
    # the anchor must RESOLVE the B2 correction: ideal-gas null rejected
    assert abs(n_meas - n_ideal) > 4.0 * sem, \
        f"B2 shift unresolved: <N>={n_meas:.2f}+-{sem:.2f}, ideal {n_ideal:.2f}"


def test_widom_matches_virial_expansion(tmp_path):
    from maniac_tpu.mc.widom import widom_block
    spec, states = _equilibrated_states(tmp_path)
    b2 = _b2_truncated(TEMP_K, RCUT)
    V = float(spec.volume)

    key = jax.random.PRNGKey(17)
    bs, ns = [], []
    wb = jax.jit(jax.vmap(lambda st, k: widom_block(spec, st, 64, k)),
                 static_argnums=())
    for _ in range(12):
        states = run_block_replicated(spec, states, 150, False)
        key, sub = jax.random.split(key)
        keys = jax.random.split(sub, 64)
        # widom_block returns ln B; convert in f64
        bs.append(np.exp(np.asarray(wb(states, keys),
                                    dtype=np.float64))[:, 0])
        ns.append(np.asarray(states.n_mol[:, 0], dtype=np.float64))
    per_rep_b = np.stack(bs).mean(axis=0)               # (64,)
    b_meas = per_rep_b.mean()
    sem_b = per_rep_b.std(ddof=1) / np.sqrt(per_rep_b.size)
    rho = np.stack(ns).mean() / V
    b_th = np.exp(-2.0 * b2 * rho)                      # beta mu_ex = 2 B2 rho

    assert abs(b_meas - b_th) < 3.0 * sem_b + 0.01 * b_th, \
        f"Widom B={b_meas:.4f}+-{sem_b:.4f} vs virial {b_th:.4f}"
    # resolves mu_ex != 0 (B != 1)
    assert abs(b_meas - 1.0) > 3.0 * sem_b
