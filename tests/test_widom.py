"""Widom test-particle insertion diagnostic (mc/widom.py).

Pins:
  * ghost-insertion dU == full-system recompute difference after actually
    appending the molecule at the same placement (the bookkeeping==
    recompute invariant, applied to the Widom estimator), on a plain
    water box AND a framework-split system (covers the far-field path
    for arbitrary ghost positions),
  * widom_block shapes/finiteness incl. two active species,
  * the CLI wiring: --widom writes widom.dat and does NOT perturb the
    chain (energy.dat bit-identical with and without it).
"""

import jax
import jax.numpy as jnp
import numpy as np

from maniac_tpu import load_system
from maniac_tpu.mc.driver import initialize_state
from maniac_tpu.mc.moves import _uniform_rotation
from maniac_tpu.mc.widom import mu_excess_K, widom_block, widom_delta_u
from maniac_tpu.system import E_TOT
from maniac_tpu.systems import (make_lj_gas, make_water_box, make_zif_like)


def _load(outdir, **kw):
    return load_system(f"{outdir}/input.maniac", f"{outdir}/topology.data",
                       f"{outdir}/parameters.inc", **kw)


def _append_molecule(spec, state, t, P, com):
    """Return state with one molecule of type t appended at footprint P
    ((A, 3) absolute) / COM com, as a plain population+position edit."""
    A = int(spec.type_A[t])
    n = int(state.n_mol[t])
    ss = int(spec.type_site_base[t]) + n * A
    slot = int(spec.type_mol_base[t]) + n
    pos = state.pos.at[:, ss:ss + A].set(jnp.asarray(P[:A]).T)
    com_arr = state.com.at[:, slot].set(jnp.asarray(com))
    n_mol = state.n_mol.at[t].add(1)
    return state.replace(pos=pos, com=com_arr, n_mol=n_mol)


def _check_du_vs_recompute(spec, state, u, tol_K):
    """Assert ghost dU == recompute difference; the relative term covers
    placements that overlap a site (|dU| ~ 1e15 K leaves only ~15 f64
    digits of absolute agreement). Returns dU (K)."""
    t = int(spec.active_type_ids[0])
    du = float(widom_delta_u(spec, state, jnp.asarray(u, spec.dtype), t))
    # rebuild the identical placement and actually insert it
    Rm = _uniform_rotation(jnp.asarray(u[3:6], spec.dtype), spec.dtype)
    off = spec.type_template_off[t] @ Rm.T
    com = spec.bounds[:, 0] + spec.H @ jnp.asarray(u[0:3], spec.dtype)
    e1 = float(initialize_state(spec, state).energy[E_TOT])
    st2 = _append_molecule(spec, state, t, np.asarray(com + off), com)
    e2 = float(initialize_state(spec, st2).energy[E_TOT])
    assert abs((e2 - e1) - du) < tol_K + 1e-9 * abs(du), (du, e2 - e1)
    return du


def test_widom_du_matches_recompute_water(tmp_path):
    make_water_box(str(tmp_path), n_water=8, L=14.0)
    sysm = _load(str(tmp_path), dtype=jnp.float64, capacity=16)
    for u in ([0.31, 0.72, 0.11, 0.55, 0.23, 0.91],
              [0.93, 0.04, 0.66, 0.12, 0.79, 0.38]):
        _check_du_vs_recompute(sysm.spec, sysm.state, np.array(u), 1e-5)


def test_widom_du_matches_recompute_fwsplit(tmp_path):
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float64, capacity=16)
    assert sysm.spec.fw_split
    dus = [_check_du_vs_recompute(sysm.spec, sysm.state, np.array(u), 2e-5)
           for u in ([0.4888, 0.9765, 0.7757, 0.3089, 0.2698, 0.8631],
                     [0.42, 0.17, 0.83, 0.29, 0.61, 0.07],
                     [0.55, 0.31, 0.12, 0.33, 0.97, 0.26])]
    # the first placement sits in a pore (dU ~ 5e3 K), so the absolute
    # tolerance (the <=1e-6 kcal/mol split bar) actually bites; the other
    # two land near/on framework sites and exercise the relative term
    assert min(abs(d) for d in dus) < 1e5, dus


def test_widom_block_two_species(tmp_path):
    make_lj_gas(str(tmp_path), n=12, L=18.0, two_species=True)
    sysm = _load(str(tmp_path), dtype=jnp.float64, capacity=16)
    spec = sysm.spec
    assert spec.n_active == 2
    from maniac_tpu.mc.widom import widom_factor
    B = widom_factor(widom_block(spec, sysm.state, 16,
                                 jax.random.PRNGKey(5)))
    assert B.shape == (2,)
    assert np.all(np.isfinite(B)) and np.all(B > 0)
    mu = mu_excess_K(B, float(spec.temp_K))
    assert np.all(np.isfinite(mu))


def test_widom_cli_does_not_perturb_chain(tmp_path):
    from maniac_tpu.cli import main
    src = tmp_path / "sys"
    src.mkdir()
    make_water_box(str(src), n_water=8, L=14.0, nb_block=2, nb_step=8,
                   fugacity=800.0)
    argv = ["-i", f"{src}/input.maniac", "-d", f"{src}/topology.data",
            "-p", f"{src}/parameters.inc", "--seed", "11"]
    out_a = tmp_path / "a"
    out_b = tmp_path / "b"
    assert main(argv + ["-o", str(out_a)]) == 0
    assert main(argv + ["-o", str(out_b), "--widom", "4",
                        "--profile", "8"]) == 0
    # the diagnostic must not touch the trajectory
    ea = (out_a / "energy.dat").read_text()
    eb = (out_b / "energy.dat").read_text()
    assert ea == eb
    rows = [ln for ln in (out_b / "widom.dat").read_text().splitlines()
            if not ln.startswith("#")]
    assert len(rows) == 2
    vals = np.array([ln.split()[1:] for ln in rows], dtype=float)
    assert vals.shape == (2, 3)          # B_block, B_cum, mu_ex per species
    assert np.all(np.isfinite(vals))
    assert np.all(vals[:, 0] > 0)
    # cumulative factor after block 2 is the mean of the two block factors
    assert np.isclose(vals[1, 1], vals[:, 0].mean(), rtol=1e-6)
    # density profile: one row per block incl. block 0, 8 counts per row,
    # each row summing to that block's population series value
    prows = [ln.split() for ln in
             (out_b / "profile_wat.dat").read_text().splitlines()
             if not ln.startswith("#")]
    nrows = [ln.split() for ln in
             (out_b / "number_wat.dat").read_text().splitlines()
             if not ln.startswith("#")]
    assert len(prows) == 3 and all(len(r) == 9 for r in prows)
    for p, n in zip(prows, nrows):
        assert p[0] == n[0]
        assert sum(int(c) for c in p[1:]) == int(n[1])
