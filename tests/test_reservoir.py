"""Reservoir semantics: geometry sampling on insertion, push-back on
deletion, particle conservation, energy bookkeeping with -r active."""

import jax
import numpy as np

from maniac_tpu import load_system
from maniac_tpu.cli import main as cli_main
from maniac_tpu.mc.moves import mc_step
from maniac_tpu.physics.energy import system_energy
from maniac_tpu.system import E_TOT

from fixtures import make_water_box, make_water_reservoir


def _load(d, res_path):
    return load_system(f"{d}/input.maniac", f"{d}/topology.data",
                       f"{d}/parameters.inc", reservoir_file=res_path)


def test_reservoir_conservation_and_consistency(tmp_path):
    d = make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0,
                       tol=1e-4, probs=(0.2, 0.2, 0.6, 0.0), fugacity=2000.0)
    res_path = make_water_reservoir(str(tmp_path), n_water=12)
    sysm = _load(d, res_path)
    spec, state = sysm.spec, sysm.state
    assert spec.has_reservoir
    n_total0 = int(state.n_mol[0]) + int(state.res_n[0])
    assert int(state.res_n[0]) == 12

    step = jax.jit(lambda st, k: mc_step(spec, st, k))
    keys = jax.random.split(jax.random.PRNGKey(5), 120)
    for i in range(120):
        state = step(state, keys[i])
        if i % 20 == 19:
            # box + reservoir particle count is conserved (insert pops,
            # delete pushes; reference: create/delete_molecule.f90)
            n_total = int(state.n_mol[0]) + int(state.res_n[0])
            assert n_total == n_total0
            e, _, _ = system_energy(spec, state)
            assert abs(float(state.energy[E_TOT] - e[E_TOT])) < 1e-7
    c = np.asarray(state.counters)
    assert c[1, 0] > 0 or c[1, 1] > 0  # at least one accepted insert/delete


def test_reservoir_geometry_is_copied(tmp_path):
    """Inserted molecules must use reservoir geometry verbatim (no extra
    rotation), so intramolecular distances match the reservoir template."""
    d = make_water_box(str(tmp_path), n_water=2, L=14.0, cutoff=5.0,
                       tol=1e-4, probs=(0.0, 0.0, 1.0, 0.0), fugacity=50000.0)
    res_path = make_water_reservoir(str(tmp_path), n_water=8)
    sysm = _load(d, res_path)
    spec, state = sysm.spec, sysm.state
    step = jax.jit(lambda st, k: mc_step(spec, st, k))
    keys = jax.random.split(jax.random.PRNGKey(7), 60)
    for i in range(60):
        state = step(state, keys[i])
    n = int(state.n_mol[0])
    off = np.asarray(state.pos).T[: n * 4].reshape(n, 4, 3)
    # all waters are rigid with identical internal distances
    d_ref = None
    for m in range(n):
        dm = np.linalg.norm(off[m][:, None] - off[m][None, :], axis=-1)
        if d_ref is None:
            d_ref = dm
        np.testing.assert_allclose(dm, d_ref, atol=1e-5)


def test_cli_with_reservoir(tmp_path):
    d = make_water_box(str(tmp_path / "sys"), n_water=8, L=14.0, cutoff=5.0,
                       tol=1e-4, probs=(0.3, 0.3, 0.4, 0.0), fugacity=1000.0,
                       nb_block=2, nb_step=40)
    res_path = make_water_reservoir(str(tmp_path / "sys"), n_water=10)
    out = str(tmp_path / "outputs")
    rc = cli_main(["-i", f"{d}/input.maniac", "-d", f"{d}/topology.data",
                   "-p", f"{d}/parameters.inc", "-r", res_path, "-o", out,
                   "--platform", "cpu", "--dtype", "f64"])
    assert rc == 0
    import os
    assert os.path.exists(f"{out}/reservoir.lammpstrj")
    assert "Simulation Completed" in open(f"{out}/log.maniac").read()
