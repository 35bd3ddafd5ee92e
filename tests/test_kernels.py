"""Pallas kernel parity vs the XLA reference path.

On CPU the kernels run in interpreter mode; trajectories must be identical
(same accept decisions, bit-identical positions) with energies agreeing to
f32 working precision. The TPU bench exercises the compiled kernels; these
tests pin the semantics.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maniac_tpu import load_system
from maniac_tpu.mc.moves import mc_step

from fixtures import make_lj_gas, make_water_box


def _load(outdir, **kw):
    return load_system(f"{outdir}/input.maniac", f"{outdir}/topology.data",
                       f"{outdir}/parameters.inc", **kw)


def _run_both(sysm, n_steps, seed, monkeypatch):
    spec, state0 = sysm.spec, sysm.state
    keys = jax.random.split(jax.random.PRNGKey(seed), n_steps)
    out = []
    for flag in ("0", "1"):
        monkeypatch.setenv("MANIAC_PALLAS", flag)
        step = jax.jit(lambda st, k: mc_step(spec, st, k))
        st = state0
        for k in keys:
            st = step(st, k)
        out.append(st)
    return out


def test_pair_kernel_parity_water_gcmc(tmp_path, monkeypatch):
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    st_x, st_p = _run_both(sysm, 30, 5, monkeypatch)
    assert int(st_x.n_mol[0]) == int(st_p.n_mol[0])
    np.testing.assert_array_equal(np.asarray(st_x.pos), np.asarray(st_p.pos))
    np.testing.assert_allclose(np.asarray(st_x.energy),
                               np.asarray(st_p.energy), atol=0.05)


def test_pair_kernel_parity_two_species_swap(tmp_path, monkeypatch):
    make_lj_gas(str(tmp_path), n=24, L=16.0, two_species=True,
                probs=(0.2, 0.0, 0.2, 0.6), cutoff=6.0, tol=1e-4,
                fug_a=3.0, fug_b=3.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    st_x, st_p = _run_both(sysm, 40, 11, monkeypatch)
    np.testing.assert_array_equal(np.asarray(st_x.n_mol),
                                  np.asarray(st_p.n_mol))
    np.testing.assert_array_equal(np.asarray(st_x.pos), np.asarray(st_p.pos))
    np.testing.assert_allclose(np.asarray(st_x.energy),
                               np.asarray(st_p.energy), atol=0.05)


def test_pair_kernel_parity_with_reservoir(tmp_path, monkeypatch):
    """Kernel path + reservoir bookkeeping (the reservoir pop/push runs in
    XLA around the fused kernel; insertions use reservoir geometry)."""
    from maniac_tpu.systems import make_water_reservoir

    make_water_box(str(tmp_path), n_water=4, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.2, 0.2, 0.6, 0.0), fugacity=20000.0)
    res = make_water_reservoir(str(tmp_path), n_water=10)
    sysm = load_system(f"{tmp_path}/input.maniac",
                       f"{tmp_path}/topology.data",
                       f"{tmp_path}/parameters.inc", reservoir_file=res,
                       dtype=jnp.float32)
    st_x, st_p = _run_both(sysm, 40, 9, monkeypatch)
    np.testing.assert_array_equal(np.asarray(st_x.n_mol),
                                  np.asarray(st_p.n_mol))
    np.testing.assert_array_equal(np.asarray(st_x.res_n),
                                  np.asarray(st_p.res_n))
    np.testing.assert_array_equal(np.asarray(st_x.pos), np.asarray(st_p.pos))
    np.testing.assert_array_equal(np.asarray(st_x.res_offset),
                                  np.asarray(st_p.res_offset))
    np.testing.assert_allclose(np.asarray(st_x.energy),
                               np.asarray(st_p.energy), atol=0.05)


def test_resync_kernel_parity(tmp_path, monkeypatch):
    """The Pallas amplitude-resynthesis kernel must match the XLA
    full_amplitudes path on the same state."""
    from maniac_tpu.mc.driver import resync_amplitudes_body, run_block

    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    spec = sysm.spec
    monkeypatch.setenv("MANIAC_PALLAS", "0")
    st = run_block.__wrapped__(spec, sysm.state, 30, False)
    r_x = resync_amplitudes_body(spec, st)
    monkeypatch.setenv("MANIAC_PALLAS", "1")
    r_p = resync_amplitudes_body(spec, st)
    np.testing.assert_allclose(np.asarray(r_x.amp_re),
                               np.asarray(r_p.amp_re), atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_x.amp_im),
                               np.asarray(r_p.amp_im), atol=2e-4)
    np.testing.assert_allclose(np.asarray(r_x.energy),
                               np.asarray(r_p.energy), atol=0.05)


def test_kernel_erfc_accuracy():
    """The kernel's f32 erfc must sit inside XLA's own f32 erfc error
    envelope (abs ~1e-7, rel ~5e-6 for x < 6)."""
    from scipy.special import erfc as erfc64
    from maniac_tpu.kernels.common import _erfc
    x = np.linspace(0.0, 8.0, 20001)
    ours = np.asarray(_erfc(jnp.asarray(x, dtype=jnp.float32)),
                      dtype=np.float64)
    ref = erfc64(x)
    abs_err = np.abs(ours - ref)
    assert abs_err.max() < 5e-7, abs_err.max()
    rel = abs_err[x < 6] / np.maximum(ref[x < 6], 1e-300)
    assert rel.max() < 1e-5, rel.max()


def test_pair_kernel_parity_mixed_sizes(tmp_path, monkeypatch):
    """Kernel path with unequal footprint sizes (A_old != A_new swaps)."""
    from maniac_tpu.systems import make_mixed_sizes

    make_mixed_sizes(str(tmp_path), n_water=6, n_dimer=6, L=16.0,
                     cutoff=6.0, tol=1e-4, probs=(0.2, 0.1, 0.3, 0.4),
                     fug_w=500.0, fug_d=500.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    st_x, st_p = _run_both(sysm, 60, 17, monkeypatch)
    np.testing.assert_array_equal(np.asarray(st_x.n_mol),
                                  np.asarray(st_p.n_mol))
    np.testing.assert_array_equal(np.asarray(st_x.pos), np.asarray(st_p.pos))
    np.testing.assert_allclose(np.asarray(st_x.energy),
                               np.asarray(st_p.energy), atol=0.05)


def test_grouped_kernel_parity(tmp_path, monkeypatch):
    """The grouped row-compacted kernel (kernels/stepg.py, G replicas per
    program, LJ rows and charged rows in separate compacted passes) must
    reproduce the per-replica XLA path exactly: same PRNG streams -> same
    decisions, bit-identical positions."""
    from maniac_tpu.parallel.replicas import (replicate,
                                              run_block_replicated)

    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    spec = sysm.spec
    states0 = replicate(spec, sysm.state, 8)

    monkeypatch.setenv("MANIAC_PALLAS", "0")
    monkeypatch.setenv("MANIAC_GROUP", "0")
    sx = run_block_replicated.__wrapped__(spec, states0, 30, False)
    monkeypatch.setenv("MANIAC_PALLAS", "1")
    monkeypatch.setenv("MANIAC_GROUP", "4")
    sg = run_block_replicated.__wrapped__(spec, states0, 30, False)
    np.testing.assert_array_equal(np.asarray(sx.n_mol), np.asarray(sg.n_mol))
    np.testing.assert_array_equal(np.asarray(sx.counters),
                                  np.asarray(sg.counters))
    np.testing.assert_array_equal(np.asarray(sx.pos), np.asarray(sg.pos))
    np.testing.assert_allclose(np.asarray(sx.energy), np.asarray(sg.energy),
                               atol=0.05)


def test_grouped_kernel_parity_mixed_sizes(tmp_path, monkeypatch):
    """Grouped kernel with unequal footprints + swaps (per-type LJ/charged
    row sets differ between species)."""
    from maniac_tpu.systems import make_mixed_sizes
    from maniac_tpu.parallel.replicas import (replicate,
                                              run_block_replicated)

    make_mixed_sizes(str(tmp_path), n_water=6, n_dimer=6, L=16.0,
                     cutoff=6.0, tol=1e-4, probs=(0.2, 0.1, 0.3, 0.4),
                     fug_w=500.0, fug_d=500.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32)
    spec = sysm.spec
    states0 = replicate(spec, sysm.state, 4)
    monkeypatch.setenv("MANIAC_PALLAS", "0")
    monkeypatch.setenv("MANIAC_GROUP", "0")
    sx = run_block_replicated.__wrapped__(spec, states0, 40, False)
    monkeypatch.setenv("MANIAC_PALLAS", "1")
    monkeypatch.setenv("MANIAC_GROUP", "2")
    sg = run_block_replicated.__wrapped__(spec, states0, 40, False)
    np.testing.assert_array_equal(np.asarray(sx.n_mol), np.asarray(sg.n_mol))
    np.testing.assert_array_equal(np.asarray(sx.pos), np.asarray(sg.pos))
    np.testing.assert_allclose(np.asarray(sx.energy), np.asarray(sg.energy),
                               atol=0.05)


def test_group_size_gating(tmp_path, monkeypatch):
    """group_size fallbacks: explicit 0/1 disables; CPU (no Pallas regime)
    disables; molecules with >4 LJ-active atoms must both fall back to the
    ungrouped kernel AND still build a spec (the 8-row LJ slab layout
    cannot hold them - system.py gates slab construction instead of
    asserting)."""
    import dataclasses
    from maniac_tpu.kernels import group_size

    make_water_box(str(tmp_path), n_water=4, L=14.0, cutoff=5.0, tol=1e-4)
    spec = _load(str(tmp_path), dtype=jnp.float32).spec

    monkeypatch.setenv("MANIAC_PALLAS", "1")  # pretend-TPU regime
    monkeypatch.setenv("MANIAC_GROUP", "16")
    assert group_size(spec) == 16
    monkeypatch.setenv("MANIAC_GROUP", "0")
    assert group_size(spec) == 1
    monkeypatch.setenv("MANIAC_GROUP", "1")
    assert group_size(spec) == 1

    monkeypatch.setenv("MANIAC_GROUP", "16")
    monkeypatch.setenv("MANIAC_PALLAS", "0")  # XLA-only regime
    assert group_size(spec) == 1

    monkeypatch.setenv("MANIAC_PALLAS", "1")
    big = dataclasses.replace(spec, Lmax=5)   # >4 LJ rows per side
    assert group_size(big) == 1


def test_spec_builds_with_many_lj_sites(tmp_path):
    """A molecule with >4 LJ-active atoms (grouped kernel's slab limit)
    must still load and run the full move set through the ungrouped
    fallback with exact f64 bookkeeping==recompute."""
    from maniac_tpu.systems import make_lj_chain
    from maniac_tpu.mc.driver import (drift_report, initialize_state,
                                      run_block)

    make_lj_chain(str(tmp_path), n_atoms=6, n_mol=4, L=18.0, cutoff=6.0,
                  fugacity=50.0, probs=(0.3, 0.2, 0.5, 0.0))
    sysm = _load(str(tmp_path), dtype=jnp.float64)
    assert sysm.spec.Lmax == 6
    from maniac_tpu.kernels import group_size
    assert group_size(sysm.spec) == 1

    state = initialize_state(sysm.spec, sysm.state)
    state = run_block(sysm.spec, state, 120, True)
    assert drift_report(sysm.spec, state)["drift_K"] < 1e-6
