"""Grouped whole-block kernel (kernels/blockg.py): parity + invariants.

blockg runs the WHOLE block (G replicas x n_steps) in one Pallas program
with an in-kernel, lane-vectorized proposal. Unlike the per-step kernels
(which share the XLA proposal glue and are bit-exact), blockg re-derives
the proposal geometry in-kernel, so positions agree with the scan path to
f32 ulp (~1e-6) rather than bitwise; decisions (populations, counters)
must match exactly on these fixtures, and the running energies must stay
consistent with a from-scratch recompute.
"""

import jax
import jax.numpy as jnp
import numpy as np

from maniac_tpu import load_system
from maniac_tpu.mc.driver import block_body, resync_amplitudes_replicated
from maniac_tpu.parallel.replicas import replicate, run_block_replicated
from maniac_tpu.physics.energy import system_energy
from maniac_tpu.system import E_TOT
from maniac_tpu.systems import make_water_box, make_zif_like


def _load(outdir, **kw):
    return load_system(f"{outdir}/input.maniac", f"{outdir}/topology.data",
                       f"{outdir}/parameters.inc", **kw)


def _run_blockg(spec, states, n_steps, monkeypatch, G):
    """Kernel path only (A/B-switch parity tests that compare blockg
    against itself skip the redundant XLA run: suite-cost, VERDICT r4
    #8)."""
    monkeypatch.setenv("MANIAC_GROUP", str(G))
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    return run_block_replicated(spec, states, n_steps, False)


def _run_pair(spec, states, n_steps, monkeypatch, G):
    st_b = _run_blockg(spec, states, n_steps, monkeypatch, G)
    monkeypatch.setenv("MANIAC_PALLAS", "0")
    st_x = jax.jit(lambda s: jax.vmap(
        lambda ss: block_body(spec, ss, n_steps, False))(s))(states)
    return st_b, st_x


def test_blockg_parity_framework(tmp_path, monkeypatch):
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert spec.fw_split and spec.n_active == 1
    states = replicate(spec, sysm.state, 2)
    st_b, st_x = _run_pair(spec, states, 40, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
    assert np.abs(np.asarray(st_b.energy)
                  - np.asarray(st_x.energy)).max() < 5.0


def test_blockg_parity_pure_water(tmp_path, monkeypatch):
    """fw_split off (R == 1): cols0 = 0 path."""
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert not spec.fw_split and spec.R == 1
    states = replicate(spec, sysm.state, 2)
    st_b, st_x = _run_pair(spec, states, 50, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4


def test_blockg_bookkeeping_vs_recompute(tmp_path, monkeypatch):
    """Running energies from the in-kernel bookkeeping must match a
    from-scratch recompute to f32 working precision, and the per-block
    amplitude resync must keep matching the positions."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    for _ in range(3):
        states = run_block_replicated(spec, states, 50, False)
        states = resync_amplitudes_replicated(spec, states)
    monkeypatch.setenv("MANIAC_PALLAS", "0")
    for b in range(2):
        st1 = jax.tree_util.tree_map(lambda x: x[b], states)
        e, _, _ = system_energy(spec, st1)
        drift = abs(float(st1.energy[E_TOT]) - float(e[E_TOT]))
        assert drift < 2.0, f"replica {b}: running vs recompute {drift} K"


def test_blockg_parity_triclinic(tmp_path, monkeypatch):
    """Triclinic box in blockg: in-kernel 27-image minimum-image search
    (matching physics/pbc.py / reference src/geometry_utils.f90:359-415)
    and the fractional-coordinate COM wrap. Decisions must match the
    XLA 27-image scan path exactly; positions to f32 ulp; running
    energies must stay consistent with a from-scratch recompute."""
    from maniac_tpu.systems import make_triclinic_water
    make_triclinic_water(str(tmp_path), n_water=8, L=14.0,
                         tilt=(2.0, 1.2, 0.8), cutoff=5.0, tol=1e-4,
                         probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert spec.is_triclinic and not spec.fw_split
    states = replicate(spec, sysm.state, 2)
    st_b, st_x = _run_pair(spec, states, 50, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
    # create/delete trials actually happened (indel prob 0.5)
    assert np.asarray(st_b.counters)[:, 0, 0].sum() > 0
    for b in range(2):
        st1 = jax.tree_util.tree_map(lambda x: x[b], st_b)
        e, _, _ = system_energy(spec, st1)
        drift = abs(float(st1.energy[E_TOT]) - float(e[E_TOT]))
        assert drift < 2.0, f"replica {b}: running vs recompute {drift} K"


def test_blockg_capacity_overflow(tmp_path, monkeypatch):
    """Insertions beyond capacity are rejected and counted in extras[0]
    (the reference would overflow its fixed arrays here)."""
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.1, 0.0, 0.9, 0.0), fugacity=5e5)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=10)
    spec = sysm.spec
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    for _ in range(3):
        states = run_block_replicated(spec, states, 100, False)
        states = resync_amplitudes_replicated(spec, states)
    n = np.asarray(states.n_mol)[:, 0]
    assert np.all(n <= 10)
    assert np.asarray(states.extras)[:, 0].sum() > 0


def test_blockg_parity_two_active_species(tmp_path, monkeypatch):
    """Multi-active-species blockg: framework + water + dimer with live
    SWAP moves. Decisions (populations, counters) must match the scan
    path exactly; positions to f32 ulp."""
    from maniac_tpu.systems import make_framework_mixed
    make_framework_mixed(str(tmp_path))
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=12)
    spec = sysm.spec
    assert spec.fw_split and spec.n_active == 2
    states = replicate(spec, sysm.state, 2)
    st_b, st_x = _run_pair(spec, states, 40, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    # swap trials actually happened (probs reserve 0.2 for swap)
    assert np.asarray(st_b.counters)[:, 0, 4].sum() > 0
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
    assert np.abs(np.asarray(st_b.energy)
                  - np.asarray(st_x.energy)).max() < 5.0


def test_blockg_parity_fwfuse(tmp_path, monkeypatch):
    """MANIAC_FWFUSE=force: the fused (Qmax*2G, W) fw Coulomb pass must
    reproduce the per-atom loop's DECISIONS exactly (populations,
    counters) and positions/amplitudes to f32 ulp - the atom fold
    reassociates the f32 sum, so energies may differ by ~1 ulp (see
    _fwfuse_env), but on the parity fixtures every accept decision must
    match both the per-atom kernel and the XLA scan path."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert spec.fw_split
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_FWFUSE", "force")
    st_f, st_x = _run_pair(spec, states, 40, monkeypatch, 2)
    monkeypatch.delenv("MANIAC_FWFUSE")
    st_b = _run_blockg(spec, states, 40, monkeypatch, 2)
    for other in (st_b, st_x):
        np.testing.assert_array_equal(np.asarray(st_f.n_mol),
                                      np.asarray(other.n_mol))
        np.testing.assert_array_equal(np.asarray(st_f.counters),
                                      np.asarray(other.counters))
    assert np.abs(np.asarray(st_f.pos) - np.asarray(st_b.pos)).max() < 1e-4


def test_blockg_parity_gsel_bcast(tmp_path, monkeypatch):
    """MANIAC_GSEL=bcast: the per-species broadcast-blend guest LJ table
    read (diagonal pid blocks + one-hot side masks) must be bit-identical
    to the default per-chunk pair-id dot1h path on a two-active-species
    system with swaps."""
    from maniac_tpu.systems import make_framework_mixed
    make_framework_mixed(str(tmp_path))
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=12)
    spec = sysm.spec
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_GSEL", "bcast")
    st_s = _run_blockg(spec, states, 40, monkeypatch, 2)
    monkeypatch.delenv("MANIAC_GSEL")
    st_b = _run_blockg(spec, states, 40, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_s.n_mol),
                                  np.asarray(st_b.n_mol))
    np.testing.assert_array_equal(np.asarray(st_s.counters),
                                  np.asarray(st_b.counters))
    np.testing.assert_array_equal(np.asarray(st_s.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_s.energy),
                                  np.asarray(st_b.energy))


def test_blockg_parity_reservoir(tmp_path, monkeypatch):
    """Reservoir blockg: insertion geometry sampled from the reservoir
    in-kernel, pop-on-insert / push-on-delete bookkeeping, and box +
    reservoir particle conservation."""
    from maniac_tpu.systems import make_water_box, make_water_reservoir
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    res_path = make_water_reservoir(str(tmp_path), n_water=12)
    sysm = load_system(f"{tmp_path}/input.maniac", f"{tmp_path}/topology.data",
                       f"{tmp_path}/parameters.inc",
                       reservoir_file=res_path,
                       dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert spec.has_reservoir
    states = replicate(spec, sysm.state, 2)
    n_tot0 = (np.asarray(states.n_mol)[:, 0]
              + np.asarray(states.res_n)[:, 0])
    st_b, st_x = _run_pair(spec, states, 50, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.res_n),
                                  np.asarray(st_x.res_n))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
    assert np.abs(np.asarray(st_b.res_offset)
                  - np.asarray(st_x.res_offset)).max() < 1e-5
    assert np.abs(np.asarray(st_b.res_com)
                  - np.asarray(st_x.res_com)).max() < 1e-5
    # box + reservoir particle count conserved (insert pops, delete pushes)
    n_tot = (np.asarray(st_b.n_mol)[:, 0] + np.asarray(st_b.res_n)[:, 0])
    np.testing.assert_array_equal(n_tot, n_tot0)
    # insertions/deletions actually landed
    assert np.asarray(st_b.counters)[:, 1, 0].sum() > 0


def test_blockg_gcmc_physics(tmp_path, monkeypatch):
    """GCMC still works end-to-end: occupancy responds to fugacity and
    stays within capacity; recalibration path runs."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=2,
                  fugacity=300.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=24)
    spec = sysm.spec
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    for _ in range(3):
        states = run_block_replicated(spec, states, 80, True)
        states = resync_amplitudes_replicated(spec, states)
    n = np.asarray(states.n_mol)[:, 1]
    assert np.all(n >= 0) and np.all(n <= 24)
    c = np.asarray(states.counters)
    # all move classes were exercised and some insertions/deletions landed
    assert c[:, 0, :4].sum(axis=0).min() > 0        # trials of T/R/C/D
    assert c[:, 1, 0].sum() > 0 and c[:, 1, 1].sum() > 0


def test_blockg_parity_chunk_boundary(tmp_path, monkeypatch):
    """Live-prefix chunk bound: populations straddle a 128-site-column
    boundary (A=4, N around 31-33 -> 124-132 live sites), with ongoing
    creates/deletes crossing it. The footprint-read / commit / resync
    chunk loops must stay exact at the crossing (an off-by-one in the
    ceil((n*A + A)/128) bound would silently corrupt positions)."""
    make_water_box(str(tmp_path), n_water=31, L=22.0, cutoff=7.0, tol=1e-4,
                   probs=(0.2, 0.1, 0.7, 0.0), fugacity=30000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=40)
    spec = sysm.spec
    assert spec.cap_list[-1] * 4 > 128  # region really spans >1 chunk
    states = replicate(spec, sysm.state, 2)
    st_b, st_x = _run_pair(spec, states, 80, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
    # both creations and deletions were accepted during the run
    cnt = np.asarray(st_b.counters).sum(0)  # (2, 5): [trials, accepts]
    assert cnt[1, 2] > 0 and cnt[1, 3] > 0


def test_blockg_parity_kdiag(tmp_path, monkeypatch):
    """MANIAC_KDIAG=force: the merged block-diagonal structure-factor
    delta contraction (one masked (GJz, 2GFK) dot) must reproduce the
    per-g small-matmul path exactly — the mask zeros are exact, so every
    output sums the same nonzero products (docs/performance.md 'Measured
    non-levers (round 5)')."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    states = replicate(spec, sysm.state, 2)
    monkeypatch.setenv("MANIAC_KDIAG", "force")
    st_d = _run_blockg(spec, states, 40, monkeypatch, 2)
    monkeypatch.delenv("MANIAC_KDIAG")
    st_b = _run_blockg(spec, states, 40, monkeypatch, 2)
    np.testing.assert_array_equal(np.asarray(st_d.n_mol),
                                  np.asarray(st_b.n_mol))
    np.testing.assert_array_equal(np.asarray(st_d.counters),
                                  np.asarray(st_b.counters))
    np.testing.assert_array_equal(np.asarray(st_d.pos), np.asarray(st_b.pos))
    np.testing.assert_array_equal(np.asarray(st_d.amp_re),
                                  np.asarray(st_b.amp_re))


def test_blockg_parity_merged_lane_layout(tmp_path, monkeypatch):
    """G=64 activates the merged-lane footprint path (MERGE_FT in
    kernels/blockg.py: GFL/GFQ/GFK all whole 128-lane tiles -> ONE wide
    dot1h read + static lane slices instead of per-table/per-atom small
    matmuls). The hardware flagship runs this branch; pin it against the
    XLA scan path on CPU (interpret mode) - decisions exact."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    assert spec.fw_split  # covers the fw fast-path staging too
    states = replicate(spec, sysm.state, 64)
    st_b, st_x = _run_pair(spec, states, 8, monkeypatch, 64)
    np.testing.assert_array_equal(np.asarray(st_b.n_mol),
                                  np.asarray(st_x.n_mol))
    np.testing.assert_array_equal(np.asarray(st_b.counters),
                                  np.asarray(st_x.counters))
    assert np.abs(np.asarray(st_b.pos) - np.asarray(st_x.pos)).max() < 1e-4
