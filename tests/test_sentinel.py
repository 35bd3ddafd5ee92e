"""Hardware cross-check sentinel (mc/driver.py sentinel_check): replaying a
kernel-path block through the force_xla scan path from the same pre-block
state must reproduce decisions exactly and positions/energies to f32 ulp.

This is the continuously-checkable form of the blockg parity property
(tests/test_blockg.py): on real runs --sentinel N performs this comparison
on-device every N blocks.
"""

import jax.numpy as jnp

from maniac_tpu import load_system
from maniac_tpu.mc.driver import sentinel_check
from maniac_tpu.parallel.replicas import replicate, run_block_replicated
from maniac_tpu.systems import make_water_box, make_zif_like


def _load(outdir, **kw):
    return load_system(f"{outdir}/input.maniac", f"{outdir}/topology.data",
                       f"{outdir}/parameters.inc", **kw)


def test_sentinel_zero_divergence_blockg(tmp_path, monkeypatch):
    """blockg kernel path vs XLA replay, fused resync on (the production
    f32 replicated configuration)."""
    make_zif_like(str(tmp_path), n_cells=4, a=5.66, n_water=10,
                  fugacity=50.0, cutoff=6.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    states = replicate(spec, sysm.state, 2)
    pre = states
    post = run_block_replicated(spec, pre, 60, True, True)
    rep = sentinel_check(spec, pre, post, 60, True, resync=True)
    assert rep["n_mol_mismatch"] == 0
    assert rep["counter_mismatch"] == 0
    assert rep["pos_max_diff"] < 1e-4
    assert rep["energy_max_diff"] < 5.0


def test_sentinel_detects_divergence(tmp_path, monkeypatch):
    """A genuinely different post-state (one extra block) must be flagged:
    the sentinel is a real comparison, not a tautology."""
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                   probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0)
    sysm = _load(str(tmp_path), dtype=jnp.float32, capacity=16)
    spec = sysm.spec
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    states = replicate(spec, sysm.state, 2)
    post = run_block_replicated(spec, states, 50, False, False)
    post2 = run_block_replicated(spec, post, 50, False, False)
    rep = sentinel_check(spec, states, post2, 50, False)
    assert rep["counter_mismatch"] > 0


def test_sentinel_cli_flag(tmp_path, monkeypatch, capsys):
    """--sentinel N end-to-end: log carries the cross-check summary with
    zero divergences."""
    from maniac_tpu.cli import main
    make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4,
                  probs=(0.3, 0.2, 0.5, 0.0), fugacity=20000.0,
                  nb_block=2, nb_step=25)
    monkeypatch.setenv("MANIAC_GROUP", "2")
    monkeypatch.setenv("MANIAC_PALLAS", "blockg")
    out = str(tmp_path / "out")
    rc = main(["-i", f"{tmp_path}/input.maniac",
               "-d", f"{tmp_path}/topology.data",
               "-p", f"{tmp_path}/parameters.inc",
               "-o", out, "--replicas", "2", "--dtype", "f32",
               "--capacity", "16", "--sentinel", "1"])
    assert rc == 0
    log = open(f"{out}/log.maniac").read()
    assert "sentinel: 2 cross-checked blocks, 0 divergences" in log
    assert "SENTINEL DIVERGENCE" not in log
