"""Checkpoint/resume: bit-exact state round-trip, CLI --checkpoint/--resume."""

import numpy as np
import pytest

from maniac_tpu import load_system
from maniac_tpu.cli import main as cli_main
from maniac_tpu.io.checkpoint import load_checkpoint, save_checkpoint
from maniac_tpu.mc.driver import run_block

from fixtures import make_water_box


def test_checkpoint_roundtrip_bit_exact(tmp_path):
    d = make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0,
                       tol=1e-4, probs=(0.4, 0.3, 0.3, 0.0), fugacity=500.0)
    sysm = load_system(f"{d}/input.maniac", f"{d}/topology.data",
                       f"{d}/parameters.inc")
    spec = sysm.spec
    state = run_block(spec, sysm.state, 50, True)
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, spec, state, block=3)
    loaded, block = load_checkpoint(path, spec)
    assert block == 3
    import dataclasses
    for f in dataclasses.fields(state):
        a = np.asarray(getattr(state, f.name))
        b = np.asarray(getattr(loaded, f.name))
        np.testing.assert_array_equal(a, b, err_msg=f.name)
    # resumed chains continue identically (same key -> same trajectory)
    s1 = run_block(spec, state, 20, False)
    s2 = run_block(spec, loaded, 20, False)
    np.testing.assert_array_equal(np.asarray(s1.energy), np.asarray(s2.energy))


def test_checkpoint_layout_mismatch(tmp_path):
    d = make_water_box(str(tmp_path), n_water=8, L=14.0, cutoff=5.0, tol=1e-4)
    sysm = load_system(f"{d}/input.maniac", f"{d}/topology.data",
                       f"{d}/parameters.inc")
    path = str(tmp_path / "ck.npz")
    save_checkpoint(path, sysm.spec, sysm.state)
    other = load_system(f"{d}/input.maniac", f"{d}/topology.data",
                        f"{d}/parameters.inc", capacity=999)
    with pytest.raises(ValueError):
        load_checkpoint(path, other.spec)


def test_cli_checkpoint_resume(tmp_path):
    d = make_water_box(str(tmp_path / "sys"), n_water=8, L=14.0, cutoff=5.0,
                       tol=1e-4, probs=(0.5, 0.5, 0.0, 0.0), nb_block=3,
                       nb_step=20)
    out = str(tmp_path / "out")
    ck = str(tmp_path / "ck.npz")
    base = ["-i", f"{d}/input.maniac", "-d", f"{d}/topology.data",
            "-p", f"{d}/parameters.inc", "--platform", "cpu",
            "--dtype", "f64"]
    assert cli_main(base + ["-o", out, "--checkpoint", ck]) == 0
    out2 = str(tmp_path / "out2")
    assert cli_main(base + ["-o", out2, "--resume", ck]) == 0
    log = open(f"{out2}/log.maniac").read()
    assert "Resumed" in log and "Simulation Completed" in log
