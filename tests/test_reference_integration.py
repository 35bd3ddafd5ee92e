"""Black-box end-to-end runs on the reference's OWN data fixtures.

The reference's black-box contract is "run the binary on a fixture, grep
the log" (reference: tests/readers/data/run-test.sh:13-51 greps
"Simulation Completed" on good-*.data and "(Error|STOP)" on bad-*.data;
tests/integration/energy/H2O-gas/run-test.sh:14-20 greps the final TotEng
row and gates it to 0.01 kcal/mol). These tests honor that contract on
the only reference-authored inputs available here
(/root/reference/tests/readers/data: 3 methanol + 4 water in a 100 A box)
and extend it with the rebuild's internal invariants:

* full-system startup energy vs the independent brute-force oracle
  (scripts/oracle.py) to the reference's 0.01 kcal/mol LAMMPS bar
* a short GCMC run with bookkeeping == recompute at f64
* the final-TotEng awk contract (line after "TotEng", 2nd field parses)

The reference drives these fixtures with the CH4O-H2O parameters.inc from
its mc-topology submodule, which is absent here; the LJ coefficients are
reconstructed from the `Pair Coeffs` section embedded in good-01.data
(same 14-type force field, written by LAMMPS write_data), which the
reference's include file mirrors per-type.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from maniac_tpu import load_system
from maniac_tpu.cli import main as cli_main
from maniac_tpu.constants import KB_KCALMOL
from maniac_tpu.system import E_TOT

REF = "/root/reference/tests/readers/data"

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference fixtures not present")


@pytest.fixture(scope="module")
def ref_inc(tmp_path_factory):
    """parameters.inc reconstructed from good-01.data's Pair Coeffs block
    (eps kcal/mol, sigma A per atom type; cross terms via Lorentz-Berthelot
    exactly as the reference's parameter reader builds them)."""
    lines = open(f"{REF}/good-01.data").read().splitlines()
    start = next(i for i, ln in enumerate(lines) if ln.startswith("Pair Coeffs"))
    out = []
    for ln in lines[start + 1:]:
        ln = ln.strip()
        if not ln:
            if out:
                break
            continue
        t, eps, sig = ln.split()
        out.append(f"pair_coeff {t} {t} {eps} {sig}")
    assert len(out) == 14
    p = tmp_path_factory.mktemp("inc") / "parameters.inc"
    p.write_text("\n".join(out) + "\n")
    return str(p)


def _deck_with(tmp_path, **overrides):
    """Copy the reference deck, overriding scalar keywords."""
    text = open(f"{REF}/input.maniac").read()
    for key, val in overrides.items():
        found = False
        lines = []
        for ln in text.splitlines():
            if ln.split() and ln.split()[0] == key:
                lines.append(f"{key} {val}")
                found = True
            else:
                lines.append(ln)
        assert found, key
        text = "\n".join(lines)
    p = tmp_path / "input.maniac"
    p.write_text(text + "\n")
    return str(p)


@needs_ref
@pytest.mark.parametrize("data", ["good-01.data", "good-02.data"])
def test_reference_good_data_cli_contract(tmp_path, data, ref_inc):
    """run-test.sh contract: the driver runs the fixture with the
    reference's own input.maniac (verbatim, nb_block 0) and the log
    carries the completion banner."""
    out = str(tmp_path / "outputs") + "/"
    rc = cli_main(["-i", f"{REF}/input.maniac", "-d", f"{REF}/{data}",
                   "-p", ref_inc, "-o", out,
                   "--platform", "cpu", "--dtype", "f64"])
    assert rc == 0
    log = open(f"{out}log.maniac").read()
    assert "Simulation Completed" in log       # the grep in run-test.sh:21
    assert "FATAL" not in log


@needs_ref
@pytest.mark.parametrize("data", ["bad-01", "bad-02", "bad-03", "bad-04"])
def test_reference_bad_data_cli_contract(tmp_path, data, ref_inc):
    """run-test.sh contract for bad fixtures: nonzero exit and an error
    block in the log (grep -E "(Error|STOP)", run-test.sh:38)."""
    out = str(tmp_path / "outputs") + "/"
    rc = cli_main(["-i", f"{REF}/input.maniac", "-d", f"{REF}/{data}.data",
                   "-p", ref_inc, "-o", out,
                   "--platform", "cpu", "--dtype", "f64"])
    assert rc != 0
    log = open(f"{out}log.maniac").read()
    assert "ERROR" in log or "Error" in log


@needs_ref
@pytest.mark.parametrize("data", ["good-01.data", "good-02.data"])
def test_reference_good_data_energy_vs_oracle(tmp_path, data, ref_inc):
    """Full-system startup energy of the reference fixture vs the
    independent brute-force oracle, gated at the reference's LAMMPS
    tolerance (tests/integration/energy/H2O-gas/run-test.sh:16-17)."""
    from oracle import oracle_total
    from maniac_tpu.constants import COULOMB_K
    from maniac_tpu.physics.energy import site_positions

    sysm = load_system(f"{REF}/input.maniac", f"{REF}/{data}", ref_inc,
                       capacity=8)
    spec, state = sysm.spec, sysm.state
    pos = np.asarray(site_positions(spec, state), dtype=np.float64)
    q = np.asarray(spec.site_q, dtype=np.float64)
    mol = np.asarray(spec.site_mol)
    active = np.asarray(spec.site_midx) < np.asarray(
        state.n_mol)[np.asarray(spec.site_type)]
    pos, q, mol = pos[active], q[active], mol[active]
    cls = np.asarray(spec.site_cls)[active]
    eps = np.asarray(spec.eps_cls)[np.ix_(cls, cls)]
    sig = np.asarray(spec.sig_cls)[np.ix_(cls, cls)]
    # L=100 box, 28 atoms: small alpha keeps the oracle's k-sum tractable
    # while 3 image shells converge its real-space sum
    ref = oracle_total(pos, q, mol, 100.0, eps, sig, cutoff=17.0,
                       alpha=0.22, n_images=3, kmax=24,
                       coulomb_k=COULOMB_K)
    got = float(state.energy[E_TOT])
    diff_kcal = abs(got - ref) * KB_KCALMOL
    assert diff_kcal < 0.01, (got, ref, diff_kcal)


@needs_ref
def test_reference_good01_gcmc_and_toteng_grep(tmp_path, ref_inc):
    """Short GCMC on good-01 through the CLI: the final-TotEng awk
    contract holds, and an equivalent library-level run keeps
    bookkeeping == recompute at f64 (the engine's core invariant)."""
    deck = _deck_with(tmp_path, nb_block=2, nb_step=40)
    out = str(tmp_path / "outputs") + "/"
    rc = cli_main(["-i", deck, "-d", f"{REF}/good-01.data", "-p", ref_inc,
                   "-o", out, "--platform", "cpu", "--dtype", "f64",
                   "--capacity", "8", "--audit"])
    assert rc == 0
    log = open(f"{out}log.maniac").read()
    assert "Simulation Completed" in log
    lines = log.splitlines()
    idx = max(i for i, ln in enumerate(lines) if "TotEng" in ln)
    float(lines[idx + 1].lstrip("| ").split()[1])  # awk $2 parses

    # library-level: same fixture, consistency oracle after a block
    from maniac_tpu.mc.driver import drift_report, run_block
    sysm = load_system(deck, f"{REF}/good-01.data", ref_inc, capacity=8)
    st = run_block(sysm.spec, sysm.state, 80, True)
    rep = drift_report(sysm.spec, st)
    assert rep["drift_K"] < 1e-6, rep  # measured ~1e-9 K
