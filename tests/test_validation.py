"""Real-material external-validity anchors (VERDICT r3 #4).

The reference validates against LAMMPS and RASPA on mc-topology example
cases (/root/reference/README.md:60-65) that are not available offline.
These tests anchor the rebuild to REAL materials instead:

1. ZIF-8 (Park et al., PNAS 103, 10186 (2006)): the published cubic cell
   (I-43m, a = 16.991 A) with the Zn sublattice on the sodalite 12d sites
   and idealized 2-methylimidazolate linkers (maniac_tpu/systems.py
   zif8_cell_sites documents exactly which parts are published vs
   idealized). Structure checks pin the published geometry; a GCMC run of
   LJ argon at 87.3 K / 1 atm converts saturation uptake to micropore
   volume by the Gurvich rule and compares against the very widely
   published ZIF-8 value of ~0.6-0.7 cm^3/g.

Related anchors elsewhere in the suite: LJ virial expansion
(test_virial_anchor.py), SPC/E Widom mu_ex vs published -6.7..-7.3
kcal/mol (scripts/validate_spce.py), NaCl Madelung (test_energy.py).
"""

import tempfile

import numpy as np
import pytest

from maniac_tpu import load_system
from maniac_tpu.mc.driver import resync, run_block
from maniac_tpu.systems import make_zif8, zif8_cell_sites

A_CELL = 16.991           # published cell constant (Park et al. 2006)
M_CELL = 2730.9           # Zn12(C4H5N2)24 g/mol (published formula)
V_LIQ_AR = 28.7           # liquid Ar molar volume at 87 K, cm^3/mol


def _mimg(d, a=A_CELL):
    return d - a * np.round(d / a)


def test_zif8_published_geometry():
    pos, elem = zif8_cell_sites()
    elem = np.asarray(elem)
    # published cell content: Zn12(mIm)24, mIm = C4H5N2 with a methyl
    # united atom (E) and 2 explicit ring H
    assert len(elem) == 204
    assert (elem == "Zn").sum() == 12 and (elem == "N").sum() == 48
    zn = pos[elem == "Zn"]
    # sodalite net: every Zn has exactly 4 equidistant Zn neighbors at
    # the published ~6.0 A
    for i in range(12):
        d = np.sort(np.linalg.norm(_mimg(zn - zn[i]), axis=1))[1:5]
        assert np.allclose(d, 6.007, atol=0.01), d
    # published Zn-N bond length 1.987 A, 4 N per Zn
    npos = pos[elem == "N"]
    dzn = np.linalg.norm(_mimg(npos[:, None, :] - zn[None, :, :]), axis=2)
    assert np.allclose(dzn.min(axis=1), 1.987, atol=0.005)
    assert ((dzn < 2.1).sum(axis=0) == 4).all()
    # crystallographic density follows from the published cell + formula
    rho = M_CELL / (A_CELL ** 3 * 0.6022)
    assert abs(rho - 0.9245) < 0.002


@pytest.mark.slow
def test_zif8_ar_pore_volume_vs_published():
    """GCMC Ar at 87.3 K / 1 atm: Gurvich micropore volume in the
    published 0.6-0.7 cm^3/g window (+-35% test tolerance for the
    idealized-linker model + LJ parameter class)."""
    import jax.numpy as jnp

    tmp = tempfile.mkdtemp()
    make_zif8(tmp, n_guest=40)          # warm start near saturation
    sysm = load_system(f"{tmp}/input.maniac", f"{tmp}/topology.data",
                       f"{tmp}/parameters.inc", dtype=jnp.float32,
                       capacity=96)
    spec, state = sysm.spec, sysm.state
    Ns = []
    for _ in range(14):
        state = run_block(spec, state, 2000, False)
        state = resync(spec, state)
        Ns.append(int(np.asarray(state.n_mol)[1]))   # residue 1 = Ar
    nbar = float(np.mean(Ns[7:]))
    vpore = nbar * V_LIQ_AR / M_CELL
    assert 0.45 < vpore < 0.90, (Ns, vpore)
