"""Synthetic system builders (LAMMPS .data / .maniac / .inc writers).

Used by the test suite, benchmarks, and as user-facing examples.

The reference's example topologies live in an mc-topology submodule that is
not available, so tests generate their own systems: TIP4P/2005-like water,
NaCl rock salt (analytic Madelung anchor), LJ gas, and a synthetic
framework+guest adsorption system.
"""

from __future__ import annotations

import math
import os

import numpy as np

# TIP4P/2005 rigid water geometry/charges
R_OH = 0.9572
ANG_HOH = math.radians(104.52)
R_OM = 0.1546
Q_H = 0.5564
Q_M = -2 * Q_H
EPS_O = 0.1852   # kcal/mol
SIG_O = 3.1589   # Angstrom
MASS = {"O": 15.9994, "H": 1.008, "M": 0.0001, "Na": 22.99, "Cl": 35.453,
        "LJ": 39.948, "F": 12.011}


def water_sites() -> tuple[np.ndarray, np.ndarray, list]:
    """Returns (positions (4,3) relative to O, charges (4,), type slots)."""
    h1 = R_OH * np.array([math.sin(ANG_HOH / 2), 0.0, math.cos(ANG_HOH / 2)])
    h2 = R_OH * np.array([-math.sin(ANG_HOH / 2), 0.0, math.cos(ANG_HOH / 2)])
    m = R_OM * np.array([0.0, 0.0, 1.0])
    pos = np.stack([np.zeros(3), h1, h2, m])
    q = np.array([0.0, Q_H, Q_H, Q_M])
    return pos, q, ["O", "H", "H", "M"]


def _random_rotation(rng) -> np.ndarray:
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
        [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
        [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
    ])


def _write_data(path, L, atoms, masses, n_types, tilt=None):
    """atoms: list of (mol_id, type, q, x, y, z). L: scalar (cubic) or
    3-sequence (orthorhombic box lengths)."""
    Lx, Ly, Lz = (L, L, L) if np.ndim(L) == 0 else L
    with open(path, "w") as f:
        f.write("LAMMPS data file (maniac-tpu test fixture)\n\n")
        f.write(f"{len(atoms)} atoms\n{n_types} atom types\n")
        f.write("0 bonds\n0 bond types\n0 angles\n0 angle types\n")
        f.write("0 dihedrals\n0 dihedral types\n0 impropers\n0 improper types\n\n")
        f.write(f"{-Lx / 2:.6f} {Lx / 2:.6f} xlo xhi\n")
        f.write(f"{-Ly / 2:.6f} {Ly / 2:.6f} ylo yhi\n")
        f.write(f"{-Lz / 2:.6f} {Lz / 2:.6f} zlo zhi\n")
        if tilt is not None:
            f.write(f"{tilt[0]:.6f} {tilt[1]:.6f} {tilt[2]:.6f} xy xz yz\n")
        f.write("\nMasses\n\n")
        for t in range(1, n_types + 1):
            f.write(f"{t} {masses[t]}\n")
        f.write("\nAtoms # full\n\n")
        for i, (mol, typ, q, x, y, z) in enumerate(atoms, 1):
            f.write(f"{i} {mol} {typ} {q:.6f} {x:.10f} {y:.10f} {z:.10f} 0 0 0\n")


def _write_deck(path, residues, nb_block=1, nb_step=0, temp=300.0,
                tol=1e-5, cutoff=8.0, tstep=0.6, rstep=0.5,
                probs=(0.5, 0.5, 0.0, 0.0), seed=12345, recal=False,
                **extra):
    with open(path, "w") as f:
        f.write("# maniac-tpu test deck\n")
        f.write(f"nb_block {nb_block}\nnb_step {nb_step}\n")
        f.write(f"temperature {temp}\nseed {seed}\n")
        f.write(f"ewald_tolerance {tol}\nreal_space_cutoff {cutoff}\n")
        f.write(f"translation_step {tstep}\nrotation_step_angle {rstep}\n")
        f.write(f"recalibrate_moves {'true' if recal else 'false'}\n")
        f.write(f"translation_proba {probs[0]}\nrotation_proba {probs[1]}\n")
        f.write(f"insertion_deletion_proba {probs[2]}\nswap_proba {probs[3]}\n")
        # remaining keywords (ewald_alpha, fw_alpha2, fw_rcut2,
        # framework_split, ...) pass straight through to the deck
        for k, v in extra.items():
            f.write(f"{k} {v}\n")
        f.write("\n")
        for res in residues:
            f.write("begin_residue\n")
            f.write(f"  name {res['name']}\n")
            f.write(f"  state {'actif' if res['active'] else 'inactif'}\n")
            if res.get("fugacity") is not None:
                f.write(f"  fugacity {res['fugacity']}\n")
            f.write(f"  types {' '.join(str(t) for t in res['types'])}\n")
            f.write(f"  names {' '.join(res['names'])}\n")
            f.write(f"  nb-atoms {res['nb_atoms']}\nend_residue\n\n")


def _write_inc(path, coeffs):
    with open(path, "w") as f:
        f.write("# pair coefficients (eps kcal/mol, sigma A)\n")
        for (i, j, e, s) in coeffs:
            f.write(f"pair_coeff {i} {j} {e} {s}\n")


def make_water_box(outdir, n_water=8, L=14.0, seed=7, **deck_kw):
    """N rigid waters on a jittered grid in a cubic box."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sites, q, names = water_sites()
    per_axis = max(2, int(math.ceil(n_water ** (1 / 3))))
    spacing = L / per_axis
    centers = []
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                centers.append((-L / 2 + (np.array([i, j, k]) + 0.5) * spacing))
    centers = np.asarray(centers[:n_water])
    centers += rng.uniform(-0.15, 0.15, centers.shape) * spacing

    atoms = []
    type_of = {"O": 1, "H": 2, "M": 3}
    for m, c in enumerate(centers, 1):
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        for a in range(4):
            atoms.append((m, type_of[names[a]], q[a], *pos[a]))

    masses = {1: MASS["O"], 2: MASS["H"], 3: MASS["M"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 3)
    residues = [dict(name="wat", active=True, fugacity=deck_kw.pop("fugacity", 50.0),
                     types=[1, 2, 3], names=["OW", "HW", "MW"], nb_atoms=4)]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", [(1, 1, EPS_O, SIG_O),
                                            (2, 2, 0.0, 0.0),
                                            (3, 3, 0.0, 0.0)])
    return outdir


def make_spce_box(outdir, n_water=216, density=0.997, seed=41, **deck_kw):
    """Literature-parameter SPC/E water at a target mass density (g/cm^3).

    SPC/E (Berendsen, Grigera, Straatsma 1987): 3 sites, r_OH = 1.0 A,
    HOH = 109.47 deg (tetrahedral), q_O = -0.8476 e, q_H = +0.4238 e,
    O-O LJ eps = 0.15535 kcal/mol, sigma = 3.166 A. Used by the external
    validation anchor (scripts/validate_spce.py): Widom mu_ex at 298 K /
    0.997 g/cm^3 is published at -28..-30.5 kJ/mol (Widom/TI on SPC/E
    with Ewald; e.g. Hermans et al., Quintana & Haymet), i.e.
    -6.7..-7.3 kcal/mol."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    ang = math.radians(109.47)
    h1 = 1.0 * np.array([math.sin(ang / 2), 0.0, math.cos(ang / 2)])
    h2 = 1.0 * np.array([-math.sin(ang / 2), 0.0, math.cos(ang / 2)])
    sites = np.stack([np.zeros(3), h1, h2])
    q = np.array([-0.8476, 0.4238, 0.4238])
    mass_w = 15.9994 + 2 * 1.008
    # box edge from the target density
    L = (n_water * mass_w / (density * 0.1 * 6.0221408)) ** (1.0 / 3.0)
    per_axis = max(2, int(math.ceil(n_water ** (1 / 3))))
    spacing = L / per_axis
    centers = []
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                centers.append(-L / 2 + (np.array([i, j, k]) + 0.5) * spacing)
    centers = np.asarray(centers[:n_water])
    centers += rng.uniform(-0.1, 0.1, centers.shape) * spacing
    atoms = []
    for m, c in enumerate(centers, 1):
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        for a in range(3):
            atoms.append((m, 1 if a == 0 else 2, q[a], *pos[a]))
    masses = {1: 15.9994, 2: 1.008}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 2)
    residues = [dict(name="wat", active=True,
                     fugacity=deck_kw.pop("fugacity", 10.0),
                     types=[1, 2], names=["OW", "HW"], nb_atoms=3)]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", [(1, 1, 0.15535, 3.166),
                                            (2, 2, 0.0, 0.0)])
    return outdir


def make_water_reservoir(outdir, n_water=16, L=20.0, seed=23):
    """A reservoir data file matching make_water_box's residue declaration
    (for the -r flag). Returns the file path."""
    rng = np.random.default_rng(seed)
    sites, q, names = water_sites()
    per_axis = max(2, int(math.ceil(n_water ** (1 / 3))))
    spacing = L / per_axis
    atoms = []
    type_of = {"O": 1, "H": 2, "M": 3}
    m = 0
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                if m >= n_water:
                    break
                m += 1
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * spacing
                R = _random_rotation(rng)
                pos = c + sites @ R.T
                for a in range(4):
                    atoms.append((m, type_of[names[a]], q[a], *pos[a]))
    masses = {1: MASS["O"], 2: MASS["H"], 3: MASS["M"]}
    os.makedirs(outdir, exist_ok=True)
    path = f"{outdir}/reservoir.data"
    _write_data(path, L, atoms, masses, 3)
    return path


def make_nacl(outdir, n_cells=2, a=5.6402, **deck_kw):
    """Rock-salt NaCl, n_cells^3 conventional cells. Pure Coulomb (LJ=0)."""
    os.makedirs(outdir, exist_ok=True)
    L = n_cells * a
    na_frac = [(0, 0, 0), (0.5, 0.5, 0), (0.5, 0, 0.5), (0, 0.5, 0.5)]
    cl_frac = [(0.5, 0, 0), (0, 0.5, 0), (0, 0, 0.5), (0.5, 0.5, 0.5)]
    atoms = []
    mol = 0
    for frac, typ, q in ((na_frac, 1, 1.0), (cl_frac, 2, -1.0)):
        for i in range(n_cells):
            for j in range(n_cells):
                for k in range(n_cells):
                    for fx, fy, fz in frac:
                        mol += 1
                        x = -L / 2 + (i + fx) * a
                        y = -L / 2 + (j + fy) * a
                        z = -L / 2 + (k + fz) * a
                        atoms.append((mol, typ, q, x, y, z))
    masses = {1: MASS["Na"], 2: MASS["Cl"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 2)
    residues = [
        dict(name="na", active=True, fugacity=1.0, types=[1], names=["Na"], nb_atoms=1),
        dict(name="cl", active=True, fugacity=1.0, types=[2], names=["Cl"], nb_atoms=1),
    ]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", [(1, 1, 0.0, 0.0), (2, 2, 0.0, 0.0)])
    return outdir


def make_lj_gas(outdir, n=32, L=18.0, seed=3, two_species=False, **deck_kw):
    """Single-site LJ particles, no charges (tests GCMC statistics/swaps)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    per_axis = max(2, int(math.ceil(n ** (1 / 3))))
    spacing = L / per_axis
    atoms = []
    m = 0
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                if m >= n:
                    break
                m += 1
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * spacing \
                    + rng.uniform(-0.2, 0.2, 3)
                typ = 1 if (not two_species or m % 2) else 2
                atoms.append((m, typ, 0.0, *c))
    n_types = 2 if two_species else 1
    masses = {1: MASS["LJ"], 2: MASS["LJ"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, n_types)
    if two_species:
        residues = [
            dict(name="lja", active=True, fugacity=deck_kw.pop("fug_a", 2.0),
                 types=[1], names=["A"], nb_atoms=1),
            dict(name="ljb", active=True, fugacity=deck_kw.pop("fug_b", 2.0),
                 types=[2], names=["B"], nb_atoms=1),
        ]
        coeffs = [(1, 1, 0.2, 3.4), (2, 2, 0.3, 3.0)]
    else:
        residues = [dict(name="lj", active=True,
                         fugacity=deck_kw.pop("fugacity", 2.0),
                         types=[1], names=["A"], nb_atoms=1)]
        coeffs = [(1, 1, deck_kw.pop("eps", 0.2), deck_kw.pop("sig", 3.4))]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", coeffs)
    return outdir


def make_lj_chain(outdir, n_atoms=6, n_mol=4, L=18.0, bond=1.2, seed=5,
                  **deck_kw):
    """Rigid linear chains of n_atoms uncharged LJ sites (one type). With
    n_atoms > 4 this exceeds the grouped kernel's 8-row LJ slab layout
    (2*Lmax > 8), exercising the ungrouped fallback."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    atoms = []
    per_axis = max(2, int(math.ceil(n_mol ** (1 / 3))))
    spacing = L / per_axis
    m = 0
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                if m >= n_mol:
                    break
                m += 1
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * spacing
                R = _random_rotation(rng)
                axis = R @ np.array([1.0, 0.0, 0.0])
                for a in range(n_atoms):
                    p = c + (a - (n_atoms - 1) / 2) * bond * axis
                    atoms.append((m, 1, 0.0, *p))
    _write_data(f"{outdir}/topology.data", L, atoms, {1: MASS["LJ"]}, 1)
    residues = [dict(name="chn", active=True,
                     fugacity=deck_kw.pop("fugacity", 2.0),
                     types=[1], names=["A"], nb_atoms=n_atoms)]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", [(1, 1, 0.2, 3.0)])
    return outdir


def make_triclinic_water(outdir, n_water=8, L=14.0, tilt=(2.0, 1.2, 0.8),
                         seed=7, **deck_kw):
    """N rigid waters in a TRICLINIC box (LAMMPS convention: a=(lx,0,0),
    b=(xy,ly,0), c=(xz,yz,lz)). Exercises the 27-image minimum-image path
    (reference: src/geometry_utils.f90:359-415) and the triclinic
    reciprocal lattice. tilt=(xy, xz, yz)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sites, q, names = water_sites()
    xy, xz, yz = tilt
    H = np.array([[L, xy, xz], [0.0, L, yz], [0.0, 0.0, L]])  # cols = a,b,c
    per_axis = max(2, int(math.ceil(n_water ** (1 / 3))))
    atoms = []
    type_of = {"O": 1, "H": 2, "M": 3}
    m = 0
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                if m >= n_water:
                    break
                m += 1
                frac = (np.array([i, j, k]) + 0.5) / per_axis \
                    + rng.uniform(-0.02, 0.02, 3)
                c = H @ frac + np.array([-L / 2, -L / 2, -L / 2])
                R = _random_rotation(rng)
                pos = c + sites @ R.T
                for a in range(4):
                    atoms.append((m, type_of[names[a]], q[a], *pos[a]))
    masses = {1: MASS["O"], 2: MASS["H"], 3: MASS["M"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 3,
                tilt=(xy, xz, yz))
    residues = [dict(name="wat", active=True,
                     fugacity=deck_kw.pop("fugacity", 50.0),
                     types=[1, 2, 3], names=["OW", "HW", "MW"], nb_atoms=4)]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc", [(1, 1, EPS_O, SIG_O),
                                            (2, 2, 0.0, 0.0),
                                            (3, 3, 0.0, 0.0)])
    return outdir


def make_framework_water(outdir, n_cells=3, a=8.0, n_water=12, seed=11,
                         **deck_kw):
    """Synthetic nanoporous framework (simple-cubic LJ lattice, one inactive
    rigid molecule) + water guests. Stand-in for the ZIF-8+H2O flagship."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = n_cells * a
    atoms = []
    # framework: one molecule, type 1 sites on an SC lattice with partial
    # charges alternating to exercise framework electrostatics
    fw_sites = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                fw_sites.append((-L / 2 + np.array([i, j, k]) * a))
    nq = len(fw_sites)
    for idx, p in enumerate(fw_sites):
        qf = 0.4 if idx % 2 == 0 else -0.4
        if nq % 2 == 1 and idx == nq - 1:
            qf = 0.0  # keep the framework neutral
        atoms.append((1, 1, qf, *p))
    sites, q, names = water_sites()
    type_of = {"O": 2, "H": 3, "M": 4}
    taken = set()
    m = 1
    placed = 0
    while placed < n_water:
        cell = tuple(rng.integers(0, n_cells, 3))
        if cell in taken:
            continue
        taken.add(cell)
        c = -L / 2 + (np.asarray(cell) + 0.5) * a
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        m += 1
        for aa in range(4):
            atoms.append((m, type_of[names[aa]], q[aa], *pos[aa]))
        placed += 1
    masses = {1: MASS["F"], 2: MASS["O"], 3: MASS["H"], 4: MASS["M"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 4)
    residues = [
        dict(name="fwk", active=False, types=[1], names=["F"],
             nb_atoms=len(fw_sites)),
        dict(name="wat", active=True, fugacity=deck_kw.pop("fugacity", 50.0),
             types=[2, 3, 4], names=["OW", "HW", "MW"], nb_atoms=4),
    ]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.3, 3.2), (2, 2, EPS_O, SIG_O),
                (3, 3, 0.0, 0.0), (4, 4, 0.0, 0.0)])
    return outdir


def make_zif_like(outdir, n_cells=6, a=5.66, atoms_per_cell=10, n_water=32,
                  seed=17, **deck_kw):
    """ZIF-8-scale synthetic adsorbent: ~2160 framework atoms in a ~34 A box
    (ZIF-8 reference scale: 2208 atoms, SURVEY.md section 2; the real
    mc-topology files are not available). Each cell carries a charged cage
    cluster at its center, leaving interstitial pores for water guests.
    This is the flagship benchmark system."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = n_cells * a
    atoms = []
    # cage cluster: cube corners (alternating charge) + 2 axial sites
    base = np.array([[sx, sy, sz] for sx in (-1.1, 1.1)
                     for sy in (-1.1, 1.1) for sz in (-1.1, 1.1)])
    extra = np.array([[0.0, 0.0, 1.9], [0.0, 0.0, -1.9]])
    cluster = np.vstack([base, extra])[:atoms_per_cell]
    qs = np.array([0.18 if i % 2 == 0 else -0.18
                   for i in range(len(cluster))])
    qs -= qs.mean()  # exact neutrality
    n_fw = 0
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * a
                for s, qf in zip(cluster, qs):
                    n_fw += 1
                    atoms.append((1, 1, qf, *(c + s)))
    sites, q, names = water_sites()
    type_of = {"O": 2, "H": 3, "M": 4}
    # waters at cell-corner interstitials (pore space)
    corners = [(i, j, k) for i in range(n_cells) for j in range(n_cells)
               for k in range(n_cells)]
    rng.shuffle(corners)
    m = 1
    for cell in corners[:n_water]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        m += 1
        for aa in range(4):
            atoms.append((m, type_of[names[aa]], q[aa], *pos[aa]))
    masses = {1: MASS["F"], 2: MASS["O"], 3: MASS["H"], 4: MASS["M"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 4)
    residues = [
        dict(name="zif", active=False, types=[1], names=["F"], nb_atoms=n_fw),
        dict(name="wat", active=True, fugacity=deck_kw.pop("fugacity", 30.0),
             types=[2, 3, 4], names=["OW", "HW", "MW"], nb_atoms=4),
    ]
    deck_kw.setdefault("cutoff", 8.5)
    deck_kw.setdefault("tol", 1e-5)
    deck_kw.setdefault("probs", (0.3, 0.2, 0.5, 0.0))
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.25, 3.0), (2, 2, EPS_O, SIG_O),
                (3, 3, 0.0, 0.0), (4, 4, 0.0, 0.0)])
    return outdir


def make_framework_mixed(outdir, n_cells=4, a=5.66, n_water=8, n_dimer=4,
                         seed=29, **deck_kw):
    """Framework + TWO active species of different sizes (4-site water and
    a 2-site charged dimer): stresses the static-framework split with
    multiple active types - active-pair LJ table blocks, swap moves under
    the split, and guest chunk ranges with a gap between the type blocks."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = n_cells * a
    atoms = []
    base = np.array([[sx, sy, sz] for sx in (-1.1, 1.1)
                     for sy in (-1.1, 1.1) for sz in (-1.1, 1.1)])
    qs = np.array([0.18 if i % 2 == 0 else -0.18 for i in range(len(base))])
    qs -= qs.mean()
    n_fw = 0
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * a
                for s, qf in zip(base, qs):
                    n_fw += 1
                    atoms.append((1, 1, qf, *(c + s)))
    sites_w, q_w, names_w = water_sites()
    sites_d = np.array([[0.0, 0.0, -0.6], [0.0, 0.0, 0.6]])
    q_d = np.array([0.25, -0.25])
    type_of_w = {"O": 2, "H": 3, "M": 4}
    corners = [(i, j, k) for i in range(n_cells) for j in range(n_cells)
               for k in range(n_cells)]
    rng.shuffle(corners)
    m = 1
    for cell in corners[:n_water]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites_w @ R.T
        m += 1
        for aa in range(4):
            atoms.append((m, type_of_w[names_w[aa]], q_w[aa], *pos[aa]))
    for cell in corners[n_water:n_water + n_dimer]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites_d @ R.T
        m += 1
        for aa in range(2):
            atoms.append((m, 5 + aa, q_d[aa], *pos[aa]))
    masses = {1: MASS["F"], 2: MASS["O"], 3: MASS["H"], 4: MASS["M"],
              5: MASS["F"], 6: MASS["F"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 6)
    residues = [
        dict(name="zif", active=False, types=[1], names=["F"], nb_atoms=n_fw),
        dict(name="wat", active=True, fugacity=deck_kw.pop("fug_w", 60.0),
             types=[2, 3, 4], names=["OW", "HW", "MW"], nb_atoms=4),
        dict(name="dim", active=True, fugacity=deck_kw.pop("fug_d", 60.0),
             types=[5, 6], names=["DA", "DB"], nb_atoms=2),
    ]
    deck_kw.setdefault("cutoff", 6.0)
    deck_kw.setdefault("tol", 1e-5)
    deck_kw.setdefault("probs", (0.25, 0.15, 0.4, 0.2))
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.25, 3.0), (2, 2, EPS_O, SIG_O),
                (3, 3, 0.0, 0.0), (4, 4, 0.0, 0.0),
                (5, 5, 0.15, 3.2), (6, 6, 0.1, 3.0)])
    return outdir


def make_mixed_sizes(outdir, n_water=6, n_dimer=6, L=16.0, seed=13,
                     **deck_kw):
    """Two active species with DIFFERENT molecule sizes (4-site water +
    2-site charged dimer) - stresses swap moves between unequal footprints
    and per-type padding throughout the engine."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    sites_w, q_w, names_w = water_sites()
    sites_d = np.array([[0.0, 0.0, -0.6], [0.0, 0.0, 0.6]])
    q_d = np.array([0.25, -0.25])
    atoms = []
    type_of_w = {"O": 1, "H": 2, "M": 3}
    n_total = n_water + n_dimer
    per_axis = max(2, int(math.ceil(n_total ** (1 / 3))))
    spacing = L / per_axis
    centers = []
    for i in range(per_axis):
        for j in range(per_axis):
            for k in range(per_axis):
                centers.append(-L / 2 + (np.array([i, j, k]) + 0.5) * spacing)
    m = 0
    for c in centers[:n_water]:
        m += 1
        R = _random_rotation(rng)
        pos = c + sites_w @ R.T
        for a in range(4):
            atoms.append((m, type_of_w[names_w[a]], q_w[a], *pos[a]))
    for c in centers[n_water:n_total]:
        m += 1
        R = _random_rotation(rng)
        pos = c + sites_d @ R.T
        for a in range(2):
            atoms.append((m, 4 + a, q_d[a], *pos[a]))
    masses = {1: MASS["O"], 2: MASS["H"], 3: MASS["M"],
              4: MASS["F"], 5: MASS["F"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 5)
    residues = [
        dict(name="wat", active=True, fugacity=deck_kw.pop("fug_w", 200.0),
             types=[1, 2, 3], names=["OW", "HW", "MW"], nb_atoms=4),
        dict(name="dim", active=True, fugacity=deck_kw.pop("fug_d", 200.0),
             types=[4, 5], names=["DA", "DB"], nb_atoms=2),
    ]
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, EPS_O, SIG_O), (2, 2, 0.0, 0.0), (3, 3, 0.0, 0.0),
                (4, 4, 0.15, 3.2), (5, 5, 0.1, 3.0)])
    return outdir

def make_slit_pore(outdir, nx=5, ny=5, wall_layers=2, n_water=10,
                   Lxy=12.0, Lz=30.0, seed=19, **deck_kw):
    """Slit pore (analog of the reference run.sh SLIT case,
    /root/reference/run.sh:4-96): two rigid walls perpendicular to z, each
    its OWN inactive residue type, with water guests confined in the gap.

    Having TWO frozen residue types makes this the regression fixture for
    the fwsplit frozen-prefix alignment: the first wall's site region is
    128-padded, so the frozen prefix must end at the LAST frozen region's
    end, not at the raw frozen-site count (ADVICE r1, high)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    a = Lxy / nx
    zw = Lz / 2 - 2.0            # wall center planes at +-zw
    atoms = []

    def wall(z0, typ, mol_id, qmag):
        n = 0
        for layer in range(wall_layers):
            for i in range(nx):
                for j in range(ny):
                    q = qmag if (i + j + layer) % 2 == 0 else -qmag
                    atoms.append((mol_id, typ,  q,
                                  -Lxy / 2 + (i + 0.5) * a,
                                  -Lxy / 2 + (j + 0.5) * a,
                                  z0 + 1.4 * layer))
                    n += 1
        return n

    n_bot = wall(-zw, 1, 1, 0.20)
    n_top = wall(+zw - 1.4 * (wall_layers - 1), 2, 2, 0.20)
    # (even nx*ny*wall_layers -> each wall is exactly neutral)

    sites, q, names = water_sites()
    type_of = {"O": 3, "H": 4, "M": 5}
    m = 2
    z_free = zw - 1.4 * wall_layers - 2.0   # stay clear of both walls
    for _ in range(n_water):
        c = np.array([rng.uniform(-Lxy / 2 + 1, Lxy / 2 - 1),
                      rng.uniform(-Lxy / 2 + 1, Lxy / 2 - 1),
                      rng.uniform(-z_free, z_free)])
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        m += 1
        for aa in range(4):
            atoms.append((m, type_of[names[aa]], q[aa], *pos[aa]))
    masses = {1: MASS["F"], 2: MASS["F"], 3: MASS["O"], 4: MASS["H"],
              5: MASS["M"]}
    _write_data(f"{outdir}/topology.data", (Lxy, Lxy, Lz), atoms, masses, 5)
    residues = [
        dict(name="walb", active=False, types=[1], names=["WB"],
             nb_atoms=n_bot),
        dict(name="walt", active=False, types=[2], names=["WT"],
             nb_atoms=n_top),
        dict(name="wat", active=True, fugacity=deck_kw.pop("fugacity", 80.0),
             types=[3, 4, 5], names=["OW", "HW", "MW"], nb_atoms=4),
    ]
    deck_kw.setdefault("cutoff", 5.5)
    deck_kw.setdefault("tol", 1e-5)
    deck_kw.setdefault("probs", (0.3, 0.2, 0.5, 0.0))
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.30, 3.2), (2, 2, 0.20, 3.0),
                (3, 3, EPS_O, SIG_O), (4, 4, 0.0, 0.0), (5, 5, 0.0, 0.0)])
    return outdir

def co2_sites() -> tuple[np.ndarray, np.ndarray, list]:
    """Rigid linear CO2 (EPM2-like): O=C=O along z, 1.163 A bonds."""
    pos = np.array([[0.0, 0.0, -1.163], [0.0, 0.0, 0.0],
                    [0.0, 0.0, 1.163]])
    q = np.array([-0.3256, 0.6512, -0.3256])
    return pos, q, ["OC", "C", "OC"]


def make_mfi_co2(outdir, n_cells=4, a=6.0, n_co2=8, seed=31, **deck_kw):
    """MFI-CO2 analog (reference run.sh MFI-CO2 case): zeolite-like charged
    framework + rigid LINEAR 3-site CO2 guests. Exercises A=3 linear
    molecules (rotation moves on a linear rotor, 3 LJ rows, 3 charged
    rows, a repeated atom type inside one residue) through the whole
    engine.

    The framework is TWO inactive single-atom residue types (F+ / F-):
    both the reference and this engine store charges per (residue type,
    atom) - simulation_state.f90:110-114 - so alternating charges inside
    one residue type would be silently replaced by the template charge;
    and single-atom framework molecules make the absolute-energy oracle
    comparison convention-free (the reference computes the intramolecular
    Ewald correction over ACTIVE molecules only,
    src/energy_utils.f90:55-81)."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = n_cells * a
    atoms = []
    base = np.array([[sx, sy, sz] for sx in (-1.2, 1.2)
                     for sy in (-1.2, 1.2) for sz in (-1.2, 1.2)])
    n_fw = 0
    fw_pos = []
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * a
                for si, s in enumerate(base):
                    n_fw += 1
                    typ = 1 if si % 2 == 0 else 2
                    qf = 0.2 if si % 2 == 0 else -0.2
                    fw_pos.append((typ, qf, c + s))
    # type-1 molecules first, then type-2 (matches the sorted residue
    # layout; the parser orders residues by minimum atom-type id)
    mid = 0
    for want in (1, 2):
        for typ, qf, p in fw_pos:
            if typ == want:
                mid += 1
                atoms.append((mid, typ, qf, *p))
    sites, q, _ = co2_sites()
    corners = [(i, j, k) for i in range(n_cells) for j in range(n_cells)
               for k in range(n_cells)]
    rng.shuffle(corners)
    m = mid
    for cell in corners[:n_co2]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites @ R.T
        m += 1
        # O C O -> types 3 4 3
        for aa, typ in enumerate((3, 4, 3)):
            atoms.append((m, typ, q[aa], *pos[aa]))
    masses = {1: MASS["F"], 2: MASS["F"], 3: MASS["O"], 4: 12.011}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 4)
    residues = [
        dict(name="mfip", active=False, types=[1], names=["FP"],
             nb_atoms=1),
        dict(name="mfim", active=False, types=[2], names=["FM"],
             nb_atoms=1),
        dict(name="co2", active=True, fugacity=deck_kw.pop("fugacity", 40.0),
             types=[3, 4, 3], names=["OC", "C", "OC"], nb_atoms=3),
    ]
    deck_kw.setdefault("cutoff", 7.0)
    deck_kw.setdefault("tol", 1e-5)
    deck_kw.setdefault("probs", (0.3, 0.2, 0.5, 0.0))
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    # EPM2-ish LJ (eps kcal/mol, sigma A)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.22, 3.0), (2, 2, 0.22, 3.0),
                (3, 3, 0.1599, 3.033), (4, 4, 0.0559, 2.757)])
    return outdir


def make_fw_ch4o_h2o(outdir, n_cells=4, a=5.8, n_water=6, n_meoh=6,
                     seed=37, **deck_kw):
    """CH4O-H2O analog (reference run.sh CH4O-H2O / ZIF8-CH4O-H2O cases):
    framework + TWO active adsorbates - 4-site water and a 3-site rigid
    methanol (CH3-O-H, two LJ sites) - co-adsorbing with swap moves."""
    os.makedirs(outdir, exist_ok=True)
    rng = np.random.default_rng(seed)
    L = n_cells * a
    atoms = []
    base = np.array([[sx, sy, sz] for sx in (-1.1, 1.1)
                     for sy in (-1.1, 1.1) for sz in (-1.1, 1.1)])
    qs = np.array([0.15 if i % 2 == 0 else -0.15 for i in range(len(base))])
    qs -= qs.mean()
    n_fw = 0
    for i in range(n_cells):
        for j in range(n_cells):
            for k in range(n_cells):
                c = -L / 2 + (np.array([i, j, k]) + 0.5) * a
                for s, qf in zip(base, qs):
                    n_fw += 1
                    atoms.append((1, 1, qf, *(c + s)))
    sites_w, q_w, names_w = water_sites()
    # rigid methanol: CH3 - O - H (united-atom CH3), OPLS-like charges
    sites_m = np.array([[0.0, 0.0, 0.0],          # CH3
                        [0.0, 0.0, 1.43],          # O
                        [0.9, 0.0, 1.72]])         # H
    q_m = np.array([0.265, -0.700, 0.435])
    type_of_w = {"O": 2, "H": 3, "M": 4}
    corners = [(i, j, k) for i in range(n_cells) for j in range(n_cells)
               for k in range(n_cells)]
    rng.shuffle(corners)
    m = 1
    for cell in corners[:n_water]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites_w @ R.T
        m += 1
        for aa in range(4):
            atoms.append((m, type_of_w[names_w[aa]], q_w[aa], *pos[aa]))
    for cell in corners[n_water:n_water + n_meoh]:
        c = -L / 2 + np.asarray(cell, dtype=float) * a
        R = _random_rotation(rng)
        pos = c + sites_m @ R.T
        m += 1
        for aa, typ in enumerate((5, 6, 7)):
            atoms.append((m, typ, q_m[aa], *pos[aa]))
    masses = {1: MASS["F"], 2: MASS["O"], 3: MASS["H"], 4: MASS["M"],
              5: 15.035, 6: MASS["O"], 7: MASS["H"]}
    _write_data(f"{outdir}/topology.data", L, atoms, masses, 7)
    residues = [
        dict(name="zif", active=False, types=[1], names=["F"], nb_atoms=n_fw),
        dict(name="wat", active=True, fugacity=deck_kw.pop("fug_w", 60.0),
             types=[2, 3, 4], names=["OW", "HW", "MW"], nb_atoms=4),
        dict(name="meoh", active=True, fugacity=deck_kw.pop("fug_m", 40.0),
             types=[5, 6, 7], names=["CM", "OM", "HM"], nb_atoms=3),
    ]
    deck_kw.setdefault("cutoff", 6.5)
    deck_kw.setdefault("tol", 1e-5)
    deck_kw.setdefault("probs", (0.25, 0.15, 0.4, 0.2))
    _write_deck(f"{outdir}/input.maniac", residues, **deck_kw)
    _write_inc(f"{outdir}/parameters.inc",
               [(1, 1, 0.22, 3.0), (2, 2, EPS_O, SIG_O),
                (3, 3, 0.0, 0.0), (4, 4, 0.0, 0.0),
                (5, 5, 0.195, 3.75), (6, 6, 0.17, 3.02), (7, 7, 0.0, 0.0)])
    return outdir


def tiny_system(outdir, shape: str):
    """Tiny instance of each distinct execution regime the engine serves -
    used by the multi-chip dryrun (__graft_entry__.dryrun_multichip) and
    the sharded-program HLO tests: flagship (framework + single active
    species, fw-split eligible), mixed (framework + TWO active species
    incl. swap moves), resv (reservoir insertions), tricl (27-image
    triclinic min-image). Returns (deck, data, inc, reservoir-or-None)
    file paths."""
    res_file = None
    if shape == "flagship":
        make_zif_like(outdir, n_cells=2, a=5.66, atoms_per_cell=4,
                      n_water=4, cutoff=5.0, tol=1e-3)
    elif shape == "mixed":
        make_framework_mixed(outdir, n_cells=2, a=5.66, n_water=3,
                             n_dimer=2, cutoff=5.0, tol=1e-3,
                             probs=(0.25, 0.15, 0.4, 0.2))
    elif shape == "resv":
        make_water_box(outdir, n_water=4, L=12.0, cutoff=5.0, tol=1e-3,
                       probs=(0.3, 0.2, 0.5, 0.0), fugacity=2000.0)
        res_file = make_water_reservoir(outdir, n_water=8, L=12.0)
    elif shape == "tricl":
        make_triclinic_water(outdir, n_water=4, L=12.0, tilt=(1.2, 0.8, 0.5),
                             cutoff=4.5, tol=1e-3,
                             probs=(0.3, 0.2, 0.5, 0.0), fugacity=2000.0)
    else:
        raise ValueError(f"unknown tiny system shape: {shape}")
    return (f"{outdir}/input.maniac", f"{outdir}/topology.data",
            f"{outdir}/parameters.inc", res_file)
