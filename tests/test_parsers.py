"""Parser tests: deck, LAMMPS data, pair coefficients.

Includes black-box runs over the reference's own reader fixtures
(/root/reference/tests/readers) when that tree is present, mirroring the
reference CI contract: good inputs parse, bad inputs abort.
"""

import os

import numpy as np
import pytest

from maniac_tpu.io.deck import parse_deck
from maniac_tpu.io.lammps_data import parse_lammps_data
from maniac_tpu.io.pair_coeffs import parse_pair_coeffs
from maniac_tpu.utils.errors import ManiacError

from fixtures import make_lj_gas, make_water_box

REF = "/root/reference/tests/readers"


@pytest.fixture(scope="module")
def water_dir(tmp_path_factory):
    return make_water_box(str(tmp_path_factory.mktemp("water")), n_water=8)


def test_deck_basic(water_dir):
    deck = parse_deck(f"{water_dir}/input.maniac")
    assert deck.nb_block == 1 and deck.nb_step == 0
    assert deck.temp_K == 300.0
    assert deck.seed == 12345
    assert deck.real_space_cutoff == 8.0
    assert len(deck.residues) == 1
    res = deck.residues[0]
    assert res.name == "wat" and res.active and res.nb_atoms == 4
    assert res.types == [1, 2, 3]
    assert abs(deck.proba.total() - 1.0) < 1e-12


def test_deck_rescaling(tmp_path):
    make_water_box(str(tmp_path), probs=(0.2, 0.2, 0.1, 0.0))
    deck = parse_deck(f"{tmp_path}/input.maniac")
    assert abs(deck.proba.total() - 1.0) < 1e-12
    assert abs(deck.proba.translation - 0.4) < 1e-12


def test_deck_swap_folded_with_one_active_species(tmp_path, capsys):
    """swap_proba with <2 active species folds into insertion/deletion
    with a warning (DIVERGENCES.md #23): the reference's dispatch sends
    that mass to insert/delete unconditionally (src/monte_carlo.f90:60),
    so the folded mix matches the reference, not a silent dead-draw."""
    from maniac_tpu.utils.logger import Logger
    make_water_box(str(tmp_path), probs=(0.3, 0.3, 0.2, 0.2))
    deck = parse_deck(f"{tmp_path}/input.maniac", Logger())
    assert deck.proba.swap == 0.0
    assert abs(deck.proba.insertion_deletion - 0.4) < 1e-12
    assert abs(deck.proba.total() - 1.0) < 1e-12
    assert "folding the probability into" in capsys.readouterr().out


def test_deck_swap_kept_with_two_active_species(tmp_path):
    make_lj_gas(str(tmp_path), two_species=True,
                probs=(0.3, 0.3, 0.2, 0.2))
    deck = parse_deck(f"{tmp_path}/input.maniac")
    assert abs(deck.proba.swap - 0.2) < 1e-12


def test_deck_missing_required(tmp_path):
    p = tmp_path / "bad.maniac"
    p.write_text("nb_block 1\nnb_step 1\ntranslation_proba 1.0\n")
    with pytest.raises(ManiacError):
        parse_deck(str(p))


def test_deck_negative_cutoff(tmp_path):
    make_water_box(str(tmp_path))
    text = (tmp_path / "input.maniac").read_text().replace(
        "real_space_cutoff 8.0", "real_space_cutoff -8.0")
    (tmp_path / "bad.maniac").write_text(text)
    with pytest.raises(ManiacError):
        parse_deck(str(tmp_path / "bad.maniac"))


def test_deck_active_without_fugacity(tmp_path):
    make_water_box(str(tmp_path))
    lines = (tmp_path / "input.maniac").read_text().splitlines()
    lines = [ln for ln in lines if "fugacity" not in ln]
    (tmp_path / "bad.maniac").write_text("\n".join(lines))
    with pytest.raises(ManiacError):
        parse_deck(str(tmp_path / "bad.maniac"))


def test_deck_residue_sorting(tmp_path):
    make_lj_gas(str(tmp_path), two_species=True)
    text = (tmp_path / "input.maniac").read_text()
    # swap declaration order; parser must sort back by min atom type
    a = text.index("begin_residue")
    head, blocks = text[:a], text[a:]
    first, rest = blocks.split("end_residue", 1)
    reordered = head + rest.lstrip("\n ") + "\n" + first + "end_residue\n"
    (tmp_path / "re.maniac").write_text(reordered)
    deck = parse_deck(str(tmp_path / "re.maniac"))
    assert [r.name for r in deck.residues] == ["lja", "ljb"]


def test_data_roundtrip(water_dir):
    deck = parse_deck(f"{water_dir}/input.maniac")
    parsed = parse_lammps_data(f"{water_dir}/topology.data", deck)
    assert parsed.num_atoms == 32
    assert parsed.n_mol == [8]
    assert parsed.mol_com[0].shape == (8, 3)
    assert parsed.site_offset[0].shape == (8, 4, 3)
    # charges template
    np.testing.assert_allclose(parsed.atom_charges[0],
                               [0.0, 0.5564, 0.5564, -1.1128])
    # absolute positions reconstruct (com is wrapped but box is centered and
    # molecules placed inside, so com == centroid here)
    with open(f"{water_dir}/topology.data") as fh:
        lines = [l.split() for l in fh if len(l.split()) == 10]
    ref_pos = np.array([[float(x) for x in l[4:7]] for l in lines])
    got = (parsed.mol_com[0][:, None, :] + parsed.site_offset[0]).reshape(-1, 3)
    np.testing.assert_allclose(got, ref_pos, atol=1e-9)


def test_data_pbc_repair(tmp_path):
    """A molecule straddling the boundary must be made whole."""
    make_water_box(str(tmp_path), n_water=1, L=10.0)
    # shift the molecule so it crosses +x boundary, wrap atoms individually
    deck = parse_deck(f"{tmp_path}/input.maniac")
    with open(f"{tmp_path}/topology.data") as fh:
        text = fh.read().splitlines()
    out = []
    for ln in text:
        toks = ln.split()
        if len(toks) == 10 and toks[0].isdigit():
            x = float(toks[4]) + 5.0   # push toward boundary
            x = ((x + 5.0) % 10.0) - 5.0  # wrap atom into box
            toks[4] = f"{x:.10f}"
            out.append(" ".join(toks))
        else:
            out.append(ln)
    (tmp_path / "wrapped.data").write_text("\n".join(out) + "\n")
    parsed = parse_lammps_data(f"{tmp_path}/wrapped.data", deck)
    # offsets must be small (whole molecule), not box-sized
    assert np.max(np.abs(parsed.site_offset[0])) < 2.0


def test_pair_coeffs_lorentz_berthelot(tmp_path):
    make_lj_gas(str(tmp_path), two_species=True)
    deck = parse_deck(f"{tmp_path}/input.maniac")
    parsed = parse_lammps_data(f"{tmp_path}/topology.data", deck)
    eps, sig = parse_pair_coeffs(f"{tmp_path}/parameters.inc", parsed)
    from maniac_tpu.constants import KB_KCALMOL
    np.testing.assert_allclose(eps[0][0][0, 0] * KB_KCALMOL, 0.2)
    np.testing.assert_allclose(sig[0][0][0, 0], 3.4)
    # LB cross terms
    np.testing.assert_allclose(sig[0][1][0, 0], 0.5 * (3.4 + 3.0))
    np.testing.assert_allclose(eps[0][1][0, 0] * KB_KCALMOL,
                               np.sqrt(0.2 * 0.3), rtol=1e-12)
    np.testing.assert_allclose(eps[1][0][0, 0], eps[0][1][0, 0])


# --------------------------------------------------------------------------
# black-box parity with the reference's own reader fixtures
# --------------------------------------------------------------------------

needs_ref = pytest.mark.skipif(not os.path.isdir(REF),
                               reason="reference fixtures not mounted")


@needs_ref
def test_reference_good_inputs():
    for name in ("good-input-01.maniac", "good-input-02.maniac"):
        deck = parse_deck(f"{REF}/inputs/{name}")
        assert deck.n_residue_types == 3
        assert deck.nb_block == 1
        # sorted by min atom type: zif(1..7), moh(8..11), wat(12..14)
        assert [r.name for r in deck.residues] == ["zif", "moh", "wat"] or \
               [r.name for r in deck.residues] == ["zif", "wat", "moh"]
        assert min(deck.residues[0].types) < min(deck.residues[1].types) \
            < min(deck.residues[2].types)


@needs_ref
@pytest.mark.parametrize("name", ["bad-input-02", "bad-input-03",
                                  "bad-input-04"])
def test_reference_bad_inputs(name):
    with pytest.raises(ManiacError):
        parse_deck(f"{REF}/inputs/{name}.maniac")


@needs_ref
def test_reference_bad_input_01_leading_space_accepted():
    """Divergence (DIVERGENCES.md #19): bad-input-01 differs from
    good-input-01 only by one leading space before a keyword. The reference
    rejects it (its parser requires keywords at column 1); we deliberately
    accept leading whitespace, so this deck parses identically to the good
    one."""
    deck = parse_deck(f"{REF}/inputs/bad-input-01.maniac")
    good = parse_deck(f"{REF}/inputs/good-input-01.maniac")
    assert deck.n_residue_types == good.n_residue_types == 3
    assert deck.proba.translation == good.proba.translation > 0


@needs_ref
def test_reference_good_data():
    deck = parse_deck(f"{REF}/data/input.maniac")
    for name in ("good-01.data", "good-02.data"):
        parsed = parse_lammps_data(f"{REF}/data/{name}", deck)
        assert parsed.num_atoms == 28
        assert sum(parsed.n_mol) == 7  # 3 methanol + 4 water


@needs_ref
@pytest.mark.parametrize("name", ["bad-01", "bad-02", "bad-03", "bad-04"])
def test_reference_bad_data(name):
    deck = parse_deck(f"{REF}/data/input.maniac")
    with pytest.raises(ManiacError):
        parse_lammps_data(f"{REF}/data/{name}.data", deck)


def test_parser_fuzz_clean_aborts(tmp_path):
    """Deterministic fuzz: mutated decks/data must either parse or raise
    a clean typed ManiacError - never an unhandled traceback (the
    reference's AbortRun contract, src/output_utils.f90:535-562). Each
    mutation class models a real corruption: dropped lines, scrambled
    tokens, number->text, truncation, binary junk."""
    import random

    from fixtures import make_water_box

    d = make_water_box(str(tmp_path / "sys"), n_water=4, L=12.0,
                       cutoff=5.0, tol=1e-3)
    deck_text = open(f"{d}/input.maniac").read()
    data_text = open(f"{d}/topology.data").read()
    rng = random.Random(7)

    def mutations(text):
        lines = text.splitlines(keepends=True)
        out = []
        for _ in range(20):                      # drop a random line
            i = rng.randrange(len(lines))
            out.append("".join(lines[:i] + lines[i + 1:]))
        for _ in range(20):                      # scramble one line's tokens
            i = rng.randrange(len(lines))
            toks = lines[i].split()
            rng.shuffle(toks)
            out.append("".join(lines[:i]) + " ".join(toks) + "\n"
                       + "".join(lines[i + 1:]))
        for _ in range(10):                      # replace a number with text
            out.append(text.replace(str(rng.randrange(1, 9)), "x", 1))
        for _ in range(10):                      # truncate
            out.append(text[:rng.randrange(1, len(text))])
        out.append("\x00\xff garbage \x01\n" * 5)
        return out

    ok = aborted = 0
    for mut in mutations(deck_text):
        open(f"{tmp_path}/fuzz.maniac", "w").write(mut)
        try:
            parse_deck(f"{tmp_path}/fuzz.maniac")
            ok += 1
        except ManiacError:
            aborted += 1                         # clean typed abort
    deck = parse_deck(f"{d}/input.maniac")
    for mut in mutations(data_text):
        open(f"{tmp_path}/fuzz.data", "w").write(mut)
        try:
            parse_lammps_data(f"{tmp_path}/fuzz.data", deck)
            ok += 1
        except ManiacError:
            aborted += 1
    # the fuzz classes are harsh: most mutations must be caught, and
    # every outcome must be one of the two contract cases above
    assert aborted > 40 and ok + aborted == 122, (ok, aborted)
