"""
Chemical-system tests.  Interaction orderings mirror the reference
fixtures (reference tests/test_composition.py); fitted-model files
depend on these orderings.
"""

import numpy as np

from uf3_tpu.data import composition
from uf3_tpu.data.atoms import Atoms
from uf3_tpu.data.composition import ChemicalSystem


def test_unary_degree2():
    cs = ChemicalSystem(["W"])
    assert cs.element_list == ("W",)
    assert cs.interactions_map[2] == [("W", "W")]
    assert cs.interactions == ["W", ("W", "W")]


def test_binary_ordering():
    cs = ChemicalSystem(["Xe", "Ne"])  # unsorted input
    assert cs.element_list == ("Ne", "Xe")
    assert cs.interactions_map[2] == [("Ne", "Ne"), ("Ne", "Xe"),
                                      ("Xe", "Xe")]


def test_ternary_degree3():
    cs = ChemicalSystem(["Al", "Cu", "Zr"], degree=3)
    assert cs.element_list == ("Al", "Cu", "Zr")
    assert cs.interactions_map[2] == [
        ("Al", "Al"), ("Al", "Cu"), ("Al", "Zr"),
        ("Cu", "Cu"), ("Cu", "Zr"), ("Zr", "Zr")]
    trios = cs.interactions_map[3]
    # center fixed first, neighbors sorted; lexicographic by order key
    assert trios[0] == ("Al", "Al", "Al")
    assert ("Al", "Cu", "Zr") in trios
    assert ("Cu", "Al", "Zr") in trios
    assert len(trios) == 3 * 6  # 3 centers x 6 neighbor multisets


def test_degree3_unary():
    cs = ChemicalSystem(["W"], degree=3)
    assert cs.interactions_map[3] == [("W", "W", "W")]
    assert cs.interactions == ["W", ("W", "W"), ("W", "W", "W")]


def test_szudzik_roundtrip():
    rng = np.random.RandomState(0)
    arr = rng.randint(1, 110, size=(50, 3))
    arr[:, 1:] = np.sort(arr[:, 1:], axis=1)
    hashes = composition.get_szudzik_hash(arr)
    unpacked = composition.unpack_szudzik_hash(hashes, 3)
    assert np.all(unpacked == arr)


def test_szudzik_pair_formula():
    # x > y: x^2 + y; x <= y: y^2 + x + y (reference composition.py:252-269)
    assert composition.szudzik_pair(np.array([[3, 2]]))[0] == 11
    assert composition.szudzik_pair(np.array([[2, 3]]))[0] == 14
    assert composition.szudzik_pair(np.array([[5, 5]]))[0] == 35


def test_interaction_hashes_sorted_neighbors():
    cs = ChemicalSystem(["Ne", "Xe"], degree=3)
    # hash of (Xe, Ne, Xe) must sort neighbors ascending: (54, 10, 54)
    trio = ("Xe", "Ne", "Xe")
    idx = cs.interactions_map[3].index(trio)
    manual = composition.get_szudzik_hash(np.array([[54, 10, 54]]))[0]
    assert cs.interaction_hashes[3][idx] == manual


def test_composition_tuple():
    cs = ChemicalSystem(["Ne", "Xe"])
    geom = Atoms("NeXeXe", positions=np.zeros((3, 3)))
    counts = cs.get_composition_tuple(geom)
    assert list(counts) == [1, 2]


def test_sort_interaction_symbols_center_fixed():
    out = composition.sort_interaction_symbols(("Si", "N", "H"))
    assert out == ("Si", "H", "N")
    out2 = composition.sort_interaction_symbols(("Si", "N"))
    assert out2 == ("N", "Si")
