"""Plookup tests (reference: plookup/tests/plookup.rs): random subsets and
a small function table."""

import numpy as np
import pytest

import plonky_tpu.protocol.halo as halo_mod
from plonky_tpu.curves import TWEEDLEDEE
from plonky_tpu.plookup import Table, prove, sort_by, verify


@pytest.fixture(autouse=True)
def deterministic_randomness(monkeypatch):
    rng = np.random.default_rng(99)
    monkeypatch.setattr(halo_mod, "RANDOM_SOURCE",
                        lambda p: int.from_bytes(rng.bytes(40), "little") % p)
    yield


def test_sort_by():
    assert sort_by([5, 2, 1], [1, 2, 3, 4, 5]) == [1, 2, 5]


def test_plookup_subset():
    t = [1, 2, 3, 5, 7, 11, 13]
    f = [2, 2, 5, 11]
    proof = prove(TWEEDLEDEE, f, t)
    verify(TWEEDLEDEE, t, proof)


def test_plookup_not_subset_fails():
    t = [1, 2, 3]
    f = [4]
    with pytest.raises(Exception):
        proof = prove(TWEEDLEDEE, f, t)
        verify(TWEEDLEDEE, t, proof)


def test_plookup_table_function():
    spec = TWEEDLEDEE.scalar
    table = Table.from_function_cartesian(
        spec, lambda a, b: (a + b) % spec.p, [0, 1, 2, 3], arity=2)
    witness = [(1, 2, 3), (3, 3, 6), (0, 0, 0)]
    proof = table.prove_row(TWEEDLEDEE, witness)
    table.verify(TWEEDLEDEE, proof)
