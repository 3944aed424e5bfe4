"""Copy-constraint partitions and the sigma permutation
(reference: src/partition.rs).

The partition list ORDER is semantic: a wire's "neighbor" is the next wire in
its partition list (wrapping), and sigma is built from neighbors, so merge
order must match the reference exactly (merge appends a's list onto b's).
"""

from __future__ import annotations

from typing import Dict, List

from ..fields import host as fhost
from ..fields.spec import FieldSpec
from ..hashing.chacha import ChaCha8Rng
from .target import NUM_ROUTED_WIRES, NUM_WIRES, Wire


class TargetPartitions:
    def __init__(self):
        self.partitions: List[List[object]] = []
        self.indices: Dict[object, int] = {}

    def get_partition(self, target):
        return self.partitions[self.indices[target]]

    def add_partition(self, target):
        self.indices[target] = len(self.partitions)
        self.partitions.append([target])

    def merge(self, a, b):
        """Append a's partition onto b's (reference: partition.rs:37-52)."""
        a_index = self.indices[a]
        b_index = self.indices[b]
        if a_index != b_index:
            a_partition = self.partitions[a_index]
            for sibling in a_partition:
                self.indices[sibling] = b_index
            self.partitions[b_index].extend(a_partition)
            self.partitions[a_index] = []

    def to_wire_partitions(self) -> "WirePartitions":
        partitions = []
        indices = {}
        for old in self.partitions:
            partitions.append([t for t in old if isinstance(t, Wire)])
        for target, index in self.indices.items():
            if isinstance(target, Wire):
                indices[target] = index
        wp = WirePartitions(partitions, indices)
        wp.assert_valid()
        return wp


class WirePartitions:
    def __init__(self, partitions, indices):
        self.partitions = partitions
        self.indices = indices
        # position of each wire within its partition, for O(1) neighbor lookup
        self._pos = {}
        for part in self.partitions:
            for i, w in enumerate(part):
                self._pos[w] = i

    def assert_valid(self):
        for part in self.partitions:
            for w in part:
                if w.input >= NUM_ROUTED_WIRES:
                    assert len(part) == 1, \
                        "Non-routed wires should not share a partition"

    def get_neighbor(self, wire: Wire) -> Wire:
        part = self.partitions[self.indices[wire]]
        i = self._pos[wire]
        return part[(i + 1) % len(part)]

    def to_sigma(self) -> List[int]:
        """sigma: [6n] -> [6n] (reference: partition.rs:120-136)."""
        num_gates = len(self.indices) // NUM_WIRES
        sigma = []
        for inp in range(NUM_ROUTED_WIRES):
            for gate in range(num_gates):
                nb = self.get_neighbor(Wire(gate, inp))
                sigma.append(nb.input * num_gates + nb.gate)
        return sigma


def get_subgroup_shift(spec: FieldSpec, i: int) -> int:
    """k_i: ChaCha8(seed=i)-derived coset shift (reference: partition.rs:140-154)."""
    rng = ChaCha8Rng.seed_from_u64(i)
    return fhost.rand_from_rng(spec, rng)


def sigma_values_host(spec: FieldSpec, sigma, degree: int,
                      subgroup_generator: int):
    """sigma indices -> field values: k_{x//n} * g^(x%n), chunked per wire
    (reference: src/plonk_util.rs:264-280 sigma_polynomials)."""
    p = spec.p
    shifts = [get_subgroup_shift(spec, i) for i in range(NUM_ROUTED_WIRES)]
    # precompute g powers
    powers = [1] * degree
    for j in range(1, degree):
        powers[j] = powers[j - 1] * subgroup_generator % p
    out = []
    for c in range(0, len(sigma), degree):
        chunk = sigma[c:c + degree]
        out.append([shifts[x // degree] * powers[x % degree] % p for x in chunk])
    return out
