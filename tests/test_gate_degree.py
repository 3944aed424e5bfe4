"""Gate soundness-degree tests (reference: the `test_gate_low_degree!`
macro, src/gates/mod.rs:336-443).

The quotient construction evaluates every filtered gate constraint on the
8n-point domain and divides by Z_H; that is only sound if each filtered
constraint, as a polynomial composition of the wire/constant polynomials,
has algebraic degree <= 8 (QUOTIENT_POLYNOMIAL_DEGREE_MULTIPLIER + 1).

Mirroring the reference: sample random degree-(n-1) polynomials for every
constant/wire slot, low-degree-extend to a 16n-point domain, evaluate each
gate's filtered constraints pointwise, interpolate back, and assert every
coefficient above degree 8(n-1) vanishes.  (Local/right/below wires are
independent random polynomials -- more general than the protocol's shifted
evaluations of one polynomial, and the degree claim must still hold.)
Runs entirely on host ints.
"""

import numpy as np
import pytest

from plonky_tpu.circuit.gates import ALL_GATES, GateCtx
from plonky_tpu.circuit.algebra import HostAlgebra
from plonky_tpu.circuit.target import NUM_CONSTANTS, NUM_WIRES
from plonky_tpu.curves import TWEEDLEDEE, TWEEDLEDUM
from plonky_tpu.fields import host as fhost

N_SMALL = 4          # degree of the sampled polynomials is < N_SMALL
EXTENDED = 16 * N_SMALL
MAX_DEGREE = 8 * (N_SMALL - 1)


def _eval_poly(coeffs, x, p):
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % p
    return acc


def _interpolate(values, xs, n_inv, g_inv, p):
    """Inverse DFT over the order-len(values) subgroup (O(n^2) host)."""
    n = len(values)
    coeffs = []
    for j in range(n):
        wj = pow(g_inv, j, p)
        acc = 0
        w = 1
        for v in values:
            acc = (acc + v * w) % p
            w = w * wj % p
        coeffs.append(acc * n_inv % p)
    return coeffs


@pytest.mark.parametrize("gate", ALL_GATES, ids=lambda g: g.NAME)
def test_gate_constraints_low_degree(gate):
    spec = TWEEDLEDEE.scalar
    p = spec.p
    alg = HostAlgebra(spec)
    ctx = GateCtx(spec, TWEEDLEDUM)
    rng = np.random.default_rng(hash(gate.NAME) % (1 << 32))

    def rand_poly():
        return [int.from_bytes(rng.bytes(40), "little") % p
                for _ in range(N_SMALL)]

    const_polys = [rand_poly() for _ in range(NUM_CONSTANTS)]
    local_polys = [rand_poly() for _ in range(NUM_WIRES)]
    right_polys = [rand_poly() for _ in range(NUM_WIRES)]
    below_polys = [rand_poly() for _ in range(NUM_WIRES)]

    g = fhost.primitive_root_of_unity(spec, EXTENDED.bit_length() - 1)
    g_inv = pow(g, -1, p)
    n_inv = pow(EXTENDED, -1, p)
    xs = fhost.cyclic_subgroup_known_order(spec, g, EXTENDED)

    per_point = []
    for x in xs:
        consts = [_eval_poly(c, x, p) for c in const_polys]
        local = [_eval_poly(c, x, p) for c in local_polys]
        right = [_eval_poly(c, x, p) for c in right_polys]
        below = [_eval_poly(c, x, p) for c in below_polys]
        per_point.append(gate.evaluate_filtered(alg, ctx, consts, local,
                                                right, below))

    n_constraints = len(per_point[0])
    assert n_constraints > 0 or gate.NAME == "BufferGate"
    for k in range(n_constraints):
        values = [pp[k] for pp in per_point]
        coeffs = _interpolate(values, xs, n_inv, g_inv, p)
        for d in range(MAX_DEGREE + 1, EXTENDED):
            assert coeffs[d] == 0, (
                f"{gate.NAME} constraint {k} has degree > 8: nonzero "
                f"coefficient at degree {d}")
