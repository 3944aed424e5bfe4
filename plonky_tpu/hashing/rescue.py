"""Rescue permutation and sponge (host + device).

Behavioral parity with the reference (src/rescue.rs): width-4 sponge with
rate 3, rounds = max(ceil(security_bits / (2*width)), 10), round constants
sampled from ChaCha8Rng seeded with 1337 exactly as `generate_rescue_constants`
does (reference: src/rescue.rs:97-121).

Two implementations:
* host (python ints)  -- used by the sequential Fiat-Shamir challenger.
* device (digit vectors, batched over trailing axes) -- used for bulk hashing
  benchmarks and for in-circuit Rescue witness generation.  The inverse S-box
  x^(1/alpha) is a fixed-exponent chain; MDS is a small constant matrix
  combination (width 4), unrolled into madds.
"""

from __future__ import annotations

import functools

from ..fields import host, ops
from ..fields.spec import FieldSpec
from .chacha import ChaCha8Rng

RESCUE_SPONGE_WIDTH = 4
RESCUE_SPONGE_RATE = 3


def recommended_rounds(width: int, security_bits: int) -> int:
    """reference: src/rescue.rs:123-125."""
    return max(-(-security_bits // (2 * width)), 10)


@functools.lru_cache(maxsize=None)
def mds_matrix(spec: FieldSpec, n: int):
    """Cauchy MDS matrix: entry (r, c) = 1/(x_r - y_c), x_r = n+r, y_c = c.
    (reference: src/mds.rs:63-77)"""
    p = spec.p
    return tuple(
        tuple(pow((n + r - c) % p, -1, p) for c in range(n))
        for r in range(n)
    )


@functools.lru_cache(maxsize=None)
def rescue_constants(spec: FieldSpec, width: int, security_bits: int):
    """Round constants, identical to the reference's ChaCha8(1337) stream
    (reference: src/rescue.rs:97-121)."""
    rng = ChaCha8Rng.seed_from_u64(1337)
    rounds = recommended_rounds(width, security_bits)
    out = []
    for _ in range(rounds):
        step_a = tuple(host.rand_from_rng(spec, rng) for _ in range(width))
        step_b = tuple(host.rand_from_rng(spec, rng) for _ in range(width))
        out.append((step_a, step_b))
    return tuple(out)


# ---------------------------------------------------------------------------
# Host implementation (python ints)
# ---------------------------------------------------------------------------

def _apply_mds_host(spec: FieldSpec, state):
    p = spec.p
    n = len(state)
    mds = mds_matrix(spec, n)
    return [sum(mds[r][c] * state[c] for c in range(n)) % p for r in range(n)]


def rescue_permutation_host(spec: FieldSpec, state, security_bits: int):
    """reference: src/rescue.rs:70-88."""
    p = spec.p
    state = list(state)
    inv_alpha = host.kth_root_exponent(spec, spec.alpha)
    for step_a_c, step_b_c in rescue_constants(spec, len(state), security_bits):
        state = [pow(x, inv_alpha, p) for x in state]
        state = _apply_mds_host(spec, state)
        state = [(x + c) % p for x, c in zip(state, step_a_c)]
        state = [pow(x, spec.alpha, p) for x in state]
        state = _apply_mds_host(spec, state)
        state = [(x + c) % p for x, c in zip(state, step_b_c)]
    return state


def rescue_sponge_host(spec: FieldSpec, inputs, num_outputs: int,
                       security_bits: int):
    """reference: src/rescue.rs:40-68."""
    rate, width = RESCUE_SPONGE_RATE, RESCUE_SPONGE_WIDTH
    state = [0] * width
    for i in range(0, len(inputs), rate):
        chunk = inputs[i:i + rate]
        for j, x in enumerate(chunk):
            state[j] = (state[j] + x) % spec.p
        state = rescue_permutation_host(spec, state, security_bits)
    outputs = []
    while True:
        for j in range(rate):
            outputs.append(state[j])
            if len(outputs) == num_outputs:
                return outputs
        state = rescue_permutation_host(spec, state, security_bits)


def rescue_hash_n_to_1_host(spec: FieldSpec, inputs, security_bits: int) -> int:
    return rescue_sponge_host(spec, inputs, 1, security_bits)[0]


# ---------------------------------------------------------------------------
# Device implementation (batched digit vectors)
# ---------------------------------------------------------------------------

def apply_mds(spec: FieldSpec, state):
    """state: list of width arrays [D, *batch].  Unrolled constant madds."""
    n = len(state)
    mds = mds_matrix(spec, n)
    out = []
    for r in range(n):
        acc = None
        for c in range(n):
            term = ops.mul(spec, ops.constant(spec, mds[r][c],
                                              state[c].shape[1:]), state[c])
            acc = term if acc is None else ops.add(spec, acc, term)
        out.append(acc)
    return out


def rescue_permutation(spec: FieldSpec, state, security_bits: int):
    """Batched Rescue permutation on device; state: width arrays [D,*batch]."""
    inv_alpha = host.kth_root_exponent(spec, spec.alpha)
    batch = state[0].shape[1:]
    for step_a_c, step_b_c in rescue_constants(spec, len(state), security_bits):
        state = [ops.exp_const(spec, x, inv_alpha) for x in state]
        state = apply_mds(spec, state)
        state = [ops.add(spec, x, ops.constant(spec, c, batch))
                 for x, c in zip(state, step_a_c)]
        state = [ops.exp_const(spec, x, spec.alpha) for x in state]
        state = apply_mds(spec, state)
        state = [ops.add(spec, x, ops.constant(spec, c, batch))
                 for x, c in zip(state, step_b_c)]
    return state
