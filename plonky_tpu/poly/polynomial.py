"""Polynomial operations in coefficient form (device).

TPU-native equivalents of the reference's `Polynomial<F>`
(reference: src/polynomial.rs): a polynomial is a digit array [D, ..., n]
with the coefficient axis last.  FFT-based multiplication, batched Horner /
inner-product evaluation, `divide_by_z_h` via the coset trick
(reference: src/polynomial.rs:330-380 -- on a coset s*H the vanishing
polynomial X^n - 1 depends only on the 8-periodic h^n, so the division is a
pointwise multiply by a precomputed inverse vector), and Newton-iteration
polynomial division (reference: src/polynomial.rs:262-327).
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..fields import host as fhost
from ..fields import ops as fops
from ..fields.spec import FieldSpec
from ..utils import log2_ceil
from .fft import FftPrecomputation, coset_fft, coset_ifft, fft, ifft, powers_device


def eval_at(spec: FieldSpec, coeffs: jnp.ndarray, point: int) -> jnp.ndarray:
    """Evaluate [D, ..., n] polynomials at a host scalar point: inner product
    with powers (reference `eval_from_power`: src/polynomial.rs:130)."""
    n = coeffs.shape[-1]
    pw = powers_device(spec, point, n)
    pwb = pw.reshape((spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (n,))
    prod = fops.mul(spec, coeffs, pwb)
    return fops.sum_reduce(spec, prod, prod.ndim - 2)


def mul_polys(spec: FieldSpec, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """FFT-based product (reference: src/polynomial.rs:208-227).
    Output length = len(a) + len(b) rounded to a power of two."""
    na, nb = a.shape[-1], b.shape[-1]
    n = 1 << log2_ceil(na + nb)
    pre = FftPrecomputation(spec, n)
    pad = lambda x, m: jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, m - x.shape[-1])])
    fa = fft(pre, pad(a, n))
    fb = fft(pre, pad(b, n))
    return ifft(pre, fops.mul(spec, fa, fb))


@functools.lru_cache(maxsize=None)
def _z_h_inverses_on_coset(spec: FieldSpec, n: int, big_n: int, shift: int):
    """1 / ((shift*h)^n - 1) for h in H_{big_n}, as a [D, big_n] constant."""
    p = spec.p
    g_big = fhost.primitive_root_of_unity(spec, log2_ceil(big_n))
    period = big_n // n
    s_n = pow(shift, n, p)
    vals = []
    h_n = 1
    g_n = pow(g_big, n, p)  # order `period`
    for _ in range(period):
        vals.append(pow((s_n * h_n - 1) % p, -1, p))
        h_n = h_n * g_n % p
    tiled = [vals[i % period] for i in range(big_n)]
    return np.stack([spec.to_digits(v) for v in tiled], axis=-1)


def divide_by_z_h(spec: FieldSpec, coeffs: jnp.ndarray, n: int) -> jnp.ndarray:
    """Divide a polynomial (exactly divisible) by Z_H = X^n - 1.

    Evaluate on the coset g*H_N (g = multiplicative group generator, N =
    len(coeffs)), multiply by precomputed 1/Z_H values, interpolate back.
    (reference: src/polynomial.rs:330-380)
    """
    N = coeffs.shape[-1]
    shift = spec.generator
    pre = FftPrecomputation(spec, N)
    values = coset_fft(pre, coeffs, shift)
    inv = jnp.asarray(_z_h_inverses_on_coset(spec, n, N, shift))
    invb = inv.reshape((spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (N,))
    return coset_ifft(pre, fops.mul(spec, values, invb), shift)


def poly_from_ints(spec: FieldSpec, coeffs) -> jnp.ndarray:
    return fops.from_ints(spec, coeffs)


def eval_host(spec: FieldSpec, coeffs, x: int) -> int:
    """Host Horner evaluation on python-int coefficients."""
    acc = 0
    for c in reversed(coeffs):
        acc = (acc * x + c) % spec.p
    return acc
