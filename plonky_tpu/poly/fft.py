"""Batched radix-2 FFT over prime fields on device.

Replaces the reference's rayon-chunked butterfly loops
(reference: src/fft.rs:103-156) with layer-vectorized butterflies over the
whole domain: each of the log2(n) layers is ONE batched field multiply plus
an add/sub pair -- the natural TPU formulation (SURVEY.md P1).  Twiddle
tables are precomputed per (field, size) like the reference's
`FftPrecomputation` (src/fft.rs:28-59).

Supports leading poly-batch dims: values shaped [D, ..., n] with the domain
axis LAST (lanes).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..fields import host as fhost
from ..fields import ops as fops
from ..fields.spec import FieldSpec
from ..utils import log2_strict


@functools.lru_cache(maxsize=None)
class FftPrecomputation:
    """Twiddle tables for a size-n FFT over `spec` (n a power of two)."""

    def __init__(self, spec: FieldSpec, n: int):
        self.spec = spec
        self.n = n
        self.lg_n = log2_strict(n)
        self.g = fhost.primitive_root_of_unity(spec, self.lg_n)
        self.g_inv = pow(self.g, -1, spec.p)
        self.n_inv = pow(n, -1, spec.p)
        # Layer ell has half-size m = 2^ell and needs [w^(n/2m)^j, j < m].
        p = spec.p
        self.twiddles = []
        self.twiddles_inv = []
        for ell in range(self.lg_n):
            m = 1 << ell
            w = pow(self.g, n // (2 * m), p)
            wi = pow(self.g_inv, n // (2 * m), p)
            tw, twi, cw, cwi = [], [], 1, 1
            for _ in range(m):
                tw.append(cw)
                twi.append(cwi)
                cw = cw * w % p
                cwi = cwi * wi % p
            self.twiddles.append(np.asarray(
                np.stack([spec.to_digits(v) for v in tw], axis=-1)))
            self.twiddles_inv.append(np.asarray(
                np.stack([spec.to_digits(v) for v in twi], axis=-1)))
        # bit-reversal permutation
        idx = np.arange(n)
        rev = np.zeros(n, dtype=np.int64)
        for b in range(self.lg_n):
            rev |= ((idx >> b) & 1) << (self.lg_n - 1 - b)
        self.bit_rev = rev
        self.n_inv_digits = spec.to_digits(self.n_inv)

    def device_tables(self, inverse: bool = False):
        """Twiddles + bit-reversal as RUNTIME arrays for `fft(.., tables=)`.

        By default the tables are closed over and baked into the compiled
        program as constants -- compact and cache-friendly at small n, but
        at n = 2^22 they are ~512 MB and the serialized program exceeds
        the axon tunnel's remote-compile request limit (HTTP 413).
        Passing them as arguments keeps the program itself small; the
        tables travel once as device buffers."""
        tws = self.twiddles_inv if inverse else self.twiddles
        import jax.numpy as _jnp
        return ([_jnp.asarray(t) for t in tws], _jnp.asarray(self.bit_rev))

    def runtime_tables(self, inverse: bool = False):
        """device_tables flattened to one cached tuple, for threading as
        extra ARGUMENTS through jitted protocol graphs.

        Constant-baked twiddles made every FFT-bearing protocol program
        multi-MB ([D, n] digits per layer): at degree 2^14 the prover's
        first-call compiles totaled 2329 s on the axon remote compiler
        (round-5 measurement, job 100) -- dominated by uploading and
        processing those constants graph after graph -- and on CPU they
        were the >10 MB persistent-cache entries.  As runtime buffers the
        tables upload ONCE as device arrays and every program stays
        small."""
        key = bool(inverse)
        cache = self.__dict__.setdefault("_runtime_tables", {})
        if key not in cache:
            tws, rev = self.device_tables(inverse)
            cache[key] = (*tws, rev)
        return cache[key]

    @functools.cached_property
    def subgroup(self):
        """[1, g, g^2, ...] as python ints (host)."""
        return fhost.cyclic_subgroup_known_order(self.spec, self.g, self.n)


def _fft_core(pre: FftPrecomputation, x: jnp.ndarray, inverse: bool,
              tables=None) -> jnp.ndarray:
    spec, n = pre.spec, pre.n
    assert x.shape[-1] == n
    lead = x.shape[1:-1]
    tw_list = bit_rev = None
    if tables is not None:
        tw_list, bit_rev = tables
    x = x[..., pre.bit_rev if bit_rev is None else bit_rev]
    for ell in range(pre.lg_n):
        m = 1 << ell
        tw = (tw_list[ell] if tw_list is not None else
              jnp.asarray(pre.twiddles_inv[ell] if inverse
                          else pre.twiddles[ell]))
        # reshape domain axis: [.., n/(2m), 2, m]
        y = x.reshape(*x.shape[:-1], n // (2 * m), 2, m)
        even = y[..., 0, :]
        odd = y[..., 1, :]
        # broadcast twiddles [D, m] over [D, .., n/2m, m]
        twb = tw.reshape((spec.n_digits,) + (1,) * (even.ndim - 2) + (m,))

        def butterfly(ins):
            ev, od, tww = ins
            t_ = fops.mul(spec, od, tww)
            return [fops.add(spec, ev, t_), fops.sub(spec, ev, t_)]

        fused = fops.fused_elementwise(spec, butterfly, [even, odd, twb],
                                       n_outs=2)
        if fused is not None:
            out0, out1 = fused
        else:
            t = fops.mul(spec, odd, twb)
            out0 = fops.add(spec, even, t)
            out1 = fops.sub(spec, even, t)
        x = jnp.concatenate([out0[..., None, :], out1[..., None, :]],
                            axis=-2).reshape(*x.shape[:-1], n)
    if inverse:
        ninv = jnp.asarray(pre.n_inv_digits).reshape(
            (spec.n_digits,) + (1,) * (x.ndim - 1))
        x = fops.mul(spec, x, ninv)
    return x


def fft(pre: FftPrecomputation, coeffs: jnp.ndarray, tables=None) -> jnp.ndarray:
    """Coefficients -> evaluations over the order-n subgroup [g^0..g^(n-1)].

    `tables` (from `pre.device_tables()`) ships twiddles/bit-rev as runtime
    buffers instead of program constants -- required at n >= 2^21 where the
    constant form exceeds the remote-compile size limit."""
    return _fft_core(pre, coeffs, inverse=False, tables=tables)


def ifft(pre: FftPrecomputation, values: jnp.ndarray, tables=None) -> jnp.ndarray:
    """Evaluations -> coefficients (reference: src/fft.rs:82-101)."""
    return _fft_core(pre, values, inverse=True, tables=tables)


def _unflat_tables(pre: FftPrecomputation, flat):
    """Inverse of runtime_tables' flattening: ([tw_0..tw_{lg-1}], bit_rev)."""
    assert len(flat) == pre.lg_n + 1, (len(flat), pre.lg_n)
    return (list(flat[:pre.lg_n]), flat[pre.lg_n])


def fft_t(pre: FftPrecomputation, x: jnp.ndarray, *flat) -> jnp.ndarray:
    """fft with runtime tables passed FLAT (see runtime_tables)."""
    return _fft_core(pre, x, inverse=False, tables=_unflat_tables(pre, flat))


def ifft_t(pre: FftPrecomputation, x: jnp.ndarray, *flat) -> jnp.ndarray:
    return _fft_core(pre, x, inverse=True, tables=_unflat_tables(pre, flat))


def lde_t(pre: FftPrecomputation, coeffs: jnp.ndarray, *flat) -> jnp.ndarray:
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, pre.n - coeffs.shape[-1])]
    return fft_t(pre, jnp.pad(coeffs, pad), *flat)


def coset_fft_t(pre: FftPrecomputation, coeffs: jnp.ndarray, shift: int,
                *flat) -> jnp.ndarray:
    powers = powers_device(pre.spec, shift, pre.n)
    powb = powers.reshape(
        (pre.spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (pre.n,))
    return fft_t(pre, fops.mul(pre.spec, coeffs, powb), *flat)


def coset_ifft_t(pre: FftPrecomputation, values: jnp.ndarray, shift: int,
                 *flat) -> jnp.ndarray:
    coeffs = ifft_t(pre, values, *flat)
    powers = powers_device(pre.spec, pow(shift, -1, pre.spec.p), pre.n)
    powb = powers.reshape(
        (pre.spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (pre.n,))
    return fops.mul(pre.spec, coeffs, powb)


@functools.lru_cache(maxsize=None)
def _four_step_subpres(spec: FieldSpec, n: int, lg_n1: int):
    n1 = 1 << lg_n1
    return FftPrecomputation(spec, n1), FftPrecomputation(spec, n // n1)


@functools.lru_cache(maxsize=None)
def four_step_twiddles(spec: FieldSpec, n: int, lg_n1: int,
                       inverse: bool = False) -> jnp.ndarray:
    """The middle-stage twiddle table w_n^(+-i1*k2) as a [D, n1, n2] device
    buffer (cached: it is data-sized, so it must travel as a runtime buffer
    like FftPrecomputation.device_tables, not as program constants).

    Built ON DEVICE: host bases w_n^i1 for the n1 rows, then a doubling
    construction along k2 (~n field muls in lg(n2) batched steps) -- a
    Python-loop host build at n = 2^22 would take minutes."""
    n1 = 1 << lg_n1
    n2 = n // n1
    lg_n = log2_strict(n)
    g = fhost.primitive_root_of_unity(spec, lg_n)
    if inverse:
        g = pow(g, -1, spec.p)
    bases = powers_device(spec, g, n1)          # [D, n1]
    acc = fops.constant(spec, 1, (n1, 1))       # [D, n1, 1]
    top = bases[..., None]                      # invariant: top = base^width
    while acc.shape[-1] < n2:
        acc = jnp.concatenate([acc, fops.mul(spec, acc, top)], axis=-1)
        top = fops.square(spec, top)
    return jax.block_until_ready(acc[..., :n2])


def fft_four_step(spec: FieldSpec, x: jnp.ndarray, tw: jnp.ndarray,
                  lg_n1: int, inverse: bool = False,
                  tables2=None, tables1=None) -> jnp.ndarray:
    """Single-chip four-step FFT over a domain n = n1 * n2 (n1 = 2^lg_n1).

    The flat layer-vectorized FFT streams the full [D, n] array through HBM
    once per layer with stride patterns that degrade above VMEM (measured:
    6.4e7 butterflies/s at 2^18 vs 4.35e7 at 2^22).  The transpose
    factorization (same decimation as parallel/fft.py:fft_sharded_domain,
    reference: src/fft.rs:103-156) replaces the lg(n) full-size layers with
    two batched SMALL-domain stages whose butterflies never exceed n2 (resp.
    n1) lanes, plus one data-sized twiddle multiply and two transposes:

        X[k2 + n2*k1] = sum_i1 w_n1^(i1 k1) [ w_n^(i1 k2)
                        * (sum_i2 w_n2^(i2 k2) C[i1, i2]) ],
        C[i1, i2] = c[i1 + n1*i2].

    `tw` comes from `four_step_twiddles(spec, n, lg_n1, inverse)`; pass
    `inverse=True` for the inverse transform (sub-IFFTs contribute
    1/n1 * 1/n2 = 1/n, the twiddle table flips to negative powers)."""
    n = x.shape[-1]
    n1 = 1 << lg_n1
    n2 = n // n1
    assert n1 * n2 == n, (n, n1)
    pre1, pre2 = _four_step_subpres(spec, n, lg_n1)
    C = x.reshape(*x.shape[:-1], n2, n1)
    C = jnp.swapaxes(C, -1, -2)                       # [.., n1, n2]
    inner = _fft_core(pre2, C, inverse, tables=tables2)
    y = fops.mul(spec, inner, tw)
    yt = jnp.swapaxes(y, -1, -2)                      # [.., n2, n1]
    out = _fft_core(pre1, yt, inverse, tables=tables1)
    out = jnp.swapaxes(out, -1, -2)                   # [.., k1, k2]
    return out.reshape(*out.shape[:-2], n)


def powers_device(spec: FieldSpec, base: int, n: int) -> jnp.ndarray:
    """[base^0, .., base^(n-1)] as [D, n], computed with log2(n) batched muls."""
    lg = max(1, (n - 1).bit_length())
    sq = []
    cur = base % spec.p
    for _ in range(lg):
        sq.append(cur)
        cur = cur * cur % spec.p
    idx = jnp.arange(n, dtype=jnp.int32)
    acc = fops.constant(spec, 1, (n,))
    for j in range(lg):
        bit = (idx >> j) & 1
        acc = fops.select(bit, fops.mul(
            spec, acc, fops.constant(spec, sq[j], (n,))), acc)
    return acc


def powers_dyn(spec: FieldSpec, base_col: jnp.ndarray, n: int) -> jnp.ndarray:
    """[base^0 .. base^(n-1)] as [D, n] from a TRACED [D, 1] base.

    Unlike `powers_device` (host-int base baked into the graph as constants),
    this keeps the base a runtime input, so jits over it are reusable across
    proofs.  Doubling construction: ~n field muls in log2(n) batched steps.
    """
    acc = fops.constant(spec, 1, (1,))
    top = base_col  # invariant: top = base^(width of acc)
    while acc.shape[-1] < n:
        acc = jnp.concatenate([acc, fops.mul(spec, acc, top)], axis=-1)
        top = fops.square(spec, top)
    return acc[:, :n]


def lde(pre: FftPrecomputation, coeffs: jnp.ndarray) -> jnp.ndarray:
    """Zero-pad the coefficient axis to pre.n and FFT (the 8x low-degree
    extension; reference: src/plonk_util.rs:179-190)."""
    pad = [(0, 0)] * (coeffs.ndim - 1) + [(0, pre.n - coeffs.shape[-1])]
    return fft(pre, jnp.pad(coeffs, pad))


def coset_fft(pre: FftPrecomputation, coeffs: jnp.ndarray, shift: int) -> jnp.ndarray:
    """Evaluations over the coset shift*H: scale coeff i by shift^i, then FFT."""
    powers = powers_device(pre.spec, shift, pre.n)
    powb = powers.reshape((pre.spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (pre.n,))
    return fft(pre, fops.mul(pre.spec, coeffs, powb))


def coset_ifft(pre: FftPrecomputation, values: jnp.ndarray, shift: int) -> jnp.ndarray:
    coeffs = ifft(pre, values)
    powers = powers_device(pre.spec, pow(shift, -1, pre.spec.p), pre.n)
    powb = powers.reshape((pre.spec.n_digits,) + (1,) * (coeffs.ndim - 2) + (pre.n,))
    return fops.mul(pre.spec, coeffs, powb)
