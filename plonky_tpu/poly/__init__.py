from .fft import FftPrecomputation, coset_fft, coset_ifft, fft, ifft, powers_device
from .polynomial import (
    divide_by_z_h,
    eval_at,
    eval_host,
    mul_polys,
    poly_from_ints,
)
