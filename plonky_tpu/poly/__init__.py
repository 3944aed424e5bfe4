from .fft import (FftPrecomputation, coset_fft, coset_ifft, fft, ifft, lde,
                  powers_device, powers_dyn)
from .polynomial import (
    divide_by_z_h,
    eval_at,
    eval_at_dyn,
    eval_host,
    inv_mod_xn,
    mul_polys,
    poly_from_ints,
    polynomial_division,
)
