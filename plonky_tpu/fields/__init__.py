from .spec import FieldSpec, DIGIT_BITS, DIGIT_BASE, DIGIT_MASK
from .instances import (
    ALL_FIELDS,
    BLS12_377_BASE,
    BLS12_377_SCALAR,
    Field,
    PALLAS_BASE,
    TWEEDLEDEE_BASE,
    TWEEDLEDUM_BASE,
    VESTA_BASE,
    get_field,
)
from . import host, ops
