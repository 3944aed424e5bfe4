"""Evaluation algebras for gate constraints.

Each gate's constraints are written ONCE against this interface and then
instantiated in three modes (the reference writes each gate twice --
`evaluate_unfiltered` natively and `..._recursively` in-circuit, reference:
src/gates/mod.rs:318-332; we add a third, batched-device mode used by the
prover's vanishing-polynomial evaluation over all 8n points, SURVEY.md P4):

* HostAlgebra    -- python ints mod p (verifier's scalar evaluation at zeta)
* BatchAlgebra   -- digit arrays [D, 8n] on device (prover)
* BuilderAlgebra -- circuit targets (recursive verification circuit)
"""

from __future__ import annotations

from ..fields import ops as fops
from ..fields.spec import FieldSpec


class HostAlgebra:
    def __init__(self, spec: FieldSpec):
        self.p = spec.p

    def constant(self, c: int):
        return c % self.p

    def add(self, a, b):
        return (a + b) % self.p

    def sub(self, a, b):
        return (a - b) % self.p

    def mul(self, a, b):
        return a * b % self.p

    def mul_const(self, c: int, a):
        return c * a % self.p

    def zero(self):
        return 0

    def one(self):
        return 1


class BatchAlgebra:
    """Digit-vector algebra over a trailing batch.  Uses the lazy
    bound-threaded ops: values are (arr, digit_bound) pairs, multiplications
    fuse the pending carries (fops.product_sum)."""

    def __init__(self, spec: FieldSpec, batch=()):
        self.spec = spec
        self.batch = batch

    def wrap(self, arr):
        return (arr, fops.WORK_DB)

    def unwrap(self, v):
        arr, db = v
        if db > fops.WORK_DB:
            from ..fields.ops import _value_bound_of_digits, reduce_work
            arr = reduce_work(self.spec, arr, db,
                              _value_bound_of_digits(arr.shape[0], db))
        return arr

    def constant(self, c: int):
        return (fops.constant(self.spec, c % self.spec.p, self.batch), 255)

    def add(self, a, b):
        return (fops.add_raw(a[0], b[0]), a[1] + b[1])

    def sub(self, a, b):
        return (fops.sub_raw(self.spec, a[0], b[0], b[1]),
                fops.sub_bound(a[1], b[1]))

    def mul(self, a, b):
        return (fops.product_sum(self.spec, [(a[0], a[1], b[0], b[1], 1)]),
                fops.WORK_DB)

    def mul_const(self, c: int, a):
        c = c % self.spec.p
        if c < (1 << 11):
            return (a[0] * c, a[1] * c)
        return self.mul(self.constant(c), a)

    def zero(self):
        return (fops.zeros(self.spec, self.batch), 0)

    def one(self):
        return self.constant(1)


class BuilderAlgebra:
    """Emits circuit gates; values are Targets.  Used to build the
    recursive verification circuit (reference's `_recursively` methods)."""

    def __init__(self, builder):
        self.builder = builder

    def constant(self, c: int):
        return self.builder.constant_wire(c)

    def add(self, a, b):
        return self.builder.add(a, b)

    def sub(self, a, b):
        return self.builder.sub(a, b)

    def mul(self, a, b):
        return self.builder.mul(a, b)

    def mul_const(self, c: int, a):
        return self.builder.mul(self.builder.constant_wire(c), a)

    def zero(self):
        return self.builder.zero_wire()

    def one(self):
        return self.builder.one_wire()
