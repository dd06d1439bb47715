"""Value algebras for the three AIR evaluation modes.

An AIR's ``eval`` is written once against python operators and runs over three
interchangeable value domains (the TPU answer to p3's generic ``AirBuilder``
with ``SymbolicExpression`` / packed-field / extension-field variables,
consumed by the reference at ``/root/reference/native/src/fib_air.rs:226-264``):

* ``SymVal``     — degree-tracking symbolic pass (constraint counting and
  quotient-degree sizing; degrees are in *multiples of n*, the p3
  ``degree_multiple`` convention).
* ``DevVal``     — base-field jnp uint32 Monty arrays over the quotient
  evaluation domain (the vectorized prover pass; whole-domain VPU ops).
* ``HostExtVal`` — BabyBear^4 python tuples at the out-of-domain point zeta
  (the verifier pass; canonical ints).
"""

from __future__ import annotations

import dataclasses
from typing import Tuple

import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import extension as ext4
from ..fields import ref_field as rf


@dataclasses.dataclass(frozen=True)
class SymVal:
    """Degree in multiples of the trace length n (p3 degree_multiple)."""

    degree: int

    def _coerce(self, other) -> "SymVal":
        return other if isinstance(other, SymVal) else SymVal(0)

    def __add__(self, other):
        return SymVal(max(self.degree, self._coerce(other).degree))

    __radd__ = __add__
    __sub__ = __add__
    __rsub__ = __add__

    def __mul__(self, other):
        return SymVal(self.degree + self._coerce(other).degree)

    __rmul__ = __mul__

    def __neg__(self):
        return self


class DevVal:
    """Base-field value vector over the evaluation domain (Monty uint32)."""

    __array_priority__ = 100  # our operators win over jnp's

    def __init__(self, arr: jnp.ndarray):
        self.arr = arr

    def _coerce(self, other) -> "DevVal":
        if isinstance(other, DevVal):
            return other
        if isinstance(other, int):
            return DevVal(bb.monty_scalar(other))
        raise TypeError(f"cannot mix {type(other)} into DevVal")

    def __add__(self, other):
        return DevVal(bb.add(self.arr, self._coerce(other).arr))

    __radd__ = __add__

    def __sub__(self, other):
        return DevVal(bb.sub(self.arr, self._coerce(other).arr))

    def __rsub__(self, other):
        return DevVal(bb.sub(self._coerce(other).arr, self.arr))

    def __mul__(self, other):
        return DevVal(bb.mul(self.arr, self._coerce(other).arr))

    __rmul__ = __mul__

    def __neg__(self):
        return DevVal(bb.neg(self.arr))


class HostExtVal:
    """BabyBear^4 scalar (canonical-int tuple) for the verifier at zeta."""

    def __init__(self, coeffs: Tuple[int, int, int, int]):
        self.c = tuple(int(x) % bb.P for x in coeffs)

    @classmethod
    def from_base(cls, x: int) -> "HostExtVal":
        return cls((x, 0, 0, 0))

    def _coerce(self, other) -> "HostExtVal":
        if isinstance(other, HostExtVal):
            return other
        if isinstance(other, int):
            return HostExtVal.from_base(other)
        raise TypeError(f"cannot mix {type(other)} into HostExtVal")

    def __add__(self, other):
        return HostExtVal(rf.eadd(self.c, self._coerce(other).c))

    __radd__ = __add__

    def __sub__(self, other):
        return HostExtVal(rf.esub(self.c, self._coerce(other).c))

    def __rsub__(self, other):
        return HostExtVal(rf.esub(self._coerce(other).c, self.c))

    def __mul__(self, other):
        return HostExtVal(rf.emul(self.c, self._coerce(other).c))

    __rmul__ = __mul__

    def __neg__(self):
        return HostExtVal(tuple((-x) % bb.P for x in self.c))
