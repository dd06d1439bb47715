"""Two-adic multiplicative coset domains.

Rebuild of ``p3-commit``'s ``TwoAdicMultiplicativeCoset`` domain logic (the
PCS/uni-stark domain algebra behind every LDE and selector in the reference
pipeline, SURVEY.md par2.2 p3-commit row): disjoint quotient domains, domain
splitting for quotient chunks, Lagrange selectors, vanishing polynomials.

Device methods produce base-field vectors over a coset for the prover's
quotient pass; host methods evaluate the same quantities at an out-of-domain
extension point for the verifier.
"""

from __future__ import annotations

import dataclasses
from typing import List, Tuple

import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import ref_field as rf

ExtPoint = Tuple[int, int, int, int]  # canonical coefficients


def ext_from_base(x: int) -> ExtPoint:
    return (x % bb.P, 0, 0, 0)


@dataclasses.dataclass(frozen=True)
class TwoAdicCoset:
    """The coset ``shift * <g>`` with ``g = two_adic_generator(log_n)``."""

    log_n: int
    shift: int = 1

    @property
    def size(self) -> int:
        return 1 << self.log_n

    @property
    def gen(self) -> int:
        return bb.two_adic_generator(self.log_n)

    def first_point(self) -> int:
        return self.shift % bb.P

    def next_point_ext(self, zeta: ExtPoint) -> ExtPoint:
        return rf.escale(zeta, self.gen)

    def create_disjoint_domain(self, min_size: int) -> "TwoAdicCoset":
        """A coset disjoint from self, of the given size (shift multiplied by
        the field generator, p3 semantics)."""
        return TwoAdicCoset(
            (min_size - 1).bit_length(), (self.shift * bb.GENERATOR) % bb.P
        )

    def split_domains(self, k: int) -> List["TwoAdicCoset"]:
        """Split into k interleaved sub-cosets: chunk i holds points
        shift*G^i * <G^k> (pairs with evals[i::k])."""
        assert k & (k - 1) == 0
        logk = k.bit_length() - 1
        g = self.gen
        return [
            TwoAdicCoset(self.log_n - logk, (self.shift * pow(g, i, bb.P)) % bb.P)
            for i in range(k)
        ]

    # -- host (verifier) ---------------------------------------------------
    def vanishing_poly_at_point_ext(self, zeta: ExtPoint) -> ExtPoint:
        """Z(zeta) = (zeta / shift)^n - 1."""
        zs = rf.escale(zeta, rf.finv(self.shift))
        zn = rf.epow(zs, self.size)
        return rf.esub(zn, (1, 0, 0, 0))

    def selectors_at_point_ext(self, zeta: ExtPoint):
        """Lagrange selectors of this domain at an ext point (verifier side):
        is_first_row = Z/(zeta - shift), is_last_row = Z/(zeta - shift*g^-1),
        is_transition = zeta - shift*g^-1, inv_zeroifier = 1/Z."""
        z = self.vanishing_poly_at_point_ext(zeta)
        last_pt = (self.shift * rf.finv(self.gen)) % bb.P
        first = rf.emul(z, rf.einv(rf.esub(zeta, ext_from_base(self.shift))))
        last = rf.emul(z, rf.einv(rf.esub(zeta, ext_from_base(last_pt))))
        transition = rf.esub(zeta, ext_from_base(last_pt))
        return {
            "is_first_row": first,
            "is_last_row": last,
            "is_transition": transition,
            "inv_zeroifier": rf.einv(z),
        }

    # -- device (prover) ---------------------------------------------------
    def points_device(self) -> jnp.ndarray:
        """Natural-order points shift*g^i as a Monty device vector."""
        pts = bb.powers_monty(self.gen, self.size)
        return bb.mul(pts, bb.monty_scalar(self.shift))

    def selectors_on_coset_device(self, coset: "TwoAdicCoset"):
        """Selectors of *this* domain evaluated over every point of ``coset``
        (the quotient evaluation domain), as base Monty device vectors."""
        assert coset.log_n >= self.log_n and coset.shift != self.shift
        xs = coset.points_device()
        xs_over_shift = bb.mul(xs, bb.monty_scalar(rf.finv(self.shift)))
        zh = bb.sub(bb.pow_const(xs_over_shift, self.size),
                    bb.monty_ones(xs.shape))
        last_pt = (self.shift * rf.finv(self.gen)) % bb.P
        first = bb.mul(zh, bb.inv(bb.sub(xs, bb.monty_scalar(self.shift))))
        last = bb.mul(zh, bb.inv(bb.sub(xs, bb.monty_scalar(last_pt))))
        transition = bb.sub(xs, bb.monty_scalar(last_pt))
        return {
            "is_first_row": first,
            "is_last_row": last,
            "is_transition": transition,
            "inv_zeroifier": bb.inv(zh),
        }
