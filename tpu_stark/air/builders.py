"""Concrete prover/verifier AIR builders.

* ``QuotientBuilder`` — the vectorized prover pass: constraints evaluated over
  every point of the quotient domain at once as base-field device vectors, and
  alpha-folded into an extension accumulator.  This is the TPU replacement for
  p3-uni-stark's ``quotient_values`` loop (SURVEY.md par3.1: "quotient eval over
  LDE domain"): no per-row loop, one fused XLA program over the whole domain.
* ``VerifierBuilder`` — the same constraints evaluated once at zeta on the
  host in BabyBear^4 (the verifier's ConstraintFolder mirror).
"""

from __future__ import annotations

from typing import List, Sequence

import jax.numpy as jnp

from ..fields import babybear as bb
from ..fields import extension as ext4
from ..fields import ref_field as rf
from .air import AirBuilder
from .values import DevVal, HostExtVal


class QuotientBuilder(AirBuilder):
    """Builder over the quotient evaluation domain (device, base field).

    Constraints are collected as base vectors and alpha-folded at the end
    against a device array of alpha powers — so the whole pass can run inside
    one traced/jitted program with alpha as data (OPT-0003)."""

    def __init__(
        self,
        main_local: jnp.ndarray,  # (m, w) Monty
        main_next: jnp.ndarray,  # (m, w) Monty
        selectors: dict,  # base device vectors over the domain
        public_values: Sequence[int],  # canonical ints
    ):
        m, w = main_local.shape
        self._mats = [main_local, main_next]
        super().__init__(
            main_rows=[
                [DevVal(main_local[:, c]) for c in range(w)],
                [DevVal(main_next[:, c]) for c in range(w)],
            ],
            is_first_row=DevVal(selectors["is_first_row"]),
            is_last_row=DevVal(selectors["is_last_row"]),
            is_transition=DevVal(selectors["is_transition"]),
            public_values=[
                p if isinstance(p, DevVal) else DevVal(bb.monty_scalar(int(p)))
                for p in public_values
            ],
        )
        self._constraints: List[jnp.ndarray] = []

    def main_cols(self, offset: int, indices):
        import numpy as np

        return DevVal(self._mats[offset][:, jnp.asarray(np.asarray(indices))])

    def _accumulate(self, x) -> None:
        arr = x.arr
        if arr.ndim == 1:
            arr = arr[:, None]
        self._constraints.append(arr)  # (m, k)

    FOLD_CHUNK = 64  # constraint columns combined per step (bounds peak
    # memory for very wide AIRs like keccak-air: K x m x 4 would not fit)

    def folded_constraints(self, alpha_pows: jnp.ndarray) -> jnp.ndarray:
        """sum_i alpha^i * C_i over the domain, ext-valued (m, 4);
        alpha_pows: (num_constraints, 4) Monty device array.  Vector entries
        consume consecutive alpha powers in column order."""
        m = self._constraints[0].shape[0]
        acc = ext4.zero((m,))
        off = 0
        pending: List[jnp.ndarray] = []
        pcols = 0

        def flush():
            nonlocal acc, off, pending, pcols
            if not pending:
                return
            stacked = jnp.concatenate(pending, axis=1)  # (m, K)
            prods = ext4.mul_base(
                alpha_pows[None, off : off + pcols, :], stacked
            )
            acc = ext4.add(acc, bb.sum_mod(prods, axis=1))
            off += pcols
            pending = []
            pcols = 0

        for arr in self._constraints:
            k = int(arr.shape[1])
            if pcols and pcols + k > self.FOLD_CHUNK:
                flush()
            if k >= self.FOLD_CHUNK:
                # split very wide entries directly
                for c0 in range(0, k, self.FOLD_CHUNK):
                    pending = [arr[:, c0 : c0 + self.FOLD_CHUNK]]
                    pcols = int(pending[0].shape[1])
                    flush()
            else:
                pending.append(arr)
                pcols += k
        flush()
        return acc


class VerifierBuilder(AirBuilder):
    """Builder at the out-of-domain point zeta (host, BabyBear^4)."""

    def __init__(
        self,
        opened_local: List[tuple],  # [w] ext values
        opened_next: List[tuple],
        selectors: dict,  # ext values at zeta
        public_values: Sequence[int],
        alpha: tuple,
    ):
        self._opened = [list(opened_local), list(opened_next)]
        super().__init__(
            main_rows=[
                [HostExtVal(v) for v in opened_local],
                [HostExtVal(v) for v in opened_next],
            ],
            is_first_row=HostExtVal(selectors["is_first_row"]),
            is_last_row=HostExtVal(selectors["is_last_row"]),
            is_transition=HostExtVal(selectors["is_transition"]),
            public_values=[HostExtVal.from_base(int(p)) for p in public_values],
        )
        self._alpha = tuple(alpha)
        self._alpha_pow = (1, 0, 0, 0)
        self._acc = (0, 0, 0, 0)

    def main_cols(self, offset: int, indices):
        from .values import HostExtVecVal

        return HostExtVecVal([self._opened[offset][i] for i in indices])

    def _accumulate(self, x) -> None:
        from .values import HostExtVecVal

        if isinstance(x, HostExtVecVal):
            for v in x.vals:
                self._acc = rf.eadd(self._acc, rf.emul(self._alpha_pow, v))
                self._alpha_pow = rf.emul(self._alpha_pow, self._alpha)
            return
        self._acc = rf.eadd(self._acc, rf.emul(self._alpha_pow, x.c))
        self._alpha_pow = rf.emul(self._alpha_pow, self._alpha)

    def folded_constraints(self) -> tuple:
        return self._acc
