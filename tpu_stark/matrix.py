"""Row-major matrix conventions and bit-reversal utilities.

TPU-native equivalent of ``p3-matrix`` as used by the reference
(``RowMajorMatrix`` / ``reverse_matrix_index_bits`` at
``/root/reference/native/src/fib_air.rs:13-14`` and
``backend_vulkan.rs:6,2045``; host-side DIT bit-reversal at
``backend_vulkan.rs:998-1026``).

Convention (same as the reference): a trace/evaluation matrix is a 2-D uint32
array with **rows = domain points, columns = polynomials** (trace columns).

Bit-reversal is expressed as reshape→transpose→reshape, which XLA lowers to a
layout change rather than a gather — the TPU answer to the reference doing the
permutation on the host CPU into a staging buffer.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


def log2_strict(n: int) -> int:
    b = n.bit_length() - 1
    if n <= 0 or (1 << b) != n:
        raise ValueError(f"size {n} is not a power of two")
    return b


@functools.lru_cache(maxsize=None)
def bit_reversal_perm(log_n: int) -> np.ndarray:
    """Permutation p with p[i] = bit-reverse of i over log_n bits."""
    n = 1 << log_n
    idx = np.arange(n, dtype=np.uint32)
    rev = np.zeros(n, dtype=np.uint32)
    for b in range(log_n):
        rev |= ((idx >> b) & 1) << (log_n - 1 - b)
    return rev


def reverse_matrix_index_bits(mat: jnp.ndarray) -> jnp.ndarray:
    """Permute rows into bit-reversed order (p3 ``reverse_matrix_index_bits``).

    Involution: applying twice is the identity.
    """
    h = mat.shape[0]
    log_h = log2_strict(h)
    if log_h == 0:
        return mat
    # Decomposition: j = j1*n2 + j2  =>  rev(j) = rev_l2(j2)*n1 + rev_l1(j1),
    # so the permutation is two sqrt(h)-sized axis gathers around one square
    # transpose.  The previous rank-(log_h+1) (2,...,2) single-transpose form
    # compiled pathologically at scale (~8 min remote compile for (2^24, 2);
    # rank-27 at 2^26).
    l1 = log_h // 2
    l2 = log_h - l1
    n1, n2 = 1 << l1, 1 << l2
    p1 = jnp.asarray(bit_reversal_perm(l1).astype(np.int32))
    p2 = jnp.asarray(bit_reversal_perm(l2).astype(np.int32))
    m2 = mat.reshape((n2, n1) + mat.shape[1:])
    g = m2[p2][:, p1]  # axes (j2, j1, ...)
    return jnp.swapaxes(g, 0, 1).reshape(mat.shape)
