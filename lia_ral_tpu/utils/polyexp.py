"""Order-3 polynomial feature expansion (GLDS kernel).

Equivalent of reference ``LIA_Utils/PolyExp`` (PolyExpand.cpp:65-83):
expansion = all degree-≤3 monomials with repetition over [1, f], in the
reference's exact i≤j≤k ordering; size (D+3)(D+2)(D+1)/6.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def poly_expansion_size(d: int) -> int:
    return (d + 3) * (d + 2) * (d + 1) // 6


def _index_triples(d: int) -> np.ndarray:
    base = d + 1
    out = []
    for i in range(base):
        for j in range(i, base):
            for k in range(j, base):
                out.append((i, j, k))
    return np.asarray(out, np.int32)


def poly_expand(x: jax.Array) -> jax.Array:
    """x (N, D) → (N, (D+3)(D+2)(D+1)/6) monomial expansion, batched.

    The reference writes the expansion in place over [1, f]
    (PolyExpand.cpp:73-80); that is value-preserving — every read hits
    slots 0..D which the i=0 pass rewrites identically (1·1·e_k) before
    any other slot is read — so this batched product over the original
    [1, f] equals the reference output element-for-element, in its exact
    i≤j≤k order.
    """
    n, d = x.shape
    aug = jnp.concatenate([jnp.ones((n, 1), x.dtype), x], axis=1)  # (N,D+1)
    trip = jnp.asarray(_index_triples(d))
    return aug[:, trip[:, 0]] * aug[:, trip[:, 1]] * aug[:, trip[:, 2]]


def glds_expand_mean(x: jax.Array, w: jax.Array) -> jax.Array:
    """Average expansion over selected frames — the GLDS supervector
    (reference computeAndAccumulateExpansion, PolyExpand.cpp:85-116)."""
    e = poly_expand(x)
    return jnp.sum(e * w[:, None], axis=0) / jnp.maximum(jnp.sum(w), 1e-30)
