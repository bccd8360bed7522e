"""Hungarian assignment via host callback.

The reference keeps the LAP solve on CPU too (utils/hungarian.py:8-65, scipy
`linear_sum_assignment` with optional process fan-out); under XLA we bridge
through `jax.pure_callback`, batched on the host, keeping the device pipeline
static-shaped. Non-differentiable by construction (the reference's is too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from scipy.optimize import linear_sum_assignment


def _hungarian_host(scores: np.ndarray, n1: np.ndarray, n2: np.ndarray
                    ) -> np.ndarray:
    scores = np.asarray(scores, dtype=np.float32)
    out = np.zeros_like(scores)
    if scores.ndim == 2:
        scores, n1, n2 = scores[None], np.atleast_1d(n1), np.atleast_1d(n2)
        out = out[None]
    for b in range(scores.shape[0]):
        a, c = int(n1[b]), int(n2[b])
        if a == 0 or c == 0:
            continue
        r, col = linear_sum_assignment(-scores[b, :a, :c])
        out[b, r, col] = 1.0
    return out


def hungarian(scores: jnp.ndarray, n1: jnp.ndarray, n2: jnp.ndarray
              ) -> jnp.ndarray:
    """Batched maximum-score assignment on the valid blocks.

    :param scores: (B, S1, S2) or (S1, S2)
    :return: 0/1 assignment matrix of the same shape (stop-gradient)
    """
    squeeze = scores.ndim == 2
    if squeeze:
        scores = scores[None]
        n1 = jnp.atleast_1d(n1)
        n2 = jnp.atleast_1d(n2)
    result = jax.pure_callback(
        _hungarian_host,
        jax.ShapeDtypeStruct(scores.shape, jnp.float32),
        scores, n1, n2,
        vmap_method="sequential",
    )
    result = jax.lax.stop_gradient(result)
    return result[0] if squeeze else result
