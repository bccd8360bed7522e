"""Hungarian assignment via host callback.

The reference keeps the LAP solve on CPU too (utils/hungarian.py:8-65, scipy
`linear_sum_assignment` with a multiprocessing pool); here the host solve is
the native OpenMP-batched LAPJV solver (fpmatch_tpu.native, scipy fallback),
bridged through `jax.pure_callback` where the backend supports it. The axon
TPU runtime rejects host callbacks, so on TPU call `hungarian_host` directly
between jit segments. Non-differentiable by construction (the reference's is
too).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .. import native


def _hungarian_host(scores: np.ndarray, n1: np.ndarray, n2: np.ndarray
                    ) -> np.ndarray:
    scores = np.asarray(scores, dtype=np.float32)
    if scores.ndim == 2:
        return native.lap_maximize_batch(scores[None], np.atleast_1d(n1),
                                         np.atleast_1d(n2))
    return native.lap_maximize_batch(scores, np.asarray(n1), np.asarray(n2))


def hungarian_host(scores, n1, n2) -> np.ndarray:
    """Direct host-side entry (for TPU paths where callbacks are banned)."""
    return _hungarian_host(np.asarray(scores), np.asarray(n1),
                           np.asarray(n2))


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
