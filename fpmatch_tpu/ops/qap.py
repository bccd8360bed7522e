"""Classical QAP solving on the factorized association affinity.

The reference carries a QAP pathway (QAPDataset, gmdataset.py:530-560, fed
into the dense NGM branch): given raw affinity factors, solve
max vec(X)ᵀ K vec(X) subject to X being a (partial) permutation.

Here: RRWM-style power iteration with Sinkhorn reprojection, expressed
entirely through the factorized matvec — K is never materialized, so the same
code scales to edge-partitioned multi-chip K (pass an edge-sharded matvec).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .assoc import assoc_matvec
from .sinkhorn import sinkhorn


@partial(jax.jit, static_argnames=("iters", "sk_iter"))
def qap_power_sinkhorn(Kp, Ke, src1, dst1, src2, dst2, n1, n2, *,
                       iters: int = 20, sk_iter: int = 10,
                       tau: float = 0.05):
    """Soft QAP solution: spectral matching (Leordeanu-Hebert power
    iteration on the non-negative association affinity) followed by a
    sharpened Sinkhorn projection of the leading eigenvector onto the
    doubly-stochastic polytope. Returns the (S1, S2) soft assignment;
    discretize with hungarian/greedy.
    """
    s1 = Kp.shape[0]
    s2 = Kp.shape[1]
    valid = (jnp.arange(s1)[:, None] < n1) & (jnp.arange(s2)[None, :] < n2)
    x = jnp.where(valid, 1.0, 0.0)
    x = x / jnp.maximum(jnp.linalg.norm(x), 1e-12)

    def body(_, x):
        y = assoc_matvec(x[..., None], Kp, Ke, src1, dst1, src2, dst2)[..., 0]
        y = jnp.where(valid, y, 0.0)
        return y / jnp.maximum(jnp.linalg.norm(y), 1e-12)

    x = jax.lax.fori_loop(0, iters, body, x)
    # contrast-normalize the eigenvector before the bistochastic projection
    x = x / jnp.maximum(jnp.max(jnp.where(valid, x, 0.0)), 1e-12)
    return sinkhorn(x, n1, n2, tau=tau, max_iter=sk_iter, dummy_row=True)


def qap_objective(x, Kp, Ke, src1, dst1, src2, dst2):
    """vec(X)ᵀ K vec(X) (evaluation_metric.py:255-280 objective_score)."""
    y = assoc_matvec(x[..., None], Kp, Ke, src1, dst1, src2, dst2)[..., 0]
    return jnp.sum(x * y)
