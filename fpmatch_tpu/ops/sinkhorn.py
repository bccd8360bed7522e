"""Masked log-space Sinkhorn normalization, fixed shapes, single pair.

Behavioural contract follows the reference stack `src/model/sinkhorn.py:85-87`
→ `pygmtools.sinkhorn` (pytorch backend, log_forward): divide by tau, pad the
short side with dummy log-value -100 to make the problem square over
m = max(n1, n2), alternate row (even step) / column (odd step) logsumexp
normalization for `max_iter` steps, exponentiate, and zero the dummy region.
When n1 > n2 the reference transposes first; here that simply flips which axis
is normalized on even steps and where the dummy band lives — no data movement.

Everything is expressed on a static (S1, S2) padded matrix with dynamic counts
(n1, n2); `vmap` over the leading batch axis gives the batched op.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .masking import NEG_INF, masked_logsumexp

DUMMY_LOG = -100.0


def _normalize(log_s, region, axis):
    """One masked normalization sweep along `axis` (rows: axis=1 sums cols)."""
    log_sum = masked_logsumexp(log_s, region, axis=axis, keepdims=True)
    out = log_s - jnp.where(jnp.isfinite(log_sum), log_sum, 0.0)
    return jnp.where(region, out, NEG_INF)


@partial(jax.jit, static_argnames=("max_iter", "dummy_row"))
def sinkhorn(s: jnp.ndarray, n1, n2, *, tau: float = 1.0, max_iter: int = 10,
             dummy_row: bool = True) -> jnp.ndarray:
    """Doubly-stochastic normalization of the valid (n1, n2) block of `s`.

    :param s: (S1, S2) scores, garbage outside the valid block
    :param n1, n2: dynamic valid counts
    :return: (S1, S2) DS matrix, zero outside the valid block
    """
    s1, s2 = s.shape
    n1 = jnp.asarray(n1, jnp.int32)
    n2 = jnp.asarray(n2, jnp.int32)
    rows = jnp.arange(s1)[:, None]
    cols = jnp.arange(s2)[None, :]
    valid = (rows < n1) & (cols < n2)

    log_s = jnp.where(valid, s / tau, NEG_INF)

    orient_rows = n1 <= n2  # reference transposes when n1 > n2
    if dummy_row:
        # dummy band: extra rows n1..n2 (orient_rows) or extra cols n2..n1
        dummy_r = (rows >= n1) & (rows < n2) & (cols < n2)
        dummy_c = (cols >= n2) & (cols < n1) & (rows < n1)
        dummy = jnp.where(orient_rows, dummy_r, dummy_c)
        log_s = jnp.where(dummy, DUMMY_LOG, log_s)
        region = valid | dummy
    else:
        region = valid

    # The orientation (which axis the even step normalizes) is data-dependent
    # (orient_rows = n1 <= n2), and per-iteration lax.cond was the pathology
    # the round-4 trace exposed in soft_topk. A single hoisted cond would
    # still run BOTH branches under vmap (batched predicate => select of both
    # loops). Instead, on the square buckets every caller uses (S1 == S2),
    # transpose the flipped problems up front, always run the row-first loop
    # with ONE masked logsumexp per half-step, and transpose back — two
    # selects + transposes per call instead of doubling every normalization.
    if s1 == s2:
        flip = ~orient_rows
        ls = jnp.where(flip, log_s.T, log_s)
        reg = jnp.where(flip, region.T, region)

        def pair(_, x):
            return _normalize(_normalize(x, reg, axis=1), reg, axis=0)

        ls = jax.lax.fori_loop(0, max_iter // 2, pair, ls)
        if max_iter % 2:
            ls = _normalize(ls, reg, axis=1)
        log_s = jnp.where(flip, ls.T, ls)
    else:
        # rectangular pad: branch-free dual form (both axis norms + select)
        def half(ls, even):
            axis1 = _normalize(ls, region, axis=1)
            axis0 = _normalize(ls, region, axis=0)
            return jnp.where(even == orient_rows, axis1, axis0)

        def pair(_, ls):
            return half(half(ls, True), False)

        log_s = jax.lax.fori_loop(0, max_iter // 2, pair, log_s)
        if max_iter % 2:
            log_s = half(log_s, True)
    return jnp.where(valid, jnp.exp(log_s), 0.0)


def sinkhorn_batch(s, n1, n2, *, tau=1.0, max_iter=10, dummy_row=True):
    """vmapped sinkhorn over a leading batch axis."""
    fn = partial(sinkhorn, tau=tau, max_iter=max_iter, dummy_row=dummy_row)
    return jax.vmap(fn)(s, n1, n2)


def gumbel_sinkhorn(key, s, n1, n2, *, tau=1.0, max_iter=10, sample_num=5,
                    dummy_row=True):
    """Gumbel-Sinkhorn sampling (reference src/model/sinkhorn.py:172-235,
    Mena et al. ICLR'18): adds i.i.d. Gumbel noise to the scores and runs the
    masked Sinkhorn per sample. Returns (sample_num, S1, S2)."""
    import jax

    def sample(k):
        u = jax.random.uniform(k, s.shape, minval=1e-20, maxval=1.0)
        g = -jnp.log(-jnp.log(u))
        return sinkhorn(s + g, n1, n2, tau=tau, max_iter=max_iter,
                        dummy_row=dummy_row)

    keys = jax.random.split(key, sample_num)
    return jax.vmap(sample)(keys)
