"""Soft top-k via Sinkhorn with 2-column marginals + greedy discretization.

Re-derivation of the reference's AFA top-k (src/model/soft_topk.py:8-77,
166-255) in fixed-shape masked form:

  * every valid score is embedded as a 2-vector of negated distances to the
    {min, max} anchors of its pair's score matrix;
  * a marginal-constrained Sinkhorn pushes row mass 1 per score and column
    mass [n1*n2 - k, k] over the two anchor channels;
  * the "match" channel, reshaped back to (n1, n2), is the soft top-k map.

The reference runs a data-dependent `while any(log_s > 0)` overshoot loop
after the fixed iterations (soft_topk.py:232-241). Here that becomes
`extra_iter` additional steps gated per-sample by the same predicate via
`jnp.where` — identical semantics up to the iteration cap, fully
differentiable, and static-shaped for XLA.

Instead of the reference's per-sample Python loops over a compact
(n1*n2, 2) tensor, we keep the (S1, S2, 2) layout with a validity mask; the
math is flattening-order invariant.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .masking import NEG_INF, masked_max, masked_min, rect_mask


def _row_norm(log_s, valid):
    """Normalize over the 2 anchor channels for each valid score (row marginal
    is 1, so log marginal contributes 0)."""
    log_sum = jax.nn.logsumexp(log_s, axis=-1, keepdims=True)
    out = log_s - jnp.where(jnp.isfinite(log_sum), log_sum, 0.0)
    out = jnp.where(jnp.isnan(out), NEG_INF, out)
    return jnp.where(valid[..., None], out, NEG_INF)


def _col_norm(log_s, valid, log_col_prob):
    """Normalize each anchor channel over all valid scores, then scale to the
    channel marginal [n1*n2 - k, k]."""
    masked = jnp.where(valid[..., None], log_s, NEG_INF)
    m = jnp.max(masked, axis=(0, 1), keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.where(valid[..., None], jnp.exp(masked - m_safe), 0.0),
                axis=(0, 1), keepdims=True)
    log_sum = jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-38)) + m_safe, NEG_INF)
    out = log_s - jnp.where(jnp.isfinite(log_sum), log_sum, 0.0)
    out = out + log_col_prob[None, None, :]
    out = jnp.where(jnp.isnan(out), NEG_INF, out)
    return jnp.where(valid[..., None], out, NEG_INF)


@partial(jax.jit, static_argnames=("max_iter", "extra_iter"))
def soft_topk(scores: jnp.ndarray, k, n1, n2, *, tau: float = 1.0,
              max_iter: int = 10, extra_iter: int = 6) -> jnp.ndarray:
    """Soft top-k map of one pair.

    :param scores: (S1, S2) similarity scores (e.g. Sinkhorn output)
    :param k: () float expected number of matches
    :param n1, n2: valid counts
    :return: (S1, S2) soft selection probabilities, zero outside valid block
    """
    s1, s2 = scores.shape
    valid = rect_mask(n1, n2, s1, s2)
    total = (n1 * n2).astype(scores.dtype)

    lo = masked_min(scores, valid)
    hi = masked_max(scores, valid)
    anchors = jnp.stack([lo, hi])                       # (2,)
    dist = -jnp.abs(scores[..., None] - anchors[None, None, :])  # (S1,S2,2)

    log_s = jnp.where(valid[..., None], dist / tau, NEG_INF)
    k = jnp.clip(k, 0.0, total)
    # clamp the marginals away from 0: log(0) = -inf poisons the backward
    # pass (0·inf → NaN) when k == 0 (imposter pairs train with gt_k = 0) or
    # k == total; exp(-46) underflows to 0 so forward behaviour is unchanged,
    # and the exact zero/one cases are restored by the postmask below.
    log_col_prob = jnp.log(jnp.maximum(
        jnp.stack([total - k, k]), 1e-20))

    def step(i, ls):
        return jax.lax.cond(
            (i % 2) == 0,
            lambda x: _row_norm(x, valid),
            lambda x: _col_norm(x, valid, log_col_prob),
            ls,
        )

    log_s = jax.lax.fori_loop(0, max_iter, step, log_s)

    # overshoot correction: keep alternating while any valid entry is > 0
    def extra(i, ls):
        overshoot = jnp.any(jnp.where(valid[..., None], ls, NEG_INF) > 0)
        upd = jax.lax.cond(
            ((max_iter + i) % 2) == 0,
            lambda x: _row_norm(x, valid),
            lambda x: _col_norm(x, valid, log_col_prob),
            ls,
        )
        return jnp.where(overshoot, upd, ls)

    log_s = jax.lax.fori_loop(0, extra_iter, extra, log_s)

    out = jnp.exp(log_s[..., 1])
    out = jnp.where(k > 0, out, 0.0)   # exact zero map when k == 0
    return jnp.where(valid, out, 0.0)


def soft_topk_batch(scores, ks, n1, n2, *, tau=1.0, max_iter=10, extra_iter=6):
    fn = partial(soft_topk, tau=tau, max_iter=max_iter, extra_iter=extra_iter)
    return jax.vmap(fn)(scores, ks, n1, n2)


@jax.jit
def greedy_perm(score_rank: jnp.ndarray, k, n1, n2) -> jnp.ndarray:
    """Greedy one-to-one match selection (reference soft_topk.py:56-77).

    Walks candidate cells in descending `score_rank` order, keeping a cell iff
    its row and column are both unused, until round(k) matches are kept.
    Sequential by nature → lax.while_loop over the sorted candidate list; the
    output is a hard 0/1 matrix wrapped in stop_gradient by callers.

    :param score_rank: (S1, S2) ranking scores (e.g. hungarian_mask * soft map)
    """
    s1, s2 = score_rank.shape
    valid = rect_mask(n1, n2, s1, s2)
    flat = jnp.where(valid, score_rank, NEG_INF).reshape(-1)
    order = jnp.argsort(-flat)
    k_round = jnp.round(k).astype(jnp.int32)

    def cond(state):
        t, matched, _, _, _ = state
        return (matched < k_round) & (t < s1 * s2)

    def body(state):
        t, matched, row_used, col_used, x = state
        idx = order[t]
        r = idx // s2
        c = idx % s2
        ok = (flat[idx] > NEG_INF) & (~row_used[r]) & (~col_used[c])
        x = jnp.where(ok, x.at[r, c].set(1.0), x)
        row_used = jnp.where(ok, row_used.at[r].set(True), row_used)
        col_used = jnp.where(ok, col_used.at[c].set(True), col_used)
        return t + 1, matched + ok.astype(jnp.int32), row_used, col_used, x

    init = (jnp.int32(0), jnp.int32(0),
            jnp.zeros((s1,), bool), jnp.zeros((s2,), bool),
            jnp.zeros((s1, s2), score_rank.dtype))
    *_, x = jax.lax.while_loop(cond, body, init)
    return x


def greedy_perm_batch(score_rank, ks, n1, n2):
    return jax.vmap(greedy_perm)(score_rank, ks, n1, n2)
