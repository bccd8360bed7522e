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

    # the row/col alternation parity is STATIC (iteration index), so the
    # loop runs in (row; col) pair-steps with no per-iteration lax.cond —
    # the cond form showed up as its own multi-ms entry in the traced train
    # step (cond.202/cond.205, RESULTS.md round-4 trace)
    def pair(_, ls):
        return _col_norm(_row_norm(ls, valid), valid, log_col_prob)

    log_s = jax.lax.fori_loop(0, max_iter // 2, pair, log_s)
    if max_iter % 2:
        log_s = _row_norm(log_s, valid)
    odd_start = bool(max_iter % 2)

    # overshoot correction: keep alternating while any valid entry is > 0
    def gate(ls, upd):
        overshoot = jnp.any(jnp.where(valid[..., None], ls, NEG_INF) > 0)
        return jnp.where(overshoot, upd, ls)

    def extra_pair(_, ls):
        first = (_col_norm(ls, valid, log_col_prob) if odd_start
                 else _row_norm(ls, valid))
        ls = gate(ls, first)
        second = (_row_norm(ls, valid) if odd_start
                  else _col_norm(ls, valid, log_col_prob))
        return gate(ls, second)

    log_s = jax.lax.fori_loop(0, extra_iter // 2, extra_pair, log_s)
    if extra_iter % 2:
        log_s = gate(log_s, _col_norm(log_s, valid, log_col_prob)
                     if odd_start else _row_norm(log_s, valid))

    out = jnp.exp(log_s[..., 1])
    out = jnp.where(k > 0, out, 0.0)   # exact zero map when k == 0
    return jnp.where(valid, out, 0.0)


def soft_topk_batch(scores, ks, n1, n2, *, tau=1.0, max_iter=10, extra_iter=6):
    fn = partial(soft_topk, tau=tau, max_iter=max_iter, extra_iter=extra_iter)
    return jax.vmap(fn)(scores, ks, n1, n2)


@jax.jit
def greedy_perm(score_rank: jnp.ndarray, k, n1, n2) -> jnp.ndarray:
    """Greedy one-to-one match selection (reference soft_topk.py:56-77).

    The reference walks candidate cells in descending `score_rank` order,
    keeping a cell iff its row and column are both unused, until round(k)
    matches are kept. That walk is equivalent to repeatedly taking the
    GLOBAL argmax over cells whose row and column are still free (at every
    acceptance, the next accepted candidate is by definition the
    best-ranked free cell; ties resolve to the lowest flat index in both
    formulations) — which replaces the original data-dependent
    `while_loop` over up to S1·S2 sorted candidates with a FIXED
    min(S1, S2)-trip peeling loop of vectorized masked argmaxes.

    The while-loop form was the single most expensive op in the traced
    train step (9.3 ms of a 37.7 ms step at batch 8, n=64 — it runs one
    scalar candidate per iteration, thousands of iterations when k is
    large, and a vmapped while runs to the slowest element); the peeling
    form is static-shape, batch-uniform, and ~20x cheaper.

    :param score_rank: (S1, S2) ranking scores (e.g. hungarian_mask * soft map)
    """
    s1, s2 = score_rank.shape
    valid = rect_mask(n1, n2, s1, s2)
    flat0 = jnp.where(valid, score_rank, NEG_INF).reshape(-1)
    k_round = jnp.round(k).astype(jnp.int32)

    def body(i, state):
        flat, x = state
        idx = jnp.argmax(flat)
        r = idx // s2
        c = idx % s2
        ok = (i < k_round) & (flat[idx] > NEG_INF)
        x = jnp.where(ok, x.at[r, c].set(1.0), x)
        # retire the accepted cell's row and column
        rows = jnp.arange(s1) == r
        cols = jnp.arange(s2) == c
        dead = rows[:, None] | cols[None, :]
        flat = jnp.where(ok & dead.reshape(-1), NEG_INF, flat)
        return flat, x

    x0 = jnp.zeros((s1, s2), score_rank.dtype)
    _, x = jax.lax.fori_loop(0, min(s1, s2), body, (flat0, x0))
    return x


def greedy_perm_batch(score_rank, ks, n1, n2):
    return jax.vmap(greedy_perm)(score_rank, ks, n1, n2)
