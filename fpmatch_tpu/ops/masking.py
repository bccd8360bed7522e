"""Masking helpers shared by the fixed-shape ops."""
from __future__ import annotations

import jax.numpy as jnp

NEG_INF = -jnp.inf


def length_mask(length, size: int) -> jnp.ndarray:
    """(size,) boolean mask: index < length."""
    return jnp.arange(size) < length


def rect_mask(n1, n2, s1: int, s2: int) -> jnp.ndarray:
    """(s1, s2) boolean mask of the valid top-left rectangle."""
    return length_mask(n1, s1)[:, None] & length_mask(n2, s2)[None, :]


def masked_logsumexp(x: jnp.ndarray, mask: jnp.ndarray, axis, keepdims=False):
    """logsumexp over `axis` counting only `mask`; returns -inf where the mask
    is empty along the reduced axis (no NaNs)."""
    neg = jnp.where(mask, x, NEG_INF)
    m = jnp.max(neg, axis=axis, keepdims=True)
    m_safe = jnp.where(jnp.isfinite(m), m, 0.0)
    s = jnp.sum(jnp.where(mask, jnp.exp(neg - m_safe), 0.0), axis=axis,
                keepdims=True)
    out = jnp.where(s > 0, jnp.log(jnp.maximum(s, 1e-38)) + m_safe, NEG_INF)
    if not keepdims:
        out = jnp.squeeze(out, axis=axis)
    return out


def masked_max(x, mask, init=-jnp.inf, axis=None):
    return jnp.max(jnp.where(mask, x, init), axis=axis)


def masked_min(x, mask, init=jnp.inf, axis=None):
    return jnp.min(jnp.where(mask, x, init), axis=axis)
