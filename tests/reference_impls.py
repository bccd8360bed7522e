"""Dense numpy reference implementations of the graph-matching math, written
directly from the algorithm definitions (FGM factorization, log-space Sinkhorn
with dummy rows, marginal Sinkhorn). Used as ground truth for the fixed-shape
masked JAX ops."""
from __future__ import annotations

import numpy as np
import scipy.sparse as ssp


def np_sinkhorn(s, n1, n2, tau=1.0, max_iter=10, dummy_row=True):
    """pygmtools-style log-space Sinkhorn on the valid (n1, n2) block.

    Even iterations normalize rows, odd normalize columns; if n1 > n2 the
    matrix is transposed first (so the dummy band is always rows, filled with
    log-value -100)."""
    from scipy.special import logsumexp

    s = np.array(s[:n1, :n2], dtype=np.float64)
    transposed = False
    if n1 > n2:
        s = s.T
        n1, n2 = n2, n1
        transposed = True
    log_s = s / tau
    if dummy_row and n2 > n1:
        log_s = np.concatenate([log_s, np.full((n2 - n1, n2), -100.0)], axis=0)
    for i in range(max_iter):
        axis = 1 if i % 2 == 0 else 0
        log_s = log_s - logsumexp(log_s, axis=axis, keepdims=True)
    out = np.exp(log_s)[:n1]
    if transposed:
        out = out.T
    return out


def np_soft_topk(scores, k, n1, n2, tau=1.0, max_iter=10, extra_cap=6):
    """Reference marginal-Sinkhorn top-k (soft_topk.py:8-53,166-255) on the
    valid block, incl. the overshoot loop capped at `extra_cap` steps."""
    from scipy.special import logsumexp

    sv = np.asarray(scores[:n1, :n2], dtype=np.float64)
    anchors = np.array([sv.min(), sv.max()])
    flat = sv.reshape(-1)
    dist = -np.abs(flat[:, None] - anchors[None, :])  # (n1*n2, 2)
    log_s = dist / tau
    total = n1 * n2
    log_col = np.log(np.array([total - k, k], dtype=np.float64))

    def row_norm(ls):
        ls = ls - logsumexp(ls, axis=1, keepdims=True)
        ls[np.isnan(ls)] = -np.inf
        return ls

    def col_norm(ls):
        ls = ls - logsumexp(ls, axis=0, keepdims=True) + log_col[None, :]
        ls[np.isnan(ls)] = -np.inf
        return ls

    with np.errstate(divide="ignore", invalid="ignore"):
        for i in range(max_iter):
            log_s = row_norm(log_s) if i % 2 == 0 else col_norm(log_s)
        step = max_iter
        while np.any(log_s > 0) and step < max_iter + extra_cap:
            log_s = row_norm(log_s) if step % 2 == 0 else col_norm(log_s)
            step += 1
    return np.exp(log_s[:, 1]).reshape(n1, n2)


def np_greedy_perm(rank, k, n1, n2):
    """Greedy unique-row/col selection of round(k) top-ranked cells."""
    rank = np.asarray(rank[:n1, :n2])
    order = np.argsort(-rank.reshape(-1), kind="stable")
    x = np.zeros((n1, n2))
    matched = 0
    for idx in order:
        if matched >= round(k):
            break
        r, c = idx // n2, idx % n2
        if x[r].sum() < 1 and x[:, c].sum() < 1:
            x[r, c] = 1
            matched += 1
    return x


def np_assoc_K(Kp, Ke, src1, dst1, src2, dst2, n1, n2):
    """Dense FGM association matrix via scipy kron, column-major vec:
    K = diag(vec(Kp)) + (G2⊗G1) diag(vec(Ke)) (H2⊗H1)ᵀ."""
    e1, e2 = len(src1), len(src2)
    G1 = np.zeros((n1, e1)); H1 = np.zeros((n1, e1))
    G2 = np.zeros((n2, e2)); H2 = np.zeros((n2, e2))
    G1[src1, np.arange(e1)] = 1
    H1[dst1, np.arange(e1)] = 1
    G2[src2, np.arange(e2)] = 1
    H2[dst2, np.arange(e2)] = 1
    KG = ssp.kron(ssp.coo_matrix(G2), ssp.coo_matrix(G1)).toarray()
    KH = ssp.kron(ssp.coo_matrix(H2), ssp.coo_matrix(H1)).toarray()
    vecKe = Ke.T.reshape(-1)          # column-major vec (e2·ne1 + e1)
    vecKp = Kp.T.reshape(-1)
    return KG @ np.diag(vecKe) @ KH.T + np.diag(vecKp)


def np_bilinear_sample(feat, points, ori_size):
    """(H,W,C) bilinear sampling at xy points, half-pixel aligned."""
    h_f, w_f, c = feat.shape
    w, h = ori_size
    out = np.zeros((len(points), c))
    for i, (px, py) in enumerate(points):
        x = (px - w / w_f / 2) / (w / w_f)
        y = (py - h / h_f / 2) / (h / h_f)
        x0 = int(np.clip(np.floor(x), 0, w_f - 1)); x1 = min(x0 + 1, w_f - 1)
        y0 = int(np.clip(np.floor(y), 0, h_f - 1)); y1 = min(y0 + 1, h_f - 1)
        xc = np.clip(x, 0, w_f - 1); yc = np.clip(y, 0, h_f - 1)
        fx, fy = xc - x0, yc - y0
        out[i] = (feat[y0, x0] * (1 - fx) * (1 - fy) + feat[y1, x0] * (1 - fx) * fy
                  + feat[y0, x1] * fx * (1 - fy) + feat[y1, x1] * fx * fy)
    return out
