"""Time the reference's FULL `Net.forward` (src/model/ngm.py:204-491) on CPU
torch, to ground bench.py's `vs_baseline` denominator in a measurement chain
instead of an estimate.

The reference's heavy deps (torchvision, torch_geometric, torch_sparse) are
absent in this image, so this harness supplies FLOP-faithful pure-torch
stand-ins and imports the reference's own code for everything else (the CNN
contract, SplineConv semantics, SAGE mean aggregation over the sparse assoc
adjacency, Sinkhorn, soft-topk, AFA-U, hungarian, match classifier):

  * torchvision.models.resnet18 → standard BasicBlock ResNet-18 (identical
    architecture ⇒ identical FLOPs; random init — timing only)
  * torch_geometric.nn.SplineConv → exact degree-1 open-B-spline conv
    (dim=2, kernel 5): per edge 2^dim basis products, edges bucketed by
    kernel index so the matmul row count is exactly 4·E (the true cost)
  * torch_sparse.SparseTensor + SAGEConv → COO adjacency with
    index_add mean aggregation (what torch_sparse.matmul(reduce='mean') does)

Everything is eager per-sample torch, like the reference runs it.

Usage: python scripts/bench_reference_full.py [--batch 8] [--n 50] [--iters 5]
Prints one JSON line: per-batch seconds, implied pairs/s on this CPU.
"""
from __future__ import annotations

import argparse
import importlib.util
import json
import sys
import time
import types

import numpy as np
import torch
import torch.nn as nn

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

torch.manual_seed(0)


# ---------------------------------------------------------------------------
# torchvision stub: standard ResNet-18 (BasicBlock [2,2,2,2]) — the exact
# architecture torchvision builds, random init
# ---------------------------------------------------------------------------

class _BasicBlock(nn.Module):
    def __init__(self, cin, cout, stride=1):
        super().__init__()
        self.conv1 = nn.Conv2d(cin, cout, 3, stride, 1, bias=False)
        self.bn1 = nn.BatchNorm2d(cout)
        self.relu = nn.ReLU(inplace=True)
        self.conv2 = nn.Conv2d(cout, cout, 3, 1, 1, bias=False)
        self.bn2 = nn.BatchNorm2d(cout)
        self.down = None
        if stride != 1 or cin != cout:
            self.down = nn.Sequential(nn.Conv2d(cin, cout, 1, stride,
                                                bias=False),
                                      nn.BatchNorm2d(cout))

    def forward(self, x):
        idn = x if self.down is None else self.down(x)
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        return self.relu(out + idn)


class _ResNet18(nn.Module):
    def __init__(self):
        super().__init__()
        self.conv1 = nn.Conv2d(3, 64, 7, 2, 3, bias=False)
        self.bn1 = nn.BatchNorm2d(64)
        self.relu = nn.ReLU(inplace=True)
        self.maxpool = nn.MaxPool2d(3, 2, 1)

        def stage(cin, cout, stride):
            return nn.Sequential(_BasicBlock(cin, cout, stride),
                                 _BasicBlock(cout, cout))

        self.layer1 = stage(64, 64, 1)
        self.layer2 = stage(64, 128, 2)
        self.layer3 = stage(128, 256, 2)
        self.layer4 = stage(256, 512, 2)


def _install_stubs():
    def mod(name, **attrs):
        m = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(m, k, v)
        sys.modules[name] = m
        return m

    # --- torchvision ---
    tv = mod("torchvision")
    weights_enum = types.SimpleNamespace(IMAGENET1K_V1=None)
    tv.models = mod("torchvision.models",
                    resnet18=lambda **kw: _ResNet18(),
                    ResNet18_Weights=weights_enum,
                    vgg16=lambda **kw: None, vgg16_bn=lambda **kw: None)

    # --- torch_sparse ---
    class SparseTensor:
        def __init__(self, row=None, col=None, value=None, sparse_sizes=None):
            self.row_idx, self.col_idx = row, col
            self.value, self.sizes = value, sparse_sizes

        def t(self):
            return SparseTensor(row=self.col_idx, col=self.row_idx,
                                value=self.value,
                                sparse_sizes=(self.sizes[1], self.sizes[0]))

        def matmul(self, x, reduce="sum"):
            # x: (M, C). out[r] (+)= value * x[col]; mean divides by row nnz
            out = x.new_zeros(self.sizes[0], x.shape[1])
            out.index_add_(0, self.row_idx, self.value[:, None] * x[self.col_idx])
            if reduce == "mean":
                cnt = x.new_zeros(self.sizes[0])
                cnt.index_add_(0, self.row_idx, torch.ones_like(self.value))
                out = out / cnt.clamp(min=1.0)[:, None]
            return out

    def spmm(index, value, m, n, matrix):
        out = matrix.new_zeros(m, matrix.shape[1])
        out.index_add_(0, index[0], value[:, None] * matrix[index[1]])
        return out

    mod("torch_sparse", SparseTensor=SparseTensor, spmm=spmm)

    # --- torch_geometric ---
    class SplineConv(nn.Module):
        """Degree-1 open-B-spline conv, dim=2, matching torch_spline_conv
        semantics: message_e = x_src[e] @ Σ_c basis_c(u_e)·W[k_c(u_e)],
        aggregated (max) at dst, plus root weight and bias."""

        def __init__(self, in_c, out_c, dim=2, kernel_size=5, aggr="max"):
            super().__init__()
            assert dim == 2
            self.K = kernel_size
            self.aggr = aggr
            self.weight = nn.Parameter(
                torch.randn(kernel_size ** 2, in_c, out_c) * (in_c ** -0.5))
            self.root = nn.Parameter(torch.randn(in_c, out_c) * (in_c ** -0.5))
            self.bias = nn.Parameter(torch.zeros(out_c))

        def reset_parameters(self):
            pass

        def forward(self, x, edge_index, pseudo):
            src, dst = edge_index[0], edge_index[1]
            x_src = x[src]
            K = self.K
            v = pseudo.clamp(0, 1) * (K - 1)
            i0 = v.floor().long().clamp(max=K - 2)
            f = v - i0.float()
            msg = x.new_zeros(src.numel(), self.weight.shape[2])
            for c in range(4):
                b0, b1 = c & 1, (c >> 1) & 1
                kidx = (i0[:, 0] + b0) * K + (i0[:, 1] + b1)
                coef = (f[:, 0] if b0 else 1 - f[:, 0]) \
                    * (f[:, 1] if b1 else 1 - f[:, 1])
                # bucket by kernel index: total matmul rows = 4·E, the true
                # torch_spline_conv cost
                for k in kidx.unique():
                    m = kidx == k
                    msg[m] += coef[m, None] * (x_src[m] @ self.weight[k])
            out = x.new_full((x.shape[0], msg.shape[1]), float("-inf"))
            out = out.scatter_reduce(0, dst[:, None].expand_as(msg), msg,
                                     "amax", include_self=True)
            out = torch.where(torch.isinf(out), torch.zeros_like(out), out)
            return out + x @ self.root + self.bias

    class MessagePassing(nn.Module):
        def __init__(self, aggr="add"):
            super().__init__()
            self.aggr = aggr

    class SAGEConv(nn.Module):
        """mean-aggregate neighbors then linear — what torch_geometric's
        SAGEConv computes with a SparseTensor adjacency."""

        def __init__(self, in_c, out_c):
            super().__init__()
            self.lin_l = nn.Linear(in_c, out_c)
            self.lin_r = nn.Linear(in_c, out_c, bias=False)

        def forward(self, x, adj_t):
            squeeze = x.dim() == 3
            xx = x[0] if squeeze else x
            agg = adj_t.matmul(xx, reduce="mean")
            out = self.lin_l(agg) + self.lin_r(xx)
            return out.unsqueeze(0) if squeeze else out

    class GCNConv(nn.Module):
        def __init__(self, in_c, out_c, cached=False):
            super().__init__()
            self.lin = nn.Linear(in_c, out_c)

    GINConv = GCNConv

    mod("torch_geometric")
    mod("torch_geometric.nn", SplineConv=SplineConv,
        MessagePassing=MessagePassing, GCNConv=GCNConv, GINConv=GINConv,
        SAGEConv=SAGEConv)
    mod("torch_geometric.utils", to_networkx=lambda *a, **k: None)

    # --- visualization deps (imported, never called) ---
    mod("matplotlib", use=lambda *a: None)
    mod("matplotlib.pyplot")
    mod("networkx")
    mod("seaborn")
    mod("cv2")

    # --- the reference's own native extensions (imported by
    # factorize_graph_matching, unused on the sparse forward path; loading
    # them would torch-JIT-compile CUDA/C++ sources) ---
    import src  # the reference package itself must resolve normally

    class _CSX:
        def __init__(self, *a, **k):
            pass

    mod("src.sparse", bilinear_diag_torch=None)
    mod("src.sparse_torch", CSRMatrix3d=_CSX, CSCMatrix3d=_CSX)

    # --- pygmtools (only Sinkhorn.forward_log uses it): faithful log-space
    # masked sinkhorn, same iteration structure/FLOPs as the pytorch backend
    def _pygm_sinkhorn(s, n1=None, n2=None, dummy_row=False, max_iter=10,
                       tau=1.0, batched_operation=False, backend="pytorch"):
        B, R, C = s.shape
        if n1 is None:
            n1 = torch.full((B,), R, dtype=torch.long)
        if n2 is None:
            n2 = torch.full((B,), C, dtype=torch.long)
        row_mask = torch.arange(R)[None, :] < n1[:, None]
        col_mask = torch.arange(C)[None, :] < n2[:, None]
        mask = row_mask[:, :, None] & col_mask[:, None, :]
        ls = (s / tau).masked_fill(~mask, -1e9)
        for i in range(max_iter):
            ls = ls - torch.logsumexp(ls, dim=2 if i % 2 == 0 else 1,
                                      keepdim=True)
            ls = ls.masked_fill(~mask, -1e9)
        return torch.exp(ls) * mask

    mod("pygmtools", sinkhorn=_pygm_sinkhorn)

    # py3.12: gnn.py does `from collections import Iterable`
    import collections
    import collections.abc
    if not hasattr(collections, "Iterable"):
        collections.Iterable = collections.abc.Iterable


# ---------------------------------------------------------------------------
# minimal PyG Batch: the reference's forward touches .x (get/set),
# .edge_index, .edge_attr, and .to_data_list()
# ---------------------------------------------------------------------------

class _Graph:
    def __init__(self, x, edge_index, edge_attr):
        self.x, self.edge_index, self.edge_attr = x, edge_index, edge_attr


class _GraphBatch:
    """B graphs concatenated on the node axis, PyG-Batch style."""

    def __init__(self, node_counts, edge_indices, edge_attrs):
        self.node_counts = node_counts
        offs = np.cumsum([0] + node_counts[:-1]).tolist()
        self.edge_index = torch.cat(
            [ei + o for ei, o in zip(edge_indices, offs)], dim=1)
        self.edge_attr = torch.cat(edge_attrs, dim=0)
        self._edge_counts = [ei.shape[1] for ei in edge_indices]
        self._offs = offs
        self.x = None

    def to_data_list(self):
        out, e0 = [], 0
        for cnt, off, ne in zip(self.node_counts, self._offs,
                                self._edge_counts):
            ei = self.edge_index[:, e0:e0 + ne] - off
            ea = self.edge_attr[e0:e0 + ne]
            out.append(_Graph(self.x[off:off + cnt], ei, ea))
            e0 += ne
        return out


def _delaunay_edges(pts):
    from scipy.spatial import Delaunay
    tri = Delaunay(pts)
    edges = set()
    for simplex in tri.simplices:
        for i in range(3):
            a, b = int(simplex[i]), int(simplex[(i + 1) % 3])
            edges.add((a, b))
            edges.add((b, a))
    e = np.asarray(sorted(edges), np.int64)
    return e[:, 0], e[:, 1]


def build_data_dict(B, n, rng):
    H, W = 240, 320
    images = [torch.randn(B, 3, H, W) for _ in range(2)]
    Ps, ns, graphs_raw, As = [], [], [], []
    for v in range(2):
        P = torch.zeros(B, n, 2)
        eidx, eattr, A = [], [], torch.zeros(B, n, n)
        for b in range(B):
            pts = rng.uniform(size=(n, 2)) * [W - 1, H - 1]
            P[b] = torch.tensor(pts, dtype=torch.float32)
            s, d = _delaunay_edges(pts)
            eidx.append(torch.tensor(np.stack([s, d]), dtype=torch.long))
            # pseudo coords: normalized coordinate offsets in [0, 1]
            delta = (pts[d] - pts[s]) / [2 * W, 2 * H] + 0.5
            eattr.append(torch.tensor(np.clip(delta, 0, 1),
                                      dtype=torch.float32))
            A[b, s, d] = 1.0
        Ps.append(P)
        ns.append(torch.full((B,), n, dtype=torch.long))
        graphs_raw.append(([n] * B, eidx, eattr))
        As.append(A)

    graphs = [_GraphBatch(*g) for g in graphs_raw]

    # Kronecker nonzero indices, column-major vec (i2·n1 + i1), e1-major
    # flattening of Ke — mirrors kronecker_sparse + CSX assembly
    KGHs_sparse = []
    for b in range(B):
        s1, d1 = graphs_raw[0][1][b]
        s2, d2 = graphs_raw[1][1][b]
        row = (s2[None, :] * n + s1[:, None]).reshape(-1)
        col = (d2[None, :] * n + d1[:, None]).reshape(-1)
        KGHs_sparse.append((row.float(), col.float()))

    perm = torch.eye(n).unsqueeze(0).repeat(B, 1, 1)
    return {
        "images": images, "Ps": Ps, "ns": ns, "As": As,
        "pyg_graphs": graphs, "gt_perm_mat": perm,
        "KGHs_sparse": KGHs_sparse,
        "label": torch.ones(B),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--n", type=int, default=50)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    _install_stubs()
    spec = importlib.util.spec_from_file_location(
        "ref_ngm", f"{REF}/src/model/ngm.py")
    ref_ngm = importlib.util.module_from_spec(spec)
    sys.modules["ref_ngm"] = ref_ngm
    spec.loader.exec_module(ref_ngm)

    rng = np.random.default_rng(0)
    net = ref_ngm.Net(regression=True).eval()
    data = build_data_dict(args.batch, args.n, rng)

    with torch.no_grad():
        net(dict(data))  # warmup
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            net(dict(data))
            ts.append(time.perf_counter() - t0)
    sec = float(np.median(ts))
    print(json.dumps({
        "ref_full_forward_s_per_batch": round(sec, 4),
        "batch": args.batch, "n_points": args.n,
        "ref_pairs_per_s_cpu": round(args.batch / sec, 3),
        "note": "reference Net.forward, eager torch CPU, FLOP-faithful "
                "stubs for torchvision/torch_geometric/torch_sparse",
    }))


if __name__ == "__main__":
    main()
