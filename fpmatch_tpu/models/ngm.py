"""The full neural-graph-matching network (TPU-native NGM).

Capability-parity rebuild of the reference `Net` (src/model/ngm.py:117-491):

  ResNet-18 features → bilinear alignment at keypoints → spline-conv message
  passing per fingerprint graph → global-gated node/edge affinities →
  factorized Kronecker association graph → 3 assoc-GNN layers (mean-aggregated
  SpMM over Kᵀ + embedded Sinkhorn channel) → Sinkhorn → AFA-U k-prediction →
  soft-top-k → greedy/Hungarian discretization → match classifier.

Differences by design (all TPU-first, not behavioural deviations unless
noted):
  * everything is fixed-shape (N_MAX/E_MAX buckets) + masks; batch loops
    become vmap; association features keep their (N1, N2, C) matrix layout so
    the reference's column-major vec bookkeeping disappears;
  * K is never materialized — the assoc-GNN consumes the factor form
    (Kp, Ke, incidence edge lists) via gather/segment-sum;
  * Hungarian runs on host between jit segments when requested: a first
    forward yields the soft-top-k map (`ds_mat`), the host LAPJV solves it,
    and a second forward passes the 0/1 result back through the
    `hungarian_mask` argument of `__call__` (reference: ngm.py:444 ranks the
    greedy fill by hungarian(ss_out)·ss_out). The evaluate/match CLIs expose
    this as `--discretize hungarian`; the default device path ranks by the
    soft-top-k output directly, since the discretized matrix is a
    stop-gradient mask either way (the axon TPU runtime does not support
    host callbacks inside jit).
"""
from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..core.config import Config
from ..ops.feature_align import feature_align, normalize_over_channels
from ..ops.sinkhorn import sinkhorn_batch
from ..ops.soft_topk import soft_topk_batch, greedy_perm_batch
from ..ops.spline import edge_pseudo_coords
from .backbone import ResNet18Backbone
from .layers import (AssocGNNLayer, AssocGNNLayerBatched,
                     InnerProductAffinity, MatchClassifier, SplineNet)
from .afau import AFAUEncoder


class PairBatch(NamedTuple):
    """Batched padded matching problems. Leading axis B; view axis 2."""

    images: jnp.ndarray      # (B, 2, H, W, 3)
    points: jnp.ndarray      # (B, 2, N, 2)
    n_nodes: jnp.ndarray     # (B, 2) int32
    src: jnp.ndarray         # (B, 2, E) int32
    dst: jnp.ndarray         # (B, 2, E) int32
    n_edges: jnp.ndarray     # (B, 2) int32
    gt_perm: jnp.ndarray     # (B, N, N) float32
    label: jnp.ndarray       # (B,) float32 genuine=1/imposter=0
    gt_k: jnp.ndarray        # (B,) float32
    # triangle hyperedges (only populated when cfg.ngm.hyperedge; None
    # otherwise — None fields are empty pytree nodes, so jit/tree_map skip
    # them)
    tri: Optional[jnp.ndarray] = None      # (B, 2, T, 3) int32
    n_tris: Optional[jnp.ndarray] = None   # (B, 2) int32
    # precomputed per-keypoint features for the non-image pathway
    # (cfg.backbone.kind == "none"); images are ignored when set
    features: Optional[jnp.ndarray] = None  # (B, 2, N, F) float32
    # edge-sharded multi-chip path: a parallel.edge_partition.BatchRowPlan
    # (host-built per batch, static shapes) — when set AND the model carries
    # a mesh, the assoc-GNN layers run row-sharded with halo all-to-all
    row_plan: Optional[object] = None

    @property
    def batch_size(self):
        return self.images.shape[0]


def _vmapped(module_cls, n_data_args, **kwargs):
    """Lift a per-pair module over the batch axis with shared params."""
    return nn.vmap(
        module_cls,
        in_axes=tuple([0] * n_data_args),
        out_axes=0,
        variable_axes={"params": None},
        split_rngs={"params": False},
    )(**kwargs)


class NGMNet(nn.Module):
    """End-to-end matcher. Call with a PairBatch.

    Multi-chip beyond data parallelism: give the model a `mesh` with an
    `edge_axis` and set `batch.row_plan` (parallel.edge_partition
    plan_batch_rows) — the 3 assoc-GNN layers then run row-sharded over the
    mesh (association features sharded on the graph-1 node axis, one halo
    all_to_all per layer, X stays sharded across layers); everything outside
    the assoc loop is GSPMD-partitioned automatically from the shard_map
    boundary shardings. `batch_axis` names the DP mesh axis for 2-D
    (dp × edge) meshes. The reference never attempted this
    (src/parallel/data_parallel.py:6-46 is its entire, commented-out story).
    """

    cfg: Config
    mesh: Optional[object] = None      # jax.sharding.Mesh (hashable, static)
    edge_axis: str = "edge"
    batch_axis: Optional[str] = None
    # UNIV-scale single-pair serving: a kernels.assoc_univ_v3 UnivPlanV3
    # (host metadata, trace-time constant). With batch==1 the 3 assoc-GNN
    # aggregations run through the v3 Pallas kernel (KeP gathered once per
    # forward, reused across layers) instead of the chunked-XLA dispatch —
    # measured 1.2x (f32) / 1.8x (bf16 KeP) the chunked path at n=600.
    # Per-pair plan => per-pair trace, the serving CLI's regime anyway.
    univ_plan: Optional[object] = None
    univ_bf16: bool = False

    @nn.compact
    def __call__(self, batch: PairBatch, train: bool = False,
                 hungarian_mask: Optional[jnp.ndarray] = None,
                 bn_main: Optional[bool] = None,
                 bn_cls: Optional[bool] = None) -> Dict[str, jnp.ndarray]:
        """`bn_main`/`bn_cls` override the BatchNorm mode of the backbone /
        match-classifier independently of `train`: curriculum stages that
        freeze a partition (stages 2/4/6) pass False so its BN runs in
        running-average mode — train-mode BN stats double the forward
        (8.3 → 16.4 ms measured, logs/iso_train_fwd.log) and drifting
        stats under frozen convs is useless anyway. Default: follow
        `train` (reference semantics)."""
        bn_main = train if bn_main is None else bn_main
        bn_cls = train if bn_cls is None else bn_cls
        cfg = self.cfg.ngm
        # graph-side compute dtype (NGMConfig.compute_dtype): bf16 runs the
        # spline conv, feature alignment, edge features, affinity einsums
        # and assoc-GNN in bf16 with f32 masters + f32 reductions; Sinkhorn
        # / soft-top-k / AFA-U / classifier/losses always f32
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" \
            else jnp.float32
        shapes = self.cfg.shapes
        B, two, H, W, _ = batch.images.shape
        N = batch.points.shape[2]
        E = batch.src.shape[2]
        rescale_max = float(max(self.cfg.data.rescale))

        node_mask = (jnp.arange(N)[None, :]
                     < batch.n_nodes.reshape(B * 2)[:, None])
        edge_mask = (jnp.arange(E)[None, :]
                     < batch.n_edges.reshape(B * 2)[:, None])
        pts = batch.points.reshape(B * 2, N, 2)

        kind = self.cfg.backbone.kind
        if kind == "none":
            # ---- non-image pathway: precomputed keypoint features --------
            from .vgg import NoBackbone

            feats = batch.features.reshape(B * 2, N, -1)
            node_feat, global_feat = NoBackbone(
                out_dim=cfg.node_feature_dim,
                global_dim=cfg.global_state_dim // 2,
                name="backbone")(feats, node_mask.astype(feats.dtype),
                                 train=bn_main)
        else:
            # ---- backbone over all images at once (MXU batch) ------------
            # compute dtype from config: bfloat16 doubles MXU throughput and
            # halves HBM traffic; params/downstream stay fp32
            bb_dtype = jnp.bfloat16 \
                if self.cfg.backbone.dtype == "bfloat16" else jnp.float32
            C_in = batch.images.shape[-1]
            imgs = batch.images.reshape(B * 2, H, W, C_in)
            if imgs.dtype == jnp.uint8:
                # loader ships raw uint8, possibly single-channel luma (the
                # tunnel H2D link is the train-loop bottleneck: ~7 MB/s, so
                # f32 RGB would cost 12x the bytes); normalization runs on
                # device where it fuses into the stem, and a (…,1) input
                # broadcasts against the per-channel stats to RGB
                means = jnp.asarray(self.cfg.data.norm_means, jnp.float32)
                stds = jnp.asarray(self.cfg.data.norm_std, jnp.float32)
                imgs = (imgs.astype(jnp.float32) / 255.0 - means) / stds
            elif C_in == 1:
                imgs = jnp.repeat(imgs, 3, axis=-1)
            imgs = imgs.astype(bb_dtype)
            if kind == "resnet18":
                BB = (nn.remat(ResNet18Backbone, static_argnums=(2,))
                      if self.cfg.backbone.remat else ResNet18Backbone)
                node_maps, edges_map, global_feat = BB(
                    dtype=bb_dtype, node_taps=self.cfg.backbone.node_taps,
                    stem_channels=self.cfg.backbone.stem_channels,
                    stage_channels=self.cfg.backbone.stage_channels,
                    blocks_per_stage=self.cfg.backbone.blocks_per_stage,
                    name="backbone")(imgs, bn_main)
                node_maps = list(node_maps)
            elif kind in ("vgg16", "vgg16_bn"):
                from .vgg import VGG16Backbone

                nodes, edges_map, global_feat = VGG16Backbone(
                    batch_norm=(kind == "vgg16_bn"), dtype=bb_dtype,
                    name="backbone")(imgs, train=bn_main)
                node_maps = [nodes]
            else:
                raise ValueError(f"unknown backbone kind: {kind!r}")
            # channel-normalize with f32 accumulation, then drop to the
            # compute dtype for alignment + everything graph-side
            node_maps = [normalize_over_channels(
                m.astype(jnp.float32)).astype(cdt) for m in node_maps]
            edges_map = normalize_over_channels(
                edges_map.astype(jnp.float32)).astype(cdt)
            global_feat = global_feat.astype(jnp.float32)

            # ---- bilinear alignment at keypoints -------------------------
            aligned = [jax.vmap(lambda f, p: feature_align(
                f, p, self.cfg.data.rescale))(m, pts) for m in node_maps]
            F = jax.vmap(lambda f, p: feature_align(
                f, p, self.cfg.data.rescale))(edges_map, pts)
            node_feat = jnp.concatenate(aligned + [F], axis=-1)

        node_feat = node_feat.astype(cdt) * node_mask[..., None]

        # ---- spline-conv message passing per graph -----------------------
        src = batch.src.reshape(B * 2, E)
        dst = batch.dst.reshape(B * 2, E)
        pseudo = jax.vmap(lambda p, s, d: edge_pseudo_coords(p, s, d,
                                                             rescale_max)
                          )(pts, src, dst)
        spline = _vmapped(SplineNet, 6, features=cfg.node_feature_dim,
                          num_layers=cfg.spline_layers, name="spline")
        x = spline(node_feat, src, dst, pseudo, edge_mask, node_mask)

        # ---- edge features + global weights ------------------------------
        edge_feat = (jnp.take_along_axis(x, src[..., None], axis=1)
                     - jnp.take_along_axis(x, dst[..., None], axis=1))
        edge_feat = edge_feat * edge_mask[..., None]

        g = global_feat.reshape(B, 2, -1)
        global_w = normalize_over_channels(
            jnp.concatenate([g[:, 0], g[:, 1]], axis=-1))   # (B, 1024)

        x = x.reshape(B, 2, N, -1)
        edge_feat = edge_feat.reshape(B, 2, E, -1)
        node_mask = node_mask.reshape(B, 2, N)
        edge_mask = edge_mask.reshape(B, 2, E)
        n1, n2 = batch.n_nodes[:, 0], batch.n_nodes[:, 1]

        vmask = node_mask[:, 0, :, None] & node_mask[:, 1, None, :]
        emask = edge_mask[:, 0, :, None] & edge_mask[:, 1, None, :]

        # ---- affinities ---------------------------------------------------
        Kp = InnerProductAffinity(cfg.node_feature_dim, name="vertex_aff")(
            x[:, 0], x[:, 1], global_w, mask=vmask)
        Ke = 0.5 * InnerProductAffinity(cfg.node_feature_dim,
                                        name="edge_aff")(
            edge_feat[:, 0], edge_feat[:, 1], global_w, mask=emask)

        # ---- third-order (triangle) affinities, config-gated --------------
        # the reference builds this machinery but never enables it
        # (ngm.py:255 hyperedge=False); here it is functional — see
        # ops.assoc.assoc_tri_matvec
        if cfg.hyperedge:
            from ..ops.spline import hyperedge_angle_attrs

            T = batch.tri.shape[2]
            tri_flat = batch.tri.reshape(B * 2, T, 3)
            tri_mask = (jnp.arange(T)[None, :]
                        < batch.n_tris.reshape(B * 2)[:, None])
            # angle cosines in f32: tiny op, and the safe-norm rsqrt at the
            # padded-slot zeros is precision-sensitive
            tri_attr = jax.vmap(hyperedge_angle_attrs)(
                x.reshape(B * 2, N, -1).astype(jnp.float32), tri_flat,
                tri_mask.astype(jnp.float32))
            tri_attr = tri_attr.reshape(B, 2, T, 3)
            tri_mask = tri_mask.reshape(B, 2, T)
            tmask = tri_mask[:, 0, :, None] & tri_mask[:, 1, None, :]
            Kt = 0.5 * InnerProductAffinity(3, name="tri_aff")(
                tri_attr[:, 0], tri_attr[:, 1], global_w,
                mask=tmask.astype(x.dtype))
            tri_extra = (Kt, batch.tri[:, 0], batch.tri[:, 1],
                         tri_mask[:, 0], tri_mask[:, 1])
        else:
            tri_extra = ()

        # ---- association-graph GNN ---------------------------------------
        emb = Kp[..., None] if cfg.first_order else jnp.ones(
            (B, N, N, 1), Kp.dtype)
        kp_present = vmask.astype(Kp.dtype)
        if self.univ_plan is not None:
            # ---- UNIV-scale single-pair serving path ----------------------
            if B != 1:
                raise ValueError("univ_plan is a single-pair path (B == 1)")
            if cfg.hyperedge:
                raise NotImplementedError("hyperedge + univ kernel")
            from ..kernels.assoc_univ_v3 import (assoc_matvec_univ_v3,
                                                 build_kep)
            from ..ops.assoc import assoc_degree

            plan = self.univ_plan
            kdt = jnp.bfloat16 if (self.univ_bf16
                                   or cdt == jnp.bfloat16) else jnp.float32
            KeP = build_kep(Ke[0], plan, dtype=kdt)
            deg = assoc_degree(kp_present[0], edge_mask[0, 0],
                               edge_mask[0, 1], batch.src[0, 0],
                               batch.dst[0, 0], batch.src[0, 1],
                               batch.dst[0, 1], N, N, transpose=True)
            deg = jnp.maximum(deg, 1.0)[None, ..., None]
            for i in range(cfg.gnn_layers):
                y = assoc_matvec_univ_v3(emb[0], Kp[0], Ke[0], plan, KeP,
                                         compute_dtype=kdt)
                agg = y[None] / deg
                layer = AssocGNNLayerBatched(out_features=cfg.gnn_feat[i],
                                             sk_channel=cfg.sk_emb,
                                             sk_iter=cfg.sk_layer_iter,
                                             sk_tau=cfg.sk_tau,
                                             dtype=cdt,
                                             name=f"gnn_{i}")
                emb = layer(emb, agg, kp_present, n1, n2)
        elif batch.row_plan is not None:
            # ---- edge-sharded multi-chip path -----------------------------
            if self.mesh is None:
                raise ValueError("batch.row_plan set but NGMNet has no mesh")
            if cfg.hyperedge:
                raise NotImplementedError(
                    "hyperedge + edge sharding not combined")
            from ..ops.assoc import assoc_degree
            from ..parallel.edge_partition import \
                batched_row_sharded_aggregate

            agg_fn = batched_row_sharded_aggregate(
                self.mesh, self.edge_axis, self.batch_axis, transpose=True)
            deg = jax.vmap(
                lambda kp, e1m, e2m, s1, d1, s2, d2: assoc_degree(
                    kp, e1m, e2m, s1, d1, s2, d2, N, N, transpose=True))(
                kp_present, edge_mask[:, 0], edge_mask[:, 1],
                batch.src[:, 0], batch.dst[:, 0],
                batch.src[:, 1], batch.dst[:, 1])
            deg = jnp.maximum(deg, 1.0)[..., None]
            for i in range(cfg.gnn_layers):
                agg = agg_fn(emb, Kp, Ke, batch.row_plan,
                             batch.src[:, 1], batch.dst[:, 1]) / deg
                layer = AssocGNNLayerBatched(out_features=cfg.gnn_feat[i],
                                             sk_channel=cfg.sk_emb,
                                             sk_iter=cfg.sk_layer_iter,
                                             sk_tau=cfg.sk_tau,
                                             dtype=cdt,
                                             name=f"gnn_{i}")
                emb = layer(emb, agg, kp_present, n1, n2)
        else:
            for i in range(cfg.gnn_layers):
                layer = _vmapped(AssocGNNLayer, 12 + len(tri_extra),
                                 out_features=cfg.gnn_feat[i],
                                 sk_channel=cfg.sk_emb,
                                 sk_iter=cfg.sk_layer_iter,
                                 sk_tau=cfg.sk_tau,
                                 hyperedge=cfg.hyperedge,
                                 dtype=cdt,
                                 name=f"gnn_{i}")
                emb = layer(emb, Kp, Ke, batch.src[:, 0], batch.dst[:, 0],
                            batch.src[:, 1], batch.dst[:, 1], kp_present,
                            edge_mask[:, 0], edge_mask[:, 1], n1, n2,
                            *tri_extra)

        # ---- scores + Sinkhorn -------------------------------------------
        s = nn.Dense(1, name="classifier")(emb)[..., 0]     # (B, N, N)

        def final_sk(x, a, b):
            return sinkhorn_batch(x, a, b, tau=cfg.sk_tau,
                                  max_iter=cfg.sk_iter, dummy_row=True)

        if cfg.remat_sinkhorn:
            final_sk = jax.checkpoint(final_sk)
        ss = final_sk(s, n1, n2)

        min_pts = jnp.minimum(n1, n2).astype(jnp.float32)
        supervised_ks = batch.gt_k / jnp.maximum(min_pts, 1.0)

        # ---- k prediction (AFA-U) ----------------------------------------
        if cfg.regression:
            afa = _vmapped(AFAUEncoder, 3, univ_size=shapes.univ_size,
                           reg_hidden=cfg.afa_reg_hidden, name="afau")
            ks = afa(jax.lax.stop_gradient(ss), n1, n2)     # (B,)
        else:
            ks = supervised_ks

        # ---- soft top-k ---------------------------------------------------
        topk_target = batch.gt_k if train else ks * min_pts

        def topk_fn(x, k, a, b):
            return soft_topk_batch(x, k, a, b, tau=cfg.sk_tau,
                                   max_iter=cfg.sk_iter,
                                   extra_iter=cfg.topk_extra_iter)

        if cfg.remat_sinkhorn:
            topk_fn = jax.checkpoint(topk_fn)
        ss_out = topk_fn(ss, topk_target, n1, n2)

        # ---- discretization ----------------------------------------------
        rank = ss_out if hungarian_mask is None else hungarian_mask * ss_out
        x_perm = greedy_perm_batch(jax.lax.stop_gradient(rank),
                                   ks * min_pts, n1, n2)
        x_perm = jax.lax.stop_gradient(x_perm)

        # ---- match classification ----------------------------------------
        matched_sim = s * x_perm
        if cfg.cls_k_features:
            n_matched = x_perm.sum(axis=(1, 2))
            sum_sim = matched_sim.sum(axis=(1, 2))
            extra = jnp.stack(
                [ks, n_matched / jnp.maximum(min_pts, 1.0),
                 sum_sim / jnp.maximum(n_matched, 1.0)], axis=-1)
            extra = jax.lax.stop_gradient(extra)  # cls stage trains alone
        else:
            extra = None
        cls_logits = MatchClassifier(channels=cfg.match_cls_channels,
                                     name="match_cls")(
            matched_sim, n1, n2, train=bn_cls, extra_features=extra)
        cls_prob = jax.nn.sigmoid(cls_logits)

        # ---- auxiliary losses --------------------------------------------
        label = batch.label
        cls_loss = jnp.mean(
            jnp.maximum(cls_logits, 0) - cls_logits * label
            + jnp.log1p(jnp.exp(-jnp.abs(cls_logits))))
        if cfg.regression:
            ks_loss = jnp.mean((ks - supervised_ks) ** 2) * cfg.k_factor
            ks_error = jnp.mean(jnp.abs(ks * min_pts - batch.gt_k))
        else:
            ks_loss = jnp.asarray(0.0)
            ks_error = jnp.asarray(0.0)

        return {
            "ds_mat": ss_out,
            "raw_scores": s,
            "sinkhorn": ss,
            "perm_mat": x_perm,
            "Kp": Kp,
            "ks_loss": ks_loss,
            "ks_error": ks_error,
            "cls_loss": cls_loss,
            "cls_logits": cls_logits,
            "cls_prob": cls_prob,
            "k_prob": ks,
        }
