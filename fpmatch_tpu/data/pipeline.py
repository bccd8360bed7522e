"""Pair construction + collation into fixed-shape PairBatch pytrees.

Capability parity with src/gmdataset.py:51-696 (GMDataset/TestDataset/
collate_fn/get_dataloader), redesigned for the TPU data path:

  * per-sample work (augmentation, Delaunay, label bookkeeping) happens on
    host CPU in worker threads (cv2/scipy release the GIL);
  * the reference's collate-time scipy Kronecker products vanish entirely —
    the factorized association ops consume raw edge lists, so collation is
    just bucket padding + stacking;
  * everything is driven by an explicit per-index RNG: sample i of epoch e is
    reproducible regardless of worker scheduling.
"""
from __future__ import annotations

import multiprocessing
from concurrent.futures import ProcessPoolExecutor, ThreadPoolExecutor
from dataclasses import dataclass
from typing import Iterator, List, Optional, Sequence, Tuple

import cv2
import numpy as np

from ..core.build_graphs import (build_edges, delaunay_triangles,
                                 permute_edges)
from ..core.config import Config
from .augmentation import (augment_image_pair, augment_two_images,
                           standardize)
from .benchmark import Benchmark


def _load_image(path: str) -> np.ndarray:
    img = cv2.imread(path)
    if img is None:
        raise FileNotFoundError(path)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)


def _annos_of(entry_kpts) -> List[List]:
    return [[k["labels"], k["x"], k["y"]] for k in entry_kpts]


@dataclass
class PairSample:
    """One matching problem in host (numpy, ragged) form."""

    images: Tuple[np.ndarray, np.ndarray]      # (H, W, 3) uint8 RGB ×2
    points: Tuple[np.ndarray, np.ndarray]      # (n_i, 2) float32
    edges: Tuple[Tuple[np.ndarray, np.ndarray], Tuple[np.ndarray, np.ndarray]]
    perm: np.ndarray                           # (n1, n2)
    label: float
    cls: Tuple[str, str]
    tris: Optional[Tuple[np.ndarray, np.ndarray]] = None  # (t_i, 3) ×2


class PairDataset:
    """Index-addressable pair source over a Benchmark (match or classify)."""

    def __init__(self, bench: Benchmark, cfg: Config, *,
                 augment: Optional[bool] = None, length: Optional[int] = None,
                 seed: int = 123):
        self.bench = bench
        self.cfg = cfg
        self.seed = seed
        self.augment = (bench.sets == "train") if augment is None else augment
        if bench.task == "classify":
            self.pairs = bench.classify_pairs()
        else:
            self.pairs = bench.match_combinations()
        if length is not None and bench.sets != "test":
            # seeded shuffle first: the pair list is genuine-then-imposter,
            # so an ordered truncation would keep genuine pairs only
            import random as _random
            _random.Random(seed * 99_991 + 7).shuffle(self.pairs)
            self.pairs = self.pairs[:length]

    def __len__(self):
        return len(self.pairs)

    # ------------------------------------------------------------------
    def _clip_common(self, ann1, ann2, n_max):
        """Keep at most n_max shared labels, preserving view-1 order in both
        views so the identity assignment stays valid."""
        common = [a[0] for a in ann1 if a[0] in {b[0] for b in ann2}]
        keep = set(common[:n_max])
        a1 = [a for a in ann1 if a[0] in keep]
        order = {lab: i for i, lab in enumerate(a[0] for a in a1)}
        a2 = sorted((b for b in ann2 if b[0] in keep),
                    key=lambda b: order[b[0]])
        return a1, a2

    def get(self, idx: int, epoch: int = 0) -> PairSample:
        rng = np.random.default_rng(
            (self.seed * 1_000_003 + epoch) * 2_000_003 + idx)
        pair = self.pairs[idx % len(self.pairs)]
        cfg = self.cfg
        n_max = cfg.shapes.n_max
        genuine = self.bench.is_genuine(*pair)

        if genuine and pair[0] == pair[1]:
            entry = self.bench.data_dict[pair[0]]
            img = _load_image(entry["path"])
            annos = _annos_of(entry["kpts"])
            if self.augment:
                (i1, a1), (i2, a2) = augment_image_pair(
                    img, annos, rng,
                    min_points=cfg.data.augment_min_points,
                    min_common=cfg.data.augment_min_common,
                    max_attempts=cfg.data.augment_max_attempts)
            else:
                i1, a1 = standardize(img, annos)
                i2, a2 = standardize(img, annos)
            a1, a2 = self._clip_common(a1, a2, n_max)
            n = min(len(a1), len(a2))
            perm = np.eye(n, dtype=np.float32)
            label = 1.0
        elif genuine:
            # cross-impression genuine (session protocol / match task):
            # identity is by keypoint label equality
            e1 = self.bench.data_dict[pair[0]]
            e2 = self.bench.data_dict[pair[1]]
            img1, img2 = _load_image(e1["path"]), _load_image(e2["path"])
            an1, an2 = _annos_of(e1["kpts"]), _annos_of(e2["kpts"])
            if self.augment:
                (i1, a1), (i2, a2) = augment_two_images(
                    img1, an1, img2, an2, rng,
                    min_points=cfg.data.augment_min_points)
            else:
                i1, a1 = standardize(img1, an1)
                i2, a2 = standardize(img2, an2)
            a1 = a1[:n_max]
            a2 = a2[:n_max]
            lab2 = {lab: j for j, (lab, _, _) in enumerate(a2)}
            perm = np.zeros((len(a1), len(a2)), np.float32)
            for i, (lab, _, _) in enumerate(a1):
                j = lab2.get(lab)
                if j is not None:
                    perm[i, j] = 1
            label = 1.0
        else:
            e1 = self.bench.data_dict[pair[0]]
            e2 = self.bench.data_dict[pair[1]]
            img1, img2 = _load_image(e1["path"]), _load_image(e2["path"])
            an1, an2 = _annos_of(e1["kpts"]), _annos_of(e2["kpts"])
            if self.augment:
                (i1, a1), (i2, a2) = augment_two_images(
                    img1, an1, img2, an2, rng,
                    min_points=cfg.data.augment_min_points)
            else:
                i1, a1 = standardize(img1, an1)
                i2, a2 = standardize(img2, an2)
            a1 = a1[:n_max]
            a2 = a2[:n_max]
            perm = np.zeros((len(a1), len(a2)), np.float32)
            label = 0.0

        P1 = np.array([[x, y] for _, x, y in a1], np.float32).reshape(-1, 2)
        P2 = np.array([[x, y] for _, x, y in a2], np.float32).reshape(-1, 2)

        stg = cfg.data.src_graph_construct
        _, s1, d1 = build_edges(P1, stg=stg)
        # G2 = Pᵀ·G1 is only well-defined for a COMPLETE permutation (every
        # source node matched); partial-overlap pairs (cross-impression
        # genuine) get an independent Delaunay on P2
        complete = (perm.shape[0] == perm.shape[1]
                    and perm.sum() == perm.shape[0] > 0)
        if cfg.data.tgt_graph_construct == "same" and complete:
            s2, d2 = permute_edges(s1, d1, perm)       # G2 = Pᵀ·G1
        else:
            _, s2, d2 = build_edges(P2, stg=stg)
        e_max = cfg.shapes.e_max
        s1, d1 = s1[:e_max], d1[:e_max]
        s2, d2 = s2[:e_max], d2[:e_max]

        tris = None
        if cfg.ngm.hyperedge:
            t_max = cfg.shapes.t_max
            tris = (delaunay_triangles(P1)[:t_max],
                    delaunay_triangles(P2)[:t_max])

        return PairSample(images=(i1, i2), points=(P1, P2),
                          edges=((s1, d1), (s2, d2)), perm=perm,
                          label=label,
                          cls=(self.bench.data_dict[pair[0]]["cls"],
                               self.bench.data_dict[pair[1]]["cls"]),
                          tris=tris)


# ------------------------------------------------------------ process workers
#
# Python threads share the GIL: the per-pair host work (augmentation warps,
# Delaunay, label bookkeeping) holds it often enough that a ThreadPool loader
# tops out at ~1 core no matter how many workers (measured: a 4-core host sat
# 50% idle while training was loader-bound). Worker PROCESSES sidestep the
# GIL the way the reference's 6 DataLoader worker processes do
# (gmdataset.py:692-696). Spawn (not fork) so children never inherit the
# parent's live TPU/tunnel client threads; every module a worker imports is
# jax-free (numpy/cv2/scipy only).

_WORKER_DATASET: Optional["PairDataset"] = None


def _init_worker(dataset: "PairDataset") -> None:
    global _WORKER_DATASET
    _WORKER_DATASET = dataset


def _worker_get(idx: int, epoch: int) -> "PairSample":
    return _WORKER_DATASET.get(idx, epoch)


# ---------------------------------------------------------------- collation

def collate(samples: Sequence[PairSample], cfg: Config):
    """Pad + stack host samples into a PairBatch of numpy arrays.

    Images stay RAW uint8 and unnormalized: the host→device link is the
    train-loop bottleneck (tunnel H2D ≈ 7 MB/s measured), so the batch ships
    4× fewer bytes than f32 and the model normalizes on device (ngm.py),
    where the arithmetic fuses into the backbone stem."""
    from ..models.ngm import PairBatch

    B = len(samples)
    N, E = cfg.shapes.n_max, cfg.shapes.e_max
    H, W = cfg.data.rescale[1], cfg.data.rescale[0]
    C = cfg.data.image_channels

    images = np.zeros((B, 2, H, W, C), np.uint8)
    points = np.zeros((B, 2, N, 2), np.float32)
    src = np.zeros((B, 2, E), np.int32)
    dst = np.zeros((B, 2, E), np.int32)
    n_nodes = np.zeros((B, 2), np.int32)
    n_edges = np.zeros((B, 2), np.int32)
    gt_perm = np.zeros((B, N, N), np.float32)
    label = np.zeros((B,), np.float32)

    hyper = cfg.ngm.hyperedge
    if hyper:
        T = cfg.shapes.t_max
        tri = np.zeros((B, 2, T, 3), np.int32)
        n_tris = np.zeros((B, 2), np.int32)

    for b, s in enumerate(samples):
        for v in range(2):
            img = s.images[v]
            if C == 1 and img.ndim == 3 and img.shape[2] == 3:
                img = cv2.cvtColor(img, cv2.COLOR_RGB2GRAY)[..., None]
            images[b, v, :img.shape[0], :img.shape[1]] = img[:H, :W]
            P = s.points[v][:N]
            points[b, v, :len(P)] = P
            n_nodes[b, v] = len(P)
            sv, dv = s.edges[v]
            src[b, v, :len(sv)] = sv
            dst[b, v, :len(dv)] = dv
            n_edges[b, v] = len(sv)
            if hyper and s.tris is not None:
                tv = s.tris[v]
                tri[b, v, :len(tv)] = tv
                n_tris[b, v] = len(tv)
        p = s.perm[:N, :N]
        gt_perm[b, :p.shape[0], :p.shape[1]] = p
        label[b] = s.label

    batch = PairBatch(images, points, n_nodes, src, dst, n_edges, gt_perm,
                      label, gt_perm.sum((1, 2)).astype(np.float32))
    if hyper:
        batch = batch._replace(tri=tri, n_tris=n_tris)
    return batch


class DataLoader:
    """Seed-deterministic prefetching loader (replaces torch DataLoader +
    worker_init seeding, gmdataset.py:675-696)."""

    def __init__(self, dataset: PairDataset, cfg: Config, *,
                 batch_size: Optional[int] = None, shuffle: bool = False,
                 num_workers: Optional[int] = None, drop_last: bool = True,
                 use_processes: Optional[bool] = None, cache: bool = False,
                 device_prefetch: bool = False, device_put_fn=None,
                 host_batch_hook=None):
        self.dataset = dataset
        self.cfg = cfg
        # device_put_fn: how batches reach the device(s). Default is plain
        # jax.device_put (single chip); multi-device trainers pass
        # parallel.mesh.shard_batch so the batch axis lands sharded over the
        # mesh and GSPMD never re-lays it out.
        # host_batch_hook: host-side batch decoration before transfer — the
        # edge-sharded path attaches a BatchRowPlan here (plan construction
        # is numpy and belongs on the host, not in the jitted step).
        self.device_put_fn = device_put_fn
        self.host_batch_hook = host_batch_hook
        self.batch_size = batch_size or cfg.data.batch_size
        self.shuffle = shuffle
        self.num_workers = (cfg.data.num_workers if num_workers is None
                            else num_workers)
        self.drop_last = drop_last
        self.use_processes = (cfg.data.worker_processes
                              if use_processes is None else use_processes)
        # sample cache: only sound when output is epoch-independent
        # (deterministic un-augmented pairs in a fixed order)
        self.cache = cache and not shuffle and not dataset.augment
        self._cached: Optional[List[PairSample]] = None
        # device_prefetch: a one-slot background thread runs jax.device_put
        # on batch k+1 while the consumer steps on batch k — the tunnel H2D
        # link (~7 MB/s) otherwise serializes with compute. With cache on,
        # the device batches themselves are retained (val/test sets are small
        # and re-read every epoch).
        self.device_prefetch = device_prefetch
        self._dev_cached: Optional[List] = None
        self.epoch = 0

    def __len__(self):
        n = len(self.dataset) // self.batch_size
        if not self.drop_last and len(self.dataset) % self.batch_size:
            n += 1
        return n

    def __iter__(self) -> Iterator:
        if self._dev_cached is not None:
            yield from self._dev_cached
            return
        hooked_iter = self._host_iter()
        if self.host_batch_hook is not None:
            hooked_iter = map(self.host_batch_hook, hooked_iter)
        if not self.device_prefetch:
            if self.device_put_fn is not None:
                hooked_iter = map(self.device_put_fn, hooked_iter)
            yield from hooked_iter
            return
        import jax

        put = self.device_put_fn or jax.device_put
        keep = [] if self.cache else None
        fut = None
        pool = self._h2d_pool()
        for host_batch in hooked_iter:
            nxt = pool.submit(put, host_batch)
            if fut is not None:
                b = fut.result()
                if keep is not None:
                    keep.append(b)
                yield b
            fut = nxt
        if fut is not None:
            b = fut.result()
            if keep is not None:
                keep.append(b)
            yield b
        if keep is not None:
            self._dev_cached = keep

    def _h2d_pool(self) -> ThreadPoolExecutor:
        if getattr(self, "_h2d_executor", None) is None:
            self._h2d_executor = ThreadPoolExecutor(max_workers=1)
        return self._h2d_executor

    def _host_iter(self) -> Iterator:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.cfg.data.random_seed
                                  + self.epoch).shuffle(order)
        batches = [order[i:i + self.batch_size]
                   for i in range(0, len(order), self.batch_size)]
        if self.drop_last:
            batches = [b for b in batches if len(b) == self.batch_size]
        epoch = self.epoch
        self.epoch += 1

        if self.cache and self._cached is not None:
            for idxs in batches:
                yield collate([self._cached[int(i)] for i in idxs], self.cfg)
            return

        filling = [] if self.cache else None

        if self.num_workers <= 1:
            for idxs in batches:
                samples = [self.dataset.get(int(i), epoch) for i in idxs]
                if filling is not None:
                    filling.extend(samples)
                yield collate(samples, self.cfg)
        else:
            pool = self._pool()
            get = _worker_get if self.use_processes else self.dataset.get
            pending = []
            for idxs in batches:
                futs = [pool.submit(get, int(i), epoch) for i in idxs]
                pending.append(futs)
                # keep ~2 batches in flight
                while len(pending) > 2:
                    done = pending.pop(0)
                    samples = [f.result() for f in done]
                    if filling is not None:
                        filling.extend(samples)
                    yield collate(samples, self.cfg)
            for done in pending:
                samples = [f.result() for f in done]
                if filling is not None:
                    filling.extend(samples)
                yield collate(samples, self.cfg)

        if filling is not None:
            # shuffle=False ⇒ filling is samples [0..K) in index order, and
            # every future epoch requests exactly those indices
            self._cached = filling

    def _pool(self):
        # one long-lived pool per loader: avoids per-epoch churn and the
        # generator-GC-during-shutdown TypeError of a with-block across yields
        if getattr(self, "_executor", None) is None:
            if self.use_processes:
                ctx = multiprocessing.get_context("spawn")
                self._executor = ProcessPoolExecutor(
                    max_workers=self.num_workers, mp_context=ctx,
                    initializer=_init_worker, initargs=(self.dataset,))
            else:
                self._executor = ThreadPoolExecutor(
                    max_workers=self.num_workers)
        return self._executor
