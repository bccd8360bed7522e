"""One-shot fingerprint pair verification: two images → match verdict.

The serving-style entry point the reference lacks (its `test.py` only
re-scores dataset samples, reference test.py:1-145): give two fingerprint
images — with optional keypoint files — and get a verification score, the
predicted matchable-keypoint count, the greedy keypoint correspondence, and
a match visualization, as one JSON line on stdout.

Keypoints come from `--kpts1/--kpts2` files (.tsv/.csv/.txt, the dataset
formats), or are auto-detected when omitted: the classical DPF detector
(`poredet/dpf.py`, no trained weights needed) or a trained patch CNN
(`--detector cnn --detector-checkpoint …`).

Example:
    python -m fpmatch_tpu.cli.match a.png b.png \
        --checkpoint-dir checkpoints/run4 --node-taps layer2,layer3 \
        --threshold 0.5 --viz match.png
"""
from __future__ import annotations

import argparse
import json
import sys

import numpy as np


def _load_annos(image, kpts_path, prefix, detector, detector_args):
    """[(label, x, y), ...] from a keypoint file or a pore detector."""
    if kpts_path:
        from pathlib import Path

        from ..data.dataset import read_keypoints
        from ..data.pipeline import _annos_of
        return _annos_of(read_keypoints(Path(kpts_path), prefix))
    gray = image if image.ndim == 2 else \
        np.asarray(image[..., :3] @ [0.299, 0.587, 0.114], np.float32)
    if detector == "dpf":
        from ..poredet.dpf import detect_pores_lemes
        coords = detect_pores_lemes(gray.astype(np.uint8))
    else:
        from ..poredet.architectures import make_architecture
        from ..poredet.inference import detect_pores_in_image
        from ..poredet.train import load_variables
        model = make_architecture(detector_args["arch"])
        variables = load_variables(detector_args["checkpoint"])
        coords, _ = detect_pores_in_image(
            model, variables, gray.astype(np.uint8),
            probability=detector_args["probability"],
            nms_iou=detector_args["nms_iou"])
    return [[f"{prefix}_{i}", float(x), float(y)]
            for i, (x, y) in enumerate(np.asarray(coords))]


def main(argv=None):
    ap = argparse.ArgumentParser(
        description="Verify whether two fingerprint images match")
    ap.add_argument("image1")
    ap.add_argument("image2")
    ap.add_argument("--kpts1", default=None,
                    help="keypoint file for image1 (.tsv/.csv/.txt); "
                         "omitted → pore detector")
    ap.add_argument("--kpts2", default=None)
    ap.add_argument("--detector", default="dpf", choices=["dpf", "cnn"],
                    help="pore detector when no keypoint file is given")
    ap.add_argument("--detector-arch", default="net17nomax")
    ap.add_argument("--detector-checkpoint", default=None)
    ap.add_argument("--detector-probability", type=float, default=0.65)
    ap.add_argument("--detector-nms-iou", type=float, default=0.2)
    ap.add_argument("--checkpoint-dir", default="checkpoints")
    ap.add_argument("--checkpoint", default=None,
                    help="checkpoint name (default: latest in meta)")
    ap.add_argument("--score", default="fused",
                    choices=["fused", "cls", "k"],
                    help="verification score: fused cls*k (default, 8x "
                         "lower sibling-impostor EER), reference-design "
                         "cls, or k alone")
    ap.add_argument("--discretize", default="greedy",
                    choices=["greedy", "hungarian"],
                    help="'hungarian' reproduces the reference's full "
                         "discretization (host LAPJV between jit segments, "
                         "ngm.py:444-449); 'greedy' (default) ranks by the "
                         "soft-top-k map directly")
    ap.add_argument("--threshold", type=float, default=None,
                    help="decision threshold; when set, the JSON carries "
                         "a genuine true/false verdict")
    ap.add_argument("--viz", default=None,
                    help="write a keypoint-match visualization PNG here")
    ap.add_argument("--n-max", type=int, default=64)
    ap.add_argument("--e-max", type=int, default=384)
    ap.add_argument("--univ", type=int, default=600)
    ap.add_argument("--node-taps", default="layer3")
    ap.add_argument("--cls-k-features", action="store_true")
    ap.add_argument("--hyperedge", action="store_true")
    ap.add_argument("--bf16", action="store_true",
                    help="bfloat16 compute path (f32 checkpoints load "
                         "unchanged)")
    ap.add_argument("--univ-kernel", action=argparse.BooleanOptionalAction,
                    default=None,
                    help="route the assoc-GNN aggregations through the v3 "
                         "Pallas kernel (default: auto, on when "
                         "--n-max >= 256)")
    args = ap.parse_args(argv)

    import jax

    from . import model_config_from_args
    from ..core.build_graphs import build_edges, delaunay_triangles
    from ..core.config import default_stages
    from ..data.augmentation import standardize
    from ..data.pipeline import PairSample, _load_image, collate
    from ..models.ngm import NGMNet
    from ..train.checkpoints import read_meta, restore_params
    from ..train.state import create_state
    from ..train.step import make_eval_step

    cfg = model_config_from_args(args)

    det_args = {"arch": args.detector_arch,
                "checkpoint": args.detector_checkpoint,
                "probability": args.detector_probability,
                "nms_iou": args.detector_nms_iou}

    # ---- build the single matching problem --------------------------------
    img1, img2 = _load_image(args.image1), _load_image(args.image2)
    an1 = _load_annos(img1, args.kpts1, "q1", args.detector, det_args)
    an2 = _load_annos(img2, args.kpts2, "q2", args.detector, det_args)
    if not an1 or not an2:
        print(json.dumps({"error": "no keypoints found",
                          "n_kpts": [len(an1), len(an2)]}))
        return 2
    i1, a1 = standardize(img1, an1)
    i2, a2 = standardize(img2, an2)
    a1, a2 = a1[:args.n_max], a2[:args.n_max]
    if not a1 or not a2:
        # standardize's 240x320 center crop can drop every keypoint
        print(json.dumps({"error": "no keypoints inside the standardized "
                                   "240x320 crop",
                          "n_kpts": [len(a1), len(a2)]}))
        return 2
    P1 = np.array([[x, y] for _, x, y in a1], np.float32).reshape(-1, 2)
    P2 = np.array([[x, y] for _, x, y in a2], np.float32).reshape(-1, 2)
    _, s1, d1 = build_edges(P1, stg=cfg.data.src_graph_construct)
    _, s2, d2 = build_edges(P2, stg=cfg.data.src_graph_construct)
    s1, d1 = s1[:args.e_max], d1[:args.e_max]
    s2, d2 = s2[:args.e_max], d2[:args.e_max]
    tris = None
    if cfg.ngm.hyperedge:
        tris = (delaunay_triangles(P1)[:cfg.shapes.t_max],
                delaunay_triangles(P2)[:cfg.shapes.t_max])
    sample = PairSample(images=(i1, i2), points=(P1, P2),
                        edges=((s1, d1), (s2, d2)),
                        perm=np.zeros((len(P1), len(P2)), np.float32),
                        label=0.0, cls=("q1", "q2"), tris=tris)
    batch = collate([sample], cfg)

    # ---- model + checkpoint ------------------------------------------------
    univ_plan = None
    if args.univ_kernel or (args.univ_kernel is None
                            and cfg.shapes.n_max >= 256):
        # UNIV-scale pairs route the 3 assoc-GNN aggregations through the
        # v3 Pallas kernel (kernels/assoc_univ_v3.py — 1.2x/1.8x the
        # chunked-XLA dispatch at n=600). Plan over the PADDED bucket: pad
        # nodes get x=+inf-ish coords (sorted last), no edges, Kp/Ke = 0.
        from ..kernels.assoc_univ_v3 import plan_univ_v3
        N = cfg.shapes.n_max
        pts2_pad = np.full((N, 2), 1e9, np.float32)
        pts2_pad[:len(P2)] = P2
        pts2_pad[len(P2):, 0] += np.arange(N - len(P2))  # stable sort order
        univ_plan = plan_univ_v3(pts2_pad, s1, d1, s2, d2, transpose=True,
                                 n1=N)
    model = NGMNet(cfg, univ_plan=univ_plan)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):  # eager init stays off the tunnel
        variables = model.init(jax.random.PRNGKey(0),
                               jax.device_put(batch, cpu), train=False)
    variables = jax.device_put(variables, jax.devices()[0])
    state = create_state(variables, default_stages()[-1])
    ckpt_name = args.checkpoint or read_meta(args.checkpoint_dir).get(
        "latest")
    if ckpt_name:
        restored = restore_params(args.checkpoint_dir, ckpt_name, state)
        state = state._replace(params=restored["params"],
                               batch_stats=restored["batch_stats"])
    else:
        print("WARNING: no checkpoint found — scoring with random weights",
              file=sys.stderr)

    _, out = make_eval_step(model, default_stages()[-1])(state, batch)
    if args.discretize == "hungarian":
        from ..ops.hungarian import hungarian_host
        from ..train.step import make_eval_step_masked
        mask = hungarian_host(np.asarray(out["ds_mat"]),
                              np.asarray(batch.n_nodes[:, 0]),
                              np.asarray(batch.n_nodes[:, 1]))
        _, out = make_eval_step_masked(model, default_stages()[-1])(
            state, batch, mask)

    cls_prob = float(np.asarray(out["cls_prob"])[0])
    k_prob = float(np.asarray(out["k_prob"])[0])
    score = {"fused": cls_prob * k_prob, "cls": cls_prob,
             "k": k_prob}[args.score]
    n1, n2 = len(P1), len(P2)
    perm = np.asarray(out["perm_mat"])[0][:n1, :n2]
    pairs = [[int(i), int(j)] for i, j in zip(*np.nonzero(perm))]
    result = {
        "score": round(score, 6),
        "score_kind": args.score,
        "cls_prob": round(cls_prob, 6),
        "k_prob": round(k_prob, 6),
        "k_pred": round(k_prob * min(n1, n2), 2),
        "n_kpts": [n1, n2],
        "n_matched": len(pairs),
        "matches": pairs,
        "checkpoint": ckpt_name,
    }
    if args.threshold is not None:
        result["threshold"] = args.threshold
        result["genuine"] = bool(score >= args.threshold)
    if args.viz:
        from ..utils.visualize import visualize_match
        visualize_match(np.asarray(batch.images[0]),
                        np.asarray(batch.points[0]),
                        np.asarray(batch.n_nodes[0]),
                        np.asarray(out["perm_mat"])[0],
                        float(result.get("genuine", -1.0)), score, args.viz,
                        unknown_label=args.threshold is None)
        result["viz"] = args.viz
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
