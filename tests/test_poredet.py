"""Pore-detection subpackage tests: architectures, patches, NMS, inference,
mutual-NN evaluation, DPF, and a tiny end-to-end training run."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from fpmatch_tpu.poredet.architectures import (ARCHITECTURES,
                                               make_architecture,
                                               receptive_field)
from fpmatch_tpu.poredet.patches import rasterize_pores, extract_balanced_patches
from fpmatch_tpu.poredet.inference import (detect_pores_in_image, nms_boxes,
                                           write_coordinates)
from fpmatch_tpu.poredet.evaluate import detection_scores
from fpmatch_tpu.poredet.dpf import detect_pores_dpf
from fpmatch_tpu.data.generator import render_fingerprint


def test_all_architectures_shrink_to_1x1():
    assert len(ARCHITECTURES) == 18
    for name in ARCHITECTURES:
        model = make_architecture(name, features=8)
        rf = receptive_field(name)
        # "max" variants shrink more than their nominal rf; feed a larger
        # window and just require a valid probability output
        win = rf if "max" not in name or "nomax" in name else rf * 2 + 7
        x = jnp.zeros((2, win, win, 1))
        variables = model.init(
            {"params": jax.random.PRNGKey(0),
             "dropout": jax.random.PRNGKey(1)}, x, train=False)
        out = model.apply(variables, x, train=False)
        assert out.shape[0] == 2 and out.shape[-1] == 1
        assert float(out.min()) >= 0 and float(out.max()) <= 1
        if "nomax" in name or name in ("su",):
            assert out.shape[1] == out.shape[2] == win - rf + 1


def test_rasterize_and_patches():
    rng = np.random.default_rng(0)
    img, pores = render_fingerprint(5, size=(120, 100), n_pores=30)
    label = rasterize_pores(img.shape, pores, radius=2)
    assert label.max() == 1.0
    x, y = extract_balanced_patches(img, pores, window=17, rng=rng)
    assert x.shape[1:] == (17, 17, 1)
    assert set(np.unique(y)) == {0.0, 1.0}
    assert abs((y == 1).sum() - (y == 0).sum()) <= 1


def test_nms():
    coords = np.array([[10, 10], [11, 11], [40, 40]])
    scores = np.array([0.9, 0.8, 0.7])
    keep = nms_boxes(coords, scores, box_size=17, iou_threshold=0.2)
    assert 0 in keep and 2 in keep and 1 not in keep


def test_mutual_nn_eval():
    gt = np.array([[10, 10], [50, 50], [90, 90]], np.float32)
    pred = np.array([[11, 10], [52, 49], [200, 200]], np.float32)
    s = detection_scores(gt, pred)
    assert s["true_detections"] == 2
    assert s["precision"] == pytest.approx(2 / 3)
    assert s["recall"] == pytest.approx(2 / 3)


def test_dpf_detects_pores():
    img, pores = render_fingerprint(7, size=(240, 200), n_pores=60)
    det = detect_pores_dpf(img)
    assert len(det) > 5
    s = detection_scores(pores, det)
    # classical detector on clean synthetic ridges should recall over half
    assert s["recall"] > 0.3, s


def test_detector_training_end_to_end():
    from fpmatch_tpu.poredet.train import train_pore_detector

    imgs, gts = [], []
    for i in range(3):
        img, pores = render_fingerprint(20 + i, size=(160, 140), n_pores=40)
        imgs.append(img)
        gts.append(pores)
    best = train_pore_detector("net13nomax", imgs[:2], gts[:2], imgs[2:],
                               gts[2:], features=8, epochs=2, batch_size=32,
                               log_fn=lambda *_: None)
    assert best["f_score"] >= 0.0
    assert "variables" in best
    # full-image inference emits coordinates within bounds
    pred, pmap = detect_pores_in_image(
        make_architecture("net13nomax", 8), best["variables"], imgs[2],
        probability=0.5, window=13)
    assert pmap.shape == (160 - 12, 140 - 12)
    if len(pred):
        assert pred[:, 0].max() < 140 and pred[:, 1].max() < 160


def test_final_test_phases_dual_ranges():
    """TEST I/II final-evaluation parity (pore-detection/train.py:694-830)."""
    from fpmatch_tpu.poredet.architectures import make_architecture
    from fpmatch_tpu.poredet.train import final_test_phases, train_pore_detector

    imgs, gts = [], []
    for i in range(4):
        img, pores = render_fingerprint(40 + i, size=(160, 140), n_pores=40)
        imgs.append(img)
        gts.append(pores)
    best = train_pore_detector("net13nomax", imgs[:2], gts[:2], imgs[2:3],
                               gts[2:3], features=8, epochs=1, batch_size=32,
                               log_fn=lambda *_: None)
    model = make_architecture("net13nomax", 8)
    reports = final_test_phases(
        model, best["variables"],
        {"test_i": (imgs[2:3], gts[2:3]), "test_ii": (imgs[3:], gts[3:])},
        window=13, probability=0.5, nms_iou=0.2, log_fn=lambda *_: None)
    assert set(reports) == {"test_i", "test_ii"}
    for r in reports.values():
        assert 0.0 <= r["true_detection_rate"] <= 1.0
        assert 0.0 <= r["false_detection_rate"] <= 1.0


def test_lemes_dpf_detects_synthetic_pores():
    """Faithful vectorized Lemes port (pore-detection/dpf.py:133-592):
    sane quality on synthetic ridges and in-bounds centroids."""
    from fpmatch_tpu.poredet.dpf import detect_pores_lemes
    from fpmatch_tpu.poredet.evaluate import detection_scores

    img, gt = render_fingerprint(70, size=(240, 200), n_pores=60)
    pred = detect_pores_lemes(img)
    assert len(pred) > 10
    assert (pred[:, 0] >= 0).all() and (pred[:, 0] < 200).all()
    assert (pred[:, 1] >= 0).all() and (pred[:, 1] < 240).all()
    r = detection_scores(gt, pred)
    assert r["f_score"] > 0.3


def test_variables_save_load_roundtrip(tmp_path):
    """npz persistence for trained detectors (scripts/train_poredet.py)."""
    import numpy as np
    from fpmatch_tpu.poredet.train import save_variables, load_variables

    v = {"params": {"conv": {"kernel": np.arange(12.0).reshape(3, 2, 2)}},
         "batch_stats": {"bn": {"mean": np.zeros(4), "var": np.ones(4)}}}
    path = str(tmp_path / "det.npz")
    save_variables(path, v)
    w = load_variables(path)
    np.testing.assert_array_equal(np.asarray(w["params"]["conv"]["kernel"]),
                                  v["params"]["conv"]["kernel"])
    np.testing.assert_array_equal(np.asarray(w["batch_stats"]["bn"]["var"]),
                                  v["batch_stats"]["bn"]["var"])
