"""Data pipeline tests: generator → dataset index → benchmark pairs →
augmentation → PairBatch collation; determinism."""
import numpy as np
import pytest

from fpmatch_tpu.core.config import Config, ShapeConfig
from fpmatch_tpu.data.generator import generate_synthetic_dataset, render_fingerprint
from fpmatch_tpu.data.dataset import L3SFV2AugmentedDataset
from fpmatch_tpu.data.benchmark import Benchmark, make_benchmark
from fpmatch_tpu.data.pipeline import PairDataset, DataLoader, collate
from fpmatch_tpu.data.augmentation import (augment_image, augment_image_pair,
                                           standardize, TRANSFORMS)


@pytest.fixture(scope="module")
def synth_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth") / "Synthetic"
    generate_synthetic_dataset(str(root), fingers_per_split=(6, 3, 2),
                               n_pores=60, seed=1, size=(240, 200))
    return str(root)


@pytest.fixture(scope="module")
def cfg():
    return Config(shapes=ShapeConfig(n_max=48, e_max=288, t_max=96,
                                     univ_size=64))


def test_generator_output(synth_root):
    import os
    for r in ("R1", "R2", "R3", "R4", "R5"):
        assert os.path.isdir(os.path.join(synth_root, r))
    img, pores = render_fingerprint(0, size=(240, 200), n_pores=50)
    assert img.shape == (240, 200) and img.dtype == np.uint8
    assert 20 <= len(pores) <= 50
    # pores within bounds
    assert (pores[:, 0] < 200).all() and (pores[:, 1] < 240).all()
    # determinism
    img2, pores2 = render_fingerprint(0, size=(240, 200), n_pores=50)
    np.testing.assert_array_equal(img, img2)


def test_dataset_index(synth_root, tmp_path):
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx"))
    idx = ds.load_index()
    assert len(idx) == 6
    entry = next(iter(idx.values()))
    assert {"path", "cls", "kpts", "univ_size"} <= set(entry)
    assert entry["univ_size"] > 10
    kp = entry["kpts"][0]
    assert {"labels", "x", "y"} <= set(kp)


def test_benchmark_pairs(synth_root, tmp_path):
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx2"),
                                task="classify")
    bench = Benchmark(ds)
    pairs = bench.classify_pairs()
    genuine = [p for p in pairs if bench.is_genuine(*p)]
    imposter = [p for p in pairs if not bench.is_genuine(*p)]
    assert len(genuine) == len(imposter) > 0          # train-mode balancing
    assert all(a == b for a, b in genuine)            # self-pair protocol


def test_augmentation_keypoint_consistency():
    rng = np.random.default_rng(0)
    img, pores = render_fingerprint(3, size=(240, 200), n_pores=60)
    img3 = np.stack([img] * 3, -1)
    annos = [[f"p{i}", float(x), float(y)] for i, (x, y) in enumerate(pores)]
    for name in TRANSFORMS:
        out, ann = TRANSFORMS[name](img3.copy(), list(annos), rng)
        assert out is not None and len(ann) > 0
        for lab, x, y in ann:
            assert 0 <= x < out.shape[1] + 1 and 0 <= y < out.shape[0] + 1
    aug_img, aug_ann = augment_image(img3, annos, rng, min_points=5)
    assert len(aug_ann) >= 5
    assert aug_img.shape[:2] == (240, 320)


def test_pair_dataset_and_loader(synth_root, tmp_path, cfg):
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx3"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=True)
    s = pd.get(0)
    assert s.images[0].shape[:2] == (240, 320)
    n1, n2 = len(s.points[0]), len(s.points[1])
    assert s.perm.shape == (n1, n2)
    if s.label == 1.0:
        assert np.trace(s.perm) == min(n1, n2)

    loader = DataLoader(pd, cfg, batch_size=4, shuffle=True, num_workers=2)
    batch = next(iter(loader))
    assert batch.images.shape == (4, 2, 240, 320, 3)
    assert batch.points.shape == (4, 2, 48, 2)
    assert batch.gt_perm.shape == (4, 48, 48)
    assert np.asarray(batch.n_nodes).max() <= 48
    assert np.asarray(batch.n_edges).max() <= 288
    # labels present in both classes over a couple of batches
    labels = np.asarray(batch.label)
    assert set(np.unique(labels)) <= {0.0, 1.0}


def test_pipeline_determinism(synth_root, tmp_path, cfg):
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx4"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=True, seed=7)
    a = pd.get(3, epoch=2)
    b = pd.get(3, epoch=2)
    np.testing.assert_array_equal(a.images[0], b.images[0])
    np.testing.assert_array_equal(a.points[1], b.points[1])
    c = pd.get(3, epoch=3)
    assert not np.array_equal(a.images[0], c.images[0])  # epoch varies


def test_elastic_keypoints_track_the_warp():
    """A keypoint on a bright dot must still sit on that dot after the
    elastic warp (remap is a backward map → keypoints move by −d; the
    reference's +d convention drifts ~2|d|)."""
    import cv2
    from fpmatch_tpu.data.augmentation import _t_elastic

    errs = []
    for seed in range(6):
        rng = np.random.default_rng(seed)
        img = np.zeros((200, 240, 3), np.uint8)
        x0, y0 = 120, 100
        cv2.circle(img, (x0, y0), 3, (255, 255, 255), -1)
        out, ann = _t_elastic(img, [["p", float(x0), float(y0)]], rng)
        if not ann:
            continue
        ys, xs = np.nonzero(out[..., 0] > 128)
        cx, cy = xs.mean(), ys.mean()
        errs.append(np.hypot(ann[0][1] - cx, ann[0][2] - cy))
    assert errs and float(np.mean(errs)) < 1.5, errs


@pytest.fixture(scope="module")
def session_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_sess") / "Synthetic"
    generate_synthetic_dataset(str(root), fingers_per_split=(3, 3, 2),
                               n_pores=80, seed=2, size=(240, 200),
                               sessions=2, stances=2)
    return str(root)


def test_multi_impression_generator(session_root):
    import os
    files = sorted(os.listdir(os.path.join(session_root, "R4")))
    stems = {f[:-4] for f in files if f.endswith(".jpg")}
    # 3 test fingers x 2 sessions x 2 stances
    assert len(stems) == 12
    assert any(s.endswith("_1_1") for s in stems)
    # impressions of one finger share canonical pore ids with partial overlap
    from fpmatch_tpu.data.generator import render_impression
    _, p1, id1 = render_impression(11, 1001)
    _, p2, id2 = render_impression(11, 2002)
    shared = set(id1[id1 >= 0]) & set(id2[id2 >= 0])
    assert 10 < len(shared) < min((id1 >= 0).sum(), (id2 >= 0).sum())


def test_session_benchmark_protocol(session_root, tmp_path):
    bm = make_benchmark("Synthetic", "test", root=str(session_root),
                        task="classify")
    pairs = bm.classify_pairs()
    genuine = [p for p in pairs if bm.is_genuine(*p)]
    imposter = [p for p in pairs if not bm.is_genuine(*p)]
    assert genuine and imposter
    # genuine pairs cross sessions (never the same image twice)
    assert all(a != b for a, b in genuine)
    for a, b in genuine[:4]:
        assert a.rsplit("_", 2)[0] == b.rsplit("_", 2)[0]   # same finger
        assert a.rsplit("_", 2)[1] != b.rsplit("_", 2)[1]   # different session


def test_cross_impression_pair_has_partial_gt(session_root, tmp_path, cfg):
    bm = make_benchmark("Synthetic", "test", root=str(session_root),
                        task="match")
    pd = PairDataset(bm, cfg, augment=False)
    cross = next(i for i, p in enumerate(pd.pairs)
                 if p[0] != p[1] and bm.is_genuine(*p))
    s = pd.get(cross)
    n1, n2 = len(s.points[0]), len(s.points[1])
    assert s.perm.shape == (n1, n2)
    k = s.perm.sum()
    assert 0 < k <= min(n1, n2)          # partial overlap: not a full perm
    assert (s.perm.sum(0) <= 1).all() and (s.perm.sum(1) <= 1).all()


def test_imposter_pair_zero_perm(synth_root, tmp_path, cfg):
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx5"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=False)
    imposter_idx = next(i for i, p in enumerate(pd.pairs)
                        if not bench.is_genuine(*p))
    s = pd.get(imposter_idx)
    assert s.label == 0.0
    assert s.perm.sum() == 0


def test_process_loader_matches_thread_loader(synth_root, tmp_path, cfg):
    """Worker processes (spawn) must yield byte-identical batches to the
    thread loader — the per-(seed,epoch,idx) RNG makes sample content
    independent of worker scheduling."""
    ds = L3SFV2AugmentedDataset("train", root=synth_root,
                                output_dir=str(tmp_path / "idx_proc"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=True, seed=11)
    lt = DataLoader(pd, cfg, batch_size=4, shuffle=False, num_workers=2,
                    use_processes=False)
    lp = DataLoader(pd, cfg, batch_size=4, shuffle=False, num_workers=2,
                    use_processes=True)
    bt = next(iter(lt))
    bp = next(iter(lp))
    np.testing.assert_array_equal(np.asarray(bt.images),
                                  np.asarray(bp.images))
    np.testing.assert_array_equal(np.asarray(bt.gt_perm),
                                  np.asarray(bp.gt_perm))
    np.testing.assert_array_equal(np.asarray(bt.src), np.asarray(bp.src))


def test_val_sample_cache(synth_root, tmp_path, cfg):
    """A cache=True deterministic loader serves identical batches on every
    epoch without re-running the host pipeline."""
    ds = L3SFV2AugmentedDataset("val", root=synth_root,
                                output_dir=str(tmp_path / "idx_cache"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=False)
    loader = DataLoader(pd, cfg, batch_size=4, shuffle=False, num_workers=1,
                        cache=True)
    first = [np.asarray(b.images) for b in loader]
    assert loader._cached is not None
    calls = []
    orig = pd.get
    pd.get = lambda *a, **k: (calls.append(a), orig(*a, **k))[1]
    second = [np.asarray(b.images) for b in loader]
    assert not calls  # cache hit: host pipeline not re-run
    for a, b in zip(first, second):
        np.testing.assert_array_equal(a, b)


def test_grayscale_collate_equivalent(synth_root, tmp_path, cfg):
    """image_channels=1 ships luma; for grayscale sources (all fingerprint
    data — 3 identical channels) the on-device broadcast reproduces the RGB
    batch exactly."""
    import dataclasses
    import jax
    from fpmatch_tpu.data.pipeline import collate

    ds = L3SFV2AugmentedDataset("val", root=synth_root,
                                output_dir=str(tmp_path / "idx_gray"),
                                task="classify")
    bench = Benchmark(ds)
    pd = PairDataset(bench, cfg, augment=False)
    samples = [pd.get(i) for i in range(2)]
    cfg1 = dataclasses.replace(
        cfg, data=dataclasses.replace(cfg.data, image_channels=1))
    b3 = collate(samples, cfg)
    b1 = collate(samples, cfg1)
    assert b1.images.shape[-1] == 1 and b1.images.dtype == np.uint8
    # un-augmented generator output is pure grayscale -> luma == channel 0
    np.testing.assert_array_equal(b1.images[..., 0], b3.images[..., 0])


def test_sibling_fingers_hard_impostors(tmp_path):
    """sibling_fraction writes same-ridge-field / independent-pore fingers:
    the hard impostor pairs of pore verification."""
    from fpmatch_tpu.data.generator import _render_canonical

    img_a, pores_a = _render_canonical(7, (120, 100), 9.0, 40,
                                       draw_pores=False)
    img_b, pores_b = _render_canonical(7, (120, 100), 9.0, 40,
                                       draw_pores=False, pore_seed=12345)
    np.testing.assert_array_equal(img_a, img_b)  # identical ridge field
    common = (set(map(tuple, pores_a.tolist()))
              & set(map(tuple, pores_b.tolist())))
    assert len(common) < 0.2 * len(pores_a)  # independent pore layouts

    root = tmp_path / "SynthSib"
    generate_synthetic_dataset(str(root), fingers_per_split=(2, 2, 0),
                               n_pores=40, seed=3, size=(120, 100),
                               sessions=2, stances=1, sibling_fraction=0.5)
    import os
    test_stems = {f[:-4] for f in os.listdir(root / "R4")
                  if f.endswith(".jpg")}
    # 2 test fingers + 1 sibling, x2 sessions
    assert len(test_stems) == 6


def test_sibling_map_guarantees_hard_pairs(tmp_path):
    """The generator records sibling partnerships in siblings.json; the
    session pair protocol then serves EVERY sibling cross-session pair to
    training (guaranteed hard negatives) and appends the extra enumerations
    to the test set."""
    import json
    import os

    root = tmp_path / "SynthSibMap"
    generate_synthetic_dataset(str(root), fingers_per_split=(4, 2, 0),
                               n_pores=40, seed=5, size=(120, 100),
                               sessions=2, stances=2, sibling_fraction=0.5)
    mapping = json.loads((root / "siblings.json").read_text())
    assert len(mapping) == 3          # 2 train siblings + 1 test sibling

    def sib_pairs(bm, pairs):
        person = {k: v["cls"] for k, v in bm.data_dict.items()}
        bare = lambda p: p.split("_", 1)[1]
        pset = {frozenset((s, t)) for s, t in mapping.items()}
        return [p for p in pairs
                if frozenset((bare(person[p[0]]), bare(person[p[1]]))) in pset]

    bm = make_benchmark("Synthetic", "train", root=str(root), task="classify",
                        output_dir=str(tmp_path / "i1"))
    pairs = bm.classify_pairs()
    # every sibling cross-session pair is served: 2 siblings x 2 directions
    # x (2 stances x 2 stances) = 16
    assert len(sib_pairs(bm, pairs)) == 16
    genuine = [p for p in pairs if bm.is_genuine(*p)]
    assert len(genuine) == len(pairs) - len(genuine)   # still balanced

    bm_t = make_benchmark("Synthetic", "test", root=str(root),
                          task="classify", output_dir=str(tmp_path / "i2"))
    assert len(sib_pairs(bm_t, bm_t.classify_pairs())) == 8  # 1 sibling


def test_train_imposter_truncation_is_shuffled(tmp_path):
    """Balancing must sample the imposter pool, not take a prefix — the
    ordered list is grouped by person, so a prefix draws impostors from the
    first few fingers only."""
    root = tmp_path / "SynthShuf"
    generate_synthetic_dataset(str(root), fingers_per_split=(10, 0, 0),
                               n_pores=40, seed=6, size=(120, 100),
                               sessions=2, stances=1)
    bm = make_benchmark("Synthetic", "train", root=str(root), task="classify",
                        output_dir=str(tmp_path / "i3"))
    pairs = bm.classify_pairs()
    imposters = [p for p in pairs if not bm.is_genuine(*p)]
    persons = {bm.data_dict[i]["cls"] for p in imposters for i in p}
    assert len(imposters) == 10       # balanced against 10 genuine
    assert len(persons) >= 8          # drawn across the population
    assert bm.classify_pairs() == pairs   # deterministic


def test_add_sibling_fingers_extends_dataset(tmp_path):
    """add_sibling_fingers grows sibling fingers next to their partners in an
    existing dataset and the ridge fields match the partner's exactly."""
    from fpmatch_tpu.data.generator import add_sibling_fingers

    root = tmp_path / "SynthExt"
    generate_synthetic_dataset(str(root), fingers_per_split=(3, 0, 0),
                               n_pores=40, seed=9, size=(120, 100),
                               sessions=2, stances=1)
    mapping = add_sibling_fingers(str(root), [0, 2], offset=100, seed=9,
                                  n_pores=40, size=(120, 100),
                                  sessions=2, stances=1)
    assert mapping == {"f0100": "f0000", "f0102": "f0002"}
    # sibling lives in the partner's split dir, all impressions written
    assert (root / "R1" / "f0100_1_1.jpg").exists()
    assert (root / "R1" / "f0100_2_1.tsv").exists()
    assert (root / "R3" / "f0102_1_1.jpg").exists()
