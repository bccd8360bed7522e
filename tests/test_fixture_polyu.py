"""Exercise the SplitDirDataset / PolyU layout + session pair protocol from
REAL committed files (tests/fixtures/PolyU-mini: root/{train,test,val} dirs,
PNG images + TSV keypoints with canonical pore ids) — not the synthetic
generator's R1..R5 layout."""
import os
from pathlib import Path

import numpy as np
import pytest

FIXTURE = Path(__file__).parent / "fixtures" / "PolyU-mini" / "DBII"


@pytest.fixture
def bench(tmp_path):
    from fpmatch_tpu.data.benchmark import make_benchmark

    return make_benchmark("PolyUDBII", "train", root=str(FIXTURE),
                          task="classify", output_dir=str(tmp_path))


def test_split_dir_index(bench):
    # 2 fingers x 2 sessions x 2 stances in train/
    assert len(bench.data_dict) == 8
    entry = next(iter(bench.data_dict.values()))
    assert os.path.exists(entry["path"])
    assert len(entry["kpts"]) == 12
    labs = [k["labels"] for k in entry["kpts"]]
    assert len(set(labs)) == 12  # canonical ids -> unique labels


def test_session_pair_protocol(bench):
    pairs = bench.classify_pairs()
    assert pairs
    genuine = [(a, b) for a, b in pairs if bench.is_genuine(a, b)]
    imposter = [(a, b) for a, b in pairs if not bench.is_genuine(a, b)]
    assert genuine and imposter
    # session protocol: genuine pairs cross sessions (…_1_s vs …_2_s)
    for a, b in genuine:
        sa = bench._parse_session_id(a)
        sb = bench._parse_session_id(b)
        assert sa is not None and sb is not None
        assert sa[0] == sb[0] and sa[1] != sb[1]


def test_matching_task_gt_from_tsv_ids(tmp_path):
    """The matching task builds GT permutations by canonical-id label
    equality across impressions of one finger, read from the TSVs."""
    from fpmatch_tpu.data.benchmark import make_benchmark

    bench = make_benchmark("PolyUDBII", "test", root=str(FIXTURE),
                           task="match", output_dir=str(tmp_path))
    cls = bench.classes[0]
    ids = [i for i, v in bench.data_dict.items() if v["cls"] == cls][:2]
    data_list, perm_dict, _ = bench.get_data(ids)
    perm = next(iter(perm_dict.values()))
    perm = np.asarray(perm)
    # all 12 canonical pores correspond across the two impressions
    assert perm.sum() == 12
    assert (perm.sum(0) <= 1).all() and (perm.sum(1) <= 1).all()


def test_pair_dataset_loads_fixture(tmp_path):
    """PairBatch assembly end-to-end from the committed files."""
    from fpmatch_tpu.core.config import Config, ShapeConfig
    from fpmatch_tpu.data.benchmark import make_benchmark
    from fpmatch_tpu.data.pipeline import PairDataset

    cfg = Config(shapes=ShapeConfig(n_max=16, e_max=96, t_max=32,
                                    univ_size=16))
    # "test" split: the classify protocol balances genuine pairs with
    # imposters, so it needs >= 2 fingers ("val" here has one -> 0 pairs)
    bench = make_benchmark("PolyUDBII", "test", root=str(FIXTURE),
                           task="classify", output_dir=str(tmp_path))
    pd = PairDataset(bench, cfg)
    assert len(pd.pairs) > 0
    sample = pd.get(0)
    assert len(sample.images) == 2 and sample.images[0].ndim == 3
    assert len(sample.points[0]) > 0
    assert all(np.isfinite(p).all() for p in sample.points)


def test_match_cli_on_fixture(tmp_path, capsys):
    """cli.match end-to-end from real committed files: two impressions of
    one finger, random weights (no checkpoint), tiny shapes — asserts the
    JSON contract, not the (untrained) score."""
    import json

    from fpmatch_tpu.cli.match import main

    d = FIXTURE / "test"
    viz = tmp_path / "m.png"
    rc = main([str(d / "f3_1_1.png"), str(d / "f3_2_1.png"),
               "--kpts1", str(d / "f3_1_1.tsv"),
               "--kpts2", str(d / "f3_2_1.tsv"),
               "--checkpoint-dir", str(tmp_path / "none"),
               "--n-max", "16", "--e-max", "96", "--univ", "32",
               "--threshold", "0.5", "--viz", str(viz)])
    assert rc == 0
    out = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    for key in ("score", "cls_prob", "k_prob", "n_kpts", "n_matched",
                "matches", "genuine"):
        assert key in out
    assert out["n_kpts"] == [12, 12]
    assert 0.0 <= out["score"] <= 1.0
    assert viz.exists()
