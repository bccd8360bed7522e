"""CLI-level multi-device training: the user-facing `--n-devices/--mesh`
flags (fpmatch_tpu/cli/train.py) must drive the same training math as a
single-device run — the mesh is an execution detail, not a model change.

Reference equivalent: src/parallel/data_parallel.py:6-18 (constructed but
commented out in train.py:148); here the path is wired and tested.
"""
import numpy as np
import pytest

pytestmark = pytest.mark.xdist_group("cli")

from fpmatch_tpu.cli.train import main as train_main, parse_mesh_spec
from fpmatch_tpu.data.generator import generate_synthetic_dataset


def test_parse_mesh_spec_defaults():
    # 0/1 = single device (no mesh); -1 = all visible; DxE parses both axes
    assert parse_mesh_spec("dp", 0) == (1, 1)
    assert parse_mesh_spec("dp", 1) == (1, 1)
    assert parse_mesh_spec("dp", 2) == (2, 1)
    assert parse_mesh_spec("2x4", 0) == (2, 4)
    with pytest.raises(ValueError):
        parse_mesh_spec("ring", 0)


def test_cli_train_mesh_matches_single_device(tmp_path):
    """One epoch of stage 1 through the real CLI entry, single device vs a
    2-device data mesh: finite losses, final eval loss allclose."""
    root = str(tmp_path / "Synthetic")
    generate_synthetic_dataset(root, fingers_per_split=(4, 2, 2),
                               n_pores=40, seed=0, size=(320, 280))
    common = ["--data-root", root, "--stages", "1", "--epochs", "1",
              "--passes", "1", "--length", "4", "--batch-size", "2",
              "--test-length", "4", "--n-max", "16", "--e-max", "96",
              "--univ", "24", "--thread-workers"]
    r_single = train_main(common + ["--checkpoint-dir", str(tmp_path / "c1"),
                                    "--log-dir", str(tmp_path / "tb")])
    r_mesh = train_main(common + ["--n-devices", "2",
                                  "--checkpoint-dir", str(tmp_path / "c2")])
    assert np.isfinite(r_mesh["loss"]) and np.isfinite(r_mesh["total_loss"])
    # same data order (seeded loader), same init (seeded), same math up to
    # cross-device reduction order
    np.testing.assert_allclose(r_mesh["loss"], r_single["loss"], rtol=2e-3)
    np.testing.assert_allclose(r_mesh["accuracy"], r_single["accuracy"])
    # --log-dir produced observability artifacts through the real CLI path
    import json
    rows = [json.loads(l) for l in
            (tmp_path / "tb" / "metrics.jsonl").read_text().splitlines()]
    assert rows and any("stage1/val_total_loss" in r for r in rows)
