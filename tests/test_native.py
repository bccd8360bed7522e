"""Native C++ runtime tests: LAPJV vs scipy on random instances, NMS parity
with the numpy implementation."""
import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

from fpmatch_tpu import native


def test_native_builds():
    assert native.available(), "g++ build of the native library failed"


@pytest.mark.parametrize("n,trials", [(5, 50), (20, 20), (60, 10)])
def test_lapjv_optimal_vs_scipy(rng, n, trials):
    for t in range(trials):
        scores = rng.normal(size=(1, n, n)).astype(np.float32)
        out = native.lap_maximize_batch(scores, np.array([n]), np.array([n]))
        r, c = linear_sum_assignment(-scores[0])
        want_total = scores[0][r, c].sum()
        got_total = (out[0] * scores[0]).sum()
        assert out[0].sum() == n
        np.testing.assert_allclose(got_total, want_total, rtol=1e-4,
                                   err_msg=f"trial {t}: suboptimal")


def test_lapjv_rectangular(rng):
    scores = rng.uniform(size=(3, 12, 12)).astype(np.float32)
    n1 = np.array([5, 12, 8])
    n2 = np.array([9, 12, 3])
    out = native.lap_maximize_batch(scores, n1, n2)
    for b in range(3):
        a, c = n1[b], n2[b]
        assert out[b].sum() == min(a, c)
        assert out[b, a:].sum() == 0 and out[b, :, c:].sum() == 0
        r, col = linear_sum_assignment(-scores[b, :a, :c])
        want = scores[b, :a, :c][r, col].sum()
        got = (out[b] * scores[b]).sum()
        np.testing.assert_allclose(got, want, rtol=1e-4)


def test_nms_matches_numpy(rng):
    from fpmatch_tpu.poredet.inference import nms_boxes

    m = 200
    coords = rng.integers(0, 100, size=(m, 2)).astype(np.int32)
    scores = rng.uniform(size=m).astype(np.float32)
    got = native.nms_fixed_boxes(coords, scores, 17, 0.2)
    want = nms_boxes(coords, scores, 17, 0.2)
    np.testing.assert_array_equal(np.sort(got), np.sort(want))
