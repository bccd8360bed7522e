"""Parity test: reference shipped pore-detector weights through our Flax
detector vs a functional torch evaluation of the same state dict."""
import os

import numpy as np
import pytest

REF_WEIGHTS = ("/root/reference/pore-detection/out_of_the_box_detect/"
               "models/40")

pytestmark = pytest.mark.skipif(not os.path.exists(REF_WEIGHTS),
                                reason="reference weights not mounted")


def torch_eval(sd, x_nchw, num_layers=8):
    """Evaluate the reference detector graph functionally: valid conv →
    relu → batchnorm(eval) per block, final conv + sigmoid."""
    import torch
    import torch.nn.functional as F

    x = torch.from_numpy(x_nchw)
    with torch.no_grad():
        for i in range(num_layers - 1):
            x = F.conv2d(x, sd[f"net.{i}.block.0.weight"])
            x = F.relu(x)
            x = F.batch_norm(
                x, sd[f"net.{i}.block.2.running_mean"],
                sd[f"net.{i}.block.2.running_var"],
                sd[f"net.{i}.block.2.weight"], sd[f"net.{i}.block.2.bias"],
                training=False, eps=1e-5)
        x = F.conv2d(x, sd[f"net.{num_layers - 1}.weight"],
                     sd[f"net.{num_layers - 1}.bias"])
        return torch.sigmoid(x).numpy()


def test_reference_weights_parity(rng):
    import torch
    from fpmatch_tpu.poredet.convert import load_reference_detector

    model, variables = load_reference_detector(REF_WEIGHTS)
    sd = torch.load(REF_WEIGHTS, map_location="cpu", weights_only=False)

    x = rng.uniform(size=(2, 33, 41, 1)).astype(np.float32)
    got = np.asarray(model.apply(variables, x, train=False))
    want = torch_eval(sd, x.transpose(0, 3, 1, 2)).transpose(0, 2, 3, 1)
    assert got.shape == want.shape == (2, 17, 25, 1)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_reference_weights_detect_synthetic():
    """The imported reference detector produces plausible detections on our
    synthetic fingerprints (out-of-the-box pipeline parity)."""
    from fpmatch_tpu.data.generator import render_fingerprint
    from fpmatch_tpu.poredet.convert import load_reference_detector
    from fpmatch_tpu.poredet.inference import detect_pores_in_image

    model, variables = load_reference_detector(REF_WEIGHTS)
    img, pores = render_fingerprint(11, size=(240, 200), n_pores=60)
    coords, pmap = detect_pores_in_image(model, variables, img,
                                         probability=0.65, window=17,
                                         nms_iou=0.2)
    assert pmap.shape == (240 - 16, 200 - 16)
    assert np.isfinite(pmap).all()
    # trained on real pores; synthetic domain differs — just require sane
    # output bounds and a nonempty detection set at a permissive threshold
    if len(coords) == 0:
        coords, _ = detect_pores_in_image(model, variables, img,
                                          probability=0.3, window=17,
                                          nms_iou=0.2)
    assert len(coords) > 0
    assert coords[:, 0].max() < 200 and coords[:, 1].max() < 240
