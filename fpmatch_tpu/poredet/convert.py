"""Import the reference's shipped pore-detector weights.

The reference distributes trained patch CNNs as raw state dicts keyed by
feature count (pore-detection/out_of_the_box_detect/models/{4..64}; loaded by
util/utils.py:68-114 into net{N}{max,nomax} stacks). This module converts
such a state dict into PlainPoreNet variables so out-of-the-box detection
(pore_detect_clean.py parity: model "40", window 17, prob 0.65, NMS 0.2)
runs natively on TPU.

Layout mapping: torch blocks `net.{i}.block.0` = Conv (OIHW, no bias),
`net.{i}.block.2` = BatchNorm; final `net.{L-1}` = Conv with bias.
Flax: LayerBlock_i/{Conv_0 (HWIO), BatchNorm_0}, head Conv_0.
"""
from __future__ import annotations

from typing import Any, Dict

import numpy as np


def convert_pore_state_dict(state_dict: Dict[str, Any], num_layers: int = 8
                            ) -> Dict[str, Any]:
    """torch OrderedDict → {params, batch_stats} for PlainPoreNet."""

    def arr(key):
        v = state_dict[key]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v)

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    for i in range(num_layers - 1):
        conv_w = arr(f"net.{i}.block.0.weight")       # (O, I, kH, kW)
        params[f"LayerBlock_{i}"] = {
            "Conv_0": {"kernel": conv_w.transpose(2, 3, 1, 0)},
            "BatchNorm_0": {
                "scale": arr(f"net.{i}.block.2.weight"),
                "bias": arr(f"net.{i}.block.2.bias"),
            },
        }
        stats[f"LayerBlock_{i}"] = {
            "BatchNorm_0": {
                "mean": arr(f"net.{i}.block.2.running_mean"),
                "var": arr(f"net.{i}.block.2.running_var"),
            },
        }
    head = num_layers - 1
    params["Conv_0"] = {
        "kernel": arr(f"net.{head}.weight").transpose(2, 3, 1, 0),
        "bias": arr(f"net.{head}.bias"),
    }
    return {"params": params, "batch_stats": stats}


def load_reference_detector(path: str, features: int = 40,
                            num_layers: int = 8):
    """Load a reference weights file → (model, variables)."""
    import torch

    from .architectures import PlainPoreNet

    sd = torch.load(path, map_location="cpu", weights_only=False)
    variables = convert_pore_state_dict(sd, num_layers=num_layers)
    model = PlainPoreNet(features=features, num_layers=num_layers,
                         max_pool=False)
    return model, variables
