"""ResNet-18 backbone in Flax, split into the three logical chunks the
matcher consumes (reference src/model/feature_extractor.py:34-57):

  node_features   — conv1..layer3 output, stride 16, 256 channels
  edge_features   — layer4 output, stride 32, 512 channels
  global_features — adaptive max-pool of layer4, 512-d

NHWC layout throughout (TPU-native). ImageNet-pretrained initialization is
unavailable offline; `load_torch_resnet18` converts a torchvision state_dict
file into this module's parameter tree when one is provided.
"""
from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax.numpy as jnp


class BasicBlock(nn.Module):
    channels: int
    stride: int = 1
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        y = nn.Conv(self.channels, (3, 3), strides=(self.stride, self.stride),
                    padding=1, use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.channels, (3, 3), padding=1, use_bias=False,
                    dtype=self.dtype, name="conv2")(y)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn2")(y)
        if residual.shape[-1] != self.channels or self.stride != 1:
            residual = nn.Conv(self.channels, (1, 1),
                               strides=(self.stride, self.stride),
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(residual)
            residual = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                    epsilon=1e-5, dtype=jnp.float32,
                                    name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet18Backbone(nn.Module):
    """Truncated ResNet-18 with the matcher's output taps.

    `node_taps` selects which stages contribute node features: the default
    ("layer3",) matches the reference (stride 16, 256ch); adding "layer2"
    (stride 8, 128ch) gives finer localization for dense pore grids whose
    spacing undercuts stride-16 cells (see RESULTS.md quality frontier)."""

    dtype: Any = jnp.float32
    node_taps: Tuple[str, ...] = ("layer3",)
    stem_channels: int = 64
    stage_channels: Tuple[int, int, int, int] = (64, 128, 256, 512)
    blocks_per_stage: int = 2

    @nn.compact
    def __call__(self, x, train: bool = False
                 ) -> Tuple[Tuple[jnp.ndarray, ...], jnp.ndarray, jnp.ndarray]:
        """:param x: (B, H, W, 3) normalized images
        :return: (node feature maps — one per tap, edges (B,H/32,W/32,512),
                  global (B,512))"""
        y = nn.Conv(self.stem_channels, (7, 7), strides=(2, 2), padding=3,
                    use_bias=False, dtype=self.dtype, name="conv1")(x)
        y = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=jnp.float32, name="bn1")(y)
        y = nn.relu(y)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        taps = {}
        for i, ch in enumerate(self.stage_channels[:3]):
            stride = 1 if i == 0 else 2
            for b in range(self.blocks_per_stage):
                y = BasicBlock(ch, stride if b == 0 else 1, dtype=self.dtype,
                               name=f"layer{i + 1}_{b}")(y, train=train)
            taps[f"layer{i + 1}"] = y

        for b in range(self.blocks_per_stage):
            y = BasicBlock(self.stage_channels[3], 2 if b == 0 else 1,
                           dtype=self.dtype,
                           name=f"layer4_{b}")(y, train=train)
        edges = y                                           # stride 32, 512ch

        global_feat = jnp.max(edges, axis=(1, 2))           # adaptive max-pool
        return tuple(taps[t] for t in self.node_taps), edges, global_feat


def load_torch_resnet18(state_dict: Dict[str, Any]) -> Dict[str, Any]:
    """Convert a torchvision resnet18 state_dict (OIHW convs) into this
    module's {params, batch_stats} trees. Offline utility for parity runs."""
    import numpy as np

    def conv(k):
        return {"kernel": np.transpose(np.asarray(state_dict[k]), (2, 3, 1, 0))}

    def bn(prefix):
        return (
            {"scale": np.asarray(state_dict[prefix + ".weight"]),
             "bias": np.asarray(state_dict[prefix + ".bias"])},
            {"mean": np.asarray(state_dict[prefix + ".running_mean"]),
             "var": np.asarray(state_dict[prefix + ".running_var"])},
        )

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    params["conv1"] = conv("conv1.weight")
    params["bn1"], stats["bn1"] = bn("bn1")
    for layer in range(1, 5):
        for blk in range(2):
            name = f"layer{layer}_{blk}"
            t = f"layer{layer}.{blk}"
            p: Dict[str, Any] = {}
            s: Dict[str, Any] = {}
            p["conv1"] = conv(f"{t}.conv1.weight")
            p["bn1"], s["bn1"] = bn(f"{t}.bn1")
            p["conv2"] = conv(f"{t}.conv2.weight")
            p["bn2"], s["bn2"] = bn(f"{t}.bn2")
            if f"{t}.downsample.0.weight" in state_dict:
                p["downsample_conv"] = conv(f"{t}.downsample.0.weight")
                p["downsample_bn"], s["downsample_bn"] = bn(f"{t}.downsample.1")
            params[name] = p
            stats[name] = s
    return {"params": params, "batch_stats": stats}
