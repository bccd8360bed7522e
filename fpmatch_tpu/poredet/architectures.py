"""Patch-CNN pore detector architecture family in Flax.

Capability parity with pore-detection/architectures/ (18 variants built from
LayerBlock = valid Conv + ReLU + BatchNorm [+ 3×3/1 MaxPool], template.py:3-27):

  net{13,15,17,19}{max,nomax}   — plain stacks sized for receptive fields
                                   13/15/17/19 px (e.g. net17nomax.py:5-33)
  resnet{13,15,17,19}{max,nomax} — same with center-cropped residual adds
                                   (resnet17nomax.py forward)
  gabriel                        — small FCN with channel doubling + dropout
  su                             — fully-convolutionalized FC net (su.py)

All are fully convolutional with 'valid' padding: applying them to a whole
fingerprint produces a shrunken probability map, which is how full-image
inference works (entireImage.py). NHWC, grayscale in (B, H, W, 1).
"""
from __future__ import annotations

import flax.linen as nn


class LayerBlock(nn.Module):
    features: int
    kernel: int = 3
    max_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    padding="VALID", use_bias=False)(x)
        x = nn.relu(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        if self.max_pool:
            x = nn.max_pool(x, (self.kernel, self.kernel), strides=(1, 1))
        return x

    @property
    def crop(self) -> int:
        """Half-width shrink caused by this block (template.py resValue)."""
        return 2 if self.max_pool else 1


class PlainPoreNet(nn.Module):
    """net{N}{max,nomax}: (layers-1) LayerBlocks + 1×sigmoid conv head."""

    features: int = 40
    num_layers: int = 8          # 8 ⇒ receptive field 17 (nomax)
    max_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(self.num_layers - 1):
            x = LayerBlock(self.features, max_pool=self.max_pool)(x, train)
        x = nn.Conv(1, (3, 3), padding="VALID")(x)
        return nn.sigmoid(x)


class ResPoreNet(nn.Module):
    """resnet{N}{max,nomax}: LayerBlocks with center-cropped residual adds."""

    features: int = 40
    num_layers: int = 8
    max_pool: bool = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = LayerBlock(self.features, max_pool=self.max_pool)(x, train)
        crop = 2 if self.max_pool else 1
        for _ in range(self.num_layers - 2):
            y = LayerBlock(self.features, max_pool=self.max_pool)(x, train)
            x = x[:, crop:-crop, crop:-crop, :] + y
        x = nn.Conv(1, (3, 3), padding="VALID")(x)
        return nn.sigmoid(x)


class GabrielNet(nn.Module):
    """Small FCN (gabriel.py): 3 pooled blocks, dropout, 5×5 head + BN."""

    features: int = 40

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.features
        x = LayerBlock(f, max_pool=True)(x, train)
        x = LayerBlock(2 * f, max_pool=True)(x, train)
        x = LayerBlock(4 * f, max_pool=True)(x, train)
        x = nn.Dropout(0.2, deterministic=not train)(x)
        x = nn.Conv(1, (5, 5), padding="VALID")(x)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
        return nn.sigmoid(x)


class SuNet(nn.Module):
    """Su et al. 2017 fully-convolutionalized net (su.py:21-50)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        def width(i):
            return 2 ** ((i + 1) // 2 + 5)

        for i in range(1, 8):
            x = LayerBlock(width(i))(x, train)
        x = LayerBlock(4096)(x, train)
        x = LayerBlock(1, kernel=1)(x, train)
        return nn.sigmoid(x)


# receptive field → number of layers for the plain/residual stacks
_RF_TO_LAYERS = {13: 6, 15: 7, 17: 8, 19: 9}

ARCHITECTURES = (
    [f"net{rf}{suffix}" for rf in (13, 15, 17, 19)
     for suffix in ("max", "nomax")]
    + [f"resnet{rf}{suffix}" for rf in (13, 15, 17, 19)
       for suffix in ("max", "nomax")]
    + ["gabriel", "su"]
)


def make_architecture(name: str, features: int = 40) -> nn.Module:
    """Factory over all 18 variants (util/utils.py:68-114 equivalent)."""
    name = name.lower()
    if name == "gabriel":
        return GabrielNet(features=features)
    if name == "su":
        return SuNet()
    residual = name.startswith("resnet")
    body = name.removeprefix("resnet" if residual else "net")
    max_pool = body.endswith("max") and not body.endswith("nomax")
    rf = int(body.removesuffix("nomax" if body.endswith("nomax") else "max"))
    if rf not in _RF_TO_LAYERS:
        raise ValueError(f"unknown architecture {name}")
    layers = _RF_TO_LAYERS[rf]
    cls = ResPoreNet if residual else PlainPoreNet
    return cls(features=features, num_layers=layers, max_pool=max_pool)


def receptive_field(name: str) -> int:
    name = name.lower()
    if name == "gabriel":
        return 17
    if name == "su":
        return 17
    body = name.removeprefix("resnet" if name.startswith("resnet") else "net")
    return int(body.removesuffix("nomax" if body.endswith("nomax") else "max"))
