"""LPIPS perceptual distance (flax).

Behavioral parity target: the `lpips` package as used by the reference —
`evaluation/wrapper.py:30` (default net, alex), `training/trainer.py:103`
(net="alex"), `common/image_processor.py:47` (net="vgg"), consumed in
`common/metrics.py:185` `lpips(pred, gt, normalize=False)`.

Architecture (LPIPS v0.1):
  1. scale inputs in [-1, 1] by the fixed shift/scale vectors,
  2. run the frozen AlexNet/VGG16 trunk, tapping the 5 canonical ReLU
     stages,
  3. unit-normalize each tap along channels, square the difference,
  4. 1x1 learned linear weighting (non-negative), spatial average, sum.

Weights: the published `lpips` checkpoints are torch state dicts
(trunk from torchvision + `lin{k}.model.1.weight` heads);
`convert_lpips_state_dict` maps either naming scheme onto this module.
No weights ship in this repo — `load_lpips` gates on a local file and
raises with download instructions otherwise.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# fixed input normalization (lpips ScalingLayer)
_SHIFT = jnp.array([-0.030, -0.088, -0.188], jnp.float32)
_SCALE = jnp.array([0.458, 0.448, 0.450], jnp.float32)

ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)


def _conv(x, features, kernel, stride, pad, name):
    return nn.Conv(
        features, (kernel, kernel), strides=(stride, stride),
        padding=((pad, pad), (pad, pad)), name=name,
    )(x)


def _maxpool(x, k=3, s=2):
    return nn.max_pool(x, (k, k), strides=(s, s))


class AlexNetFeatures(nn.Module):
    """torchvision AlexNet.features with taps after each ReLU stage."""

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:  # x: (B, H, W, 3)
        taps = []
        x = nn.relu(_conv(x, 64, 11, 4, 2, "conv0"))
        taps.append(x)
        x = _maxpool(x)
        x = nn.relu(_conv(x, 192, 5, 1, 2, "conv1"))
        taps.append(x)
        x = _maxpool(x)
        x = nn.relu(_conv(x, 384, 3, 1, 1, "conv2"))
        taps.append(x)
        x = nn.relu(_conv(x, 256, 3, 1, 1, "conv3"))
        taps.append(x)
        x = nn.relu(_conv(x, 256, 3, 1, 1, "conv4"))
        taps.append(x)
        return taps


class VGG16Features(nn.Module):
    """torchvision VGG16.features tapped at relu{1_2,2_2,3_3,4_3,5_3}."""

    @nn.compact
    def __call__(self, x) -> Sequence[jnp.ndarray]:
        taps = []
        cfg = ((64, 2), (128, 2), (256, 3), (512, 3), (512, 3))
        i = 0
        for stage, (ch, reps) in enumerate(cfg):
            for _ in range(reps):
                x = nn.relu(_conv(x, ch, 3, 1, 1, f"conv{i}"))
                i += 1
            taps.append(x)
            if stage < 4:
                x = _maxpool(x, 2, 2)
        return taps


class LPIPS(nn.Module):
    """lpips.LPIPS(net=...) twin. __call__(x, y) with NCHW images in
    [-1, 1] (normalize=False semantics) -> (B,) distances."""

    net: str = "alex"

    @nn.compact
    def __call__(self, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
        chans = ALEX_CHANNELS if self.net == "alex" else VGG_CHANNELS
        trunk = (AlexNetFeatures if self.net == "alex" else VGG16Features)(name="trunk")

        def prep(im):  # NCHW [-1,1] -> NHWC scaled
            im = (im - _SHIFT[None, :, None, None]) / _SCALE[None, :, None, None]
            return im.transpose(0, 2, 3, 1)

        fx = trunk(prep(x))
        fy = trunk(prep(y))
        total = 0.0
        for k, (ax, ay) in enumerate(zip(fx, fy)):
            ax = ax / jnp.maximum(jnp.linalg.norm(ax, axis=-1, keepdims=True), 1e-10)
            ay = ay / jnp.maximum(jnp.linalg.norm(ay, axis=-1, keepdims=True), 1e-10)
            d = (ax - ay) ** 2  # (B, H, W, C)
            w = self.param(f"lin{k}", nn.initializers.ones, (chans[k],))
            total = total + jnp.mean(jnp.sum(d * w[None, None, None, :], axis=-1), axis=(1, 2))
        return total


def convert_lpips_state_dict(sd: Dict[str, Any], net: str = "alex") -> Dict[str, Any]:
    """Published `lpips` torch checkpoint (+ torchvision trunk) -> params.

    Accepts both naming schemes: `lin{k}.model.1.weight` (v0.1 files hold
    only the heads; pass the torchvision trunk keys merged in as
    `net.{i}.weight`) and `lins.{k}.model.1.weight`.
    """
    n_stage = 5
    p: Dict[str, Any] = {"trunk": {}}
    # trunk: torchvision sequential indices of the conv layers, and which
    # lpips slice module each lives in (lpips vgg16: convs 0,2 -> slice1;
    # 5,7 -> slice2; 10,12,14 -> slice3; 17,19,21 -> slice4;
    # 24,26,28 -> slice5; alexnet: one conv per slice)
    alex_idx = (0, 3, 6, 8, 10)
    vgg_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    alex_slice = (1, 2, 3, 4, 5)
    vgg_slice = (1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5)
    idxs, slices = (alex_idx, alex_slice) if net == "alex" else (vgg_idx, vgg_slice)
    for j, (i, sl) in enumerate(zip(idxs, slices)):
        w = None
        for key in (f"net.{i}.weight", f"net.slice{sl}.{i}.weight", f"features.{i}.weight"):
            if key in sd:
                w = key
                break
        if w is None:
            raise KeyError(f"trunk conv {i} not found in state dict")
        weight = np.asarray(sd[w]).transpose(2, 3, 1, 0)
        bias = np.asarray(sd[w.replace(".weight", ".bias")])
        p["trunk"][f"conv{j}"] = {"kernel": weight, "bias": bias}
    for k in range(n_stage):
        for key in (f"lin{k}.model.1.weight", f"lins.{k}.model.1.weight"):
            if key in sd:
                p[f"lin{k}"] = np.asarray(sd[key]).reshape(-1)
                break
        else:
            raise KeyError(f"lin{k} head not found in state dict")
    return p


def load_lpips(path: Optional[str] = None, net: str = "alex") -> Tuple[LPIPS, Dict]:
    """Build an LPIPS module + params from a converted-weights .npz/.pt.

    Raises with instructions when no weights are available (this box has
    no network egress; the reference downloads them implicitly via the
    `lpips` package)."""
    import os

    model = LPIPS(net=net)
    if path is None or not os.path.exists(path):
        raise FileNotFoundError(
            "LPIPS weights not found. Export them once with torch:\n"
            "  import lpips, torch; m = lpips.LPIPS(net='%s')\n"
            "  torch.save({**m.net.state_dict(), **m.state_dict()}, 'lpips_%s.pt')\n"
            "then pass that file's path." % (net, net)
        )
    import torch

    sd = torch.load(path, map_location="cpu")
    params = convert_lpips_state_dict({k: v for k, v in sd.items()}, net=net)
    return model, {"params": params}
