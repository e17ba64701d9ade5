"""Backbone factory.

Behavioral parity target: `scenedino/models/backbones/backbone_util.py:7-19`
(make_backbone switch: monodepth2 | dino | spatial/pixelNeRF | ibrnet).
The shipped SceneDINO configs use the dino stack; monodepth2 is the S4C
baseline. pixelNeRF SpatialEncoder / IBRNet are legacy paths the shipped
configs never select — requesting them raises with a pointer.
"""
from __future__ import annotations

from typing import Any, Dict

from flax import linen as nn


def make_backbone(conf: Dict[str, Any]) -> nn.Module:
    kind = conf.get("type", "dino")
    if kind in ("dino", "dinov2"):
        from scenedino_tpu.models.encoder import DinoModule
        from scenedino_tpu.models.factory import encoder_config_from_dict

        return DinoModule(cfg=encoder_config_from_dict(conf))
    if kind == "monodepth2":
        from scenedino_tpu.models.monodepth2 import Monodepth2

        return Monodepth2(
            d_out=conf.get("d_out", 128),
            scales=tuple(conf.get("scales", (0, 1, 2, 3))),
            num_ch_dec=tuple(conf["num_ch_dec"]) if conf.get("num_ch_dec") else None,
        )
    raise NotImplementedError(
        f"backbone '{kind}': only the dino stack and monodepth2 (S4C "
        "baseline) are implemented; spatial/ibrnet are unused legacy paths "
        "of the reference"
    )
