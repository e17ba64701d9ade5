"""Backbone factory.

Behavioral parity target: `scenedino/models/backbones/backbone_util.py:7-19`
(make_backbone switch: monodepth2 | dino | spatial/pixelNeRF | ibrnet).
The shipped SceneDINO configs use the dino stack; monodepth2 is the S4C
baseline. pixelNeRF SpatialEncoder/ImageEncoder and IBRNetWithNeuRay are
legacy paths the shipped configs never select, implemented for inventory
completeness (models/pixelnerf.py, models/multi_view_head.py).
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
    if kind == "spatial":
        from scenedino_tpu.models.pixelnerf import SpatialEncoder

        return SpatialEncoder(
            backbone=conf.get("backbone", "resnet34"),
            num_layers=conf.get("num_layers", 4),
            use_first_pool=conf.get("use_first_pool", True),
        )
    if kind == "global":
        from scenedino_tpu.models.pixelnerf import ImageEncoder

        return ImageEncoder(
            backbone=conf.get("backbone", "resnet34"),
            latent_size=conf.get("latent_size", 128),
        )
    if kind == "ibrnet":
        from scenedino_tpu.models.multi_view_head import IBRNetWithNeuRay

        return IBRNetWithNeuRay(
            neuray_in_dim=conf.get("neuray_in_dim", 32),
            in_feat_ch=conf.get("in_feat_ch", 32),
            att_feat=conf.get("att_feat", 16),
            rbs=conf.get("rbs", 2048),
        )
    raise NotImplementedError(
        f"backbone '{kind}': dino stack, monodepth2 (S4C baseline), "
        "spatial (pixelNeRF), global, and ibrnet are implemented"
    )
