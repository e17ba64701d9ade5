"""Model factory — builds the flagship SceneDINO field from a config dict.

Behavioral parity target: `scenedino/models/__init__.py:9-63` (make_model)
with the shipped configs (`configs/model/dino_downsampler.yaml`,
`dinov2_downsampler.yaml`, `dino_upsampler.yaml`).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from scenedino_tpu.models.encoder import DinoModule, DinoModuleConfig
from scenedino_tpu.models.field import FieldConfig, SceneField


def encoder_config_from_dict(conf: Dict[str, Any]) -> DinoModuleConfig:
    return DinoModuleConfig(
        mode=conf.get("mode", "downsample-prediction"),
        decoder_arch=conf.get("decoder_arch", "dpt"),
        upsampler_arch=conf.get("upsampler_arch"),
        downsampler_arch=conf.get("downsampler_arch", "featup"),
        encoder_arch=conf.get("encoder_arch", "vit-b"),
        version=conf.get("version", "v1"),
        separate_gt_version=conf.get("separate_gt_version", "v1"),
        encoder_freeze=conf.get("encoder_freeze", False),
        flip_avg_gt=conf.get("flip_avg_gt", False),
        dim_reduction_arch=conf.get("dim_reduction_arch", "mlp"),
        num_ch_enc=tuple(conf.get("num_ch_enc", (64, 64, 128, 256))),
        intermediate_features=tuple(conf.get("intermediate_features", (3, 6, 9))),
        decoder_out_dim=conf.get("decoder_out_dim", 256),
        dino_pca_dim=conf.get("dino_pca_dim", 64),
        image_size=tuple(conf.get("image_size", (192, 640))),
        key_features=conf.get("key_features", False),
        grad_checkpointing=conf.get("grad_checkpointing", False),
        # accept "bfloat16"/"float32" strings (YAML-saved run configs)
        dtype=jnp.dtype(conf["dtype"]).type if isinstance(conf.get("dtype"), str) else conf.get("dtype"),
        vit_overrides=tuple(sorted(conf["vit_overrides"].items())) if conf.get("vit_overrides") else None,
    )


def make_model(conf: Dict[str, Any], downstream: Optional[nn.Module] = None) -> SceneField:
    """Build SceneField from a model config dict (make_model parity).

    The encoder defaults to the DINO stack; an `encoder.type` other than
    dino routes through the legacy backbone factory (monodepth2 /
    pixelNeRF spatial / global / ibrnet — backbone_util.make_backbone,
    reference scenedino/models/backbones/backbone_util.py:7-19), which is
    how the S4C baseline model (monodepth2 encoder,
    evaluate_model_sscbench.py:195-217) is constructed."""
    enc_conf = conf.get("encoder", {})
    enc_type = enc_conf.get("type", "dino")
    if enc_type in ("dino", "dinov2"):
        enc_cfg = encoder_config_from_dict(enc_conf)
        encoder = DinoModule(cfg=enc_cfg)
    else:
        from scenedino_tpu.models.backbone_util import make_backbone

        encoder = make_backbone(enc_conf)
    code = conf.get("code", {})
    fcfg = FieldConfig(
        z_near=conf.get("z_near", 3.0),
        z_far=conf.get("z_far", 80.0),
        inv_z=conf.get("inv_z", True),
        code_mode=conf.get("code_mode", "z"),
        learn_empty=conf.get("learn_empty", False),
        sample_color=conf.get("sample_color", True),
        predict_dino=conf.get("predict_dino", True),
        dino_dims=conf.get("dino_dims", 64),
        num_freqs=code.get("num_freqs", 6),
        freq_factor=code.get("freq_factor", 1.5),
        include_input=code.get("include_input", True),
    )
    heads = conf.get(
        "decoder_heads",
        [{"type": "resnet", "name": "normal_head", "args": {"n_blocks": 0, "d_hidden": 128}}],
    )
    head_confs = tuple(
        (h.get("name", f"head_{i}"), {"type": h.get("type", "resnet"), "args": h.get("args", {})})
        for i, h in enumerate(heads)
    )
    return SceneField(
        encoder=encoder,
        cfg=fcfg,
        head_confs=head_confs,
        final_pred_head=conf.get("final_prediction_head", head_confs[0][0]),
        downstream=downstream,
    )


# The shipped SceneDINO flagship (configs/model/dino_downsampler.yaml)
SCENEDINO_KITTI_360 = {
    "predict_dino": True,
    "dino_dims": 64,
    "inv_z": True,
    "learn_empty": False,
    "code_mode": "z",
    "z_near": 3.0,
    "z_far": 80.0,
    "encoder": {
        "mode": "downsample-prediction",
        "decoder_arch": "dpt",
        "downsampler_arch": "featup",
        "encoder_arch": "vit-b",
        "version": "v1",
        "separate_gt_version": "v1",
        "dim_reduction_arch": "mlp",
        "num_ch_enc": (64, 64, 128, 256),
        "intermediate_features": (3, 6, 9),
        "decoder_out_dim": 256,
        "dino_pca_dim": 64,
        "image_size": (192, 640),
        "key_features": False,
    },
    "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
    "decoder_heads": [
        {"type": "resnet", "name": "normal_head", "args": {"n_blocks": 0, "d_hidden": 128}}
    ],
    "final_prediction_head": "normal_head",
}


def scenedino_dinov2_config() -> Dict[str, Any]:
    """configs/model/dinov2_downsampler.yaml variant."""
    conf = {**SCENEDINO_KITTI_360}
    conf["encoder"] = {**conf["encoder"], "version": "v2", "separate_gt_version": "v2"}
    return conf


def s4c_baseline_config(n_classes: int = 19) -> Dict[str, Any]:
    """The S4C baseline model the reference's SSC evaluator builds for
    `-m s4c` (evaluate_model_sscbench.py:179-217): monodepth2 encoder
    (d_out 64), n_blocks=0 / d_hidden=64 field head, code_mode "z",
    learn_empty off. The S4C net's `segmentation_mode: panoptic_deeplab`
    head emits per-point class logits from the field MLP; here those
    logits ARE the field's feature channels (dino_dims = n_classes), so
    the whole fast/slow SSC query machinery (fold, banded gather,
    alpha-weighted pooling) applies unchanged — `expand_dim` is identity
    for legacy backbones and the evaluator softmaxes the channels into
    the 19-class probabilities that the reference alpha-weights.

    NOTE: the S4C BTSNet itself lives in the external S4C repo (the
    reference imports `models.bts.model` from outside its own tree);
    this config reproduces the evaluator's contract
    (net.forward(pts, predict_segmentation=True) -> sigma + 19-class
    scores on the identical pooling/confusion pipeline)."""
    return {
        "predict_dino": True,
        "dino_dims": n_classes,
        "inv_z": True,
        "learn_empty": False,
        "code_mode": "z",
        "z_near": 3.0,
        "z_far": 80.0,
        "encoder": {"type": "monodepth2", "d_out": 64, "scales": (0, 1, 2, 3)},
        "code": {"num_freqs": 6, "freq_factor": 1.5, "include_input": True},
        "decoder_heads": [
            {"type": "resnet", "name": "normal_head", "args": {"n_blocks": 0, "d_hidden": 64}}
        ],
        "final_prediction_head": "normal_head",
    }
