"""Converter + numerics parity against committed torch-twin goldens.

The fixtures in tests/goldens/*.npz were produced by tools/make_goldens.py
from torch twins that replicate timm / reference-DPT / reference-ResnetFC
semantics exactly (same twins as tests/test_interop.py, which additionally
re-verifies them against live torch when torch is importable). These tests
keep that parity pinned without needing torch at test time.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.models.dpt import DPTHead
from scenedino_tpu.models.heads import ResnetFC
from scenedino_tpu.models.vit import ViTConfig, VisionTransformer
from scenedino_tpu.utils import checkpoint as CK

GOLDENS = os.path.join(os.path.dirname(__file__), "goldens")


def _load(name):
    z = np.load(os.path.join(GOLDENS, f"{name}.npz"))
    sd = {k[3:]: z[k] for k in z.files if k.startswith("sd.")}
    rest = {k: z[k] for k in z.files if not k.startswith("sd.")}
    return sd, rest


@pytest.mark.skipif(not os.path.isdir(GOLDENS), reason="goldens not generated")
def test_vit_golden():
    sd, g = _load("vit_dino_tiny")
    params = {"params": CK.convert_vit({f"m.{k}": v for k, v in sd.items()}, "m", depth=3)}
    cfg = ViTConfig(patch_size=8, width=32, depth=3, num_heads=2,
                    pos_embed_size=(16, 24), intermediate_layers=(0, 1))
    vit = VisionTransformer(cfg=cfg, want_key_features=False)
    out = vit.apply(params, jnp.array(g["input"]))
    assert np.allclose(np.asarray(out["features_normalized"]), g["features_normalized"], atol=2e-5)
    assert np.allclose(np.asarray(out["intermediate_features.0"]), g["intermediate_0"], atol=2e-5)
    assert np.allclose(np.asarray(out["intermediate_features.1"]), g["intermediate_1"], atol=2e-5)


@pytest.mark.skipif(not os.path.isdir(GOLDENS), reason="goldens not generated")
def test_dpt_golden():
    sd, g = _load("dpt_tiny")
    p = CK.convert_dpt({f"d.{k}": v for k, v in sd.items()}, "d")
    dpt = DPTHead(post_process_channels=(4, 4, 8, 8), d_out=8)
    feats = [jnp.array(g[f"input_{i}"]) for i in range(4)]
    out = dpt.apply({"params": p}, feats)[0]
    assert np.allclose(np.asarray(out), g["output"], atol=1e-4), np.abs(np.asarray(out) - g["output"]).max()


@pytest.mark.skipif(not os.path.isdir(GOLDENS), reason="goldens not generated")
def test_resnetfc_golden():
    sd, g = _load("resnetfc_tiny")
    p = CK.convert_resnetfc({f"h.{k}": v for k, v in sd.items()}, "h", n_blocks=0)
    head = ResnetFC(d_out=5, n_blocks=0, d_hidden=16)
    out = head.apply({"params": p}, jnp.array(g["input"]))
    assert np.allclose(np.asarray(out), g["output"], atol=1e-5)
