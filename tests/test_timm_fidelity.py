"""timm-source-fidelity twins (VERDICT r2 next #3).

The round-2 interop twins re-implemented timm block semantics from memory;
this file follows timm's PUBLISHED sources op-by-op, with a citation per
line, so a wrong reading of timm cannot cancel out between the model and
its test. Covered, against `timm==1.x vision_transformer.py` (the module
the reference wraps, /root/reference/scenedino/models/backbones/dino/
vit.py:15-63 `timm.create_model("vit_*_patch*_224.dino" | "*_dinov2")`):

  * `Attention.forward` — fused qkv reshape(B,N,3,H,D).permute(2,0,3,1,4),
    `q, k, v = qkv.unbind(0)`, `q = q * self.scale` BEFORE the matmul,
    softmax(-1), `(attn @ v).transpose(1,2).reshape(B,N,C)`, proj.
    (timm/models/vision_transformer.py::Attention.forward)
  * the `blocks.{d-1}.attn.getitem_4` FX tap the reference extracts as
    "key_features" (vit.py:142-150): under torch.fx, `B, N, C = x.shape`
    emits getitem 0..2, so `qkv.unbind(0)` emits getitem_3 (q),
    getitem_4 (K), getitem_5 (v) — the tap is the KEYS, (B, H, N, D).
  * `Block.forward` — `x = x + ls1(attn(norm1(x)))`,
    `x = x + ls2(mlp(norm2(x)))`, LayerNorm eps 1e-6, GELU exact (timm
    default act_layer=nn.GELU, approximate='none').
    (timm/models/vision_transformer.py::Block.forward, LayerScale.forward
    multiplies by `gamma`)
  * `PatchEmbed.forward` — `proj(x).flatten(2).transpose(1, 2)`: row-major
    (H, then W) patch order. (timm/layers/patch_embed.py::PatchEmbed)
  * `VisionTransformer._pos_embed`, no_embed_class=False branch (DINO v1 /
    DINOv2 configs): `x = cat([cls, x], 1); x = x + pos_embed` — pos added
    AFTER the cls concat, cls HAS a positional code.
  * DINOv2-with-registers token layout — the official implementation
    (facebookresearch/dinov2 models/vision_transformer.py::
    prepare_tokens_with_masks): pos-embed (cls + patches) is added FIRST,
    then the 4 register tokens are inserted between cls and patches with
    NO positional code:
      x = torch.cat((x[:, :1], register_tokens.expand(...), x[:, 1:]), 1)
  * runtime pos-embed resize — the reference's own
    `_interpolate_positional_embeddings` (vit.py:65-110): F.interpolate
    bicubic, align_corners=False, antialias=False over the PATCH grid
    only, prefix rows passed through. (timm's checkpoint-load-time
    `resample_abs_pos_embed(antialias=True)` never runs in the reference
    path: models are created at their native 224/518 grid and resized at
    runtime by the function above.)

Run alongside tools/make_real_goldens.py, which executes the same parity
gate against the REAL timm/torchvision models when those packages exist.
"""
import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.models.vit import ViTConfig, VisionTransformer, interpolate_pos_embed
from scenedino_tpu.utils import checkpoint as CK


class TimmAttention(tnn.Module):
    """timm/models/vision_transformer.py::Attention, fused_attn=False path,
    q_norm/k_norm = Identity (all DINO-family configs)."""

    def __init__(self, dim, num_heads):
        super().__init__()
        self.num_heads = num_heads
        self.head_dim = dim // num_heads
        self.scale = self.head_dim**-0.5          # Attention.__init__
        self.qkv = tnn.Linear(dim, dim * 3, bias=True)  # qkv_bias=True in DINO cfgs
        self.proj = tnn.Linear(dim, dim)

    def forward(self, x):
        B, N, C = x.shape                          # FX: getitem 0..2
        qkv = (
            self.qkv(x)
            .reshape(B, N, 3, self.num_heads, self.head_dim)
            .permute(2, 0, 3, 1, 4)
        )                                          # Attention.forward
        q, k, v = qkv.unbind(0)                    # FX: getitem_3/4/5 — k IS getitem_4
        self.last_keys = k                         # (B, H, N, D): the reference's tap
        q = q * self.scale                         # scale q BEFORE the matmul
        attn = q @ k.transpose(-2, -1)
        attn = attn.softmax(dim=-1)
        x = attn @ v
        x = x.transpose(1, 2).reshape(B, N, C)
        x = self.proj(x)
        return x


class TimmLayerScale(tnn.Module):
    """timm LayerScale.forward: `x * self.gamma` (init 1e-5 in DINOv2)."""

    def __init__(self, dim, init=1e-5):
        super().__init__()
        self.gamma = tnn.Parameter(init * torch.ones(dim))

    def forward(self, x):
        return x * self.gamma


class TimmBlock(tnn.Module):
    """timm Block.forward, drop_path=0: x += ls1(attn(norm1(x)));
    x += ls2(mlp(norm2(x)))."""

    def __init__(self, dim, heads, mlp_ratio=4.0, layerscale=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)  # norm_layer eps=1e-6
        self.attn = TimmAttention(dim, heads)
        self.ls1 = TimmLayerScale(dim) if layerscale else tnn.Identity()
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.mlp = tnn.Sequential()                # timm Mlp: fc1 -> act -> fc2
        self.mlp.fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.mlp.fc2 = tnn.Linear(int(dim * mlp_ratio), dim)
        self.ls2 = TimmLayerScale(dim) if layerscale else tnn.Identity()

    def forward(self, x):
        x = x + self.ls1(self.attn(self.norm1(x)))
        h = self.mlp.fc2(tF.gelu(self.mlp.fc1(self.norm2(x))))  # GELU exact
        x = x + self.ls2(h)
        return x


class TimmViT(tnn.Module):
    """timm VisionTransformer forward_features for the DINO-family configs
    (class_token=True, no_embed_class=False, pre_norm=False, fc_norm=None)
    + the official DINOv2 register insertion."""

    def __init__(self, patch=8, dim=32, depth=3, heads=2, img=(16, 16),
                 layerscale=False, num_registers=0):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img[0] // patch) * (img[1] // patch)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + n, dim) * 0.02)
        if num_registers:
            self.register_tokens = tnn.Parameter(torch.randn(1, num_registers, dim) * 0.02)
        self.num_registers = num_registers
        self.blocks = tnn.ModuleList(
            [TimmBlock(dim, heads, layerscale=layerscale) for _ in range(depth)]
        )
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        # PatchEmbed.forward: flatten(2).transpose(1, 2) — row-major patches
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        # _pos_embed, no_embed_class=False: concat cls THEN add pos
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], dim=1)
        x = x + self.pos_embed
        if self.num_registers:
            # dinov2 prepare_tokens_with_masks: registers inserted after the
            # pos-add, between cls and patches, with no positional code
            x = torch.cat(
                [x[:, :1], self.register_tokens.expand(B, -1, -1), x[:, 1:]], dim=1
            )
        inter = []
        for blk in self.blocks:
            x = blk(x)
            inter.append(x)
        x = self.norm(x)
        return x, inter


def _convert(tvit, depth, layerscale=False, num_registers=0):
    sd = {f"m.{k}": v.detach().numpy() for k, v in tvit.state_dict().items()}
    sd = {k.replace(".ls1.gamma", ".ls1.gamma").replace(".ls2.gamma", ".ls2.gamma"): v
          for k, v in sd.items()}
    return {
        "params": CK.convert_vit(
            sd, "m", depth=depth, layerscale=layerscale, num_registers=num_registers
        )
    }


def test_vit_matches_timm_source_twin_dino_v1():
    """DINO v1 semantics (patch 8, cls token, no layerscale): final norm
    tokens, every intermediate tap, and the getitem_4 keys tap."""
    torch.manual_seed(0)
    Hh, Ww, P, dim, depth, heads = 16, 24, 8, 32, 3, 2
    tvit = TimmViT(patch=P, dim=dim, depth=depth, heads=heads, img=(Hh, Ww))
    params = _convert(tvit, depth)

    cfg = ViTConfig(patch_size=P, width=dim, depth=depth, num_heads=heads,
                    pos_embed_size=(Hh, Ww), intermediate_layers=(0, 1))
    vit = VisionTransformer(cfg=cfg, want_key_features=True)

    x = np.random.RandomState(0).rand(2, 3, Hh, Ww).astype(np.float32)
    with torch.no_grad():
        t_out, t_inter = tvit(torch.tensor(x))
    ours = vit.apply(params, jnp.asarray(x))

    t_feats = t_out[:, 1:]
    t_feats = t_feats / t_feats.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(
        np.asarray(ours["features_normalized"]), t_feats.numpy(), atol=2e-5
    )
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(ours[f"intermediate_features.{i}"]),
            t_inter[i][:, 1:].numpy(), atol=2e-5,
        )
    # keys tap: (B, H, N, D) with prefix tokens stripped
    t_keys = tvit.blocks[-1].attn.last_keys[:, :, 1:].numpy()
    np.testing.assert_allclose(np.asarray(ours["key_features"]), t_keys, atol=2e-5)


def test_vit_matches_timm_source_twin_dinov2_registers():
    """DINOv2-reg semantics: layerscale blocks + 4 registers inserted after
    the pos-add with no positional code (official dinov2
    prepare_tokens_with_masks)."""
    torch.manual_seed(1)
    Hh, Ww, P, dim, depth, heads, R = 28, 28, 14, 32, 3, 2, 4
    tvit = TimmViT(patch=P, dim=dim, depth=depth, heads=heads, img=(Hh, Ww),
                   layerscale=True, num_registers=R)
    # give layerscale non-trivial values so a wrong placement cannot hide
    with torch.no_grad():
        for blk in tvit.blocks:
            blk.ls1.gamma.mul_(torch.linspace(0.5, 2.0, dim))
            blk.ls2.gamma.mul_(torch.linspace(2.0, 0.5, dim))
    params = _convert(tvit, depth, layerscale=True, num_registers=R)

    cfg = ViTConfig(patch_size=P, width=dim, depth=depth, num_heads=heads,
                    num_registers=R, layerscale=True,
                    pos_embed_size=(Hh, Ww), intermediate_layers=(0, 1))
    vit = VisionTransformer(cfg=cfg, want_key_features=True)

    x = np.random.RandomState(1).rand(2, 3, Hh, Ww).astype(np.float32)
    with torch.no_grad():
        t_out, t_inter = tvit(torch.tensor(x))
    ours = vit.apply(params, jnp.asarray(x))

    T = 1 + R
    t_feats = t_out[:, T:]
    t_feats = t_feats / t_feats.norm(dim=-1, keepdim=True)
    np.testing.assert_allclose(
        np.asarray(ours["features_normalized"]), t_feats.numpy(), atol=2e-5
    )
    for i in (0, 1):
        np.testing.assert_allclose(
            np.asarray(ours[f"intermediate_features.{i}"]),
            t_inter[i][:, T:].numpy(), atol=2e-5,
        )
    t_keys = tvit.blocks[-1].attn.last_keys[:, :, T:].numpy()
    np.testing.assert_allclose(np.asarray(ours["key_features"]), t_keys, atol=2e-5)


def test_pos_embed_runtime_resize_matches_reference_interpolate():
    """interpolate_pos_embed == the reference's
    `_interpolate_positional_embeddings` (vit.py:65-110): F.interpolate
    bicubic align_corners=False antialias=False over the patch grid, on the
    flagship DINO-v1-base8 geometry (224x224 train grid 28x28 -> 192x640
    grid 24x80, a DOWNSCALE in y where antialias matters)."""
    rng = np.random.RandomState(2)
    C = 16
    g0, g1 = (28, 28), (24, 80)
    pos = rng.randn(1, 1 + g0[0] * g0[1], C).astype(np.float32)

    ours = np.asarray(interpolate_pos_embed(jnp.asarray(pos), g0, g1, num_prefix_tokens=1))

    pt = torch.tensor(pos[:, 1:]).view(1, g0[0], g0[1], C).permute(0, 3, 1, 2)
    ref_patch = tF.interpolate(
        pt, size=g1, mode="bicubic", align_corners=False, antialias=False
    ).permute(0, 2, 3, 1).reshape(1, g1[0] * g1[1], C)
    ref = torch.cat([torch.tensor(pos[:, :1]), ref_patch], dim=1).numpy()

    np.testing.assert_allclose(ours, ref, atol=1e-4)
    # the cls row passes through untouched
    np.testing.assert_array_equal(ours[:, 0], pos[:, 0])


def test_vit_patch_order_is_row_major():
    """PatchEmbed flatten(2).transpose(1,2) = row-major (H outer, W inner):
    make patch (0, 1) unique and check it lands at token index 1."""
    P, dim = 8, 16
    Hh, Ww = 16, 24
    cfg = ViTConfig(patch_size=P, width=dim, depth=1, num_heads=2,
                    pos_embed_size=(Hh, Ww), intermediate_layers=())
    vit = VisionTransformer(cfg=cfg, want_key_features=False)
    x = np.zeros((1, 3, Hh, Ww), np.float32)
    x[:, :, 0:P, P : 2 * P] = 1.0  # grid position (row 0, col 1)
    params = vit.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # read the patch-embed activations directly: token t = row*gw + col
    emb = params["params"]["patch_embed"]
    patches = jax.lax.conv_general_dilated(
        jnp.asarray(x).transpose(0, 2, 3, 1), emb["kernel"], (P, P), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + emb["bias"]
    tok = patches.reshape(1, -1, dim)
    gw = Ww // P
    assert not np.allclose(np.asarray(tok[0, 1]), np.asarray(tok[0, 2]))
    # the unique patch is at token 1 (row-major), not at token gw (col-major)
    base = np.asarray(tok[0, 2])  # an all-zero patch
    assert np.abs(np.asarray(tok[0, 1]) - base).max() > 1e-3
    assert np.abs(np.asarray(tok[0, gw]) - base).max() < 1e-6
