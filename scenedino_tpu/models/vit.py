"""Vision Transformers for DINO v1 / DINOv2 / DINOv2-reg (flax.linen).

Behavioral parity target: `scenedino/models/backbones/dino/vit.py` (timm
ViTs wrapped by `_ViT:112` with FX feature extraction). Instead of graph
surgery we return the tapped tensors directly from the forward pass:
  * "features_normalized": L2-normalized final-norm tokens (vit.py:186),
  * "intermediate_features.{i}": raw block outputs at the configured
    depths (pre-norm, like timm's `blocks.{i}` nodes),
  * "key_features": the last block's attention keys per head
    (`blocks.{d-1}.attn.getitem_4`, vit.py:142-144),
with class/register tokens stripped (vit.py:174-186).

Architecture notes (for weight-converter parity with timm):
  * DINO v1 = timm vit_{small,base}_patch{8,16}_224.dino: pre-LN blocks,
    no layerscale, 1 class token.
  * DINOv2 = timm vit_{small,base}_patch14_dinov2: layerscale (ls1/ls2),
    patch 14; the reference resizes inputs by 14/16 so the *external*
    patch size stays 16 (dinov2_module.py:236-240) — that trick lives in
    the encoder wrapper, not here.
  * DINOv2-reg adds 4 register tokens after the class token.

TPU notes: attention is jax.nn.dot_product_attention over (B, N, H, D);
everything static-shaped; bf16-friendly (LayerNorms accumulate fp32).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from scenedino_tpu.core import safe_normalize
from flax import linen as nn


@dataclasses.dataclass(frozen=True)
class ViTConfig:
    patch_size: int = 16
    width: int = 768
    depth: int = 12
    num_heads: int = 12
    mlp_ratio: float = 4.0
    num_registers: int = 0  # 4 for DINOv2-reg
    layerscale: bool = False  # True for DINOv2
    class_token: bool = True  # False for Self-Patch / I-JEPA (vit.py:503-591)
    ln_eps: float = 1e-6
    pos_embed_size: Tuple[int, int] = (224, 224)  # grid the stored pos-embed was trained at
    intermediate_layers: Tuple[int, ...] = (3, 6, 9)
    dtype: Optional[object] = None  # compute dtype (bf16 for inference); params stay fp32
    # rematerialize block activations in the backward pass (jax.checkpoint)
    # to trade FLOPs for HBM — enables larger train batches on-chip
    remat: bool = False

    @property
    def num_pos_prefix_tokens(self) -> int:
        """Prefix tokens COVERED by the stored pos-embed (cls only; timm
        registers carry no positional code)."""
        return 1 if self.class_token else 0

    @property
    def num_prefix_tokens(self) -> int:
        return (1 if self.class_token else 0) + self.num_registers


VIT_PRESETS = {
    # name: (patch, width, depth, heads, registers, layerscale)
    "dino_small8": ViTConfig(8, 384, 12, 6),
    "dino_small16": ViTConfig(16, 384, 12, 6),
    "dino_base8": ViTConfig(8, 768, 12, 12),
    "dino_base16": ViTConfig(16, 768, 12, 12),
    "dinov2_small": ViTConfig(14, 384, 12, 6, layerscale=True, pos_embed_size=(518, 518)),
    "dinov2_base": ViTConfig(14, 768, 12, 12, layerscale=True, pos_embed_size=(518, 518)),
    "dinov2_reg_small": ViTConfig(14, 384, 12, 6, num_registers=4, layerscale=True, pos_embed_size=(518, 518)),
    "dinov2_reg_base": ViTConfig(14, 768, 12, 12, num_registers=4, layerscale=True, pos_embed_size=(518, 518)),
    # FiT3D fine-tuned DINOv2-reg (dinov2_module.py:291-311 loads
    # ywyue/FiT3D dinov2_reg_{small,base}_fine): same architecture as
    # dinov2-reg, different weights.
    "fit3d_small": ViTConfig(14, 384, 12, 6, num_registers=4, layerscale=True, pos_embed_size=(518, 518)),
    "fit3d_base": ViTConfig(14, 768, 12, 12, num_registers=4, layerscale=True, pos_embed_size=(518, 518)),
    # SSL ablation zoo (reference vit.py:192-591). All standard pre-LN timm
    # ViTs; they differ only in weights + (for Self-Patch / I-JEPA) the
    # absence of a class token, and (vMAE/I-JEPA) non-timm checkpoint
    # schemas handled by utils/checkpoint.adapt_ssl_state_dict.
    "mae_base": ViTConfig(16, 768, 12, 12),  # vit.py:192-206
    "vmae_large": ViTConfig(16, 1024, 24, 16),  # vit.py:208-263
    "synclr_base": ViTConfig(16, 768, 12, 12),  # vit.py:405-432
    "mocov3_base": ViTConfig(16, 768, 12, 12),  # vit.py:435-466
    "msn_base": ViTConfig(16, 768, 12, 12),  # vit.py:469-500
    "self_patch_small": ViTConfig(16, 384, 12, 6, class_token=False),  # vit.py:503-544
    "i_jepa_huge": ViTConfig(14, 1280, 32, 16, class_token=False),  # vit.py:547-591
}


def interpolate_pos_embed(pos_embed, grid_orig, grid_new, num_prefix_tokens=1):
    """Bicubic-resize the patch position embeddings to a new grid.

    pos_embed: (1, T + Gh*Gw, C). Matches
    `_interpolate_positional_embeddings` (vit.py:65-110): torch bicubic
    align_corners=False, antialias=False — NOT jax.image.resize, which
    antialiases downscales and uses a=-0.5 (core/resize.py has the
    measured divergence: ~73% relative error on the flagship DINOv2
    37x37 -> 12x40 downscale).
    """
    from scenedino_tpu.core.resize import torch_interpolate

    prefix = pos_embed[:, :num_prefix_tokens]
    patch = pos_embed[:, num_prefix_tokens:]
    gh, gw = grid_orig
    nh, nw = grid_new
    if (gh, gw) == (nh, nw):
        return pos_embed
    patch = patch.reshape(1, gh, gw, -1)
    patch = torch_interpolate(patch, (nh, nw), mode="bicubic")
    patch = patch.reshape(1, nh * nw, -1)
    return jnp.concatenate([prefix, patch], axis=1)


def _divisor_block(n: int, candidates=(1024, 512, 256, 128)) -> int:
    for c in candidates:
        if n % c == 0:
            return c
    return n


def _flash_mhsa(q, k, v):
    """Pallas TPU flash attention on (B, N, H, D) bf16 tensors, padded to a
    multiple of 512 tokens with segment-id masking (exact: pad queries only
    attend pad keys and are sliced off).

    Why: at ViT-B/8 @192x640 (N=1921) the XLA attention materializes
    ~177 MB of N^2 logits per block — bandwidth-bound at 0.52 ms/block on
    v5e; the flash kernel with these block sizes runs 0.10 ms/block
    (tools/bench_vit_attention.py), ~5 ms off every encode. Differentiable
    (the op ships a custom VJP with its own dkv/dq kernels)."""
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        BlockSizes,
        SegmentIds,
        flash_attention,
    )

    B, N, H, D = q.shape
    NP = -(-N // 512) * 512
    qt = q.transpose(0, 2, 1, 3)
    kt = k.transpose(0, 2, 1, 3)
    vt = v.transpose(0, 2, 1, 3)
    if NP != N:
        pad = ((0, 0), (0, 0), (0, NP - N), (0, 0))
        qt, kt, vt = jnp.pad(qt, pad), jnp.pad(kt, pad), jnp.pad(vt, pad)
    ids = (jnp.arange(NP) < N).astype(jnp.float32)[None]
    ids = jnp.broadcast_to(ids, (B, NP))
    bq = _divisor_block(NP)
    bkm = _divisor_block(NP, (2048, 1024, 512, 256, 128))
    bk = min(bq, bkm)
    bs = BlockSizes(
        block_q=bq, block_k_major=bkm, block_k=bk, block_b=1,
        block_q_major_dkv=bq, block_k_major_dkv=bkm, block_k_dkv=bk,
        block_q_dkv=bq, block_k_major_dq=bkm, block_k_dq=bk, block_q_dq=bq,
    )
    out = flash_attention(
        qt, kt, vt, segment_ids=SegmentIds(q=ids, kv=ids),
        sm_scale=float(D) ** -0.5, block_sizes=bs,
    )
    return out[:, :, :N].transpose(0, 2, 1, 3)


class Attention(nn.Module):
    """timm-style MHSA with a qkv projection; optionally returns keys."""

    num_heads: int
    dtype: Any = None
    # None = auto (flash on TPU for bf16 compute and N >= 512); bool forces
    use_flash: Optional[bool] = None

    @nn.compact
    def __call__(self, x, return_keys=False):
        B, N, C = x.shape
        H = self.num_heads
        D = C // H
        qkv = nn.Dense(3 * C, dtype=self.dtype, name="qkv")(x)  # (B, N, 3C)
        qkv = qkv.reshape(B, N, 3, H, D)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]  # (B, N, H, D)
        flash = self.use_flash
        if flash is None:
            flash = (
                self.dtype == jnp.bfloat16
                and N >= 512
                and jax.default_backend() == "tpu"
            )
        # timm scales q by head_dim**-0.5
        if flash:
            out = _flash_mhsa(q, k, v)
        else:
            out = jax.nn.dot_product_attention(q, k, v)
        out = out.reshape(B, N, C)
        out = nn.Dense(C, dtype=self.dtype, name="proj")(out)
        if return_keys:
            return out, k.transpose(0, 2, 1, 3)  # (B, H, N, D) like timm's getitem_4
        return out


class Mlp(nn.Module):
    hidden: int
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        x = nn.Dense(self.hidden, dtype=self.dtype, name="fc1")(x)
        x = nn.gelu(x, approximate=False)
        x = nn.Dense(C, dtype=self.dtype, name="fc2")(x)
        return x


class Block(nn.Module):
    """Pre-LN transformer block with optional LayerScale (DINOv2)."""

    num_heads: int
    mlp_ratio: float
    layerscale: bool
    ln_eps: float
    dtype: Any = None

    @nn.compact
    def __call__(self, x, return_keys=False):
        C = x.shape[-1]
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm1")(x)
        keys = None
        if return_keys:
            h, keys = Attention(self.num_heads, self.dtype, name="attn")(h, return_keys=True)
        else:
            h = Attention(self.num_heads, self.dtype, name="attn")(h)
        if self.layerscale:
            h = h * self.param("ls1", nn.initializers.constant(1e-5), (C,)).astype(h.dtype)
        x = x + h
        h = nn.LayerNorm(epsilon=self.ln_eps, dtype=self.dtype, name="norm2")(x)
        h = Mlp(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp")(h)
        if self.layerscale:
            h = h * self.param("ls2", nn.initializers.constant(1e-5), (C,)).astype(h.dtype)
        x = x + h
        if return_keys:
            return x, keys
        return x


class VisionTransformer(nn.Module):
    """DINO-family ViT with feature taps.

    __call__(images (B, 3, H, W) in [0, 1]) -> dict with
    "features_normalized" (B, N, C), "intermediate_features.{i}",
    "key_features" (B, H, N, D) — prefix tokens stripped everywhere.
    """

    cfg: ViTConfig
    want_key_features: bool = True

    @nn.compact
    def __call__(self, images) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        B, _, H, W = images.shape
        P = cfg.patch_size
        gh, gw = H // P, W // P
        n_patches = gh * gw
        T = cfg.num_prefix_tokens

        # patch embed: conv P x P stride P == per-patch linear
        x = images.transpose(0, 2, 3, 1)  # NHWC
        x = nn.Conv(cfg.width, (P, P), strides=(P, P), padding="VALID", dtype=cfg.dtype, name="patch_embed")(x)
        x = x.reshape(B, n_patches, cfg.width)

        tokens = []
        if cfg.class_token:
            cls_token = self.param("cls_token", nn.initializers.zeros, (1, 1, cfg.width))
            tokens.append(jnp.broadcast_to(cls_token, (B, 1, cfg.width)))
        if cfg.num_registers > 0:
            reg = self.param("reg_token", nn.initializers.zeros, (1, cfg.num_registers, cfg.width))
            tokens.append(jnp.broadcast_to(reg, (B, cfg.num_registers, cfg.width)))
        x = jnp.concatenate(tokens + [x], axis=1)

        grid0 = (cfg.pos_embed_size[0] // P, cfg.pos_embed_size[1] // P)
        # timm stores pos_embed for [cls?, patches] only — registers carry no
        # positional code (they are concatenated after the pos-add). Models
        # without a class token (Self-Patch, I-JEPA) store patches only
        # (ref vit.py num_additional_tokens=0).
        Tp = cfg.num_pos_prefix_tokens
        pos = self.param(
            "pos_embed",
            nn.initializers.normal(0.02),
            (1, Tp + grid0[0] * grid0[1], cfg.width),
        )
        # DINOv2 (timm) adds pos-embed to patch tokens and cls but NOT registers;
        # timm implements this by concatenating registers after pos-add when
        # pos_embed covers 1+N. We follow timm: interpolate over the patch grid
        # and add to [cls?, patches]; registers get no positional code.
        pos_i = interpolate_pos_embed(pos, grid0, (gh, gw), num_prefix_tokens=Tp)
        if cfg.num_registers > 0:
            cls_pos, patch_pos = pos_i[:, :Tp], pos_i[:, Tp:]
            zeros = jnp.zeros((1, cfg.num_registers, cfg.width), pos_i.dtype)
            pos_i = jnp.concatenate([cls_pos, zeros, patch_pos], axis=1)
        # keep the residual stream in the compute dtype: adding the fp32
        # pos-embed param to bf16 tokens would promote every residual add
        # through all blocks to fp32 (2x HBM traffic under bf16 compute)
        x = x + pos_i.astype(x.dtype)

        out: Dict[str, jnp.ndarray] = {}
        inter = set(cfg.intermediate_layers)
        key_feats = None
        # remat keeps the variable tree identical (flax lifted transform), so
        # checkpoints are interchangeable with the non-remat model
        Blk = nn.remat(Block) if cfg.remat else Block
        for i in range(cfg.depth):
            last = i == cfg.depth - 1
            if last and self.want_key_features:
                x, key_feats = Block(
                    cfg.num_heads, cfg.mlp_ratio, cfg.layerscale, cfg.ln_eps, cfg.dtype,
                    name=f"blocks_{i}"
                )(x, return_keys=True)
            else:
                x = Blk(
                    cfg.num_heads, cfg.mlp_ratio, cfg.layerscale, cfg.ln_eps, cfg.dtype,
                    name=f"blocks_{i}"
                )(x)
            if i in inter:
                out[f"intermediate_features.{len([j for j in sorted(inter) if j <= i]) - 1}"] = x[:, T:]

        x = nn.LayerNorm(epsilon=self.cfg.ln_eps, dtype=cfg.dtype, name="norm")(x)
        feats = x[:, T:]
        feats = safe_normalize(feats, axis=-1, eps=1e-12)
        out["features_normalized"] = feats
        if key_feats is not None:
            out["key_features"] = key_feats[:, :, T:]
        return out


def make_vit(name: str, intermediate_layers: Sequence[int] = (3, 6, 9), want_key_features: bool = False, dtype=None, overrides=None) -> VisionTransformer:
    cfg = dataclasses.replace(
        VIT_PRESETS[name], intermediate_layers=tuple(intermediate_layers), dtype=dtype,
        **(overrides or {}),
    )
    return VisionTransformer(cfg=cfg, want_key_features=want_key_features)
