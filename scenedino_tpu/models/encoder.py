"""The DINO encoder stack: ViT + decoder + frozen GT teacher + down/up
samplers + dim reduction (flax.linen).

Behavioral parity target: `scenedino/models/backbones/dino/dinov2_module.py`
(DINOv2Module:91, DINOv2Encoder:230) and siblings `downsampler.py`,
`dim_reduction.py`, `upsampler.py`.

Key semantics preserved:
  * Inputs to the stack are in [-1, 1]; ViTs receive ImageNet-normalized
    [0, 1] images (`_normalize_input`, dinov2_module.py:225-227).
  * DINOv2/reg: internal patch 14, image resized by 14/16 so the external
    patch stays 16 (dinov2_module.py:236-240).
  * `forward(x)` -> decoder feature maps; `forward(x, ground_truth=True)`
    -> frozen-teacher patch features (stop-gradient).
  * `downsample` pools rendered per-pixel features back to the DINO patch
    grid (featup-style PatchSalienceDownsampler, downsampler.py:31-98).
  * `expand_dim` maps the 64-d field feature to the 768-d DINO space
    (MlpDimReduction, dim_reduction.py:15-26).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedino_tpu.core import safe_normalize
from scenedino_tpu.models.dpt import DPTHead, NoDecoder
from scenedino_tpu.models.vit import VIT_PRESETS, VisionTransformer, make_vit

IMAGENET_MEAN = jnp.array([0.485, 0.456, 0.406])
IMAGENET_STD = jnp.array([0.229, 0.224, 0.225])


def normalize_input(x):
    """[-1, 1] NCHW images -> ImageNet-normalized (dinov2_module.py:225-227)."""
    x = x * 0.5 + 0.5
    return (x - IMAGENET_MEAN[None, :, None, None]) / IMAGENET_STD[None, :, None, None]


def _vit_name(backbone: str, version: str) -> str:
    size = {"vit-s": "small", "vit-b": "base"}[backbone]
    if version == "v1":
        return f"dino_{size}8"
    if version == "v1_16":
        return f"dino_{size}16"
    if version == "v2":
        return f"dinov2_{size}"
    if version == "reg":
        return f"dinov2_reg_{size}"
    if version == "fit3d":
        # FiT3D = fine-tuned DINOv2-reg (dinov2_module.py:291-311)
        return f"fit3d_{size}"
    raise NotImplementedError(version)


class DinoViTEncoder(nn.Module):
    """ViT wrapper producing stride-`patch` feature grids.

    Matches DINOv2Encoder (dinov2_module.py:230-290): returns a list
    [*intermediate grids (B, C, Gh, Gw), final normalized grid]. For v2/reg
    the input is bilinearly resized x14/16 so the output grid matches an
    external patch size of 16.
    """

    backbone: str = "vit-b"
    version: str = "v1"
    image_size: Tuple[int, int] = (192, 640)
    intermediate_features: Tuple[int, ...] = (3, 6, 9)
    key_features: bool = False
    dtype: Optional[object] = None  # compute dtype (bf16 inference)
    vit_overrides: Optional[Tuple[Tuple[str, int], ...]] = None  # e.g. (("width", 64), ("depth", 2))
    grad_checkpointing: bool = False  # remat ViT blocks (larger train batches)

    @property
    def patch_size(self) -> int:
        return 16 if self.version in ("v2", "reg", "fit3d", "v1_16") else 8

    @property
    def latent_size(self) -> int:
        if self.vit_overrides:
            ov = dict(self.vit_overrides)
            if "width" in ov:
                return ov["width"]
        # read the live preset so shrunken test/dryrun ViTs stay consistent
        return VIT_PRESETS[_vit_name(self.backbone, self.version)].width

    @nn.compact
    def __call__(self, x) -> List[jnp.ndarray]:
        x = normalize_input(x)
        if self.version in ("v2", "reg", "fit3d"):
            H, W = x.shape[-2:]
            nh, nw = H * 14 // 16, W * 14 // 16
            x = jax.image.resize(x, (*x.shape[:2], nh, nw), method="bilinear")
        overrides = dict(self.vit_overrides) if self.vit_overrides else {}
        if self.grad_checkpointing:
            overrides["remat"] = True
        vit = make_vit(
            _vit_name(self.backbone, self.version),
            intermediate_layers=self.intermediate_features,
            want_key_features=self.key_features,
            dtype=self.dtype,
            overrides=overrides or None,
        )
        out = vit(x)
        p = vit.cfg.patch_size
        gh, gw = x.shape[-2] // p, x.shape[-1] // p

        def to_grid(tokens):  # (B, N, C) -> (B, C, Gh, Gw)
            B, N, C = tokens.shape
            return tokens.transpose(0, 2, 1).reshape(B, C, gh, gw)

        result = [
            to_grid(out[f"intermediate_features.{i}"])
            for i in range(len(self.intermediate_features))
        ]
        if self.key_features:
            kf = out["key_features"]  # (B, H, N, D)
            B, Hh, N, D = kf.shape
            tokens = kf.transpose(0, 2, 1, 3).reshape(B, N, Hh * D)
            tokens = safe_normalize(tokens, axis=-1, eps=1e-12)
            result.append(to_grid(tokens))
        else:
            result.append(to_grid(out["features_normalized"]))
        return result


class MlpDimReduction(nn.Module):
    """64 -> 128 -> 768 + L2 norm (dim_reduction.py:15-26)."""

    full_channels: int = 768
    latent_channels: int = 128

    @nn.compact
    def __call__(self, features):
        from scenedino_tpu.core import safe_normalize

        h = nn.relu(nn.Dense(self.latent_channels, name="linear_in")(features))
        out = nn.Dense(self.full_channels, name="linear_out")(h)
        return safe_normalize(out, eps=1e-12)


class OrthogonalLinearDimReduction(nn.Module):
    """Learned (full x reduced) matrix, transpose expand (dim_reduction.py:29-38)."""

    full_channels: int = 768
    reduced_channels: int = 64

    @nn.compact
    def __call__(self, features):
        w = self.param(
            "weights",
            lambda k: jnp.eye(self.full_channels, self.reduced_channels),
        )
        from scenedino_tpu.core import safe_normalize

        b = self.param("bias", nn.initializers.zeros, (self.full_channels,))
        out = features @ w.T + b
        return safe_normalize(out, eps=1e-12)


class BilinearDownsampler(nn.Module):
    """Bilinear pool pixel features to the patch grid (downsampler.py:6-29).

    x: (B, V, H, W, 1, C) -> (B, V, Gh, Gw, C) (trailing singleton folded).
    """

    patch_size: int = 16

    @nn.compact
    def __call__(self, x, mode="image"):
        B, V, H, W, one, C = x.shape
        th, tw = H // self.patch_size, W // self.patch_size
        flat = x.reshape(B * V, H, W, C)
        # torch F.interpolate(mode="bilinear") with its antialias=False
        # default (downsampler.py:26): a 2x2-tap POINT sample at the output
        # pixel centers, NOT an area average — jax.image.resize would
        # antialias the 8x/16x downscale (see core/resize.py)
        from scenedino_tpu.core.resize import torch_interpolate

        out = torch_interpolate(flat, (th, tw), mode="bilinear")
        return out.reshape(B, V, th, tw, 1, C)[..., 0, :]


class PatchSalienceDownsampler(nn.Module):
    """FeatUp-style learned salience pooling (downsampler.py:31-98).

    1x1-conv salience + learned per-patch weight/bias -> softmax over the
    patch pixels -> weighted sum (+ optional L2 normalize).
    """

    channels: int = 768
    patch_size: int = 16
    normalize_features: bool = True

    @nn.compact
    def __call__(self, x, mode="image"):
        P = self.patch_size
        # `channels` mirrors the reference Conv2d in_channels
        # (downsampler.py:36): validate instead of silently re-shaping the
        # lazily-created conv on a mismatched width
        assert x.shape[-1] == self.channels, (
            f"PatchSalienceDownsampler built for {self.channels}-d features, "
            f"got {x.shape[-1]}-d input"
        )
        def _mean_one_init(key, shape, dtype=jnp.float32):
            return 1.0 + 0.01 * jax.random.normal(key, shape, dtype)

        pw = self.param("patch_weight", _mean_one_init, (P, P))
        pb = self.param("patch_bias", nn.initializers.normal(0.01), (P, P))
        conv = nn.Conv(1, (1, 1), name="salience_conv", kernel_init=nn.initializers.kaiming_normal())

        if mode == "patch":
            # x: (B, Pn, Ph, Pw, 1, C) patches
            B, Pn, Ph, Pw_, one, C = x.shape
            flat = x.reshape(B * Pn, Ph, Pw_, C)
            sal = conv(flat)[..., 0].reshape(B, Pn, Ph, Pw_)
        else:
            # x: (B, V, H, W, 1, C) full images -> fold into patches
            B, V, H, W, one, C = x.shape
            gh, gw = H // P, W // P
            patches = x.reshape(B, V, gh, P, gw, P, 1, C).swapaxes(3, 4)
            x = patches.reshape(B, V * gh * gw, P, P, 1, C)
            B, Pn = B, V * gh * gw
            flat = x.reshape(B * Pn, P, P, C)
            sal = conv(flat)[..., 0].reshape(B, Pn, P, P)

        w = sal * pw + pb
        w = jax.nn.softmax(w.reshape(B, Pn, -1), axis=-1).reshape(B, Pn, *x.shape[2:4], 1, 1)
        pooled = jnp.sum(w * x, axis=(2, 3))  # (B, Pn, 1, C)
        if self.normalize_features:
            # safe_normalize, NOT x/max(||x||, eps): sum(x^2) can
            # underflow to 0 in fp32 for near-cancelling pooled rows,
            # and the x/max form then emits NaN under reverse-mode AD
            # (0-cotangent x inf sqrt'(0)) - the flagship iter-1360
            # crash was born on this exact line (logs/diag_probe2.log)
            pooled = safe_normalize(pooled, axis=-1, eps=1e-12)
        if mode == "patch":
            return pooled[..., 0, :]
        return pooled.reshape(B, V, gh, gw, C)


@dataclasses.dataclass(frozen=True)
class DinoModuleConfig:
    """configs/model/dino_downsampler.yaml `encoder:` block."""

    mode: str = "downsample-prediction"  # | "upsample-gt"
    decoder_arch: str = "dpt"
    upsampler_arch: Optional[str] = None
    downsampler_arch: Optional[str] = "featup"
    encoder_arch: str = "vit-b"
    version: str = "v1"
    separate_gt_version: Optional[str] = "v1"
    encoder_freeze: bool = False
    flip_avg_gt: bool = False
    dim_reduction_arch: str = "mlp"
    num_ch_enc: Tuple[int, ...] = (64, 64, 128, 256)
    intermediate_features: Tuple[int, ...] = (3, 6, 9)
    decoder_out_dim: int = 256
    dino_pca_dim: int = 64
    image_size: Tuple[int, int] = (192, 640)
    key_features: bool = False
    grad_checkpointing: bool = False  # remat the *student* ViT blocks
    dtype: Optional[object] = None  # compute dtype: None (fp32) or bf16
    vit_overrides: Optional[Tuple[Tuple[str, int], ...]] = None  # custom ViT size


class DinoModule(nn.Module):
    """Umbrella encoder (DINOv2Module, dinov2_module.py:91-222)."""

    cfg: DinoModuleConfig

    @property
    def latent_size(self) -> int:
        return self.cfg.decoder_out_dim

    @property
    def extra_outs(self) -> int:
        return 0

    @property
    def gt_patch_size(self) -> int:
        """External patch size of the frozen teacher (16 for v2/reg, 8 for v1).
        Plain property (not setup state) so it is readable on the unbound
        module, e.g. by the trainer for shift/sampler grid sizing."""
        v = self.cfg.separate_gt_version or self.cfg.version
        return 16 if v in ("v2", "reg", "fit3d", "v1_16") else 8

    def setup(self):
        c = self.cfg
        self.vit_encoder = DinoViTEncoder(
            backbone=c.encoder_arch,
            version=c.version,
            image_size=c.image_size,
            intermediate_features=tuple(c.intermediate_features),
            key_features=c.key_features,
            dtype=c.dtype,
            vit_overrides=c.vit_overrides,
            grad_checkpointing=c.grad_checkpointing,
        )
        if c.decoder_arch == "dpt":
            self.decoder = DPTHead(post_process_channels=tuple(c.num_ch_enc), d_out=c.decoder_out_dim, dtype=c.dtype)
        elif c.decoder_arch in ("nearest", "bilinear", "bicubic"):
            self.decoder = NoDecoder(image_size=c.image_size, interpolation=c.decoder_arch)
        elif c.decoder_arch == "spf":
            from scenedino_tpu.models.dpt import SimpleFeaturePyramidDecoder

            # dinov2_module.py:37-47: fixed dec widths, 4 scales, skips on
            self.decoder = SimpleFeaturePyramidDecoder(
                latent_size=self.vit_encoder.latent_size,
                num_ch_enc=tuple(c.num_ch_enc),
                num_ch_dec=(128, 128, 256, 256, 512),
                d_out=c.decoder_out_dim,
                scales=(0, 1, 2, 3),
                use_skips=True,
            )
        else:
            raise NotImplementedError(c.decoder_arch)

        if c.separate_gt_version is not None:
            self.gt_encoder = DinoViTEncoder(
                backbone=c.encoder_arch,
                version=c.separate_gt_version,
                image_size=c.image_size,
                intermediate_features=(),
                key_features=c.key_features,
                dtype=c.dtype,
                vit_overrides=c.vit_overrides,
            )
        else:
            self.gt_encoder = self.vit_encoder

        gt_latent = self.gt_encoder.latent_size
        gt_patch = self.gt_encoder.patch_size
        if c.mode == "downsample-prediction":
            if c.downsampler_arch == "featup":
                self.downsampler = PatchSalienceDownsampler(channels=gt_latent, patch_size=gt_patch)
            elif c.downsampler_arch == "bilinear":
                self.downsampler = BilinearDownsampler(patch_size=gt_patch)
            else:
                raise NotImplementedError(c.downsampler_arch)
        elif c.mode == "upsample-gt":
            from scenedino_tpu.models.upsampler import InterpolatedGT, MultiScaleCropGT

            if c.upsampler_arch in ("nearest", "bilinear", "bicubic"):
                self.gt_upsampler = InterpolatedGT(interpolation=c.upsampler_arch, image_size=c.image_size)
            elif c.upsampler_arch == "multiscale-crop":
                self.gt_upsampler = MultiScaleCropGT(num_views=4, image_size=c.image_size)
            else:
                raise NotImplementedError(c.upsampler_arch)
        else:
            raise NotImplementedError(c.mode)

        if c.dim_reduction_arch == "mlp":
            self.dim_reduction = MlpDimReduction(full_channels=self.vit_encoder.latent_size)
        elif c.dim_reduction_arch == "orthogonal-linear":
            self.dim_reduction = OrthogonalLinearDimReduction(
                full_channels=self.vit_encoder.latent_size, reduced_channels=c.dino_pca_dim
            )
        elif c.dim_reduction_arch == "none":
            self.dim_reduction = None
        else:
            raise NotImplementedError(c.dim_reduction_arch)

    def warmup(self, x):
        """Touch every parameterized path once so a single `init` creates the
        full variable tree (student, teacher, downsampler, dim reduction).
        linen creates params lazily per-path; without this, the gt/teacher
        branch would be uninitialized until first use."""
        student = self(x, ground_truth=False)
        _ = self(x, ground_truth=True)
        if self.cfg.mode == "downsample-prediction":
            P = self.gt_patch_size
            B, C, H, W = student[0].shape
            # the downsampler consumes TEACHER-space features (its conv is
            # built with gt_encoder.latent_size, downsampler.py:36); a
            # student-width dummy would create a mismatched salience conv
            # whenever student and teacher widths differ
            dummy = jnp.zeros((B, 1, P, P, 1, self.gt_encoder.latent_size))
            _ = self.downsample(dummy, "patch")
        _ = self.expand_dim(jnp.zeros((1, self.cfg.dino_pca_dim)))
        return student

    def __call__(self, x, ground_truth: bool = False, fold_matrix=None):
        """x: (B, 3, H, W) in [-1, 1]. Student path -> decoder maps; GT path
        -> stop-gradient teacher patch features (dinov2_module.py:158-183).

        fold_matrix (serving): a (decoder_out_dim, d) matrix folded into the
        DPT head's final conv (exact, conv is linear) so the feature grid
        comes out already projected — see ops/fast_field.encode_prefolded."""
        c = self.cfg
        if ground_truth:
            if c.mode == "upsample-gt":
                gt = self.gt_upsampler(self.gt_encoder, x)
            else:
                gt = self.gt_encoder(x)[-1]
                if c.flip_avg_gt:
                    flipped = self.gt_encoder(x[..., ::-1])[-1][..., ::-1]
                    gt = gt + flipped
                    gt = safe_normalize(gt, axis=1, eps=1e-12)
            return [jax.lax.stop_gradient(gt)]
        feats = self.vit_encoder(x)
        if c.encoder_freeze:
            feats = [jax.lax.stop_gradient(f) for f in feats]
        if fold_matrix is not None:
            if c.decoder_arch != "dpt":
                raise NotImplementedError("fold_matrix requires the DPT decoder")
            return self.decoder(feats, fold_matrix=fold_matrix)
        return self.decoder(feats)

    def downsample(self, x, mode="patch"):
        if self.cfg.mode != "downsample-prediction":
            return None
        return self.downsampler(x, mode)

    def expand_dim(self, features):
        if self.dim_reduction is None:
            return features
        return self.dim_reduction(features)
