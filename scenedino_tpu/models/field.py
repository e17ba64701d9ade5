"""SceneField: the neural feature/density field (flax.linen).

Behavioral parity target: `scenedino/models/bts.py` (BTSNet). Redesigned
TPU-first: instead of a stateful module that caches feature grids on
`encode()` and reads them in `forward()`, we split the model into

  * `encode(images, ks, poses_c2w, ...) -> SceneState` — runs the image
    encoder once and returns an explicit pytree of per-view feature grids,
    color images and camera parameters. The state threads through jit
    boundaries, shards over the batch axis of a device mesh, and makes the
    query path a pure function.
  * `query(state, xyz, ...)` — projects world points into every source
    view, gathers pixel-aligned features (bilinear NDC sampling), appends
    the positional code of (x_ndc, y_ndc, z_norm), and runs the field-head
    MLP to (sigma, dino). Fully batched over B x V x P with no view loops.

The chunked evaluation of the reference (`eval_batch_size` splitting in
nerf.py:268-298) is unnecessary under XLA: the query is one fused
gather+matmul program; callers control memory via ray-batch shape and
`jax.lax.map` at grid-eval time.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from scenedino_tpu.core import cameras, encoding, grid_sample
from scenedino_tpu.models.heads import make_head


@struct.dataclass
class SceneState:
    """Everything `encode` produces and `query`/`render` consume.

    Mirrors BTSNet's grid_* caches (bts.py:246-259) as an explicit pytree.
    Shapes: feat_grid (B, Ve, C, Hf, Wf); color_imgs (B, Vr, 3, H, W) in
    [0, 1]; Ks normalized NDC intrinsics; poses are world->camera.
    """

    feat_grid: jnp.ndarray
    feat_ks: jnp.ndarray
    feat_w2c: jnp.ndarray
    color_imgs: jnp.ndarray
    color_ks: jnp.ndarray
    color_w2c: jnp.ndarray
    # frozen-teacher feature maps for the loss (B, Vl, Cd, Hp, Wp); None at inference
    loss_feats: Optional[jnp.ndarray] = None


@dataclasses.dataclass(frozen=True)
class FieldConfig:
    """Static field hyper-parameters (configs/model/dino_downsampler.yaml)."""

    z_near: float = 3.0
    z_far: float = 80.0
    inv_z: bool = True
    code_mode: str = "z"  # "z" | "distance"
    learn_empty: bool = False
    sample_color: bool = True
    predict_dino: bool = True
    dino_dims: int = 64
    num_freqs: int = 6
    freq_factor: float = 1.5
    include_input: bool = True
    color_interpolation: str = "bilinear"

    @property
    def code_dims(self) -> int:
        return encoding.positional_encoding_dims(self.num_freqs, 3, self.include_input)

    @property
    def d_out(self) -> int:
        if self.sample_color and self.predict_dino:
            return 1 + self.dino_dims
        if self.sample_color:
            return 1
        return 4


class SceneField(nn.Module):
    """Encoder + positional code + field heads (BTSNet, bts.py:22-595)."""

    encoder: nn.Module
    cfg: FieldConfig
    head_confs: Tuple[Tuple[str, Any], ...] = (("normal_head", {"type": "resnet", "args": {"n_blocks": 0, "d_hidden": 128}}),)
    final_pred_head: str = "normal_head"
    downstream: Optional[nn.Module] = None
    # optional per-image uncertainty backbone (models/__init__.py:22-26 ->
    # bts.py:30,38); its softplus'd map rides as an extra color channel
    uncertainty_predictor: Optional[nn.Module] = None

    def setup(self):
        self.heads = {name: make_head(dict(conf), 0, self.cfg.d_out) for name, conf in self.head_confs}
        if self.cfg.learn_empty:
            self.empty_feature = self.param(
                "empty_feature", nn.initializers.normal(1.0), (self.encoder.latent_size,)
            )

    # ------------------------------------------------------------------ encode
    def encode(
        self,
        images: jnp.ndarray,  # (B, V, 3, H, W) in [-1, 1]
        ks: jnp.ndarray,  # (B, V, 3, 3) normalized
        poses_c2w: jnp.ndarray,  # (B, V, 4, 4)
        ids_encoder: Optional[Tuple[int, ...]] = None,
        ids_render: Optional[Tuple[int, ...]] = None,
        ids_loss: Optional[Tuple[int, ...]] = None,
        with_loss_feats: bool = False,
        loss_feature_grid_shift: Optional[Tuple[int, int]] = None,
        augment_flip: bool = False,
        extra_color_channels: Optional[jnp.ndarray] = None,
        fold_matrix: Optional[jnp.ndarray] = None,
    ) -> SceneState:
        """Run the image encoder(s) and bundle the scene state.

        View-id selection is static (Python tuples) so each distinct frame
        assignment compiles once. Matches BTSNet.encode (bts.py:112-259):
        the render images are de-normalized to [0, 1], poses are inverted
        to world->camera in fp32.

        `augment_flip=True` draws one coin per batch from the "augment" rng
        stream, horizontally flips the *student* encode images, and un-flips
        the resulting feature grid (bts.py:185-216; the loss/teacher images
        are never flipped). The select runs on the input/output tensors so
        the encoder itself traces once.
        """
        B, V = images.shape[:2]
        all_ids = tuple(range(V))

        def take(x, ids):
            """Select views: static tuples OR traced index arrays (dynamic
            loss/render frame assignment compiles once — a TPU-first
            replacement for the reference's python-level id lists)."""
            if ids is None:
                return x
            if isinstance(ids, (tuple, list)):
                return x[:, tuple(ids)]
            return jnp.take(x, ids, axis=1)

        ids_encoder = ids_encoder if ids_encoder is not None else all_ids
        ids_render = ids_render if ids_render is not None else all_ids
        ids_loss = ids_loss if ids_loss is not None else all_ids

        poses_w2c = jnp.linalg.inv(poses_c2w.astype(jnp.float32))

        imgs_enc = take(images, ids_encoder)
        ne = imgs_enc.shape[1]
        flip_coin = None
        if augment_flip:
            flip_coin = jax.random.bernoulli(self.make_rng("augment"))
            imgs_enc = jnp.where(flip_coin, jnp.flip(imgs_enc, axis=-1), imgs_enc)
        x_enc = imgs_enc.reshape(B * ne, *imgs_enc.shape[2:])
        if fold_matrix is not None:
            # serving: fold a linear output projection (the field head's
            # W_feat) into the encoder's last conv — exact; the returned
            # feat_grid is already projected (ops/fast_field.encode_prefolded)
            feats = self.encoder(x_enc, fold_matrix=fold_matrix)
        else:
            feats = self.encoder(x_enc)
        if isinstance(feats, (list, tuple)):
            feats = feats[0]
        if flip_coin is not None:
            feats = jnp.where(flip_coin, jnp.flip(feats, axis=-1), feats)
        feat_grid = feats.reshape(B, ne, *feats.shape[1:])

        loss_feats = None
        if with_loss_feats:
            imgs_loss = take(images, ids_loss)
            if loss_feature_grid_shift is not None:
                imgs_loss = _shift_pad_crop(imgs_loss, loss_feature_grid_shift)
            nl = imgs_loss.shape[1]
            lf = self.encoder(imgs_loss.reshape(B * nl, *imgs_loss.shape[2:]), ground_truth=True)
            if isinstance(lf, (list, tuple)):
                lf = lf[0]
            loss_feats = lf.reshape(B, nl, *lf.shape[1:])

        color_imgs = take(images, ids_render) * 0.5 + 0.5
        if extra_color_channels is not None:
            # uncertainty (or other processed) channels ride along the render
            # colors so the volume renderer integrates them per ray
            # (trainer.py:173-178 images_ip concat)
            color_imgs = jnp.concatenate(
                [color_imgs, take(extra_color_channels, ids_render)], axis=2
            )
        return SceneState(
            feat_grid=feat_grid,
            feat_ks=take(ks, ids_encoder),
            feat_w2c=take(poses_w2c, ids_encoder),
            color_imgs=jnp.asarray(color_imgs),
            color_ks=take(ks, ids_render),
            color_w2c=take(poses_w2c, ids_render),
            loss_feats=loss_feats,
        )

    # ----------------------------------------------------------------- queries
    def sample_features(self, state: SceneState, xyz: jnp.ndarray):
        """Pixel-aligned features + positional code for world points.

        xyz: (B, P, 3). Returns (features (B, P, V, C+code), invalid (B, P, V)).
        Matches BTSNet.sample_features (bts.py:271-328).
        """
        cfg = self.cfg
        # named_scope parity with the reference's record_function spans
        # (bts.py:478, positional_encoding.py:74) for jax.profiler traces
        with jax.named_scope("project_points"):
            xy, z, dist, invalid = cameras.project_points(xyz, state.feat_w2c, state.feat_ks)
        with jax.named_scope("positional_encoding"):
            coords = encoding.encode_coords(
                xy.astype(jnp.float32), z.astype(jnp.float32), dist.astype(jnp.float32),
                cfg.z_near, cfg.z_far, mode=cfg.code_mode, inv_z=cfg.inv_z,
            )
            code = encoding.positional_encoding(
                coords, cfg.num_freqs, cfg.freq_factor, cfg.include_input
            )  # (B, V, P, code_dims)
        with jax.named_scope("pixel_aligned_gather"):
            sampled = grid_sample.grid_sample_views(state.feat_grid, xy)  # (B, V, P, C)
        if cfg.learn_empty:
            empty = self.empty_feature.astype(sampled.dtype)
            sampled = jnp.where(invalid, empty[None, None, None, :], sampled)
        feats = jnp.concatenate([sampled, code.astype(sampled.dtype)], axis=-1)
        return feats.transpose(0, 2, 1, 3), invalid[..., 0].transpose(0, 2, 1)

    def sample_colors(self, state: SceneState, xyz: jnp.ndarray):
        """Colors of world points reprojected into the render views.

        Returns (colors (B, Vr, P, 3), invalid (B, Vr, P, 1)).
        Matches BTSNet.sample_colors (bts.py:330-365) without the legacy
        combine-groups / frame-filter gather paths (expressed at the
        trainer level with static masks instead).
        """
        xy, z, _, invalid = cameras.project_points(xyz, state.color_w2c, state.color_ks)
        colors = grid_sample.grid_sample_views(
            state.color_imgs, xy, mode=self.cfg.color_interpolation
        )
        return colors, invalid

    def __call__(self, state: SceneState, xyz: jnp.ndarray, only_density: bool = False):
        """Field query: world points -> (rgb, invalid, sigma, dino).

        xyz: (B, P, 3). Shapes: rgb (B, P, Vr*3); invalid (B, P, Vr);
        sigma (B, P); dino (B, P, dino_dims).
        Matches BTSNet.forward (bts.py:476-595) for the shipped config
        (sample_color=True, predict_dino=True).
        """
        cfg = self.cfg
        feats, invalid_features = self.sample_features(state, xyz)  # (B, P, V, D)

        head_outputs = {
            name: head(feats, invalid_features=invalid_features)
            for name, head in self.heads.items()
        }
        if "normal_head" in head_outputs and "dino_head" in head_outputs:
            mlp_out = jnp.concatenate(
                [head_outputs["normal_head"], head_outputs["dino_head"]], axis=-1
            )
        else:
            mlp_out = head_outputs[self.final_pred_head]
        # collapse the (single) view axis like the reference's reshape
        # (bts.py:520-523); multi-view heads combine internally.
        B, P = xyz.shape[:2]
        mlp_out = mlp_out.reshape(B, P, -1, mlp_out.shape[-1]).mean(axis=2)

        if not cfg.sample_color:
            # MLP predicts rgb directly (bts.py:545-552): relu sigma + sigmoid rgb
            sigma = nn.relu(mlp_out[..., 0].astype(jnp.float32))
            rgb = nn.sigmoid(mlp_out[..., 1:4])
            invalid = invalid_features.astype(rgb.dtype)
            return rgb, invalid, sigma, None

        sigma = nn.softplus(mlp_out[..., 0].astype(jnp.float32))
        dino = mlp_out[..., 1:] if cfg.predict_dino else None

        if only_density:
            return None, invalid_features.astype(jnp.float32), sigma, dino

        colors, invalid_colors = self.sample_colors(state, xyz)  # (B, Vr, P, 3)
        Vr = colors.shape[1]
        # channel count follows state.color_imgs (3 + any extra channels)
        rgb = colors.transpose(0, 2, 1, 3).reshape(B, P, Vr * colors.shape[-1])
        inv_c = invalid_colors[..., 0].transpose(0, 2, 1)  # (B, P, Vr)
        invalid = (inv_c | jnp.all(invalid_features, axis=-1, keepdims=True)).astype(rgb.dtype)
        return rgb, invalid, sigma, dino

    def warmup(
        self,
        images: jnp.ndarray,
        ks: jnp.ndarray,
        poses_c2w: jnp.ndarray,
    ):
        """Single-init path touching encode (student+teacher), query heads,
        dim expansion and downsampling. Use
        `field.init({"params": k, "augment": k}, imgs, ks, poses,
        method=SceneField.warmup)` to build the complete parameter tree.
        """
        has_enc_warmup = hasattr(self.encoder, "warmup")
        if has_enc_warmup:
            # covers teacher, downsampler and dim-reduction params
            self.encoder.warmup(images.reshape(-1, *images.shape[2:]))
        state = self.encode(images, ks, poses_c2w, ids_encoder=(0,), with_loss_feats=True)
        xyz = jnp.zeros((images.shape[0], 4, 3))
        out = self(state, xyz)
        if self.cfg.predict_dino and not has_enc_warmup:
            _ = self.expand_dim(out[3])
        if self.downstream is not None:
            # touch every prediction head so the init tree covers the full
            # checkpoint schema (stego/direct x kmeans/linear)
            for mode in ("stego_kmeans", "stego_linear", "direct_kmeans", "direct_linear"):
                _ = self.query_segmentation(state, xyz, mode=mode)
        if self.uncertainty_predictor is not None:
            _ = self.predict_uncertainty(images)
        return state

    def warmup_init(self, key, images, ks, poses_c2w):
        """`field.init(..., method=SceneField.warmup)` under `jax.jit`.

        Eager `init` dispatches the whole warmup graph op-by-op — over an
        axon-tunneled TPU that is minutes of round trips for the ViT-B
        flagship. Jitting turns it into ONE compiled program (persisted in
        the compilation cache), so cold-start init drops to a single
        compile + execute. Use this from CLIs/benches; tests on CPU can
        keep plain init.
        """

        def _init(k, imgs, kmat, poses):
            return self.init(
                {"params": k, "augment": k}, imgs, kmat, poses,
                method=SceneField.warmup,
            )

        return jax.jit(_init)(key, images, ks, poses_c2w)

    def predict_uncertainty(self, images: jnp.ndarray, res: int = 0):
        """Per-pixel uncertainty from the optional predictor backbone.

        images: (B, V, 3, H, W) in [-1, 1] -> (B, V, 1, H, W), softplus'd
        and bilinearly resized to image resolution (trainer.py:173-177).
        """
        B, V, C, H, W = images.shape
        outs = self.uncertainty_predictor(images.reshape(B * V, C, H, W))
        u = outs[res]  # (B*V, 1, H/2^res, W/2^res)
        if u.shape[-2:] != (H, W):
            u = jax.image.resize(u, (*u.shape[:2], H, W), method="bilinear")
        return jax.nn.softplus(u).reshape(B, V, 1, H, W)

    def expand_dim(self, features):
        """64-d field feature -> 768-d DINO space (encoder.dim_reduction)."""
        return self.encoder.expand_dim(features)

    def downsample(self, features, mode="patch"):
        """Pool rendered pixel features back to the teacher patch grid."""
        if hasattr(self.encoder, "downsample"):
            return self.encoder.downsample(features, mode)
        return None

    def query_segmentation(self, state: SceneState, xyz: jnp.ndarray, mode: str = "stego_kmeans"):
        """SSC path: (dino_full_768, sigma, seg_logits). bts.py:553-593."""
        _, _, sigma, dino = self(state, xyz, only_density=True)
        dino_full = self.encoder.expand_dim(dino)
        seg = None
        if self.downstream is not None:
            seg = self.downstream(dino_full, mode=mode)
        return dino_full, sigma, seg

    def segment_features(self, dino: jnp.ndarray, mode: str = "stego_kmeans"):
        """Downstream tail of query_segmentation for precomputed 64-d field
        features (the fast SSC voxel path queries sigma/dino via
        ops/fast_field.fast_query, then runs this under apply)."""
        dino_full = self.encoder.expand_dim(dino)
        seg = None
        if self.downstream is not None:
            seg = self.downstream(dino_full, mode=mode)
        return dino_full, seg


def _shift_pad_crop(imgs, shift, pad=8):
    """Edge-pad by 8 then crop with an (i, j) offset — the DINO patch-grid
    shift augmentation (bts.py:196-206). `shift` may be traced ints."""
    i = pad + shift[0]
    j = pad + shift[1]
    B, V, C, H, W = imgs.shape
    x = imgs.reshape(B * V, C, H, W)
    x = jnp.pad(x, ((0, 0), (0, 0), (pad, pad), (pad, pad)), mode="edge")
    x = jax.lax.dynamic_slice(x, (0, 0, i, j), (B * V, C, H, W))
    return x.reshape(B, V, C, H, W)


class EncoderDummy(nn.Module):
    """Learned constant feature map — the overfit-test encoder
    (scenedino/training/trainer_overfit.py:21-29)."""

    size: Tuple[int, int]
    feat_dim: int
    latent_size: int = 0

    @nn.compact
    def __call__(self, x, ground_truth: bool = False):
        feat = self.param(
            "feat", nn.initializers.normal(1.0), (1, self.feat_dim, *self.size)
        )
        return jnp.broadcast_to(feat, (x.shape[0], self.feat_dim, *self.size))

    def expand_dim(self, x):
        return x
