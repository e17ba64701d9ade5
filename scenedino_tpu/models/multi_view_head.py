"""Legacy BTS multi-view attention heads (flax.linen).

Behavioral parity targets:
- `scenedino/models/prediction_heads/multi_view_head.py` (MultiViewHead:50,
  SimpleMultiViewHead:180, MultiViewHead2:259, MultiViewHead3:405,
  make_attn_layers:32)
- `scenedino/models/prediction_heads/independent_tokens.py` (Fixed/Data/
  NeuRay view-independent tokens, make_independent_token:8)
- `scenedino/models/prediction_heads/mlp.py:302-616` (custom IBR-style
  transformer encoder: ScaledDotProductAttention:302,
  PositionwiseFeedForward:341, MultiHeadAttention:452, EncoderLayer:555,
  TrEnLayer:587, make_embedding_encoder:419)
- `scenedino/models/backbones/ibrnet.py:243-403` (IBRNetWithNeuRay)

These are the pre-SceneDINO multi-view density machinery: per-point
features from V source views are aggregated by attention (instead of the
shipped config's `combine_interleaved` average) before density
prediction. No shipped SceneDINO config selects them, but `make_head`
exposes them, so they are implemented for inventory completeness.

Protocol (bts.py:502-521): heads receive `mlp_input (..., V, C)` plus
`invalid_features (..., V)` (bool) and return (..., d_out) with the view
axis reduced internally.

Reference quirks reproduced faithfully (and flagged):
- `MultiViewHead` passes a FLOAT 0/1 key-padding mask into
  `torch.nn.TransformerEncoder` (multi_view_head.py:139-151). On torch's
  slow path (training mode / grads enabled — how the reference TRAINS
  these heads) float masks are ADDITIVE logit biases, so "masked" views
  only get +1.0 on their attention logits — not -inf masking; torch's
  eval+no_grad fastpath silently switches to -inf semantics (verified
  torch 2.13). `mask_mode="additive"` replicates the training-time
  behavior; `"fill"` gives true -1e9 masking.
- The view-dropout transform `1 - dropout(1 - invalid)` produces
  NEGATIVE "invalid" values for kept views in training mode (torch
  Dropout's 1/(1-p) rescale, multi_view_head.py:101-111); combined with
  the additive mask these act as small attention biases.

TPU notes: V is tiny (2-8) — attention over the view axis is a batched
(V+1)x(V+1) matmul per point, which XLA fuses into a few MXU calls over
the point batch; everything is static-shaped.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn


# ---------------------------------------------------------------------------
# attention primitives
# ---------------------------------------------------------------------------


class TorchEncoderLayer(nn.Module):
    """`torch.nn.TransformerEncoderLayer` (batch_first, post-norm, relu).

    x: (..., S, C); key_padding_mask: float (..., S) added to attention
    logits of those KEYS (torch float-mask semantics) or None. Dropout is
    inference-mode (off), matching the reference's eval-time behavior.
    """

    d_model: int
    n_heads: int
    dim_feedforward: int
    layer_norm_eps: float = 1e-5

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        C, H = self.d_model, self.n_heads
        assert C % H == 0
        dh = C // H
        qkv = nn.Dense(3 * C, name="in_proj")(x)  # packed like torch in_proj
        q, k, v = jnp.split(qkv, 3, axis=-1)

        def heads(t):  # (..., S, C) -> (..., H, S, dh)
            return jnp.moveaxis(t.reshape(*t.shape[:-1], H, dh), -2, -3)

        q, k, v = heads(q), heads(k), heads(v)
        logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) / jnp.sqrt(dh).astype(x.dtype)
        if key_padding_mask is not None:
            logits = logits + key_padding_mask[..., None, None, :].astype(logits.dtype)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = jnp.moveaxis(out, -3, -2).reshape(x.shape)
        out = nn.Dense(C, name="out_proj")(out)

        x = nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm1")(x + out)
        ff = nn.Dense(C, name="linear2")(nn.relu(nn.Dense(self.dim_feedforward, name="linear1")(x)))
        return nn.LayerNorm(epsilon=self.layer_norm_eps, name="norm2")(x + ff)


class IBREncoderLayer(nn.Module):
    """Custom IBR-style encoder layer (mlp.py EncoderLayer:555, post-LN).

    Bias-free q/k/v/out projections, symmetric -1e9 mask (a point's
    invalid VIEW is removed both as query and key,
    mlp.py ScaledDotProductAttention:310-335), residual + LayerNorm
    (eps 1e-6) after attention and after the FFN.
    """

    d_model: int
    n_heads: int
    d_k: int
    d_v: int
    d_inner: int

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        H, dk, dv = self.n_heads, self.d_k, self.d_v
        q = nn.Dense(H * dk, use_bias=False, name="w_qs")(x)
        k = nn.Dense(H * dk, use_bias=False, name="w_ks")(x)
        v = nn.Dense(H * dv, use_bias=False, name="w_vs")(x)

        def heads(t, d):
            return jnp.moveaxis(t.reshape(*t.shape[:-1], H, d), -2, -3)

        q, k, v = heads(q, dk), heads(k, dk), heads(v, dv)
        logits = jnp.einsum("...hqd,...hkd->...hqk", q, k) / jnp.sqrt(dk).astype(x.dtype)
        if key_padding_mask is not None:
            m = key_padding_mask.astype(logits.dtype)
            # symmetric invalidity: masked if query OR key view is invalid
            m_sym = 1.0 - (1.0 - m[..., :, None]) * (1.0 - m[..., None, :])
            logits = jnp.where(m_sym[..., None, :, :] == 1.0, -1e9, logits)
        attn = jax.nn.softmax(logits, axis=-1)
        out = jnp.einsum("...hqk,...hkd->...hqd", attn, v)
        out = jnp.moveaxis(out, -3, -2).reshape(*x.shape[:-1], H * dv)
        out = nn.Dense(self.d_model, use_bias=False, name="fc")(out)
        x = nn.LayerNorm(epsilon=1e-6, name="attn_norm")(x + out)

        ff = nn.Dense(self.d_model, name="w_2")(nn.relu(nn.Dense(self.d_inner, name="w_1")(x)))
        return nn.LayerNorm(epsilon=1e-6, name="ffn_norm")(x + ff)


class AttnStack(nn.Module):
    """Stack of encoder layers = torch `TransformerEncoder` / `TrEnLayer`.

    kind: "torch" (built-in path, additive float mask) or "ibr"
    (IBRAttn=True path, symmetric fill mask). make_attn_layers parity
    (multi_view_head.py:32-47).
    """

    d_model: int
    n_layers: int = 3
    n_heads: int = 4
    kind: str = "torch"

    @nn.compact
    def __call__(self, x, key_padding_mask=None):
        for i in range(self.n_layers):
            if self.kind == "torch":
                x = TorchEncoderLayer(
                    self.d_model, self.n_heads, self.d_model, name=f"layer_{i}"
                )(x, key_padding_mask)
            elif self.kind == "ibr":
                x = IBREncoderLayer(
                    self.d_model, self.n_heads, self.d_model, self.d_model,
                    self.d_model, name=f"layer_{i}",
                )(x, key_padding_mask)
            else:
                raise ValueError(self.kind)
        return x


# ---------------------------------------------------------------------------
# embedding encoders (mlp.py make_embedding_encoder:419-451)
# ---------------------------------------------------------------------------


class PoswiseFFEmb(nn.Module):
    """`PoswiseFF_emb4enc` (mlp.py:361-396): pre-LN two-layer ELU FFN with
    a learned linear residual match."""

    d_hid: int
    d_out: int

    @nn.compact
    def __call__(self, x):
        res = nn.Dense(self.d_out, name="w_match")(x)
        x = nn.LayerNorm(epsilon=1e-6, name="pre_layer_norm")(x)
        x = nn.Dense(self.d_out, name="w_2")(nn.elu(nn.Dense(self.d_hid, name="w_1")(x)))
        return x + res


class EmbeddingEncoder(nn.Module):
    """Per-view feature compressor in front of the attention stack."""

    kind: str  # pwf | ff | ffh | hpwf
    d_out: int

    @nn.compact
    def __call__(self, x):
        if self.kind == "pwf":
            return PoswiseFFEmb(2 * self.d_out, self.d_out, name="pwf")(x)
        if self.kind == "ff":
            return nn.Dense(self.d_out, name="fc2")(
                nn.elu(nn.Dense(2 * self.d_out, name="fc1")(x))
            )
        if self.kind == "ffh":
            return nn.Dense(self.d_out, name="fc1")(x)
        if self.kind == "hpwf":
            h = nn.elu(nn.Dense(2 * self.d_out, name="fc1")(x))
            h = nn.LayerNorm(epsilon=1e-6, name="ln")(h)
            return nn.Dense(self.d_out, name="fc2")(h)
        raise ValueError(f"unknown embedding encoder: {self.kind}")


# ---------------------------------------------------------------------------
# view-independent tokens (independent_tokens.py)
# ---------------------------------------------------------------------------


def masked_mean_variance(x, weight):
    """`fused_mean_variance` (independent_tokens.py:50-54): weighted mean
    and variance over the view axis (-2), weights broadcast on channels."""
    mean = jnp.sum(x * weight, axis=-2, keepdims=True)
    var = jnp.sum(weight * (x - mean) ** 2, axis=-2, keepdims=True)
    return mean, var


class FixedViewIndependentToken(nn.Module):
    """Learned readout token (independent_tokens.py:32-40)."""

    d_model: int

    @nn.compact
    def __call__(self, view_tokens, **kwargs):
        tok = self.param(
            "readout_token",
            lambda k, s: jax.random.uniform(k, s),  # torch.rand init
            (1, self.d_model),
        )
        return jnp.broadcast_to(tok, (*view_tokens.shape[:-2], 1, self.d_model))


class DataViewIndependentToken(nn.Module):
    """Masked mean/var summary token (independent_tokens.py:57-74)."""

    d_model: int

    @nn.compact
    def __call__(self, view_tokens, invalid_features=None, **kwargs):
        mask = 1.0 - invalid_features.astype(view_tokens.dtype)  # (..., V)
        w = mask / (jnp.sum(mask, axis=-1, keepdims=True) + 1e-8)
        mean, var = masked_mean_variance(view_tokens, w[..., None])
        return nn.elu(nn.Dense(self.d_model, name="layer")(jnp.concatenate([mean, var], -1)))


class _NeuRayCore(nn.Module):
    """Shared IBRNet-with-NeuRay aggregation core.

    The per-(ray, sample) view aggregation used both by
    `NeuRayIndependentToken` (independent_tokens.py:77-240) and the
    `IBRNetWithNeuRay` backbone (ibrnet.py:243-403): direction features,
    NeuRay visibility weighting, two rounds of weighted mean/variance
    pooling, and the geometry FFN producing one token per sample. All
    activations are ELU; weights use kaiming-normal init like
    `weights_init` (independent_tokens.py:43-47).
    """

    in_feat_ch: int = 32
    att_feat: int = 16
    neuray_in_dim: Optional[int] = None  # d of the per-view tokens fed to neuray_fc

    @nn.compact
    def __call__(self, feat, neuray_tok, ray_diff, mask):
        """feat: (..., V, C_in) image/bottleneck features (already reduced
        to in_feat_ch by the caller); neuray_tok: (..., V, C_n) visibility
        tokens; ray_diff: (..., V, 4); mask: (..., V, 1) float validity.
        Returns (..., att_feat)."""
        kaiming = nn.initializers.kaiming_normal()

        def mlp(x, dims, name, final_act=None):
            for i, d in enumerate(dims):
                x = nn.Dense(d, kernel_init=kaiming, name=f"{name}_{i}")(x)
                if i < len(dims) - 1:
                    x = nn.elu(x)
            return final_act(x) if final_act is not None else x

        direction_feat = nn.elu(mlp(ray_diff, (16, self.in_feat_ch), "ray_dir_fc"))
        feat = feat + direction_feat

        weight = mask / (jnp.sum(mask, axis=-2, keepdims=True) + 1e-8)
        weight0 = jax.nn.sigmoid(mlp(neuray_tok, (8, 1), "neuray_fc")) * weight
        mean0, var0 = masked_mean_variance(feat, weight0)
        mean1, var1 = masked_mean_variance(feat, weight)
        globalfeat = jnp.concatenate([mean0, var0, mean1, var1], axis=-1)

        V = feat.shape[-2]
        x = jnp.concatenate(
            [jnp.broadcast_to(globalfeat, (*feat.shape[:-1], globalfeat.shape[-1])), feat, neuray_tok],
            axis=-1,
        )
        x = nn.elu(mlp(x, (64, 32), "base_fc"))

        x_vis = nn.elu(mlp(x * weight, (32, 33), "vis_fc"))
        x_res, vis = x_vis[..., :-1], x_vis[..., -1:]
        vis = jax.nn.sigmoid(vis) * mask
        x = x + x_res
        vis = mlp(x * vis, (32, 1), "vis_fc2", final_act=jax.nn.sigmoid) * mask
        weight = vis / (jnp.sum(vis, axis=-2, keepdims=True) + 1e-8)

        mean, var = masked_mean_variance(x, weight)
        globalfeat = jnp.concatenate(
            [mean[..., 0, :], var[..., 0, :], jnp.mean(weight, axis=-2)], axis=-1
        )  # (..., 32*2+1)
        return nn.elu(mlp(globalfeat, (2 * self.att_feat, self.att_feat), "geometry_fc"))


class NeuRayIndependentToken(nn.Module):
    """NeuRay/IBRNet-style aggregation token (independent_tokens.py:77-240).

    Requires bottleneck features + ray-direction differences in addition
    to the per-view tokens (`require_bottleneck_feats`; the reference's
    BTSNet never supplies them — the wiring is commented out at
    bts.py:47-55 — so this token only runs under an external driver).
    """

    n_points_per_ray: int
    d_model: int  # attention width = att_feat of the reference
    in_feat_ch: int = 32
    rbs: int = 2048

    require_bottleneck_feats: bool = True

    @nn.compact
    def __call__(self, view_tokens, bottleneck_feats=None, ray_diff=None,
                 invalid_features=None, **kwargs):
        assert bottleneck_feats is not None and ray_diff is not None
        K = self.n_points_per_ray

        def per_ray(t):  # (N, V, C) -> (N/K, K, V, C)
            return t.reshape((-1, K) + t.shape[-2:])

        vt = per_ray(view_tokens)
        bf = per_ray(bottleneck_feats)
        rd = per_ray(ray_diff)
        mask = (~invalid_features.reshape((-1, K) + invalid_features.shape[-1:]))[
            ..., None
        ].astype(vt.dtype)

        kaiming = nn.initializers.kaiming_normal()
        bf = nn.Dense(self.in_feat_ch, kernel_init=kaiming, name="img_feat2low_1")(
            nn.elu(nn.Dense(self.rbs // 4, kernel_init=kaiming, name="img_feat2low_0")(bf))
        )
        tok = _NeuRayCore(
            in_feat_ch=self.in_feat_ch, att_feat=self.d_model, name="core"
        )(bf, vt, rd, mask)  # (N/K, K, att_feat)
        return tok.reshape(-1, 1, self.d_model)  # (N, 1, C)


class IBRNetWithNeuRay(nn.Module):
    """Legacy IBRNet+NeuRay aggregation backbone (ibrnet.py:243-403).

    forward(rgb_feat (R, S, V, C), neuray_feat (R, S, V, Cn),
    ray_diff (R, S, V, 4), mask (R, S, V, 1)) -> (R, S, att_feat):
    per-sample aggregated geometry features. Selectable via
    `make_backbone({"type": "ibrnet"})` (backbone_util.py:7-19).
    """

    neuray_in_dim: int = 32
    in_feat_ch: int = 32
    att_feat: int = 16
    rbs: int = 2048

    @nn.compact
    def __call__(self, rgb_feat, neuray_feat, ray_diff, mask):
        kaiming = nn.initializers.kaiming_normal()
        rf = nn.Dense(self.in_feat_ch, kernel_init=kaiming, name="img_feat2low_1")(
            nn.elu(nn.Dense(self.rbs // 4, kernel_init=kaiming, name="img_feat2low_0")(rgb_feat))
        )
        return _NeuRayCore(
            in_feat_ch=self.in_feat_ch, att_feat=self.att_feat, name="core"
        )(rf, neuray_feat, ray_diff, mask.astype(rgb_feat.dtype))


def make_independent_token(conf: Dict[str, Any], d_model: int, name=None) -> nn.Module:
    """independent_tokens.py:8-17."""
    kind = conf.get("type", "FixedViewIndependentToken")
    if kind == "FixedViewIndependentToken":
        return FixedViewIndependentToken(d_model, name=name)
    if kind == "DataViewIndependentToken":
        return DataViewIndependentToken(d_model, name=name)
    if kind == "NeuRayIndependentToken":
        args = dict(conf.get("args", {}))
        return NeuRayIndependentToken(
            n_points_per_ray=args["n_points_per_ray"],
            d_model=d_model,
            in_feat_ch=args.get("in_feat_ch", 32),
            rbs=args.get("rbs", 2048),
            name=name,
        )
    raise NotImplementedError(f"unsupported token type: {kind}")


# ---------------------------------------------------------------------------
# view dropout (multi_view_head.py:98-117)
# ---------------------------------------------------------------------------


def _dropout_views(invalid, rate, do_mvh, deterministic, rng):
    """The reference's `1 - Dropout(1 - invalid)` view-dropout transform,
    including torch's 1/(1-p) training rescale (kept views map to
    1 - 1/(1-p) < 0). Identity in deterministic (eval) mode. do_mvh keeps
    view 0 always on (pgt-loss view)."""
    inv = invalid.astype(jnp.float32)
    if rate == 0.0 or deterministic:
        return inv
    valid = 1.0 - inv
    keep = jax.random.bernoulli(rng, 1.0 - rate, valid.shape).astype(jnp.float32)
    dropped = 1.0 - valid * keep / (1.0 - rate)
    if do_mvh:
        return jnp.concatenate([inv[..., :1], dropped[..., 1:]], axis=-1)
    return dropped


# ---------------------------------------------------------------------------
# the heads
# ---------------------------------------------------------------------------


class MultiViewHead(nn.Module):
    """Attention aggregation head (multi_view_head.py:50-177).

    Per 3D point: embed per-view features, prepend a view-independent
    readout token, run the attention stack with the (float) invalidity
    mask, read out token 0, and predict density with a 2-layer ELU FFN.
    """

    d_in: int
    d_out: int
    d_enc: int
    emb_encoder: Optional[str] = "ff"  # none | pwf | ff | ffh | hpwf
    attn_kind: str = "torch"
    n_attn_layers: int = 3
    n_heads: int = 4
    token_conf: Tuple[Tuple[str, Any], ...] = (("type", "FixedViewIndependentToken"),)
    dropout_views_rate: float = 0.0
    do_mvh: bool = False
    mask_mode: str = "additive"  # reference float-mask semantics; "fill" = -1e9

    @nn.compact
    def __call__(self, sampled_features, invalid_features=None, deterministic=True, **kwargs):
        assert invalid_features is not None
        inv = _dropout_views(
            invalid_features, self.dropout_views_rate, self.do_mvh, deterministic,
            self.make_rng("dropout") if (self.dropout_views_rate and not deterministic) else None,
        )

        x = sampled_features
        if self.emb_encoder not in (None, "none"):
            x = EmbeddingEncoder(self.emb_encoder, self.d_enc, name="emb_encoder")(x)

        token = make_independent_token(
            dict(self.token_conf), self.d_enc, name="independent_token"
        )
        tok = token(x, invalid_features=invalid_features, **kwargs)
        padded = jnp.concatenate([tok, x], axis=-2)  # (..., V+1, C)
        pad_inv = jnp.concatenate([jnp.zeros_like(inv[..., :1]), inv], axis=-1)
        if self.mask_mode == "fill":
            pad_inv = jnp.where(pad_inv > 0, -1e9, 0.0)
        out = AttnStack(
            self.d_enc, self.n_attn_layers, self.n_heads, self.attn_kind, name="attn"
        )(padded, pad_inv)[..., 0, :]

        h = nn.elu(nn.Dense(self.d_enc // 2, name="density_0")(out))
        return nn.Dense(self.d_out, name="density_1")(h)[..., None, :]


class SimpleMultiViewHead(nn.Module):
    """Softmax-weighted multi-view blend (multi_view_head.py:180-256):
    an inner ResnetFC predicts (weight-logit, d_out) per view; invalid
    views are masked to -1e9 before the view softmax."""

    d_in: int
    d_out: int
    mlp_args: Tuple[Tuple[str, Any], ...] = ()
    dropout_views_rate: float = 0.0
    do_mvh: bool = True

    @nn.compact
    def __call__(self, sampled_features, invalid_features=None, deterministic=True, **kwargs):
        from scenedino_tpu.models.heads import ResnetFC

        assert invalid_features is not None
        inv = _dropout_views(
            invalid_features, self.dropout_views_rate, self.do_mvh, deterministic,
            self.make_rng("dropout") if (self.dropout_views_rate and not deterministic) else None,
        )
        args = dict(self.mlp_args)
        out = ResnetFC(
            d_out=self.d_out + 1,
            n_blocks=args.get("n_blocks", 5),
            d_hidden=args.get("d_hidden", 128),
            beta=args.get("beta", 0.0),
            name="mlp",
        )(sampled_features)
        w = jax.nn.softmax(jnp.where(inv == 1.0, -1e9, out[..., 0]), axis=-1)
        return jnp.sum(out[..., 1:] * w[..., None], axis=-2)[..., None, :]


class MultiViewHead2(nn.Module):
    """Composable variant (multi_view_head.py:259-402): inner ResnetFC,
    then optionally an independent token + attention stack (readout
    path), or a softmax view blend; optional second ResnetFC."""

    d_in: int
    d_out: int
    mlp_args: Tuple[Tuple[str, Any], ...] = ()
    mlp2_args: Optional[Tuple[Tuple[str, Any], ...]] = None
    mlp2_d_in: Optional[int] = None
    attn_conf: Optional[Tuple[Tuple[str, Any], ...]] = None
    token_conf: Optional[Tuple[Tuple[str, Any], ...]] = None
    dropout_views_rate: float = 0.0
    do_mvh: bool = True
    mask_mode: str = "additive"

    @nn.compact
    def __call__(self, sampled_features, invalid_features=None, deterministic=True, **kwargs):
        from scenedino_tpu.models.heads import ResnetFC

        assert invalid_features is not None
        inv = _dropout_views(
            invalid_features, self.dropout_views_rate, self.do_mvh, deterministic,
            self.make_rng("dropout") if (self.dropout_views_rate and not deterministic) else None,
        )
        d_mid = self.mlp2_d_in if self.mlp2_args is not None else self.d_out + 1
        args = dict(self.mlp_args)
        x = ResnetFC(
            d_out=d_mid,
            n_blocks=args.get("n_blocks", 5),
            d_hidden=args.get("d_hidden", 128),
            name="mlp",
        )(sampled_features)

        has_token = self.token_conf is not None
        if has_token:
            token = make_independent_token(
                dict(self.token_conf), d_mid, name="independent_token"
            )
            tok = token(x, invalid_features=invalid_features, **kwargs)
            x = jnp.concatenate([tok, x], axis=-2)
            inv = jnp.concatenate([jnp.zeros_like(inv[..., :1]), inv], axis=-1)

        if self.attn_conf is not None:
            ac = dict(self.attn_conf)
            mask = jnp.where(inv > 0, -1e9, 0.0) if self.mask_mode == "fill" else inv
            x = AttnStack(
                d_mid, ac.get("n_layers", 3), ac.get("n_heads", 4),
                "ibr" if ac.get("IBRAttn", False) else "torch", name="attn",
            )(x, mask)

        if has_token:
            readout = x[..., 0, :]
            if self.mlp2_args is not None:
                args2 = dict(self.mlp2_args)
                return ResnetFC(
                    d_out=self.d_out, n_blocks=args2.get("n_blocks", 5),
                    d_hidden=args2.get("d_hidden", 128), name="mlp2",
                )(readout)[..., None, :]
            return readout[..., None, 1:]
        if self.mlp2_args is not None:
            args2 = dict(self.mlp2_args)
            x = ResnetFC(
                d_out=self.d_out + 1, n_blocks=args2.get("n_blocks", 5),
                d_hidden=args2.get("d_hidden", 128), name="mlp2",
            )(x)
        w = jax.nn.softmax(jnp.where(inv == 1.0, -1e9, x[..., 0]), axis=-1)
        return jnp.sum(x[..., 1:] * w[..., None], axis=-2)[..., None, :]


class MultiViewHead3(nn.Module):
    """Blend-then-refine variant (multi_view_head.py:405-490): softmax
    view blend of an inner ResnetFC's features, then a second ResnetFC
    maps the blended feature to d_out."""

    d_in: int
    d_out: int
    mlp_args: Tuple[Tuple[str, Any], ...] = ()
    mlp2_args: Tuple[Tuple[str, Any], ...] = ()
    mlp2_d_in: int = 64
    dropout_views_rate: float = 0.0
    do_mvh: bool = True

    @nn.compact
    def __call__(self, sampled_features, invalid_features=None, deterministic=True, **kwargs):
        from scenedino_tpu.models.heads import ResnetFC

        assert invalid_features is not None
        inv = _dropout_views(
            invalid_features, self.dropout_views_rate, self.do_mvh, deterministic,
            self.make_rng("dropout") if (self.dropout_views_rate and not deterministic) else None,
        )
        args = dict(self.mlp_args)
        x = ResnetFC(
            d_out=self.mlp2_d_in + 1, n_blocks=args.get("n_blocks", 5),
            d_hidden=args.get("d_hidden", 128), name="mlp",
        )(sampled_features)
        w = jax.nn.softmax(jnp.where(inv == 1.0, -1e9, x[..., 0]), axis=-1)
        blended = jnp.sum(x[..., 1:] * w[..., None], axis=-2)
        args2 = dict(self.mlp2_args)
        return ResnetFC(
            d_out=self.d_out, n_blocks=args2.get("n_blocks", 5),
            d_hidden=args2.get("d_hidden", 128), name="mlp2",
        )(blended)[..., None, :]


def _freeze(items):
    """dict config -> hashable tuple for flax dataclass fields."""
    if items is None:
        return None
    return tuple(sorted(items.items()))


def make_multi_view_head(kind: str, conf: Dict[str, Any], d_in: int, d_out: int) -> nn.Module:
    """Factory branch for `make_head` (prediction_heads/__init__.py:22-28)."""
    if kind == "MultiViewHead":
        emb = conf.get("embedding_encoder", {}) or {}
        attn = conf.get("attn_layers", {}) or {}
        return MultiViewHead(
            d_in=d_in,
            d_out=d_out,
            d_enc=emb.get("d_out", d_in),
            emb_encoder=emb.get("type", "none"),
            attn_kind="ibr" if attn.get("IBRAttn", False) else "torch",
            n_attn_layers=attn.get("n_layers", 3),
            n_heads=attn.get("n_heads", 4),
            token_conf=_freeze(conf.get("independent_token", {"type": "FixedViewIndependentToken"})),
            dropout_views_rate=conf.get("dropout_views_rate", 0.0),
            do_mvh=conf.get("dropout_multiviewhead", False),
        )
    if kind == "SimpleMultiViewHead":
        return SimpleMultiViewHead(
            d_in=d_in,
            d_out=d_out,
            mlp_args=_freeze(dict(conf.get("mlp", {}).get("args", {}) or {})),
            dropout_views_rate=conf.get("dropout_views_rate", 0.0),
            do_mvh=conf.get("dropout_multiviewhead", False),
        )
    if kind == "MultiViewHead2":
        mlp2 = conf.get("mlp2")
        return MultiViewHead2(
            d_in=d_in,
            d_out=d_out,
            mlp_args=_freeze(dict(conf.get("mlp", {}).get("args", {}) or {})),
            mlp2_args=_freeze(dict(mlp2.get("args", {}) or {})) if mlp2 else None,
            mlp2_d_in=mlp2.get("d_in") if mlp2 else None,
            attn_conf=_freeze(conf.get("attn_layers")) if conf.get("attn_layers") else None,
            token_conf=_freeze(conf.get("independent_token")) if conf.get("independent_token") else None,
            dropout_views_rate=conf.get("dropout_views_rate", 0.0),
            do_mvh=conf.get("dropout_multiviewhead", False),
        )
    if kind == "MultiViewHead3":
        mlp2 = conf.get("mlp2", {})
        return MultiViewHead3(
            d_in=d_in,
            d_out=d_out,
            mlp_args=_freeze(dict(conf.get("mlp", {}).get("args", {}) or {})),
            mlp2_args=_freeze(dict(mlp2.get("args", {}) or {})),
            mlp2_d_in=mlp2.get("d_in", 64),
            dropout_views_rate=conf.get("dropout_views_rate", 0.0),
            do_mvh=conf.get("dropout_multiviewhead", False),
        )
    raise ValueError(kind)
