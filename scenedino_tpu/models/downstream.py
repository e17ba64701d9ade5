"""Unsupervised-semantics downstream head (flax.linen).

Behavioral parity target: `scenedino/downstream_head/semantic_head.py`
(SemanticHead:41, StegoClusterHead:285, KMeansParamHead:308,
LinearHead:460, MLPHead:480) — STEGO projection head, cosine-k-means
cluster heads on raw-DINO and STEGO space, linear/MLP probes with
ignore_index -1, five-crop 2D sampling, kNN/random ring buffers, and the
pseudo-label -> GT assignment written back from validation.

TPU redesign:
  * The ring buffers and the pseudo assignment are explicit state arrays
    threaded through the (pure) train step, not module-mutable buffers.
  * k-means++ init is an explicit keyed call (`init_cluster_centers`);
    the reference does it lazily on the first training batch.
  * CRF post-processing is a jittable truncated-window mean-field pass
    (scenedino_tpu/eval/crf.py; the reference wraps pydensecrf, a
    CPU-only compiled lib) applied by the 2D evaluator when
    apply_crf=True (off in shipped configs).
"""
from __future__ import annotations

import dataclasses
from typing import Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from scenedino_tpu.ops.kmeans import kmeans_cosine_assign


def _norm(x, eps=1e-10):
    # NaN-safe at x=0 (zero ring-buffer rows feed the stego head early in
    # training; see core.safe_normalize)
    from scenedino_tpu.core import safe_normalize

    return safe_normalize(x, eps=eps)


def five_crop(features, sample_factor=1):
    """Five overlapping crops (semantic_head.py:15-34).

    features: (n, v, h, w, 1, c) -> (5n, v, L, L, 1, c) with
    L = 2 * (min(h, w) // 4) / sample_factor.
    """
    n, v, h, w, one, c = features.shape
    cs = sample_factor // 2
    L = min(h, w) // 4
    centers = [
        (h // 2, w // 2),
        (3 * h // 4, w // 4),
        (3 * h // 4, 3 * w // 4),
        (h // 4, w // 4),
        (h // 4, 3 * w // 4),
    ]
    crops = [
        features[:, :, cy - L + cs : cy + L + cs : sample_factor,
                 cx - L + cs : cx + L + cs : sample_factor]
        for cy, cx in centers
    ]
    return jnp.concatenate(crops, axis=0)


class StegoClusterHead(nn.Module):
    """linear 1x1 + nonlinear 1x1 paths, L2-norm out (semantic_head.py:285-305)."""

    code_dim: int = 64
    mid_channels: Optional[int] = None
    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, deterministic: bool = True):
        mid = self.mid_channels or x.shape[-1]
        lin = nn.Dense(self.code_dim, name="linear")(x)
        h = nn.relu(nn.Dense(mid, name="nonlinear_1")(x))
        nl = nn.Dense(self.code_dim, name="nonlinear_2")(h)
        out = lin + nl
        # Dropout2d drops whole channels; broadcast over all but the channel axis
        out = nn.Dropout(
            self.dropout_rate,
            broadcast_dims=tuple(range(out.ndim - 1)),
            deterministic=deterministic,
        )(out)
        return _norm(out)


class KMeansParamHead(nn.Module):
    """Learnable cosine-k-means centroids (semantic_head.py:308-375).

    `pseudo_assignment` maps cluster id -> GT class id; it is updated from
    validation metrics (update_model_eval) and therefore lives in a
    mutable "state" collection.
    """

    n_classes: int = 19
    gt_classes: int = 19

    @nn.compact
    def __call__(self, features, weight=None) -> Dict[str, jnp.ndarray]:
        D = features.shape[-1]
        centers = self.param("cluster_centers", nn.initializers.normal(1.0), (self.n_classes, D))
        assignment = self.variable(
            "state", "pseudo_assignment",
            lambda: jnp.arange(self.n_classes, dtype=jnp.int32) % self.gt_classes,
        )
        flat = features.reshape(-1, D)
        labels, loss, _ = kmeans_cosine_assign(flat, centers)
        if weight is None:
            w = jnp.ones_like(loss)
        else:
            w = weight.reshape(-1).astype(loss.dtype)
        pseudo = labels.reshape(features.shape[:-1])
        return {
            "pseudo_segs_pred": pseudo,
            "segs_pred": assignment.value[pseudo],
            "loss": jnp.mean(loss * w),
        }


class LinearHead(nn.Module):
    """Linear probe + CE(ignore -1) (semantic_head.py:460-477)."""

    gt_classes: int = 19

    @nn.compact
    def __call__(self, features, target=None) -> Dict[str, jnp.ndarray]:
        logit = nn.Dense(self.gt_classes, name="linear")(features).astype(jnp.float32)
        out = {"segs_pred": jnp.argmax(logit, -1), "logits": logit}
        if target is not None:
            out["loss"] = cross_entropy_ignore(logit, target)
        return out


class MLPHead(nn.Module):
    """2-layer probe (semantic_head.py:480-501)."""

    gt_classes: int = 19

    @nn.compact
    def __call__(self, features, target=None) -> Dict[str, jnp.ndarray]:
        h = nn.relu(nn.Dense(2 * features.shape[-1], name="linear1")(features))
        logit = nn.Dense(self.gt_classes, name="linear2")(h).astype(jnp.float32)
        out = {"segs_pred": jnp.argmax(logit, -1), "logits": logit}
        if target is not None:
            out["loss"] = cross_entropy_ignore(logit, target)
        return out


def cross_entropy_ignore(logits, target, ignore_index=-1):
    """Mean CE over non-ignored targets (torch F.cross_entropy parity).

    The reference trains probes on view 0 only and squeezes the trailing
    singleton (`logit[:, 0].movedim(-1, 1).squeeze(-1)`,
    semantic_head.py:470-476): when logits carry extra (view / singleton)
    dims relative to the target we do the same.
    """
    # reduce logits (n, v, h, w, 1, C) -> (n, h, w, C) when target is (n, h, w)
    while logits.ndim - 1 > target.ndim:
        if logits.ndim >= 3 and logits.shape[-2] == 1:
            logits = logits[..., 0, :]
        else:
            logits = logits[:, 0]
    valid = target != ignore_index
    tgt = jnp.where(valid, target, 0)
    logp = jax.nn.log_softmax(logits, axis=-1)
    nll = -jnp.take_along_axis(logp, tgt[..., None], axis=-1)[..., 0]
    denom = jnp.maximum(jnp.sum(valid), 1)
    return jnp.sum(jnp.where(valid, nll, 0.0)) / denom


class RingBufferState(NamedTuple):
    """kNN/random sampling buffers (semantic_head.py:70-71, 156-179, 437-449).

    patch_buffer: (S, P, C) per-crop patch features;
    gap_buffer: (S, C) per-crop GAP features; idx/filled: write cursor."""

    patch_buffer: jnp.ndarray
    gap_buffer: jnp.ndarray
    idx: jnp.ndarray  # int32 scalar
    filled: jnp.ndarray  # int32 scalar

    @staticmethod
    def create(buffer_size, patch_sample_size, input_dim, dtype=jnp.float32):
        return RingBufferState(
            jnp.zeros((buffer_size, patch_sample_size, input_dim), dtype),
            jnp.zeros((buffer_size, input_dim), dtype),
            jnp.zeros((), jnp.int32),
            jnp.ones((), jnp.int32),
        )


def update_ring_buffer(state: RingBufferState, patches, gaps, valid=None) -> RingBufferState:
    """Functional ring-buffer write (semantic_head.py:437-449).

    valid: optional (n,) bool — rows flagged False are NOT written (the
    reference drops invalid surface crops before they reach the buffer,
    trainer_downstream.py:281-287). Static-shape design: stable-sort the
    valid rows first, write the leading `count` rows at ring positions,
    and scatter the rest to an out-of-bounds index with mode="drop"."""
    S = state.patch_buffer.shape[0]
    n = patches.shape[0]
    if valid is None:
        indices = (jnp.arange(n) + state.idx) % S
        pb = state.patch_buffer.at[indices].set(patches)
        gb = state.gap_buffer.at[indices].set(gaps)
        new_idx = (state.idx + n) % S
        wrapped = new_idx < state.idx
        filled = jnp.where(wrapped, S, jnp.maximum(jnp.maximum(new_idx, state.filled), 1))
        return RingBufferState(pb, gb, new_idx, filled)
    order = jnp.argsort(jnp.logical_not(valid), stable=True)  # valid rows first
    patches = patches[order]
    gaps = gaps[order]
    count = valid.sum()
    j = jnp.arange(n)
    indices = jnp.where(j < count, (state.idx + j) % S, S)  # S is OOB
    pb = state.patch_buffer.at[indices].set(patches, mode="drop")
    gb = state.gap_buffer.at[indices].set(gaps, mode="drop")
    new_idx = (state.idx + count) % S
    wrapped = (state.idx + count) >= S
    # same high-water semantics as the unmasked path (create() seeds
    # filled=1 so the pre-push randint upper bound stays positive)
    filled = jnp.where(wrapped, S, jnp.maximum(jnp.maximum(new_idx, state.filled), 1))
    return RingBufferState(pb, gb, new_idx, filled)


@dataclasses.dataclass(frozen=True)
class SemanticHeadConfig:
    """configs/downstream/*.yaml defaults."""

    n_classes: int = 19
    gt_classes: int = 19
    input_dim: int = 768
    code_dim: int = 64
    buffer_size: int = 256
    patch_sample_size: int = 576
    knn_neighbors: int = 4  # shipped value (configs/downstream/semantic.yaml)
    mode: str = "3d"  # "3d" surface crops | "2d" five-crop
    mlp_head: bool = False
    apply_crf: bool = False

    @classmethod
    def from_dict(cls, dconf: dict) -> "SemanticHeadConfig":
        """Build from a `downstream:` config block (make_downstream_head
        parity, downstream_head/__init__.py:4)."""
        known = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in dconf.items() if k in known})


class SemanticHead(nn.Module):
    """Umbrella downstream head (semantic_head.py:41-283)."""

    cfg: SemanticHeadConfig = SemanticHeadConfig()

    def setup(self):
        c = self.cfg
        self.stego_head = StegoClusterHead(code_dim=c.code_dim)
        self.direct_cluster_head = KMeansParamHead(c.n_classes, c.gt_classes)
        self.stego_cluster_head = KMeansParamHead(c.n_classes, c.gt_classes)
        probe = MLPHead if c.mlp_head else LinearHead
        self.direct_linear_head = probe(c.gt_classes)
        self.stego_linear_head = probe(c.gt_classes)

    def __call__(self, features, mode: str = "stego_kmeans"):
        """Inference: 768-d features -> GT-class prediction
        (semantic_head.py:107-120)."""
        features = _norm(features)
        if mode == "stego_kmeans":
            return self.stego_cluster_head(self.stego_head(features))["segs_pred"]
        if mode == "stego_linear":
            return self.stego_linear_head(self.stego_head(features))["segs_pred"]
        if mode == "direct_kmeans":
            return self.direct_cluster_head(features)["segs_pred"]
        if mode == "direct_linear":
            return self.direct_linear_head(features)["segs_pred"]
        raise NotImplementedError(mode)

    def encode_features(self, dino_features, deterministic: bool = True):
        """Normalized DINO features + their STEGO codes — the inputs the two
        cluster heads see during training. Used to k-means++-seed the cluster
        centers from the first batch (semantic_head.py:329-345)."""
        d = _norm(jax.lax.stop_gradient(dino_features))
        return d, self.stego_head(d, deterministic=deterministic)

    def forward_training(
        self,
        dino_features,  # (n, v, h, w, 1, c) rendered 768-d features (detached)
        buffers: RingBufferState,
        key: jax.Array,
        crop_features: Optional[jnp.ndarray] = None,  # (n_crops, P, c) 3D surface crops
        seg_target: Optional[jnp.ndarray] = None,
        deterministic: bool = False,
        crop_valid: Optional[jnp.ndarray] = None,  # (n_crops,) bool
    ):
        """Training forward (semantic_head.py:122-235).

        crop_valid is the static-shape stand-in for the reference's ragged
        crop filtering (trainer_downstream.py:281-287): invalid crops are
        kept in the arrays at fixed capacity but excluded from the ring
        buffer and masked out of the correlation loss (the mask rides in
        the returned stego_corr dict for losses/stego.py).

        Returns (outputs dict with stego correlations + head results,
        updated buffers)."""
        c = self.cfg
        k_drop, k_nn, k_rand = jax.random.split(key, 3)
        dino_features = _norm(jax.lax.stop_gradient(dino_features))

        n, v, h, w, _, C = dino_features.shape
        flat = dino_features.reshape(n * v, h, w, C)
        stego_features = self.stego_head(flat, deterministic=deterministic).reshape(
            n, v, h, w, 1, -1
        )

        if c.mode == "3d" and crop_features is not None:
            cropped = _norm(jax.lax.stop_gradient(crop_features))  # (Nc, P, C)
            stego_self = self.stego_head(cropped, deterministic=deterministic)
        else:
            crop_valid = None  # 2D five-crops are always valid
            sample_factor = 4
            cd = five_crop(dino_features[:, :1], sample_factor)
            cs = five_crop(stego_features[:, :1], sample_factor)
            cropped = cd.reshape(cd.shape[0], -1, C)
            stego_self = cs.reshape(cs.shape[0], -1, cs.shape[-1])

        gap = _norm(jnp.mean(cropped, axis=-2))  # (Nc, C)

        if not deterministic:
            buffers = update_ring_buffer(buffers, cropped, gap, valid=crop_valid)

        # kNN + random pairs from the buffer (semantic_head.py:168-179)
        sims = jnp.einsum("nf,mf->nm", gap, buffers.gap_buffer)
        # mask out unfilled slots
        slot_valid = jnp.arange(buffers.gap_buffer.shape[0]) < buffers.filled
        sims = jnp.where(slot_valid[None], sims, -jnp.inf)
        _, topk = jax.lax.top_k(sims, c.knn_neighbors + 1)
        topk = topk[:, 1:]
        Nc = cropped.shape[0]
        pick = jax.random.randint(k_nn, (Nc,), 0, c.knn_neighbors)
        nn_idx = topk[jnp.arange(Nc), pick]
        dino_nn = jax.lax.stop_gradient(buffers.patch_buffer[nn_idx])
        stego_nn = self.stego_head(dino_nn, deterministic=deterministic)

        rand_idx = jax.random.randint(k_rand, (Nc,), 0, jnp.maximum(buffers.filled, 1))
        dino_rand = jax.lax.stop_gradient(buffers.patch_buffer[rand_idx])
        stego_rand = self.stego_head(dino_rand, deterministic=deterministic)

        corr = lambda a, b: jnp.einsum("npf,nqf->npq", _norm(a), _norm(b))
        stego_corr = {
            "dino_self_corr": corr(cropped, cropped),
            "stego_self_corr": corr(stego_self, stego_self),
            "dino_nn_corr": corr(cropped, dino_nn),
            "stego_nn_corr": corr(stego_self, stego_nn),
            "dino_random_corr": corr(cropped, dino_rand),
            "stego_random_corr": corr(stego_self, stego_rand),
        }
        if crop_valid is not None:
            stego_corr["crop_valid"] = crop_valid

        # heads train on detached features (semantic_head.py:196-221)
        det_dino = jax.lax.stop_gradient(dino_features)
        det_stego = jax.lax.stop_gradient(stego_features)
        results = {
            "direct_cluster": self.direct_cluster_head(det_dino),
            "stego_cluster": self.stego_cluster_head(det_stego),
        }
        if seg_target is not None:
            results["direct_linear"] = self.direct_linear_head(det_dino, seg_target)
            results["stego_linear"] = self.stego_linear_head(det_stego, seg_target)

        return {"stego_corr": stego_corr, "results": results}, buffers
