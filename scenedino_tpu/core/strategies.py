"""Frame-selection strategies for encoding / loss / rendering.

Behavioral parity target: `scenedino/common/sampling_strategies.py` —
encoder samplers (default:14, kitti_360_full:21, kitti_360_stereo:40) and
loss/renderer samplers (single_view:73, single_view_renderer:90,
stereo_view:105, kitti_360:122-155, alternate:200).

TPU redesign: strategies return jnp index arrays from explicit PRNG keys
(one compiled train step handles every draw) instead of python lists from
global `random`.
"""
from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp


# --------------------------------------------------------- encoder samplers
def default_encoder_sampler():
    """Always encode frame 0 (sampling_strategies.py:14-18)."""

    def fn(key, num_frames: int):
        return jnp.zeros((1,), jnp.int32)

    return fn


def kitti_360_full_encoder_sampler(num_encoder_frames: int, always_use_base_frame: bool = True):
    """Random subset of frames, optionally pinning frame 0
    (sampling_strategies.py:21-37).

    Reference-exact quirk: with always_use_base_frame=False the draw is
    `randperm(num_frames - 1) + 1` — frame 0 is UNREACHABLE and asking for
    num_encoder_frames == num_frames yields one fewer frame, exactly as in
    the reference (only the default=True branch ships)."""

    def fn(key, num_frames: int):
        perm = jax.random.permutation(key, jnp.arange(1, num_frames))
        if always_use_base_frame:
            return jnp.concatenate([jnp.zeros((1,), jnp.int32), perm[: num_encoder_frames - 1].astype(jnp.int32)])
        return perm[:num_encoder_frames].astype(jnp.int32)

    return fn


def kitti_360_stereo_encoder_sampler(num_encoder_frames: int, num_stereo_frames: int, always_use_base_frame: bool = True):
    """Like full, restricted to the first `num_stereo_frames` frames
    (sampling_strategies.py:40-58)."""

    def fn(key, num_frames: int):
        n = min(num_frames, num_stereo_frames)
        perm = jax.random.permutation(key, jnp.arange(1, n))
        if always_use_base_frame:
            return jnp.concatenate([jnp.zeros((1,), jnp.int32), perm[: num_encoder_frames - 1].astype(jnp.int32)])
        return perm[:num_encoder_frames].astype(jnp.int32)

    return fn


def get_encoder_sampling(config: dict):
    """(sampling_strategies.py:61-70)."""
    name = (config or {}).get("name")
    args = (config or {}).get("args", {}) or {}
    if name == "kitti_360_full":
        return kitti_360_full_encoder_sampler(**args)
    if name == "kitti_360_stereo":
        return kitti_360_stereo_encoder_sampler(**args)
    return default_encoder_sampler()


# ----------------------------------------------------- loss/render samplers
def single_view_loss_sampler(shuffle_frames: bool = False, all_frames: bool = False):
    """Loss on frame 0, render the rest (sampling_strategies.py:73-102)."""

    def fn(key, num_frames: int):
        ids = jnp.arange(num_frames, dtype=jnp.int32)
        if shuffle_frames:
            ids = jax.random.permutation(key, ids).astype(jnp.int32)
        ids_loss = ids[:1]
        ids_render = ids if all_frames else ids[1:]
        return ids_loss, ids_render

    return fn


def stereo_view_loss_sampler(shuffle_frames: bool = False):
    """Loss on one frame of each stereo pair, render the other
    (sampling_strategies.py:105-119): coin per pair."""

    def fn(key, num_frames: int):
        n_pairs = num_frames // 2
        base = jnp.arange(n_pairs, dtype=jnp.int32) * 2
        coin = jax.random.bernoulli(key, 0.5, (n_pairs,)).astype(jnp.int32)
        return base + coin, base + (1 - coin)

    return fn


def kitti_360_loss_sampler():
    """Per stereo pair, p(base)=1/3 coin (sampling_strategies.py:139-155,
    `if random.randint(0, 2)` keeps base as loss with p=2/3... the truthy
    branch selects base: base is loss with p=2/3)."""

    def fn(key, num_frames: int):
        n_pairs = num_frames // 2
        base = jnp.arange(n_pairs, dtype=jnp.int32) * 2
        coin = (jax.random.randint(key, (n_pairs,), 0, 3) == 0).astype(jnp.int32)
        return base + coin, base + (1 - coin)

    return fn


def alternate_loss_sampler():
    """One coin for the whole sample: loss on the even frames and render
    the odd ones with p=2/3, else swapped (sampling_strategies.py:199-207,
    `if random.randint(0, 2)` — the truthy branch keeps evens as loss).
    The RE10K recipe's strategy (train_scenedino_re10k.yaml
    `loss_renderer_strategy: alternate`: RE10K samples are 4 consecutive
    mono frames, not stereo pairs)."""

    def fn(key, num_frames: int):
        evens = jnp.arange(num_frames // 2, dtype=jnp.int32) * 2
        coin = jax.random.randint(key, (), 0, 3) > 0
        ids_loss = jnp.where(coin, evens, evens + 1)
        ids_render = jnp.where(coin, evens + 1, evens)
        return ids_loss, ids_render

    return fn


def get_loss_renderer_sampling(config: dict):
    """(sampling_strategies.py:211+)."""
    name = (config or {}).get("name")
    args = (config or {}).get("args", {}) or {}
    if name == "kitti_360":
        return kitti_360_loss_sampler()
    if name == "stereo_view":
        return stereo_view_loss_sampler(**args)
    if name in ("single_renderer", "single_view"):
        return single_view_loss_sampler(**args)
    if name == "alternate":
        return alternate_loss_sampler()
    return kitti_360_loss_sampler()
