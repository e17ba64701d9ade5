"""Fast inference path for the shipped field head (exact, TPU-first).

The shipped SceneDINO head is lin_out(relu(lin_in([feat, code])))
(ResnetFC n_blocks=0, configs/model/dino_downsampler.yaml). Bilinear
sampling is linear, so the first layer's feature block commutes with the
pixel-aligned lookup:

    lin_in([sample(F, xy), code]) = sample(F @ W_feat, xy) + code @ W_code + b

Folding `W_feat` into the feature grid ONCE per image (a 1x1 conv over
H x W pixels) replaces a per-point 256->128 matmul over B*rays*samples
points (32+ samples per pixel) with a per-pixel one — ~7x fewer FLOPs per
query and half the gather bytes (128-d instead of 256-d rows), bit-exact
up to fp reassociation.

The folded grid + small weights are stored bf16 (gather bandwidth), the
accumulating matmuls run fp32-accumulated on the MXU.
"""
from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from scenedino_tpu.core import cameras, encoding, grid_sample
from scenedino_tpu.models.field import FieldConfig, SceneState


class FastFieldState(NamedTuple):
    """Prefolded scene state for fast queries (channels-LAST grids: gathers
    pull contiguous feature rows — the TPU-fast layout)."""

    folded_grid: jnp.ndarray  # (B, V, H, W, d_hidden) = feat_grid @ W_feat
    w_code: jnp.ndarray  # (code_dims, d_hidden)
    b1: jnp.ndarray  # (d_hidden,)
    w2: jnp.ndarray  # (d_hidden, d_out)
    b2: jnp.ndarray  # (d_out,)
    feat_ks: jnp.ndarray
    feat_w2c: jnp.ndarray
    color_imgs: jnp.ndarray
    color_ks: jnp.ndarray
    color_w2c: jnp.ndarray
    # per-channel dequant scale when folded_grid is int8 (serving option;
    # halves gathered bytes on the byte-bound TPU row gather). None = exact.
    grid_scale: Optional[jnp.ndarray] = None


def build_fast_state(
    params,
    state: SceneState,
    cfg: FieldConfig,
    head_name: str = "heads_normal_head",
    compute_dtype=jnp.bfloat16,
    quantize_grid: bool = False,
) -> FastFieldState:
    """Fold the head's first layer into the feature grid.

    params: SceneField variables ({"params": {...}}). Only valid for the
    ResnetFC n_blocks=0 head (the shipped config); learn_empty must be off.

    quantize_grid: store the folded grid int8 with a per-channel symmetric
    scale (serving option, NOT exact): the TPU row gather is byte-bound,
    so int8 rows halve the dominant gather traffic. Dequantization is a
    per-channel scale AFTER the bilinear blend (scaling commutes with the
    blend, so results are exact w.r.t. the quantized grid).
    """
    # refuse to fold structures the fast math does not implement: a deeper
    # head (n_blocks>0) or split-head config would otherwise fold into a
    # silently-wrong 2-layer MLP (the SSC/PLY CLIs call this without a
    # separate can_fold check). beta/d_latent variants leave no param
    # trace — guard those with can_fold(head_confs=...) at the call site.
    if not can_fold(params, cfg, head_name):
        raise ValueError(
            "build_fast_state: head/config not foldable (needs the shipped "
            "n_blocks=0 ResnetFC single head, sample_color + predict_dino, "
            "learn_empty off) — use the generic renderer (--slow)"
        )
    head = params["params"][head_name]
    k1 = jnp.asarray(head["lin_in"]["kernel"])  # (256+code, d_hidden)
    b1 = jnp.asarray(head["lin_in"]["bias"])
    k2 = jnp.asarray(head["lin_out"]["kernel"])  # (d_hidden, d_out)
    b2 = jnp.asarray(head["lin_out"]["bias"])
    C = state.feat_grid.shape[2]
    w_feat = k1[:C]  # (C, d_hidden)
    w_code = k1[C:]

    folded = jnp.einsum(
        "bvchw,cd->bvhwd", state.feat_grid.astype(jnp.float32), w_feat,
        precision=jax.lax.Precision.HIGHEST,
    )
    grid_scale = None
    grid_dtype = compute_dtype
    if quantize_grid:
        amax = jnp.max(jnp.abs(folded), axis=(0, 1, 2, 3))  # per channel
        grid_scale = jnp.maximum(amax, 1e-12) / 127.0
        folded = jnp.clip(jnp.round(folded / grid_scale), -127, 127)
        grid_dtype = jnp.int8
    return FastFieldState(
        grid_scale=grid_scale,
        folded_grid=folded.astype(grid_dtype),
        w_code=w_code.astype(compute_dtype),
        b1=b1.astype(jnp.float32),
        w2=k2.astype(compute_dtype),
        b2=b2.astype(jnp.float32),
        feat_ks=state.feat_ks,
        feat_w2c=state.feat_w2c,
        color_imgs=state.color_imgs.transpose(0, 1, 3, 4, 2).astype(compute_dtype),
        color_ks=state.color_ks,
        color_w2c=state.color_w2c,
    )


def encode_prefolded(
    field,
    params,
    imgs: jnp.ndarray,  # (B, V, 3, H, W) in [-1, 1]
    projs: jnp.ndarray,
    poses_c2w: jnp.ndarray,
    ids_encoder=(0,),
    ids_render=None,
    head_name: str = "heads_normal_head",
    compute_dtype=jnp.bfloat16,
) -> FastFieldState:
    """encode + build_fast_state with W_feat folded INTO the DPT head's
    final conv (exact — the conv is linear, so conv(x, K) @ W ==
    conv(x, K @ W); models/dpt.py _FoldableConv3x3).

    Why (serving): the standard path computes head_conv1 at full width
    over the 2x-res grid (~583 GFLOP for ViT-B/8 @ 192x640: 384x1280 x
    3x3 x 256->256), WRITES the 256-ch grid (251 MB bf16), re-reads it,
    and applies W_feat as a separate per-pixel matmul. Folding W into the
    conv kernel computes the 128-ch folded grid DIRECTLY: half the
    conv FLOPs and ~375 MB less HBM traffic — ~2.4 ms off every encode
    (v5e; encode 13.9 -> ~11.5 ms). Numerics match
    encode + build_fast_state up to fp reassociation (tested).

    Falls back to the two-step path for non-DPT encoders. Raises like
    build_fast_state when the head/config is not foldable.
    """
    from scenedino_tpu.models.field import SceneField

    cfg = field.cfg
    if not can_fold(params, cfg, head_name, head_confs=getattr(field, "head_confs", None)):
        raise ValueError(
            "encode_prefolded: head/config not foldable (needs the shipped "
            "n_blocks=0 ResnetFC single head, sample_color + predict_dino, "
            "learn_empty off) — use the generic renderer (--slow)"
        )
    enc_params = params.get("params", {}).get("encoder", {})
    dec = enc_params.get("decoder") if isinstance(enc_params, dict) else None
    if not (isinstance(dec, dict) and "head_conv1" in dec):
        state = field.apply(
            params, imgs, projs, poses_c2w, ids_encoder=tuple(ids_encoder),
            ids_render=tuple(ids_render) if ids_render is not None else None,
            method=SceneField.encode,
        )
        return build_fast_state(params, state, cfg, head_name, compute_dtype)

    head = params["params"][head_name]
    k1 = jnp.asarray(head["lin_in"]["kernel"])  # (C + code, d_hidden)
    C = dec["head_conv1"]["kernel"].shape[-1]
    w_feat = k1[:C]
    state = field.apply(
        params, imgs, projs, poses_c2w, ids_encoder=tuple(ids_encoder),
        ids_render=tuple(ids_render) if ids_render is not None else None,
        fold_matrix=w_feat, method=SceneField.encode,
    )
    # feat_grid is ALREADY folded: (B, V, d_hidden, Hg, Wg)
    return FastFieldState(
        folded_grid=state.feat_grid.transpose(0, 1, 3, 4, 2).astype(compute_dtype),
        w_code=k1[C:].astype(compute_dtype),
        b1=jnp.asarray(head["lin_in"]["bias"]).astype(jnp.float32),
        w2=jnp.asarray(head["lin_out"]["kernel"]).astype(compute_dtype),
        b2=jnp.asarray(head["lin_out"]["bias"]).astype(jnp.float32),
        feat_ks=state.feat_ks,
        feat_w2c=state.feat_w2c,
        color_imgs=state.color_imgs.transpose(0, 1, 3, 4, 2).astype(compute_dtype),
        color_ks=state.color_ks,
        color_w2c=state.color_w2c,
    )


def can_fold(params, cfg: FieldConfig, head_name: str = "heads_normal_head",
             head_confs=None) -> bool:
    """True when `build_fast_state`'s linear-fold applies: the shipped
    2-layer ResnetFC head (n_blocks=0 -> only lin_in/lin_out params),
    relu activation, no latent split, sampled colors, learn_empty off,
    and normal_head as the ONLY prediction head — a split_dino_heads
    config (field.py:249-252 concatenates normal_head + dino_head
    columns) must fall back to the generic renderer, since the fold only
    bakes the named head. Static (host-side) check.

    head_confs: pass `field.head_confs` when available — beta > 0
    (softplus activation) and d_latent > 0 (latent row mixing) leave NO
    trace in the param tree but change the math the fold hardcodes."""
    if cfg.learn_empty:
        return False
    # the fast paths modulate SAMPLED render-view colors and read the dino
    # columns off the head output — both head-output layouts require
    # sample_color + predict_dino (cfg.d_out == 1 + dino_dims)
    if not (cfg.sample_color and cfg.predict_dino):
        return False
    if head_confs is not None:
        short = head_name.removeprefix("heads_")
        for name, conf in head_confs:
            if name != short:
                continue
            args = dict(conf).get("args", {}) or {}
            if dict(conf).get("type", "resnet") != "resnet":
                return False
            if args.get("beta", 0.0) > 0 or args.get("d_latent", 0) > 0:
                return False
    p = params.get("params", {})
    extra_heads = [
        k for k in p if k.startswith("heads_") and k != head_name
    ]
    if extra_heads:
        return False
    head = p.get(head_name)
    if head is None:
        return False
    return set(head.keys()) == {"lin_in", "lin_out"}


def render_encode_view_batched(
    fs: FastFieldState,
    cfg: FieldConfig,
    height: int,
    width: int,
    keys,  # (B,) PRNG keys, one per batch element
    **kwargs,
):
    """vmap of `render_encode_view` over the batch axis of a (B, 1)-view
    fast state (the stage-2 full-frame render: every sample renders its
    own encode camera). Returns (depth (B, H, W), dino (B, H, W, D),
    rgb (B, H, W, 3))."""

    def one(grid, fk, fw, ci, ck, cw, key):
        sub = fs._replace(
            folded_grid=grid[None, None], feat_ks=fk[None, None],
            feat_w2c=fw[None], color_imgs=ci[None, None],
            color_ks=ck[None, None], color_w2c=cw[None],
        )
        return render_encode_view(sub, cfg, height, width, key, **kwargs)

    return jax.vmap(one)(
        fs.folded_grid[:, 0], fs.feat_ks[:, 0], fs.feat_w2c[:, :1],
        fs.color_imgs[:, 0], fs.color_ks[:, 0], fs.color_w2c[:, :1],
        keys,
    )


def render_encode_view(
    fs: FastFieldState,
    cfg: FieldConfig,
    height: int,
    width: int,
    key,
    n_coarse: int = 32,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    depth_statistic: str = "expectation",
):
    """Render the encode camera's own view with ZERO feature gathers.

    Every sample along pixel p's ray projects back to p in the encode
    camera, and with align_corners=False NDC pixel centers land exactly on
    integer pixel coordinates — bilinear lookup degenerates to reading the
    map at p. The same holds for the render-view colors when
    ids_render == ids_encoder (the demo / 2D-eval configuration,
    demo_script.py + unified_evaluator.py). The whole render becomes
    map-reads + the tiny code-MLP + compositing: MXU/VPU work only.

    Returns (depth (H, W), dino (H, W, d_out-1), rgb (H, W, 3)).
    """
    from scenedino_tpu.core import compositing as C
    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S

    B, V = fs.folded_grid.shape[:2]
    assert B == 1 and V == 1, "encode-view fast render expects 1 view"
    K = fs.feat_ks[0, 0]
    pose_c2w = jnp.linalg.inv(fs.feat_w2c[0, :1])
    r, xy_img = rays_mod.rays_from_k(
        pose_c2w, K[None], width, height, cfg.z_near, cfg.z_far
    )
    flat = r.reshape(-1, 8)
    # mirror render_rays' key split so both paths draw identical strata
    # mirror render_rays' FIVE-way split (nerf.py:76 since the fine-key
    # fix) and take the same k_coarse slot — relying on split(key, 4)[0]
    # == split(key, 5)[0] is an implementation detail of partitionable
    # threefry that the legacy flag can turn off
    k_coarse = jax.random.split(key, 5)[0]
    z = S.sample_coarse(k_coarse, flat, n_coarse, lindisp)  # (HW, K)

    # camera-space depth of each sample: rays are unit-norm world dirs; the
    # z-coordinate in camera space is t * dir_cam_z with dir from unproj.
    dirs_cam, _ = rays_mod.unproj_map(width, height, jnp.stack([K[0, 0], K[1, 1]])[None],
                                      c=jnp.stack([K[0, 2], K[1, 2]])[None])
    dir_z = dirs_cam[0, ..., 2].reshape(-1, 1)  # (HW, 1) z component of unit dir
    z_cam = z * dir_z
    dist = z  # ray distance = t for unit dirs

    from scenedino_tpu.core import encoding as E

    xy = xy_img.reshape(-1, 2)  # exact NDC pixel centers

    # The positional code interleaves (x, y, z) channels; x/y are constant
    # per pixel across the K samples. Split W_code into per-pixel (x, y)
    # channels — folded once into a per-pixel bias — and per-sample z
    # channels (13 of 39): 3x less PE + code-matmul work.
    import numpy as np

    D_code = fs.w_code.shape[0]
    z_mask = (np.arange(D_code) % 3) == 2  # static (host) mask
    w_z = fs.w_code[np.where(z_mask)[0]]  # (13, d_hidden)
    w_xy = fs.w_code[np.where(~z_mask)[0]]  # (26, d_hidden)

    # per-pixel xy code: PE of (x, y, 0) with z channels dropped
    coords_xy = jnp.concatenate([xy, jnp.zeros_like(xy[:, :1])], -1)
    code_full_xy = E.positional_encoding(coords_xy, cfg.num_freqs, cfg.freq_factor, cfg.include_input)
    code_xy = code_full_xy[:, np.where(~z_mask)[0]]  # (HW, 26)
    pixel_bias = jnp.einsum(
        "pc,cd->pd", code_xy.astype(fs.w_code.dtype), w_xy, preferred_element_type=jnp.float32
    )[:, None]  # (HW, 1, d_hidden)

    # per-sample z code: [z_n, sin(f_k z_n), cos(f_k z_n), ...]
    depth_like = z_cam if cfg.code_mode == "z" else dist
    zn = E.normalize_z(depth_like, cfg.z_near, cfg.z_far, inv_z=cfg.inv_z)  # (HW, K)
    code_z = E.positional_encoding(zn[..., None], cfg.num_freqs, cfg.freq_factor, cfg.include_input)

    g2d = fs.folded_grid[0, 0]  # (Hg, Wg, D) — 2x the image for patch-8 DPT
    if fs.grid_scale is not None:
        # encode-view does no gathers — dequantize upfront
        g2d = g2d.astype(jnp.float32) * fs.grid_scale
    Hg, Wg = g2d.shape[:2]
    if (Hg, Wg) == (2 * height, 2 * width):
        # render pixel centers fall exactly midway between grid pixels
        # (px = 2i + 0.5): the bilinear lookup degenerates to a 2x2 mean —
        # one streaming reshape-mean instead of 4 gathers per point.
        g2d = g2d.astype(jnp.float32).reshape(height, 2, width, 2, -1).mean((1, 3)).astype(g2d.dtype)
    elif (Hg, Wg) != (height, width):
        # general ratio: true NDC gather at pixel centers (slow path)
        xs = jnp.linspace(-1 + 1 / width, 1 - 1 / width, width)
        ys = jnp.linspace(-1 + 1 / height, 1 - 1 / height, height)
        gx2, gy2 = jnp.meshgrid(xs, ys, indexing="xy")
        from scenedino_tpu.core.grid_sample import grid_sample_2d_hwc

        g2d = grid_sample_2d_hwc(g2d, jnp.stack([gx2, gy2], -1).reshape(-1, 2)).reshape(
            height, width, -1
        )
    g = g2d.reshape(-1, 1, fs.folded_grid.shape[-1])  # (HW, 1, D)
    h = (
        g.astype(jnp.float32)
        + pixel_bias
        + jnp.einsum("pkc,cd->pkd", code_z.astype(fs.w_code.dtype), w_z,
                     preferred_element_type=jnp.float32)
        + fs.b1
    )
    h = jax.nn.relu(h)
    out = (
        jnp.einsum("pkd,de->pke", h.astype(fs.w2.dtype), fs.w2,
                   preferred_element_type=jnp.float32)
        + fs.b2
    )
    sigma = jax.nn.softplus(out[..., 0])  # (HW, K)
    # compositing stays on the plain jnp chain: a hand-written Pallas
    # fused-compositing kernel was wired here behind a flag and MEASURED
    # on v5e (2026-08, BENCH r4 prep) at 44.5 ms/image vs 22.6 ms for this
    # path — XLA's fusion composites inside the producer epilogue and
    # never materializes the (HW, K, 64) fp32 sample tensor the kernel
    # had to round-trip through HBM. Kernel removed; measurement recorded
    # in bench.py detail["pallas_composite_verdict"].
    comp = C.composite_rays(sigma, z, hard_alpha_cap, depth_statistic=depth_statistic)
    depth = comp.depth.reshape(height, width)
    dino = C.weighted_reduce(comp.weights, out[..., 1:]).reshape(height, width, -1)
    w_pix = jnp.sum(comp.weights, -1)
    rgb_map = fs.color_imgs[0, 0].astype(jnp.float32)  # (H, W, 3)
    if rgb_map.shape[:2] != (height, width):
        # the zero-gather rgb shortcut reads the color image at the render
        # resolution; a mismatched render size must use the generic
        # renderer (the feature branch above supports arbitrary ratios,
        # the color modulation does not)
        raise ValueError(
            f"render_encode_view: color image {rgb_map.shape[:2]} != render "
            f"size {(height, width)} — use the generic renderer"
        )
    rgb = rgb_map * w_pix.reshape(height, width)[..., None]
    return depth, dino, rgb


def render_novel_view(
    fs: FastFieldState,
    cfg: FieldConfig,
    target_pose_c2w: jnp.ndarray,  # (4, 4) cam2world of the NOVEL camera
    target_k: jnp.ndarray,  # (3, 3) normalized intrinsics
    height: int,
    width: int,
    key,
    n_coarse: int = 32,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    band: int = 64,
    want_rgb: bool = True,
    depth_statistic: str = "expectation",
):
    """Full-frame render of an ARBITRARY camera (ids_render != ids_encoder).

    The stage-1/NVS hot path (bts.py:271-328 inside nerf.py:230-449). The
    gather-bound pixel-aligned lookup runs through the banded NARROW-row
    gather (ops/tile_gather.py): sample points are laid out
    (target_row, depth_sample, target_col) in few large segments so each
    segment's points hit a horizontal band of the source feature grid
    (vertical parallax is small for driving-style motion; incoherent
    geometry falls back per-segment, exactly). Measured (v5e,
    tools/bench_gather_matrix.py): the TPU gather is BYTE-bound
    (~115 GB/s gathered) for wide rows — so the feature grid is gathered
    as 4 narrow 128-ch rows per point, NOT packed 512-ch quads, while the
    small rgb image IS quad-packed (row-count-bound regime) and fetched
    with one plain take per point.

    Returns (depth (H, W), dino (H, W, d_out-1), rgb (H, W, 3) | None).
    """
    from scenedino_tpu.core import compositing as C
    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S
    from scenedino_tpu.ops.tile_gather import (
        bilinear_gather_banded,
        bilinear_gather_packed_plain,
        pack_quads,
    )

    B, V = fs.folded_grid.shape[:2]
    assert B == 1 and V == 1, "novel-view fast render expects 1 encode view"
    K = n_coarse
    r, _ = rays_mod.rays_from_k(
        target_pose_c2w[None], target_k[None], width, height, cfg.z_near, cfg.z_far
    )
    flat = r.reshape(-1, 8)  # (R, 8) row-major target pixels
    # mirror render_rays' key split so both paths draw identical strata
    # mirror render_rays' FIVE-way split (nerf.py:76 since the fine-key
    # fix) and take the same k_coarse slot — relying on split(key, 4)[0]
    # == split(key, 5)[0] is an implementation detail of partitionable
    # threefry that the legacy flag can turn off
    k_coarse = jax.random.split(key, 5)[0]
    z = S.sample_coarse(k_coarse, flat, K, lindisp)  # (R, K)

    pts = flat[:, None, :3] + z[..., None] * flat[:, None, 3:6]  # (R, K, 3)
    # (row, sample, col) ordering -> y-coherent gather segments
    pts_hkw = pts.reshape(height, width, K, 3).transpose(0, 2, 1, 3)
    p_flat = pts_hkw.reshape(1, -1, 3)  # (1, P, 3), P = H*K*W

    xy, zc, dist, _ = cameras.project_points(p_flat, fs.feat_w2c, fs.feat_ks)
    coords = encoding.encode_coords(
        xy.astype(jnp.float32), zc.astype(jnp.float32), dist.astype(jnp.float32),
        cfg.z_near, cfg.z_far, mode=cfg.code_mode, inv_z=cfg.inv_z,
    )
    code = encoding.positional_encoding(
        coords, cfg.num_freqs, cfg.freq_factor, cfg.include_input
    )[0, 0]  # (P, code_dims)

    g2d = fs.folded_grid[0, 0]  # (Hg, Wg, D)
    Hg, Wg, D = g2d.shape
    px = (xy[0, 0, :, 0] + 1.0) * 0.5 * Wg - 0.5
    py = (xy[0, 0, :, 1] + 1.0) * 0.5 * Hg - 0.5
    # few LARGE segments: band-copy traffic is negligible next to the
    # gathers, and big per-take index vectors amortize best (measured)
    segments = height // 4 if height % 4 == 0 else height
    if fs.grid_scale is not None:
        # int8 grid: quad-pack -> ONE 512 B row per point. At int8 the
        # packed row re-enters the byte-bound regime (~115 GB/s) at 1/4
        # the rows — ~2x the exact path's gather rate. Dequant after the
        # blend (per-channel scale commutes with bilinear).
        from scenedino_tpu.ops.tile_gather import bilinear_gather_packed_banded

        packed = pack_quads(g2d)
        sampled = bilinear_gather_packed_banded(
            packed, Hg, Wg, px, py, segments=segments, band=band
        )
        sampled = sampled.astype(jnp.float32) * fs.grid_scale
    else:
        sampled = bilinear_gather_banded(
            g2d, px, py, segments=segments, band=band
        )  # (P, D)

    h = (
        sampled.astype(jnp.float32)
        + jnp.einsum(
            "pc,cd->pd", code.astype(fs.w_code.dtype), fs.w_code,
            preferred_element_type=jnp.float32,
        )
        + fs.b1
    )
    h = jax.nn.relu(h)
    if fs.w2.dtype == jnp.bfloat16:
        # the (P, 128) activation is ~2 GB fp32 at full-frame scale; its
        # HBM round trip between the two matmuls is pure bandwidth — store
        # it bf16 on the bf16 (serving) path (fp32 path stays exact)
        h = h.astype(jnp.bfloat16)
    out = (
        jnp.einsum("pd,de->pe", h.astype(fs.w2.dtype), fs.w2,
                   preferred_element_type=jnp.float32)
        + fs.b2
    )
    sigma = out[..., 0].reshape(height, K, width)
    sigma = jax.nn.softplus(sigma.transpose(0, 2, 1).reshape(-1, K))  # (R, K)
    comp = C.composite_rays(sigma, z, hard_alpha_cap, depth_statistic=depth_statistic)
    depth = comp.depth.reshape(height, width)

    dino = out[..., 1:].reshape(height, K, width, -1)
    w_hwk = comp.weights.reshape(height, width, K)
    dino_out = jnp.einsum("hwk,hkwd->hwd", w_hwk, dino)

    rgb_out = None
    if want_rgb:
        # colors from the first render view: the image is SMALL (~2.9 MB
        # quad-packed), so one plain take per point runs at the full
        # row-gather rate — no banding needed
        img = fs.color_imgs[0, 0]  # (Hc, Wc, 3)
        Hc, Wc = img.shape[:2]
        xy_c, _, _, _ = cameras.project_points(p_flat, fs.color_w2c[:, :1], fs.color_ks[:, :1])
        cx = (xy_c[0, 0, :, 0] + 1.0) * 0.5 * Wc - 0.5
        cy = (xy_c[0, 0, :, 1] + 1.0) * 0.5 * Hc - 0.5
        packed_rgb = pack_quads(img)
        rgb_s = bilinear_gather_packed_plain(packed_rgb, Hc, Wc, cx, cy)  # (P, 3)
        rgb_k = rgb_s.reshape(height, K, width, 3).astype(jnp.float32)
        rgb_out = jnp.einsum("hwk,hkwd->hwd", w_hwk, rgb_k)
    return depth, dino_out, rgb_out


def render_novel_view_fused(
    fs: FastFieldState,
    cfg: FieldConfig,
    target_pose_c2w: jnp.ndarray,  # (4, 4) cam2world of the NOVEL camera
    target_k: jnp.ndarray,  # (3, 3) normalized intrinsics
    height: int,
    width: int,
    key,
    n_coarse: int = 32,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    band: int = 64,
    want_rgb: bool = True,
    rows_per_seg: int = 4,
    depth_statistic: str = "expectation",
):
    """`render_novel_view` with the WHOLE per-point pipeline fused into the
    per-segment `lax.map` body.

    The unfused path materializes several (P, 128) fp32 intermediates in
    HBM between the gather map and the MLP einsums (P = H*W*K ~ 4M points
    -> ~2 GB each): pure bandwidth. Here each segment (rows_per_seg target
    rows x K samples x W columns) runs projection -> positional code ->
    banded bilinear gather -> folded MLP -> softplus -> alpha compositing
    -> rgb gather + weighting entirely inside the map body, so only
    per-ray outputs (depth, dino, rgb: ~70 B/ray) are ever written out.
    Numerically identical to `render_novel_view` up to fp reassociation
    (same blends, same einsum dtypes/precisions, same banding segments
    when rows_per_seg = 4).

    Returns (depth (H, W), dino (H, W, d_out-1), rgb (H, W, 3) | None).
    """
    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S

    B, V = fs.folded_grid.shape[:2]
    assert B == 1 and V == 1, "novel-view fast render expects 1 encode view"
    if fs.grid_scale is not None:
        raise NotImplementedError("fused path is exact-only (no int8 grid)")
    assert height % rows_per_seg == 0
    K = n_coarse
    r, _ = rays_mod.rays_from_k(
        target_pose_c2w[None], target_k[None], width, height, cfg.z_near, cfg.z_far
    )
    flat = r.reshape(-1, 8)  # (R, 8) row-major target pixels
    # mirror render_rays' FIVE-way split (nerf.py:76 since the fine-key
    # fix) and take the same k_coarse slot — relying on split(key, 4)[0]
    # == split(key, 5)[0] is an implementation detail of partitionable
    # threefry that the legacy flag can turn off
    k_coarse = jax.random.split(key, 5)[0]
    z = S.sample_coarse(k_coarse, flat, K, lindisp)  # (R, K)

    S_n = height // rows_per_seg
    rw = rows_per_seg * width
    rays_seg = flat.reshape(S_n, rw, 8)
    z_seg = z.reshape(S_n, rw, K)

    body = _fused_rows_body(
        fs, cfg, width, K, rows_per_seg, band, want_rgb, hard_alpha_cap,
        depth_statistic=depth_statistic,
    )
    depth, dino, rgb = jax.lax.map(body, (rays_seg, z_seg))
    depth = depth.reshape(height, width)
    dino = dino.reshape(height, width, -1)
    rgb = rgb.reshape(height, width, 3) if want_rgb else None
    return depth, dino, rgb


def render_novel_view_fused_sharded(
    fs: FastFieldState,
    cfg: FieldConfig,
    target_pose_c2w: jnp.ndarray,
    target_k: jnp.ndarray,
    height: int,
    width: int,
    key,
    mesh,
    axis_name: str = "data",
    n_coarse: int = 32,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    band: int = 64,
    want_rgb: bool = True,
    rows_per_seg: int = 4,
    depth_statistic: str = "expectation",
):
    """Multi-chip `render_novel_view_fused`: the segment axis (groups of
    target rows) is sharded over `mesh[axis_name]` with shard_map — each
    device renders its row strips against a replicated folded state with
    ZERO collectives (rendering is embarrassingly parallel over rays;
    the TPU-native counterpart of the reference's intra-renderer
    DataParallel, nerf.py:641-658). Rays and strata are generated
    globally, so the result is bit-identical to the single-device fused
    renderer for any mesh size (exactness-tested on the CPU mesh)."""
    from jax.sharding import PartitionSpec as P

    try:
        from jax import shard_map  # jax >= 0.8
    except ImportError:  # pragma: no cover
        from jax.experimental.shard_map import shard_map

    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S

    if fs.grid_scale is not None:
        raise NotImplementedError("fused path is exact-only (no int8 grid)")
    assert height % rows_per_seg == 0
    K = n_coarse
    r, _ = rays_mod.rays_from_k(
        target_pose_c2w[None], target_k[None], width, height, cfg.z_near, cfg.z_far
    )
    flat = r.reshape(-1, 8)
    # mirror render_rays' FIVE-way split (nerf.py:76 since the fine-key
    # fix) and take the same k_coarse slot — relying on split(key, 4)[0]
    # == split(key, 5)[0] is an implementation detail of partitionable
    # threefry that the legacy flag can turn off
    k_coarse = jax.random.split(key, 5)[0]
    z = S.sample_coarse(k_coarse, flat, K, lindisp)

    S_n = height // rows_per_seg
    rw = rows_per_seg * width
    n_dev = mesh.shape[axis_name]
    assert S_n % n_dev == 0, f"{S_n} segments not divisible over {n_dev} devices"
    rays_seg = flat.reshape(S_n, rw, 8)
    z_seg = z.reshape(S_n, rw, K)

    def shard_fn(fs_rep, rs, zs):
        body = _fused_rows_body(
            fs_rep, cfg, width, K, rows_per_seg, band, want_rgb, hard_alpha_cap,
            depth_statistic=depth_statistic,
        )
        return jax.lax.map(body, (rs, zs))

    f = shard_map(
        shard_fn,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(axis_name)),
        out_specs=P(axis_name),
    )
    depth, dino, rgb = f(fs, rays_seg, z_seg)
    depth = depth.reshape(height, width)
    dino = dino.reshape(height, width, -1)
    rgb = rgb.reshape(height, width, 3) if want_rgb else None
    return depth, dino, rgb


def render_novel_view_probe(
    fs: FastFieldState,
    cfg: FieldConfig,
    target_pose_c2w: jnp.ndarray,  # (4, 4) cam2world of the NOVEL camera
    target_k: jnp.ndarray,  # (3, 3) normalized intrinsics
    height: int,
    width: int,
    key,
    n_probe: int = 16,
    n_fine: int = 10,
    n_uniform: int = 2,
    probe_stride: int = 4,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    band: int = 64,
    want_rgb: bool = True,
    rows_per_seg: int = 4,
    depth_statistic: str = "expectation",
):
    """Two-pass probe-guided novel-view render (empty-space skipping) —
    the BLESSED serving default (round 3).

    SERVING MODE — different sample placement than `render_novel_view`
    (which matches the reference's stratified coarse pass): this is the
    TPU answer to occupancy-grid skipping. The gather is byte-bound
    (~115 GB/s, tools/bench_gather_matrix.py) so the only remaining lever
    is FEWER samples per ray:

      pass 1: a sigma-only probe at `probe_stride`-strided resolution
        ((H/s) x (W/s) rays x n_probe stratified samples; the head's
        second matmul is sliced to its sigma column) composites to a
        per-ray weight histogram — where along each ray the mass lives.
      pass 2: every full-res ray importance-resamples `n_fine` depths
        from its probe pixel's histogram (`sample_coarse_from_dist`, the
        reference's proposal resampler, nerf.py:143-179) plus `n_uniform`
        stratified safety samples (thin structures the probe missed),
        then renders through the fused per-segment pipeline.

    Per-pixel work: n_probe/s^2 + n_fine + n_uniform points vs the
    single-pass n_coarse (defaults: 16/16 + 10 + 2 = 13 vs 32). Quality
    is BOUNDED, not exact: tests/test_probe_quality.py renders an
    analytic wall scene against a 256-sample gold and asserts these
    defaults beat the exact 32-uniform path at median AND p95 depth
    error (measured: probe med 0.14 / p95 4.09 vs exact-32 med 0.32 /
    p95 4.89 on the 3-80 m range) with feature cosine >= 0.995 — the
    fine samples concentrate at the surface, where 32 uniform strata are
    noisy. Measured v5e, 192x640 (tools/bench_probe_parts.py): 30.2 ms
    render-only (4.08 M rays/s); + 13.9 ms encode = 44 ms full path.

    Returns (depth (H, W), dino (H, W, d_out-1), rgb (H, W, 3) | None).
    """
    from scenedino_tpu.core import rays as rays_mod
    from scenedino_tpu.core import sampling as S

    B, V = fs.folded_grid.shape[:2]
    assert B == 1 and V == 1, "novel-view fast render expects 1 encode view"
    if fs.grid_scale is not None:
        raise NotImplementedError("fused path is exact-only (no int8 grid)")
    s = probe_stride
    assert height % (s * rows_per_seg) == 0 and width % s == 0, (
        f"H={height} must divide by stride*rows_per_seg={s * rows_per_seg}, "
        f"W={width} by stride={s}"
    )
    Hp, Wp = height // s, width // s

    r, _ = rays_mod.rays_from_k(
        target_pose_c2w[None], target_k[None], width, height, cfg.z_near, cfg.z_far
    )
    grid_rays = r.reshape(height, width, 8)
    flat = grid_rays.reshape(-1, 8)
    kp, kf, ku = jax.random.split(key, 3)

    # --- pass 1: strided sigma-only probe ---
    probe_rays = grid_rays[::s, ::s].reshape(-1, 8)  # (Rp, 8)
    zp = S.sample_coarse(kp, probe_rays, n_probe, lindisp)  # (Rp, Kp)
    fs_sig = fs._replace(w2=fs.w2[:, :1], b2=fs.b2[:1])
    seg_p = Hp // rows_per_seg
    rwp = rows_per_seg * Wp
    pbody = _probe_weights_body(
        fs_sig, cfg, Wp, n_probe, rows_per_seg, band, hard_alpha_cap
    )
    w_probe = jax.lax.map(
        pbody, (probe_rays.reshape(seg_p, rwp, 8), zp.reshape(seg_p, rwp, n_probe))
    ).reshape(Hp, Wp, n_probe)

    # --- importance resampling at full resolution: each pixel reads its
    # probe pixel's histogram (nearest; the safety samples cover drift) ---
    w_full = jnp.repeat(jnp.repeat(w_probe, s, 0), s, 1).reshape(-1, n_probe)
    z_full = jnp.repeat(
        jnp.repeat(zp.reshape(Hp, Wp, n_probe), s, 0), s, 1
    ).reshape(-1, n_probe)
    z_fine = S.sample_coarse_from_dist(kf, flat, w_full, z_full, n_fine, lindisp)
    if n_uniform > 0:
        z_u = S.sample_coarse(ku, flat, n_uniform, lindisp)
        z_fine = jnp.concatenate([z_fine, z_u], -1)
    z = jnp.sort(z_fine, -1)  # (R, Kf) — compositing needs sorted depths
    Kf = z.shape[-1]

    # --- pass 2: fused full-res render on the resampled depths ---
    seg_n = height // rows_per_seg
    rw = rows_per_seg * width
    body = _fused_rows_body(
        fs, cfg, width, Kf, rows_per_seg, band, want_rgb, hard_alpha_cap,
        depth_statistic=depth_statistic,
    )
    depth, dino, rgb = jax.lax.map(
        body, (flat.reshape(seg_n, rw, 8), z.reshape(seg_n, rw, Kf))
    )
    depth = depth.reshape(height, width)
    dino = dino.reshape(height, width, -1)
    rgb = rgb.reshape(height, width, 3) if want_rgb else None
    return depth, dino, rgb


def _probe_weights_body(
    fs_sigma: FastFieldState,
    cfg: FieldConfig,
    width: int,
    n_probe: int,
    rows_per_seg: int,
    band: int,
    hard_alpha_cap: bool,
):
    """Per-segment sigma-only probe: (rays (rw, 8), z (rw, Kp)) ->
    compositing weights (rw, Kp). `fs_sigma` must carry the sigma-sliced
    head (w2 (d_hidden, 1)) so `eval_points` skips the dino columns."""
    from scenedino_tpu.core import compositing as C

    K = n_probe
    _, eval_points = _make_point_eval(fs_sigma, cfg, band)

    def body(args):
        rays_s, z_s = args  # (rw, 8), (rw, K)
        pts = rays_s[:, None, :3] + z_s[..., None] * rays_s[:, None, 3:6]
        pts = (
            pts.reshape(rows_per_seg, width, K, 3)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 3)
        )
        out = eval_points(pts)  # (P_seg, 1) pre-softplus sigma
        sigma = out[:, 0].reshape(rows_per_seg, K, width)
        sigma = jax.nn.softplus(sigma.transpose(0, 2, 1).reshape(-1, K))
        return C.composite_rays(sigma, z_s, hard_alpha_cap).weights

    return body


def _make_point_eval(fs: FastFieldState, cfg: FieldConfig, band: int):
    """Shared per-point pipeline of the fused paths: returns
    (project(pts, rot, trans, K), eval_points(pts (P, 3) -> (P, d_out))).

    eval_points runs projection -> positional code -> banded/plain
    bilinear gather (exactness fallback per call) -> folded 2-layer MLP,
    producing the PRE-softplus head output. Both `render_novel_view_fused`
    (via `_fused_rows_body`) and `fast_query_fused` build on it, so the
    band logic and MLP dtype handling exist exactly once."""
    from scenedino_tpu.ops.tile_gather import _corners, _blend

    g2d = fs.folded_grid[0, 0]  # (Hg, Wg, D)
    Hg, Wg, D = g2d.shape
    flat_grid = g2d.reshape(Hg * Wg, D)
    band_c = min(band, Hg)

    # single-view projection constants (fp32, full precision like
    # cameras.project_points)
    frot = fs.feat_w2c[0, 0, :3, :3]
    ftrans = fs.feat_w2c[0, 0, :3, 3]
    fK = fs.feat_ks[0, 0]
    _hi = jax.lax.Precision.HIGHEST

    def project(pts, rot, trans, Kmat):
        cam = jnp.einsum("ij,pj->pi", rot, pts, precision=_hi) + trans  # (P, 3)
        proj = jnp.einsum("ij,pj->pi", Kmat, cam, precision=_hi)
        zc = proj[:, 2:3]
        xy = proj[:, :2] / jnp.maximum(zc, cameras.EPS)
        xy = jnp.clip(xy, -2.0, 2.0)
        return xy, zc, cam

    def eval_points(pts):
        xy, zc, cam = project(pts, frot, ftrans, fK)
        if cfg.code_mode == "z":
            depth_like = zc
        else:
            depth_like = jnp.linalg.norm(cam, axis=-1, keepdims=True)
        zn = encoding.normalize_z(depth_like, cfg.z_near, cfg.z_far, inv_z=cfg.inv_z)
        code = encoding.positional_encoding(
            jnp.concatenate([xy, zn], -1),
            cfg.num_freqs,
            cfg.freq_factor,
            cfg.include_input,
        )  # (P, code_dims)

        px = (xy[:, 0] + 1.0) * 0.5 * Wg - 0.5
        py = (xy[:, 1] + 1.0) * 0.5 * Hg - 0.5
        (y0i, x0i, y1i, x1i), (wx, wy) = _corners(px, py, Hg, Wg)
        r0 = jnp.clip(jnp.min(y0i), 0, Hg - band_c)
        ok = jnp.all(y1i < r0 + band_c) & jnp.all(y0i >= r0)

        def banded():
            bandtab = jax.lax.dynamic_slice(g2d, (r0, 0, 0), (band_c, Wg, D))
            ftab = bandtab.reshape(band_c * Wg, D)
            ly0 = (y0i - r0) * Wg
            ly1 = jnp.clip(y1i - r0, 0, band_c - 1) * Wg
            return _blend(
                jnp.take(ftab, ly0 + x0i, axis=0),
                jnp.take(ftab, ly0 + x1i, axis=0),
                jnp.take(ftab, ly1 + x0i, axis=0),
                jnp.take(ftab, ly1 + x1i, axis=0),
                wx, wy,
            )

        def plain():
            return _blend(
                jnp.take(flat_grid, y0i * Wg + x0i, axis=0),
                jnp.take(flat_grid, y0i * Wg + x1i, axis=0),
                jnp.take(flat_grid, y1i * Wg + x0i, axis=0),
                jnp.take(flat_grid, y1i * Wg + x1i, axis=0),
                wx, wy,
            )

        sampled = jax.lax.cond(ok, banded, plain)  # (P, D)

        h = (
            sampled.astype(jnp.float32)
            + jnp.einsum(
                "pc,cd->pd",
                code.astype(fs.w_code.dtype),
                fs.w_code,
                preferred_element_type=jnp.float32,
            )
            + fs.b1
        )
        h = jax.nn.relu(h)
        if fs.w2.dtype == jnp.bfloat16:
            h = h.astype(jnp.bfloat16)
        out = (
            jnp.einsum(
                "pd,de->pe",
                h.astype(fs.w2.dtype),
                fs.w2,
                preferred_element_type=jnp.float32,
            )
            + fs.b2
        )  # (P, d_out) pre-softplus
        return out

    return project, eval_points


def _fused_rows_body(
    fs: FastFieldState,
    cfg: FieldConfig,
    width: int,
    n_coarse: int,
    rows_per_seg: int,
    band: int,
    want_rgb: bool,
    hard_alpha_cap: bool,
    depth_statistic: str = "expectation",
):
    """Per-segment body of the fused novel-view renderer: (rays (rw, 8),
    z (rw, K)) -> (depth (rw,), dino (rw, D-1), rgb (rw, 3)). Shared by
    the single-device lax.map and the shard_map-sharded variant."""
    from scenedino_tpu.core import compositing as C
    from scenedino_tpu.ops.tile_gather import bilinear_gather_packed_plain

    K = n_coarse
    rw = rows_per_seg * width
    project, eval_points = _make_point_eval(fs, cfg, band)
    if want_rgb:
        from scenedino_tpu.ops.tile_gather import pack_quads

        img = fs.color_imgs[0, 0]
        Hc, Wc = img.shape[:2]
        packed_rgb = pack_quads(img)
        crot = fs.color_w2c[0, 0, :3, :3]
        ctrans = fs.color_w2c[0, 0, :3, 3]
        cK = fs.color_ks[0, 0]

    def body(args):
        rays_s, z_s = args  # (rw, 8), (rw, K)
        pts = rays_s[:, None, :3] + z_s[..., None] * rays_s[:, None, 3:6]
        # (row, sample, col) ordering -> y-coherent gather segments
        pts = (
            pts.reshape(rows_per_seg, width, K, 3)
            .transpose(0, 2, 1, 3)
            .reshape(-1, 3)
        )  # (P_seg, 3)
        out = eval_points(pts)  # (P_seg, d_out) pre-softplus

        sigma = out[:, 0].reshape(rows_per_seg, K, width)
        sigma = jax.nn.softplus(sigma.transpose(0, 2, 1).reshape(rw, K))
        comp = C.composite_rays(sigma, z_s, hard_alpha_cap, depth_statistic=depth_statistic)
        w_hwk = comp.weights.reshape(rows_per_seg, width, K)

        dino = out[:, 1:].reshape(rows_per_seg, K, width, -1)
        dino_out = jnp.einsum("hwk,hkwd->hwd", w_hwk, dino).reshape(rw, -1)

        if want_rgb:
            xy_c, _, _ = project(pts, crot, ctrans, cK)
            cx = (xy_c[:, 0] + 1.0) * 0.5 * Wc - 0.5
            cy = (xy_c[:, 1] + 1.0) * 0.5 * Hc - 0.5
            rgb_s = bilinear_gather_packed_plain(packed_rgb, Hc, Wc, cx, cy)
            rgb_k = rgb_s.reshape(rows_per_seg, K, width, 3).astype(jnp.float32)
            rgb_out = jnp.einsum("hwk,hkwd->hwd", w_hwk, rgb_k).reshape(rw, 3)
        else:
            rgb_out = jnp.zeros((rw, 3), jnp.float32)
        return comp.depth, dino_out, rgb_out

    return body


def fast_query_fused(
    fs: FastFieldState,
    cfg: FieldConfig,
    xyz: jnp.ndarray,  # (P, 3) world points, single encode view
    segments: int = 64,
    band: int = 128,
    seg_fn=None,
):
    """`fast_query(only_density=True)` with the whole per-point pipeline —
    and optionally the downstream segmentation head — fused into the
    per-segment `lax.map` body.

    The SSC voxel pass queries ~2M points; the unfused path materializes
    (P, 128) fp32 MLP intermediates, the (P, 64) dino features, and (when
    segmenting) the (P, 768) expanded features in HBM — several GB of
    pure bandwidth. Here each segment runs projection -> code -> banded
    gather -> folded MLP (-> seg head) in-map, so the outputs are just
    sigma (P,) [+ seg labels (P,) int32].

    seg_fn: callable (P_seg, dino_dims) -> (P_seg,) integer class labels
    (e.g. SceneField.segment_features under apply + argmax). Returns
    (sigma, seg_or_dino): seg labels when seg_fn is given, else the
    (P, dino) features (both exact vs the unfused path).

    band=128 default from the v5e sweep (tools/bench_ssc_query.py) on the
    real SSCBench grid geometry at segments=256: band 32/64/128 ->
    55.1/47.6/46.7 ms for the 2M-voxel query (band 32 leaves 33% of
    segments on the slow full-table fallback, 128 only 4%).
    """
    if fs.grid_scale is not None:
        raise NotImplementedError("fused path is exact-only (no int8 grid)")
    P = xyz.shape[0]
    assert P % segments == 0, f"P={P} not divisible by segments={segments}"

    _, eval_points = _make_point_eval(fs, cfg, band)

    def body(pts):
        out = eval_points(pts)  # (P_seg, d_out) pre-softplus
        sigma = jax.nn.softplus(out[:, 0])
        dino = out[:, 1:]
        if seg_fn is not None:
            return sigma, seg_fn(dino)
        return sigma, dino

    sigma, rest = jax.lax.map(body, xyz.reshape(segments, -1, 3))
    return sigma.reshape(P), rest.reshape(P, *rest.shape[2:])


def fast_query(
    fs: FastFieldState,
    cfg: FieldConfig,
    xyz: jnp.ndarray,
    only_density: bool = False,
    segments: Optional[int] = None,
    band: int = 32,
):
    """Drop-in replacement for SceneField.__call__ on the fast state.

    xyz: (B, P, 3) -> (rgb, invalid, sigma, dino) with the same shapes and
    semantics as the full field (bts.py:476-595, single encode view).

    segments: if given (and B == V == 1), route the feature lookup through
    the banded packed-quad gather (ops/tile_gather.py) — ~10x faster when
    consecutive points are image-row coherent (e.g. the SSC voxel grid in
    (z, depth, lateral) order); exact for any ordering via the
    per-segment fallback.
    """
    B, P, _ = xyz.shape
    xy, z, dist, invalid_f = cameras.project_points(xyz, fs.feat_w2c, fs.feat_ks)
    coords = encoding.encode_coords(
        xy.astype(jnp.float32), z.astype(jnp.float32), dist.astype(jnp.float32),
        cfg.z_near, cfg.z_far, mode=cfg.code_mode, inv_z=cfg.inv_z,
    )
    code = encoding.positional_encoding(coords, cfg.num_freqs, cfg.freq_factor, cfg.include_input)

    if segments is not None and B == 1 and fs.folded_grid.shape[1] == 1:
        from scenedino_tpu.ops.tile_gather import bilinear_gather_banded

        g2d = fs.folded_grid[0, 0]
        Hg, Wg, _ = g2d.shape
        px = (xy[0, 0, :, 0] + 1.0) * 0.5 * Wg - 0.5
        py = (xy[0, 0, :, 1] + 1.0) * 0.5 * Hg - 0.5
        # 4 narrow takes beat one packed wide take: the gather is
        # byte-bound for wide rows (see render_novel_view docstring)
        sampled = bilinear_gather_banded(
            g2d, px, py, segments=segments, band=band
        )[None, None]  # (1, 1, P, d_hidden)
    else:
        grid = fs.folded_grid
        if fs.grid_scale is not None:
            grid = grid.astype(jnp.float32)
        sampled = grid_sample.grid_sample_views_hwc(grid, xy)  # (B, V, P, d_hidden)
    if fs.grid_scale is not None:
        sampled = sampled.astype(jnp.float32) * fs.grid_scale
    h = (
        sampled.astype(jnp.float32)
        + jnp.einsum(
            "bvpc,cd->bvpd", code.astype(fs.w_code.dtype), fs.w_code,
            preferred_element_type=jnp.float32,
        )
        + fs.b1
    )
    h = jax.nn.relu(h)
    out = (
        jnp.einsum("bvpd,de->bvpe", h.astype(fs.w2.dtype), fs.w2, preferred_element_type=jnp.float32)
        + fs.b2
    )
    out = out.transpose(0, 2, 1, 3).mean(axis=2)  # collapse (single) view axis

    sigma = jax.nn.softplus(out[..., 0])
    dino = out[..., 1:] if cfg.predict_dino else None
    inv_feat = invalid_f[..., 0].transpose(0, 2, 1)  # (B, P, V)

    if only_density:
        return None, inv_feat.astype(jnp.float32), sigma, dino

    xy_c, z_c, _, invalid_c = cameras.project_points(xyz, fs.color_w2c, fs.color_ks)
    colors = grid_sample.grid_sample_views_hwc(fs.color_imgs, xy_c, mode=cfg.color_interpolation)
    Vr, Cc = colors.shape[1], colors.shape[-1]
    # Cc may exceed 3 when extra color channels ride along (uncertainty
    # predictor, field.py:174-181) — mirror SceneField.__call__:276
    rgb = colors.astype(jnp.float32).transpose(0, 2, 1, 3).reshape(B, P, Vr * Cc)
    inv_c = invalid_c[..., 0].transpose(0, 2, 1)
    invalid = (inv_c | jnp.all(inv_feat.astype(bool), axis=-1, keepdims=True)).astype(rgb.dtype)
    return rgb, invalid, sigma, dino


def make_pipelined_stream_step(
    field,
    height: int,
    width: int,
    n_coarse: int = 32,
    lindisp: bool = True,
    hard_alpha_cap: bool = True,
    band: int = 64,
    want_rgb: bool = True,
    rows_per_seg: int = 4,
    compute_dtype=jnp.bfloat16,
):
    """Software-pipelined video/NVS serving: ONE program per frame that
    renders the PREVIOUS frame's prefolded state at a novel camera while
    encoding the NEXT frame.

    MEASURED VERDICT (v5e, bench.py novel_view_pipelined_stream): XLA
    does NOT co-schedule the two independent subgraphs — the fused
    program costs encode + render (76.1 ms/frame vs 74.8 ms for the
    sequential single-shot), not max(encode, render). The fusion's only
    real win is dropping one host round-trip/dispatch per frame, which
    matters for tiny frames or high-latency links, not steady-state
    throughput. The single-shot path stays the recommended default.
    Numerics are exactly the two-call sequence (encode ->
    `build_fast_state`, then `render_novel_view_fused`) — the fusion
    only merges independent programs.

    Returns a RAW step fn — jit it with params/state as real arguments
    (closing big pytrees into the jit bakes them in as constants; see
    `make_grid_predictor`):

        step(params, fs_prev, imgs, projs, poses, target_pose, target_k,
             key) -> (fs_next, (depth, dino, rgb))

    Bootstrap `fs_prev` by encoding frame 0 outside the loop; step N's
    render outputs correspond to the state passed in (frame N-1), and
    `fs_next` feeds the next call. imgs/projs/poses are the NEXT frame's
    (1, 1, ...) encode inputs; the rendered target camera is
    (`target_pose` (4,4) cam2world, `target_k` (3,3) normalized K).
    """
    from scenedino_tpu.models.field import SceneField

    cfg = field.cfg

    def step(params, fs_prev, imgs, projs, poses, target_pose, target_k, key):
        depth, dino, rgb = render_novel_view_fused(
            fs_prev, cfg, target_pose, target_k, height, width, key,
            n_coarse=n_coarse, lindisp=lindisp, hard_alpha_cap=hard_alpha_cap,
            band=band, want_rgb=want_rgb, rows_per_seg=rows_per_seg,
        )
        state = field.apply(
            params, imgs, projs, poses, ids_encoder=(0,), method=SceneField.encode
        )
        fs_next = build_fast_state(params, state, cfg, compute_dtype=compute_dtype)
        return fs_next, (depth, dino, rgb)

    return step
