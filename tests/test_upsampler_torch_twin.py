"""Torch-twin parity for MultiScaleCropGT (reference upsampler.py:17-194).

The reference builds its augmented views with kornia RandomHorizontalFlip +
RandomResizedCrop inside a VideoSequential and warps features back with
kornia.geometry.warp_perspective on the inverse transformation matrices
(upsampler.py:44-52,105-137). For an axis-aligned crop the transformation
is a diagonal affine, so the whole pipeline is reproducible in plain torch:

  * forward view build  = F.affine_grid(theta) + F.grid_sample(bilinear)
    — exactly what kornia's warp does for an affine transform (kornia
    geometry/transform/imgwarp.py warp_perspective lowers to a normalized
    grid + grid_sample(align_corners=True/False per arg; the upsampler
    passes the defaults used here),
  * warp-back           = grid_sample on the inverse affine,
  * validity            = nearest-mode warp of a ones mask, > 0.999
    (MultiScaleCropGT_kornia._affine_transform_valid_pixels, :55-78),
  * accumulation        = set invalid to NaN, nanmean over views, un-flip
    view -2, L2 normalize (:95-137,178-181).

This file pins the crop parameters (monkeypatching the sampler) and checks
the jnp module against that torch twin END TO END, plus the mask-coverage
property: every output pixel is an average over >= 2 valid views (the
original + its flip are always valid), so no pixel is ever unobserved.
"""
import jax
import jax.numpy as jnp
import numpy as np
import torch
import torch.nn.functional as F

import scenedino_tpu.models.upsampler as U

H, W = 32, 48
POOL = 4  # encoder patch size: features at (H/4, W/4)


def _fixed_params(rows):
    """rows: list of (hw, hh, cx, cy, flip) per aug view (batch 1)."""

    def fake(key, batch, n_aug, image_ratio):
        assert batch == 1 and n_aug == len(rows)
        arr = np.asarray(rows, np.float32)  # (n_aug, 5)
        return tuple(jnp.asarray(arr[None, :, i]) for i in range(5))

    return fake


def _pool_encoder_jnp(x):
    """Deterministic gt_encoder twin: 4x4 mean pooling (B,3,H,W)->(B,3,h,w)."""
    B, C, h, w = x.shape
    p = x.reshape(B, C, h // POOL, POOL, w // POOL, POOL).mean((3, 5))
    return [p]


def _pool_encoder_torch(x):
    return F.avg_pool2d(x, POOL)


def _torch_twin(x_np, rows):
    """The reference pipeline in torch given fixed crop params."""
    x = torch.from_numpy(x_np)
    B, C, h, w = x.shape
    assert B == 1
    n_aug = len(rows)

    views = []
    thetas = []
    for hw, hh, cx, cy, fl in rows:
        theta = torch.tensor([[[hw * fl, 0.0, cx], [0.0, hh, cy]]], dtype=torch.float32)
        grid = F.affine_grid(theta, (1, C, h, w), align_corners=False)
        views.append(F.grid_sample(x, grid, mode="bilinear", padding_mode="border",
                                   align_corners=False))
        thetas.append(theta)
    views.append(torch.flip(x, dims=(-1,)))
    views.append(x)
    views = torch.cat(views, 0)  # (V, 3, h, w)

    feats = _pool_encoder_torch(views)
    feats = F.interpolate(feats, size=(h, w), mode="bilinear", align_corners=False)

    accum = []
    valids = []
    for i, (hw, hh, cx, cy, fl) in enumerate(rows):
        # inverse affine: original pixel p -> view coordinate v
        inv = torch.tensor(
            [[[1.0 / (hw * fl), 0.0, -cx / (hw * fl)], [0.0, 1.0 / hh, -cy / hh]]],
            dtype=torch.float32,
        )
        grid = F.affine_grid(inv, (1, C, h, w), align_corners=False)
        warped = F.grid_sample(feats[i : i + 1], grid, mode="bilinear",
                               padding_mode="border", align_corners=False)
        ones = torch.ones(1, 1, h, w)
        valid = F.grid_sample(ones, grid, mode="nearest", padding_mode="zeros",
                              align_corners=False) > 0.999
        accum.append(warped)
        valids.append(valid)
    accum.append(torch.flip(feats[n_aug : n_aug + 1], dims=(-1,)))  # un-flip
    accum.append(feats[n_aug + 1 : n_aug + 2])
    valids.append(torch.ones(1, 1, h, w, dtype=torch.bool))
    valids.append(torch.ones(1, 1, h, w, dtype=torch.bool))

    stack = torch.cat(accum, 0).clone()  # (V, C, h, w)
    vmask = torch.cat(valids, 0)  # (V, 1, h, w)
    stack[~vmask.expand_as(stack)] = torch.nan
    mean = stack.nanmean(dim=0, keepdim=True)
    out = mean / torch.linalg.norm(mean, dim=1, keepdim=True)
    return out.numpy(), vmask.numpy()


def _run_module(x_np, rows, monkeypatch):
    monkeypatch.setattr(U, "_sample_crop_params", _fixed_params(rows))
    ups = U.MultiScaleCropGT(num_views=len(rows) + 2, image_size=(H, W))
    x = jnp.asarray(x_np)
    params = ups.init(
        {"params": jax.random.PRNGKey(0), "augment": jax.random.PRNGKey(1)},
        _pool_encoder_jnp, x,
    )
    return np.asarray(
        ups.apply(params, _pool_encoder_jnp, x, rngs={"augment": jax.random.PRNGKey(2)})
    )


def test_multiscale_crop_matches_torch_twin_4_views(monkeypatch):
    """2 crops + flip + original: bit-path parity with the torch/kornia
    semantics twin (bilinear warps, nearest ones-mask validity, nanmean)."""
    rng = np.random.RandomState(7)
    # smooth-ish but non-trivial image; params avoid exact mask-tie edges
    ys, xs = np.meshgrid(np.linspace(0, 1, H), np.linspace(0, 1, W), indexing="ij")
    img = np.stack([
        np.sin(5 * xs) * np.cos(3 * ys),
        xs * ys,
        0.3 + 0.2 * rng.rand(H, W),
    ]).astype(np.float32)[None]
    rows = [
        (0.73, 0.81, -0.13, 0.07, 1.0),
        (0.57, 0.66, 0.21, -0.11, -1.0),  # flipped crop
    ]
    ours = _run_module(img, rows, monkeypatch)
    ref, vmask = _torch_twin(img, rows)

    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)

    # mask-coverage property: flip + original are always valid -> every
    # pixel averages >= 2 views; no NaN/unobserved pixels can exist
    assert vmask.sum(0).min() >= 2
    assert np.all(np.isfinite(ours))
    np.testing.assert_allclose(np.linalg.norm(ours, axis=1), 1.0, atol=1e-4)


def test_multiscale_crop_validity_mask_matches_torch_nearest_warp(monkeypatch):
    """The analytic |v| <= 1 validity in the jnp module equals kornia's
    nearest-warped ones mask: a pixel outside every crop gets exactly the
    (unflip + original) average, one inside gets the crop contribution."""
    rows = [(0.5, 0.5, -0.45, -0.45, 1.0)]  # top-left quadrant-ish crop
    img = np.linspace(0, 1, H * W * 3).astype(np.float32).reshape(1, 3, H, W)
    ours = _run_module(img, rows, monkeypatch)
    ref, vmask = _torch_twin(img, rows)
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-4)
    crop_valid = vmask[0, 0]
    # the crop really is partial: both regions non-empty
    assert 0 < crop_valid.sum() < H * W
