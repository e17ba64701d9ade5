"""pixelNeRF legacy backbones: shapes, factory routing, torch parity of
the align_corners=True upsample and the torchvision-schema converter."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from scenedino_tpu.models.backbone_util import make_backbone
from scenedino_tpu.models.pixelnerf import (
    ImageEncoder,
    SpatialEncoder,
    _resize_align_corners,
    convert_torchvision_resnet,
)


def test_spatial_encoder_shapes_and_factory():
    m = make_backbone({"type": "spatial", "backbone": "resnet34", "num_layers": 4})
    assert isinstance(m, SpatialEncoder)
    assert m.latent_size == 512
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 128)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), x)
    (latent,) = m.apply(params, x)
    # stem resolution = input / 2, channels 64+64+128+256
    assert latent.shape == (1, 512, 32, 64)
    assert np.isfinite(np.asarray(latent)).all()


def test_spatial_encoder_no_first_pool():
    m = SpatialEncoder(backbone="resnet18", num_layers=3, use_first_pool=False)
    assert m.latent_size == 256
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 32, 64)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), x)
    (latent,) = m.apply(params, x)
    # without the first maxpool, layer1 stays at stem resolution
    assert latent.shape == (1, 64 + 64 + 128, 16, 32)


def test_image_encoder_global_latent():
    m = make_backbone({"type": "global", "backbone": "resnet18", "latent_size": 96})
    assert isinstance(m, ImageEncoder)
    x = jax.random.uniform(jax.random.PRNGKey(0), (2, 3, 64, 64)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), x)
    latent = m.apply(params, x)
    assert latent.shape == (2, 96)


def test_resize_align_corners_matches_torch():
    x = np.random.RandomState(0).rand(1, 5, 7, 3).astype(np.float32)
    out = _resize_align_corners(jnp.asarray(x), 10, 14)
    ref = F.interpolate(
        torch.from_numpy(x).permute(0, 3, 1, 2), (10, 14), mode="bilinear",
        align_corners=True,
    ).permute(0, 2, 3, 1).numpy()
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


def test_torchvision_converter_forward_parity():
    """Converted torchvision-schema weights drive the flax trunk to the
    same output as a hand-built torch twin of conv1/bn1/relu (the stem)."""
    rng = np.random.RandomState(1)
    sd = {
        "model.conv1.weight": rng.randn(64, 3, 7, 7).astype(np.float32) * 0.05,
        "model.bn1.weight": rng.rand(64).astype(np.float32) + 0.5,
        "model.bn1.bias": rng.randn(64).astype(np.float32) * 0.1,
        "model.bn1.running_mean": rng.randn(64).astype(np.float32) * 0.1,
        "model.bn1.running_var": rng.rand(64).astype(np.float32) + 0.5,
    }
    # one basic block in layer1
    for a in ("conv1", "conv2"):
        sd[f"model.layer1.0.{a}.weight"] = rng.randn(64, 64, 3, 3).astype(np.float32) * 0.05
    for b in ("bn1", "bn2"):
        sd[f"model.layer1.0.{b}.weight"] = rng.rand(64).astype(np.float32) + 0.5
        sd[f"model.layer1.0.{b}.bias"] = rng.randn(64).astype(np.float32) * 0.1
        sd[f"model.layer1.0.{b}.running_mean"] = rng.randn(64).astype(np.float32) * 0.1
        sd[f"model.layer1.0.{b}.running_var"] = rng.rand(64).astype(np.float32) + 0.5

    tree = convert_torchvision_resnet(sd)
    assert set(tree) == {"conv1", "bn1", "layer1_0"}
    assert tree["conv1"]["kernel"].shape == (7, 7, 3, 64)

    # torch twin of the stem + block
    x = rng.rand(1, 3, 16, 16).astype(np.float32)
    xt = torch.from_numpy(x)
    w = torch.from_numpy(sd["model.conv1.weight"])
    h = F.conv2d(xt, w, stride=2, padding=3)
    bn = lambda t, p: (
        (t - torch.from_numpy(sd[p + ".running_mean"])[None, :, None, None])
        / torch.sqrt(torch.from_numpy(sd[p + ".running_var"])[None, :, None, None] + 1e-5)
        * torch.from_numpy(sd[p + ".weight"])[None, :, None, None]
        + torch.from_numpy(sd[p + ".bias"])[None, :, None, None]
    )
    h = torch.relu(bn(h, "model.bn1"))
    pooled = F.max_pool2d(h, 3, stride=2, padding=1)
    b = F.conv2d(pooled, torch.from_numpy(sd["model.layer1.0.conv1.weight"]), stride=1, padding=1)
    b = torch.relu(bn(b, "model.layer1.0.bn1"))
    b = F.conv2d(b, torch.from_numpy(sd["model.layer1.0.conv2.weight"]), stride=1, padding=1)
    b = bn(b, "model.layer1.0.bn2")
    ref = torch.relu(b + pooled).numpy()

    from scenedino_tpu.models.pixelnerf import _ResnetTrunk

    trunk = _ResnetTrunk(layers=(1,), widths=(64,), num_layers=2)
    params = trunk.init(jax.random.PRNGKey(0), jnp.asarray(x).transpose(0, 2, 3, 1))
    got = trunk.apply(
        {"params": tree}, jnp.asarray(x).transpose(0, 2, 3, 1)
    )[1].transpose(0, 3, 1, 2)
    # converted tree must structurally match what init built
    jax.tree_util.tree_map(lambda a, b: None, params["params"], tree)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4)
