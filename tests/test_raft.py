"""RAFT-large flax port: component semantics + converter consistency.

torchvision is not installed on this box, so the converter is validated
structurally: a synthetic state dict with the torchvision raft_large key
schema (written out independently here) must convert into a tree the
module accepts, with every key consumed.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.models.raft import (
    RAFT,
    convert_raft_state_dict,
    convex_upsample,
    correlation_pyramid,
    lookup_pyramid,
    make_raft_flow_fn,
)


def test_raft_forward_smoke():
    model = RAFT(iters=2)
    x0 = jnp.zeros((1, 3, 64, 96))
    x1 = jnp.ones((1, 3, 64, 96)) * 0.1
    params = model.init(jax.random.PRNGKey(0), x0, x1)
    flow = model.apply(params, x0, x1)
    assert flow.shape == (1, 2, 64, 96)
    assert np.isfinite(np.asarray(flow)).all()


def test_convex_upsample_uniform_mask_averages():
    """Uniform mask -> every fine pixel is the mean of the 3x3 coarse
    neighborhood (x8 scaled)."""
    B, H, W = 1, 3, 4
    flow = jnp.asarray(np.random.RandomState(0).randn(B, H, W, 2).astype(np.float32))
    mask = jnp.zeros((B, H, W, 9 * 64))  # softmax(0) = uniform over 9
    up = convex_upsample(flow, mask)
    assert up.shape == (B, 8 * H, 8 * W, 2)
    fp = np.pad(np.asarray(flow) * 8, ((0, 0), (1, 1), (1, 1), (0, 0)))
    want = np.mean(
        [fp[:, dy:dy + H, dx:dx + W] for dy in range(3) for dx in range(3)], axis=0
    )
    got = np.asarray(up).reshape(B, H, 8, W, 8, 2)[:, :, 0, :, 0]
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_lookup_pyramid_center_tap():
    """Zero displacement at integer coords reads the correlation value at
    those coords (window center), radius taps read neighbors."""
    B, H, W, C = 1, 4, 4, 8
    rs = np.random.RandomState(1)
    f1 = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    f2 = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    pyr = correlation_pyramid(f1, f2, num_levels=2)
    assert pyr[0].shape == (B * H * W, H, W, 1)
    assert pyr[1].shape == (B * H * W, 2, 2, 1)

    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None])
    out = lookup_pyramid(pyr, coords, radius=1)
    assert out.shape == (B, H, W, 2 * 9)
    # center tap of level 0 (delta index 4 of the 3x3 window) is the
    # correlation at the pixel's own coordinate
    corr0 = np.asarray(pyr[0]).reshape(H, W, H, W)
    center = np.asarray(out[0, :, :, 4])
    want = np.stack([corr0[i, j, i, j] for i in range(H) for j in range(W)]).reshape(H, W)
    np.testing.assert_allclose(center, want, atol=1e-5)


def _synthetic_torchvision_sd():
    """torchvision raft_large key schema with correct shapes."""
    rs = np.random.RandomState(2)

    def conv(cout, cin, k1, k2):
        return rs.randn(cout, cin, k1, k2).astype(np.float32) * 0.05

    sd = {}

    def encoder(prefix, batchnorm):
        def bn(key, c):
            sd[f"{key}.weight"] = np.ones(c, np.float32)
            sd[f"{key}.bias"] = np.zeros(c, np.float32)
            sd[f"{key}.running_mean"] = np.zeros(c, np.float32)
            sd[f"{key}.running_var"] = np.ones(c, np.float32)

        sd[f"{prefix}.convnormrelu.0.weight"] = conv(64, 3, 7, 7)
        sd[f"{prefix}.convnormrelu.0.bias"] = np.zeros(64, np.float32)
        if batchnorm:
            bn(f"{prefix}.convnormrelu.1", 64)
        chans = [(64, 64), (96, 64), (128, 96)]
        for s, (cout, cin) in enumerate(chans, start=1):
            for b in (0, 1):
                cin_b = cin if b == 0 else cout
                base = f"{prefix}.layer{s}.{b}"
                sd[f"{base}.convnormrelu1.0.weight"] = conv(cout, cin_b, 3, 3)
                sd[f"{base}.convnormrelu1.0.bias"] = np.zeros(cout, np.float32)
                sd[f"{base}.convnormrelu2.0.weight"] = conv(cout, cout, 3, 3)
                sd[f"{base}.convnormrelu2.0.bias"] = np.zeros(cout, np.float32)
                if batchnorm:
                    bn(f"{base}.convnormrelu1.1", cout)
                    bn(f"{base}.convnormrelu2.1", cout)
                if b == 0 and s > 1:  # strided stages have a downsample
                    sd[f"{base}.downsample.0.weight"] = conv(cout, cin_b, 1, 1)
                    sd[f"{base}.downsample.0.bias"] = np.zeros(cout, np.float32)
                    if batchnorm:
                        bn(f"{base}.downsample.1", cout)
        sd[f"{prefix}.conv.weight"] = conv(256, 128, 1, 1)
        sd[f"{prefix}.conv.bias"] = np.zeros(256, np.float32)

    encoder("feature_encoder", batchnorm=False)
    encoder("context_encoder", batchnorm=True)

    me = "update_block.motion_encoder"
    sd[f"{me}.convcorr1.0.weight"] = conv(256, 4 * 81, 1, 1)
    sd[f"{me}.convcorr1.0.bias"] = np.zeros(256, np.float32)
    sd[f"{me}.convcorr2.0.weight"] = conv(192, 256, 3, 3)
    sd[f"{me}.convcorr2.0.bias"] = np.zeros(192, np.float32)
    sd[f"{me}.convflow1.0.weight"] = conv(128, 2, 7, 7)
    sd[f"{me}.convflow1.0.bias"] = np.zeros(128, np.float32)
    sd[f"{me}.convflow2.0.weight"] = conv(64, 128, 3, 3)
    sd[f"{me}.convflow2.0.bias"] = np.zeros(64, np.float32)
    sd[f"{me}.conv.0.weight"] = conv(126, 192 + 64, 3, 3)
    sd[f"{me}.conv.0.bias"] = np.zeros(126, np.float32)

    rb = "update_block.recurrent_block"
    for gru, (k1, k2) in (("convgru1", (1, 5)), ("convgru2", (5, 1))):
        for gate in ("convz", "convr", "convq"):
            sd[f"{rb}.{gru}.{gate}.weight"] = conv(128, 128 + 256, k1, k2)
            sd[f"{rb}.{gru}.{gate}.bias"] = np.zeros(128, np.float32)

    sd["update_block.flow_head.conv1.weight"] = conv(256, 128, 3, 3)
    sd["update_block.flow_head.conv1.bias"] = np.zeros(256, np.float32)
    sd["update_block.flow_head.conv2.weight"] = conv(2, 256, 3, 3)
    sd["update_block.flow_head.conv2.bias"] = np.zeros(2, np.float32)

    sd["mask_predictor.convrelu.0.weight"] = conv(256, 128, 3, 3)
    sd["mask_predictor.convrelu.0.bias"] = np.zeros(256, np.float32)
    sd["mask_predictor.conv.weight"] = conv(64 * 9, 256, 1, 1)
    sd["mask_predictor.conv.bias"] = np.zeros(64 * 9, np.float32)
    return sd


def test_raft_converter_structure_and_forward():
    sd = _synthetic_torchvision_sd()
    params = convert_raft_state_dict(sd)

    # the converted tree matches the module's own init tree structurally
    model = RAFT(iters=1)
    x = jnp.zeros((1, 3, 64, 64))
    ref = model.init(jax.random.PRNGKey(0), x, x)["params"]

    def paths(tree, p=()):
        if isinstance(tree, dict):
            out = []
            for k, v in tree.items():
                out += paths(v, p + (k,))
            return out
        return [(p, tuple(np.shape(tree)))]

    got = dict(paths(params))
    want = dict(paths(jax.tree_util.tree_map(np.asarray, ref)))
    assert set(got) == set(want), (
        sorted(set(want) - set(got))[:5], sorted(set(got) - set(want))[:5])
    for k in want:
        assert got[k] == want[k], (k, got[k], want[k])

    flow = model.apply({"params": params}, x, x)
    assert flow.shape == (1, 2, 64, 64)
    assert np.isfinite(np.asarray(flow)).all()


def test_raft_flow_fn_plugs_into_flow_processor():
    from scenedino_tpu.core.image_processor import make_image_processor

    sd = _synthetic_torchvision_sd()
    params = convert_raft_state_dict(sd)
    flow_fn = make_raft_flow_fn(params, iters=1)
    imgs = jnp.zeros((1, 2, 3, 64, 64))
    out = make_image_processor({"type": "flow"}, flow_fn=flow_fn)(imgs)
    assert out.shape == (1, 2, 5, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_raft_extractor_processor():
    from scenedino_tpu.core.image_processor import make_image_processor

    with pytest.raises(NotImplementedError):
        make_image_processor({"type": "raft"})
    sd = _synthetic_torchvision_sd()
    params = convert_raft_state_dict(sd)
    proc = make_image_processor({"type": "raft"}, raft_params=params)
    out = proc(jnp.zeros((1, 2, 3, 64, 64)))
    assert out.shape == (1, 2, 256, 64, 64)
    assert np.isfinite(np.asarray(out)).all()


def test_lookup_pyramid_tap_order_x_varies_slowest():
    """The flattened window's FIRST (x) offset varies slowest (torchvision
    CorrBlock meshgrid indexing="ij") — converted weights depend on it."""
    B, H, W, C = 1, 5, 5, 4
    rs = np.random.RandomState(3)
    f1 = jnp.asarray(rs.randn(B, H, W, C).astype(np.float32))
    pyr = correlation_pyramid(f1, f1, num_levels=1)
    ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                         np.arange(W, dtype=np.float32), indexing="ij")
    coords = jnp.asarray(np.stack([xs, ys], -1)[None])
    out = np.asarray(lookup_pyramid(pyr, coords, radius=1))  # (1, H, W, 9)
    corr0 = np.asarray(pyr[0]).reshape(H, W, H, W)
    # tap index 1 = (dx=-1 slowest, dy=0): correlation at (y, x-1)
    np.testing.assert_allclose(out[0, 2, 2, 1], corr0[2, 2, 2, 1], atol=1e-5)
    # tap index 3 = (dx=0, dy=-1): correlation at (y-1, x)
    np.testing.assert_allclose(out[0, 2, 2, 3], corr0[2, 2, 1, 2], atol=1e-5)
