"""Monodepth2 legacy backbone: shapes + factory."""
import jax
import jax.numpy as jnp
import numpy as np

from scenedino_tpu.models.backbone_util import make_backbone
from scenedino_tpu.models.monodepth2 import Monodepth2


def test_monodepth2_multiscale_shapes():
    m = Monodepth2(d_out=32, scales=(0, 1, 2, 3))
    x = jax.random.uniform(jax.random.PRNGKey(0), (1, 3, 64, 128)) * 2 - 1
    params = m.init(jax.random.PRNGKey(1), x)
    outs = m.apply(params, x)
    assert len(outs) == 4
    assert outs[0].shape == (1, 32, 64, 128)
    assert outs[1].shape == (1, 32, 32, 64)
    assert outs[3].shape == (1, 32, 8, 16)
    for o in outs:
        assert np.all(np.isfinite(np.asarray(o)))


def test_convblock_reflection_padding_torch_parity():
    """ConvBlock must reproduce the reference's Conv3x3 reflection padding
    (prediction_heads/layers.py:35-48, use_refl=True) + ELU so converted
    monodepth2/S4C weights see identical border pixels."""
    import torch

    from scenedino_tpu.models.monodepth2 import ConvBlock

    rng = np.random.RandomState(3)
    x = rng.randn(2, 9, 13, 5).astype(np.float32)  # NHWC
    blk = ConvBlock(out=7)
    params = blk.init(jax.random.PRNGKey(0), jnp.asarray(x))
    ours = np.asarray(blk.apply(params, jnp.asarray(x)))

    kernel = np.asarray(params["params"]["Conv_0"]["kernel"])  # (3, 3, 5, 7)
    bias = np.asarray(params["params"]["Conv_0"]["bias"])
    tconv = torch.nn.Conv2d(5, 7, 3)
    with torch.no_grad():
        tconv.weight.copy_(torch.from_numpy(kernel.transpose(3, 2, 0, 1)))
        tconv.bias.copy_(torch.from_numpy(bias))
    tx = torch.from_numpy(x.transpose(0, 3, 1, 2))
    ref = torch.nn.functional.elu(tconv(torch.nn.ReflectionPad2d(1)(tx)))
    ref = ref.detach().numpy().transpose(0, 2, 3, 1)
    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)

    # zero padding would differ at the border — guard against regressions
    ref_zero = torch.nn.functional.elu(tconv(torch.nn.ZeroPad2d(1)(tx)))
    ref_zero = ref_zero.detach().numpy().transpose(0, 2, 3, 1)
    assert np.abs(ours - ref_zero).max() > 1e-4


def test_s4c_baseline_field_query():
    """The `-m s4c` model (factory.s4c_baseline_config): monodepth2
    encoder + 19-logit field head; query returns finite sigma + logits
    and the head folds into the fast SSC path."""
    from scenedino_tpu.models.factory import make_model, s4c_baseline_config
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.ops.fast_field import build_fast_state, fast_query_fused

    field = make_model(s4c_baseline_config())
    imgs = jax.random.uniform(jax.random.PRNGKey(0), (1, 1, 3, 16, 32)) * 2 - 1
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0.0, 0.0], [0.0, 2.3, 0.0], [0.0, 0.0, 1.0]]), (1, 1, 3, 3)
    )
    variables = field.init(
        {"params": jax.random.PRNGKey(1), "augment": jax.random.PRNGKey(2)},
        imgs, projs, poses, method=SceneField.warmup,
    )
    state = field.apply(variables, imgs, projs, poses, ids_encoder=(0,),
                        ids_render=(0,), method=SceneField.encode)
    xyz = jnp.asarray(np.random.RandomState(0).randn(1, 64, 3) * 3 + np.array([0, 0, 10.0]))
    _, _, sigma, logits = field.apply(variables, state, xyz, only_density=True)
    assert sigma.shape == (1, 64) and logits.shape == (1, 64, 19)
    assert np.all(np.isfinite(np.asarray(sigma))) and np.all(np.isfinite(np.asarray(logits)))

    fs = build_fast_state(variables, state, field.cfg)
    sigma_f, logits_f = fast_query_fused(fs, field.cfg, xyz[0], segments=4, band=8)
    np.testing.assert_allclose(np.asarray(sigma_f), np.asarray(sigma[0]), rtol=2e-2, atol=2e-2)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits[0]), rtol=5e-2, atol=5e-2)


def test_make_backbone_factory():
    m = make_backbone({"type": "monodepth2", "d_out": 16})
    assert m.latent_size == 16
    # ibrnet is a real legacy path since IBRNetWithNeuRay landed
    from scenedino_tpu.models.multi_view_head import IBRNetWithNeuRay

    ib = make_backbone({"type": "ibrnet", "att_feat": 8})
    assert isinstance(ib, IBRNetWithNeuRay)
    try:
        make_backbone({"type": "no_such_backbone"})
        assert False
    except NotImplementedError:
        pass
