"""Parity tests for the legacy multi-view attention heads.

The attention stack is compared against REAL `torch.nn.TransformerEncoder`
modules (torch-cpu is available) with copied weights — including the
reference's float 0/1 key-padding-mask semantics (additive logit bias,
multi_view_head.py:139-151). The IBR custom layer and the NeuRay core are
compared against torch twins re-expressing mlp.py:302-616 /
independent_tokens.py:77-240.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from scenedino_tpu.models.heads import make_head
from scenedino_tpu.models.multi_view_head import (
    AttnStack,
    DataViewIndependentToken,
    IBRNetWithNeuRay,
    MultiViewHead,
    MultiViewHead2,
    MultiViewHead3,
    SimpleMultiViewHead,
    TorchEncoderLayer,
)

D = 16
HEADS = 4


def _t2j(t):
    return jnp.asarray(t.detach().numpy())


def _copy_torch_layer(layer: torch.nn.TransformerEncoderLayer):
    """torch TransformerEncoderLayer state -> our TorchEncoderLayer params."""
    sd = layer.state_dict()
    return {
        "in_proj": {
            "kernel": _t2j(sd["self_attn.in_proj_weight"]).T,
            "bias": _t2j(sd["self_attn.in_proj_bias"]),
        },
        "out_proj": {
            "kernel": _t2j(sd["self_attn.out_proj.weight"]).T,
            "bias": _t2j(sd["self_attn.out_proj.bias"]),
        },
        "linear1": {"kernel": _t2j(sd["linear1.weight"]).T, "bias": _t2j(sd["linear1.bias"])},
        "linear2": {"kernel": _t2j(sd["linear2.weight"]).T, "bias": _t2j(sd["linear2.bias"])},
        "norm1": {"scale": _t2j(sd["norm1.weight"]), "bias": _t2j(sd["norm1.bias"])},
        "norm2": {"scale": _t2j(sd["norm2.weight"]), "bias": _t2j(sd["norm2.bias"])},
    }


@pytest.mark.parametrize("mask_kind", ["none", "float01"])
def test_torch_encoder_layer_parity(mask_kind):
    torch.manual_seed(0)
    tl = torch.nn.TransformerEncoderLayer(
        D, HEADS, dim_feedforward=D, batch_first=True, dropout=0.0
    ).eval()
    x = torch.randn(7, 5, D)
    if mask_kind == "none":
        mask_t, mask_j = None, None
    else:
        # the reference passes FLOAT 0/1 invalidity as src_key_padding_mask
        # (multi_view_head.py:139-151) — on torch's SLOW path (training /
        # grads enabled, i.e. how the reference trains these heads) the
        # float mask is ADDED to attention logits; the eval+no_grad
        # fastpath instead treats nonzero as -inf. We match the
        # training-time (slow-path) semantics, so run torch with grads.
        mask_t = (torch.rand(7, 5) < 0.4).float()
        mask_t[:, 0] = 0.0
        mask_j = jnp.asarray(mask_t.numpy())
    x = x.requires_grad_(True)  # force the torch slow path (see above)
    ref = tl(x, src_key_padding_mask=mask_t).detach().numpy()

    ours = TorchEncoderLayer(D, HEADS, D).apply(
        {"params": _copy_torch_layer(tl)}, jnp.asarray(x.detach().numpy()), mask_j
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_attn_stack_matches_torch_transformer_encoder():
    torch.manual_seed(1)
    layer = torch.nn.TransformerEncoderLayer(
        D, HEADS, dim_feedforward=D, batch_first=True, dropout=0.0
    )
    enc = torch.nn.TransformerEncoder(layer, num_layers=3).eval()
    x = torch.randn(6, 4, D).requires_grad_(True)  # slow path (see above)
    mask = (torch.rand(6, 4) < 0.3).float()
    mask[:, 0] = 0.0
    ref = enc(x, src_key_padding_mask=mask).detach().numpy()

    params = {f"layer_{i}": _copy_torch_layer(enc.layers[i]) for i in range(3)}
    ours = AttnStack(D, 3, HEADS, "torch").apply(
        {"params": params}, jnp.asarray(x.detach().numpy()), jnp.asarray(mask.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=5e-5)


class _TorchIBRLayer(torch.nn.Module):
    """Twin of mlp.py EncoderLayer:555 (post-LN, bias-free qkv, symmetric
    -1e9 mask) re-expressed for the parity check."""

    def __init__(self, d, heads):
        super().__init__()
        # reference make_attn_layers builds mlp.EncoderLayer(ndim, ndim,
        # n_heads, ndim, ndim): d_k = d_v = d_model (FULL width per head)
        self.h, self.dk = heads, d
        self.w_qs = torch.nn.Linear(d, heads * d, bias=False)
        self.w_ks = torch.nn.Linear(d, heads * d, bias=False)
        self.w_vs = torch.nn.Linear(d, heads * d, bias=False)
        self.fc = torch.nn.Linear(heads * d, d, bias=False)
        self.ln1 = torch.nn.LayerNorm(d, eps=1e-6)
        self.w_1 = torch.nn.Linear(d, d)
        self.w_2 = torch.nn.Linear(d, d)
        self.ln2 = torch.nn.LayerNorm(d, eps=1e-6)

    def forward(self, x, mask):
        b, s, d = x.shape
        q = self.w_qs(x).view(b, s, self.h, self.dk).transpose(1, 2)
        k = self.w_ks(x).view(b, s, self.h, self.dk).transpose(1, 2)
        v = self.w_vs(x).view(b, s, self.h, self.dk).transpose(1, 2)
        attn = q @ k.transpose(2, 3) / self.dk**0.5
        m = mask.unsqueeze(1).unsqueeze(-1).expand(-1, self.h, -1, s)
        m = 1.0 - (1.0 - m) * (1.0 - m.transpose(-2, -1))
        attn = attn.masked_fill(m == 1, -1e9)
        out = (attn.softmax(-1) @ v).transpose(1, 2).reshape(b, s, self.h * self.dk)
        x = self.ln1(x + self.fc(out))
        return self.ln2(x + self.w_2(torch.relu(self.w_1(x))))


def test_ibr_encoder_layer_parity():
    torch.manual_seed(2)
    tw = _TorchIBRLayer(D, HEADS).eval()
    x = torch.randn(5, 4, D)
    mask = (torch.rand(5, 4) < 0.3).float()
    mask[:, 0] = 0.0
    with torch.no_grad():
        ref = tw(x, mask).numpy()

    params = {
        "layer_0": {
            "w_qs": {"kernel": _t2j(tw.w_qs.weight).T},
            "w_ks": {"kernel": _t2j(tw.w_ks.weight).T},
            "w_vs": {"kernel": _t2j(tw.w_vs.weight).T},
            "fc": {"kernel": _t2j(tw.fc.weight).T},
            "attn_norm": {"scale": _t2j(tw.ln1.weight), "bias": _t2j(tw.ln1.bias)},
            "w_1": {"kernel": _t2j(tw.w_1.weight).T, "bias": _t2j(tw.w_1.bias)},
            "w_2": {"kernel": _t2j(tw.w_2.weight).T, "bias": _t2j(tw.w_2.bias)},
            "ffn_norm": {"scale": _t2j(tw.ln2.weight), "bias": _t2j(tw.ln2.bias)},
        }
    }
    ours = AttnStack(D, 1, HEADS, "ibr").apply(
        {"params": params}, jnp.asarray(x.numpy()), jnp.asarray(mask.numpy())
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_data_view_independent_token_closed_form():
    # mean/var of valid views -> ELU(linear): check against numpy closed form
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (10, 3, D))
    inv = jnp.zeros((10, 3), bool).at[:, 2].set(True)
    tok = DataViewIndependentToken(D)
    params = tok.init(key, x, invalid_features=inv)
    out = tok.apply(params, x, invalid_features=inv)
    assert out.shape == (10, 1, D)

    m = np.asarray(~inv, np.float32)
    w = m / (m.sum(-1, keepdims=True) + 1e-8)
    mean = (np.asarray(x) * w[..., None]).sum(-2, keepdims=True)
    var = (w[..., None] * (np.asarray(x) - mean) ** 2).sum(-2, keepdims=True)
    kern = np.asarray(params["params"]["layer"]["kernel"])
    bias = np.asarray(params["params"]["layer"]["bias"])
    pre = np.concatenate([mean, var], -1) @ kern + bias
    ref = np.where(pre > 0, pre, np.expm1(pre))
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)


@pytest.mark.parametrize(
    "head_conf",
    [
        {
            "type": "MultiViewHead",
            "args": {
                "embedding_encoder": {"type": "ff", "d_out": D},
                "attn_layers": {"n_layers": 2, "n_heads": 4},
                "independent_token": {"type": "FixedViewIndependentToken"},
            },
        },
        {
            "type": "MultiViewHead",
            "args": {
                "embedding_encoder": {"type": "pwf", "d_out": D},
                "attn_layers": {"n_layers": 1, "n_heads": 4, "IBRAttn": True},
                "independent_token": {"type": "DataViewIndependentToken"},
            },
        },
        {"type": "SimpleMultiViewHead", "args": {"mlp": {"args": {"n_blocks": 1, "d_hidden": 24}}}},
        {
            "type": "MultiViewHead2",
            "args": {
                "mlp": {"args": {"n_blocks": 1, "d_hidden": 24}},
                "mlp2": {"d_in": 20, "args": {"n_blocks": 0, "d_hidden": 24}},
                "attn_layers": {"n_layers": 1, "n_heads": 4},
                "independent_token": {"type": "FixedViewIndependentToken"},
            },
        },
        {
            "type": "MultiViewHead2",
            "args": {
                "mlp": {"args": {"n_blocks": 1, "d_hidden": 24}},
                "mlp2": None,
                "attn_layers": None,
                "independent_token": None,
            },
        },
        {
            "type": "MultiViewHead3",
            "args": {
                "mlp": {"args": {"n_blocks": 1, "d_hidden": 24}},
                "mlp2": {"d_in": 12, "args": {"n_blocks": 0, "d_hidden": 24}},
            },
        },
    ],
)
def test_head_shapes_and_mask_effect(head_conf):
    """Every legacy head follows the bts.py:502-521 protocol: (..., V, C)
    features + (..., V) invalidity -> (..., 1, d_out); flipping a view's
    validity changes the output (the mask is actually consumed)."""
    head = make_head(dict(head_conf), 2 * D, 5)
    key = jax.random.PRNGKey(3)
    feats = jax.random.normal(key, (6, 4, 2 * D))
    inv = jnp.zeros((6, 4), bool).at[:, 3].set(True)
    params = head.init(key, feats, invalid_features=inv)
    out = head.apply(params, feats, invalid_features=inv)
    assert out.shape == (6, 1, 5)
    assert bool(jnp.all(jnp.isfinite(out)))

    out2 = head.apply(params, feats, invalid_features=jnp.zeros((6, 4), bool))
    assert not np.allclose(np.asarray(out), np.asarray(out2))


def test_multi_view_head_in_field_query():
    """A SceneField built with a MultiViewHead head (2 encode views, the
    bts.py:502-521 protocol) renders finite sigma/dino."""
    from scenedino_tpu.models import EncoderDummy, FieldConfig, SceneField

    cfg = FieldConfig(dino_dims=8, z_near=3.0, z_far=80.0)
    enc = EncoderDummy(size=(16, 24), feat_dim=D, latent_size=D)
    head_conf = {
        "type": "MultiViewHead",
        "args": {
            "embedding_encoder": {"type": "ffh", "d_out": D},
            "attn_layers": {"n_layers": 1, "n_heads": 4},
            "independent_token": {"type": "FixedViewIndependentToken"},
        },
    }
    field = SceneField(encoder=enc, cfg=cfg, head_confs=(("normal_head", head_conf),))
    key = jax.random.PRNGKey(0)
    imgs = jax.random.uniform(key, (1, 2, 3, 16, 24)) * 2 - 1
    ks = jnp.broadcast_to(
        jnp.array([[1.5, 0, 0], [0, 2.25, 0], [0, 0, 1.0]]), (1, 2, 3, 3)
    )
    poses = jnp.broadcast_to(jnp.eye(4), (1, 2, 4, 4))
    poses = poses.at[:, 1, 0, 3].set(0.2)
    params = field.init(key, imgs, ks, poses, ids_encoder=(0, 1), method=SceneField.encode)
    state = field.apply(params, imgs, ks, poses, ids_encoder=(0, 1), method=SceneField.encode)
    xyz = jnp.array([[[0.0, 0.0, 10.0], [0.5, 0.2, 30.0], [0.1, -0.1, 50.0], [0, 0, 5.0]]])
    pq = field.init(jax.random.PRNGKey(2), state, xyz)
    merged = {"params": {**params.get("params", {}), **pq["params"]}}
    rgb, invalid, sigma, dino = field.apply(merged, state, xyz)
    assert sigma.shape == (1, 4)
    assert dino.shape == (1, 4, 8)
    assert bool(jnp.all(jnp.isfinite(sigma)))


def test_view_dropout_train_vs_eval():
    """dropout_views_rate only acts in training mode and keeps view 0 when
    do_mvh (multi_view_head.py:98-107)."""
    head = MultiViewHead(
        d_in=D, d_out=2, d_enc=D, emb_encoder="ffh",
        n_attn_layers=1, dropout_views_rate=0.5, do_mvh=True,
    )
    key = jax.random.PRNGKey(4)
    feats = jax.random.normal(key, (8, 4, D))
    inv = jnp.zeros((8, 4), bool)
    params = head.init({"params": key, "dropout": key}, feats, invalid_features=inv)
    out_eval1 = head.apply(params, feats, invalid_features=inv, deterministic=True)
    out_eval2 = head.apply(params, feats, invalid_features=inv, deterministic=True)
    np.testing.assert_allclose(np.asarray(out_eval1), np.asarray(out_eval2))
    out_tr = head.apply(
        params, feats, invalid_features=inv, deterministic=False,
        rngs={"dropout": jax.random.PRNGKey(9)},
    )
    assert not np.allclose(np.asarray(out_eval1), np.asarray(out_tr))


class _TorchNeuRayCore(torch.nn.Module):
    """Twin of ibrnet.py:243-403 forward (anti_alias_pooling=False)."""

    def __init__(self, in_ch=8, att=6, rbs=16, neuray_dim=5):
        super().__init__()
        act = torch.nn.ELU()
        self.ray_dir_fc = torch.nn.Sequential(
            torch.nn.Linear(4, 16), act, torch.nn.Linear(16, in_ch), act
        )
        self.base_fc = torch.nn.Sequential(
            torch.nn.Linear(in_ch * 5 + neuray_dim, 64), act, torch.nn.Linear(64, 32), act
        )
        self.vis_fc = torch.nn.Sequential(
            torch.nn.Linear(32, 32), act, torch.nn.Linear(32, 33), act
        )
        self.vis_fc2 = torch.nn.Sequential(
            torch.nn.Linear(32, 32), act, torch.nn.Linear(32, 1), torch.nn.Sigmoid()
        )
        self.geometry_fc = torch.nn.Sequential(
            torch.nn.Linear(65, att * 2), act, torch.nn.Linear(att * 2, att), act
        )
        self.neuray_fc = torch.nn.Sequential(
            torch.nn.Linear(neuray_dim, 8), act, torch.nn.Linear(8, 1)
        )
        self.img_feat2low = torch.nn.Sequential(
            torch.nn.Linear(rbs, rbs // 4), act, torch.nn.Linear(rbs // 4, in_ch)
        )

    def forward(self, rgb_feat, neuray_feat, ray_diff, mask):
        def fmv(x, w):
            mean = (x * w).sum(-2, keepdim=True)
            var = (w * (x - mean) ** 2).sum(-2, keepdim=True)
            return mean, var

        nv = rgb_feat.shape[2]
        rgb_feat = self.img_feat2low(rgb_feat) + self.ray_dir_fc(ray_diff)
        weight = mask / (mask.sum(2, keepdim=True) + 1e-8)
        w0 = torch.sigmoid(self.neuray_fc(neuray_feat)) * weight
        m0, v0 = fmv(rgb_feat, w0)
        m1, v1 = fmv(rgb_feat, weight)
        g = torch.cat([m0, v0, m1, v1], -1)
        x = self.base_fc(torch.cat([g.expand(-1, -1, nv, -1), rgb_feat, neuray_feat], -1))
        xv = self.vis_fc(x * weight)
        x_res, vis = xv[..., :-1], torch.sigmoid(xv[..., -1:]) * mask
        x = x + x_res
        vis = self.vis_fc2(x * vis) * mask
        weight = vis / (vis.sum(2, keepdim=True) + 1e-8)
        mean, var = fmv(x, weight)
        g = torch.cat([mean.squeeze(2), var.squeeze(2), weight.mean(2)], -1)
        return self.geometry_fc(g)


def _copy_seq(seq, names):
    """torch Sequential linear weights -> our mlp naming (name_0, name_1)."""
    out = {}
    idx = 0
    for m in seq:
        if isinstance(m, torch.nn.Linear):
            out[f"{names}_{idx}"] = {"kernel": _t2j(m.weight).T, "bias": _t2j(m.bias)}
            idx += 1
    return out


def test_ibrnet_with_neuray_parity():
    torch.manual_seed(5)
    tw = _TorchNeuRayCore().eval()
    R, S, V = 3, 4, 5
    rgb_feat = torch.randn(R, S, V, 16)
    neuray = torch.randn(R, S, V, 5)
    ray_diff = torch.randn(R, S, V, 4)
    mask = (torch.rand(R, S, V, 1) > 0.2).float()
    mask[..., 0, :] = 1.0
    with torch.no_grad():
        ref = tw(rgb_feat, neuray, ray_diff, mask).numpy()

    core = {}
    for nm in ("ray_dir_fc", "base_fc", "vis_fc", "vis_fc2", "geometry_fc", "neuray_fc"):
        core.update(_copy_seq(getattr(tw, nm), nm))
    params = {
        "params": {
            "img_feat2low_0": {
                "kernel": _t2j(tw.img_feat2low[0].weight).T,
                "bias": _t2j(tw.img_feat2low[0].bias),
            },
            "img_feat2low_1": {
                "kernel": _t2j(tw.img_feat2low[2].weight).T,
                "bias": _t2j(tw.img_feat2low[2].bias),
            },
            "core": core,
        }
    }
    model = IBRNetWithNeuRay(in_feat_ch=8, att_feat=6, rbs=16, neuray_in_dim=5)
    ours = model.apply(
        params, _t2j(rgb_feat), _t2j(neuray), _t2j(ray_diff), _t2j(mask)
    )
    np.testing.assert_allclose(np.asarray(ours), ref, atol=2e-5)


def test_neuray_independent_token_shapes():
    from scenedino_tpu.models.multi_view_head import NeuRayIndependentToken

    K, V = 4, 3
    N = 2 * K  # 2 rays
    tok = NeuRayIndependentToken(n_points_per_ray=K, d_model=6, in_feat_ch=8, rbs=16)
    key = jax.random.PRNGKey(6)
    vt = jax.random.normal(key, (N, V, 6))
    bf = jax.random.normal(key, (N, V, 16))
    rd = jax.random.normal(key, (N, V, 4))
    inv = jnp.zeros((N, V), bool).at[:, 2].set(True)
    params = tok.init(key, vt, bottleneck_feats=bf, ray_diff=rd, invalid_features=inv)
    out = tok.apply(params, vt, bottleneck_feats=bf, ray_diff=rd, invalid_features=inv)
    assert out.shape == (N, 1, 6)
    assert bool(jnp.all(jnp.isfinite(out)))
