"""Weight-converter parity tests: hand-built torch twins (timm semantics)
vs our flax modules after `convert_*`. Validates both the architecture and
the tensor-layout transforms so published checkpoints load correctly."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

# parity tests check architecture equivalence — run jax matmuls at full
# fp32 precision (the platform default is bf16-accumulated)
jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.models.dpt import DPTHead
from scenedino_tpu.models.heads import ResnetFC
from scenedino_tpu.models.vit import ViTConfig, VisionTransformer
from scenedino_tpu.utils import checkpoint as CK


# --------------------------------------------------------- torch mini-ViT
class TorchBlock(tnn.Module):
    """timm ViT block semantics: pre-LN, fused qkv, scaled dot attention."""

    def __init__(self, dim, heads, mlp_ratio=4.0, layerscale=False):
        super().__init__()
        self.norm1 = tnn.LayerNorm(dim, eps=1e-6)
        self.norm2 = tnn.LayerNorm(dim, eps=1e-6)
        self.attn_qkv = tnn.Linear(dim, 3 * dim)
        self.attn_proj = tnn.Linear(dim, dim)
        self.heads = heads
        self.mlp_fc1 = tnn.Linear(dim, int(dim * mlp_ratio))
        self.mlp_fc2 = tnn.Linear(int(dim * mlp_ratio), dim)
        self.ls1 = tnn.Parameter(torch.ones(dim) * 0.1) if layerscale else None
        self.ls2 = tnn.Parameter(torch.ones(dim) * 0.1) if layerscale else None

    def forward(self, x):
        B, N, C = x.shape
        H = self.heads
        h = self.norm1(x)
        qkv = self.attn_qkv(h).reshape(B, N, 3, H, C // H).permute(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]
        att = (q @ k.transpose(-2, -1)) * (C // H) ** -0.5
        att = att.softmax(-1)
        h = (att @ v).transpose(1, 2).reshape(B, N, C)
        h = self.attn_proj(h)
        if self.ls1 is not None:
            h = h * self.ls1
        x = x + h
        h = self.mlp_fc2(tF.gelu(self.mlp_fc1(self.norm2(x))))
        if self.ls2 is not None:
            h = h * self.ls2
        return x + h


class TorchViT(tnn.Module):
    def __init__(self, patch=8, dim=32, depth=3, heads=2, img=(16, 16), layerscale=False):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        self.cls_token = tnn.Parameter(torch.randn(1, 1, dim) * 0.02)
        n = (img[0] // patch) * (img[1] // patch)
        self.pos_embed = tnn.Parameter(torch.randn(1, 1 + n, dim) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock(dim, heads, layerscale=layerscale) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        B = x.shape[0]
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = torch.cat([self.cls_token.expand(B, -1, -1), x], 1)
        x = x + self.pos_embed
        inter = []
        for blk in self.blocks:
            x = blk(x)
            inter.append(x)
        x = self.norm(x)
        return x, inter


def test_vit_parity_with_torch():
    torch.manual_seed(0)
    tvit = TorchViT(patch=8, dim=32, depth=3, heads=2, img=(16, 24))
    sd = {f"m.{k}": v.detach().numpy() for k, v in tvit.state_dict().items()}
    # rename attn_qkv -> attn.qkv etc to match timm names the converter expects
    sd = {
        k.replace("attn_qkv", "attn.qkv").replace("attn_proj", "attn.proj")
        .replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2"): v
        for k, v in sd.items()
    }
    params = {"params": CK.convert_vit(sd, "m", depth=3)}

    cfg = ViTConfig(patch_size=8, width=32, depth=3, num_heads=2,
                    pos_embed_size=(16, 24), intermediate_layers=(0, 1))
    vit = VisionTransformer(cfg=cfg, want_key_features=False)

    x = np.random.RandomState(0).rand(2, 3, 16, 24).astype(np.float32)
    with torch.no_grad():
        t_out, t_inter = tvit(torch.tensor(x))
    t_feats = tF.normalize(t_out[:, 1:], p=2, dim=2).numpy()

    out = vit.apply(params, jnp.array(x))
    assert np.allclose(np.asarray(out["features_normalized"]), t_feats, atol=2e-5)
    assert np.allclose(
        np.asarray(out["intermediate_features.0"]), t_inter[0][:, 1:].numpy(), atol=2e-5
    )


def test_conv_transpose_parity():
    torch.manual_seed(1)
    tconv = tnn.ConvTranspose2d(6, 8, kernel_size=4, stride=4)
    sd = {f"c.{k}": v.detach().numpy() for k, v in tconv.state_dict().items()}
    p = CK.conv_transpose2d(sd, "c")
    x = np.random.RandomState(1).rand(1, 6, 5, 7).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x)).numpy()
    from flax import linen as fnn

    mod = fnn.ConvTranspose(8, (4, 4), strides=(4, 4), transpose_kernel=True)
    out = mod.apply({"params": p}, jnp.array(x).transpose(0, 2, 3, 1))
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


def test_conv2d_parity():
    torch.manual_seed(2)
    tconv = tnn.Conv2d(4, 5, 3, padding=1)
    sd = {f"c.{k}": v.detach().numpy() for k, v in tconv.state_dict().items()}
    p = CK.conv2d(sd, "c")
    x = np.random.RandomState(2).rand(2, 4, 6, 6).astype(np.float32)
    with torch.no_grad():
        ref = tconv(torch.tensor(x)).numpy()
    from flax import linen as fnn

    mod = fnn.Conv(5, (3, 3), padding=((1, 1), (1, 1)))
    out = mod.apply({"params": p}, jnp.array(x).transpose(0, 2, 3, 1))
    assert np.allclose(np.asarray(out).transpose(0, 3, 1, 2), ref, atol=1e-5)


class TorchResnetFC(tnn.Module):
    """Shipped-config head: lin_out(relu(lin_in(x))) (resnetfc.py, n_blocks=0)."""

    def __init__(self, d_in, d_hidden, d_out):
        super().__init__()
        self.lin_in = tnn.Linear(d_in, d_hidden)
        self.lin_out = tnn.Linear(d_hidden, d_out)

    def forward(self, x):
        return self.lin_out(tF.relu(self.lin_in(x)))


def test_resnetfc_parity():
    torch.manual_seed(3)
    thead = TorchResnetFC(20, 16, 5)
    sd = {f"h.{k}": v.detach().numpy() for k, v in thead.state_dict().items()}
    p = CK.convert_resnetfc(sd, "h", n_blocks=0)
    head = ResnetFC(d_out=5, n_blocks=0, d_hidden=16)
    x = np.random.RandomState(3).rand(7, 1, 20).astype(np.float32)
    with torch.no_grad():
        ref = thead(torch.tensor(x)).numpy()
    out = head.apply({"params": p}, jnp.array(x))
    assert np.allclose(np.asarray(out), ref, atol=1e-5)


def _torch_dpt_from_reference_arch(ch=(4, 4, 8, 8), d_out=8):
    """Build the reference DPTHead architecture in torch (dpt_head.py)."""

    class PRCU(tnn.Module):
        def __init__(s, c):
            super().__init__()
            s.conv1 = tnn.Conv2d(c, c, 3, padding=1)
            s.conv2 = tnn.Conv2d(c, c, 3, padding=1)

        def forward(s, x):
            h = s.conv1(tF.relu(x))
            h = s.conv2(tF.relu(h))
            return h + x

    class Fusion(tnn.Module):
        def __init__(s, c, first=False):
            super().__init__()
            s.project = tnn.Conv2d(c, c, 1)
            s.res_conv_unit2 = PRCU(c)
            if not first:
                s.res_conv_unit1 = PRCU(c)

        def forward(s, x, res=None):
            if res is not None:
                if res.shape != x.shape:
                    res = tF.interpolate(res, size=x.shape[2:], mode="bilinear", align_corners=False)
                x = x + s.res_conv_unit1(res)
            x = s.res_conv_unit2(x)
            x = tF.interpolate(x, scale_factor=2, mode="bilinear", align_corners=True)
            return s.project(x)

    class TorchDPT(tnn.Module):
        def __init__(s):
            super().__init__()
            cch = [min(d_out, c) for c in ch]
            s.reassemble_blocks = tnn.Module()
            s.reassemble_blocks.projects = tnn.ModuleList([tnn.Conv2d(12, c, 1) for c in cch])
            s.reassemble_blocks.resize_layers = tnn.ModuleList([
                tnn.ConvTranspose2d(cch[0], cch[0], 4, 4),
                tnn.ConvTranspose2d(cch[1], cch[1], 2, 2),
                tnn.Identity(),
                tnn.Conv2d(cch[3], cch[3], 3, stride=2, padding=1),
            ])
            s.convs = tnn.ModuleList([tnn.Conv2d(c, d_out, 3, padding=1, bias=False) for c in cch])
            s.fusion_blocks = tnn.ModuleList([Fusion(d_out, first=(i == 0)) for i in range(4)])
            s.project = tnn.Conv2d(d_out, d_out, 3, padding=1)
            s.output_head = tnn.Module()
            s.output_head.head_modules = tnn.ModuleList([
                tnn.Conv2d(d_out, d_out, 3, padding=1),
                tnn.ConvTranspose2d(d_out, d_out, 2, 2),
                tnn.Conv2d(d_out, d_out, 3, padding=1),
            ])

        def forward(s, inputs):
            x = [s.reassemble_blocks.projects[i](inp) for i, inp in enumerate(inputs)]
            x = [s.reassemble_blocks.resize_layers[i](xi) for i, xi in enumerate(x)]
            x = [s.convs[i](xi) for i, xi in enumerate(x)]
            out = s.fusion_blocks[0](x[-1])
            for i in range(1, 4):
                out = s.fusion_blocks[i](out, x[-(i + 1)])
            out = s.project(out)
            for m in s.output_head.head_modules:
                out = m(out)
            return out

    return TorchDPT()


def test_dpt_parity():
    torch.manual_seed(4)
    tdpt = _torch_dpt_from_reference_arch()
    sd = {f"d.{k}": v.detach().numpy() for k, v in tdpt.state_dict().items()}
    p = CK.convert_dpt(sd, "d")
    dpt = DPTHead(post_process_channels=(4, 4, 8, 8), d_out=8)
    gh, gw = 4, 6
    feats = [np.random.RandomState(i).rand(1, 12, gh, gw).astype(np.float32) for i in range(4)]
    with torch.no_grad():
        ref = tdpt([torch.tensor(f) for f in feats]).numpy()
    out = dpt.apply({"params": p}, [jnp.array(f) for f in feats])[0]
    assert out.shape == ref.shape
    assert np.allclose(np.asarray(out), ref, atol=1e-4), np.abs(np.asarray(out) - ref).max()


# ------------------------------------------------- SSL zoo (vit.py:192-591)
class TorchViTNoCls(tnn.Module):
    """timm ViT with class_token=False (Self-Patch / I-JEPA layout)."""

    def __init__(self, patch=8, dim=32, depth=2, heads=2, img=(16, 16)):
        super().__init__()
        self.patch_embed = tnn.Module()
        self.patch_embed.proj = tnn.Conv2d(3, dim, patch, patch)
        n = (img[0] // patch) * (img[1] // patch)
        self.pos_embed = tnn.Parameter(torch.randn(1, n, dim) * 0.02)
        self.blocks = tnn.ModuleList([TorchBlock(dim, heads) for _ in range(depth)])
        self.norm = tnn.LayerNorm(dim, eps=1e-6)

    def forward(self, x):
        x = self.patch_embed.proj(x).flatten(2).transpose(1, 2)
        x = x + self.pos_embed
        for blk in self.blocks:
            x = blk(x)
        return self.norm(x)


def test_vit_no_class_token_parity():
    """class_token=False path (Self-Patch vit.py:503-544, I-JEPA :547-591)."""
    torch.manual_seed(7)
    tvit = TorchViTNoCls(patch=8, dim=32, depth=2, heads=2, img=(16, 24))
    sd = {f"m.{k}": v.detach().numpy() for k, v in tvit.state_dict().items()}
    sd = {
        k.replace("attn_qkv", "attn.qkv").replace("attn_proj", "attn.proj")
        .replace("mlp_fc1", "mlp.fc1").replace("mlp_fc2", "mlp.fc2"): v
        for k, v in sd.items()
    }
    params = {"params": CK.convert_vit(sd, "m", depth=2, class_token=False)}
    cfg = ViTConfig(patch_size=8, width=32, depth=2, num_heads=2, class_token=False,
                    pos_embed_size=(16, 24), intermediate_layers=(0,))
    vit = VisionTransformer(cfg=cfg, want_key_features=False)
    x = np.random.RandomState(1).rand(2, 3, 16, 24).astype(np.float32)
    with torch.no_grad():
        t_out = tvit(torch.tensor(x))
    t_feats = tF.normalize(t_out, p=2, dim=2).numpy()
    out = vit.apply(params, jnp.array(x))
    assert out["features_normalized"].shape == t_feats.shape
    assert np.allclose(np.asarray(out["features_normalized"]), t_feats, atol=2e-5)


def test_adapt_vmae_state_dict():
    """vMAE surgery: pos-embed fold, tubelet collapse, q/k/v concat
    (vit.py:219-246)."""
    rs = np.random.RandomState(2)
    dim, n = 8, 6
    raw = {
        "pos_embed_spatial": rs.rand(1, n, dim).astype(np.float32),
        "pos_embed_temporal": rs.rand(1, 4, dim).astype(np.float32),
        "pos_embed_class": rs.rand(1, 1, dim).astype(np.float32),
        "patch_embed.proj.weight": rs.rand(dim, 3, 2, 4, 4).astype(np.float32),
        "patch_embed.proj.bias": rs.rand(dim).astype(np.float32),
    }
    for i in range(2):
        for name in ("q", "k", "v"):
            raw[f"blocks.{i}.attn.{name}.weight"] = rs.rand(dim, dim).astype(np.float32)
            raw[f"blocks.{i}.attn.{name}.bias"] = rs.rand(dim).astype(np.float32)
    sd = CK.adapt_ssl_state_dict("vmae_large", raw)
    expect_pos = raw["pos_embed_spatial"] + raw["pos_embed_temporal"].mean(1, keepdims=True)
    assert np.allclose(sd["pos_embed"][:, 1:], expect_pos)
    assert np.allclose(sd["pos_embed"][:, :1], raw["pos_embed_class"])
    assert sd["patch_embed.proj.weight"].shape == (dim, 3, 4, 4)
    np.testing.assert_allclose(
        sd["blocks.0.attn.qkv.weight"],
        np.concatenate([raw[f"blocks.0.attn.{m}.weight"] for m in "qkv"], 0),
    )
    assert "blocks.0.attn.q.weight" not in sd


def test_adapt_prefix_strip_state_dicts():
    """SynCLR / MoCo-v3 / MSN prefix handling (vit.py:420,449-453,485-488)."""
    w = np.zeros((2, 2), np.float32)
    synclr = CK.adapt_ssl_state_dict("synclr_base", {"module.visual.norm.weight": w, "module.other.x": w})
    assert list(synclr) == ["norm.weight"]
    moco = CK.adapt_ssl_state_dict(
        "mocov3_base",
        {"module.momentum_encoder.norm.weight": w, "module.momentum_encoder.head.0.weight": w,
         "module.base_encoder.norm.weight": w},
    )
    assert list(moco) == ["norm.weight"]
    msn = CK.adapt_ssl_state_dict("msn_base", {"module.norm.weight": w, "module.fc.weight": w})
    assert list(msn) == ["norm.weight"]


def test_ssl_presets_forward_smoke():
    """Zoo presets build and run (shrunk dims); fit3d routes like dinov2-reg."""
    from scenedino_tpu.models.vit import make_vit

    for name in ("self_patch_small", "i_jepa_huge", "mae_base", "vmae_large"):
        vit = make_vit(name, intermediate_layers=(0,),
                       overrides={"width": 16, "depth": 2, "num_heads": 2, "patch_size": 8})
        x = jnp.zeros((1, 3, 16, 24))
        out = vit.apply(vit.init(jax.random.PRNGKey(0), x), x)
        assert out["features_normalized"].shape == (1, 2 * 3, 16)

    from scenedino_tpu.models.encoder import DinoViTEncoder

    enc = DinoViTEncoder(backbone="vit-s", version="fit3d", image_size=(32, 32),
                         intermediate_features=(0,),
                         vit_overrides=(("width", 16), ("depth", 2), ("num_heads", 2)))
    assert enc.patch_size == 16
    x = jnp.zeros((1, 3, 32, 32))
    outs = enc.apply(enc.init(jax.random.PRNGKey(0), x), x)
    # 14/16 resize -> 28x28 input, patch 14 -> 2x2 grid
    assert outs[-1].shape == (1, 16, 2, 2)
