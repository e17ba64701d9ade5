"""LPIPS parity: flax module + converter vs a torch twin implementing the
lpips-package math (scaling layer, trunk taps, unit-normalize, 1x1 lin
heads, spatial average)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn
import torch.nn.functional as tF

jax.config.update("jax_default_matmul_precision", "highest")

from scenedino_tpu.eval.lpips import LPIPS, convert_lpips_state_dict


class TorchAlexLPIPS(tnn.Module):
    """lpips.LPIPS(net='alex') semantics with torchvision AlexNet.features."""

    def __init__(self):
        super().__init__()
        self.convs = tnn.ModuleList([
            tnn.Conv2d(3, 64, 11, 4, 2),
            tnn.Conv2d(64, 192, 5, 1, 2),
            tnn.Conv2d(192, 384, 3, 1, 1),
            tnn.Conv2d(384, 256, 3, 1, 1),
            tnn.Conv2d(256, 256, 3, 1, 1),
        ])
        self.lins = tnn.ParameterList([
            tnn.Parameter(torch.rand(c)) for c in (64, 192, 384, 256, 256)
        ])
        self.register_buffer("shift", torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1))
        self.register_buffer("scale", torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1))

    def feats(self, x):
        x = (x - self.shift) / self.scale
        taps = []
        x = tF.relu(self.convs[0](x))
        taps.append(x)
        x = tF.max_pool2d(x, 3, 2)
        x = tF.relu(self.convs[1](x))
        taps.append(x)
        x = tF.max_pool2d(x, 3, 2)
        for conv in self.convs[2:]:
            x = tF.relu(conv(x))
            taps.append(x)
        return taps

    def forward(self, x, y):
        total = 0.0
        for fx, fy, w in zip(self.feats(x), self.feats(y), self.lins):
            fx = fx / (fx.norm(dim=1, keepdim=True) + 1e-10)
            fy = fy / (fy.norm(dim=1, keepdim=True) + 1e-10)
            d = (fx - fy) ** 2
            total = total + (d * w.view(1, -1, 1, 1)).sum(1).mean((1, 2))
        return total


def test_lpips_alex_parity():
    torch.manual_seed(0)
    twin = TorchAlexLPIPS()

    # assemble a published-style state dict: torchvision sequential indices
    # for the trunk + lin{k}.model.1.weight heads
    sd = {}
    for j, i in enumerate((0, 3, 6, 8, 10)):
        sd[f"net.{i}.weight"] = twin.convs[j].weight.detach().numpy()
        sd[f"net.{i}.bias"] = twin.convs[j].bias.detach().numpy()
    for k in range(5):
        sd[f"lin{k}.model.1.weight"] = twin.lins[k].detach().numpy().reshape(1, -1, 1, 1)

    params = convert_lpips_state_dict(sd, net="alex")
    model = LPIPS(net="alex")

    rs = np.random.RandomState(1)
    x = (rs.rand(2, 3, 64, 96).astype(np.float32)) * 2 - 1
    y = (rs.rand(2, 3, 64, 96).astype(np.float32)) * 2 - 1
    with torch.no_grad():
        ref = twin(torch.tensor(x), torch.tensor(y)).numpy()
    out = np.asarray(model.apply({"params": params}, jnp.array(x), jnp.array(y)))
    assert out.shape == ref.shape
    np.testing.assert_allclose(out, ref, rtol=2e-4, atol=2e-5)
    # identical inputs -> zero distance
    zero = np.asarray(model.apply({"params": params}, jnp.array(x), jnp.array(x)))
    np.testing.assert_allclose(zero, 0.0, atol=1e-6)


def test_lpips_vgg_builds_and_converts():
    """VGG16 trunk: converter covers all 13 convs; forward runs."""
    rs = np.random.RandomState(2)
    sd = {}
    vgg_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512]
    outs = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for j, i in enumerate(vgg_idx):
        sd[f"net.{i}.weight"] = rs.randn(outs[j], chans[j], 3, 3).astype(np.float32) * 0.05
        sd[f"net.{i}.bias"] = np.zeros(outs[j], np.float32)
    for k, c in enumerate((64, 128, 256, 512, 512)):
        sd[f"lins.{k}.model.1.weight"] = rs.rand(1, c, 1, 1).astype(np.float32)
    params = convert_lpips_state_dict(sd, net="vgg")
    model = LPIPS(net="vgg")
    x = jnp.zeros((1, 3, 64, 64))
    y = jnp.ones((1, 3, 64, 64)) * 0.5
    d = np.asarray(model.apply({"params": params}, x, y))
    assert d.shape == (1,) and np.isfinite(d).all() and d[0] > 0


def test_load_lpips_gates_on_missing_weights():
    from scenedino_tpu.eval.lpips import load_lpips

    with pytest.raises(FileNotFoundError):
        load_lpips("/nonexistent/lpips_alex.pt")


def test_nvs_metrics_with_lpips_hook():
    from scenedino_tpu.training.validation import compute_nvs_metrics

    rs = np.random.RandomState(3)
    data = {
        "rgb": rs.rand(1, 2, 32, 48, 1, 3).astype(np.float32),
        "imgs_gt": rs.rand(1, 2, 3, 32, 48).astype(np.float32),
    }
    m = compute_nvs_metrics(data)
    assert set(m) == {"psnr", "ssim"} and np.isfinite(m["psnr"])

    calls = {}

    def fake_lpips(p, g):
        calls["shapes"] = (p.shape, g.shape)
        return jnp.zeros((p.shape[0],))

    m = compute_nvs_metrics(data, lpips_fn=fake_lpips)
    assert m["lpips"] == 0.0
    # 5% crop applied before LPIPS
    assert calls["shapes"][0][-2:] == (28, 42)


def test_lpips_vgg_converter_accepts_sliced_schema():
    """The lpips package exports vgg trunk keys as net.slice{s}.{i}.*
    (convs 0,2|5,7|10,12,14|17,19,21|24,26,28) — the converter must find
    them under the real slice numbers."""
    rs = np.random.RandomState(4)
    sd = {}
    vgg_idx = (0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28)
    vgg_slice = (1, 1, 2, 2, 3, 3, 3, 4, 4, 4, 5, 5, 5)
    chans = [3, 64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512]
    outs = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
    for j, (i, sl) in enumerate(zip(vgg_idx, vgg_slice)):
        sd[f"net.slice{sl}.{i}.weight"] = rs.randn(outs[j], chans[j], 3, 3).astype(np.float32) * 0.05
        sd[f"net.slice{sl}.{i}.bias"] = np.zeros(outs[j], np.float32)
    for k, c in enumerate((64, 128, 256, 512, 512)):
        sd[f"lin{k}.model.1.weight"] = rs.rand(1, c, 1, 1).astype(np.float32)
    params = convert_lpips_state_dict(sd, net="vgg")
    model = LPIPS(net="vgg")
    d = np.asarray(model.apply({"params": params}, jnp.zeros((1, 3, 64, 64)),
                               jnp.ones((1, 3, 64, 64)) * 0.3))
    assert d.shape == (1,) and np.isfinite(d).all()
