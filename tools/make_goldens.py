"""Generate committed golden fixtures for converter/numerics parity.

Builds tiny torch twins with *timm/reference semantics* (same architectures
as tests/test_interop.py), runs them on fixed inputs, and stores
(state_dict with reference key names, input, output) into
tests/goldens/*.npz. The paired test (tests/test_goldens.py) converts the
state dict with scenedino_tpu.utils.checkpoint and checks the flax modules
reproduce the stored activations — torch is NOT needed at test time, so
parity keeps being verified in torch-free environments.

Run once (and re-run only if the twin architectures change):
    python tools/make_goldens.py
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))

import torch
import torch.nn.functional as tF

from test_interop import TorchViT, TorchResnetFC, _torch_dpt_from_reference_arch

OUT = os.path.join(os.path.dirname(__file__), "..", "tests", "goldens")


def _sd(model, rename=()):
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    for old, new in rename:
        sd = {k.replace(old, new): v for k, v in sd.items()}
    return sd


def save(name, **arrays):
    path = os.path.join(OUT, f"{name}.npz")
    np.savez_compressed(path, **arrays)
    print(f"wrote {path} ({os.path.getsize(path) / 1024:.1f} KiB)")


def main():
    os.makedirs(OUT, exist_ok=True)

    # ---- ViT (timm DINO-v1 semantics) ----
    torch.manual_seed(0)
    tvit = TorchViT(patch=8, dim=32, depth=3, heads=2, img=(16, 24))
    x = np.random.RandomState(0).rand(2, 3, 16, 24).astype(np.float32)
    with torch.no_grad():
        out, inter = tvit(torch.tensor(x))
    feats = tF.normalize(out[:, 1:], p=2, dim=2).numpy()
    sd = _sd(tvit, rename=[("attn_qkv", "attn.qkv"), ("attn_proj", "attn.proj"),
                           ("mlp_fc1", "mlp.fc1"), ("mlp_fc2", "mlp.fc2")])
    save("vit_dino_tiny",
         input=x, features_normalized=feats,
         intermediate_0=inter[0][:, 1:].numpy(), intermediate_1=inter[1][:, 1:].numpy(),
         **{f"sd.{k}": v for k, v in sd.items()})

    # ---- DPT head (reference dpt_head.py semantics) ----
    torch.manual_seed(4)
    tdpt = _torch_dpt_from_reference_arch()
    feats_in = [np.random.RandomState(i).rand(1, 12, 4, 6).astype(np.float32) for i in range(4)]
    with torch.no_grad():
        dpt_out = tdpt([torch.tensor(f) for f in feats_in]).numpy()
    save("dpt_tiny",
         output=dpt_out,
         **{f"input_{i}": f for i, f in enumerate(feats_in)},
         **{f"sd.{k}": v for k, v in _sd(tdpt).items()})

    # ---- ResnetFC shipped head (n_blocks=0) ----
    torch.manual_seed(3)
    thead = TorchResnetFC(20, 16, 5)
    hx = np.random.RandomState(3).rand(7, 1, 20).astype(np.float32)
    with torch.no_grad():
        h_out = thead(torch.tensor(hx)).numpy()
    save("resnetfc_tiny", input=hx, output=h_out,
         **{f"sd.{k}": v for k, v in _sd(thead).items()})


if __name__ == "__main__":
    main()
