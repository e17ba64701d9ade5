"""Real-weight parity gate + golden generator (VERDICT r2 next #3).

This box has no timm/torchvision/egress, so all shipped parity tests run
against hand-built twins. THIS tool is the one command that stands ready
for a box that has the real packages: it downloads NOTHING, loads a
user-supplied checkpoint file into the REAL upstream model
(timm VisionTransformer / torchvision raft_large / pip lpips), runs our
converter + flax module on the same fixed inputs, prints a PASS/FAIL
parity gate, and writes the upstream activations as .npz goldens so the
test suite can replay them offline forever after.

Usage (each subcommand refuses cleanly when its package is missing):

  # DINO v1 teacher (timm): vit_base_patch8_224.dino etc.
  python tools/make_real_goldens.py vit \
      --model vit_base_patch8_224.dino --checkpoint /path/weights.pth \
      [--out tests/goldens/real]

  # DINOv2(+reg) via timm names vit_base_patch14_dinov2.lvd142m /
  # vit_base_patch14_reg4_dinov2.lvd142m
  python tools/make_real_goldens.py vit \
      --model vit_base_patch14_reg4_dinov2.lvd142m --checkpoint ...

  # torchvision RAFT-large (Raft_Large_Weights file)
  python tools/make_real_goldens.py raft --checkpoint /path/raft_large.pth

  # published SceneDINO checkpoint.pt end-to-end (field encode+query)
  python tools/make_real_goldens.py scenedino --checkpoint /path/checkpoint.pt

Reference paths being gated: scenedino/models/backbones/dino/vit.py:15-63
(timm.create_model), common/image_processor.py (torchvision RAFT),
download_checkpoint.py (published checkpoints).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import numpy as np

# timm model name -> (our preset, input grid the pos-embed was trained at)
TIMM_PRESETS = {
    "vit_small_patch8_224.dino": "dino_small8",
    "vit_small_patch16_224.dino": "dino_small16",
    "vit_base_patch8_224.dino": "dino_base8",
    "vit_base_patch16_224.dino": "dino_base16",
    "vit_small_patch14_dinov2.lvd142m": "dinov2_small",
    "vit_base_patch14_dinov2.lvd142m": "dinov2_base",
    "vit_small_patch14_reg4_dinov2.lvd142m": "dinov2_reg_small",
    "vit_base_patch14_reg4_dinov2.lvd142m": "dinov2_reg_base",
}


def _gate(name, ours, ref, atol, report):
    err = float(np.max(np.abs(np.asarray(ours) - np.asarray(ref))))
    ok = err <= atol
    report.append((name, err, atol, ok))
    return ok


def _print_report(report):
    all_ok = all(ok for _, _, _, ok in report)
    for name, err, atol, ok in report:
        print(f"  {'PASS' if ok else 'FAIL'}  {name}: max |delta| {err:.3e} (atol {atol:g})")
    print("PARITY GATE:", "PASS" if all_ok else "FAIL")
    return 0 if all_ok else 1


def run_vit(args):
    try:
        import timm
        import torch
    except ImportError as e:
        raise SystemExit(f"timm/torch required for the vit gate: {e}")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from scenedino_tpu.models.vit import VIT_PRESETS, make_vit
    from scenedino_tpu.utils import checkpoint as CK

    preset = TIMM_PRESETS.get(args.model)
    if preset is None:
        raise SystemExit(f"unknown timm model {args.model!r}; known: {sorted(TIMM_PRESETS)}")
    cfg = VIT_PRESETS[preset]

    model = timm.create_model(args.model, pretrained=False, dynamic_img_size=False)
    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    missing, unexpected = model.load_state_dict(sd, strict=False)
    if missing:
        print(f"note: {len(missing)} keys missing from checkpoint: {missing[:4]}...")
    model.eval()

    # fixed input at the model's native grid — no runtime pos-embed resize,
    # so the gate isolates the block/token semantics; the resize itself is
    # twin-tested in tests/test_timm_fidelity.py
    side = cfg.pos_embed_size[0]
    rng = np.random.RandomState(0)
    x = rng.rand(1, 3, side, side).astype(np.float32)

    depth = cfg.depth
    taps = {}
    hooks = []
    for i in (depth // 4, depth // 2, depth - 1):
        hooks.append(model.blocks[i].register_forward_hook(
            lambda m, inp, out, i=i: taps.__setitem__(i, out.detach())))
    with torch.no_grad():
        t_final = model.forward_features(torch.tensor(x))
    for h in hooks:
        h.remove()

    sd_np = {f"m.{k}": v.detach().numpy() for k, v in model.state_dict().items()}
    params = {"params": CK.convert_vit(
        sd_np, "m", depth=depth, num_registers=cfg.num_registers,
        layerscale=cfg.layerscale, class_token=cfg.class_token,
    )}
    inter_layers = (depth // 4, depth // 2)
    vit = make_vit(preset, intermediate_layers=inter_layers, want_key_features=False)
    ours = vit.apply(params, jnp.asarray(x))

    T = cfg.num_prefix_tokens
    report = []
    tf = t_final[:, T:]
    tf = (tf / tf.norm(dim=-1, keepdim=True)).numpy()
    _gate("features_normalized", ours["features_normalized"], tf, args.atol, report)
    goldens = {"input": x, "features_normalized": tf}
    for j, i in enumerate(inter_layers):
        ref = taps[i][:, T:].numpy()
        _gate(f"blocks.{i}", ours[f"intermediate_features.{j}"], ref, args.atol, report)
        goldens[f"blocks.{i}"] = ref

    if args.out:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, f"{preset}.npz")
        np.savez_compressed(path, **goldens)
        print(f"goldens -> {path}")
    return _print_report(report)


def run_raft(args):
    try:
        import torch
        from torchvision.models.optical_flow import raft_large
    except ImportError as e:
        raise SystemExit(f"torchvision required for the raft gate: {e}")
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_default_matmul_precision", "highest")
    from scenedino_tpu.models.raft import RAFT, convert_raft_state_dict

    model = raft_large(weights=None)
    sd = torch.load(args.checkpoint, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "model" in sd:
        sd = sd["model"]
    model.load_state_dict(sd)
    model.eval()

    rng = np.random.RandomState(0)
    H, W = 64, 96
    i0 = rng.rand(1, 3, H, W).astype(np.float32) * 2 - 1
    i1 = np.roll(i0, 3, axis=-1)
    with torch.no_grad():
        flows = model(torch.tensor(i0), torch.tensor(i1), num_flow_updates=12)
    ref = flows[-1].numpy()

    raft = RAFT(iters=12)
    params = {"params": convert_raft_state_dict({k: v.numpy() for k, v in sd.items()})}
    ours = raft.apply(params, jnp.asarray(i0), jnp.asarray(i1))

    report = []
    _gate("raft_flow", ours, ref, args.atol_flow, report)
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "raft_large.npz")
        np.savez_compressed(path, i0=i0, i1=i1, flow=ref)
        print(f"goldens -> {path}")
    return _print_report(report)


def run_scenedino(args):
    """Published checkpoint.pt -> converter -> encode + voxel query; emits
    goldens of OUR outputs (no upstream model needed: the gate here is the
    strict converter — every checkpoint key must be consumed — plus
    finiteness/shape checks; cross-checking against the reference's torch
    outputs requires the reference env and is out of scope for one box)."""
    import jax.numpy as jnp
    import jax

    from scenedino_tpu.cli.demo import build_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.utils.checkpoint import load_eval_state

    field = build_model(variant=args.variant)
    variables, _ = load_eval_state(args.checkpoint)
    rng = np.random.RandomState(0)
    H, W = 192, 640
    img = jnp.asarray(rng.rand(1, 1, 3, H, W).astype(np.float32) * 2 - 1)
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    projs = jnp.broadcast_to(
        jnp.array([[0.7, 0.0, 0.0], [0.0, 2.3, 0.0], [0.0, 0.0, 1.0]]), (1, 1, 3, 3))
    state = field.apply(variables, img, projs, poses, ids_encoder=(0,),
                        method=SceneField.encode)
    xyz = jnp.asarray(rng.rand(1, 512, 3).astype(np.float32) * np.array([20, 10, 40]) - np.array([10, 5, -3]))
    dino_full, sigma, seg = field.apply(
        variables, state, xyz, method=SceneField.query_segmentation)
    ok = bool(np.all(np.isfinite(np.asarray(sigma)))) and bool(
        np.all(np.isfinite(np.asarray(dino_full))))
    if args.out:
        os.makedirs(args.out, exist_ok=True)
        path = os.path.join(args.out, "scenedino_query.npz")
        np.savez_compressed(
            path, xyz=np.asarray(xyz), sigma=np.asarray(sigma),
            dino_full=np.asarray(dino_full),
            seg=np.asarray(seg) if seg is not None else np.zeros(0),
        )
        print(f"goldens -> {path}")
    print("PARITY GATE:", "PASS" if ok else "FAIL")
    return 0 if ok else 1


def main():
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    sub = ap.add_subparsers(dest="cmd", required=True)
    v = sub.add_parser("vit")
    v.add_argument("--model", required=True)
    v.add_argument("--checkpoint", required=True)
    v.add_argument("--out", default="tests/goldens/real")
    v.add_argument("--atol", type=float, default=2e-4)
    r = sub.add_parser("raft")
    r.add_argument("--checkpoint", required=True)
    r.add_argument("--out", default="tests/goldens/real")
    r.add_argument("--atol-flow", type=float, default=0.05)
    s = sub.add_parser("scenedino")
    s.add_argument("--checkpoint", required=True)
    s.add_argument("--variant", default="dino", choices=["dino", "dinov2"])
    s.add_argument("--out", default="tests/goldens/real")
    args = ap.parse_args()
    fn = {"vit": run_vit, "raft": run_raft, "scenedino": run_scenedino}[args.cmd]
    raise SystemExit(fn(args))


if __name__ == "__main__":
    main()
