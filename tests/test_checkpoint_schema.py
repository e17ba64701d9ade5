"""Published-checkpoint key-schema rehearsal (VERDICT r1 item 4).

Builds a synthetic torch state dict carrying the EXACT key names the
reference BTSWrapper produces (module tree per trainer.py:525-589:
`renderer.net.encoder.encoder.vit.*` — the _ViT wrapper stores the FX
GraphModule under `.vit` (vit.py:150) which preserves timm names —
`renderer.net.encoder.{gt_encoder.vit,decoder,downsampler,dim_reduction}`,
`renderer.net.heads.normal_head`, `renderer.net.downstream_head`,
`artifact_field`, plus the non-weight buffers `code_xyz._freqs/_phases`
and `...pseudo_assignment`), runs `convert_scenedino_checkpoint` in strict
mode, and checks the result loads into a real (tiny) SceneField built by
the same factory the CLIs use — byte-identical tree structure and shapes.

The moment real weights appear, the only untested part is the numerics
(covered separately by the torch-twin parity + golden tests).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
from scenedino_tpu.models.factory import make_model
from scenedino_tpu.models.field import SceneField
from scenedino_tpu.utils import checkpoint as CK

# tiny-but-complete shipped architecture (dino_downsampler.yaml shape)
D_VIT, DEPTH, HEADS, PATCH = 32, 3, 2, 8
IMG = (16, 32)
NUM_CH = (4, 4, 8, 8)
D_DEC = 8
PCA = 16  # dino_pca_dim == dino_dims
D_HID = 24
CODE_DIM = 8
N_CLS, GT_CLS = 5, 4


def _vit_keys(rng, prefix, d=D_VIT, depth=DEPTH, img=IMG, patch=PATCH):
    n = (img[0] // patch) * (img[1] // patch)
    sd = {
        f"{prefix}.cls_token": rng.randn(1, 1, d),
        f"{prefix}.pos_embed": rng.randn(1, 1 + n, d),
        f"{prefix}.patch_embed.proj.weight": rng.randn(d, 3, patch, patch),
        f"{prefix}.patch_embed.proj.bias": rng.randn(d),
        f"{prefix}.norm.weight": rng.randn(d),
        f"{prefix}.norm.bias": rng.randn(d),
    }
    for i in range(depth):
        b = f"{prefix}.blocks.{i}"
        sd.update({
            f"{b}.norm1.weight": rng.randn(d), f"{b}.norm1.bias": rng.randn(d),
            f"{b}.attn.qkv.weight": rng.randn(3 * d, d), f"{b}.attn.qkv.bias": rng.randn(3 * d),
            f"{b}.attn.proj.weight": rng.randn(d, d), f"{b}.attn.proj.bias": rng.randn(d),
            f"{b}.norm2.weight": rng.randn(d), f"{b}.norm2.bias": rng.randn(d),
            f"{b}.mlp.fc1.weight": rng.randn(4 * d, d), f"{b}.mlp.fc1.bias": rng.randn(4 * d),
            f"{b}.mlp.fc2.weight": rng.randn(d, 4 * d), f"{b}.mlp.fc2.bias": rng.randn(d),
        })
    return sd


def _dpt_keys(rng, prefix, embed=D_VIT, ch=NUM_CH, d_out=D_DEC):
    cch = [min(d_out, c) for c in ch]
    sd = {}
    for i, c in enumerate(cch):
        sd[f"{prefix}.reassemble_blocks.projects.{i}.weight"] = rng.randn(c, embed, 1, 1)
        sd[f"{prefix}.reassemble_blocks.projects.{i}.bias"] = rng.randn(c)
        sd[f"{prefix}.convs.{i}.weight"] = rng.randn(d_out, c, 3, 3)  # bias=False
    sd[f"{prefix}.reassemble_blocks.resize_layers.0.weight"] = rng.randn(cch[0], cch[0], 4, 4)
    sd[f"{prefix}.reassemble_blocks.resize_layers.0.bias"] = rng.randn(cch[0])
    sd[f"{prefix}.reassemble_blocks.resize_layers.1.weight"] = rng.randn(cch[1], cch[1], 2, 2)
    sd[f"{prefix}.reassemble_blocks.resize_layers.1.bias"] = rng.randn(cch[1])
    # resize_layers.2 is nn.Identity (no params)
    sd[f"{prefix}.reassemble_blocks.resize_layers.3.weight"] = rng.randn(cch[3], cch[3], 3, 3)
    sd[f"{prefix}.reassemble_blocks.resize_layers.3.bias"] = rng.randn(cch[3])
    for i in range(4):
        fb = f"{prefix}.fusion_blocks.{i}"
        sd[f"{fb}.project.weight"] = rng.randn(d_out, d_out, 1, 1)
        sd[f"{fb}.project.bias"] = rng.randn(d_out)
        units = ["res_conv_unit2"] if i == 0 else ["res_conv_unit1", "res_conv_unit2"]
        for u in units:
            for cv in ("conv1", "conv2"):
                sd[f"{fb}.{u}.{cv}.weight"] = rng.randn(d_out, d_out, 3, 3)
                sd[f"{fb}.{u}.{cv}.bias"] = rng.randn(d_out)
    sd[f"{prefix}.project.weight"] = rng.randn(d_out, d_out, 3, 3)
    sd[f"{prefix}.project.bias"] = rng.randn(d_out)
    hm = f"{prefix}.output_head.head_modules"
    sd[f"{hm}.0.weight"] = rng.randn(d_out, d_out, 3, 3)
    sd[f"{hm}.0.bias"] = rng.randn(d_out)
    sd[f"{hm}.1.weight"] = rng.randn(d_out, d_out, 2, 2)  # ConvTranspose2d (in, out, kh, kw)
    sd[f"{hm}.1.bias"] = rng.randn(d_out)
    sd[f"{hm}.2.weight"] = rng.randn(d_out, d_out, 3, 3)
    sd[f"{hm}.2.bias"] = rng.randn(d_out)
    return sd


def reference_state_dict(with_downstream=True):
    rng = np.random.RandomState(0)
    net = "renderer.net"
    enc = f"{net}.encoder"
    sd = {}
    sd.update(_vit_keys(rng, f"{enc}.encoder.vit"))
    sd.update(_vit_keys(rng, f"{enc}.gt_encoder.vit"))
    sd.update(_dpt_keys(rng, f"{enc}.decoder"))
    # PatchSalienceDownsampler (downsampler.py:45-47); channels = gt latent
    sd[f"{enc}.downsampler.conv.weight"] = rng.randn(1, D_VIT, 1, 1)
    sd[f"{enc}.downsampler.conv.bias"] = rng.randn(1)
    sd[f"{enc}.downsampler.patch_weight"] = rng.randn(PATCH, PATCH)
    sd[f"{enc}.downsampler.patch_bias"] = rng.randn(PATCH, PATCH)
    # MlpDimReduction (dim_reduction.py:18-19): pca -> 128 -> vit width
    sd[f"{enc}.dim_reduction.linear_in.weight"] = rng.randn(128, PCA)
    sd[f"{enc}.dim_reduction.linear_in.bias"] = rng.randn(128)
    sd[f"{enc}.dim_reduction.linear_out.weight"] = rng.randn(D_VIT, 128)
    sd[f"{enc}.dim_reduction.linear_out.bias"] = rng.randn(D_VIT)
    # ResnetFC n_blocks=0: d_in = decoder_out + 39-dim code
    d_in = D_DEC + 39
    sd[f"{net}.heads.normal_head.lin_in.weight"] = rng.randn(D_HID, d_in)
    sd[f"{net}.heads.normal_head.lin_in.bias"] = rng.randn(D_HID)
    sd[f"{net}.heads.normal_head.lin_out.weight"] = rng.randn(1 + PCA, D_HID)
    sd[f"{net}.heads.normal_head.lin_out.bias"] = rng.randn(1 + PCA)
    # non-weight buffers present in real checkpoints
    sd[f"{net}.code_xyz._freqs"] = rng.randn(1, 12, 1)
    sd[f"{net}.code_xyz._phases"] = rng.randn(1, 12, 1)
    # artifact field lives on the WRAPPER (trainer.py:113)
    sd["artifact_field"] = rng.randn(D_VIT, IMG[0] // PATCH, IMG[1] // PATCH) * 1e-3
    if with_downstream:
        ds = f"{net}.downstream_head"
        in_dim = D_VIT  # head sees expanded (vit-width) features
        mid = in_dim
        sd[f"{ds}.stego_head.linear_path.0.weight"] = rng.randn(CODE_DIM, in_dim, 1, 1)
        sd[f"{ds}.stego_head.linear_path.0.bias"] = rng.randn(CODE_DIM)
        sd[f"{ds}.stego_head.nonlinear_path.0.weight"] = rng.randn(mid, in_dim, 1, 1)
        sd[f"{ds}.stego_head.nonlinear_path.0.bias"] = rng.randn(mid)
        sd[f"{ds}.stego_head.nonlinear_path.2.weight"] = rng.randn(CODE_DIM, mid, 1, 1)
        sd[f"{ds}.stego_head.nonlinear_path.2.bias"] = rng.randn(CODE_DIM)
        sd[f"{ds}.direct_cluster_head.cluster_centers"] = rng.randn(N_CLS, in_dim)
        sd[f"{ds}.direct_cluster_head.pseudo_assignment"] = np.arange(N_CLS) % GT_CLS
        sd[f"{ds}.stego_cluster_head.cluster_centers"] = rng.randn(N_CLS, CODE_DIM)
        sd[f"{ds}.stego_cluster_head.pseudo_assignment"] = np.arange(N_CLS) % GT_CLS
        sd[f"{ds}.direct_linear_head.linear.weight"] = rng.randn(GT_CLS, in_dim)
        sd[f"{ds}.direct_linear_head.linear.bias"] = rng.randn(GT_CLS)
        sd[f"{ds}.stego_linear_head.linear.weight"] = rng.randn(GT_CLS, CODE_DIM)
        sd[f"{ds}.stego_linear_head.linear.bias"] = rng.randn(GT_CLS)
    return {k: np.asarray(v, np.float32) for k, v in sd.items()}


def tiny_model_conf():
    return {
        "predict_dino": True,
        "dino_dims": PCA,
        "learn_empty": False,
        "encoder": {
            "mode": "downsample-prediction",
            "decoder_arch": "dpt",
            "downsampler_arch": "featup",
            "encoder_arch": "vit-b",
            "version": "v1",
            "separate_gt_version": "v1",
            "dim_reduction_arch": "mlp",
            "num_ch_enc": NUM_CH,
            "intermediate_features": (0, 1, 2),
            "decoder_out_dim": D_DEC,
            "dino_pca_dim": PCA,
            "image_size": IMG,
            "vit_overrides": {
                "width": D_VIT, "depth": DEPTH, "num_heads": HEADS,
                "pos_embed_size": IMG,
            },
        },
        "decoder_heads": [
            {"type": "resnet", "name": "normal_head", "args": {"n_blocks": 0, "d_hidden": D_HID}}
        ],
        "final_prediction_head": "normal_head",
    }


def _paths(tree):
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    return {jax.tree_util.keystr(p): tuple(v.shape) for p, v in flat}


def test_strict_conversion_and_structure_match():
    sd = reference_state_dict(with_downstream=True)
    conv = CK.convert_scenedino_checkpoint(sd, strict=True)
    assert "artifact_field" in conv

    head = SemanticHead(cfg=SemanticHeadConfig(
        n_classes=N_CLS, gt_classes=GT_CLS, input_dim=D_VIT, code_dim=CODE_DIM
    ))
    field = make_model(tiny_model_conf(), downstream=head)
    k = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 1, 3, *IMG))
    ks = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    variables = field.init({"params": k, "augment": k}, imgs, ks, poses,
                           method=SceneField.warmup)

    got = _paths(conv["params"])
    want = _paths(variables["params"])
    missing = sorted(set(want) - set(got))
    extra = sorted(set(got) - set(want))
    assert not missing, f"converted tree missing params: {missing[:10]}"
    assert not extra, f"converted tree has unknown params: {extra[:10]}"
    mismatched = {k: (got[k], want[k]) for k in want if got[k] != want[k]}
    assert not mismatched, f"shape mismatches: {mismatched}"

    # state collection: pseudo assignments restored as int32
    st = conv["state"]["downstream"]
    assert st["direct_cluster_head"]["pseudo_assignment"].dtype == np.int32

    # converted params actually run through the model
    out = field.apply(
        {"params": conv["params"]}, imgs, ks, poses, method=SceneField.encode,
        ids_encoder=(0,),
    )
    assert out.feat_grid.shape[0] == 1


def test_strict_flags_unconsumed_keys():
    sd = reference_state_dict(with_downstream=False)
    sd["renderer.net.heads.normal_head.blocks.0.fc_0.weight_oops"] = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="unconsumed"):
        CK.convert_scenedino_checkpoint(sd, strict=True)


def test_vit_meta_inference():
    rng = np.random.RandomState(1)
    sd = _vit_keys(rng, "m")
    sd["m.blocks.0.ls1.gamma"] = rng.randn(D_VIT)
    sd["m.reg_token"] = rng.randn(1, 4, D_VIT)
    depth, regs, ls = CK.infer_vit_meta(sd, "m")
    assert (depth, regs, ls) == (DEPTH, 4, True)


def test_converted_variables_nesting_runs_segmentation():
    """The eval CLIs assemble variables as {"params": ..., "state": conv["state"]}
    — the state COLLECTION must be nested under the "state" key (spreading
    its contents at the top level loses the pseudo_assignment collection
    and flax fails at apply time). Run the full predict_segmentation path
    with that assembly."""
    sd = reference_state_dict(with_downstream=True)
    conv = CK.convert_scenedino_checkpoint(sd, strict=True)

    head = SemanticHead(cfg=SemanticHeadConfig(
        n_classes=N_CLS, gt_classes=GT_CLS, input_dim=D_VIT, code_dim=CODE_DIM
    ))
    field = make_model(tiny_model_conf(), downstream=head)
    variables = {"params": conv["params"], "state": conv.get("state", {})}

    k = jax.random.PRNGKey(0)
    imgs = jnp.zeros((1, 1, 3, *IMG))
    ks = jnp.broadcast_to(jnp.eye(3), (1, 1, 3, 3))
    poses = jnp.broadcast_to(jnp.eye(4), (1, 1, 4, 4))
    state = field.apply(variables, imgs, ks, poses, method=SceneField.encode,
                        ids_encoder=(0,))
    pts = jnp.zeros((1, 8, 3))
    _, sigma, seg = field.apply(
        variables, state, pts, mode="stego_kmeans",
        method=SceneField.query_segmentation,
    )
    assert seg is not None and seg.shape[:2] == (1, 8)
    assert np.all(np.isfinite(np.asarray(sigma)))
