"""Recipe parity audit: our shipped YAMLs vs the reference's composed config.

The reference composes hydra groups (configs/{dataset,model,renderer,
training,validation,downstream}/*.yaml) under top-level overrides; our
configs are flat. This test re-composes the reference values directly from
its YAML tree and asserts every training-recipe constant that affects the
published checkpoints matches — recipe drift hides silently otherwise
(round-1 verdict items #2/#6).

Skipped when the reference tree is not present (the audit is meaningful
only on boxes that carry /root/reference).
"""
import os

import pytest
import yaml

REF = "/root/reference/configs"
REPO = os.path.join(os.path.dirname(__file__), "..", "configs")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference tree not available"
)


def load(path):
    with open(path) as f:
        return yaml.safe_load(f)


def ref(path):
    return load(os.path.join(REF, path))


def ours(name):
    return load(os.path.join(REPO, name))


def test_stage1_dataset_recipe():
    ref_ds = ref("dataset/kitti_360_sscbench.yaml")
    for cfg_name in (
        "train_scenedino_kitti_360.yaml",
        "train_scenedino_kitti_360_dinov2.yaml",
        "train_scenedino_kitti_360_upsampler.yaml",
        "train_semantic_kitti_360.yaml",
    ):
        ds = ours(cfg_name)["dataset"]
        assert ds["type"] == ref_ds["type"] == "old_KITTI_360", cfg_name
        assert list(ds["fisheye_offset"]) == list(ref_ds["fisheye_offset"]), cfg_name
        # the reference factory pins stereo_offset to the dataset default 0
        # (the kwarg is commented out, scenedino/datasets/__init__.py:87) —
        # its config's [0] is decorative; ours must yield the same draws
        assert ds["stereo_offset"] in (0, [0]), cfg_name
        assert ds["data_fc"] == ref_ds["data_fc"] == 2, cfg_name
        assert ds["data_segmentation"] == ref_ds["data_segmentation"] is True
        assert ds["is_preprocessed"] == ref_ds["is_preprocessed"] is True
        assert list(ds["image_size"]) == list(ref_ds["image_size"])
        # scalar -15 and [0, -15] are the same rotation (the dataset
        # normalizes a scalar to (0, r), old_kitti_360.py:146-152)
        rot = ds["fisheye_rotation"]
        rot = rot if isinstance(rot, list) else [0, rot]
        ref_rot = ref_ds["fisheye_rotation"]
        ref_rot = ref_rot if isinstance(ref_rot, list) else [0, ref_rot]
        assert rot == ref_rot
        # shipped split lists present at the configured path
        split_dir = os.path.join(os.path.dirname(REPO), ds["split_path"])
        assert os.path.isfile(os.path.join(split_dir, "train_files.txt"))
        assert os.path.isfile(os.path.join(split_dir, "test_files.txt"))


def test_stage1_training_recipe():
    ref_top = ref("train_scenedino_kitti_360.yaml")
    ref_train = ref("training/scenedino.yaml")
    ref_opt = ref("training/optimizer/scenedino.yaml")
    ref_sched = ref("training/scheduler/scenedino.yaml")
    ref_rend = ref("renderer/pixelnerf.yaml")
    mine = ours("train_scenedino_kitti_360.yaml")

    t = mine["training"]
    # float(): pyyaml reads OmegaConf-style "1e-4" (no dot) as a string
    assert t["optimizer"]["args"]["lr"] == float(ref_opt["args"]["lr"]) == 1e-4
    assert t["num_epochs"] == ref_train["num_epochs"] == 50
    assert t["checkpoint_every"] == ref_train["checkpoint_every"] == 10000
    # hydra override chain: scheduler group 100000 -> top-level 50000
    assert ref_sched["step_size"] == 100000
    assert t["scheduler"]["step_size"] == ref_top["training"]["scheduler"]["step_size"] == 50000
    assert t["scheduler"]["gamma"] == ref_sched["gamma"] == 0.1

    rs = t["ray_sampler"]
    ref_rs = dict(ref_train["ray_sampler"])
    ref_rs["args"] = {**ref_rs["args"], **ref_top["training"]["ray_sampler"]["args"]}
    assert rs["args"]["patch_size"] == ref_rs["args"]["patch_size"] == 8
    assert rs["args"]["ray_batch_size"] == ref_rs["args"]["ray_batch_size"] == 2048
    assert rs["args"]["snap_to_grid"] == ref_rs["args"]["snap_to_grid"] is True
    assert rs["args"]["dino_upscaled"] == ref_rs["args"]["dino_upscaled"] is False
    assert rs["z_near"] == ref_rs["z_near"] == 3
    assert rs["z_far"] == ref_rs["z_far"] == 80

    r = mine["renderer"]
    ref_r = {**ref_rend, **ref_top["renderer"]}
    assert r["n_coarse"] == ref_r["n_coarse"] == 32
    assert r.get("n_fine", 0) == ref_r["n_fine"] == 0
    assert r["lindisp"] == ref_r["lindisp"] is True
    assert r["hard_alpha_cap"] == ref_r["hard_alpha_cap"] is True

    assert mine["batch_size"] == ref_top["batch_size"] == 4


def test_stage1_model_recipe():
    ref_m = ref("model/dino_downsampler.yaml")
    m = ours("train_scenedino_kitti_360.yaml")["model"]
    assert m["predict_dino"] == ref_m["predict_dino"] is True
    assert m["dino_dims"] == ref_m["dino_dims"] == 64
    assert m["compensate_artifacts"] == ref_m["compensate_artifacts"] is True
    # flip_augmentation ships ON; our trainer defaults it ON when the key
    # is absent (cli/train.py flip_augmentation=..., default True)
    assert m.get("flip_augmentation", True) == ref_m["flip_augmentation"] is True
    assert m["inv_z"] == ref_m["inv_z"] is True
    assert m["learn_empty"] == ref_m["learn_empty"] is False
    assert m["code_mode"] == ref_m["code_mode"] == "z"
    e, ref_e = m["encoder"], ref_m["encoder"]
    for k in (
        "mode", "decoder_arch", "downsampler_arch", "encoder_arch", "version",
        "separate_gt_version", "dim_reduction_arch", "decoder_out_dim",
        "dino_pca_dim", "key_features",
    ):
        assert e[k] == ref_e[k], k
    assert list(e["intermediate_features"]) == list(ref_e["intermediate_features"])
    assert m["code"] == ref_m["code"]
    head, ref_head = m["decoder_heads"][0], ref_m["decoder_heads"][0]
    assert head["type"] == ref_head["type"] == "resnet"
    assert head["args"]["n_blocks"] == ref_head["args"]["n_blocks"] == 0
    assert head["args"]["d_hidden"] == ref_head["args"]["d_hidden"] == 128


def test_stage1_loss_recipe():
    [ref_l] = ref("training/loss/scenedino.yaml")
    from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig

    lc = ReconstructionLossConfig()
    assert lc.lambda_dino_coarse == ref_l["lambda_dino_coarse"] == 0.2
    assert lc.temperature_dino == ref_l["temperature_dino"] == 5
    assert lc.invalid_policy == ref_l["invalid_policy"] == "weight_guided"
    assert lc.criterion == ref_l["coarse"]["criterion"] == "l1+ssim"
    assert lc.dino_criterion == ref_l["coarse"]["dino_criterion"] == "cosine"
    regs = {r["type"]: r["lambda"] for r in ref_l["regularizations"]}
    assert lc.lambda_edge_aware_smoothness == regs["edge_aware_smoothness"] == 0.001
    assert lc.lambda_dino_edge_aware_smoothness == regs["dino_edge_aware_smoothness"] == 0.25


def test_stage2_recipe():
    ref_top = ref("train_semantic_kitti_360.yaml")
    ref_train = ref("training/semantic.yaml")
    ref_opt = ref("training/optimizer/semantic.yaml")
    ref_down = ref("downstream/semantic.yaml")
    [ref_loss] = ref("training/loss/semantic.yaml")
    mine = ours("train_semantic_kitti_360.yaml")

    assert mine["batch_size"] == ref_top["batch_size"] == 4
    t = mine["training"]
    # optimizer group 5e-4; the top-level override restates it
    assert t["optimizer"]["args"]["lr"] == float(ref_opt["args"]["lr"]) \
        == float(ref_top["training"]["optimizer"]["args"]["lr"]) == 5e-4
    assert t["num_epochs"] == ref_train["num_epochs"] == 1
    # epoch_length group 2500 -> top-level 1000
    assert ref_train["epoch_length"] == 2500
    assert t["epoch_length"] == ref_top["training"]["epoch_length"] == 1000
    assert t["checkpoint_every"] == ref_train["checkpoint_every"] == 5000

    d = mine["downstream"]
    assert d["input_dim"] == ref_top["downstream"]["input_dim"] == 768
    for k in ("n_classes", "gt_classes", "code_dim", "knn_neighbors",
              "buffer_size", "patch_sample_size", "mode"):
        assert d[k] == ref_down[k], k
    assert d["knn_neighbors"] == 4
    assert d.get("apply_crf", False) == ref_down["apply_crf"] is False

    assert mine["model"]["sample_radius_3d"] == ref_top["model"]["sample_radius_3d"] == 0.5

    for k in ("random_weight", "knn_weight", "self_weight",
              "random_shift", "knn_shift", "self_shift", "pointwise"):
        assert t["loss"][k] == ref_loss[k], k


def test_validation_recipe():
    ref_v1 = ref("validation/scenedino.yaml")["validation"]
    v1 = ours("train_scenedino_kitti_360.yaml")["validation"]["validation"]
    assert [m["type"] for m in v1["metrics"]] == [m["type"] for m in ref_v1["metrics"]]
    assert v1["subset"]["args"] == ref_v1["subset"]["args"] == {"start": 0, "end": 128}
    assert v1["save_best"]["metric"] == ref_v1["save_best"]["metric"] == "dino_cos_sim"
    assert v1["events"][0]["args"]["every"] \
        == ref_v1["events"][0]["args"]["every"] == 5000

    ref_v2 = ref("validation/semantic.yaml")["validation"]
    v2 = ours("train_semantic_kitti_360.yaml")["validation"]["validation"]
    assert v2["save_best"]["metric"] == ref_v2["save_best"]["metric"] \
        == "stego_cluster_weighted_miou"
    assert v2["save_best"]["update_model"] == ref_v2["save_best"]["update_model"] is True
    assert v2["subset"] == ref_v2["subset"]
    assert v2["events"][0]["args"]["every"] \
        == ref_v2["events"][0]["args"]["every"] == 100


def test_re10k_recipe():
    ref_top = ref("train_scenedino_re10k.yaml")
    mine = ours("train_scenedino_re10k.yaml")
    assert mine["model"]["loss_renderer_strategy"]["name"] \
        == ref_top["model"]["loss_renderer_strategy"]["name"] == "alternate"
    assert list(mine["model"]["encoder"]["image_size"]) \
        == list(ref_top["model"]["encoder"]["image_size"]) == [288, 512]
    assert mine["training"]["scheduler"]["step_size"] \
        == ref_top["training"]["scheduler"]["step_size"] == 50000
    assert mine["batch_size"] == ref_top["batch_size"] == 4


def test_with_amp_recipe():
    """The reference trains with_amp: true (train.py autocast); on TPU
    that maps to a bf16 encoder compute dtype (params fp32)."""
    import jax.numpy as jnp

    from scenedino_tpu.models.factory import encoder_config_from_dict

    for cfg_name in (
        "train_scenedino_kitti_360.yaml",
        "train_semantic_kitti_360.yaml",
        "train_scenedino_re10k.yaml",
    ):
        assert ours(cfg_name)["with_amp"] is True, cfg_name
    assert ref("train_scenedino_kitti_360.yaml")["with_amp"] is True
    # the YAML string round-trips to the jnp dtype in the factory
    assert encoder_config_from_dict({"dtype": "bfloat16"}).dtype == jnp.bfloat16
    assert encoder_config_from_dict({}).dtype is None


def test_factory_honors_recipe_keys(tmp_path):
    """The shipped dataset keys must actually reach the dataset object:
    data_segmentation / is_preprocessed / dilation / split-dir semantics
    (they were silently dropped once; the reference factory maps them at
    scenedino/datasets/__init__.py:73-107)."""
    import inspect

    from scenedino_tpu.datasets import make_datasets

    src = inspect.getsource(make_datasets)
    for key in ("data_segmentation", "is_preprocessed", "dilation",
                "keyframe_offset", "test_files.txt", "train_files.txt"):
        assert key in src, f"factory lost the {key} mapping"


def test_alternate_strategy_split():
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.core.strategies import alternate_loss_sampler

    fn = alternate_loss_sampler()
    evens = 0
    for i in range(300):
        ids_loss, ids_render = fn(jax.random.PRNGKey(i), 4)
        il, ir = ids_loss.tolist(), ids_render.tolist()
        assert sorted(il + ir) == [0, 1, 2, 3]
        assert il in ([0, 2], [1, 3])
        evens += il == [0, 2]
    # p(evens as loss) = 2/3 (randint(0,2) truthy)
    assert 150 < evens < 250
