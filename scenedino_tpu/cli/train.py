"""Training entry point.

Behavioral parity target: `train.py` (hydra CLI) + trainer initialize.
Config is a YAML file (see configs/) selecting dataset / model / renderer /
training blocks; `--stage semantic` runs the downstream distillation.

Usage:
  python -m scenedino_tpu.cli.train --config configs/train_scenedino_kitti_360.yaml
  python -m scenedino_tpu.cli.train --config configs/train_semantic_kitti_360.yaml --stage semantic
"""
from __future__ import annotations

import argparse
import logging

import numpy as np


def batch_iterator(dataset, batch_size, key_seed=0, shuffle=True, drop_last=True, num_workers=4):
    """Host-side batcher: shuffled epoch plan + threaded prefetching
    loader (the reference's `auto_dataloader(num_workers=...)`,
    trainer.py:488-494; see utils/prefetch.py)."""
    from scenedino_tpu.utils.prefetch import ThreadedLoader

    n = len(dataset)
    rng = np.random.RandomState(key_seed)

    def it():
        order = rng.permutation(n) if shuffle else np.arange(n)
        stop = n - (batch_size - 1 if drop_last else 0)
        plan = [
            [int(j) for j in order[i : i + batch_size]]
            for i in range(0, stop, batch_size)
        ]
        yield from ThreadedLoader(dataset, plan, num_workers=num_workers)

    return it


def make_val_batches_fn(dataset, indices, batch_size, keys):
    """Deterministic validation batches over a subset (full batches only so
    the jitted eval forward compiles once)."""
    import jax.numpy as jnp

    indices = np.asarray(indices)

    def it():
        for i in range(0, len(indices) - (batch_size - 1), batch_size):
            samples = [dataset[int(j)] for j in indices[i : i + batch_size]]
            yield {
                k: jnp.asarray(np.stack([s[k] for s in samples]))
                for k in keys if k in samples[0]
            }

    return it


def build_validators(config, stage: str, **kw):
    """`validation:` config blocks -> {name: Validator}
    (configs/validation/{scenedino,semantic}.yaml schema)."""
    from scenedino_tpu.training.validation import (
        make_stage1_validator,
        make_stage2_validator,
        subset_indices,
    )

    vconf_all = config.get("validation") or {}
    if not vconf_all:
        return None
    val_ds = kw.pop("dataset")
    batch_size = kw.pop("batch_size")
    keys = kw.pop("keys")
    validators = {}
    for name, vconf in vconf_all.items():
        idx = subset_indices(vconf.get("subset"), len(val_ds), seed=config.get("seed", 0))
        # per-validator batch size, default 1 (get_dataflow,
        # trainer.py:510-516) — independent of the train batch size
        vbatch = vconf.get("batch_size", 1)
        batches_fn = make_val_batches_fn(val_ds, idx, vbatch, keys)
        if stage == "nvs":
            validators[name] = make_stage1_validator(
                name, vconf, kw["field"], kw["tcfg"], kw["rcfg"], batches_fn
            )
        else:
            validators[name] = make_stage2_validator(
                name, vconf, kw["field"], kw["field_params"], kw["head"],
                kw["cfg"], kw["rcfg"], batches_fn,
            )
    return validators


def run_stage1(config, sweep_trial=None):
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.losses.reconstruction import ReconstructionLossConfig
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.parallel.mesh import make_data_mesh, shard_batch
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.loop import LoopConfig, fit
    from scenedino_tpu.training.trainer import (
        TrainConfig,
        init_train_state,
        make_train_step,
    )
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.jax_setup import maybe_init_distributed

    maybe_init_distributed()
    enable_compilation_cache()
    train_ds, val_ds = make_datasets(config["dataset"])
    # `with_amp: true` (reference train.py autocast) = bf16 compute dtype
    # on TPU: params stay fp32, matmuls/activations run bf16 (and the ViT
    # flash-attention kernel gates on bf16); pose math and compositing
    # keep their fp32 islands regardless (SURVEY §2.7 AMP row)
    if config.get("with_amp", False) and not config["model"].get("encoder", {}).get("dtype"):
        # keep it a string: the saved training_config.yaml must stay
        # plain-YAML round-trippable (the factory normalizes it)
        config["model"]["encoder"]["dtype"] = "bfloat16"
    field = make_model(config["model"])

    rconf = config.get("renderer", {})
    rcfg = RenderConfig(
        n_coarse=rconf.get("n_coarse", 32),
        n_fine=rconf.get("n_fine", 0),
        lindisp=rconf.get("lindisp", True),
        hard_alpha_cap=rconf.get("hard_alpha_cap", True),
    )
    tconf = config.get("training", {})
    rs = tconf.get("ray_sampler", {})
    sched = tconf.get("scheduler", {}) or {}
    tcfg = TrainConfig(
        lr=tconf.get("optimizer", {}).get("args", {}).get("lr", 1e-4),
        scheduler_step=sched.get("step_size", 100000),
        scheduler_gamma=sched.get("gamma", 0.1),
        ray_batch_size=rs.get("args", {}).get("ray_batch_size", 2048),
        patch_size=rs.get("args", {}).get("patch_size", 8),
        z_near=rs.get("z_near", 3.0),
        z_far=rs.get("z_far", 80.0),
        compensate_artifacts=config["model"].get("compensate_artifacts", True),
        dino_upscaled=rs.get("args", {}).get("dino_upscaled", False),
        flip_augmentation=config["model"].get("flip_augmentation", True),
        grid_shift_augmentation=config["model"].get("grid_shift_augmentation", True),
        gradient_accum_factor=config.get("gradient_accum_factor", 1),
        loss_renderer_strategy=(
            config["model"].get("loss_renderer_strategy", {}) or {}
        ).get("name", "kitti_360"),
    )
    lcfg = ReconstructionLossConfig()

    sample = train_ds[0]
    batch0 = {k: jnp.asarray(v)[None] for k, v in sample.items() if k in ("imgs", "poses", "projs")}
    key = jax.random.PRNGKey(config.get("seed", 0))
    params = field.warmup_init(key, batch0["imgs"], batch0["projs"], batch0["poses"])
    H, W = config["model"]["encoder"].get("image_size", (192, 640))
    gt_patch = getattr(field.encoder, "gt_patch_size", 8)
    # teacher latent size: vit_overrides width if set, else the preset width
    econf = config["model"]["encoder"]
    ov = econf.get("vit_overrides") or {}
    if "width" in ov:
        gt_dim = ov["width"]
    else:
        from scenedino_tpu.models.encoder import _vit_name
        from scenedino_tpu.models.vit import VIT_PRESETS

        gt_dim = VIT_PRESETS[
            _vit_name(econf.get("encoder_arch", "vit-b"),
                      econf.get("separate_gt_version") or econf.get("version", "v1"))
        ].width
    state, tx = init_train_state(
        field, params, tcfg,
        artifact_shape=(gt_dim, H // gt_patch, W // gt_patch) if tcfg.compensate_artifacts else None,
    )

    batch_size = config.get("batch_size", 4)
    mesh = make_data_mesh(batch_size)
    sched = rconf.get("sched") or []
    if sched:
        from scenedino_tpu.training.trainer import ScheduledTrainStep

        step = ScheduledTrainStep(
            lambda rc: make_train_step(field, tcfg, rc, lcfg, tx), rcfg, sched
        )
    else:
        # donate the train state: params + adam moments (~1.5 GB for ViT-B)
        # alias input->output instead of double-buffering every step
        step = jax.jit(make_train_step(field, tcfg, rcfg, lcfg, tx),
                       donate_argnums=(0,))

    from scenedino_tpu.utils.prefetch import device_prefetch

    num_workers = config.get("num_workers", 4)
    # ONE iterator factory for the whole run: its RandomState persists
    # across it() calls, so every epoch gets a fresh permutation (building
    # it inside data_iter would reset the shuffle to the same order each
    # epoch); seeded from the run seed like the reference DataLoader
    batches = batch_iterator(
        train_ds, batch_size, key_seed=config.get("seed", 0), num_workers=num_workers
    )

    def data_iter():
        host = (
            {k: v for k, v in b.items() if k in ("imgs", "poses", "projs")}
            for b in batches()
        )
        # keep 2 sharded batches resident on device ahead of the step
        yield from device_prefetch(
            host, buffer_size=2,
            put=lambda b: shard_batch(mesh, {k: jnp.asarray(v) for k, v in b.items()}),
        )

    from scenedino_tpu.utils.jax_setup import save_run_config

    save_run_config(config.get("output", {}).get("path", "out/run"), config)
    loop_cfg = LoopConfig(
        output_path=config.get("output", {}).get("path", "out/run"),
        num_epochs=tconf.get("num_epochs", 50),
        checkpoint_every=tconf.get("checkpoint_every", 10000),
        log_every=tconf.get("log_every", 100),
        stop_iteration=tconf.get("stop_iteration"),
        resume=tconf.get("continue", False),
        profile_start=tconf.get("profile_start"),
        profile_stop=tconf.get("profile_stop"),
    )
    validators = build_validators(
        config, "nvs", dataset=val_ds or train_ds, batch_size=batch_size,
        keys=("imgs", "poses", "projs", "depths"),
        field=field, tcfg=tcfg, rcfg=rcfg,
    )
    with jax.set_mesh(mesh):
        fit(state, step, data_iter, loop_cfg, key, validators=validators,
            steps_per_epoch=tconf.get("epoch_length"),
            sweep_trial=sweep_trial,
            sweep_validator=tconf.get("sweep_validator", "validation"))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--config", required=True)
    ap.add_argument("--stage", default="nvs", choices=["nvs", "semantic"])
    args = ap.parse_args()

    import yaml

    logging.basicConfig(level=logging.INFO)
    with open(args.config) as f:
        config = yaml.safe_load(f)

    if args.stage == "nvs":
        run_stage1(config)
    else:
        run_stage2(config)


def run_stage2(config, sweep_trial=None):
    """Stage-2 downstream distillation (trainer_downstream.py parity)."""
    import jax
    import jax.numpy as jnp

    from scenedino_tpu.datasets import make_datasets
    from scenedino_tpu.models.downstream import SemanticHead, SemanticHeadConfig
    from scenedino_tpu.models.factory import make_model
    from scenedino_tpu.models.field import SceneField
    from scenedino_tpu.renderer.nerf import RenderConfig
    from scenedino_tpu.training.downstream import (
        DownstreamTrainConfig,
        init_downstream_state,
        make_downstream_optimizer,
        make_downstream_train_step,
    )
    from scenedino_tpu.training.loop import LoopConfig, find_latest_checkpoint, fit
    from scenedino_tpu.utils import enable_compilation_cache
    from scenedino_tpu.utils.jax_setup import maybe_init_distributed
    from scenedino_tpu.utils.checkpoint import load_checkpoint

    maybe_init_distributed()
    enable_compilation_cache()
    train_ds, val_ds = make_datasets(config["dataset"])
    # with_amp => bf16 compute for the frozen field's encode (see run_stage1)
    if config.get("with_amp", False) and not config.get("model", {}).get("encoder", {}).get("dtype"):
        config.setdefault("model", {}).setdefault("encoder", {})["dtype"] = "bfloat16"
    field = make_model(config.get("model", {}))

    dconf = config.get("downstream", {})
    head_cfg = SemanticHeadConfig.from_dict(dconf)
    head = SemanticHead(cfg=head_cfg)

    sample = train_ds[0]
    batch0 = {k: jnp.asarray(v)[None] for k, v in sample.items() if k in ("imgs", "poses", "projs")}
    key = jax.random.PRNGKey(config.get("seed", 0))
    field_params = field.warmup_init(
        key, batch0["imgs"][:, :1], batch0["projs"][:, :1], batch0["poses"][:, :1]
    )
    resume_from = config.get("resume_from")
    if resume_from:
        latest = find_latest_checkpoint(resume_from) or resume_from
        restored = load_checkpoint(latest)
        # accepted layouts: a stage-1 TrainState ({"params": {module...}}),
        # or a bare variables tree ({"params": {...}} as written by
        # run_stage2's field_params snapshot / the converter)
        fp = restored.get("params", restored)
        if "params" in fp:
            field_params = {"params": fp["params"]}
        elif "encoder" in fp or any(k.startswith("heads_") for k in fp):
            field_params = {"params": fp}
        else:
            raise ValueError(
                f"resume_from={latest!r}: unrecognized checkpoint layout "
                f"(top-level keys {sorted(restored)[:6]}); refusing to "
                "train the downstream head against random field params"
            )

    from scenedino_tpu.models.downstream import RingBufferState

    H, W = config["dataset"].get("image_size", (192, 640))
    cfg = DownstreamTrainConfig(
        # reference top-level optimizer override: 5e-4
        # (configs/train_semantic_kitti_360.yaml)
        lr=config.get("training", {}).get("optimizer", {}).get("args", {}).get("lr", 5e-4),
        render_height=H, render_width=W,
        # crop sample capacity must match the head's ring-buffer row size
        n_samples=head_cfg.patch_sample_size,
        sample_radius=config.get("model", {}).get("sample_radius_3d", 0.5),
        use_fast_render=config.get("training", {}).get("use_fast_render", True),
    )
    buffers0 = RingBufferState.create(head_cfg.buffer_size, head_cfg.patch_sample_size, head_cfg.input_dim)
    dino0 = jnp.zeros((1, 1, H, W, 1, head_cfg.input_dim))
    crop0 = jnp.zeros((cfg.n_crops, cfg.n_samples, head_cfg.input_dim))
    # jit the init: eager flax init dispatches forward_training op-by-op,
    # which over an axon-tunneled TPU is one round trip per op — observed
    # as a ~zero-CPU half-hour stall before the first step. One compiled
    # program instead (persisted in the compilation cache).
    def _head_init(k, d0, b0, c0, s0):
        return head.init(
            {"params": k, "dropout": k},
            d0, b0, k, crop_features=c0, seg_target=s0,
            deterministic=True, method=SemanticHead.forward_training,
        )

    head_vars = jax.jit(_head_init)(
        key, dino0, buffers0, crop0, jnp.zeros((1, H, W), jnp.int32)
    )
    rcfg = RenderConfig(n_coarse=config.get("renderer", {}).get("n_coarse", 32))
    batch_size = config.get("batch_size", 1)

    # cluster-center init from the first batch (semantic_head.py:329-348):
    # k-means++ on the features each head clusters (default), or "random"
    from scenedino_tpu.training.downstream import seed_cluster_centers

    init_type = dconf.get("cluster_init", "kmeans++")
    key, k_seed = jax.random.split(key)
    first = next(iter(batch_iterator(train_ds, batch_size)()))
    first = {k: jnp.asarray(v) for k, v in first.items() if k in ("imgs", "poses", "projs", "segs")}
    # jitted for the same reason as _head_init above: the seeding renders
    # a full frame through downstream_forward + runs k-means++ — eager,
    # that is thousands of tunnel round trips
    head_vars = jax.jit(
        lambda fp, hv, b, k: seed_cluster_centers(
            field, fp, head, hv, b, k, cfg, rcfg, init_type
        )
    )(field_params, head_vars, first, k_seed)

    tx = make_downstream_optimizer(cfg, head_vars["params"])
    state = init_downstream_state(head_vars, cfg, head_cfg, tx)

    # data-parallel mesh over the batch dim (reference stage-2 also trains
    # under DDP, trainer_downstream.py via idist; head grads all-reduce and
    # the replicated ring buffers pick up every shard's crops through the
    # compiler-inserted all-gathers). Placement happens BEFORE the step
    # factory so the partial binds the replicated field params.
    from scenedino_tpu.parallel.mesh import make_data_mesh, replicated, shard_batch

    mesh = make_data_mesh(batch_size)
    state = jax.device_put(state, replicated(mesh))
    field_params = jax.device_put(field_params, replicated(mesh))
    # honor training.loss overrides (configs/training/loss/semantic.yaml
    # weights/shifts/pointwise); defaults match the shipped YAML
    from scenedino_tpu.losses.stego import StegoLossConfig

    lconf = config.get("training", {}).get("loss", {}) or {}
    loss_cfg = StegoLossConfig(**{
        k: lconf[k] for k in (
            "random_weight", "knn_weight", "self_weight",
            "random_shift", "knn_shift", "self_shift", "pointwise",
        ) if k in lconf
    })
    step = make_downstream_train_step(field, field_params, head, cfg, rcfg, tx,
                                      loss_cfg=loss_cfg, donate=True)
    from scenedino_tpu.utils.jax_setup import save_run_config

    out_path = config.get("output", {}).get("path", "out/semantic")
    save_run_config(out_path, config)
    # Persist the frozen field next to the head checkpoints so evaluation
    # can rebuild the FULL model from this run dir alone — the reference's
    # torch checkpoints hold the whole model incl. the frozen field
    # (base_trainer.py:272-293 checkpoints the complete BTSDownstreamWrapper).
    import os as _os

    from scenedino_tpu.utils.checkpoint import save_checkpoint

    save_checkpoint(
        _os.path.join(_os.path.abspath(out_path), "field_params"),
        jax.device_get(field_params),
    )
    loop_cfg = LoopConfig(
        output_path=config.get("output", {}).get("path", "out/semantic"),
        num_epochs=config.get("training", {}).get("num_epochs", 10),
        checkpoint_every=config.get("training", {}).get("checkpoint_every", 5000),
        log_every=config.get("training", {}).get("log_every", 100),
        stop_iteration=config.get("training", {}).get("stop_iteration"),
        # training.continue auto-resume, same as stage 1 (base_trainer parity)
        resume=config.get("training", {}).get("continue", False),
        profile_start=config.get("training", {}).get("profile_start"),
        profile_stop=config.get("training", {}).get("profile_stop"),
    )

    from scenedino_tpu.utils.prefetch import device_prefetch

    # persistent factory: per-epoch reshuffle + config seed (see run_stage1)
    batches = batch_iterator(
        train_ds, batch_size, key_seed=config.get("seed", 0),
        num_workers=config.get("num_workers", 4),
    )

    def data_iter():
        host = (
            {k: v for k, v in b.items() if k in ("imgs", "poses", "projs", "segs")}
            for b in batches()
        )
        yield from device_prefetch(
            host, buffer_size=2,
            put=lambda b: shard_batch(mesh, {k: jnp.asarray(v) for k, v in b.items()}),
        )

    from scenedino_tpu.training.validation import make_update_model_fn

    validators = build_validators(
        config, "semantic", dataset=val_ds or train_ds, batch_size=batch_size,
        keys=("imgs", "poses", "projs", "segs"),
        field=field, field_params=field_params, head=head, cfg=cfg, rcfg=rcfg,
    )
    fit(
        state, step, data_iter, loop_cfg, key,
        validators=validators,
        update_model_fn=make_update_model_fn() if validators else None,
        steps_per_epoch=config.get("training", {}).get("epoch_length"),
        sweep_trial=sweep_trial,
        sweep_validator=config.get("training", {}).get("sweep_validator", "validation"),
    )


if __name__ == "__main__":
    main()
