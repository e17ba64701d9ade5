"""Every shipped YAML config parses and constructs its model/config
objects (no weights initialized — pure host-side construction), so a
README command can never point at a config the factories reject."""
import glob
import os

import pytest
import yaml

CONFIGS = sorted(glob.glob(os.path.join(os.path.dirname(__file__), "..", "configs", "*.yaml")))


@pytest.mark.parametrize("path", CONFIGS, ids=[os.path.basename(p) for p in CONFIGS])
def test_config_constructs(path):
    with open(path) as f:
        config = yaml.safe_load(f)

    if "model" in config:
        from scenedino_tpu.models.factory import make_model

        field = make_model(config["model"])
        assert field.cfg.d_out >= 1
        enc_conf = config["model"].get("encoder", {})
        if enc_conf.get("mode") == "upsample-gt":
            assert field.encoder.cfg.upsampler_arch is not None

    if "downstream" in config:
        from scenedino_tpu.models.downstream import SemanticHeadConfig

        SemanticHeadConfig.from_dict(config["downstream"])

    if config.get("mode") == "nvs" and "training" in config:
        rs = config["training"].get("ray_sampler", {}).get("args", {})
        if rs.get("dino_upscaled"):
            # upsample-gt configs must pair the per-pixel teacher with an
            # upsampler encoder mode
            assert config["model"]["encoder"]["mode"] == "upsample-gt"

    # validation blocks parse into SaveBestConfig
    for vconf in (config.get("validation") or {}).values():
        from scenedino_tpu.training.validation import SaveBestConfig

        SaveBestConfig.from_dict(vconf.get("save_best"))
