"""Config sanity: the shipped live configs must instantiate end to end
(without running the networks)."""

import os

import pytest

from mug_diffusion_tpu.utils.config import (
    apply_dotlist,
    instantiate_from_config,
    load_config,
)

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_live_diffusion_config_instantiates():
    cfg = load_config(os.path.join(ROOT, "configs/mug/mug_diffusion_tpu.yaml"))
    ddpm = instantiate_from_config(cfg["model"])
    assert ddpm.num_timesteps == 1000
    assert ddpm.z_channels == 16 and ddpm.z_length == 512
    assert ddpm.loss_type == "smooth_l1"
    assert ddpm.parameterization == "eps"
    # unet topology matches the reference live config
    p = ddpm.model.unet_config["params"]
    assert list(p["channel_mult"]) == [1, 2, 3, 4]
    assert list(p["audio_channels"]) == [256, 512, 512, 512]
    assert p["s4_layer"] is True


def test_live_vae_config_instantiates():
    cfg = load_config(os.path.join(ROOT, "configs/mug/autoencoder_tpu.yaml"))
    from mug_diffusion_tpu.training.tasks import AutoencoderTask, build_task

    task = build_task(cfg["model"])
    assert isinstance(task, AutoencoderTask)
    assert task.kl_weight == pytest.approx(1e-5)
    assert task.monitor == "val/loss"


def test_reference_config_aliases_resolve():
    """The reference's own YAML (with mug.* targets) must instantiate via
    the alias table — reference users can reuse their configs."""
    ref_cfg = "/root/reference/configs/mug/mug_diffusion.yaml"
    if not os.path.isfile(ref_cfg):
        pytest.skip("reference not mounted")
    cfg = load_config(ref_cfg)
    # the reference config points at its repo-relative feature yaml and a
    # nonexistent ckpt; patch those two paths
    cfg = apply_dotlist(cfg, [
        "model.params.cond_stage_config.params.path_to_yaml="
        + os.path.join(ROOT, "configs/mug/mania_beatmap_features.yaml"),
        "model.params.ckpt_path=null",
    ])
    ddpm = instantiate_from_config(cfg["model"])
    assert ddpm.num_timesteps == 1000
    assert ddpm.model.wave_stage_config["target"].endswith(
        "MelspectrogramScaleEncoder1D"
    )


def test_prompt_configs_parse():
    import yaml

    from mug_diffusion_tpu.utils.feature_codec import (
        feature_dict_to_embedding_ids,
        load_feature_yaml,
    )

    schema = load_feature_yaml(
        os.path.join(ROOT, "configs/mug/mania_beatmap_features.yaml")
    )
    for i in range(1, 5):
        with open(os.path.join(ROOT, f"configs/mapping/feature_{i}.yaml")) as f:
            d = yaml.safe_load(f)
        ids = feature_dict_to_embedding_ids(d, schema)
        assert len(ids) == 21
