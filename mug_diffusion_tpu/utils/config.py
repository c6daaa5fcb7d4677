"""Config system: YAML `target:`/`params:` reflection + layered merge.

Mirrors the reference's OmegaConf-based wiring (ref: mug/util.py:93-108,
main.py:529-548) without the OmegaConf dependency: plain YAML dicts,
deep-merged left-to-right, with CLI ``nested.key=value`` dot-list overrides.
The layer boundary of the framework IS this config schema, same as the
reference.
"""

from __future__ import annotations

import ast
import copy
import importlib
from typing import Any, Sequence

import yaml


def get_obj_from_str(string: str, reload: bool = False):
    """Resolve a dotted path to a Python object (ref: mug/util.py:103-108)."""
    module, cls = string.rsplit(".", 1)
    mod = importlib.import_module(module)
    if reload:
        importlib.reload(mod)
    return getattr(mod, cls)


# Aliases so that configs written for the reference keep working verbatim.
# Maps reference dotted targets -> our equivalents.
TARGET_ALIASES = {
    "mug.diffusion.diffusion.DDPM": "mug_diffusion_tpu.diffusion.ddpm.DDPM",
    "mug.diffusion.unet.UNetModel": "mug_diffusion_tpu.models.unet.UNetModel",
    "mug.firststage.autoencoder.AutoencoderKL":
        "mug_diffusion_tpu.models.autoencoder.AutoencoderKL",
    "mug.firststage.losses.ManiaReconstructLoss":
        "mug_diffusion_tpu.models.losses.ManiaReconstructLoss",
    "mug.cond.wave.MelspectrogramScaleEncoder1D":
        "mug_diffusion_tpu.models.wave.MelspectrogramScaleEncoder1D",
    "mug.cond.feature.BeatmapFeatureEmbedder":
        "mug_diffusion_tpu.models.feature.BeatmapFeatureEmbedder",
    "ldm.lr_scheduler.LambdaLinearScheduler":
        "mug_diffusion_tpu.utils.lr_scheduler.LambdaLinearScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler":
        "mug_diffusion_tpu.utils.lr_scheduler.LambdaWarmUpCosineScheduler",
    "ldm.lr_scheduler.LambdaWarmUpCosineScheduler2":
        "mug_diffusion_tpu.utils.lr_scheduler.LambdaWarmUpCosineScheduler2",
    "mug.data.dataset.OsuTrainDataset":
        "mug_diffusion_tpu.data.dataset.OsuTrainDataset",
    "mug.data.dataset.OsuValidDataset":
        "mug_diffusion_tpu.data.dataset.OsuValidDataset",
    "mug.data.dataset.BeatmapLogger":
        "mug_diffusion_tpu.data.dataset.BeatmapLogger",
    "main.DataModuleFromConfig":
        "mug_diffusion_tpu.training.datamodule.DataModuleFromConfig",
    "torch.nn.Identity": "mug_diffusion_tpu.utils.config.Identity",
}


class Identity:
    """Stand-in for torch.nn.Identity used as a null loss in reference configs."""

    def __call__(self, *args, **kwargs):
        raise RuntimeError("Identity loss should never be called")


def resolve_target(target: str) -> str:
    return TARGET_ALIASES.get(target, target)


def instantiate_from_config(config: dict, **extra_kwargs):
    """Instantiate an object from a {'target': ..., 'params': {...}} dict
    (ref: mug/util.py:93-100). Accepts any Mapping (flax freezes dict
    attributes into FrozenDicts)."""
    from collections.abc import Mapping

    if not isinstance(config, Mapping) or "target" not in config:
        if config in ("__is_first_stage__", "__is_unconditional__"):
            return None
        raise KeyError(f"Expected key `target` to instantiate, got: {config!r}")
    cls = get_obj_from_str(resolve_target(config["target"]))
    params = dict(config.get("params", {}) or {})
    params.update(extra_kwargs)
    return cls(**params)


def load_config(*paths: str) -> dict:
    """Load and deep-merge YAML config files left-to-right
    (ref: main.py:529-531)."""
    merged: dict = {}
    for p in paths:
        with open(p) as f:
            cfg = yaml.safe_load(f) or {}
        merged = merge_configs(merged, cfg)
    return merged


def merge_configs(base: dict, override: dict) -> dict:
    out = copy.deepcopy(base)
    for k, v in override.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = merge_configs(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _parse_value(text: str) -> Any:
    try:
        return ast.literal_eval(text)
    except (ValueError, SyntaxError):
        lowered = text.lower()
        if lowered in ("true", "false"):
            return lowered == "true"
        if lowered in ("null", "none"):
            return None
        return text


def apply_dotlist(config: dict, dotlist: Sequence[str]) -> dict:
    """Apply CLI overrides of the form ``nested.key=value``
    (ref: main.py:529-531 OmegaConf.from_dotlist)."""
    out = copy.deepcopy(config)
    for item in dotlist:
        if "=" not in item:
            raise ValueError(f"Override must be key=value, got: {item}")
        key, value = item.split("=", 1)
        node = out
        parts = key.split(".")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = _parse_value(value)
    return out
