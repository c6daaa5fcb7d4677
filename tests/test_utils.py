"""Tests for config reflection, checkpoint surgery, and LR schedules."""

import numpy as np
import pytest

from mug_diffusion_tpu.utils.checkpoint import (
    apply_surgery,
    flatten_params,
    hit_parameter,
    merge_partial,
    trainable_mask,
    unflatten_params,
)
from mug_diffusion_tpu.utils.config import (
    apply_dotlist,
    instantiate_from_config,
    merge_configs,
    resolve_target,
)
from mug_diffusion_tpu.utils.lr_scheduler import (
    LambdaLinearScheduler,
    LambdaWarmUpCosineScheduler,
    LambdaWarmUpCosineScheduler2,
)


def test_instantiate_reference_alias():
    """Reference config targets must resolve to our classes."""
    assert resolve_target("mug.cond.feature.BeatmapFeatureEmbedder") == (
        "mug_diffusion_tpu.models.feature.BeatmapFeatureEmbedder"
    )
    obj = instantiate_from_config(
        {
            "target": "mug_diffusion_tpu.utils.lr_scheduler.LambdaLinearScheduler",
            "params": {
                "warm_up_steps": [0], "cycle_lengths": [100],
                "f_start": [1e-6], "f_max": [1.0], "f_min": [1.0],
            },
        }
    )
    assert isinstance(obj, LambdaLinearScheduler)


def test_merge_and_dotlist():
    base = {"model": {"params": {"a": 1, "b": 2}}, "x": 1}
    over = {"model": {"params": {"b": 3}}}
    merged = merge_configs(base, over)
    assert merged["model"]["params"] == {"a": 1, "b": 3}
    assert merged["x"] == 1

    out = apply_dotlist(merged, ["model.params.a=7.5", "y=true", "z=[1,2]"])
    assert out["model"]["params"]["a"] == 7.5
    assert out["y"] is True
    assert out["z"] == [1, 2]


def test_flatten_roundtrip():
    tree = {"a": {"b": np.zeros(3), "c": {"d": np.ones(2)}}}
    flat = flatten_params(tree)
    assert set(flat) == {"a.b", "a.c.d"}
    back = unflatten_params(flat)
    assert back["a"]["c"]["d"].shape == (2,)


def test_hit_parameter():
    # prefix and #substring modes (ref: diffusion.py:470-475)
    assert hit_parameter("model.unet.conv", "model.unet")
    assert not hit_parameter("model.unet.conv", "unet")
    assert hit_parameter("model.unet.conv", "#unet")


def test_apply_surgery_and_merge():
    sd = {
        "model.first_stage.enc.w": np.ones(2),
        "model.unet.w": np.ones(3),
        "model.unet.b": np.ones(4),
    }
    # ignore_keys drops by prefix
    out = apply_surgery(sd, ignore_keys=["model.first_stage"])
    assert "model.first_stage.enc.w" not in out

    # remove_prefix remaps
    out = apply_surgery(sd, remove_prefix="model.unet.")
    assert set(out) == {"w", "b"}

    target = {"w": np.zeros(3), "b": np.zeros(4), "extra": np.zeros(1)}
    merged, missing, unexpected = merge_partial(target, out)
    assert missing == ["extra"]
    assert not unexpected
    np.testing.assert_array_equal(np.asarray(merged["w"]), np.ones(3))

    # shape mismatch is reported, not applied
    bad = {"w": np.zeros((9,))}
    merged2, _, unexpected2 = merge_partial(target, bad)
    assert any("shape mismatch" in u for u in unexpected2)
    np.testing.assert_array_equal(np.asarray(merged2["w"]), np.zeros(3))


def test_trainable_mask():
    params = {
        "first_stage_model": {"enc": np.zeros(1)},
        "unet_model": {"w": np.zeros(1)},
        "wave_model": {"w": np.zeros(1)},
    }
    mask = trainable_mask(params, frozen_prefixes=("first_stage_model",))
    assert mask["first_stage_model"]["enc"] is False
    assert mask["unet_model"]["w"] is True

    mask2 = trainable_mask(params, training_keys=["unet_model"])
    assert mask2["unet_model"]["w"] is True
    assert mask2["wave_model"]["w"] is False


def test_lambda_linear_scheduler():
    # live config: warmup 0 steps, f constant 1 (ref mug_diffusion.yaml:19-27)
    s = LambdaLinearScheduler(
        warm_up_steps=[0], cycle_lengths=[10_000_000_000],
        f_start=[1e-6], f_max=[1.0], f_min=[1.0],
    )
    assert s(0) == pytest.approx(1.0, abs=1e-5)
    assert s(1000) == pytest.approx(1.0, abs=1e-5)

    # warmup ramp
    s2 = LambdaLinearScheduler(
        warm_up_steps=[100], cycle_lengths=[1000],
        f_start=[0.0], f_max=[1.0], f_min=[0.0],
    )
    assert s2(0) == pytest.approx(0.0)
    assert s2(50) == pytest.approx(0.5)
    assert s2(100) == pytest.approx(0.9)  # linear decay from there
    assert s2(1000) == pytest.approx(0.0)


def test_warmup_cosine_schedulers():
    s = LambdaWarmUpCosineScheduler(
        warm_up_steps=10, lr_min=0.0, lr_max=1.0, lr_start=0.0,
        max_decay_steps=110,
    )
    assert s(5) == pytest.approx(0.5)
    assert s(10) == pytest.approx(1.0)
    assert s(60) == pytest.approx(0.5, abs=1e-6)  # cosine midpoint
    assert s(110) == pytest.approx(0.0, abs=1e-6)

    s2 = LambdaWarmUpCosineScheduler2(
        warm_up_steps=[10], f_min=[0.1], f_max=[1.0], f_start=[0.0],
        cycle_lengths=[110],
    )
    assert s2(10) == pytest.approx(1.0)
    assert s2(110) == pytest.approx(0.1, abs=1e-6)


def test_opt_state_survives_orbax_roundtrip(tmp_path):
    """Resume must restore Adam moments and the schedule count EXACTLY:
    orbax lowers optax's namedtuples/tuples to lists, which used to fail
    the structure match and silently reinitialize the optimizer on every
    resume (utils/checkpoint.py coerce_like)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from mug_diffusion_tpu.utils.checkpoint import (
        coerce_like,
        load_checkpoint,
        save_checkpoint,
    )

    params = {"params": {"w": jnp.ones((3, 2)), "b": jnp.zeros((2,))}}
    opt = optax.chain(
        optax.clip_by_global_norm(1.0),
        optax.adamw(optax.warmup_constant_schedule(0.0, 1e-3, 10)),
    )
    state = opt.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    for _ in range(3):  # make moments/count non-trivial
        updates, state = opt.update(grads, state, params)
        params = optax.apply_updates(params, updates)

    save_checkpoint(str(tmp_path / "ck"), {"opt_state": state, "step": 3})
    restored = load_checkpoint(str(tmp_path / "ck"))

    # the raw restore no longer tree_maps against the live structure...
    with np.testing.assert_raises(ValueError):
        jax.tree_util.tree_map(
            lambda a, b: a, opt.init(params), restored["opt_state"]
        )
    # ...but coerce_like rebuilds it bitwise with the live treedef
    coerced = coerce_like(opt.init(params), restored["opt_state"])
    assert (
        jax.tree_util.tree_structure(coerced)
        == jax.tree_util.tree_structure(state)
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(coerced),
        jax.tree_util.tree_leaves(state),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # a changed optimizer recipe must refuse, not mis-zip
    other = optax.adam(1e-3).init(params)
    with np.testing.assert_raises(ValueError):
        coerce_like(other, restored["opt_state"])
