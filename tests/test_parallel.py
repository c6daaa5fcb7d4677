"""Multi-device tests on the virtual 8-device CPU mesh: batch-sharded
DDIM sampling and the mesh/sharding helpers (the DP training step is covered
by test_training + __graft_entry__.dryrun_multichip)."""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from mug_diffusion_tpu.parallel.mesh import (
    batch_sharding,
    create_mesh,
    pad_batch_to_multiple,
    replicated_sharding,
    shard_batch,
)


def test_create_mesh_shapes():
    mesh = create_mesh()
    assert int(np.prod(mesh.devices.shape)) == len(jax.devices())
    mesh2 = create_mesh(n_devices=4, axes=("data", "model"), shape=(2, 2))
    assert mesh2.devices.shape == (2, 2)
    assert mesh2.axis_names == ("data", "model")


def test_shard_batch_places_on_mesh():
    mesh = create_mesh(n_devices=8)
    batch = {"x": np.arange(32, dtype=np.float32).reshape(8, 4)}
    dev = shard_batch(batch, mesh)
    x = dev["x"]
    assert x.sharding.is_equivalent_to(batch_sharding(mesh), ndim=2)
    np.testing.assert_array_equal(np.asarray(x), batch["x"])


def test_pad_batch_to_multiple():
    batch = {"x": np.ones((5, 3), np.float32)}
    out = pad_batch_to_multiple(batch, 8)
    assert out["x"].shape == (8, 3)
    np.testing.assert_array_equal(out["x"][5:], 0)


def test_sharded_ddim_sampling():
    """Serving-style DP: sample a batch of 8 charts sharded 1-per-device;
    results must equal the unsharded run (SPMD is numerics-preserving)."""
    from mug_diffusion_tpu.diffusion.ddim import DDIMSampler
    from mug_diffusion_tpu.diffusion.schedules import DiffusionSchedule

    class StubDDPM:
        def __init__(self):
            self.schedule = DiffusionSchedule.create(timesteps=100)
            self.num_timesteps = 100
            self.z_channels = 4
            self.z_length = 8

        def apply_model(self, params, x, t, c, w):
            return 0.2 * x

        def q_sample(self, x0, t, noise):
            return x0

    mesh = create_mesh(n_devices=8)
    model = StubDDPM()
    sampler = DDIMSampler(model)

    x_T = jax.random.normal(jax.random.PRNGKey(0), (8, 8, 4))
    ref, _ = sampler.sample(S=10, c=None, w=[], batch_size=8, params={},
                            rng=jax.random.PRNGKey(1), x_T=x_T, eta=0.0)

    x_T_sharded = jax.device_put(x_T, batch_sharding(mesh))
    sharded, _ = sampler.sample(S=10, c=None, w=[], batch_size=8, params={},
                                rng=jax.random.PRNGKey(1), x_T=x_T_sharded,
                                eta=0.0)
    # the scan consumed sharded inputs; output values identical
    np.testing.assert_allclose(np.asarray(sharded), np.asarray(ref),
                               atol=1e-6)


def test_trainer_resume_roundtrip(tmp_path):
    """save -> resume restores params, opt_state and global step."""
    import optax

    from mug_diffusion_tpu.training.trainer import Trainer

    class ToyTask:
        config = {"params": {}}
        monitor = "val/loss"

        def init_params(self, rng, batch_spec=None):
            return {"params": {"w": jnp.zeros((4,))}}

        def loss_fn(self, params, batch, rng, train=True, **kw):
            loss = jnp.sum((params["params"]["w"] - batch["y"]) ** 2)
            return loss, {"train/loss": loss}

        def validation_metrics(self, params, batch, rng, batch_idx):
            return {}

        def make_optimizer(self, params, lr):
            return optax.sgd(lr)

    mesh = create_mesh(n_devices=2)
    t1 = Trainer(ToyTask(), str(tmp_path / "run"), base_learning_rate=0.1,
                 batch_size=2, mesh=mesh, scale_lr=False)
    t1.setup()
    batch = {"y": np.ones((2, 4), np.float32)}
    dev = t1._device_batch(batch)
    for _ in range(3):
        t1.params, t1.opt_state, loss, logs = t1._train_step(
            t1.params, t1.opt_state, dev, jax.random.PRNGKey(0),
        )
        t1.global_step += 1
    path = t1.save_checkpoint("last")
    w1 = np.asarray(t1.params["params"]["w"])

    t2 = Trainer(ToyTask(), str(tmp_path / "run2"), base_learning_rate=0.1,
                 batch_size=2, mesh=mesh, scale_lr=False)
    t2.setup(restore_path=path, resume=True)
    assert t2.global_step == 3
    np.testing.assert_allclose(np.asarray(t2.params["params"]["w"]), w1)


def _tiny_ddpm():
    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    cfg = _model_config(tiny=True)
    cfg["params"]["compute_dtype"] = "float32"
    return instantiate_from_config(cfg)


def test_dp_gradient_equivalence_8dev_vs_single():
    """An 8-device data-parallel training step must produce the same updated
    parameters as a single-device step on the same global batch (the psum
    mean over shards equals the full-batch mean)."""
    import optax

    from mug_diffusion_tpu.utils.checkpoint import trainable_mask

    ddpm = _tiny_ddpm()
    B, z_len = 8, 16
    note_len, mel_len = z_len * 8, z_len * 4  # tiny wave: 4 levels, unet 2
    rng = jax.random.PRNGKey(0)
    variables = ddpm.init_params(
        rng, {"batch": 1, "z_length": z_len, "mel_length": mel_len,
              "n_mels": 16},
    )
    mask = {
        "params": trainable_mask(
            variables["params"], frozen_prefixes=("first_stage_model",)
        )
    }
    optimizer = optax.chain(
        optax.adamw(1e-2),
        optax.masked(optax.set_to_zero(),
                     jax.tree_util.tree_map(lambda t: not t, mask)),
    )
    opt_state = optimizer.init(variables)

    k = jax.random.PRNGKey
    batch = {
        "note": (jax.random.uniform(k(1), (B, note_len, 16)) > 0.9).astype(
            jnp.float32),
        "audio": 0.1 * jax.random.normal(k(2), (B, mel_len, 16)),
        "feature": jnp.zeros((B, 21), jnp.int32),
        "valid_flag": jnp.ones((B, note_len)),
    }

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(p, batch, rng, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    step_rng = jax.random.PRNGKey(42)

    # single device (default placement)
    p1, loss1 = jax.jit(train_step)(variables, opt_state, batch, step_rng)

    # 8-device DP mesh
    mesh = create_mesh(n_devices=8, axes=("data",))
    rep, data = replicated_sharding(mesh), batch_sharding(mesh)
    step8 = jax.jit(train_step, in_shardings=(rep, rep, data, rep),
                    out_shardings=(rep, rep))
    dev_batch = shard_batch(
        {kk: np.asarray(v) for kk, v in batch.items()}, mesh
    )
    p8, loss8 = step8(variables, opt_state, dev_batch, step_rng)

    assert np.allclose(float(loss1), float(loss8), atol=1e-5)
    flat1 = jax.tree_util.tree_leaves(p1)
    flat8 = jax.tree_util.tree_leaves(p8)
    for a, b in zip(flat1, flat8):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_trainer_multidevice_grad_accumulation(tmp_path):
    """Trainer on a 2-device mesh with accumulate_grad_batches=2 through
    optax.MultiSteps: parameters must change only every 2nd micro-batch."""
    from __graft_entry__ import _model_config
    from mug_diffusion_tpu.training.tasks import build_task
    from mug_diffusion_tpu.training.trainer import Trainer

    cfg = _model_config(tiny=True)
    cfg["params"]["compute_dtype"] = "float32"
    cfg["base_learning_rate"] = 1e-3
    task = build_task(cfg)
    mesh = create_mesh(n_devices=2, axes=("data",))
    trainer = Trainer(
        task=task, logdir=str(tmp_path / "logs"), base_learning_rate=1e-3,
        batch_size=2, accumulate_grad_batches=2, mesh=mesh, max_steps=4,
        log_every_n_steps=1, ckpt_every_n_steps=None,
    )
    z_len = 16
    trainer.setup(batch_spec={
        "batch": 2, "z_length": z_len, "n_mels": 16,
        "mel_length": z_len * 4,
    })

    note_len, mel_len = z_len * 8, z_len * 4
    rng = np.random.default_rng(0)

    def micro_batch():
        return {
            "note": (rng.random((2, note_len, 16)) > 0.9).astype(np.float32),
            "audio": 0.1 * rng.standard_normal(
                (2, mel_len, 16)).astype(np.float32),
            "feature": np.zeros((2, 21), np.int32),
            "valid_flag": np.ones((2, note_len), np.float32),
        }

    def unet_leaf(params):
        flat = jax.tree_util.tree_leaves(params["params"]["unet_model"])
        return np.asarray(flat[0]).copy()

    before = unet_leaf(trainer.params)
    step_key = jax.random.PRNGKey(9)

    def micro_step(batch):
        dev_batch = trainer._device_batch(batch)
        trainer.params, trainer.opt_state, loss, _ = trainer._train_step(
            trainer.params, trainer.opt_state, dev_batch, step_key,
        )
        return float(np.asarray(loss))

    l1 = micro_step(micro_batch())                  # micro 1: accumulate
    after1 = unet_leaf(trainer.params)
    l2 = micro_step(micro_batch())                  # micro 2: apply
    after2 = unet_leaf(trainer.params)

    assert np.isfinite(l1) and np.isfinite(l2)
    np.testing.assert_array_equal(before, after1)   # no update yet
    assert np.abs(after2 - before).max() > 0        # applied after k=2


def test_sharded_fused_generate_matches_unsharded():
    """Multi-chip serving: the fused single-dispatch generation path with
    the chart batch sharded over a 4-device 'data' mesh must reproduce the
    single-device result exactly (SPMD partitioning is numerics-preserving;
    the reference has no multi-GPU inference at all — webui.py:369 runs on
    one device)."""
    from mug_diffusion_tpu.apps.serving import build_fused_generate
    from mug_diffusion_tpu.utils.config import instantiate_from_config

    from tests.test_pipeline import tiny_config

    ddpm = instantiate_from_config(tiny_config()["model"])
    params = ddpm.init_params(
        jax.random.PRNGKey(7), {"batch": 1, "z_length": 8, "n_mels": 16}
    )

    count, steps, z_length = 4, 4, 8
    mel_frames = z_length * 8 * 8
    wave_samples = jnp.asarray(
        0.05 * np.random.RandomState(0).randn(mel_frames * 16)
    ).astype(jnp.float32)
    feature = jnp.zeros((count, 21), jnp.int32)
    uc_feature = jnp.ones((count, 21), jnp.int32)
    rng = jax.random.PRNGKey(5)
    kwargs = dict(
        steps=steps, scale=3.0, count=count, z_length=z_length,
        mel_frames=mel_frames, n_mels=16, n_fft=64,
    )

    ref = np.asarray(
        build_fused_generate(ddpm, **kwargs)(
            params, wave_samples, feature, uc_feature, rng
        )
    )

    mesh = create_mesh(n_devices=4, axes=("data",))
    fused_sharded = build_fused_generate(ddpm, mesh=mesh, **kwargs)
    out = fused_sharded(params, wave_samples, feature, uc_feature, rng)
    assert out.sharding.is_equivalent_to(batch_sharding(mesh), ndim=out.ndim)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5)

    # sequence sharding of the wave pyramid (SURVEY §2.4 stretch goal):
    # GSPMD splits the encoder's time axis (conv halos + attention gathers
    # inserted automatically), then reshards to the batch axis for the scan
    fused_seq = build_fused_generate(
        ddpm, mesh=mesh, shard_wave_time=True, **kwargs
    )
    out_seq = fused_seq(params, wave_samples, feature, uc_feature, rng)
    np.testing.assert_allclose(np.asarray(out_seq), ref, atol=1e-5)

    # count not divisible by the axis -> loud error, not silent misbatch
    with pytest.raises(ValueError):
        build_fused_generate(ddpm, mesh=mesh, count=3, steps=steps,
                             scale=3.0, z_length=z_length)

    # tensor-parallel serving: charts over `data`, attention/GEGLU matmuls
    # over `model` (parallel/tp.py layouts) in the SAME fused executable —
    # still numerically identical to single-device
    from mug_diffusion_tpu.parallel.tp import tp_shardings

    mesh2 = create_mesh(n_devices=4, axes=("data", "model"), shape=(2, 2))
    fused_tp = build_fused_generate(
        ddpm, mesh=mesh2, param_shardings=tp_shardings(params, mesh2),
        **kwargs,
    )
    out_tp = fused_tp(params, wave_samples, feature, uc_feature, rng)
    np.testing.assert_allclose(np.asarray(out_tp), ref, atol=1e-5)


def test_pipeline_mesh_divisibility_fallback():
    """GenerationPipeline(mesh=...) uses the mesh only when the request
    count divides the data axis; odd counts fall back to single-device."""
    from mug_diffusion_tpu.apps.pipeline import GenerationPipeline

    from tests.test_pipeline import tiny_config

    mesh = create_mesh(n_devices=4, axes=("data",))
    pipe = GenerationPipeline(tiny_config(), mesh=mesh)
    assert pipe._mesh_for(4) is mesh
    assert pipe._mesh_for(8) is mesh
    assert pipe._mesh_for(3) is None
    assert GenerationPipeline(tiny_config())._mesh_for(4) is None


def test_device_batch_pads_uneven_to_mesh(tmp_path):
    """An uneven batch (B % n_devices != 0) is padded by CYCLING real
    samples in _device_batch — not zeros (all-zero rows NaN GroupNorm
    stats) — and the jitted SPMD train step executes on it."""
    import optax

    from mug_diffusion_tpu.training.trainer import Trainer

    class ToyTask:
        config = {"params": {}}
        monitor = "val/loss"

        def init_params(self, rng, batch_spec=None):
            return {"params": {"w": jnp.zeros((4,))}}

        def loss_fn(self, params, batch, rng, train=True, **kw):
            loss = jnp.sum((params["params"]["w"] - batch["y"]) ** 2)
            return loss, {"train/loss": loss}

        def validation_metrics(self, params, batch, rng, batch_idx):
            return {}

        def make_optimizer(self, params, lr):
            return optax.sgd(lr)

    mesh = create_mesh(n_devices=4)
    t = Trainer(ToyTask(), str(tmp_path / "run"), base_learning_rate=0.1,
                batch_size=4, mesh=mesh, scale_lr=False)
    t.setup()
    batch = {"y": np.arange(6 * 4, dtype=np.float32).reshape(6, 4)}
    dev = t._device_batch(batch)
    assert dev["y"].shape == (8, 4)  # padded 6 -> 8
    # padding cycles rows 0,1 — not zeros
    np.testing.assert_array_equal(np.asarray(dev["y"])[6:], batch["y"][:2])
    t.params, t.opt_state, loss, _ = t._train_step(
        t.params, t.opt_state, dev, jax.random.PRNGKey(0),
    )
    assert np.isfinite(float(loss))


def test_tensor_parallel_step_matches_single_device():
    """Megatron-style TP over the mesh's `model` axis (parallel/tp.py):
    a (data=4, model=2) 2-D mesh train step with column/row-parallel
    attention + GEGLU weights must reproduce the single-device update —
    GSPMD inserts the TP all-reduces; the hints only change layout. Also
    asserts the qkv weights really are sharded (not silently replicated)."""
    import optax

    from mug_diffusion_tpu.parallel.mesh import (
        batch_sharding, create_mesh, replicated_sharding, shard_batch,
    )
    from mug_diffusion_tpu.parallel.tp import tp_shardings

    ddpm = _tiny_ddpm()
    B, z_len = 8, 16
    note_len, mel_len = z_len * 8, z_len * 4
    variables = ddpm.init_params(
        jax.random.PRNGKey(0),
        {"batch": 1, "z_length": z_len, "mel_length": mel_len,
         "n_mels": 16},
    )
    optimizer = optax.sgd(1e-2)  # stateless: no param-shaped opt leaves
    opt_state = optimizer.init(variables)

    k = jax.random.PRNGKey
    batch = {
        "note": (jax.random.uniform(k(1), (B, note_len, 16)) > 0.9).astype(
            jnp.float32),
        "audio": 0.1 * jax.random.normal(k(2), (B, mel_len, 16)),
        "feature": jnp.zeros((B, 21), jnp.int32),
        "valid_flag": jnp.ones((B, note_len)),
    }

    def train_step(params, opt_state, batch, rng):
        def loss_fn(p):
            loss, _ = ddpm.loss_fn(p, batch, rng, train=True)
            return loss

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), loss

    step_rng = jax.random.PRNGKey(42)
    p1, loss1 = jax.jit(train_step)(variables, opt_state, batch, step_rng)

    mesh = create_mesh(axes=("data", "model"), shape=(4, 2))
    tp = tp_shardings(variables, mesh)
    # weights matched by the rules must actually shard over `model`
    qkv_specs = [
        s.spec for path, s in jax.tree_util.tree_leaves_with_path(tp)
        if "to_q" in jax.tree_util.keystr(path)
        and "kernel" in jax.tree_util.keystr(path)
    ]
    assert qkv_specs and all("model" in str(s) for s in qkv_specs)

    # ResBlock conv pairs shard too: Conv_0 column (last dim), Conv_1 row
    # (second-to-last) — the conv-heavy majority of the model's FLOPs
    conv_specs = {
        ("Conv_0" if "Conv_0" in jax.tree_util.keystr(path) else "Conv_1"):
            s.spec
        for path, s in jax.tree_util.tree_leaves_with_path(tp)
        if re.search(r"Res(?:net)?Block[^']*_\d+'\]\['Conv_[01]'\]"
                     r"\['kernel'\]", jax.tree_util.keystr(path))
    }
    assert conv_specs["Conv_0"] == P(None, None, "model")
    assert conv_specs["Conv_1"] == P(None, "model", None)

    # the rules must cover the majority of trainable matmul/conv FLOPs
    # (VERDICT r3: attention-only TP sharded a minority)
    from mug_diffusion_tpu.parallel.tp import tp_param_coverage
    cov = tp_param_coverage(
        variables, 2, frozen_prefixes=("first_stage_model",))
    assert cov > 0.5, f"TP covers only {cov:.0%} of trainable kernel params"

    rep = replicated_sharding(mesh)
    step_tp = jax.jit(
        train_step,
        in_shardings=(tp, rep, batch_sharding(mesh), rep),
        out_shardings=(tp, rep),
    )
    dev_batch = shard_batch(
        {kk: np.asarray(v) for kk, v in batch.items()}, mesh
    )
    p2, loss2 = step_tp(variables, opt_state, dev_batch, step_rng)

    # the returned qkv weights carry the TP layout
    leaf = [
        v for path, v in jax.tree_util.tree_leaves_with_path(p2)
        if "to_q" in jax.tree_util.keystr(path)
        and "kernel" in jax.tree_util.keystr(path)
    ][0]
    assert "model" in str(leaf.sharding.spec)

    assert np.allclose(float(loss1), float(loss2), atol=1e-5)
    for a, b in zip(jax.tree_util.tree_leaves(p1),
                    jax.tree_util.tree_leaves(p2)):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-5, rtol=1e-4
        )


def test_multislice_hybrid_mesh_layout():
    """dcn_slices builds an outer 'replica' axis over slices ahead of the
    ICI axes; batch sharding spans (replica, data) jointly so the gradient
    all-reduce decomposes into intra-slice ICI + one cross-slice DCN sum
    (the scaling-book DP-over-DCN recipe). Virtual CPU devices exercise
    identical shardings/collectives via the enumeration fallback."""
    from jax.sharding import PartitionSpec as P

    mesh = create_mesh(n_devices=8, dcn_slices=2)
    assert mesh.axis_names == ("replica", "data")
    assert mesh.devices.shape == (2, 4)
    assert batch_sharding(mesh).spec == P(("replica", "data"))

    # hybrid with a model axis inside each slice
    mesh3 = create_mesh(
        n_devices=8, axes=("data", "model"), shape=(2, 2), dcn_slices=2
    )
    assert mesh3.axis_names == ("replica", "data", "model")
    assert mesh3.devices.shape == (2, 2, 2)
    assert batch_sharding(mesh3).spec == P(("replica", "data"))

    # every device holds exactly B/8 rows of a (replica, data)-sharded batch
    batch = {"x": np.arange(64, dtype=np.float32).reshape(16, 4)}
    dev = shard_batch(batch, mesh)
    shard_rows = {s.data.shape[0] for s in dev["x"].addressable_shards}
    assert shard_rows == {2}
    np.testing.assert_array_equal(np.asarray(dev["x"]), batch["x"])


def test_multislice_train_step_matches_single_device():
    """A jitted SGD step over the 2x4 (replica, data) hybrid mesh must
    produce the same updated weights as the unsharded step — the mean
    gradient psum spans both mesh axes."""
    k = jax.random.PRNGKey
    w = jax.random.normal(k(0), (4, 4))
    x = jax.random.normal(k(1), (16, 4))
    y = jax.random.normal(k(2), (16, 4))

    def step(w, x, y):
        def loss_fn(w):
            return jnp.mean((x @ w - y) ** 2)

        loss, g = jax.value_and_grad(loss_fn)(w)
        return w - 0.1 * g, loss

    w1, loss1 = jax.jit(step)(w, x, y)

    mesh = create_mesh(n_devices=8, dcn_slices=2)
    rep, data = replicated_sharding(mesh), batch_sharding(mesh)
    step_h = jax.jit(step, in_shardings=(rep, data, data),
                     out_shardings=(rep, rep))
    xs = shard_batch({"x": np.asarray(x), "y": np.asarray(y)}, mesh)
    w2, loss2 = step_h(jax.device_put(w, rep), xs["x"], xs["y"])

    assert np.allclose(float(loss1), float(loss2), atol=1e-6)
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               atol=1e-6, rtol=1e-6)
