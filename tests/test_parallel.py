"""Multi-device tests on the virtual 8-device CPU mesh: batch-sharded
DDIM sampling and the mesh/sharding helpers (the DP training step is covered
by test_training + __graft_entry__.dryrun_multichip)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

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
            t1.global_step,
        )
        t1.global_step += 1
    path = t1.save_checkpoint("last")
    w1 = np.asarray(t1.params["params"]["w"])

    t2 = Trainer(ToyTask(), str(tmp_path / "run2"), base_learning_rate=0.1,
                 batch_size=2, mesh=mesh, scale_lr=False)
    t2.setup(restore_path=path, resume=True)
    assert t2.global_step == 3
    np.testing.assert_allclose(np.asarray(t2.params["params"]["w"]), w1)
