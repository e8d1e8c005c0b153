"""End-to-end training smoke tests on the 8-virtual-device CPU mesh.

The JAX analogue of the reference's scripts/local_test.sh and
parallel_test.sh: tiny model, synthetic data, a few steps — but with real
multi-device batch sharding (world-size-8 rather than the reference's
world-size-1 NCCL trick).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny_config import TINY_DISCRIMINATOR, TINY_INPUT, TINY_LOSS, TINY_MODEL

from uncertainty_model_tpu.models import RandomDiscriminator, RandomlyConnectedModel
from uncertainty_model_tpu.parallel import create_mesh
from uncertainty_model_tpu.train import Trainer, evaluate_model


def _batch(batch_size=8, seed=0):
    h, w = TINY_INPUT
    rng = np.random.default_rng(seed)
    return {
        "left": rng.uniform(size=(batch_size, h, w, 3)).astype(np.float32),
        "right": rng.uniform(size=(batch_size, h, w, 3)).astype(np.float32),
    }


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) == 8, "tests expect 8 virtual CPU devices"
    return create_mesh()


class TestTrainStep:
    def test_losses_finite_and_decreasing(self, mesh):
        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        trainer = Trainer(model, TINY_LOSS, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(0), (1, *TINY_INPUT, 3))

        batch = _batch()
        losses = []
        for i in range(5):
            state, (disp_scale, lr) = state, (0.3, 1e-3)
            from uncertainty_model_tpu.parallel import shard_batch

            sharded = shard_batch(batch, mesh)
            state, metrics = trainer._train_step(
                state, sharded, jnp.float32(disp_scale), jnp.float32(lr), jnp.int32(i)
            )
            metrics = jax.device_get(metrics)
            total = float(metrics["disp_loss"]) + float(metrics["error_loss"])
            assert np.isfinite(total)
            losses.append(total)

        # optimising the same batch must reduce the loss
        assert losses[-1] < losses[0]

    def test_adversarial_step(self, mesh):
        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        disc = RandomDiscriminator.from_config(**TINY_DISCRIMINATOR)
        trainer = Trainer(model, TINY_LOSS, disc=disc, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(1), (1, *TINY_INPUT, 3))

        from uncertainty_model_tpu.parallel import shard_batch

        batch = shard_batch(_batch(), mesh)
        for i in range(3):  # crosses perceptual_start=2
            state, metrics = trainer._train_step(
                state, batch, jnp.float32(0.3), jnp.float32(1e-3), jnp.int32(i)
            )
        metrics = jax.device_get(metrics)
        assert np.isfinite(float(metrics["disp_loss"]))
        assert np.isfinite(float(metrics["disc_loss"]))

    def test_lag_disc_bn_stats_immaterial(self, mesh):
        """The reference's lagged disc_clone accumulates BN buffer updates
        between refreshes (train/train.py:107,151-152); this trainer discards
        them.  The discard is provably immaterial — train-mode BatchNorm
        normalises by *batch* statistics and never reads the running buffers,
        and the clone is never applied in eval mode — so a step must be
        bit-identical under ANY perturbation of the stats the lagged clone
        sees.  (The live discriminator's own buffer stream is unaffected:
        it is threaded through disc_loss_fn exactly like the reference's.)"""
        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        disc = RandomDiscriminator.from_config(**TINY_DISCRIMINATOR)
        trainer = Trainer(model, TINY_LOSS, disc=disc, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(5), (1, *TINY_INPUT, 3))

        from uncertainty_model_tpu.parallel import shard_batch

        batch = shard_batch(_batch(seed=9), mesh)
        # step 3 is past perceptual_start=2, so BOTH lagged-clone call sites
        # (generator + perceptual) are live
        step = jnp.int32(3)

        perturbed = state.replace(
            disc_batch_stats=jax.tree.map(
                lambda s: s * 7.0 + 1.0, state.disc_batch_stats))
        # _train_step donates its state; the two calls must not share
        # buffers (perturbed aliases every non-perturbed leaf of state)
        state = jax.tree.map(jnp.copy, state)
        perturbed = jax.tree.map(jnp.copy, perturbed)

        out_a, m_a = trainer._train_step(
            state, batch, jnp.float32(0.3), jnp.float32(1e-3), step)
        out_b, m_b = trainer._train_step(
            perturbed, batch, jnp.float32(0.3), jnp.float32(1e-3), step)

        np.testing.assert_array_equal(
            np.asarray(jax.device_get(m_a["disp_loss"])),
            np.asarray(jax.device_get(m_b["disp_loss"])))
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(m_a["disc_loss"])),
            np.asarray(jax.device_get(m_b["disc_loss"])))
        for a, b in zip(jax.tree.leaves(jax.device_get(out_a.params)),
                        jax.tree.leaves(jax.device_get(out_b.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(jax.tree.leaves(jax.device_get(out_a.disc_params)),
                        jax.tree.leaves(jax.device_get(out_b.disc_params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    def test_epoch_loop_and_eval(self, mesh, tmp_path):
        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        trainer = Trainer(model, TINY_LOSS, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(2), (1, *TINY_INPUT, 3))

        loader = [_batch(seed=s) for s in range(2)]
        state, averages = trainer.train_one_epoch(state, loader, 0.3, 1e-3)
        assert np.isfinite(averages["disp"])

        (ssims, spars_metrics) = evaluate_model(
            model, state, loader, scale=0.3, mesh=mesh,
            save_evaluation_to=str(tmp_path), epoch_number=1, is_final=False,
        )
        assert np.isfinite(ssims[0]) and np.isfinite(ssims[1])
        assert np.isfinite(spars_metrics[0]) and np.isfinite(spars_metrics[1])
        assert (tmp_path / "epoch_001" / "prediction.png").exists()

    def test_checkpoint_roundtrip(self, mesh, tmp_path):
        """Params, Adam moments and the epoch number all survive a
        save/restore, and a restored run continues *identically* to an
        uninterrupted one (the reference restores weights only,
        main.py:126-137 — resume there restarts the optimiser)."""
        from uncertainty_model_tpu.parallel import shard_batch
        from uncertainty_model_tpu.train import load_checkpoint, save_checkpoint

        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        trainer = Trainer(model, TINY_LOSS, mesh=mesh)
        state = trainer.init_state(jax.random.PRNGKey(3), (1, *TINY_INPUT, 3))

        # one step so the Adam moments are non-trivial
        batch = shard_batch(_batch(seed=3), mesh)
        state, _ = trainer._train_step(
            state, batch, jnp.float32(0.3), jnp.float32(1e-3), jnp.int32(0))

        path = save_checkpoint(str(tmp_path), state, epoch_number=7)
        restored = load_checkpoint(path)
        assert int(restored["epoch"]) == 7

        orig = jax.device_get(state.params)
        for a, b in zip(jax.tree.leaves(orig), jax.tree.leaves(restored["params"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # optimizer moments survive
        orig_opt = jax.device_get(state.opt_state)
        assert restored["opt_state"] is not None
        for a, b in zip(jax.tree.leaves(orig_opt),
                        jax.tree.leaves(restored["opt_state"])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        # a restored state steps to bit-identical params
        resumed = trainer.load_state(
            {"params": restored["params"],
             "batch_stats": restored["batch_stats"],
             "opt_state": restored["opt_state"]})
        batch2 = shard_batch(_batch(seed=4), mesh)
        cont, _ = trainer._train_step(
            state, batch2, jnp.float32(0.3), jnp.float32(1e-3), jnp.int32(1))
        res, _ = trainer._train_step(
            resumed, batch2, jnp.float32(0.3), jnp.float32(1e-3), jnp.int32(1))
        for a, b in zip(jax.tree.leaves(jax.device_get(cont.params)),
                        jax.tree.leaves(jax.device_get(res.params))):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


class TestDcnMesh:
    def test_2d_mesh_train_step(self):
        """Multi-slice layout: 2-D (dcn, data) mesh, batch sharded over both
        axes — the reference's unsupported multi-node case (SURVEY §2.3)."""
        from uncertainty_model_tpu.parallel import create_mesh, shard_batch
        from uncertainty_model_tpu.train import Trainer

        mesh2d = create_mesh(dcn_axis="dcn", dcn_size=2)
        assert mesh2d.shape == {"dcn": 2, "data": 4}

        model = RandomlyConnectedModel.from_config(**TINY_MODEL)
        trainer = Trainer(model, TINY_LOSS, mesh=mesh2d)
        state = trainer.init_state(jax.random.PRNGKey(4), (1, *TINY_INPUT, 3))

        batch = shard_batch(_batch(batch_size=8, seed=9), mesh2d)
        state, metrics = trainer._train_step(
            state, batch, jnp.float32(0.3), jnp.float32(1e-3), jnp.int32(0))
        metrics = jax.device_get(metrics)
        assert np.isfinite(float(metrics["disp_loss"]))
        assert np.isfinite(float(metrics["error_loss"]))
