"""Golden parity for the adversarial loss family vs the actual reference.

Covers (VERDICT round-1 gap #2):
  * ``generator_loss`` (mse and bce) vs reference GeneratorLoss
    (/root/reference/train/loss.py:308-337)
  * ``perceptual_loss`` vs reference PerceptualLoss (loss.py:267-305)
  * ``discriminator_loss`` vs reference run_discriminator
    (/root/reference/train/utils.py:248-273)
  * one full adversarial training step: generator losses (incl. the
    perceptual term through the lagged clone) + discriminator step with
    per-tensor gradient parity (mirrors train/train.py:107-152).

All tests run the discriminator in train mode (batch statistics), exactly
as the reference training loop does.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import yaml

from uncertainty_model_tpu.losses import (
    TukraUncertaintyLoss,
    discriminator_loss,
    generator_loss,
    perceptual_loss,
)
from uncertainty_model_tpu.models import RandomDiscriminator, RandomlyConnectedModel
from uncertainty_model_tpu.ops import reconstruct_pyramid, scale_pyramid
from uncertainty_model_tpu.train.convert import (
    convert_discriminator_state_dict,
    convert_model_state_dict,
)

from reference_harness import import_reference

pytestmark = [pytest.mark.golden, pytest.mark.slow]

ref = pytest.importorskip("reference_harness").import_reference()
torch = pytest.importorskip("torch")

H, W = 64, 128  # final disc feature map 2x4x256 -> linear_in_features 2048


@pytest.fixture(scope="module")
def config():
    with open(f"{ref.root}/config.yml") as f:
        cfg = yaml.load(f, Loader=yaml.Loader)
    cfg["model"]["encoder"]["load_graph"] = ref.graph_dir
    cfg["discriminator"]["load_graph"] = ref.graph_dir
    cfg["discriminator"]["linear_in_features"] = 256 * (H // 32) * (W // 32)
    return cfg


@pytest.fixture(scope="module")
def discs(config):
    """(torch disc [train mode], jax disc, converted variables)."""
    torch.manual_seed(3)
    torch_disc = ref.model.RandomDiscriminator(**config["discriminator"])
    torch_disc.train()
    jax_disc = RandomDiscriminator.from_config(**config["discriminator"])
    variables = convert_discriminator_state_dict(
        torch_disc.state_dict(),
        num_layers=len(config["discriminator"]["layers"]),
        final_feature_hw=(H // 32, W // 32),
    )
    return torch_disc, jax_disc, variables


def _pyramids(seed, batch=2):
    rng = np.random.default_rng(seed)
    pyr_np = [
        rng.uniform(size=(batch, 6, H // 2**i, W // 2**i)).astype(np.float32)
        for i in range(4)
    ]
    torch_pyr = [torch.from_numpy(p) for p in pyr_np]
    jax_pyr = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in pyr_np]
    return torch_pyr, jax_pyr


def _disc_apply(jax_disc, variables):
    def apply(pyr):
        out, _ = jax_disc.apply(variables, pyr, train=True,
                                mutable=["batch_stats"])
        return out
    return apply


def _disc_features(jax_disc, variables):
    def apply(pyr):
        out, _ = jax_disc.apply(variables, pyr, train=True,
                                mutable=["batch_stats"], method="features")
        return out
    return apply


class TestAdversarialLossParity:
    @pytest.mark.parametrize("loss_type", ["mse", "bce"])
    def test_generator_loss(self, discs, loss_type):
        torch_disc, jax_disc, variables = discs
        torch_pyr, jax_pyr = _pyramids(10)

        torch_loss = ref.loss.GeneratorLoss(loss=loss_type)
        with torch.no_grad():
            expected = torch_loss(torch_pyr, torch_disc)

        got = generator_loss(jax_pyr, _disc_apply(jax_disc, variables),
                             loss_type)
        np.testing.assert_allclose(float(got), float(expected), rtol=2e-5)

    def test_perceptual_loss(self, discs):
        torch_disc, jax_disc, variables = discs
        torch_img, jax_img = _pyramids(11)
        torch_rec, jax_rec = _pyramids(12)

        torch_loss = ref.loss.PerceptualLoss()
        with torch.no_grad():
            expected = torch_loss(torch_img, torch_rec, torch_disc)

        got = perceptual_loss(jax_img, jax_rec,
                              _disc_features(jax_disc, variables))
        np.testing.assert_allclose(float(got), float(expected), rtol=2e-5)

    def test_run_discriminator(self, discs):
        torch_disc, jax_disc, variables = discs
        torch_img, jax_img = _pyramids(13)
        torch_rec, jax_rec = _pyramids(14)

        with torch.no_grad():
            expected = ref.utils.run_discriminator(
                torch_img, torch_rec, torch_disc, torch.nn.BCELoss(),
                batch_size=2,
            )

        got = discriminator_loss(jax_img, jax_rec,
                                 _disc_apply(jax_disc, variables),
                                 batch_size=2)
        np.testing.assert_allclose(float(got), float(expected), rtol=2e-5)


class TestAdversarialTrainStepParity:
    def test_generator_and_disc_step(self, config):
        """One adversarial iteration (train/train.py:107-152): generator
        losses through the lagged disc clone (perceptual active at batch 0),
        then the discriminator's own BCE step — losses and per-tensor disc
        gradients must match."""
        from copy import deepcopy

        torch.manual_seed(4)
        torch_model = ref.model.RandomlyConnectedModel(**config["model"])
        torch_model.train()
        torch.manual_seed(5)
        torch_disc = ref.model.RandomDiscriminator(**config["discriminator"])
        torch_disc.train()

        loss_cfg = dict(config["loss"])
        loss_cfg["perceptual_start"] = 0  # exercise the perceptual branch
        torch_loss = ref.loss.TukraUncertaintyLoss(**loss_cfg)

        rng = np.random.default_rng(6)
        left = rng.uniform(size=(2, 3, H, W)).astype(np.float32)
        right = rng.uniform(size=(2, 3, H, W)).astype(np.float32)

        # ---- reference iteration ----
        disc_clone = deepcopy(torch_disc)  # train.py:107
        tl, tr = torch.from_numpy(left), torch.from_numpy(right)
        images = torch.cat([tl, tr], dim=1)
        image_pyramid = ref.utils.scale_pyramid(images, 4)
        disparities = torch_model(tl, 0.5)
        recon_pyramid = ref.utils.reconstruct_pyramid(disparities, image_pyramid)
        disp_loss, error_loss = torch_loss(
            image_pyramid, disparities, recon_pyramid, 0, disc_clone)
        disc_loss = ref.utils.run_discriminator(
            image_pyramid, recon_pyramid, torch_disc, torch.nn.BCELoss(),
            batch_size=2)
        disc_loss.backward()

        # ---- ours, converted weights ----
        variables = convert_model_state_dict(
            torch_model.state_dict(), config["model"]["decoder"]["layers"])
        disc_vars = convert_discriminator_state_dict(
            torch_disc.state_dict(),
            num_layers=len(config["discriminator"]["layers"]),
            final_feature_hw=(H // 32, W // 32),
        )
        jax_model = RandomlyConnectedModel.from_config(**config["model"])
        jax_disc = RandomDiscriminator.from_config(**config["discriminator"])
        jax_loss = TukraUncertaintyLoss(**loss_cfg)

        jl = jnp.asarray(left.transpose(0, 2, 3, 1))
        jr = jnp.asarray(right.transpose(0, 2, 3, 1))
        imgs = jnp.concatenate([jl, jr], axis=-1)
        pyr = scale_pyramid(imgs, 4)
        disps, _ = jax_model.apply(
            variables, jl, disp_scale=0.5, train=True, mutable=["batch_stats"])
        recon = reconstruct_pyramid(disps, pyr)

        got_disp, got_err = jax_loss(
            pyr, disps, recon, step=jnp.int32(0),
            disc_apply=_disc_apply(jax_disc, disc_vars),
            disc_features=_disc_features(jax_disc, disc_vars),
        )
        np.testing.assert_allclose(float(got_disp), float(disp_loss), rtol=3e-5)
        np.testing.assert_allclose(float(got_err), float(error_loss), rtol=3e-5)

        def disc_loss_fn(params):
            def apply(p):
                out, _ = jax_disc.apply(
                    {"params": params,
                     "batch_stats": disc_vars["batch_stats"]},
                    p, train=True, mutable=["batch_stats"])
                return out
            return discriminator_loss(pyr, recon, apply, batch_size=2)

        got_disc, grads = jax.value_and_grad(disc_loss_fn)(disc_vars["params"])
        np.testing.assert_allclose(float(got_disc), float(disc_loss), rtol=3e-5)

        # disc gradient parity through the same state-dict conversion
        grad_sd = dict(torch_disc.state_dict())
        for name, p in torch_disc.named_parameters():
            grad_sd[name] = p.grad.detach()
        ref_grads = convert_discriminator_state_dict(
            grad_sd, num_layers=len(config["discriminator"]["layers"]),
            final_feature_hw=(H // 32, W // 32),
        )["params"]

        flat_ours = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
        assert flat_ours.keys() == flat_ref.keys()
        assert len(flat_ours) > 50
        for path in flat_ours:
            ours = np.asarray(flat_ours[path], np.float64)
            theirs = np.asarray(flat_ref[path], np.float64)
            diff = np.linalg.norm(ours - theirs)
            scale = np.linalg.norm(theirs)
            assert diff < max(5e-3 * scale, 5e-3), (
                f"disc grad mismatch at {jax.tree_util.keystr(path)}: "
                f"|diff|={diff:.3e} |ref|={scale:.3e}"
            )
