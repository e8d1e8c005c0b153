"""Training-dynamics golden parity: one full optimisation step vs the
reference (same weights, same batch, torch CPU vs JAX CPU).

This is the strongest end-to-end check: identical losses before the update
validates forward + every loss term; near-identical parameters after one
Adam step validates the whole backward pass and optimiser.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import yaml

from uncertainty_model_tpu.losses import TukraUncertaintyLoss
from uncertainty_model_tpu.models import RandomlyConnectedModel
from uncertainty_model_tpu.ops import reconstruct_pyramid, scale_pyramid
from uncertainty_model_tpu.train.convert import convert_model_state_dict

from reference_harness import import_reference

pytestmark = [pytest.mark.golden, pytest.mark.slow]

ref = pytest.importorskip("reference_harness").import_reference()
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def config():
    with open(f"{ref.root}/config.yml") as f:
        cfg = yaml.load(f, Loader=yaml.Loader)
    cfg["model"]["encoder"]["load_graph"] = ref.graph_dir
    return cfg


class TestTrainingStepParity:
    def test_losses_and_adam_update_match(self, config):
        torch.manual_seed(0)
        torch_model = ref.model.RandomlyConnectedModel(**config["model"])
        torch_model.train()
        torch_loss = ref.loss.TukraUncertaintyLoss(**config["loss"])
        optimiser = torch.optim.Adam(torch_model.parameters(), lr=1e-4)

        rng = np.random.default_rng(0)
        left = rng.uniform(size=(2, 3, 64, 128)).astype(np.float32)
        right = rng.uniform(size=(2, 3, 64, 128)).astype(np.float32)

        # ---- reference step (mirrors train/train.py:112-129) ----
        tl, tr = torch.from_numpy(left), torch.from_numpy(right)
        images = torch.cat([tl, tr], dim=1)
        image_pyramid = ref.utils.scale_pyramid(images, 4)
        optimiser.zero_grad()
        disparities = torch_model(tl, 0.5)
        recon_pyramid = ref.utils.reconstruct_pyramid(disparities, image_pyramid)
        disp_loss, error_loss = torch_loss(image_pyramid, disparities,
                                           recon_pyramid, 0, None)
        (disp_loss + error_loss).backward()
        optimiser.step()

        # ---- our step with converted initial weights ----
        torch.manual_seed(0)
        torch_init = ref.model.RandomlyConnectedModel(**config["model"])
        variables = convert_model_state_dict(
            torch_init.state_dict(), config["model"]["decoder"]["layers"]
        )
        jax_model = RandomlyConnectedModel.from_config(**config["model"])
        jax_loss = TukraUncertaintyLoss(**config["loss"])

        jl = jnp.asarray(left.transpose(0, 2, 3, 1))
        jr = jnp.asarray(right.transpose(0, 2, 3, 1))

        def loss_fn(params):
            imgs = jnp.concatenate([jl, jr], axis=-1)
            pyr = scale_pyramid(imgs, 4)
            disps, _ = jax_model.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                jl, disp_scale=0.5, train=True, mutable=["batch_stats"],
            )
            recon = reconstruct_pyramid(disps, pyr)
            d, e = jax_loss(pyr, disps, recon, step=jnp.int32(0))
            return d + e, (d, e)

        (_, (got_disp, got_err)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(variables["params"])

        np.testing.assert_allclose(float(got_disp), float(disp_loss), rtol=3e-5)
        np.testing.assert_allclose(float(got_err), float(error_loss), rtol=3e-5)

        # ---- gradient parity ----
        # Convert torch grads through the same state-dict mapping (grads have
        # the same keys as weights; BN running stats pass through unused).
        grad_sd = dict(torch_init.state_dict())
        for name, p in torch_model.named_parameters():
            grad_sd[name] = p.grad.detach()
        ref_grads = convert_model_state_dict(
            grad_sd, config["model"]["decoder"]["layers"]
        )["params"]

        flat_ours = dict(jax.tree_util.tree_flatten_with_path(grads)[0])
        flat_ref = dict(jax.tree_util.tree_flatten_with_path(ref_grads)[0])
        assert flat_ours.keys() == flat_ref.keys()
        assert len(flat_ours) > 100

        for path in flat_ours:
            ours = np.asarray(flat_ours[path], np.float64)
            theirs = np.asarray(flat_ref[path], np.float64)
            diff = np.linalg.norm(ours - theirs)
            scale = np.linalg.norm(theirs)
            # Deep-network f32 accumulation puts honest gradients within
            # ~1e-3 relative; heavily-cancelling scalar reductions (the
            # NodeBlock mean_weights, which BN makes near-scale-invariant)
            # carry absolute f32 noise in BOTH frameworks, hence the floor.
            assert diff < max(5e-3 * scale, 5e-3), (
                f"grad mismatch at {jax.tree_util.keystr(path)}: "
                f"|diff|={diff:.3e} |ref|={scale:.3e}"
            )
