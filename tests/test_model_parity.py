"""Whole-model golden parity: our JAX model vs the actual reference (CPU).

The reference implementation is imported from /root/reference (no code is
copied); its randomly-initialised weights are converted with
``convert_model_state_dict`` and both models run the same input.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
import yaml

from uncertainty_model_tpu.models import RandomlyConnectedModel, RandomDiscriminator
from uncertainty_model_tpu.train.convert import (
    convert_discriminator_state_dict,
    convert_model_state_dict,
)

from reference_harness import import_reference

pytestmark = [pytest.mark.golden]

ref = pytest.importorskip("reference_harness").import_reference()
torch = pytest.importorskip("torch")


@pytest.fixture(scope="module")
def config():
    with open(f"{ref.root}/config.yml") as f:
        cfg = yaml.load(f, Loader=yaml.Loader)
    cfg["model"]["encoder"]["load_graph"] = ref.graph_dir
    cfg["discriminator"]["load_graph"] = ref.graph_dir
    return cfg


@pytest.fixture(scope="module")
def torch_model(config):
    torch.manual_seed(0)
    model = ref.model.RandomlyConnectedModel(**config["model"])
    model.eval()
    return model


class TestModelParity:
    def test_eval_forward_matches(self, config, torch_model):
        jax_model = RandomlyConnectedModel.from_config(**config["model"])
        variables = convert_model_state_dict(
            torch_model.state_dict(), config["model"]["decoder"]["layers"]
        )

        rng = np.random.default_rng(0)
        x = rng.uniform(size=(2, 3, 64, 128)).astype(np.float32)

        with torch.no_grad():
            expected = torch_model(torch.from_numpy(x), scale=0.7)

        got = jax_model.apply(
            variables, jnp.asarray(x.transpose(0, 2, 3, 1)), disp_scale=0.7
        )

        exp = expected.numpy().transpose(0, 2, 3, 1)
        np.testing.assert_allclose(np.asarray(got[0]), exp, atol=2e-5)

    def test_train_forward_all_scales(self, config, torch_model):
        """Train-mode forward (batch stats) matches at every pyramid scale."""
        jax_model = RandomlyConnectedModel.from_config(**config["model"])
        variables = convert_model_state_dict(
            torch_model.state_dict(), config["model"]["decoder"]["layers"]
        )

        rng = np.random.default_rng(1)
        x = rng.uniform(size=(2, 3, 64, 128)).astype(np.float32)

        torch_model.train()
        try:
            with torch.no_grad():
                expected = torch_model(torch.from_numpy(x), scale=1.0)
        finally:
            torch_model.eval()

        got, _ = jax_model.apply(
            variables,
            jnp.asarray(x.transpose(0, 2, 3, 1)),
            disp_scale=1.0,
            train=True,
            mutable=["batch_stats"],
        )

        assert len(got) == len(expected) == 4
        for ours, theirs in zip(got, expected):
            exp = theirs.numpy().transpose(0, 2, 3, 1)
            np.testing.assert_allclose(np.asarray(ours), exp, atol=2e-4)

    def test_param_count_matches(self, config, torch_model):
        jax_model = RandomlyConnectedModel.from_config(**config["model"])
        variables = jax_model.init(
            jax.random.PRNGKey(0), jnp.zeros((1, 64, 128, 3)), disp_scale=1.0
        )
        n_jax = sum(p.size for p in jax.tree.leaves(variables["params"]))
        n_torch = sum(p.numel() for p in torch_model.parameters())
        assert n_jax == n_torch


class TestDiscriminatorParity:
    def test_forward_and_features_match(self, config):
        torch.manual_seed(1)
        torch_disc = ref.model.RandomDiscriminator(**config["discriminator"])
        torch_disc.eval()

        jax_disc = RandomDiscriminator.from_config(**config["discriminator"])
        # 64x128 input -> final feature 2x4 after 5 stride-2 stages, but the
        # linear head was sized for 256x512; rebuild at the production size.
        rng = np.random.default_rng(2)
        pyramid_np = [
            rng.uniform(size=(1, 6, 256 // 2**i, 512 // 2**i)).astype(np.float32)
            for i in range(4)
        ]

        variables = convert_discriminator_state_dict(
            torch_disc.state_dict(),
            num_layers=len(config["discriminator"]["layers"]),
            final_feature_hw=(8, 16),
        )

        with torch.no_grad():
            expected = torch_disc([torch.from_numpy(p) for p in pyramid_np])
            expected_feats = torch_disc.features(
                [torch.from_numpy(p) for p in pyramid_np]
            )

        pyramid = [jnp.asarray(p.transpose(0, 2, 3, 1)) for p in pyramid_np]
        got = jax_disc.apply(variables, pyramid)
        got_feats = jax_disc.apply(variables, pyramid, method="features")

        np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=1e-4)
        for ours, theirs in zip(got_feats, expected_feats):
            np.testing.assert_allclose(
                np.asarray(ours), theirs.numpy().transpose(0, 2, 3, 1), atol=2e-5
            )
