"""Training-mode space-to-depth encoder stages must match the direct path:
same forward, same batch-stat updates, same gradients (the s2d conv is the
same linear map with a transformed kernel; BN statistics are computed per
original channel across the four phases — see models/layers.py ConvBNELU).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tiny_config import TINY_INPUT, TINY_MODEL

from uncertainty_model_tpu.models import RandomlyConnectedModel

ENC = {
    **TINY_MODEL["encoder"],
    "layers": [
        {"in_channels": 3, "out_channels": 8, "kernel_size": 7, "heads": 2},
        {"in_channels": 8, "out_channels": 8, "kernel_size": 5, "heads": 2},
        *TINY_MODEL["encoder"]["layers"][2:],
    ],
}
CFG = {"encoder": ENC, "decoder": TINY_MODEL["decoder"]}


@pytest.fixture(scope="module")
def models():
    direct = RandomlyConnectedModel.from_config(**CFG)
    s2d = RandomlyConnectedModel.from_config(**CFG, s2d_stages=(0, 1))
    variables = direct.init(jax.random.PRNGKey(0),
                            jnp.zeros((1, *TINY_INPUT, 3)), disp_scale=1.0)
    return direct, s2d, variables


def test_same_param_tree(models):
    direct, s2d, variables = models
    v2 = s2d.init(jax.random.PRNGKey(0), jnp.zeros((1, *TINY_INPUT, 3)),
                  disp_scale=1.0)
    assert jax.tree.structure(variables) == jax.tree.structure(v2)
    for a, b in zip(jax.tree.leaves(variables), jax.tree.leaves(v2)):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_train_forward_and_stats_match(models):
    direct, s2d, variables = models
    x = jax.random.uniform(jax.random.PRNGKey(1), (2, *TINY_INPUT, 3))

    out_a, mut_a = direct.apply(variables, x, disp_scale=0.5, train=True,
                                mutable=["batch_stats"])
    out_b, mut_b = s2d.apply(variables, x, disp_scale=0.5, train=True,
                             mutable=["batch_stats"])
    for a, b in zip(out_a, out_b):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)
    for a, b in zip(jax.tree.leaves(mut_a), jax.tree.leaves(mut_b)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_gradients_match(models):
    direct, s2d, variables = models
    x = jax.random.uniform(jax.random.PRNGKey(2), (2, *TINY_INPUT, 3))

    def loss(model, params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, disp_scale=0.5, train=True, mutable=["batch_stats"])
        return sum(jnp.mean(jnp.abs(o)) for o in out)

    g_a = jax.grad(lambda p: loss(direct, p))(variables["params"])
    g_b = jax.grad(lambda p: loss(s2d, p))(variables["params"])
    # identical tree structures -> identical deterministic leaf order
    for (pa, a), (pb, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_a),
        jax.tree_util.tree_leaves_with_path(g_b),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-3, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa))
