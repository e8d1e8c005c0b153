"""ops/pallas/gated_sum.py: the encoder NodeBlock gated input sum kernel
(interpret mode) against the plain XLA chain the serving path emits."""

import numpy as np
import jax.numpy as jnp
import pytest

import uncertainty_model_tpu.ops.pallas.gated_sum as gs


@pytest.fixture(autouse=True)
def _interpret():
    gs._INTERPRET = True
    yield
    gs._INTERPRET = False


def _chain(gates, xs):
    h = gates[0] * xs[0]
    for g, x in zip(gates[1:], xs[1:]):
        h = h + g * x
    return h


@pytest.mark.parametrize("k", [2, 3, 5])
def test_matches_xla_chain(k):
    rng = np.random.default_rng(k)
    xs = [jnp.asarray(rng.normal(size=(4, 16, 32, 32)), jnp.float32)
          for _ in range(k)]
    g = jnp.asarray(rng.uniform(0.1, 0.9, size=k), jnp.float32)
    out = gs.gated_sum(g, xs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_chain(g, xs)), rtol=1e-6,
                               atol=1e-6)


def test_bf16_f32_accumulate():
    rng = np.random.default_rng(0)
    xs = [jnp.asarray(rng.normal(size=(2, 8, 16, 64)), jnp.bfloat16)
          for _ in range(3)]
    g = jnp.asarray([0.25, 0.5, 0.75], jnp.float32)
    out = gs.gated_sum(g, xs)
    assert out.dtype == jnp.bfloat16
    ref = _chain([v.astype(jnp.float32) for v in g],
                 [x.astype(jnp.float32) for x in xs])
    np.testing.assert_allclose(np.asarray(out, np.float32),
                               np.asarray(ref), rtol=1e-2, atol=1e-2)


def test_odd_spatial_blocks():
    """Non-power-of-two H exercises the row-block picker's h % (2*rows)
    guard."""
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.normal(size=(2, 12, 20, 16)), jnp.float32)
          for _ in range(2)]
    g = jnp.asarray([0.4, 0.6], jnp.float32)
    out = gs.gated_sum(g, xs)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(_chain(g, xs)), rtol=1e-6,
                               atol=1e-6)
