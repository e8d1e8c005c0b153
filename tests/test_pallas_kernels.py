"""Interpret-mode parity for the Pallas TPU kernels (ops/pallas/conv.py,
ops/pallas/upsample.py) against their lax/XLA reference formulations.

On CPU the production entry points dispatch to identical-math lax
fallbacks; these tests force the actual kernel bodies through the Pallas
interpreter so the TPU code path is exercised off-chip.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

import uncertainty_model_tpu.ops.pallas.conv as pconv
import uncertainty_model_tpu.ops.pallas.upsample as pup
from uncertainty_model_tpu.ops.resize import resize_bilinear


@pytest.fixture(autouse=True)
def _interpret(monkeypatch):
    monkeypatch.setattr(pconv, "_INTERPRET", True)
    monkeypatch.setattr(pup, "_INTERPRET", True)


def _ref_conv_elu(x, w, b):
    p = (w.shape[0] - 1) // 2
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(p, p), (p, p)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + b
    return jax.nn.elu(y)


@pytest.mark.parametrize("shape", [(2, 16, 32, 8, 16, 5), (1, 8, 16, 16, 8, 3)])
def test_conv_elu_matches_lax(shape):
    B, H, W, C, Co, k = shape
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co), jnp.float32)
    got = pconv.conv_elu(x, w, b)
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref_conv_elu(x, w, b)),
                               atol=1e-4)


@pytest.mark.parametrize("n,extra", [(1, 0), (3, 4), (4, 0)])
def test_gated_conv_elu_matches_lax(n, extra):
    B, H, W, C, Co, k = 2, 16, 20, 8, 8, 5
    p = (k - 1) // 2
    rng = np.random.default_rng(1)
    xs = [jnp.asarray(rng.standard_normal((B, H, W, C)), jnp.float32)
          for _ in range(n)]
    xsp = [jnp.pad(x, ((0, 0), (p, p), (p, p + extra), (0, 0))) for x in xs]
    gates = jnp.asarray(rng.uniform(0.2, 0.9, n), jnp.float32)
    w = jnp.asarray(rng.standard_normal((k, k, C, Co)) * 0.1, jnp.float32)
    b = jnp.asarray(rng.standard_normal(Co), jnp.float32)
    got = pconv.gated_conv_elu(xsp, gates, w, b, width=W)
    h = sum(g * x for g, x in zip(gates, xs))
    np.testing.assert_allclose(np.asarray(got), np.asarray(_ref_conv_elu(h, w, b)),
                               atol=1e-4)


@pytest.mark.parametrize("shape", [(2, 16, 16, 8), (1, 32, 8, 4), (1, 8, 32, 3)])
def test_upsample2x2_matches_resize(shape):
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    got = pup.upsample2x2(x)
    ref = resize_bilinear(x, (2 * shape[1], 2 * shape[2]))
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=2e-6)


def test_upsample2x2_small_h_fallback():
    x = jnp.ones((1, 4, 8, 2), jnp.float32)
    assert pup.upsample2x2(x).shape == (1, 8, 16, 2)
