"""Pyramid helper tests (reference train/utils.py:53-62, 138-140)."""

import numpy as np

import jax
import jax.numpy as jnp

from uncertainty_model_tpu.utils import concatenate_pyramids, detach_pyramid


class TestPyramidUtils:
    def test_concatenate_along_batch(self):
        a = [jnp.ones((2, 4, 4, 3)), jnp.ones((2, 2, 2, 3))]
        b = [jnp.zeros((3, 4, 4, 3)), jnp.zeros((3, 2, 2, 3))]
        out = concatenate_pyramids(a, b)
        assert out[0].shape == (5, 4, 4, 3)
        assert out[1].shape == (5, 2, 2, 3)
        np.testing.assert_array_equal(np.asarray(out[0][:2]), 1.0)
        np.testing.assert_array_equal(np.asarray(out[0][2:]), 0.0)

    def test_detach_stops_gradient(self):
        def f(x):
            pyr = detach_pyramid([x * 2.0])
            return jnp.sum(pyr[0] ** 2) + jnp.sum(x)

        g = jax.grad(f)(jnp.ones((2, 2)))
        np.testing.assert_allclose(np.asarray(g), 1.0)  # only the direct term
