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


class TestFusedConsistencyWarp:
    def test_fused_equals_separate(self):
        """reconstruct_pyramid_with_lr must equal reconstruct_pyramid +
        consistency's own warps channel-for-channel (the fusion only stacks
        sources into one kernel call)."""
        import numpy as np
        import jax.numpy as jnp

        from uncertainty_model_tpu.ops import (
            reconstruct_left_image,
            reconstruct_pyramid,
            reconstruct_pyramid_with_lr,
            reconstruct_right_image,
        )

        rng = np.random.default_rng(0)
        disps, pyr = [], []
        for h, w in ((16, 32), (8, 16)):
            disps.append(jnp.asarray(
                rng.uniform(0, 0.3, size=(2, h, w, 4)).astype(np.float32)))
            pyr.append(jnp.asarray(
                rng.uniform(size=(2, h, w, 6)).astype(np.float32)))

        recon_sep = reconstruct_pyramid(disps, pyr)
        recon_fused, lr = reconstruct_pyramid_with_lr(disps, pyr)

        for a, b in zip(recon_sep, recon_fused):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        for d, l in zip(disps, lr):
            left_lr = reconstruct_left_image(d[..., 0:1], d[..., 1:2])
            right_lr = reconstruct_right_image(d[..., 1:2], d[..., 0:1])
            np.testing.assert_array_equal(np.asarray(l[..., 0:1]), np.asarray(left_lr))
            np.testing.assert_array_equal(np.asarray(l[..., 1:2]), np.asarray(right_lr))
