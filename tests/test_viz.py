"""Visualisation utility tests (golden vs reference where importable)."""

import numpy as np
import pytest

from uncertainty_model_tpu.utils import (
    combine_disparity,
    get_comparison,
    make_grid,
    to_heatmap,
)

from reference_harness import import_reference

pytestmark = [pytest.mark.golden]

ref = pytest.importorskip("reference_harness").import_reference()
torch = pytest.importorskip("torch")


class TestViz:
    def test_to_heatmap_matches_reference(self):
        rng = np.random.default_rng(0)
        x = rng.uniform(size=(16, 24)).astype(np.float32)
        expected = ref.utils.to_heatmap(torch.from_numpy(x)[None])  # (3,H,W)
        got = to_heatmap(x)  # (H,W,3)
        np.testing.assert_allclose(
            got, expected.numpy().transpose(1, 2, 0), atol=1e-6
        )

    def test_combine_disparity_matches_reference(self):
        rng = np.random.default_rng(1)
        left = rng.uniform(size=(1, 16, 24)).astype(np.float32)
        right = rng.uniform(size=(1, 16, 24)).astype(np.float32)
        expected = ref.utils.combine_disparity(
            torch.from_numpy(left), torch.from_numpy(right)
        )
        got = combine_disparity(left, right)
        np.testing.assert_allclose(got, expected.numpy(), atol=1e-6)

    def test_make_grid_shape(self):
        imgs = [np.zeros((8, 12, 3), np.float32)] * 4
        grid = make_grid(imgs, nrow=2, padding=2)
        assert grid.shape == (2 * 10 + 2, 2 * 14 + 2, 3)

    def test_get_comparison_panels(self):
        rng = np.random.default_rng(2)
        image = rng.uniform(size=(8, 12, 6)).astype(np.float32)
        pred = rng.uniform(size=(8, 12, 2)).astype(np.float32)
        extra = rng.uniform(size=(8, 12, 2)).astype(np.float32)
        grid = get_comparison(image, pred, extra, add_scaled=True)
        # 8 panels in 2 columns -> 4 rows
        assert grid.shape[0] == 4 * 10 + 2
        assert grid.shape[2] == 3


class TestGaussianSSIM:
    def test_identical_images_give_one(self):
        import jax.numpy as jnp

        from uncertainty_model_tpu.train import gaussian_ssim

        rng = np.random.default_rng(3)
        x = jnp.asarray(rng.uniform(size=(2, 32, 48, 3)).astype(np.float32))
        vals = np.asarray(gaussian_ssim(x, x))
        np.testing.assert_allclose(vals, 1.0, atol=1e-5)

    def test_noise_reduces_ssim(self):
        import jax.numpy as jnp

        from uncertainty_model_tpu.train import gaussian_ssim

        rng = np.random.default_rng(4)
        x = rng.uniform(size=(1, 32, 48, 3)).astype(np.float32)
        noisy = np.clip(x + rng.normal(0, 0.2, x.shape), 0, 1).astype(np.float32)
        val = float(gaussian_ssim(jnp.asarray(x), jnp.asarray(noisy))[0])
        assert 0.0 < val < 0.9
