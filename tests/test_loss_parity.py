"""Golden parity: loss stack vs the actual reference loss modules (CPU)."""

import numpy as np
import pytest

import jax.numpy as jnp

from uncertainty_model_tpu import losses
from uncertainty_model_tpu.ops import reconstruct_pyramid, scale_pyramid

from reference_harness import import_reference

pytestmark = [pytest.mark.golden]

ref = pytest.importorskip("reference_harness").import_reference()
torch = pytest.importorskip("torch")


def _rand(*shape, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return (rng.uniform(size=shape) * (hi - lo) + lo).astype(np.float32)


def _t(x_nhwc):  # NHWC numpy -> torch NCHW
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


class TestWSSIM:
    @pytest.mark.parametrize("alpha", [0.85, 1.0])
    def test_loss_and_error_map(self, alpha):
        images = _rand(2, 16, 32, 6, seed=0)
        recon = _rand(2, 16, 32, 6, seed=1)

        ref_loss = ref.loss.WeightedSSIMLoss(alpha=alpha)
        expected = ref_loss(_t(images), _t(recon))
        expected_error = ref_loss.previous_image_error

        got, error = losses.wssim_loss(jnp.asarray(images), jnp.asarray(recon), alpha)

        np.testing.assert_allclose(float(got), float(expected), atol=1e-6)
        np.testing.assert_allclose(
            np.asarray(error),
            expected_error.detach().numpy().transpose(0, 2, 3, 1),
            atol=1e-6,
        )


class TestConsistency:
    def test_disparity_consistency(self):
        disp = _rand(2, 16, 32, 2, seed=2, lo=0.0, hi=0.3)
        expected = ref.loss.ConsistencyLoss()(_t(disp))
        got = losses.consistency_loss(jnp.asarray(disp))
        np.testing.assert_allclose(float(got), float(expected), atol=1e-6)

    def test_uncertainty_as_warp_field_quirk(self):
        unc = _rand(2, 16, 32, 2, seed=3, lo=0.0, hi=0.2)
        disp = _rand(2, 16, 32, 2, seed=4, lo=0.0, hi=0.3)
        expected = ref.loss.ConsistencyLoss()(_t(unc), _t(disp))
        got = losses.consistency_loss(jnp.asarray(unc), jnp.asarray(disp))
        np.testing.assert_allclose(float(got), float(expected), atol=1e-6)


class TestSmoothness:
    def test_matches(self):
        disp = _rand(2, 16, 32, 2, seed=5, lo=0.0, hi=0.5)
        images = _rand(2, 16, 32, 6, seed=6)
        expected = ref.loss.SmoothnessLoss()(_t(disp), _t(images))
        got = losses.smoothness_loss(jnp.asarray(disp), jnp.asarray(images))
        np.testing.assert_allclose(float(got), float(expected), atol=1e-6)


class TestReprojectionError:
    @pytest.mark.parametrize("loss_type", ["l1", "bayesian", "log_bayesian"])
    @pytest.mark.parametrize("pooling", [False, True])
    def test_matches(self, loss_type, pooling):
        pred = _rand(2, 16, 32, 4, seed=7, lo=0.05, hi=0.95)
        image = _rand(2, 16, 32, 6, seed=8)
        error = _rand(2, 16, 32, 2, seed=9, lo=0.0, hi=0.5)

        ref_fn = ref.loss.ReprojectionErrorLoss(
            loss_type=loss_type, smoothness_weight=0.3,
            consistency_weight=0.5, pooling=pooling,
        )
        expected = ref_fn(_t(pred), _t(image), _t(error))

        got = losses.reprojection_error_loss(
            jnp.asarray(pred), jnp.asarray(image), jnp.asarray(error),
            loss_type=loss_type, smoothness_weight=0.3,
            consistency_weight=0.5, pooling=pooling,
        )
        np.testing.assert_allclose(float(got), float(expected), atol=2e-6)

    def test_invalid_loss_type_raises(self):
        with pytest.raises(ValueError):
            losses.reprojection_error_loss(
                jnp.zeros((1, 8, 8, 4)), jnp.zeros((1, 8, 8, 6)),
                jnp.zeros((1, 8, 8, 2)), loss_type="l2",
            )


class TestTotalLoss:
    def _pyramids(self):
        images = _rand(2, 32, 64, 6, seed=10)
        pyramid_np = [np.asarray(p) for p in scale_pyramid(jnp.asarray(images), 4)]
        preds_np = [
            _rand(2, 32 // 2**i, 64 // 2**i, 4, seed=20 + i, lo=0.05, hi=0.6)
            for i in range(4)
        ]
        recon = reconstruct_pyramid(
            [jnp.asarray(p) for p in preds_np], [jnp.asarray(p) for p in pyramid_np]
        )
        recon_np = [np.asarray(r) for r in recon]
        return pyramid_np, preds_np, recon_np

    def test_matches_reference(self):
        pyramid, preds, recon = self._pyramids()

        cfg = dict(
            wssim_weight=1.0, consistency_weight=1.0, smoothness_weight=1.0,
            predictive_error_weight=1.0, wssim_alpha=0.85,
            error_loss_config={"loss_type": "l1", "smoothness_weight": 0,
                               "consistency_weight": 0.5, "pooling": False},
        )

        ref_fn = ref.loss.TukraUncertaintyLoss(**cfg)
        exp_disp, exp_err = ref_fn(
            [_t(p) for p in pyramid], [_t(p) for p in preds], [_t(r) for r in recon]
        )

        ours = losses.TukraUncertaintyLoss(**cfg)
        got_disp, got_err = ours(
            [jnp.asarray(p) for p in pyramid],
            [jnp.asarray(p) for p in preds],
            [jnp.asarray(r) for r in recon],
        )

        np.testing.assert_allclose(float(got_disp), float(exp_disp), rtol=2e-5)
        np.testing.assert_allclose(float(got_err), float(exp_err), rtol=2e-5)
