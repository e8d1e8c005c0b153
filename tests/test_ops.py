"""Golden tests: numerics ops vs the torch primitives the reference uses."""

import numpy as np
import pytest

import jax.numpy as jnp

from uncertainty_model_tpu import ops

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402


def _rand(*shape, seed=0):
    rng = np.random.default_rng(seed)
    return rng.uniform(size=shape).astype(np.float32)


def _to_torch_nchw(x_nhwc):
    return torch.from_numpy(np.transpose(x_nhwc, (0, 3, 1, 2)))


def _from_torch_nchw(t):
    return np.transpose(t.detach().numpy(), (0, 2, 3, 1))


class TestResize:
    @pytest.mark.parametrize("out_size", [(8, 16), (16, 32), (32, 64), (7, 13), (64, 128)])
    def test_matches_torch_interpolate(self, out_size):
        x = _rand(2, 16, 32, 3)
        expected = F.interpolate(
            _to_torch_nchw(x), size=out_size, mode="bilinear", align_corners=True
        )
        got = ops.resize_bilinear(jnp.asarray(x), out_size)
        np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(expected), atol=1e-6)

    def test_scale_pyramid(self):
        x = _rand(2, 32, 64, 6)
        xt = _to_torch_nchw(x)
        pyramid = ops.scale_pyramid(jnp.asarray(x), 4)
        for i, level in enumerate(pyramid):
            size = (32 // 2**i, 64 // 2**i)
            expected = F.interpolate(xt, size=size, mode="bilinear", align_corners=True)
            np.testing.assert_allclose(np.asarray(level), _from_torch_nchw(expected), atol=1e-6)


class TestWarp:
    def _torch_reconstruct(self, disparity, image):
        """The reference's grid_sample flow-field construction.

        Mirrors reference train/utils.py:65-97 semantics via torch primitives.
        """
        b, _, h, w = image.shape
        x_base = torch.linspace(0, 1, w).repeat(b, h, 1)
        y_base = torch.linspace(0, 1, h).repeat(b, w, 1).transpose(1, 2)
        flow = torch.stack((x_base + disparity.squeeze(1), y_base), dim=3)
        flow = 2 * flow - 1
        return F.grid_sample(image, flow, mode="bilinear", padding_mode="zeros",
                             align_corners=False)

    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_matches_grid_sample(self, seed):
        img = _rand(2, 16, 32, 3, seed=seed)
        disp = (_rand(2, 16, 32, 1, seed=seed + 10) - 0.5) * 0.3
        expected = self._torch_reconstruct(
            torch.from_numpy(np.transpose(disp, (0, 3, 1, 2))), _to_torch_nchw(img)
        )
        got = ops.warp_by_disparity(jnp.asarray(disp), jnp.asarray(img))
        np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(expected), atol=1e-5)

    def test_zero_disparity_border_dimming(self):
        # grid_sample(align_corners=False) dims borders even at zero shift —
        # the parity tests must capture that quirk.
        img = _rand(1, 8, 8, 1)
        disp = np.zeros((1, 8, 8, 1), np.float32)
        got = np.asarray(ops.warp_by_disparity(jnp.asarray(disp), jnp.asarray(img)))
        expected = self._torch_reconstruct(
            torch.zeros(1, 1, 8, 8), _to_torch_nchw(img))
        np.testing.assert_allclose(got, _from_torch_nchw(expected), atol=1e-6)

    def test_gradient_flows_through_disparity(self):
        import jax

        img = jnp.asarray(_rand(1, 8, 16, 3))
        disp = jnp.asarray((_rand(1, 8, 16, 1, seed=3) - 0.5) * 0.2)

        def loss(d):
            return jnp.sum(ops.warp_by_disparity(d, img) ** 2)

        g = jax.grad(loss)(disp)
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).max() > 0

    def test_reconstruct_pyramid_channels(self):
        images = jnp.asarray(_rand(2, 16, 32, 6))
        disp = jnp.asarray(_rand(2, 16, 32, 4, seed=5) * 0.1)
        recon = ops.reconstruct_pyramid([disp], [images])[0]
        assert recon.shape == (2, 16, 32, 6)


class TestPool:
    @pytest.mark.parametrize("k", [3, 11])
    def test_avg_pool_matches_torch(self, k):
        x = _rand(2, 16, 32, 4)
        expected = F.avg_pool2d(_to_torch_nchw(x), k, stride=1)
        got = ops.avg_pool2d(jnp.asarray(x), k)
        np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(expected), atol=1e-6)

    def test_global_avg_pool(self):
        x = _rand(2, 8, 8, 4)
        got = ops.global_avg_pool(jnp.asarray(x))
        np.testing.assert_allclose(np.asarray(got), x.mean(axis=(1, 2)), atol=1e-6)


class TestPad:
    @pytest.mark.parametrize("mode,torch_mode", [
        ("zeros", "constant"), ("reflect", "reflect"), ("replicate", "replicate")])
    def test_pad_matches_torch(self, mode, torch_mode):
        x = _rand(2, 8, 8, 3)
        pad = (1, 2, 3, 1)
        expected = F.pad(_to_torch_nchw(x), pad, mode=torch_mode)
        got = ops.pad2d(jnp.asarray(x), pad, mode=mode)
        np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(expected), atol=1e-6)


class TestPixelShuffle:
    def test_matches_torch(self):
        x = _rand(2, 4, 6, 32)  # 8 out channels, r=2
        expected = F.pixel_shuffle(_to_torch_nchw(x), 2)
        got = ops.pixel_shuffle(jnp.asarray(x), 2)
        np.testing.assert_allclose(np.asarray(got), _from_torch_nchw(expected), atol=1e-6)


class TestReflectConv:
    def test_matches_pad_then_conv(self):
        from uncertainty_model_tpu.ops import conv2d, pad2d, reflect_conv2d

        x = jnp.asarray(_rand(2, 12, 18, 6, seed=11))
        w = jnp.asarray(_rand(3, 3, 6, 8, seed=12) - 0.5)
        got = reflect_conv2d(x, w)
        expected = conv2d(pad2d(x, (1, 1, 1, 1), "reflect"), w)
        np.testing.assert_allclose(np.asarray(got), np.asarray(expected), atol=1e-6)
