"""Golden parity for the eval SSIM metric (VERDICT round-1 gap #3).

The reference evaluator uses torchmetrics
``structural_similarity_index_measure(recon, images, kernel_size=11,
reduction='sum', data_range=1.0)`` (/root/reference/train/evaluate.py:142-146).
torchmetrics is not installed in this image, so the test hand-rolls its
exact published algorithm in torch (torchmetrics/functional/image/ssim.py,
``_ssim_update``): gaussian window (sigma 1.5), reflect-padded depthwise
convs, the SSIM map cropped back to the valid-window region, per-image mean
then batch sum.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from uncertainty_model_tpu.train.metrics import gaussian_ssim

pytestmark = [pytest.mark.golden]

torch = pytest.importorskip("torch")


def _torchmetrics_ssim(preds, target, kernel_size=11, sigma=1.5,
                       data_range=1.0, k1=0.01, k2=0.03):
    """Handrolled torchmetrics _ssim_update (NCHW, gaussian kernel)."""
    import torch.nn.functional as F

    channel = preds.size(1)
    coords = torch.arange(kernel_size, dtype=torch.float32)
    coords -= (kernel_size - 1) / 2
    g = torch.exp(-(coords**2) / (2 * sigma**2))
    g /= g.sum()
    kernel = torch.outer(g, g).expand(channel, 1, kernel_size, kernel_size)

    pad = (kernel_size - 1) // 2
    preds_p = F.pad(preds, (pad, pad, pad, pad), mode="reflect")
    target_p = F.pad(target, (pad, pad, pad, pad), mode="reflect")

    inputs = torch.cat(
        (preds_p, target_p, preds_p * preds_p, target_p * target_p,
         preds_p * target_p))
    outputs = F.conv2d(inputs, kernel, groups=channel)
    b = preds.shape[0]
    mu_x, mu_y, xx, yy, xy = outputs.split(b)

    c1 = (k1 * data_range) ** 2
    c2 = (k2 * data_range) ** 2
    sigma_x = xx - mu_x * mu_x
    sigma_y = yy - mu_y * mu_y
    sigma_xy = xy - mu_x * mu_y
    full = ((2 * mu_x * mu_y + c1) * (2 * sigma_xy + c2)) / (
        (mu_x * mu_x + mu_y * mu_y + c1) * (sigma_x + sigma_y + c2))
    valid = full[..., pad:-pad, pad:-pad]
    return valid.reshape(b, -1).mean(-1)


@pytest.mark.parametrize("kernel_size", [11, 7])
def test_gaussian_ssim_matches_torchmetrics_formulation(kernel_size):
    rng = np.random.default_rng(20)
    a = rng.uniform(size=(3, 3, 40, 56)).astype(np.float32)
    # correlated pair so SSIM is in a realistic range (not ~0 noise)
    b = np.clip(a + 0.1 * rng.normal(size=a.shape).astype(np.float32), 0, 1)

    expected = _torchmetrics_ssim(
        torch.from_numpy(b), torch.from_numpy(a), kernel_size=kernel_size)

    got = gaussian_ssim(
        jnp.asarray(b.transpose(0, 2, 3, 1)),
        jnp.asarray(a.transpose(0, 2, 3, 1)),
        kernel_size=kernel_size,
    )
    np.testing.assert_allclose(np.asarray(got), expected.numpy(), atol=2e-6)

    # reduction='sum' behaviour used by the evaluator
    np.testing.assert_allclose(
        float(jnp.sum(got)), float(expected.sum()), rtol=1e-5)


def test_ssim_identity_is_one():
    rng = np.random.default_rng(21)
    a = jnp.asarray(rng.uniform(size=(2, 40, 56, 3)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(gaussian_ssim(a, a)), 1.0, atol=1e-5)
