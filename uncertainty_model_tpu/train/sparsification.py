"""Sparsification metrics AUSE / AURG (reference train/sparsification.py).

Measures uncertainty quality: pool the error maps 11x11, sort the oracle
error by *predicted* uncertainty (descending), progressively remove the most
uncertain pixels in 100 steps and record the normalised mean of what remains.
AUSE = mean gap between the prediction-sorted and oracle-sorted curves;
AURG = mean gap between random and prediction-sorted curves.

TPU redesign: the reference loops 100 times slicing a sorted tensor
(sparsification.py:26-34); here the whole sweep is a suffix-cumsum read at
100 static offsets — one sort + one cumsum on device, no host loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ops import avg_pool2d


def curve(
    oracle_error: jnp.ndarray,
    predicted_error: jnp.ndarray,
    kernel_size: int = 11,
    steps: int = 100,
) -> jnp.ndarray:
    """Sparsification curve (reference train/sparsification.py:8-36).

    Args:
        oracle_error / predicted_error: (B, H, W, 2) per-view error maps.

    Returns:
        (steps,) curve of normalised remaining mean error.
    """
    batch = oracle_error.shape[0]
    oracle = avg_pool2d(oracle_error, kernel_size)
    predicted = avg_pool2d(predicted_error, kernel_size)

    # (B, 2, N) pixel vectors per view
    oracle = oracle.transpose(0, 3, 1, 2).reshape(batch, 2, -1)
    predicted = predicted.transpose(0, 3, 1, 2).reshape(batch, 2, -1)
    n = oracle.shape[2]

    order = jnp.argsort(-predicted, axis=2)  # descending by predicted uncertainty
    oracle_sorted = jnp.take_along_axis(oracle, order, axis=2)

    oracle_mean = jnp.mean(oracle, axis=2)  # (B, 2)

    # Suffix sums: remaining_sum[k] = sum of oracle_sorted[k:]
    total = jnp.sum(oracle_sorted, axis=2, keepdims=True)
    prefix = jnp.cumsum(oracle_sorted, axis=2)
    removed = np.array([int(s / steps * n) for s in range(steps)])  # static
    # sum of first `removed` elements; removed=0 -> 0
    removed_idx = jnp.asarray(np.maximum(removed - 1, 0))
    prefix_at = jnp.take(prefix, removed_idx, axis=2)
    prefix_at = jnp.where(jnp.asarray(removed)[None, None, :] == 0, 0.0, prefix_at)

    remaining = (total - prefix_at) / jnp.asarray(n - removed, oracle.dtype)
    normalised = remaining / oracle_mean[..., None]  # (B, 2, steps)
    return jnp.mean(normalised, axis=(0, 1))


def random_curve(
    oracle_error: jnp.ndarray,
    key: jax.Array,
    kernel_size: int = 11,
    steps: int = 100,
) -> jnp.ndarray:
    """Curve under uniformly random uncertainty (sparsification.py:39-43)."""
    random_error = jax.random.uniform(key, oracle_error.shape, oracle_error.dtype)
    return curve(oracle_error, random_error, kernel_size, steps)


def ause(oracle_curve: jnp.ndarray, predicted_curve: jnp.ndarray) -> jnp.ndarray:
    """Area under the sparsification error (sparsification.py:52-57)."""
    if oracle_curve.shape != predicted_curve.shape:
        raise ValueError(
            "Oracle and Predicted sparsification curves have different step sizes."
        )
    return jnp.mean(predicted_curve - oracle_curve)


def aurg(predicted_curve: jnp.ndarray, random_curve_: jnp.ndarray) -> jnp.ndarray:
    """Area under the random gain (sparsification.py:60-61)."""
    return ause(predicted_curve, random_curve_)
