"""Stereo bilinear warp — the hot inner kernel of self-supervision.

The reference implements view reconstruction via a full ``F.grid_sample``
(bilinear, zeros padding, align_corners=False) over a flow field that only
shifts x by the disparity (reference train/utils.py:65-109).  With the
reference's coordinate construction, the sampling point for output pixel
``(i, j)`` is::

    x_src = (j / (W-1) + d[b,i,j]) * W - 0.5      (pixel units)
    y_src =  i / (H-1)             * H - 0.5

Because ``y_src`` depends only on the row index, the 2-D bilinear sample is
exactly separable: a vertical lerp with *static* per-row weights followed by a
horizontal gather + lerp with dynamic (disparity-dependent) indices.  This
1-D specialisation is the TPU-native replacement for grid_sample — the static
vertical pass is constant-folded gathers, and only the horizontal pass is a
real dynamic ``take_along_axis``.

Zeros-padding semantics are preserved tap-by-tap: each of the two taps of each
1-D lerp contributes zero when its index is out of range (note this dims
border rows/cols by half, exactly like grid_sample).

Everything is differentiable w.r.t. the disparity (the lerp fraction carries
the gradient, matching grid_sample's gradient).
"""

from __future__ import annotations

import functools
import os

import jax.numpy as jnp
import numpy as np

# Warp backend: 'gather' (XLA take_along_axis; exact torch semantics in both
# directions but its backward lowers to a pathological scatter on TPU) or
# 'pallas' (one-hot-matmul kernel with a custom VJP — no scatter; measured
# ~10x faster backward on v5e).  'auto' uses pallas on TPU, gather elsewhere.
WARP_BACKEND = os.environ.get("UMT_WARP_BACKEND", "auto")


def _use_pallas(platform_hint=None) -> bool:
    if WARP_BACKEND == "gather":
        return False
    if WARP_BACKEND == "pallas":
        return True
    import jax

    try:
        return jax.default_backend() not in ("cpu",)
    except Exception:
        return False


@functools.lru_cache(maxsize=None)
def _vertical_coeffs(height: int) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """Static (lo, hi, w_lo, w_hi) for the vertical lerp, zero-masked."""
    i = np.arange(height, dtype=np.float64)
    y_src = i / (height - 1) * height - 0.5
    lo = np.floor(y_src).astype(np.int64)
    hi = lo + 1
    w_hi = (y_src - lo).astype(np.float32)
    w_lo = 1.0 - w_hi
    w_lo = np.where((lo >= 0) & (lo <= height - 1), w_lo, 0.0).astype(np.float32)
    w_hi = np.where((hi >= 0) & (hi <= height - 1), w_hi, 0.0).astype(np.float32)
    lo_c = np.clip(lo, 0, height - 1).astype(np.int32)
    hi_c = np.clip(hi, 0, height - 1).astype(np.int32)
    return lo_c, hi_c, w_lo, w_hi


def warp_by_disparity(disparity: jnp.ndarray, source: jnp.ndarray) -> jnp.ndarray:
    """Sample ``source`` at x-positions shifted by ``disparity``.

    Args:
        disparity: ``(B, H, W)`` or ``(B, H, W, 1)`` x-shift in normalised
            [0, 1] image widths (positive shifts sample to the right).
        source: ``(B, H, W, C)`` image to sample from.

    Returns:
        ``(B, H, W, C)`` warped image, grid_sample(zeros, align_corners=False)
        parity with reference train/utils.py:65-97.
    """
    if disparity.ndim == 4:
        disparity = disparity[..., 0]
    b, h, w, c = source.shape
    dtype = source.dtype

    # Vertical lerp: static per-row indices/weights.
    lo, hi, w_lo, w_hi = _vertical_coeffs(h)
    row_lo = jnp.take(source, jnp.asarray(lo), axis=1)
    row_hi = jnp.take(source, jnp.asarray(hi), axis=1)
    src_v = row_lo * jnp.asarray(w_lo, dtype)[None, :, None, None] + \
        row_hi * jnp.asarray(w_hi, dtype)[None, :, None, None]

    # Horizontal sampling coordinates (pixel units).
    x_base = (jnp.arange(w, dtype=jnp.float32) / (w - 1))[None, None, :]
    x_src = (x_base + disparity.astype(jnp.float32)) * w - 0.5

    if _use_pallas():
        from .pallas.warp import warp_rows

        xsrc_rows = x_src.reshape(b * h, w)
        srcv_rows = src_v.transpose(0, 1, 3, 2).reshape(b * h, c, w)
        out = warp_rows(xsrc_rows, srcv_rows)
        return out.reshape(b, h, c, w).transpose(0, 1, 3, 2)

    # XLA gather + lerp fallback (exact torch formulation).
    x_lo = jnp.floor(x_src)
    frac = (x_src - x_lo).astype(dtype)
    x_lo = x_lo.astype(jnp.int32)
    x_hi = x_lo + 1

    def tap(idx):
        valid = (idx >= 0) & (idx <= w - 1)
        idx_c = jnp.clip(idx, 0, w - 1)
        vals = jnp.take_along_axis(src_v, idx_c[..., None], axis=2)
        return vals * valid[..., None].astype(dtype)

    return tap(x_lo) * (1 - frac[..., None]) + tap(x_hi) * frac[..., None]


def reconstruct_left_image(left_disparity: jnp.ndarray, right_image: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the left view from left disparity and the right image.

    Sign convention parity: reference train/utils.py:100-104.
    """
    return warp_by_disparity(-left_disparity, right_image)


def reconstruct_right_image(right_disparity: jnp.ndarray, left_image: jnp.ndarray) -> jnp.ndarray:
    """Reconstruct the right view from right disparity and the left image.

    Sign convention parity: reference train/utils.py:107-109.
    """
    return warp_by_disparity(right_disparity, left_image)


def reconstruct_stereo(disparity: jnp.ndarray, images: jnp.ndarray) -> jnp.ndarray:
    """Warp a 6-channel stereo pair by a (>=2)-channel disparity map.

    Channels: images[..., :3] = left view, images[..., 3:6] = right view;
    disparity[..., 0] = left, disparity[..., 1] = right.  Only the first two
    disparity channels are used (reference train/utils.py:112-135).
    """
    left_recon = reconstruct_left_image(disparity[..., 0], images[..., 3:6])
    right_recon = reconstruct_right_image(disparity[..., 1], images[..., 0:3])
    return jnp.concatenate([left_recon, right_recon], axis=-1)


def reconstruct_pyramid(disparities, pyramid):
    """Apply :func:`reconstruct_stereo` to each scale of the pyramid."""
    return [reconstruct_stereo(d, im) for d, im in zip(disparities, pyramid)]


def reconstruct_stereo_with_lr(disparity: jnp.ndarray, images: jnp.ndarray):
    """:func:`reconstruct_stereo` fused with the LR-consistency warps.

    The consistency loss (reference train/loss.py:167-188) warps the
    *opposite-view disparity* with the exact same field the image
    reconstruction uses, so both sample through one kernel invocation with
    the disparity stacked as a 4th source channel — per-channel numerics are
    identical to separate calls, but the warp matrix is built once instead
    of twice (it dominates the warp cost, ops/pallas/warp.py).

    Returns ``(recon (..., 6), lr (..., 2))`` where ``lr[..., 0]`` is the
    left disparity reconstructed from the right (and vice versa).
    """
    left_src = jnp.concatenate([images[..., 3:6], disparity[..., 1:2]], axis=-1)
    right_src = jnp.concatenate([images[..., 0:3], disparity[..., 0:1]], axis=-1)
    left = reconstruct_left_image(disparity[..., 0], left_src)
    right = reconstruct_right_image(disparity[..., 1], right_src)
    recon = jnp.concatenate([left[..., :3], right[..., :3]], axis=-1)
    lr = jnp.concatenate([left[..., 3:4], right[..., 3:4]], axis=-1)
    return recon, lr


def reconstruct_pyramid_with_lr(disparities, pyramid):
    """Fused recon + LR-consistency warps per scale; returns
    ``(recon_pyramid, lr_pyramid)``."""
    pairs = [reconstruct_stereo_with_lr(d, im)
             for d, im in zip(disparities, pyramid)]
    return [p[0] for p in pairs], [p[1] for p in pairs]
