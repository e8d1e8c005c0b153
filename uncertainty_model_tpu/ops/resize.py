"""Bilinear resize with torch ``align_corners=True`` semantics.

The reference uses ``F.interpolate(..., mode='bilinear', align_corners=True)``
at three call sites (pyramid construction, decoder skip/disp upsampling, SSIM
error-map upsampling — reference train/utils.py:45-46, model/layers/
decoder.py:230-240, train/loss.py:120-121).  ``jax.image.resize`` has no
align_corners mode, so we implement the exact semantics here.

TPU design: the source coordinates are static (shape-dependent only), so the
two 1-D interpolations compile to constant-index gathers + fused lerps. XLA
fuses the whole resize into neighbouring elementwise work; no dynamic shapes.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=None)
def _lerp_coeffs(out_size: int, in_size: int) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Static (lo_idx, hi_idx, frac) arrays for align_corners=True sampling."""
    if out_size == 1:
        # align_corners with a single output sample reads source index 0.
        return (np.zeros(1, np.int32), np.zeros(1, np.int32), np.zeros(1, np.float32))
    if in_size == 1:
        z = np.zeros(out_size, np.int32)
        return (z, z, np.zeros(out_size, np.float32))
    # torch computes source coordinates in the tensor dtype (float32):
    # scale = (in-1)/(out-1), src = scale * i — replicated here bit-for-bit.
    scale = np.float32(in_size - 1) / np.float32(out_size - 1)
    src = scale * np.arange(out_size, dtype=np.float32)
    lo = np.floor(src).astype(np.int32)
    lo = np.minimum(lo, in_size - 2)
    frac = (src - lo).astype(np.float32)
    return lo, lo + 1, frac


@functools.lru_cache(maxsize=None)
def _interp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """Dense (out, in) interpolation matrix equivalent of the gather-lerp."""
    lo, hi, frac = _lerp_coeffs(out_size, in_size)
    m = np.zeros((out_size, in_size), np.float32)
    np.add.at(m, (np.arange(out_size), lo), 1 - frac)
    np.add.at(m, (np.arange(out_size), hi), frac)
    return m


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x

    if x.dtype == jnp.bfloat16:
        # Serving path: a tiny dense matmul on the MXU is ~7x faster than the
        # gather+lerp on TPU (gathers along spatial axes are slow); bf16
        # coefficient rounding (~3e-3) is below serving precision anyway.
        m = jnp.asarray(_interp_matrix(out_size, in_size), x.dtype)
        moved = jnp.moveaxis(x, axis, -1)
        out = jnp.einsum("oi,...i->...o", m, moved)
        return jnp.moveaxis(out, -1, axis)

    lo, hi, frac = _lerp_coeffs(out_size, in_size)
    x_lo = jnp.take(x, jnp.asarray(lo), axis=axis)
    x_hi = jnp.take(x, jnp.asarray(hi), axis=axis)
    shape = [1] * x.ndim
    shape[axis] = out_size
    w = jnp.asarray(frac).reshape(shape).astype(x.dtype)
    # torch's lerp formulation (v0 + w*(v1-v0)) for bit-closeness
    return x_lo + w * (x_hi - x_lo)


def resize_bilinear(x: jnp.ndarray, size: tuple[int, int]) -> jnp.ndarray:
    """Resize NHWC (or HWC) images to ``size=(H, W)`` (align_corners=True)."""
    h_axis = x.ndim - 3
    w_axis = x.ndim - 2
    x = _interp_axis(x, size[0], h_axis)
    x = _interp_axis(x, size[1], w_axis)
    return x


def scale_pyramid(x: jnp.ndarray, scales: int) -> list[jnp.ndarray]:
    """Image pyramid of ``scales`` levels, halving H and W at each level.

    Parity with reference train/utils.py:27-50 (``size=(H//2**i, W//2**i)``
    with align_corners=True bilinear).
    """
    h, w = x.shape[-3], x.shape[-2]
    return [resize_bilinear(x, (h // (2**i), w // (2**i))) for i in range(scales)]
