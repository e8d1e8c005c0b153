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

import jax
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


def _shift_axis(x: jnp.ndarray, axis: int, delta: int) -> jnp.ndarray:
    """x shifted by ±1 along ``axis`` with edge replication (pure slice+concat,
    no gather)."""
    n = x.shape[axis]
    if delta == -1:  # x_prev: row i holds x[i-1]
        head = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
        body = jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)
        return jnp.concatenate([head, body], axis=axis)
    tail = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    body = jax.lax.slice_in_dim(x, 1, n, axis=axis)
    return jnp.concatenate([body, tail], axis=axis)


def _upsample2_axis(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    """Exact 2x align_corners upsample along ``axis`` without gathers or
    matmuls.

    For out = 2*in the taps are monotone per output parity: even outputs
    lerp between ``x[i-1]`` and ``x[i]``, odd outputs between ``x[i]`` and
    ``x[i+1]`` (at the edges the parity's frac is 0 so the replicated
    neighbour is weightless).  That makes each parity ONE shift + ONE fused
    lerp — bit-identical to the gather formulation (the frac vectors are the
    same ``_lerp_coeffs`` arrays, parity-split) with no selects.
    """
    n = x.shape[axis]
    _, _, frac = _lerp_coeffs(2 * n, n)

    bshape = [1] * x.ndim
    bshape[axis] = n
    w_even = jnp.asarray(frac[0::2].reshape(bshape)).astype(x.dtype)
    w_odd = jnp.asarray(frac[1::2].reshape(bshape)).astype(x.dtype)

    x_prev = _shift_axis(x, axis, -1)
    x_next = _shift_axis(x, axis, +1)
    even = x_prev + w_even * (x - x_prev)
    odd = x + w_odd * (x_next - x)

    # interleave the parity classes: out[2i + p] = outs[p][i]
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x

    if x.dtype == jnp.bfloat16:
        # Serving path: a dense interp-matrix matmul on the MXU.  Measured on
        # the v5e at the hot (128,128,256,32)->2x shape: matmul 14 ms vs
        # shift-lerp 28 ms vs select 28 ms vs gather worse still — XLA's
        # elementwise emitters run ~10x off roofline on these batch-minor
        # layouts, so feeding the MXU wins despite 256x the MACs.  bf16
        # coefficient rounding (~3e-3) is below serving precision.
        # The contraction runs over the axis IN PLACE (no moveaxis): the
        # explicit moveaxis round-trip materialised as real transposes in
        # the serving graph (~6 ms/pass at batch 128, round-3 chained trace).
        m = jnp.asarray(_interp_matrix(out_size, in_size), x.dtype)
        letters = "abcdefg"
        in_sub = "".join(
            "i" if d == axis else letters[d] for d in range(x.ndim))
        out_sub = in_sub.replace("i", "o")
        return jnp.einsum(f"oi,{in_sub}->{out_sub}", m, x)

    if out_size == 2 * in_size and in_size >= 2:
        return _upsample2_axis(x, axis)

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
