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

    For out = 2*in, every source index lands in {i-1, i, i+1} of the output
    pair base i (src spacing is (in-1)/(2in-1) < 1/2), so each output parity
    class is a static SELECT among {x_prev, x, x_next} followed by the same
    ``lo + frac*(hi - lo)`` lerp as the gather path — bit-identical values,
    but pure slice/select/lerp ops (the dense-matmul lowering measured
    20 ms/pass on the batch-128 serving trace for one decoder stage; this is
    bandwidth-bound at ~3 tensor passes)."""
    n = x.shape[axis]
    lo, hi, frac = _lerp_coeffs(2 * n, n)
    base = np.arange(n)

    x_prev = _shift_axis(x, axis, -1)
    x_next = _shift_axis(x, axis, +1)

    bshape = [1] * x.ndim
    bshape[axis] = n

    outs = []
    for parity in (0, 1):
        l, h_, f = lo[parity::2], hi[parity::2], frac[parity::2]
        assert np.all((l >= base - 1) & (l <= base + 1)), "2x tap invariant"
        assert np.all((h_ >= base - 1) & (h_ <= base + 1)), "2x tap invariant"

        def pick(idx):
            sel_prev = jnp.asarray((idx == base - 1).reshape(bshape))
            sel_next = jnp.asarray((idx == base + 1).reshape(bshape))
            return jnp.where(sel_prev, x_prev, jnp.where(sel_next, x_next, x))

        x_lo, x_hi = pick(l), pick(h_)
        w = jnp.asarray(f.reshape(bshape)).astype(x.dtype)
        outs.append(x_lo + w * (x_hi - x_lo))

    # interleave the parity classes: out[2i + p] = outs[p][i]
    stacked = jnp.stack(outs, axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def _interp_axis(x: jnp.ndarray, out_size: int, axis: int) -> jnp.ndarray:
    in_size = x.shape[axis]
    if in_size == out_size:
        return x

    if out_size == 2 * in_size and in_size >= 2:
        return _upsample2_axis(x, axis)

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
