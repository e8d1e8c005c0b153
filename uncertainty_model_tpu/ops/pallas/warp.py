"""Pallas TPU kernel for the horizontal stereo warp (and its VJP).

Motivation (measured on v5e, batch 8 @ 256x512): the XLA lowering of the
gather-based warp costs ~19ms forward and ~98ms forward+backward — the
backward's scatter-add dominates the whole training step.  This kernel
reformulates both directions as one-hot matmuls built tile-by-tile in VMEM:

    out[j]   = sum_k M[j,k] * src[k],   M[j,k] = (k==x0_j)(1-t_j) + (k==x0_j+1) t_j
    dsrc[k]  = sum_j M[j,k] * dout[j]          (the transpose — no scatter!)
    ddisp[j] = W * sum_c dout[c,j] * (src[x0_j+1] - src[x0_j])[c]

M never touches HBM: each grid step builds the (W, W) matrix for its rows
from a broadcasted iota compare and immediately contracts it on the MXU.
Out-of-range taps vanish for free (an out-of-range x0 equals no k in
[0, W)), which reproduces grid_sample's zeros padding exactly.

Layout: rows on the grid, channels on sublanes, W on lanes — i.e. inputs
are (rows, C, W).  The public wrapper in ops/warp.py handles the NHWC
transposes and the static vertical lerp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

ROWS_PER_PROGRAM = 32


def _fwd_kernel(xsrc_ref, srcv_ref, out_ref):
    # xsrc: (R, W) f32 pixel coords; srcv: (R, C, W); out: (R, C, W)
    r_rows, width = xsrc_ref.shape
    # bilinear hat: M[j,k] = max(0, 1 - |x_j - k|) — identical to the
    # floor/one-hot construction ((k==x0)(1-t) + (k==x0+1)t) but built with
    # one |diff| instead of two integer compares + selects; the M build is
    # the kernel's dominant (VPU) cost
    # iota must be integer-typed for Mosaic; cast to f32 for the hat build
    col = jax.lax.broadcasted_iota(jnp.int32, (width, width), 1).astype(jnp.float32)

    def body(r, _):
        x = xsrc_ref[r, :]
        m = jnp.maximum(1.0 - jnp.abs(x[:, None] - col), 0.0)  # (W_out, W_in)
        src = srcv_ref[r].astype(jnp.float32)  # (C, W_in)
        out_ref[r] = jax.lax.dot_general(
            src, m, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(out_ref.dtype)
        return 0

    jax.lax.fori_loop(0, r_rows, body, 0)


def _bwd_kernel(xsrc_ref, srcv_ref, dout_ref, dsrc_ref, ddisp_ref):
    r_rows, width = xsrc_ref.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (width, width), 1).astype(jnp.float32)

    def body(r, _):
        x = xsrc_ref[r, :][:, None]                 # (W_out, 1)
        band = 1.0 - jnp.abs(x - col)               # (W_out, W_in)
        m = jnp.maximum(band, 0.0)
        # dM/dx: -1 at the floor tap, +1 at floor+1 — i.e. sign(k - x) on
        # the half-open tap window k in (x-1, x+1] (matches the one-hot
        # formulation exactly, including integer x where t == 0)
        dm = jnp.where(
            (col > x - 1.0) & (col <= x + 1.0),
            jnp.where(col > x, 1.0, -1.0),
            0.0,
        )

        dout = dout_ref[r].astype(jnp.float32)     # (C, W_out)
        src = srcv_ref[r].astype(jnp.float32)      # (C, W_in)

        # dsrc[c, k] = sum_j dout[c, j] M[j, k]
        dsrc_ref[r] = jax.lax.dot_general(
            dout, m, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(dsrc_ref.dtype)

        # d(out)/d(xsrc) per output pixel (dt/dxsrc = 1)
        slope = jax.lax.dot_general(
            src, dm, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (C, W_out)
        ddisp_ref[r] = jnp.sum(dout * slope, axis=0).astype(ddisp_ref.dtype)
        return 0

    jax.lax.fori_loop(0, r_rows, body, 0)


def _pad_rows(a, multiple):
    rows = a.shape[0]
    pad = (-rows) % multiple
    if pad:
        a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
    return a, rows


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def warp_rows(xsrc: jnp.ndarray, srcv: jnp.ndarray, interpret: bool = False):
    """Horizontal warp of row-major data.

    Args:
        xsrc: (R, W) f32 source pixel coordinate per output pixel.
        srcv: (R, C, W) rows to sample (already vertically lerped).

    Returns:
        (R, C, W) sampled rows with zeros out-of-range semantics.
    """
    return _warp_rows_fwd_impl(xsrc, srcv, interpret)


def _warp_rows_fwd_impl(xsrc, srcv, interpret):
    (xsrc_p, rows) = _pad_rows(xsrc, ROWS_PER_PROGRAM)
    (srcv_p, _) = _pad_rows(srcv, ROWS_PER_PROGRAM)
    r_pad, c, w = srcv_p.shape
    grid = (r_pad // ROWS_PER_PROGRAM,)

    out = pl.pallas_call(
        _fwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_PER_PROGRAM, w), lambda i: (i, 0)),
            pl.BlockSpec((ROWS_PER_PROGRAM, c, w), lambda i: (i, 0, 0)),
        ],
        out_specs=pl.BlockSpec((ROWS_PER_PROGRAM, c, w), lambda i: (i, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((r_pad, c, w), srcv.dtype),
        interpret=interpret,
    )(xsrc_p, srcv_p)
    return out[:rows]


def _warp_rows_fwd(xsrc, srcv, interpret):
    out = _warp_rows_fwd_impl(xsrc, srcv, interpret)
    return out, (xsrc, srcv)


def _warp_rows_bwd(interpret, residuals, dout):
    xsrc, srcv = residuals
    (xsrc_p, rows) = _pad_rows(xsrc, ROWS_PER_PROGRAM)
    (srcv_p, _) = _pad_rows(srcv, ROWS_PER_PROGRAM)
    (dout_p, _) = _pad_rows(dout, ROWS_PER_PROGRAM)
    r_pad, c, w = srcv_p.shape
    grid = (r_pad // ROWS_PER_PROGRAM,)

    dsrc, ddisp_pix = pl.pallas_call(
        _bwd_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((ROWS_PER_PROGRAM, w), lambda i: (i, 0)),
            pl.BlockSpec((ROWS_PER_PROGRAM, c, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS_PER_PROGRAM, c, w), lambda i: (i, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((ROWS_PER_PROGRAM, c, w), lambda i: (i, 0, 0)),
            pl.BlockSpec((ROWS_PER_PROGRAM, w), lambda i: (i, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((r_pad, c, w), srcv.dtype),
            jax.ShapeDtypeStruct((r_pad, w), xsrc.dtype),
        ],
        interpret=interpret,
    )(xsrc_p, srcv_p, dout_p)

    # cotangent w.r.t. xsrc (pixel units); the xsrc = f(disparity) chain
    # outside this custom_vjp is differentiated by JAX as usual
    return ddisp_pix[:rows], dsrc[:rows]


warp_rows.defvjp(_warp_rows_fwd, _warp_rows_bwd)
