"""Pallas TPU kernels: fully-fused decoder stages in channel-major layout.

Round 3 of the decoder fusion.  The round-2 kernels (decoder_fused.py) fused
the inter-conv glue but left a per-stage tail of XLA ops — a real relayout
of the 1.2 GB concat tensor (3.2 ms at stage 4), a gate pass (3.3), the
iconv reading the concat from HBM, a separate ELU (3.3) and the disparity
conv.  The trace (docs/PERFORMANCE.md round-3) put decoder stages 2-4 at
~55 ms of the 128 ms pass against an HBM floor of ~7 ms.

This module collapses each fused decoder stage to TWO Pallas passes over
the data, with every intermediate kept in the kernels' own channel-major
``(H, C, W, B)`` layout (lanes = batch, sublanes = W) so the 3x3 convs run
as native MXU matmuls on column-im2col slabs:

  assemble_cm:  cat = [elu(se) | elu-less xc | up2(disp)]  (+ SE sums)
                where se = fm @ k_fm + up2(skipfeat) + bias — the SE conv's
                feature-map half is a K=C_f matmul absorbed into the kernel,
                so the full-res ``se_fm`` tensor never exists in HBM.
                ``cat`` is written with a 1-column reflect pad and 2-row
                slack (uniform tail DMAs, no per-program clamping).
  tail_cm:      gates the z block in VMEM, computes
                    out  = elu(iconv(cat))        (3x3 reflect, im2col MXU)
                    disp = scale * sigmoid(disp_conv(out))
                    xc'  = upsample_conv_{i+1}(out)      (next stage's x path)
                    skip'= gated_z @ k_skip_{i+1}        (next stage's SE skip)
                entirely from one read of ``cat``; ``out`` itself NEVER
                reaches HBM (its only consumers are computed in-kernel).

Between the two passes only the tiny SE MLP (a few (B, C) matmuls) runs in
XLA.  Matmul form: with C in sublanes and B in lanes, a row slab is a
contiguous ``(C, W*B)`` 2-D value, so each kernel-row tap is one
``(Co, 3C) @ (3C, W*B)`` MXU dot (column taps stacked into K — K=3C fills
the 128-deep MXU far better than K=C).

tail_cm's slab is read from HBM directly in MERGED-LANE form ``(rows, Cp,
Wp*B)`` (Cp = align8(Ccat) — assemble writes the zero pad): HBM is linear
bytes, so the DMA into a (Cp, Wp*B)-tiled VMEM buffer performs the
(W,B)->W*B "relayout" for free, a column tap v is the lane-tile-aligned
slice ``[:, v*B : v*B + W*B]`` (B=128 = exactly one lane tile), and the
3-tap K-stack is an 8-aligned sublane concat.  The first cut of this
kernel instead kept a 4-D ``(rows, C, Wp, B)`` slab and reshaped
``(3, C, W, B) -> (3C, W*B)`` per tap — a sublane->lane relayout that
Mosaic compiled for >22 minutes at stage 4 (W=512, 18 sites).

Reference semantics anchored: model/layers/decoder.py:210-249 (DecoderStage
dataflow), decoder.py:111-136 (SELayer), decoder.py:37-46 (reflect-padded
ConvLayer), torch F.interpolate align_corners=True (exact coefficient math:
ops/resize.py _lerp_coeffs, replicated by _row_weights/_col_weights in
decoder_fused.py which this module reuses).

Blocks span the full W (production widths are 128/256/512) — column
reflect handling is then static slicing; H borders use @pl.when row
substitution in VMEM.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .decoder_fused import _row_weights, _elu

_INTERPRET = False  # tests flip this to exercise the kernels off-TPU

_VMEM_LIMIT = 100 * 1024 * 1024

# debug-only: comma list of kernel sections to skip while bisecting Mosaic
# compile failures (tools/probe_assemble_bisect.py); NEVER set in production
import os as _os
_STRIP = set(filter(None, _os.environ.get("UMT_CM_STRIP", "").split(",")))


def _use_kernel() -> bool:
    return jax.default_backend() == "tpu" or _INTERPRET


def _align8(n: int) -> int:
    return n + ((-n) % 8)


# ---------------------------------------------------------------------------
# in-kernel helpers (channel-major: blocks are (rows, C, W, B))
# ---------------------------------------------------------------------------


def _col_weights_cm(n2, scale, dt):
    """Full-res column lerp fractions f (1, 1, n2, 1) and the odd-parity
    mask.  f[w] = scale*w - floor((w-1)/2) — identical f32 values to
    decoder_fused._col_weights' even/odd pair (w=2m: scale*2m - (m-1);
    w=2m+1: scale*(2m+1) - m), just computed on the interleaved axis."""
    w = jax.lax.broadcasted_iota(jnp.int32, (1, 1, n2, 1), 2)
    f = scale * w.astype(jnp.float32) - ((w - 1) // 2).astype(jnp.float32)
    odd = (w % 2) == 1
    return f.astype(dt), odd


def _interleave_cols(ec, oc):
    """Interleave two (..., n, B) column sets into (..., 2n, B).

    Expressed as a LANE concat + minor reshape: element (m, l) of the
    concatenated (..., n, 2B) value maps to flat index m*2B + l =
    (col 2m + l//B, lane l%B) — the exact column interleave — and at B=128
    both steps are tile-exact vreg relabelings.  The sublane-dim
    ``stack(axis=-2).reshape`` formulation of the same interleave made the
    Mosaic compiler explode (227 s for one stripped kernel, measured)."""
    s = ec.shape
    return jnp.concatenate([ec, oc], axis=-1).reshape(
        *s[:-2], 2 * s[-2], s[-1])


def _up2_block_cm(buf, fe, fo, f, odd, rh, n):
    """2x align_corners upsample of a zero-padded half-res block in C-major.

    ``buf``: (rh+2, C, >=n+2, B) — half rows [r0-1, r0+rh+1), half cols
    [-1, n+1) plus alignment slack (pad cols are weightless: frac(0)==1
    exactly).  Returns (2rh, C, 2n, B).

    Column handling: interleave FIRST (on canonical-layout rows — Mosaic
    rejects the lane-interleave reshape when its operands carry a sublane
    shift), producing the nearest-neighbour doubling U[k] = rows[k//2];
    the lerp endpoints are then plain full-res shifted slices selected by
    column parity: out[w] = L + f[w]*(R - L) with L = U[w + (w odd)],
    R = U[w + 2 + (w odd)].  Identical f32/bf16 math to the even/odd
    half-res formulation (decoder_fused._up2_block)."""
    c, b = buf.shape[1], buf.shape[3]
    buf = buf[:, :, 0:n + 2]
    prev, cur, nxt = buf[0:rh], buf[1:rh + 1], buf[2:rh + 2]
    fe = fe.reshape(rh, 1, 1, 1)
    fo = fo.reshape(rh, 1, 1, 1)
    er = prev + fe * (cur - prev)
    orow = cur + fo * (nxt - cur)
    rows = jnp.stack([er, orow], axis=1).reshape(2 * rh, c, n + 2, b)
    u = _interleave_cols(rows, rows)          # (2rh, c, 2n+4, b)
    n2 = 2 * n
    left = jnp.where(odd, u[:, :, 1:n2 + 1], u[:, :, 0:n2])
    right = jnp.where(odd, u[:, :, 3:n2 + 3], u[:, :, 2:n2 + 2])
    return left + f * (right - left)


# ---------------------------------------------------------------------------
# kernel 1: assemble the padded concat tensor + SE sums
# ---------------------------------------------------------------------------


def _assemble_cm_kernel(fm_ref, kfm_ref, b_ref, xc_ref, skip_any, disp_any,
                        cat_ref, sum_ref, sbuf, dbuf, obuf, sem,
                        *, rh, w, w2, sh, sw, cf, cu, cso, cd, nprog):
    i = pl.program_id(0)

    cp_s = pltpu.make_async_copy(skip_any.at[pl.ds(i * rh, rh + 2)],
                                 sbuf, sem.at[0])
    cp_s.start()
    if cd:
        cp_d = pltpu.make_async_copy(disp_any.at[pl.ds(i * rh, rh + 2)],
                                     dbuf, sem.at[1])
        cp_d.start()

    @pl.when(i == 0)
    def _():
        sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)

    # ping-pong output buffer: program i computes into slot i%2 and starts
    # its writeback WITHOUT waiting (the wait happens two programs later,
    # or in the drain at the last program) — the ~2rh full-res-row DMA
    # overlaps the next program's compute instead of serializing after it
    p = jax.lax.rem(i, 2)
    ob = obuf.at[p]

    def out_dma(slot, prog):
        return pltpu.make_async_copy(
            obuf.at[slot], cat_ref.at[pl.ds(2 * prog * rh + 2, 2 * rh)],
            sem.at[3 + slot])

    @pl.when(i >= 2)
    def _():
        out_dma(p, i - 2).wait()

    # zero the align8 channel-pad block [ccat, ccatp) — tail_cm's iconv
    # contracts over the padded channels (with zero kernel columns), so
    # they must hold zeros, not stale VMEM
    ccat = cso + cu + cd
    if obuf.shape[2] > ccat:
        ob[:, ccat:] = jnp.zeros(
            (obuf.shape[1], obuf.shape[2] - ccat) + obuf.shape[3:],
            obuf.dtype)

    dt = cat_ref.dtype
    wp = obuf.shape[3]
    b = obuf.shape[4]
    fe, fo = _row_weights(i, rh, sh, dt)
    fcol, odd = _col_weights_cm(w, sw, dt)
    bias = b_ref[...].astype(jnp.float32)  # (cso, 1) broadcasts over W*B
    kfm = kfm_ref[...]

    # stores always span the full padded width [0, wp): reflect cols at
    # [0] / [w+1] and alignment zeros at [w+2, wp) are concatenated onto the
    # computed body (Mosaic rejects sublane-unaligned ref stores)
    zpad = jnp.zeros((2, cu, wp - w - 2, b), dt)

    def _padded(v, zp):
        return jnp.concatenate(
            [v[:, :, 1:2], v, v[:, :, w - 2:w - 1], zp], axis=2)

    # --- upsample path: pixel shuffle of elu(xc), channels phase-major ---
    for r in range(rh) if "xup" not in _STRIP else ():
        planes = [_elu(xc_ref[r, ph * cu:(ph + 1) * cu]).astype(dt)
                  for ph in range(4)]
        # (cu, w2, b) planes -> two full-res rows, cols interleaved
        rows = [_interleave_cols(planes[2 * a], planes[2 * a + 1])
                for a in (0, 1)]
        xup = jnp.stack(rows, axis=0)                      # (2, cu, w, b)
        ob[2 * r:2 * r + 2, cso:cso + cu] = _padded(xup, zpad)

    # --- z path: elu(fm @ kfm + up2(skipfeat) + bias), UNGATED ---
    cp_s.wait()
    sb = sbuf[...]
    acc = jnp.zeros(sum_ref.shape, sum_ref.dtype)
    for r in range(rh) if "z" not in _STRIP else ():
        up = _up2_block_cm(sb[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                           fcol, odd, 1, w2)               # (2, cso, w, b)
        se_fm = jnp.stack([
            jax.lax.dot_general(
                kfm, fm_ref[2 * r + j].reshape(cf, w * b),
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            for j in (0, 1)], axis=0).reshape(2, cso, w, b)
        se = se_fm + up.astype(jnp.float32) + bias.reshape(1, cso, 1, 1)
        z32 = jnp.where(se > 0, se, jnp.exp(se) - 1.0)
        acc = acc + z32.sum(axis=(0, 2))
        z = z32.astype(dt)
        ob[2 * r:2 * r + 2, 0:cso] = _padded(
            z, jnp.zeros((2, cso, wp - w - 2, b), dt))
    sum_ref[...] += acc

    # --- disparity path: up2(disp) ---
    if cd and "disp" not in _STRIP:
        cp_d.wait()
        db = dbuf[...]
        for r in range(rh):
            up = _up2_block_cm(db[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                               fcol, odd, 1, w2).astype(dt)
            ob[2 * r:2 * r + 2, cso + cu:cso + cu + cd] = _padded(
                up, jnp.zeros((2, cd, wp - w - 2, b), dt))

    # --- write: real rows live at padded index +2 (async; see ping-pong) ---
    cp_o = out_dma(p, i)
    cp_o.start()

    if nprog >= 2:
        @pl.when(i == nprog - 1)
        def _():
            out_dma(1 - p, i - 1).wait()

    @pl.when(i == nprog - 1)
    def _():
        cp_o.wait()

    # border programs fill the 2-row slack with the reflect rows (padded
    # row 1 := real row 1 — the value tail_cm's interior taps actually
    # need; padded row 0 / H+3 are only read by out rows that get
    # @pl.when-substituted, but exact reflect keeps the buffer meaningful)
    if "border" in _STRIP:
        return

    @pl.when(i == 0)
    def _():
        for src, dst in ((2, 0), (1, 1)):
            cp_b = pltpu.make_async_copy(obuf.at[p, pl.ds(src, 1)],
                                         cat_ref.at[pl.ds(dst, 1)], sem.at[2])
            cp_b.start()
            cp_b.wait()

    @pl.when(i == nprog - 1)
    def _():
        base = 2 * i * rh + 2
        for src, dst in ((2 * rh - 2, base + 2 * rh),
                         (2 * rh - 3, base + 2 * rh + 1)):
            cp_b = pltpu.make_async_copy(obuf.at[p, pl.ds(src, 1)],
                                         cat_ref.at[pl.ds(dst, 1)], sem.at[2])
            cp_b.start()
            cp_b.wait()


@functools.partial(jax.jit, static_argnames=("cso", "cu", "cd"))
def _assemble_cm_pallas(fm_t, kfm, xc_t, skip_t, disp_t, bias, cso, cu, cd):
    """fm_t (H, Cf, W, B); xc_t (H2, 4cu, W2, B); skip_t/disp_t
    (H2+2, C, W2a, B) zero-padded rows/cols (W2a = align8(W2+2)); returns
    cat (H+4, align8(Ccat), Wp, B) with 1-col reflect pad at [0] and [W+1]
    and zeroed channel pad, and sums (cso, B) f32."""
    h, cf, w, b = fm_t.shape
    h2, w2 = xc_t.shape[0], xc_t.shape[2]
    ccat = _align8(cso + cu + cd)  # channel pad zeroed in-kernel
    wp = _align8(w + 2)

    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(w2 - 1) / np.float32(w - 1)

    rh = 2  # the ping-pong obuf doubles VMEM; 2 half-rows/program fits all
    while rh > 1 and h2 % rh:
        rh //= 2
    nprog = h2 // rh

    w2a = skip_t.shape[2]

    cat, sums = pl.pallas_call(
        functools.partial(_assemble_cm_kernel, rh=rh, w=w, w2=w2, sh=sh,
                          sw=sw, cf=cf, cu=cu, cso=cso, cd=cd, nprog=nprog),
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((2 * rh, cf, w, b), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, cf), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((rh, 4 * cu, w2, b), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((cso, b), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h + 4, ccat, wp, b), fm_t.dtype),
            jax.ShapeDtypeStruct((cso, b), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rh + 2, cso, w2a, b), fm_t.dtype),
            pltpu.VMEM((rh + 2, max(cd, 1), w2a, b), fm_t.dtype),
            pltpu.VMEM((2, 2 * rh, ccat, wp, b), fm_t.dtype),
            pltpu.SemaphoreType.DMA((5,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(fm_t, kfm, bias.reshape(cso, 1).astype(jnp.float32), xc_t,
      skip_t, disp_t)
    return cat, sums


# ---------------------------------------------------------------------------
# kernel 2: gate + iconv + ELU + disparity head + next-stage projections
# ---------------------------------------------------------------------------


def _tail_cm_kernel(gt_ref, kt_ic_ref, bic_ref, kt_d_ref, bd_ref, scale_ref,
                    kt_up_ref, bup_ref, ksk_ref, cat_any,
                    disp_ref, xc_ref, sk_ref, slab, outbuf, acc, sem,
                    *, rb, w, b, cso, co, cd, nprog, emit_next):
    i = pl.program_id(0)

    # merged-lane slab: (rb+4, Ccatp, Wp*B) — the DMA from linear HBM does
    # the (W, B) -> W*B retiling for free
    cp = pltpu.make_async_copy(cat_any.at[pl.ds(i * rb, rb + 4)], slab, sem)
    cp.start()
    gt = gt_ref[...]              # (cso, Wp*B): SE gates pre-tiled over W
    kt_ic = kt_ic_ref[...]
    cp.wait()

    dt = slab.dtype
    wb = w * b

    # gate the z channel block in place (per-(channel, batch) SE gates;
    # lane j = w*B + b, so the tile g[c, j % B] is exactly the gate map)
    if "gate" not in _STRIP:
        slab[:, 0:cso] = slab[:, 0:cso] * gt[None]

    sl = slab[...]

    def taps3(row, off):
        """K-stack of the 3 column taps: lane-tile-aligned slices, 8-aligned
        sublane concat — no relayout.  row: (C, >= off + 2B + w*B)."""
        return jnp.concatenate(
            [row[:, off + v * b: off + v * b + wb] for v in range(3)], axis=0)

    # --- out rows [i*rb - 1, i*rb + rb + 1): 3x3 reflect iconv + ELU ---
    # slab row j = cat padded row i*rb + j = cat real row i*rb + j - 2,
    # so out row (local) r uses slab rows r .. r+2 for r in [0, rb+2).
    bic = bic_ref[...].astype(jnp.float32)
    for r in range(rb + 2) if "ic" not in _STRIP else ():
        for u in range(3):
            part = jax.lax.dot_general(
                kt_ic[u], taps3(sl[r + u], 0), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            if u == 0:
                acc[0:co] = part
            else:
                acc[0:co] += part
        y = acc[0:co] + bic
        y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
        outbuf[r] = y.astype(dt)

    # H-border reflect substitution: out[-1] := out[1], out[H] := out[H-2]
    @pl.when(i == 0)
    def _():
        outbuf[0] = outbuf[2]

    @pl.when(i == nprog - 1)
    def _():
        outbuf[rb + 1] = outbuf[rb - 1]

    def reflect_taps(row):
        """1-px column reflect of an out row (co, w*B) then the 3-tap
        K-stack: all slices at lane-tile offsets."""
        refl = jnp.concatenate(
            [row[:, b:2 * b], row, row[:, wb - 2 * b:wb - b]], axis=1)
        return taps3(refl, 0)

    # --- disparity head: scale * sigmoid(3x3 reflect conv of out) ---
    if cd and "dh" not in _STRIP:
        kt_d = kt_d_ref[...]
        bd = bd_ref[...].astype(jnp.float32)
        scale = scale_ref[0, 0]
        for r in range(rb):
            dacc = None
            for u in range(3):
                part = jax.lax.dot_general(
                    kt_d[u], reflect_taps(outbuf[r + u]),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                dacc = part if dacc is None else dacc + part
            y = scale * jax.nn.sigmoid(dacc + bd)
            disp_ref[r] = y.astype(dt)

    if emit_next and "up" not in _STRIP:
        # --- next stage's upsample conv: 3x3 reflect conv of out ---
        kt_up = kt_up_ref[...]
        bup = bup_ref[...].astype(jnp.float32)
        cup = kt_up.shape[1]
        for r in range(rb):
            for u in range(3):
                part = jax.lax.dot_general(
                    kt_up[u], reflect_taps(outbuf[r + u]),
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                if u == 0:
                    acc[0:cup] = part
                else:
                    acc[0:cup] += part
            xc_ref[r] = (acc[0:cup] + bup).astype(dt)

    if emit_next and "sk" not in _STRIP:
        # --- next stage's SE skip projection: 1x1 over the gated z ---
        ksk = ksk_ref[...]
        for r in range(rb):
            zrow = sl[r + 2, 0:cso, b:b + wb]
            part = jax.lax.dot_general(
                ksk, zrow, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            sk_ref[r] = part.astype(dt)


@functools.partial(jax.jit, static_argnames=("cso", "co", "cd", "w"))
def _tail_cm_pallas(cat, gates, kt_ic, bic, kt_d, bd, scale, kt_up, bup,
                    ksk, cso, co, cd, w):
    hp, ccatp, wp, b = cat.shape
    h = hp - 4
    emit_next = kt_up is not None
    isz = jnp.dtype(cat.dtype).itemsize
    wb = w * b
    wpb = wp * b

    # pad the K-stacked kernels' per-tap channel blocks ccat -> ccatp (the
    # zeroed cat channel pad contributes nothing)
    ccat = kt_ic.shape[2] // 3
    if ccatp > ccat:
        kt_ic = jnp.pad(kt_ic.reshape(3, co, 3, ccat),
                        ((0, 0), (0, 0), (0, 0), (0, ccatp - ccat))
                        ).reshape(3, co, 3 * ccatp)

    cup = kt_up.shape[1] if emit_next else 1
    csk = ksk.shape[0] if emit_next else 1
    if not emit_next:
        kt_up = jnp.zeros((3, 1, 3 * co), cat.dtype)
        bup = jnp.zeros((1, 1), jnp.float32)
        ksk = jnp.zeros((1, cso), cat.dtype)
    if not cd:
        kt_d = jnp.zeros((3, 1, 3 * co), cat.dtype)
        bd = jnp.zeros((1, 1), jnp.float32)

    def vmem_need(rb):
        slab = (rb + 4) * ccatp * wpb * isz
        outbuf = (rb + 2) * co * wb * isz
        accb = max(co, cup) * wb * 4
        gt = 2 * cso * wpb * isz
        blocks = 2 * rb * (max(cd, 1) + cup + csk) * wb * isz
        return slab + outbuf + accb + gt + blocks

    rb = next((c for c in (8, 4, 2, 1)
               if h % c == 0 and vmem_need(c) <= 88 * 1024 * 1024), 1)
    nprog = h // rb

    # merged-lane views: free reshapes (row-major minor-dim merges)
    cat2 = cat.reshape(hp, ccatp, wpb)
    gt = jnp.tile(gates.astype(cat.dtype), (1, wp))

    out_shapes = [
        jax.ShapeDtypeStruct((h, max(cd, 1), wb), cat.dtype),   # disp
        jax.ShapeDtypeStruct((h, cup, wb), cat.dtype),          # xc_next
        jax.ShapeDtypeStruct((h, csk, wb), cat.dtype),          # skip_next
    ]

    disp, xc, sk = pl.pallas_call(
        functools.partial(_tail_cm_kernel, rb=rb, w=w, b=b, cso=cso,
                          co=co, cd=cd, nprog=nprog, emit_next=emit_next),
        grid=(nprog,),
        in_specs=[
            pl.BlockSpec((cso, wpb), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(kt_ic.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(kt_d.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_d.shape[1], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(kt_up.shape, lambda i: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt_up.shape[1], 1), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(ksk.shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((rb, max(cd, 1), wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, cup, wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rb, csk, wb), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=out_shapes,
        scratch_shapes=[
            pltpu.VMEM((rb + 4, ccatp, wpb), cat.dtype),
            pltpu.VMEM((rb + 2, co, wb), cat.dtype),
            pltpu.VMEM((max(co, cup), wb), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=_INTERPRET,
    )(gt, kt_ic, bic.reshape(co, 1).astype(jnp.float32), kt_d,
      bd if bd.ndim == 2 else bd.reshape(-1, 1).astype(jnp.float32),
      jnp.asarray(scale, jnp.float32).reshape(1, 1), kt_up,
      bup if bup.ndim == 2 else bup.reshape(-1, 1).astype(jnp.float32),
      ksk, cat2)
    if cd:
        disp = disp.reshape(h, cd, w, b)
    else:
        disp = None
    if emit_next:
        xc = xc.reshape(h, cup, w, b)
        sk = sk.reshape(h, csk, w, b)
    else:
        xc = sk = None
    return disp, xc, sk


# ---------------------------------------------------------------------------
# public API (with identical-math XLA fallbacks for CPU/tests)
# ---------------------------------------------------------------------------


def assemble_cm(fm_t, kfm, xc_t, skip_t, disp_t, bias, cso, cu, cd):
    """Channel-major fused assemble.  See module docstring.

    ``fm_t``: (H, Cf, W, B) feature map (channel-major transpose);
    ``kfm``: (Cso, Cf) — the SE conv's feature-map kernel half, transposed;
    ``xc_t``: (H2, 4Cu, W2, B) phase-major upsample-conv output (pre-ELU);
    ``skip_t``: (H2+2, Cso, W2a, B) zero-padded skip projection;
    ``disp_t``: (H2+2, Cd, W2a, B) zero-padded disparity (or None).
    Returns (cat, sums): cat (H+4, Ccat, align8(W+2), B) — real rows at
    [2, H+2), real cols at [1, W+1), 1-col reflect pads, 2-row slack —
    and sums (Cso, B) f32 (the SE squeeze numerator).
    """
    if disp_t is None:
        h2 = xc_t.shape[0]
        w2a = skip_t.shape[2]
        b = fm_t.shape[3]
        disp_t = jnp.zeros((h2 + 2, 1, w2a, b), fm_t.dtype)
        cd = 0
    if not _use_kernel():
        return _assemble_cm_fallback(fm_t, kfm, xc_t, skip_t, disp_t, bias,
                                     cso, cu, cd)
    return _assemble_cm_pallas(fm_t, kfm, xc_t, skip_t, disp_t, bias,
                               cso, cu, cd)


def tail_cm(cat, gates, kt_ic, bic, kt_d, bd, disp_scale, kt_up, bup, ksk,
            cso, co, cd, w):
    """Channel-major fused tail.  See module docstring.

    ``cat``: assemble_cm's output; ``gates``: (Cso, B) SE gates;
    ``kt_ic``: (3, Co, 3*Ccat) column-stacked iconv kernel;
    ``kt_d``: (3, Cd, 3*Co) disparity kernel (cd=0 to skip);
    ``kt_up``/``bup``: next stage's upsample conv (None to skip);
    ``ksk``: (Cso_next, Cso) next stage's SE skip projection (with kt_up).
    Returns (disp (H, Cd, W, B), xc_next (H, 4Cu', W, B),
    skip_next (H, Cso', W, B)) — entries None when not requested.
    """
    if not _use_kernel():
        return _tail_cm_fallback(cat, gates, kt_ic, bic, kt_d, bd,
                                 disp_scale, kt_up, bup, ksk, cso, co, cd, w)
    return _tail_cm_pallas(cat, gates, kt_ic, bic, kt_d, bd, disp_scale,
                           kt_up, bup, ksk, cso, co, cd, w)


# ---------------------------------------------------------------------------
# fallbacks: same math through plain XLA ops (also the test reference)
# ---------------------------------------------------------------------------


def _up2_ref(x_t, h, w):
    """align_corners 2x upsample of (H2, C, W2, B) -> (H, C, W, B) via the
    serving resize (exact same lerp coefficients)."""
    from ..resize import resize_bilinear
    x = jnp.transpose(x_t, (3, 0, 2, 1))          # (B, H2, W2, C)
    y = resize_bilinear(x, (h, w))
    return jnp.transpose(y, (1, 3, 2, 0))


def _assemble_cm_fallback(fm_t, kfm, xc_t, skip_t, disp_t, bias, cso, cu, cd):
    h, cf, w, b = fm_t.shape
    h2, w2 = xc_t.shape[0], xc_t.shape[2]
    ccat = _align8(cso + cu + cd)  # zeroed channel pad, like the kernel
    wp = _align8(w + 2)
    dt = fm_t.dtype

    se_fm = jnp.einsum("oc,hcwb->howb", kfm, fm_t,
                       preferred_element_type=jnp.float32)
    up = _up2_ref(skip_t[1:h2 + 1, :, 1:w2 + 1], h, w).astype(jnp.float32)
    se = se_fm + up + bias.reshape(1, cso, 1, 1).astype(jnp.float32)
    z32 = jnp.where(se > 0, se, jnp.exp(se) - 1.0)
    sums = z32.sum(axis=(0, 2))
    z = z32.astype(dt)

    xe = _elu(xc_t).astype(dt)                    # (H2, 4cu, W2, B) f32->dt
    x4 = xe.reshape(h2, 2, 2, cu, w2, b)
    xup = (x4.transpose(0, 1, 3, 4, 2, 5)
           .reshape(h2, 2, cu, w2 * 2, b)
           .transpose(0, 1, 2, 3, 4)
           .reshape(h, cu, w, b))

    parts = [z, xup]
    if cd:
        parts.append(_up2_ref(disp_t[1:h2 + 1, :, 1:w2 + 1], h, w).astype(dt))
    if ccat > cso + cu + cd:
        parts.append(jnp.zeros((h, ccat - cso - cu - cd, w, b), dt))
    body = jnp.concatenate(parts, axis=1)         # (H, Ccatp, W, B)

    padded = jnp.concatenate(
        [body[:, :, 1:2], body, body[:, :, w - 2:w - 1],
         jnp.zeros((h, ccat, wp - w - 2, b), dt)], axis=2)
    cat = jnp.concatenate(
        [jnp.zeros((2, ccat, wp, b), dt), padded,
         jnp.zeros((2, ccat, wp, b), dt)], axis=0)
    return cat, sums


def _conv3_ref(x_t, kt, bias):
    """3x3 reflect conv on (H, C, W, B) with the (3, Co, 3C) stacked kernel
    (fallback reference; f32 accumulation like the kernel)."""
    h, c, w, b = x_t.shape
    co = kt.shape[1]
    xr = jnp.concatenate([x_t[:, :, 1:2], x_t, x_t[:, :, w - 2:w - 1]], axis=2)
    xr = jnp.concatenate([xr[1:2], xr, xr[h - 2:h - 1]], axis=0)
    acc = jnp.zeros((h, co, w, b), jnp.float32)
    for u in range(3):
        rows = xr[u:u + h]
        rhs = jnp.concatenate([rows[:, :, v:v + w] for v in range(3)], axis=1)
        acc = acc + jnp.einsum("ok,hkwb->howb", kt[u], rhs,
                               preferred_element_type=jnp.float32)
    return acc + bias.reshape(1, co, 1, 1).astype(jnp.float32)


def _tail_cm_fallback(cat, gates, kt_ic, bic, kt_d, bd, disp_scale,
                      kt_up, bup, ksk, cso, co, cd, w):
    hp, ccatp, wp, b = cat.shape
    h = hp - 4
    dt = cat.dtype
    ccat = kt_ic.shape[2] // 3   # drop the zeroed align8 channel pad
    body = cat[2:h + 2, 0:ccat, 1:w + 1]
    body = jnp.concatenate(
        [body[:, 0:cso] * gates[None, :, None, :].astype(dt),
         body[:, cso:]], axis=1)

    out32 = _conv3_ref(body, kt_ic, bic)
    out = jnp.where(out32 > 0, out32, jnp.exp(out32) - 1.0).astype(dt)

    disp = xc = sk = None
    if cd:
        d32 = _conv3_ref(out, kt_d, bd)
        disp = (jnp.asarray(disp_scale, jnp.float32)
                * jax.nn.sigmoid(d32)).astype(dt)
    if kt_up is not None:
        xc = _conv3_ref(out, kt_up, bup).astype(dt)
        sk = jnp.einsum("ok,hkwb->howb", ksk, body[:, 0:cso],
                        preferred_element_type=jnp.float32).astype(dt)
    return disp, xc, sk
