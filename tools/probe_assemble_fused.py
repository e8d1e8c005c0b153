#!/usr/bin/env python3
"""Bisect the cost of decoder_fused._assemble_z_pallas at dec4 production
shapes (measured ~12 ms in-graph vs a ~4 ms HBM byte floor).

Variants strip one suspect at a time:
  full      production kernel (decoder_fused.assemble_z)
  noelu     ELU -> identity (f32 exp cost)
  nolerp    up2 lerps -> nearest (row/col copy, no fma chain)
  noshuffle xup path writes planes without the parity interleave
  zonly     skip xup + disp paths entirely
  xuponly   skip z + disp paths
  storeonly write a constant to the out block (grid + store floor)

Usage: probe_assemble_fused.py [stage(4|3|2)] [variant ...]
Env:   UMT_FUSED_BLOCKS=rh,wb block override (applies to every variant)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "bfloat16")

import uncertainty_model_tpu.ops.pallas.decoder_fused as df

B = 128
# stage: (h, w, cso, cu, cd)   (configs/uncertainty.yml decoder layers)
STAGES = {
    4: (256, 512, 32, 8, 4),
    3: (128, 256, 64, 16, 4),
    2: (64, 128, 128, 32, 4),
}


def _kernel(se_ref, xc_ref, b_ref, skip_any, disp_any, out_ref, sum_ref,
            sbuf, dbuf, sem, *, rh, wbc, sh, sw, cu, cso, cd, strip):
    i = pl.program_id(0)
    wb_ = pl.program_id(1)
    c0 = wb_ * wbc

    if strip == "storeonly":
        @pl.when((i == 0) & (wb_ == 0))
        def _():
            sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        return

    cp_s = pltpu.make_async_copy(
        skip_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
        sbuf, sem.at[0])
    cp_s.start()
    do_d = cd and strip not in ("zonly", "xuponly")
    if do_d:
        cp_d = pltpu.make_async_copy(
            disp_any.at[pl.ds(i * rh, rh + 2), pl.ds(c0, wbc + 2)],
            dbuf, sem.at[1])
        cp_d.start()

    @pl.when((i == 0) & (wb_ == 0))
    def _():
        sum_ref[...] = jnp.zeros(sum_ref.shape, sum_ref.dtype)

    dt = out_ref.dtype
    fe, fo = df._row_weights(i, rh, sh, dt)
    few, fow = df._col_weights(c0, wbc, sw, dt)
    bias = b_ref[...].astype(dt)
    b = out_ref.shape[3]

    elu = (lambda v: v) if strip == "noelu" else df._elu

    def up2(buf, r):
        if strip == "nolerp":
            cur = buf[r + 1:r + 2, 1:wbc + 1]
            two = jnp.concatenate([cur, cur], axis=0)
            return jnp.concatenate([two, two], axis=1)[:, :2 * wbc]
        return df._up2_block(buf[r:r + 3], fe[r:r + 1], fo[r:r + 1],
                             few, fow, 1, wbc)

    if strip != "zonly":
        for r in range(rh):
            planes = [elu(xc_ref[r, :, p * cu:(p + 1) * cu, :]).astype(dt)
                      for p in range(4)]
            if strip == "noshuffle":
                out_ref[2 * r, :, cso:cso + cu, :] = jnp.concatenate(
                    [planes[0], planes[1]], axis=0)[:, :cu]
                out_ref[2 * r + 1, :, cso:cso + cu, :] = jnp.concatenate(
                    [planes[2], planes[3]], axis=0)[:, :cu]
            else:
                rows = [jnp.stack([planes[2 * a], planes[2 * a + 1]],
                                  axis=1).reshape(2 * wbc, cu, b)
                        for a in (0, 1)]
                out_ref[2 * r:2 * r + 2, :, cso:cso + cu, :] = jnp.stack(
                    rows, axis=0)

    cp_s.wait()
    if strip != "xuponly":
        acc = jnp.zeros(sum_ref.shape, sum_ref.dtype)
        for r in range(rh):
            up = up2(sbuf, r)
            se = se_ref[2 * r:2 * r + 2] + up + bias
            z = elu(se)
            acc = acc + z.sum(axis=(0, 1))
            out_ref[2 * r:2 * r + 2, :, 0:cso, :] = z.astype(dt)
        sum_ref[...] += acc

    if do_d:
        cp_d.wait()
        for r in range(rh):
            up = up2(dbuf, r)
            out_ref[2 * r:2 * r + 2, :, cso + cu:cso + cu + cd, :] = up


@functools.partial(jax.jit, static_argnames=("strip",))
def variant(se_fm, skip_h, xc, disp_h, bias, strip):
    b, h, w, cso = se_fm.shape
    h2 = skip_h.shape[1]
    cu = xc.shape[3] // 4
    cd = disp_h.shape[3]
    ccat = cu + cso + cd

    se_t = df._to_hwcb(se_fm)
    skip_t = df._to_hwcb(df._pad_half(skip_h))
    xc_t = df._to_hwcb(xc)
    disp_t = df._to_hwcb(df._pad_half(disp_h))

    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(w - 1) / np.float32(2 * w - 2)  # unused precision-wise

    sh = np.float32(h2 - 1) / np.float32(h - 1)
    sw = np.float32(skip_h.shape[2] - 1) / np.float32(w - 1)

    it = se_fm.dtype.itemsize
    per_cell = (
        2 * (2 * ccat * B * it + 2 * cso * B * it + 2 * cu * B * it)
        + ((cso + cd) * B * it) * 3 // 2 + cso * B * 2)
    rh, wb = df._pick_blocks(h2, w, per_cell)
    wbc = wb // 2

    cat_t, sums = pl.pallas_call(
        functools.partial(_kernel, rh=rh, wbc=wbc, sh=sh, sw=sw,
                          cu=cu, cso=cso, cd=cd, strip=strip),
        grid=(h2 // rh, w // wb),
        in_specs=[
            pl.BlockSpec((2 * rh, wb, cso, B), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rh, wbc, 4 * cu, B), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, 1), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=[
            pl.BlockSpec((2 * rh, wb, ccat, B), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((cso, B), lambda i, j: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((h, w, ccat, B), se_fm.dtype),
            jax.ShapeDtypeStruct((cso, B), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((rh + 2, wbc + 2, cso, B), se_fm.dtype),
            pltpu.VMEM((rh + 2, wbc + 2, max(cd, 1), B), se_fm.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=df._VMEM_LIMIT),
        interpret=False,
    )(se_t, xc_t, bias.reshape(cso, 1).astype(jnp.float32), skip_t, disp_t)
    return df._from_hwcb(cat_t), sums


def fetch(out):
    leaf = jax.tree.leaves(out)[0]
    return float(leaf.reshape(-1)[0].astype(jnp.float32))


def timeit(fn, *args, reps=30):
    t0 = time.perf_counter()
    fetch(fn(*args))
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    fetch(fn(*args))
    overhead = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = None
    for _ in range(reps):
        out = fn(*args)
    fetch(out)
    return compile_s, max(time.perf_counter() - t0 - overhead, 0) / reps


def main():
    args = sys.argv[1:]
    stage = int(args[0]) if args and args[0].isdigit() else 4
    variants = [a for a in args if not a.isdigit()] or [
        "full", "storeonly", "noelu", "nolerp", "noshuffle", "zonly",
        "xuponly"]
    h, w, cso, cu, cd = STAGES[stage]
    h2, w2 = h // 2, w // 2
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    # device-side data: multi-GB host->device transfers trip the axon
    # tunnel's message limit (FAILED_PRECONDITION)
    key = jax.random.PRNGKey(0)
    se_fm = jax.random.normal(key, (B, h, w, cso), dt)
    skip_h = jax.random.normal(key, (B, h2, w2, cso), dt)
    xc = jax.random.normal(key, (B, h2, w2, 4 * cu), dt)
    disp_h = jax.random.normal(key, (B, h2, w2, cd), dt)
    bias = jnp.zeros((cso,), jnp.float32)

    for v in variants:
        if v == "full":
            fn = jax.jit(df.assemble_z)
            try:
                c, t = timeit(fn, se_fm, skip_h, xc, disp_h, bias)
                print(f"stage{stage} full(prod): compile {c:6.1f}s  "
                      f"run {t*1e3:7.2f} ms", flush=True)
            except Exception as e:
                print(f"stage{stage} full(prod): FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)
            continue
        try:
            c, t = timeit(functools.partial(variant, strip=v),
                          se_fm, skip_h, xc, disp_h, bias)
            print(f"stage{stage} {v:10s}: compile {c:6.1f}s  "
                  f"run {t*1e3:7.2f} ms", flush=True)
        except Exception as e:
            print(f"stage{stage} {v:10s}: FAILED {type(e).__name__}: "
                  f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
