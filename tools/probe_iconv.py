#!/usr/bin/env python3
"""Microbenchmark: fused decoder-tail (gate + 3x3 iconv + ELU) kernel designs.

The round-3 trace (docs/PERFORMANCE.md) shows the post-assemble tail of each
fused decoder stage costs, at stage 4 (256x512, ccat=44, co=32, batch 128):
transpose-back 3.24 ms + gate_z 3.29 + XLA iconv ~5 + elu select 3.26 —
~15 ms of pure glue around a conv whose HBM floor is ~3 ms.  This probe
measures candidate Pallas replacements IN ISOLATION (relative numbers only):

  xla      — the current tail: from_hwcb transpose, gate_z, reflect iconv,
             ELU (the production ops, measured together)
  cmajor   — Pallas tail on a (H, C, W, B)-stored cat: manual row DMA,
             in-VMEM gating, column-im2col (K=3C) MXU matmuls, fused ELU
  rowt     — same but cat stays (H, W, C, B) (assemble's current output) and
             each DMA'd row is transposed (W, C, B)->(C, W, B) in VMEM —
             measures Mosaic's sublane-crossing transpose cost
  taps9    — cmajor with 9 K=C matmuls (no im2col stack) — isolates the
             im2col build cost vs the K-padding cost

Usage: python tools/probe_iconv.py [stage]   (stage in {2,3,4}, default 4)
"""

from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SHAPES = {
    # stage: (H, W, ccat, cso, co)
    2: (64, 128, 164, 128, 128),
    3: (128, 256, 84, 64, 64),
    4: (256, 512, 44, 32, 32),
}
B = 128


def _fetch(out):
    """Completion barrier that works through the axon tunnel: fetch a
    scalar (block_until_ready is NOT a barrier there — see bench.py)."""
    leaf = jax.tree.leaves(out)[0]
    return float(leaf[0, 0, 0, 0].astype(jnp.float32))


def timeit(fn, *args, reps=20):
    out = fn(*args)
    _fetch(out)  # compile + warm
    t0 = time.perf_counter()
    _fetch(out)
    overhead = time.perf_counter() - t0  # one scalar-fetch round trip
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return max(time.perf_counter() - t0 - overhead, 0.0) / reps


# --------------------------------------------------------------------------
# xla baseline: the production tail ops
# --------------------------------------------------------------------------


def make_xla(h, w, ccat, cso, co, key):
    from uncertainty_model_tpu.serving import _rconv
    from uncertainty_model_tpu.ops.pallas.decoder_fused import gate_z

    cat_t = jax.random.normal(key, (h, w, ccat, B), jnp.bfloat16)
    gates = jax.random.uniform(key, (B, cso), jnp.float32)
    k = jax.random.normal(key, (3, 3, ccat, co), jnp.bfloat16) * 0.1
    b = jnp.zeros((co,), jnp.bfloat16)

    @jax.jit
    def run(cat_t, gates, k, b):
        cat = jnp.transpose(cat_t, (3, 0, 1, 2))
        cat = gate_z(cat, gates, cso)
        return jax.nn.elu(_rconv(cat, k, b))

    return run, (cat_t, gates, k, b)


# --------------------------------------------------------------------------
# Pallas variants
# --------------------------------------------------------------------------


def _tail_kernel(g_ref, kt_ref, b_ref, cat_any, out_ref, slab, sem,
                 *, rb, w, ccat, cso, co, variant):
    """cat_any: (H, C, Wp, B) zero-padded 8-aligned cols (cmajor/taps9) or
    (H, Wp, C, B) (rowt).  out block: (rb, co, w, b)."""
    i = pl.program_id(0)

    cp = pltpu.make_async_copy(cat_any.at[pl.ds(i * rb, rb + 2)], slab, sem)
    cp.start()
    g = g_ref[...]
    kt = kt_ref[...]
    cp.wait()

    # read the scratch ONCE as a value; per-row slices of a 4-D scratch ref
    # trip Mosaic's sublane-alignment rule (see ops/pallas/conv.py)
    sl = slab[...]
    if variant == "rowt":
        rows = [jnp.swapaxes(sl[r], 0, 1) for r in range(rb + 2)]
    else:
        rows = [sl[r] for r in range(rb + 2)]

    # gate the z channels (cat layout [z | xup | disp], z = [0, cso))
    dt = out_ref.dtype
    gd = g.astype(dt)
    rows = [jnp.concatenate([rows[r][0:cso] * gd[:, None, :],
                             rows[r][cso:]], axis=0)
            for r in range(rb + 2)]

    for r in range(rb):
        if variant == "taps9":
            acc = None
            for u in range(3):
                for v in range(3):
                    rhs = rows[r + u][:, v:v + w].reshape(ccat, w * B)
                    part = jax.lax.dot_general(
                        kt[u * 3 + v], rhs, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    acc = part if acc is None else acc + part
        else:
            acc = None
            for u in range(3):
                rhs = jnp.stack(
                    [rows[r + u][:, v:v + w] for v in range(3)],
                    axis=0).reshape(3 * ccat, w * B)
                part = jax.lax.dot_general(
                    kt[u], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                acc = part if acc is None else acc + part
        y = acc + b_ref[...].astype(jnp.float32)
        y = jnp.where(y > 0, y, jnp.exp(y) - 1.0)
        out_ref[r] = y.astype(dt).reshape(co, w, B)


def make_pallas(h, w, ccat, cso, co, key, variant):
    rb = 4 if w <= 256 else 2
    wp = w + 2 + ((-(w + 2)) % 8)  # 8-aligned padded width (Mosaic DMA rule)
    if variant == "rowt":
        cat = jax.random.normal(key, (h, wp, ccat, B), jnp.bfloat16)
        slab_shape = (rb + 2, wp, ccat, B)
    else:
        cat = jax.random.normal(key, (h, ccat, wp, B), jnp.bfloat16)
        slab_shape = (rb + 2, ccat, wp, B)
    gates = jax.random.uniform(key, (cso, B), jnp.float32)
    kern = jax.random.normal(key, (3, 3, ccat, co), jnp.bfloat16) * 0.1
    if variant == "taps9":
        kt = jnp.stack([kern[u, v].T for u in range(3) for v in range(3)])
    else:
        # (u, co, 3*ccat): column-tap-major to match the stacked rhs
        kt = jnp.stack([
            jnp.concatenate([kern[u, v] for v in range(3)], axis=0).T
            for u in range(3)])
    bias = jnp.zeros((co, 1), jnp.float32)

    grid = (h - 2) // rb  # probe skips H-border handling

    run = pl.pallas_call(
        functools.partial(_tail_kernel, rb=rb, w=w, ccat=ccat, cso=cso,
                          co=co, variant=variant),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec((cso, B), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(kt.shape, lambda i: (0,) * kt.ndim,
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((co, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec((rb, co, w, B), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((grid * rb, co, w, B), jnp.bfloat16),
        scratch_shapes=[
            pltpu.VMEM(slab_shape, jnp.bfloat16),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )
    jrun = jax.jit(lambda c, g, k, b: run(g, k, b, c))
    return jrun, (cat, gates, kt, bias)


def main():
    stage = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    h, w, ccat, cso, co = SHAPES[stage]
    key = jax.random.PRNGKey(0)
    print(f"stage {stage}: {h}x{w} ccat={ccat} cso={cso} co={co} batch={B}",
          flush=True)

    for name in ("xla", "cmajor", "taps9", "rowt"):
        try:
            if name == "xla":
                fn, args = make_xla(h, w, ccat, cso, co, key)
            else:
                fn, args = make_pallas(h, w, ccat, cso, co, key, name)
            sec = timeit(fn, *args)
            print(f"  {name:8s}: {sec*1e3:8.2f} ms", flush=True)
        except Exception as e:
            print(f"  {name:8s}: FAILED {type(e).__name__}: {str(e)[:300]}",
                  flush=True)


if __name__ == "__main__":
    main()
