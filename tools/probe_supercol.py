#!/usr/bin/env python3
"""Probe: supercolumn implicit-GEMM conv inside Pallas on the (H, W, C, B)
batch-minor layout — candidate replacement for the decoder tail convs
(gate + iconv + ELU + disp) and the encoder interior convs.

Formulation: output col-group g of G native cols = M = G*co matmul rows.
RHS for (row, g, dh) is the free VMEM view
    x[row+dh, g*G : g*G + G + 2p, :cp, :].reshape((G+2p)*cp, B)
(cols and channels are adjacent dims; cp is 8-aligned so the reshape is a
bitcast).  N = B = 128 lanes; K = (G+2p)*cp per dh, accumulated over kh dh
steps.  Weights are block-Toeplitz with structural zeros: MAC ratio
(G+2p)/G vs the dense conv.  G=4 3x3: 1.5x; G=8 3x3: 1.25x... (per-dh K
grows but the zero fraction shrinks with G while VMEM/issue count falls).

Open question: MXU issue rate on many small [G*co, K] @ [K, 128] matmuls.
Measures dec4/dec3/dec2 (3x3) and enc0 (7x7) shapes, G in {4, 8}, plus a
no-matmul copy floor.

Usage: probe_supercol.py [dec4|dec3|dec2|enc0] [g4|g8|floor ...]
"""

from __future__ import annotations

import functools
import sys
import time

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

jax.config.update("jax_default_matmul_precision", "bfloat16")

B = 128
_VMEM = 100 * 1024 * 1024

# case: (h, w, cin, cout, k)
CASES = {
    "dec4": (256, 512, 44, 32, 3),
    "dec3": (128, 256, 84, 64, 3),
    "dec2": (64, 128, 164, 128, 3),
    "enc0": (128, 256, 32, 32, 7),
}


def _pad8(c):
    return (c + 7) // 8 * 8


def _kernel(x_ref, w_ref, out_ref, *, rows, G, cp, co, wg, kh, p, variant):
    # x_ref: (rows + kh - 1, W + 2p, cp, B)
    # w_ref: (kh, G*co, (G + 2p)*cp)
    # out_ref: (rows, wg, G*co, B)
    win = G + 2 * p
    if variant == "floor":
        for r in range(rows):
            def body(g, _):
                v = x_ref[r, pl.ds(g * G, G)]          # (G, cp, B)
                v = v.reshape(G * cp, B)
                out_ref[r, g] = jnp.concatenate(
                    [v] * ((G * co + G * cp - 1) // (G * cp)),
                    axis=0)[:G * co].astype(out_ref.dtype)
                return 0
            jax.lax.fori_loop(0, wg, body, 0)
        return

    for r in range(rows):
        def body(g, _):
            acc = jnp.zeros((G * co, B), jnp.float32)
            for dh in range(kh):
                rhs = x_ref[r + dh, pl.ds(g * G, win)]   # (win, cp, B)
                rhs = rhs.reshape(win * cp, B)
                acc += jax.lax.dot_general(
                    w_ref[dh], rhs, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            out_ref[r, g] = acc.astype(out_ref.dtype)
            return 0
        jax.lax.fori_loop(0, wg, body, 0)


@functools.partial(jax.jit,
                   static_argnames=("G", "co", "rows", "kh", "p", "variant"))
def run_case(x, w3, G, co, rows, kh, p, variant):
    hp, wp, cp, b = x.shape
    h = hp - (kh - 1)
    wg = (wp - 2 * p) // G
    out = pl.pallas_call(
        functools.partial(_kernel, rows=rows, G=G, cp=cp, co=co, wg=wg,
                          kh=kh, p=p, variant=variant),
        grid=(h // rows,),
        in_specs=[
            pl.BlockSpec((rows + kh - 1, wp, cp, B), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kh, G * co, (G + 2 * p) * cp),
                         lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((rows, wg, G * co, B),
                               lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((h, wg, G * co, B), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM),
        interpret=False,
    )(x, w3)
    return out


def fetch(out):
    return float(out.reshape(-1)[0].astype(jnp.float32))


def timeit(fn, *args, reps=20):
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
    cases = [a for a in args if a in CASES] or ["dec4", "enc0"]
    variants = [a for a in args if a in ("g4", "g8", "floor")] or \
        ["floor", "g4", "g8"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for case in cases:
        h, w, cin, cout, k = CASES[case]
        p = (k - 1) // 2
        cp = _pad8(cin)
        for v in variants:
            G = 8 if v == "g8" else 4
            rows = 8
            while rows > 1 and (
                    (rows + k - 1) * (w + 2 * p) * cp * B * 2 * 2
                    + rows * (w // G) * G * cout * B * 2 * 2) > 75e6:
                rows //= 2
            # device-side data: multi-GB host->device transfers trip the
            # axon tunnel's message limit (FAILED_PRECONDITION)
            x = jax.random.normal(
                jax.random.PRNGKey(0), (h + k - 1, w + 2 * p, cp, B), dt)
            w3 = 0.05 * jax.random.normal(
                jax.random.PRNGKey(1), (k, G * cout, (G + 2 * p) * cp), dt)
            try:
                c, t = timeit(functools.partial(
                    run_case, G=G, co=cout, rows=rows, kh=k, p=p, variant=v),
                    x, w3)
                macs = h * w * k * k * cin * cout * B
                eff = macs / t / 1e12
                print(f"{case} {v:5s} rows={rows}: compile {c:6.1f}s  "
                      f"run {t*1e3:7.2f} ms  ({eff:5.1f} eff-TMAC/s)",
                      flush=True)
            except Exception as e:
                print(f"{case} {v:5s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
