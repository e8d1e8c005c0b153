#!/usr/bin/env python3
"""Probe: raw MXU throughput of the decoder-conv dot shapes.

Settles whether the channel-major tail's (Co, 3C) @ (3C, W*B) orientation
is inherently M-starved (Co = 32/64 streams against a 128-row systolic
array) or whether Mosaic/XLA pipelines small-M matmuls well — the
deciding factor between a cmajor-style fused iconv and XLA's own conv
emitters (which measure ~42% MXU on the same math).

Shapes: stage-4 iconv equivalents.  All bf16 with f32 accumulation,
chained (data-dependent) passes.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_default_matmul_precision", "bfloat16")


def timeit(make, args, k1=4, k2=12):
    f1, f2 = jax.jit(make(k1)), jax.jit(make(k2))
    float(f1(*args))
    float(f2(*args))
    t = {}
    for k, f in ((k1, f1), (k2, f2)):
        t0 = time.perf_counter()
        for _ in range(3):
            float(f(*args))
        t[k] = (time.perf_counter() - t0) / 3
    return (t[k2] - t[k1]) / (k2 - k1)


def dot_case(m, kk, n, dtype=jnp.bfloat16):
    rng = np.random.default_rng(0)
    a0 = jnp.asarray(rng.normal(size=(m, kk)) * 0.1, dtype)
    b0 = jnp.asarray(rng.normal(size=(kk, n)) * 0.1, dtype)

    def make(k):
        def f(a0, b0):
            def body(_, b):
                y = jax.lax.dot_general(
                    a0, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
                # scalar feedback keeps passes data-dependent (no CSE); the
                # b-refresh elementwise pass rides in every case equally
                return b * (1 + 1e-6 * y[0, 0].astype(b.dtype))
            b = jax.lax.fori_loop(0, k, body, b0)
            return jnp.mean(b.astype(jnp.float32))
        return f
    return make, (a0, b0)


def main():
    cases = [
        # stage-4 iconv as one dot per (row, row-tap): M=co
        ("(32,144)@(144,65536)   ", 32, 144, 65536),
        # 3 row-taps merged into K (one dot per row)
        ("(32,432)@(432,65536)   ", 32, 432, 65536),
        # stage-3 iconv
        ("(64,264)@(264,32768)   ", 64, 264, 32768),
        ("(64,792)@(792,32768)   ", 64, 792, 32768),
        # stage-2 iconv
        ("(128,504)@(504,16384)  ", 128, 504, 16384),
        # conv.py orientation: M=spatial, K=C, N=co (per tap)
        ("(65536,44)@(44,32)     ", 65536, 44, 32),
        ("(65536,396)@(396,32)   ", 65536, 396, 32),
        # reference near-square
        ("(4096,512)@(512,4096)  ", 4096, 512, 4096),
    ]
    for name, m, kk, n in cases:
        try:
            make, args = dot_case(m, kk, n)
            s = timeit(make, args)
            fl = 2 * m * kk * n
            print(f"{name}: {s*1e6:9.1f} us  {fl/s/1e12:6.1f} TFLOP/s",
                  flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)


if __name__ == "__main__":
    main()
