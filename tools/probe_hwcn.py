#!/usr/bin/env python3
"""Probe: can lax.conv emit/consume (H, W, C, B) activations directly?

The fused decoder path needs its Pallas kernels' operands in (H, W, C, B)
(lanes = batch).  Round-3 traces showed the `_to_hwcb` transposes of the
1x1-conv PRODUCERS compile to real transpose-convolutions (3.24 + 1.95 +
0.93 ms/pass at batch 128) although the same transpose of 3x3 reflect-conv
outputs is a free bitcast.  If the producer conv can emit `01fb` directly
(dimension_numbers out spec "HWCN") — and the iconv can consume `01fb` —
those passes disappear.

Measures, at decoder stage-4-like shapes (batch 128, bf16):
  a) 1x1 conv b01f->b01f + explicit transpose to (H,W,C,B)
  b) 1x1 conv b01f->01fb (direct emit)
  c) 1x1 conv with input pad (the _pad_half fold) b01f->01fb
  d) 3x3 conv consuming 01fb -> b01f (the iconv side)
  e) 3x3 conv b01f->b01f (baseline for d)

Chained-pass harness (data-dependent, no CSE); operands are jit ARGUMENTS
(embedding them as closure constants ships them in the compile RPC — the
tunnel rejects >~50 MB bodies with HTTP 413).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax
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


def main():
    dt = jnp.bfloat16
    b = 128
    rng = np.random.default_rng(0)

    x0 = jnp.asarray(rng.normal(size=(b, 256, 512, 16)) * 0.1, dt)
    k1 = jnp.asarray(rng.normal(size=(1, 1, 16, 32)) * 0.1, dt)
    k3 = jnp.asarray(rng.normal(size=(3, 3, 44, 32)) * 0.1, dt)
    cat0 = jnp.asarray(rng.normal(size=(256, 512, 44, b)) * 0.1, dt)
    catb = jnp.transpose(cat0, (3, 0, 1, 2))

    def case_a(k):
        def f(x0, k1):
            def body(_, x):
                y = lax.conv_general_dilated(
                    x, k1, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                yt = jnp.transpose(y, (1, 2, 3, 0))       # (H,W,C,B)
                return x * (1 + 1e-6 * jnp.transpose(
                    yt[..., :16, :], (3, 0, 1, 2)).astype(x.dtype))
            x = lax.fori_loop(0, k, body, x0)
            return jnp.mean(x.astype(jnp.float32))
        return f

    def case_b(k):
        def f(x0, k1):
            def body(_, x):
                yt = lax.conv_general_dilated(
                    x, k1, (1, 1), "VALID",
                    dimension_numbers=("NHWC", "HWIO", "HWCN"))
                return x * (1 + 1e-6 * jnp.transpose(
                    yt[..., :16, :], (3, 0, 1, 2)).astype(x.dtype))
            x = lax.fori_loop(0, k, body, x0)
            return jnp.mean(x.astype(jnp.float32))
        return f

    def case_c(k):
        def f(x0, k1):
            def body(_, x):
                yt = lax.conv_general_dilated(
                    x, k1, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "HWCN"))
                return x * (1 + 1e-6 * jnp.transpose(
                    yt[1:-1, 1:-1, :16, :], (3, 0, 1, 2)).astype(x.dtype))
            x = lax.fori_loop(0, k, body, x0)
            return jnp.mean(x.astype(jnp.float32))
        return f

    def case_d(k):
        def f(cat0, k3):
            def body(_, c):
                y = lax.conv_general_dilated(
                    c, k3, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("HWCN", "HWIO", "NHWC"))
                return c * (1 + 1e-6 * jnp.transpose(
                    y, (1, 2, 3, 0))[..., :44, :].astype(c.dtype))
            c = lax.fori_loop(0, k, body, cat0)
            return jnp.mean(c.astype(jnp.float32))
        return f

    def case_e(k):
        def f(cb, k3):
            def body(_, c):
                y = lax.conv_general_dilated(
                    c, k3, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"))
                return c * (1 + 1e-6 * y[..., :44].astype(c.dtype))
            c = lax.fori_loop(0, k, body, cb)
            return jnp.mean(c.astype(jnp.float32))
        return f

    for name, case, args in (
            ("a: 1x1 NHWC + transpose", case_a, (x0, k1)),
            ("b: 1x1 -> HWCN direct  ", case_b, (x0, k1)),
            ("c: 1x1 pad -> HWCN     ", case_c, (x0, k1)),
            ("d: 3x3 HWCN -> NHWC    ", case_d, (cat0, k3)),
            ("e: 3x3 NHWC -> NHWC    ", case_e, (catb, k3))):
        try:
            s = timeit(case, args)
            print(f"{name}: {s*1e3:8.2f} ms/pass", flush=True)
        except Exception as e:
            print(f"{name}: FAILED {type(e).__name__}: {str(e)[:160]}",
                  flush=True)


if __name__ == "__main__":
    main()
