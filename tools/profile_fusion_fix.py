#!/usr/bin/env python3
"""Validate the two decoder/encoder fixes on-chip:
1. blend+BN+ELU fused INTO a 7x7 conv forces a spatial emitter (5.2ms) —
   does an optimization_barrier restore the MXU emitter?
2. concat -> conv at full res: barrier vs split-conv-sum vs baseline.
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 6
B = 32
DN = ("NHWC", "HWIO", "NHWC")


def timed(fn, *args, reps=3):
    float(fn(*args))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


@jax.jit
def roundtrip(x):
    return (x[0, 0, 0, 0] + 0.0).astype(jnp.float32)


def loop(f):
    @jax.jit
    def run(*args):
        acc = jnp.float32(0)
        for i in range(K):
            scaled = tuple(a * jnp.asarray(1 + 1e-3 * i, a.dtype) for a in args)
            y = f(*scaled)
            acc = acc + jnp.sum(y[..., :1, :1, :1]).astype(jnp.float32)
        return acc
    return run


def report(name, f, args, overhead):
    t = timed(loop(f), *args)
    print(f"{name:52s} {(t-overhead)/K*1e3:8.2f} ms", flush=True)


def main():
    # ---- case 1: node blend -> 7x7 conv (stage-0 shape) ----
    ins = [jnp.ones((B, 128, 256, 32), jnp.bfloat16) for _ in range(4)]
    w7 = jnp.ones((7, 7, 32, 32), jnp.bfloat16)
    gates = jnp.asarray([0.7, 0.7, 0.7], jnp.bfloat16)

    def blend(a, b, c, d):
        out = gates[0] * a + gates[0] * b + gates[1] * c + gates[2] * d
        return jax.nn.elu(out)

    def blend_conv(a, b, c, d):
        return lax.conv_general_dilated(blend(a, b, c, d), w7, (1, 1),
                                        [(3, 3), (3, 3)], dimension_numbers=DN)

    def blend_barrier_conv(a, b, c, d):
        x = lax.optimization_barrier(blend(a, b, c, d))
        return lax.conv_general_dilated(x, w7, (1, 1), [(3, 3), (3, 3)],
                                        dimension_numbers=DN)

    overhead = timed(roundtrip, ins[0])
    print(f"overhead {overhead*1e3:.1f}ms", flush=True)
    report("blend+elu -> conv7 (fused)", blend_conv, ins, overhead)
    report("blend+elu -> barrier -> conv7", blend_barrier_conv, ins, overhead)

    # ---- case 2: concat -> conv3 at full res (iconv shape) ----
    a = jnp.ones((B, 256, 512, 8), jnp.bfloat16)
    b = jnp.ones((B, 256, 512, 32), jnp.bfloat16)
    c = jnp.ones((B, 256, 512, 4), jnp.bfloat16)
    w3 = jnp.ones((3, 3, 44, 32), jnp.bfloat16)

    def cat_conv(a, b, c):
        x = jnp.concatenate([a, b, c], axis=-1)
        return lax.conv_general_dilated(x, w3, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=DN)

    def cat_barrier_conv(a, b, c):
        x = lax.optimization_barrier(jnp.concatenate([a, b, c], axis=-1))
        return lax.conv_general_dilated(x, w3, (1, 1), [(1, 1), (1, 1)],
                                        dimension_numbers=DN)

    def split_conv_sum(a, b, c):
        wa, wb, wc = w3[:, :, :8], w3[:, :, 8:40], w3[:, :, 40:]
        conv = lambda x, w: lax.conv_general_dilated(
            x, w, (1, 1), [(1, 1), (1, 1)], dimension_numbers=DN)
        return conv(a, wa) + conv(b, wb) + conv(c, wc)

    report("concat -> conv3 44ch (fused)", cat_conv, (a, b, c), overhead)
    report("concat -> barrier -> conv3", cat_barrier_conv, (a, b, c), overhead)
    report("split conv sum (no concat)", split_conv_sum, (a, b, c), overhead)


if __name__ == "__main__":
    main()
