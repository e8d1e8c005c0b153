#!/usr/bin/env python3
"""Conv lowering variants on the real chip: internal vs materialised padding,
tiny output channels, bf16, and a reflect-conv decomposition prototype."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
from jax import lax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from uncertainty_model_tpu.ops import pad2d  # noqa: E402

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
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
    def run(x, w):
        acc = jnp.float32(0)
        for i in range(K):
            y = f(x * (1.0 + 1e-6 * i), w)
            acc = acc + jnp.sum(y[..., :1, :1, :1]).astype(jnp.float32)
        return acc
    return run


def conv_internal(x, w):
    return lax.conv_general_dilated(x, w, (1, 1), [(1, 1), (1, 1)],
                                    dimension_numbers=DN)


def conv_reflect_materialised(x, w):
    return lax.conv_general_dilated(pad2d(x, (1, 1, 1, 1), "reflect"), w,
                                    (1, 1), "VALID", dimension_numbers=DN)


def conv_reflect_decomposed(x, w):
    """Internal zero-pad conv + exact border restitch with reflect semantics."""
    interior = lax.conv_general_dilated(x, w, (1, 1), "VALID",
                                        dimension_numbers=DN)  # (H-2, W-2)
    # top/bottom rows: conv over reflect-padded 3-row slices (pad W only)
    def row_out(rows):  # rows: (B, 3, W, C) -> (B, 1, W, C)
        rows = pad2d(rows, (1, 1, 0, 0), "reflect")
        return lax.conv_general_dilated(rows, w, (1, 1), "VALID",
                                        dimension_numbers=DN)

    top = row_out(jnp.concatenate([x[:, 1:2], x[:, 0:2]], axis=1))
    bottom = row_out(jnp.concatenate([x[:, -2:], x[:, -2:-1]], axis=1))

    # left/right columns over reflect-padded 3-col slices (pad H only)
    def col_out(cols):  # (B, H, 3, C) -> (B, H, 1, C)
        cols = pad2d(cols, (0, 0, 1, 1), "reflect")
        return lax.conv_general_dilated(cols, w, (1, 1), "VALID",
                                        dimension_numbers=DN)

    left = col_out(jnp.concatenate([x[:, :, 1:2], x[:, :, 0:2]], axis=2))
    right = col_out(jnp.concatenate([x[:, :, -2:], x[:, :, -2:-1]], axis=2))

    middle = jnp.concatenate([left[:, 1:-1], interior, right[:, 1:-1]], axis=2)
    return jnp.concatenate([top, middle, bottom], axis=1)


def report(name, f, x, w, overhead):
    t = timed(loop(f), x, w)
    print(f"{name:46s} {(t-overhead)/K*1e3:8.2f} ms", flush=True)


def main():
    x = jnp.ones((B, 256, 512, 44), jnp.float32)
    w = jnp.ones((3, 3, 44, 32), jnp.float32)
    overhead = timed(roundtrip, x)
    print(f"overhead {overhead*1e3:.1f}ms", flush=True)

    report("conv3 44->32 internal zero pad (f32)", conv_internal, x, w, overhead)
    report("conv3 44->32 reflect materialised (f32)",
           conv_reflect_materialised, x, w, overhead)
    report("conv3 44->32 reflect decomposed (f32)",
           conv_reflect_decomposed, x, w, overhead)

    x16 = x.astype(jnp.bfloat16); w16 = w.astype(jnp.bfloat16)
    report("conv3 44->32 internal (bf16)", conv_internal, x16, w16, overhead)
    report("conv3 44->32 reflect decomposed (bf16)",
           conv_reflect_decomposed, x16, w16, overhead)

    # tiny output channels (disp head)
    xd = jnp.ones((B, 256, 512, 32), jnp.float32)
    wd = jnp.ones((3, 3, 32, 4), jnp.float32)
    report("conv3 32->4 internal (f32)", conv_internal, xd, wd, overhead)
    report("conv3 32->4 internal (bf16)", conv_internal,
           xd.astype(jnp.bfloat16), wd.astype(jnp.bfloat16), overhead)
    wd8 = jnp.ones((3, 3, 32, 8), jnp.float32)
    report("conv3 32->8 internal (f32)", conv_internal, xd, wd8, overhead)

    # sanity: decomposition exact?
    xr = jax.random.uniform(jax.random.PRNGKey(0), (2, 32, 48, 8))
    wr = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 8, 16)) * 0.1
    a = conv_reflect_materialised(xr, wr)
    b = conv_reflect_decomposed(xr, wr)
    import numpy as np
    print("decomposition max err:", float(jnp.abs(a - b).max()), flush=True)


if __name__ == "__main__":
    main()
