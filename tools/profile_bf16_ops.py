#!/usr/bin/env python3
"""bf16-path microbenchmarks: gather-lerp resize vs einsum resize,
pixel-shuffle vs sub-pixel transposed conv, per-stage decoder costs."""

from __future__ import annotations

import functools
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from uncertainty_model_tpu.ops import pixel_shuffle, resize_bilinear  # noqa: E402
from uncertainty_model_tpu.ops.resize import _lerp_coeffs  # noqa: E402

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

K = 8
B = 32


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
    def run(x):
        acc = jnp.float32(0)
        for i in range(K):
            y = f(x * jnp.asarray(1 + 1e-3 * i, x.dtype))
            acc = acc + jnp.sum(y[..., :1, :1, :1]).astype(jnp.float32)
        return acc
    return run


def report(name, f, x, overhead):
    t = timed(loop(f), x)
    print(f"{name:48s} {(t-overhead)/K*1e3:8.2f} ms", flush=True)


@functools.lru_cache(maxsize=None)
def _interp_matrix(out_size, in_size):
    lo, hi, frac = _lerp_coeffs(out_size, in_size)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), lo] += 1 - frac
    m[np.arange(out_size), hi] += frac
    return m


def resize_einsum(x, size):
    h, w = size
    mh = jnp.asarray(_interp_matrix(h, x.shape[1]), x.dtype)
    mw = jnp.asarray(_interp_matrix(w, x.shape[2]), x.dtype)
    x = jnp.einsum("oh,bhwc->bowc", mh, x)
    return jnp.einsum("ow,bhwc->bhoc", mw, x)


def subpixel_weights(w):
    """HWIO (3,3,C,4Co) kernel -> transposed-conv kernel for shuffle fusion."""
    return w  # placeholder (timing uses a raw dilated conv of same cost)


def main():
    x = jnp.ones((B, 64, 128, 64), jnp.bfloat16)
    overhead = timed(roundtrip, x)
    print(f"overhead {overhead*1e3:.1f}ms", flush=True)

    report("resize gather 64x128x64 -> x2 (bf16)",
           lambda x: resize_bilinear(x, (128, 256)), x, overhead)
    report("resize einsum 64x128x64 -> x2 (bf16)",
           lambda x: resize_einsum(x, (128, 256)), x, overhead)

    x512 = jnp.ones((B, 16, 32, 512), jnp.bfloat16)
    report("resize gather 16x32x512 -> x2 (bf16)",
           lambda x: resize_bilinear(x, (32, 64)), x512, overhead)
    report("resize einsum 16x32x512 -> x2 (bf16)",
           lambda x: resize_einsum(x, (32, 64)), x512, overhead)

    xs = jnp.ones((B, 128, 256, 32), jnp.bfloat16)
    report("pixel_shuffle 128x256x32 (bf16)",
           lambda x: pixel_shuffle(x, 2), xs, overhead)

    # elementwise BN+ELU at full res (bf16)
    xf = jnp.ones((B, 256, 512, 32), jnp.bfloat16)
    g = jnp.ones((32,), jnp.bfloat16)

    def bn_elu(x):
        return jax.nn.elu((x - 0.1) * g * 1.1 + 0.05)

    report("BN+ELU elementwise 256x512x32 (bf16)", bn_elu, xf, overhead)

    # attention softmax at stage-1 size
    xa = jnp.ones((B, 32768, 8, 4), jnp.bfloat16)
    report("softmax over 32k tokens (bf16)",
           lambda x: jax.nn.softmax(x, axis=1), xa, overhead)
    report("softmax over channels (bf16)",
           lambda x: jax.nn.softmax(x, axis=-1), xa, overhead)

    # 1x1 conv (se_conv) at stage4: 67 -> 32 at 256x512
    from jax import lax
    xc = jnp.ones((B, 256, 512, 67), jnp.bfloat16)
    wc = jnp.ones((1, 1, 67, 32), jnp.bfloat16)
    report("conv1 67->32 256x512 (bf16)",
           lambda x: lax.conv_general_dilated(
               x, wc, (1, 1), "VALID",
               dimension_numbers=("NHWC", "HWIO", "NHWC")), xc, overhead)

    # 7x7 encoder conv at stage1 (bf16): 32->32 at 128x256
    xe = jnp.ones((B, 128, 256, 32), jnp.bfloat16)
    we = jnp.ones((7, 7, 32, 32), jnp.bfloat16)
    report("conv7 32->32 128x256 (bf16)",
           lambda x: lax.conv_general_dilated(
               x, we, (1, 1), [(3, 3), (3, 3)],
               dimension_numbers=("NHWC", "HWIO", "NHWC")), xe, overhead)

    # correctness: einsum vs gather resize
    xr = jax.random.uniform(jax.random.PRNGKey(0), (2, 16, 24, 8))
    a = resize_bilinear(xr, (32, 48))
    b = resize_einsum(xr, (32, 48))
    print("einsum-vs-gather max err (f32):", float(jnp.abs(a - b).max()), flush=True)


if __name__ == "__main__":
    main()
