#!/usr/bin/env python3
"""Micro-benchmark 2x align-corners upsample formulations on TPU.

The 2x upsample is on the serving critical path (decoder skip/disp
upsamples); the select-based formulation measured 26 ms per select fusion
at (128,128,256,32) — ~20x off roofline.  Candidates:

  A select  — jnp.where among {x_prev, x, x_next} per parity (round-2 v1)
  B lerp    — monotone-tap identity: even = lerp(x_prev, x, f),
              odd = lerp(x, x_next, g); no selects
  C matmul  — per-axis dense interp-matrix einsum (MXU)
  copy      — device copy of the OUTPUT-sized tensor (roofline reference)
"""

from __future__ import annotations

import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from uncertainty_model_tpu.ops.resize import _upsample2_axis, _interp_matrix


def upsample_select(x):
    x = _upsample2_axis(x, 1)
    return _upsample2_axis(x, 2)


def _lerp_axis(x, axis):
    n = x.shape[axis]
    i = np.arange(n)
    f = (1.0 - i / (2 * n - 1)).astype(np.float32)  # even parity weight on x
    g = ((n - 1 - i) / (2 * n - 1)).astype(np.float32)  # odd weight on x_next
    bshape = [1] * x.ndim
    bshape[axis] = n
    fj = jnp.asarray(f.reshape(bshape), x.dtype)
    gj = jnp.asarray(g.reshape(bshape), x.dtype)

    head = jax.lax.slice_in_dim(x, 0, 1, axis=axis)
    tail = jax.lax.slice_in_dim(x, n - 1, n, axis=axis)
    x_prev = jnp.concatenate([head, jax.lax.slice_in_dim(x, 0, n - 1, axis=axis)], axis=axis)
    x_next = jnp.concatenate([jax.lax.slice_in_dim(x, 1, n, axis=axis), tail], axis=axis)

    even = x_prev + fj * (x - x_prev)
    odd = x + gj * (x_next - x)
    stacked = jnp.stack([even, odd], axis=axis + 1)
    shape = list(x.shape)
    shape[axis] = 2 * n
    return stacked.reshape(shape)


def upsample_lerp(x):
    x = _lerp_axis(x, 1)
    return _lerp_axis(x, 2)


def _matmul_axis(x, axis):
    n = x.shape[axis]
    m = jnp.asarray(_interp_matrix(2 * n, n), x.dtype)  # (2n, n)
    x = jnp.moveaxis(x, axis, -1)
    y = jnp.einsum("...i,oi->...o", x, m)
    return jnp.moveaxis(y, -1, axis)


def upsample_matmul(x):
    x = _matmul_axis(x, 1)
    return _matmul_axis(x, 2)


def timeit(fn, x, k1=2, k2=8, reps=3):
    import time

    def make(k):
        @jax.jit
        def run(x):
            def body(_, x):
                out = fn(x)
                # downsample back + perturb: data dependence defeats CSE
                return x * (1.0 + 1e-6 * out[:, ::2, ::2, :].astype(x.dtype))
            x = jax.lax.fori_loop(0, k, body, x)
            return jnp.mean(x.astype(jnp.float32))
        return run

    r1, r2 = make(k1), make(k2)
    float(r1(x)); float(r2(x))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); float(r1(x))
        t1 = time.perf_counter(); float(r2(x))
        t2 = time.perf_counter()
        best = min(best, ((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return best * 1e3


def main():
    jax.config.update("jax_default_matmul_precision", "bfloat16")
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                         ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    shapes = [
        (128, 128, 256, 32),
        (128, 64, 128, 64),
        (128, 32, 64, 4),
        (128, 16, 32, 512),
    ]
    for shape in shapes:
        x = jax.random.uniform(jax.random.PRNGKey(0), shape, jnp.bfloat16)
        for name, fn in [("lerp", upsample_lerp), ("matmul", upsample_matmul),
                         ("select", upsample_select)]:
            # on-device error vs the select reference (scalar fetch only)
            err = float(jax.jit(
                lambda a: jnp.max(jnp.abs(fn(a).astype(jnp.float32)
                                          - upsample_select(a).astype(jnp.float32)))
            )(x))
            ms = timeit(fn, x)
            print(f"{shape}  {name:7s} {ms:8.2f} ms  maxerr={err:.2e}", flush=True)
        gb = np.prod(shape) * 2 * 4 / 1e9
        print(f"{shape}  out tensor {gb:.2f} GB", flush=True)


if __name__ == "__main__":
    main()
