#!/usr/bin/env python3
"""Microbenchmark the encoder gated input sum at enc0/enc1 production
shapes (the XLA mul-add chain serving emits — one fusion reading k maps),
and the grouped-softmax reduce_window vs strided-slice formulations
(budget findings 5/6).

History: a Pallas one-pass gated-sum kernel existed and was measured here
(round 5, batch 128 bf16): enc0-k4 xla 2.731 ms vs pallas 3.017; enc1-k3
xla 1.197 vs pallas 1.084 (within noise).  No win — deleted; the XLA
fusion is already a single bandwidth-bound pass.

Chained-K methodology (perturb input with previous output so XLA cannot
CSE the passes); reports ms/pass = slope between K and 2K loops.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

jax.config.update("jax_default_matmul_precision", "bfloat16")



def timed(make, k1=None, k2=None, reps=5):
    """min-of-reps per loop length before the slope — a single scheduling
    hiccup on either endpoint otherwise skews the go/no-go numbers
    (advisor round-4 finding).  K1/K2 env-overridable: the remote-compile
    tunnel drops the very large k=16 fori_loop programs."""
    if k1 is None:
        k1 = int(os.environ.get("K1", "2"))
    if k2 is None:
        k2 = int(os.environ.get("K2", "6"))
    f1, f2 = jax.jit(make(k1)), jax.jit(make(k2))
    a = jnp.zeros((), jnp.bfloat16)
    for f in (f1, f2):
        # float() scalar fetch: on the tunneled chip block_until_ready is
        # NOT a completion barrier (it returned ~0 ms slopes)
        float(f(a, *timed.operands))
    ts = []
    for f in (f1, f2):
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            float(f(a, *timed.operands))
            best = min(best, time.perf_counter() - t0)
        ts.append(best)
    return (ts[1] - ts[0]) / (k2 - k1) * 1e3


# big operands are passed as jit ARGUMENTS, never closed over: a closed-over
# device array becomes a literal constant in the serialized HLO, and the
# ~270 MB maps here blow the remote-compile tunnel's payload (broken pipe)
timed.operands = ()


def main():
    b = int(os.environ.get("B", "128"))
    fams = os.environ.get("FAMILIES", "gsum,smax").split(",")
    key = jax.random.PRNGKey(0)
    gsum_shapes = (
        ("enc0-k4", (128, 256, 32, 4)),
        ("enc1-k3", (64, 128, 64, 3)),
    ) if "gsum" in fams else ()
    for name, (h, w, c, k) in gsum_shapes:
        xs = [jax.random.normal(jax.random.fold_in(key, i), (b, h, w, c),
                                jnp.bfloat16) for i in range(k)]
        g = jnp.linspace(0.3, 0.9, k, dtype=jnp.float32)

        def make_xla(kk):
            def run(eps, g, *xs):
                def body(i, y0):
                    acc = xs[0] * g[0].astype(y0.dtype) + y0 * eps
                    for j in range(1, k):
                        acc = acc + xs[j] * g[j].astype(y0.dtype)
                    return acc
                out = lax.fori_loop(0, kk, body, xs[0])
                return out[0, 0, 0, 0]
            return run

        timed.operands = (g,) + tuple(xs)
        print(f"{name}: xla {timed(make_xla):7.3f} ms", flush=True)

    # grouped softmax formulations at enc0/enc1 shapes (group = c/heads)
    import functools as ft
    smax_shapes = (
        ("smax-enc0", (128, 256, 32, 8)),
        ("smax-enc1", (64, 128, 64, 8)),
    ) if "smax" in fams else ()
    for name, (h, w, c, heads) in smax_shapes:
        v0 = jax.random.normal(key, (b, h, w, c), jnp.bfloat16)
        group = c // heads

        def rw(v):
            neg_inf = jnp.asarray(-jnp.inf, v.dtype)
            m = lax.reduce_window(v, neg_inf, lax.max,
                                  (1, 1, 1, group), (1, 1, 1, group), "VALID")
            e = jnp.exp(v - jnp.repeat(m, group, axis=-1))
            s = lax.reduce_window(e, jnp.asarray(0.0, v.dtype), lax.add,
                                  (1, 1, 1, group), (1, 1, 1, group), "VALID")
            return e, 1.0 / s.astype(jnp.float32)

        def sl(v):
            m = ft.reduce(jnp.maximum, [v[..., g0::group]
                                        for g0 in range(group)])
            e = jnp.exp(v - jnp.repeat(m, group, axis=-1))
            s = ft.reduce(jnp.add, [e[..., g0::group] for g0 in range(group)])
            return e, 1.0 / s.astype(jnp.float32)

        def mk(fn):
            def make(kk):
                def run(eps, v0):
                    def body(i, y0):
                        e, inv = fn(v0 + y0 * eps)
                        return e * jnp.repeat(inv.astype(e.dtype), group,
                                              axis=-1)
                    out = lax.fori_loop(0, kk, body, v0)
                    return out[0, 0, 0, 0]
                return run
            return make

        timed.operands = (v0,)
        print(f"{name}: reduce_window {timed(mk(rw)):7.3f} ms   "
              f"strided-slice {timed(mk(sl)):7.3f} ms", flush=True)


if __name__ == "__main__":
    main()
