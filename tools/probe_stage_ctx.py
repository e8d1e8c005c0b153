#!/usr/bin/env python3
"""Probe: where does one encoder stage's time go, and is there a context
penalty when the gated conv DAG and the attention live in one program?

Evidence motivating this: the in-graph trace charges enc1 ~12.6 ms (convs
8.7 + gating 3.4) while a standalone 4-conv gated chain measures ~4 ms —
either the in-graph stage pays a layout/fusion context penalty or the
standalone probe wasn't representative.  This probe runs the REAL serving
stage code (serving._encoder_stage_apply) standalone at enc0/enc1 shapes:
  full      input conv + gated DAG + attention (the in-graph structure)
  noattn    input conv + gated DAG only
  attnonly  attention only (on a precomputed stage output)

Usage: probe_stage_ctx.py [enc0|enc1 ...] [full|noattn|attnonly ...]
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

jax.config.update("jax_default_matmul_precision", "bfloat16")

from uncertainty_model_tpu.models.graph import graph_spec_from_adjacency
from uncertainty_model_tpu import serving

B = 128
# case: (h_in, w_in, cin, cout, k)  — stage input resolution
CASES = {
    "enc0": (256, 512, 3, 32, 7),
    "enc1": (128, 256, 32, 64, 5),
}

K5 = graph_spec_from_adjacency(
    [[1, 2, 3, 4], [0, 2, 3, 4], [0, 1, 3, 4], [0, 1, 2, 4], [0, 1, 2, 3]])


def build(rng, cin, cout, k, dt):
    nodes = {}
    for node in K5.nodes:
        ci = cin if node.node_type == "input" else cout
        entry = {
            "kernel": jnp.asarray(
                rng.normal(size=(k, k, ci, cout)) * 0.05, dt),
            "bias": jnp.asarray(rng.normal(size=(cout,)) * 0.01, dt),
        }
        if len(node.inputs) > 1:
            entry["gates"] = jnp.asarray(
                rng.uniform(0.3, 0.9, size=(len(node.inputs),)), dt)
        nodes[str(node.id)] = entry
    attn = {
        name: {"kernel": jnp.asarray(
                   rng.normal(size=(1, 1, cout, cout)) * 0.1, dt),
               "bias": jnp.asarray(rng.normal(size=(cout,)) * 0.01, dt)}
        for name in ("keys", "queries", "values", "reprojection")
    }
    return {"nodes": nodes, "attention": attn}


def slope_time(stage, x, k1=2, k2=8, reps=3):
    import jax.lax as lax

    def make(kk):
        @jax.jit
        def run(x):
            def body(_, x):
                out = stage(x)
                # out is half-res: fold it back into x cheaply but
                # data-dependently
                return x * (1.0 + 1e-6 * jnp.mean(out).astype(x.dtype))
            x = lax.fori_loop(0, kk, body, x)
            return jnp.mean(x.astype(jnp.float32))
        return run

    r1, r2 = make(k1), make(k2)
    t0 = time.perf_counter()
    float(r1(x)); float(r2(x))
    compile_s = time.perf_counter() - t0
    samples = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(r1(x))
        t1 = time.perf_counter()
        float(r2(x))
        t2 = time.perf_counter()
        samples.append(((t2 - t1) - (t1 - t0)) / (k2 - k1))
    return compile_s, min(samples)


def main():
    args = sys.argv[1:]
    cases = [a for a in args if a in CASES] or ["enc1", "enc0"]
    variants = [a for a in args if a in ("full", "noattn", "attnonly")] or \
        ["full", "noattn", "attnonly"]
    rng = np.random.default_rng(0)
    dt = jnp.bfloat16

    for case in cases:
        h, w, cin, cout, k = CASES[case]
        prm = build(rng, cin, cout, k, dt)
        spec = serving._StageSpec(graph=K5, heads=8, s2d=False)

        for v in variants:
            if v == "full":
                stage = functools.partial(
                    serving._encoder_stage_apply, prm, spec)
                x = jnp.asarray(rng.normal(size=(B, h, w, cin)), dt)
            elif v == "noattn":
                def stage(x, prm=prm, spec=spec):
                    saved = serving._attention_apply
                    try:
                        serving._attention_apply = lambda p, h, t: t
                        return serving._encoder_stage_apply(prm, spec, x)
                    finally:
                        serving._attention_apply = saved
                x = jnp.asarray(rng.normal(size=(B, h, w, cin)), dt)
            else:
                stage = functools.partial(
                    serving._attention_apply, prm["attention"], 8)
                x = jnp.asarray(
                    rng.normal(size=(B, h // 2, w // 2, cout)), dt)
            try:
                c, t = slope_time(stage, x)
                print(f"{case} {v:8s}: compile {c:6.1f}s  "
                      f"{t*1e3:7.2f} ms/pass", flush=True)
            except Exception as e:
                print(f"{case} {v:8s}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
