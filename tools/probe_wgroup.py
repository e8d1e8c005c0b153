#!/usr/bin/env python3
"""Probe: W-only space-to-depth ("column grouping") for the encoder convs.

Idea: XLA stores this program's conv activations batch-minor ({0,3,2,1} =
physical (H, W, C, B)), so the logical reshape (B, H, W, C) ->
(B, H, W/r, r*C) is a BITCAST (the (W, C) flatten order is exactly the
physical order).  A stride-1 SAME conv becomes a conv with window
(kh, 2P+1) on the grouped tensor with a block-Toeplitz kernel transform --
channel dims grow r-fold (32 -> 128: full lane tiles) at MAC cost k'*r/k
(7x7, r=4: 1.71x; 5x5, r=2: 1.2x).  Unlike the 2x2 s2d path there are NO
boundary conversions and the attention is untouched.

Measures a chained 4-interior-node gated-DAG stage (the serving enc0/enc1
structure) native vs W-grouped, on the real chip.
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

from uncertainty_model_tpu.models.layers import _maybe_barrier

_DN = ("NHWC", "HWIO", "NHWC")


def wgroup_conv_kernel(w: np.ndarray, r: int) -> np.ndarray:
    """(kh, kw, Ci, Co) SAME stride-1 kernel -> its W-grouped equivalent
    (kh, 2P+1, r*Ci, r*Co), P = ceil(p/r), channel index (d, ci) d-major
    (matching the (W, C) flatten order).  Zero taps where the native column
    index falls outside [0, kw)."""
    kh, kw, cin, cout = w.shape
    p = (kw - 1) // 2
    P = (p + r - 1) // r
    kp = 2 * P + 1
    out = np.zeros((kh, kp, r * cin, r * cout), w.dtype)
    for S in range(kp):
        for d in range(r):
            for a in range(r):
                v = p - a + d + r * (S - P)
                if 0 <= v < kw:
                    out[:, S, d * cin:(d + 1) * cin,
                        a * cout:(a + 1) * cout] = w[:, v]
    return out


def group_w(x, r):
    b, h, w, c = x.shape
    return x.reshape(b, h, w // r, r * c)


def ungroup_w(x, r):
    b, h, wg, rc = x.shape
    return x.reshape(b, h, wg * r, rc // r)


def conv_native(x, k, bias):
    kh, kw = k.shape[0], k.shape[1]
    y = lax.conv_general_dilated(
        _maybe_barrier(x), k, (1, 1),
        [((kh - 1) // 2,) * 2, ((kw - 1) // 2,) * 2], dimension_numbers=_DN)
    return y + bias


def conv_wgroup(xg, kg, biasg, ph, Pw):
    y = lax.conv_general_dilated(
        _maybe_barrier(xg), kg, (1, 1), [(ph, ph), (Pw, Pw)],
        dimension_numbers=_DN)
    return y + biasg


def make_stage(params, mode, r):
    """4-interior-node K5 gated DAG (the enc stage structure, serving.py
    _encoder_stage_apply): node i consumes gated sum of all previous."""

    def stage(x):
        if mode == "wgroup":
            x = group_w(x, r)
        results = [x]
        for i, prm in enumerate(params):
            gates = prm["gates"]
            h = gates[0] * results[0]
            for gi in range(1, len(results)):
                h = h + gates[gi] * results[gi]
            if mode == "wgroup":
                y = conv_wgroup(h, prm["kg"], prm["bg"], prm["ph"], prm["Pw"])
            else:
                y = conv_native(h, prm["k"], prm["b"])
            results.append(jax.nn.elu(y))
        out = results[-1]
        if mode == "wgroup":
            out = ungroup_w(out, r)
        return out

    return stage


def build_params(rng, kh, kw, c, r, dt):
    params = []
    for i in range(4):
        k = rng.normal(size=(kh, kw, c, c)).astype(np.float32) * 0.05
        b = rng.normal(size=(c,)).astype(np.float32) * 0.01
        kg = wgroup_conv_kernel(k, r)
        p = (kw - 1) // 2
        P = (p + r - 1) // r
        params.append({
            "k": jnp.asarray(k, dt), "b": jnp.asarray(b, dt),
            "kg": jnp.asarray(kg, dt), "bg": jnp.asarray(np.tile(b, r), dt),
            "ph": (kh - 1) // 2, "Pw": P,
            "gates": jnp.asarray(rng.uniform(0.3, 0.9, size=(i + 1,)), dt),
        })
    return params


def slope_time(stage, x, k1=2, k2=8, reps=3):
    def make(kk):
        @jax.jit
        def run(x):
            def body(_, x):
                out = stage(x)
                return x * (1.0 + 1e-6 * out)
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
    return compile_s, min(samples), make(k2)


def main():
    rng = np.random.default_rng(0)
    B = 128
    dt = jnp.bfloat16

    # correctness first (tiny shapes, f32, any backend)
    for (kh, kw, c, r) in ((7, 7, 4, 4), (5, 5, 4, 2), (3, 3, 4, 4)):
        k = rng.normal(size=(kh, kw, c, c)).astype(np.float32)
        b = rng.normal(size=(c,)).astype(np.float32)
        x = jnp.asarray(rng.normal(size=(2, 16, 24, c)), jnp.float32)
        ref = conv_native(x, jnp.asarray(k), jnp.asarray(b))
        kg = jnp.asarray(wgroup_conv_kernel(k, r))
        P = ((kw - 1) // 2 + r - 1) // r
        got = ungroup_w(conv_wgroup(group_w(x, r), kg, jnp.asarray(np.tile(b, r)),
                                    (kh - 1) // 2, P), r)
        err = float(jnp.max(jnp.abs(ref - got)))
        print(f"exactness k={kh} r={r}: max abs err {err:.2e}", flush=True)
        assert err < 1e-4

    cases = [
        ("enc0 7x7 C32 128x256", 7, 32, (128, 256), 4),
        ("enc0 7x7 C32 128x256", 7, 32, (128, 256), 2),
        ("enc1 5x5 C64  64x128", 5, 64, (64, 128), 2),
    ]
    for name, k, c, (h, w), r in cases:
        params = build_params(rng, k, k, c, r, dt)
        x = jnp.asarray(rng.normal(size=(B, h, w, c)), dt)
        for mode in ("native", "wgroup"):
            if mode == "native" and r != 4 and "enc0" in name:
                continue  # native baseline once per case family
            stage = make_stage(params, mode, r)
            try:
                cs, t, runner = slope_time(stage, x)
                print(f"{name} r={r} {mode:7s}: compile {cs:6.1f}s  "
                      f"{t*1e3:7.2f} ms/pass", flush=True)
                if mode == "wgroup" and os.environ.get("UMT_DUMP_HLO"):
                    txt = jax.jit(runner.__wrapped__).lower(x).compile().as_text()
                    fn = f"/tmp/wgroup_{name.split()[0]}_r{r}.hlo"
                    with open(fn, "w") as f:
                        f.write(txt)
                    nt = txt.count(" transpose(")
                    ncp = txt.count(" copy(")
                    print(f"   HLO: {nt} transposes, {ncp} copies -> {fn}",
                          flush=True)
            except Exception as e:
                print(f"{name} r={r} {mode}: FAILED {type(e).__name__}: "
                      f"{str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
