#!/usr/bin/env python3
"""Training-path timings on the real chip: stereo warp forward/backward and
the full jitted train step (batch 8, f32 and mixed bf16)."""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

jax.config.update("jax_default_matmul_precision", "bfloat16")
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from uncertainty_model_tpu.ops import warp_by_disparity  # noqa: E402


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


def main():
    B = int(os.environ.get("B", "8"))
    rng = np.random.default_rng(0)
    disp = jnp.asarray(rng.uniform(0, 0.3, (B, 256, 512, 1)).astype(np.float32))
    src = jnp.asarray(rng.uniform(size=(B, 256, 512, 3)).astype(np.float32))

    overhead = timed(roundtrip, src)
    print(f"overhead {overhead*1e3:.1f}ms", flush=True)

    K = 6

    def loop_warp(dtype):
        d = disp.astype(dtype)
        s = src.astype(dtype)

        @jax.jit
        def run(d, s):
            acc = jnp.float32(0)
            for i in range(K):
                y = warp_by_disparity(d * jnp.asarray(1 + 1e-3 * i, d.dtype), s)
                acc = acc + jnp.sum(y[..., :1, :1, :1]).astype(jnp.float32)
            return acc

        t = timed(run, d, s)
        print(f"warp fwd {dtype.__name__:9s} {(t-overhead)/K*1e3:8.2f} ms", flush=True)

    loop_warp(jnp.float32)
    loop_warp(jnp.bfloat16)

    @jax.jit
    def warp_grad(d, s):
        def loss(d, s):
            return jnp.sum(warp_by_disparity(d, s) ** 2)
        gd, gs = jax.grad(loss, argnums=(0, 1))(d, s)
        return jnp.sum(gd).astype(jnp.float32) + jnp.sum(gs).astype(jnp.float32)

    t = timed(warp_grad, disp, src)
    print(f"warp fwd+bwd f32 (1x)     {(t-overhead)*1e3:8.2f} ms", flush=True)

    # ---- full train step, f32, batch 8 ----
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))))
    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel
    from uncertainty_model_tpu.train import Trainer

    cfg = _load_config()
    with open(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "configs", "uncertainty.yml")) as f:
        import yaml
        loss_cfg = yaml.load(f, Loader=yaml.Loader)["loss"]

    batch = {
        "left": jnp.asarray(rng.uniform(size=(B, 256, 512, 3)).astype(np.float32)),
        "right": jnp.asarray(rng.uniform(size=(B, 256, 512, 3)).astype(np.float32)),
    }
    from uncertainty_model_tpu.parallel import shard_batch

    # f32 (reference precision, train/train.py:112-129) and mixed bf16
    # (bf16 module compute, f32 master params/losses — the --precision
    # bfloat16 CLI path, cli/main.py:98-101)
    # PREC=bf16 skips the f32 leg (batch-32 f32 OOMs HBM: the full-res
    # f32 loss stack's temps exceed the 16 GB chip)
    precs = {"f32": ("f32", None), "bf16": ("bf16", jnp.bfloat16)}
    wanted = os.environ.get("PREC", "f32,bf16").split(",")
    for label, dtype in (precs[w] for w in wanted):
        model = RandomlyConnectedModel.from_config(**cfg["model"], dtype=dtype)
        trainer = Trainer(model, loss_cfg)
        state = trainer.init_state(jax.random.PRNGKey(0), (1, 256, 512, 3))
        sharded = shard_batch(batch, trainer.mesh)

        def step_once(state):
            new_state, metrics = trainer._train_step(
                state, sharded, jnp.float32(0.3), jnp.float32(1e-4), jnp.int32(1)
            )
            return new_state, metrics

        # warm/compile
        state, metrics = step_once(state)
        float(metrics["disp_loss"])
        print(f"train step ({label}) compiled", flush=True)
        ts = []
        for _ in range(6):
            t0 = time.perf_counter()
            state, metrics = step_once(state)
            float(metrics["disp_loss"])  # completion barrier (scalar fetch)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        print(f"train step {label} b{B}: {best*1e3:.1f} ms -> "
              f"{B/(best-overhead):.1f} img/s (overhead-corrected)", flush=True)


if __name__ == "__main__":
    main()
