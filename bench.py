#!/usr/bin/env python3
"""Inference throughput benchmark (the BASELINE.json north star:
>= 2,000 frames/sec/chip at 256x512 on a TPU v5e).

Prints ONE JSON line:
    {"metric": "inference_fps_per_chip", "value": N, "unit": "frames/sec",
     "vs_baseline": N / 2000.0}

Measures the flagship 22.5M-param model's jitted forward (full-resolution
4-channel disparity+uncertainty output) on one chip, best-of batch sizes,
bfloat16 matmuls with float32 params/IO.
"""

from __future__ import annotations

import json
import time


def bench() -> dict:
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _load_config
    from uncertainty_model_tpu.models import RandomlyConnectedModel

    jax.config.update("jax_default_matmul_precision", "bfloat16")

    config = _load_config()
    model = RandomlyConnectedModel.from_config(**config["model"])
    variables = model.init(
        jax.random.PRNGKey(0), jnp.zeros((1, 256, 512, 3)), disp_scale=1.0
    )

    @jax.jit
    def forward(variables, image):
        return model.apply(variables, image, disp_scale=1.0)[0]

    best_fps = 0.0
    for batch in (8, 16, 32):
        x = jnp.zeros((batch, 256, 512, 3), jnp.float32)
        # compile + warmup
        jax.block_until_ready(forward(variables, x))
        jax.block_until_ready(forward(variables, x))

        n_iters = 10
        t0 = time.perf_counter()
        for _ in range(n_iters):
            out = forward(variables, x)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0

        fps = batch * n_iters / dt
        best_fps = max(best_fps, fps)

    return {
        "metric": "inference_fps_per_chip",
        "value": round(best_fps, 1),
        "unit": "frames/sec",
        "vs_baseline": round(best_fps / 2000.0, 3),
    }


if __name__ == "__main__":
    print(json.dumps(bench()))
