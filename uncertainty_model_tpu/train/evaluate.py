"""Evaluation loop (reference train/evaluate.py).

Per batch: full-res forward, stereo reconstruction by warp, gaussian SSIM
(k=11, sum-reduced), WSSIM(alpha=1) image error upsampled to full size,
sparsification curves -> AUSE/AURG.  Everything numeric runs in one jitted
step on device; only the running averages and the first-batch comparison
PNGs live on the host.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..losses import wssim_image_error
from ..ops import (
    reconstruct_left_image,
    reconstruct_right_image,
    resize_bilinear,
)
from ..parallel.mesh import shard_batch
from ..utils.viz import get_comparison, save_image
from . import sparsification as spars
from .metrics import gaussian_ssim


@functools.partial(jax.jit, static_argnums=(0,))
def _eval_step(model, variables, batch, scale, key):
    left, right = batch["left"], batch["right"]
    images = jnp.concatenate([left, right], axis=-1)

    prediction = model.apply(variables, left, disp_scale=scale)[0]
    prediction = prediction.astype(jnp.float32)  # metrics in f32
    disparity = prediction[..., :2]
    uncertainty = prediction[..., 2:]

    left_recon = reconstruct_left_image(disparity[..., 0:1], right)
    right_recon = reconstruct_right_image(disparity[..., 1:2], left)

    left_ssim = jnp.sum(gaussian_ssim(left_recon, left))
    right_ssim = jnp.sum(gaussian_ssim(right_recon, right))

    recon = jnp.concatenate([left_recon, right_recon], axis=-1)
    h, w = recon.shape[1], recon.shape[2]
    error = wssim_image_error(images, recon, alpha=1.0)
    error = resize_bilinear(error, (h, w))

    oracle = spars.curve(error, error)
    predicted = spars.curve(error, uncertainty)
    random = spars.random_curve(error, key)

    metrics = {
        "left_ssim": left_ssim,
        "right_ssim": right_ssim,
        "ause": spars.ause(oracle, predicted),
        "aurg": spars.aurg(predicted, random),
    }
    viz = {
        "images": images,
        "disparity": disparity,
        "uncertainty": uncertainty,
        "recon": recon,
        "error": error,
    }
    return metrics, viz


def save_comparisons(
    viz: dict,
    directory: str,
    epoch_number: Optional[int] = None,
    is_final: bool = True,
) -> None:
    """Three comparison grids for the first sample (reference
    train/evaluate.py:25-63)."""
    image = np.asarray(viz["images"][0])
    disparity = np.asarray(viz["disparity"][0])
    uncertainty = np.asarray(viz["uncertainty"][0])
    recon = np.asarray(viz["recon"][0])
    error = np.asarray(viz["error"][0])

    prediction_image = get_comparison(image, disparity, uncertainty, add_scaled=False)
    disparity_image = get_comparison(image, disparity, recon, add_scaled=True)
    uncertainty_image = get_comparison(image, uncertainty, error, add_scaled=True)

    dirname = "final" if is_final else f"epoch_{epoch_number:03}"
    epoch_directory = os.path.join(directory, dirname)
    os.makedirs(epoch_directory, exist_ok=True)

    print(f"Saving comparisons to:\n\t{epoch_directory}")
    save_image(prediction_image, os.path.join(epoch_directory, "prediction.png"))
    save_image(disparity_image, os.path.join(epoch_directory, "disparity.png"))
    save_image(uncertainty_image, os.path.join(epoch_directory, "uncertainty.png"))


def evaluate_model(
    model,
    state,
    loader,
    save_evaluation_to: Optional[str] = None,
    epoch_number: Optional[int] = None,
    scale: float = 1.0,
    is_final: bool = True,
    mesh=None,
    seed: int = 0,
    no_pbar: bool = False,
    process_index: int = 0,
):
    """Returns ((left_ssim, right_ssim), (ause, aurg)) per-image/batch
    averages (reference train/evaluate.py:66-196)."""
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    running = {"left_ssim": 0.0, "right_ssim": 0.0, "ause": 0.0, "aurg": 0.0}
    averages = dict(running)
    key = jax.random.PRNGKey(seed)

    iterator = loader
    tepoch = None
    if process_index == 0 and not no_pbar:
        import tqdm

        tepoch = tqdm.tqdm(loader, "Evaluation", unit="batch")
        iterator = tepoch

    for i, batch in enumerate(iterator):
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        # GLOBAL image count: under multi-host DP, shard_batch assembles the
        # global array (per-host shard x process_count) and _eval_step sums
        # SSIM over that global batch, so the divisor must be global too.
        # (The reference instead averages rank-0's local shard only,
        # train/evaluate.py:162-178; dividing the global sum by the global
        # count is the strictly-better estimator — it uses every image — and
        # is identical for single-host runs.)
        batch_size = batch["left"].shape[0]
        key, subkey = jax.random.split(key)
        metrics, viz = _eval_step(model, variables, batch, jnp.float32(scale), subkey)

        if i == 0 and jax.process_count() > 1:
            # the viz tensors are globally sharded across hosts; gather them
            # to every process so rank 0 can save the comparison grids.
            # This is a collective and must run on ALL ranks with an
            # identical condition — save_evaluation_to is rank-0-only (the
            # run directory exists only there), so it must NOT gate this.
            from jax.experimental import multihost_utils

            viz = multihost_utils.process_allgather(viz, tiled=True)

        if process_index > 0:
            # Rank-0-only metric accumulation matches the reference
            # (train/evaluate.py:121,162): under multi-host DP each process
            # still computes the jitted step (its devices hold batch shards
            # GSPMD needs), but only process 0 aggregates and reports.
            continue

        metrics = jax.device_get(metrics)
        running["left_ssim"] += float(metrics["left_ssim"])
        running["right_ssim"] += float(metrics["right_ssim"])
        running["ause"] += float(metrics["ause"])
        running["aurg"] += float(metrics["aurg"])

        averages = {
            "left_ssim": running["left_ssim"] / ((i + 1) * batch_size),
            "right_ssim": running["right_ssim"] / ((i + 1) * batch_size),
            "ause": running["ause"] / (i + 1),
            "aurg": running["aurg"] / (i + 1),
        }

        if tepoch is not None:
            tepoch.set_postfix(
                ssim=(averages["left_ssim"] + averages["right_ssim"]) / 2,
                ause=averages["ause"], aurg=averages["aurg"],
            )

        if save_evaluation_to is not None and i == 0:
            save_comparisons(
                jax.device_get(viz), save_evaluation_to, epoch_number, is_final
            )

    if process_index == 0 and not no_pbar:
        print(
            "Evaluation:"
            f"\n\tleft ssim: {averages['left_ssim']:.2f}"
            f"\n\tright ssim: {averages['right_ssim']:.2f}"
            f"\n\tause: {averages['ause']:.2f}"
            f"\n\taurg: {averages['aurg']:.2f}"
            f"\n\tdisparity scale: {scale:.2f}"
        )

    return (
        (averages["left_ssim"], averages["right_ssim"]),
        (averages["ause"], averages["aurg"]),
    )
