"""Visualisation utilities (reference train/utils.py:177-330).

Host-side numpy/matplotlib code producing the same comparison grids as the
reference evaluator (prediction / disparity / uncertainty panels with
inferno heatmaps).  Images here are NHWC float arrays in [0, 1].
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def to_heatmap(x: np.ndarray, inverse: bool = False, colour_map: str = "inferno") -> np.ndarray:
    """Single-channel (H, W) or (H, W, 1) -> RGB (H, W, 3) heatmap."""
    import matplotlib.pyplot as plt

    image = np.asarray(x)
    if image.ndim == 3:
        image = image[..., 0]
    if inverse:
        image = 1 - image
    cmap = plt.get_cmap(colour_map)
    return cmap(image)[..., :3].astype(np.float32)


def combine_disparity(
    left: np.ndarray, right: np.ndarray, alpha: float = 20, beta: float = 0.05
) -> np.ndarray:
    """Blend both views' disparity to mask blind spots (Monodepth2-style
    batch_post_process_disparity; reference train/utils.py:202-245).

    Args:
        left / right: (H, W) or (C, H, W)-like arrays with H, W trailing.
    """
    left = np.asarray(left, np.float32)
    right = np.asarray(right, np.float32)
    mean_disp = (left + right) / 2

    height, width = mean_disp.shape[-2], mean_disp.shape[-1]
    x = np.linspace(0, 1, width)
    y = np.linspace(0, 1, height)
    xv, _ = np.meshgrid(x, y)

    left_mask = 1 - np.clip(alpha * (xv - beta), 0, 1)
    right_mask = np.fliplr(left_mask)
    mean_mask = 1 - (left_mask + right_mask)

    return right_mask * left + left_mask * right + mean_mask * mean_disp


def make_grid(images: list[np.ndarray], nrow: int = 2, padding: int = 2) -> np.ndarray:
    """Tile (H, W, 3) images into a grid (torchvision make_grid equivalent)."""
    n = len(images)
    h, w = images[0].shape[0], images[0].shape[1]
    ncol = (n + nrow - 1) // nrow
    grid = np.zeros(
        (ncol * (h + padding) + padding, nrow * (w + padding) + padding, 3), np.float32
    )
    for idx, img in enumerate(images):
        r, c = divmod(idx, nrow)
        y0 = r * (h + padding) + padding
        x0 = c * (w + padding) + padding
        grid[y0:y0 + h, x0:x0 + w] = img
    return grid


def get_comparison(
    image: np.ndarray,
    prediction: np.ndarray,
    extra: Optional[np.ndarray] = None,
    add_scaled: bool = False,
) -> np.ndarray:
    """Comparison grid of stereo image / prediction heatmaps / extra panels
    (reference train/utils.py:276-325).

    Args:
        image: (H, W, 6) stereo image.
        prediction: (H, W, 2) stereo single-channel prediction.
        extra: optional (H, W, 2) or (H, W, 6) extra panel pair.
    """
    panels = [image[..., 0:3], image[..., 3:6]]

    pred_min, pred_max = prediction.min(), prediction.max()
    scaled = (prediction - pred_min) / max(pred_max - pred_min, 1e-12)

    panels.append(to_heatmap(prediction[..., 0]))
    panels.append(to_heatmap(prediction[..., 1]))

    if add_scaled:
        panels.append(to_heatmap(scaled[..., 0]))
        panels.append(to_heatmap(scaled[..., 1]))

    if extra is not None:
        if extra.shape[-1] == 6:
            panels.append(extra[..., 0:3])
            panels.append(extra[..., 3:6])
        else:
            panels.append(to_heatmap(extra[..., 0]))
            panels.append(to_heatmap(extra[..., 1]))

    return make_grid(panels, nrow=2)


def save_image(image: np.ndarray, path: str) -> None:
    """Save an (H, W, 3) float [0,1] array as PNG."""
    from PIL import Image

    arr = (np.clip(image, 0, 1) * 255).astype(np.uint8)
    Image.fromarray(arr).save(path)
