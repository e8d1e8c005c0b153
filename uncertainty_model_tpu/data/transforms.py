"""Stereo-pair transforms (reference train/transforms.py).

All transforms operate on ``{'left', 'right'}`` dicts.  Randomness is drawn
from an explicit ``numpy.random.Generator`` so the pipeline is seedable and
reproducible across workers — the functional replacement for the reference's
global ``numpy.random`` state.

Output arrays are HWC float32 in [0, 1] (NHWC once batched).
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class Compose:
    def __init__(self, transforms: list) -> None:
        self.transforms = transforms

    def __call__(self, pair: dict, rng: Optional[np.random.Generator] = None) -> dict:
        rng = rng if rng is not None else np.random.default_rng()
        for t in self.transforms:
            pair = t(pair, rng)
        return pair


class ResizeImage:
    """PIL bilinear resize to (H, W) — reference transforms.py:15-29 uses
    torchvision Resize, which is PIL bilinear on PIL inputs."""

    def __init__(self, size: tuple[int, int] = (256, 512)) -> None:
        self.size = size

    def __call__(self, pair: dict, rng=None) -> dict:
        from PIL import Image

        h, w = self.size
        return {
            "left": pair["left"].resize((w, h), Image.BILINEAR),
            "right": pair["right"].resize((w, h), Image.BILINEAR),
        }


class RandomFlip:
    """Same horizontal flip applied to both views, p=0.5
    (reference transforms.py:44-60)."""

    def __init__(self, p: float = 0.5) -> None:
        self.probability = p

    def __call__(self, pair: dict, rng: np.random.Generator) -> dict:
        from PIL import Image

        if rng.random() < self.probability:
            pair = {
                "left": pair["left"].transpose(Image.FLIP_LEFT_RIGHT),
                "right": pair["right"].transpose(Image.FLIP_LEFT_RIGHT),
            }
        return pair


class ToArray:
    """PIL -> HWC float32 in [0,1] (the reference's ToTensor, minus the
    CHW transpose — we are NHWC-native)."""

    def __call__(self, pair: dict, rng=None) -> dict:
        return {
            "left": np.asarray(pair["left"], np.float32) / 255.0,
            "right": np.asarray(pair["right"], np.float32) / 255.0,
        }


class RandomAugment:
    """Shared gamma/brightness/per-channel colour jitter + clamp
    (reference transforms.py:63-129)."""

    def __init__(self, p: float, gamma: tuple[float, float],
                 brightness: tuple[float, float], colour: tuple[float, float]) -> None:
        self.probability = p
        self.gamma = gamma
        self.brightness = brightness
        self.colour = colour

    def _apply(self, x: np.ndarray, g: float, b: float, c: np.ndarray) -> np.ndarray:
        x = x**g
        x = x * b
        x = x * c[None, None, :]
        return np.clip(x, 0.0, 1.0).astype(np.float32)

    def __call__(self, pair: dict, rng: np.random.Generator) -> dict:
        if rng.random() < self.probability:
            g = rng.uniform(*self.gamma)
            b = rng.uniform(*self.brightness)
            c = rng.uniform(*self.colour, 3).astype(np.float32)
            pair = {
                "left": self._apply(pair["left"], g, b, c),
                "right": self._apply(pair["right"], g, b, c),
            }
        return pair


def default_augment_transform(size=(256, 512)) -> Compose:
    """The reference's training transform stack (main.py:78-88)."""
    return Compose([
        ResizeImage(size),
        RandomFlip(0.5),
        ToArray(),
        RandomAugment(0.5, gamma=(0.8, 1.2), brightness=(0.5, 2.0), colour=(0.8, 1.2)),
    ])


def default_eval_transform(size=(256, 512)) -> Compose:
    return Compose([ResizeImage(size), ToArray()])
