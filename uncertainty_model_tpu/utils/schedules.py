"""Host-side training schedules (reference train/utils.py:143-174, 333-353).

Both are evaluated once per epoch on the host; the resulting floats are fed
into the jitted step as scalar operands (no recompilation).
"""

from __future__ import annotations

import numpy as np


def adjust_disparity(
    epoch: int,
    m: float = 0.02,
    c: float = 0.0,
    step: float = 0.2,
    offset: float = 0.1,
    min_scale: float = 0.3,
    max_scale: float = 1.0,
) -> float:
    """Disparity-scale curriculum: linear ramp quantised to a step grid.

    Python ``round`` (banker's rounding) on purpose — parity with reference
    train/utils.py:143-174.
    """
    scale = ((epoch + 1) * m) + c
    scale = (round((scale + offset) / step) * step) - offset
    return float(np.clip(scale, min_scale, max_scale))


def learning_rate_for_epoch(epoch: int, lr: float, finetune: bool = False) -> float:
    """lr, lr/2 after epoch 30, lr/4 after 40 (or always when finetuning) —
    reference train/utils.py:333-353."""
    if epoch > 40 or finetune:
        return lr / 4
    if epoch > 30:
        return lr / 2
    return lr
