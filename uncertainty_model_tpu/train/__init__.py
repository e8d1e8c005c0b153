from .trainer import Trainer, TrainState  # noqa: F401
from .evaluate import evaluate_model, save_comparisons  # noqa: F401
from .checkpoint import (  # noqa: F401
    load_checkpoint,
    load_torch_checkpoint,
    save_checkpoint,
)
from .metrics import gaussian_ssim  # noqa: F401
from . import sparsification  # noqa: F401
