"""Checkpointing (reference train/train.py:18-48, main.py:126-137).

Orbax-backed save/restore of the full train state: params + batch stats +
optimiser state + epoch number — strictly more than the reference, which
saves weights only (its finetune path restarts Adam moments and schedules
from scratch, main.py:126-137).  Restoring via the CLI's ``--resume-from``
(Trainer.load_state + train_model(start_epoch=checkpoint epoch)) therefore
continues training *identically* to an uninterrupted run — moments AND
schedules; ``--finetune-from`` keeps the reference's restart semantics.
Restoring a reference ``.pt`` reproduces its weights-only semantics.
Checkpoints are directories named ``epoch_{NNN:03}`` / ``final`` mirroring
the reference's ``.pt`` naming.

``load_torch_checkpoint`` restores reference ``.pt`` files through the
torch->flax converter, covering the reference's finetune path with DDP
``module.`` prefix stripping (train/utils.py:328-330).
"""

from __future__ import annotations

import os
from typing import Optional

import jax


def _checkpointer():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(directory: str, state, epoch_number: Optional[int] = None,
                    is_final: bool = False) -> str:
    name = "final" if is_final else f"epoch_{epoch_number:03}"
    path = os.path.abspath(os.path.join(directory, name))
    os.makedirs(directory, exist_ok=True)

    payload = {
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
    }
    if epoch_number is not None:
        payload["epoch"] = epoch_number
    if state.disc_params is not None:
        payload["disc_params"] = state.disc_params
        payload["disc_batch_stats"] = state.disc_batch_stats
        payload["disc_opt_state"] = state.disc_opt_state

    if jax.process_index() == 0:
        print(f"Saving model to:\n\t{path}")
    _checkpointer().save(path, jax.device_get(payload), force=True)
    return path


def load_checkpoint(path: str) -> dict:
    """Restore a checkpoint into plain (host) arrays."""
    return _checkpointer().restore(os.path.abspath(path))


def load_torch_checkpoint(path: str, model_config: dict,
                          adversarial: bool = False) -> tuple[dict, Optional[dict]]:
    """Convert a reference ``.pt`` checkpoint (weights-only finetune path).

    Returns (model_variables, disc_variables_or_None).
    """
    import torch

    from .convert import convert_discriminator_state_dict, convert_model_state_dict

    state_dict = torch.load(path, map_location="cpu")

    if adversarial or (isinstance(state_dict, dict) and "model" in state_dict
                       and "disc" in state_dict):
        model_vars = convert_model_state_dict(
            state_dict["model"], model_config["decoder"]["layers"]
        )
        disc_vars = convert_discriminator_state_dict(state_dict["disc"])
        return model_vars, disc_vars

    model_vars = convert_model_state_dict(
        state_dict, model_config["decoder"]["layers"]
    )
    return model_vars, None
