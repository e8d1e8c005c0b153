#!/usr/bin/env python3
"""Convert a reference PyTorch checkpoint (.pt) to an orbax checkpoint.

Usage:
    python tools/convert_checkpoint.py <checkpoint.pt> <config.yml> <out_dir>
        [--adversarial]

The reference saves bare ``state_dict``s (or ``{'model', 'disc'}`` dicts when
adversarial — reference train/train.py:18-48); this tool converts them to
this framework's variable trees and writes an orbax checkpoint that
``--finetune-from`` accepts.
"""

from __future__ import annotations

import argparse


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("checkpoint", help="reference .pt checkpoint path")
    parser.add_argument("config", help="config.yml used to build the model")
    parser.add_argument("out_dir", help="output orbax checkpoint directory")
    parser.add_argument("--adversarial", action="store_true", default=False)
    args = parser.parse_args()

    import jax
    import yaml

    jax.config.update("jax_platforms", "cpu")

    import orbax.checkpoint as ocp

    from uncertainty_model_tpu.train.checkpoint import load_torch_checkpoint

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)

    model_vars, disc_vars = load_torch_checkpoint(
        args.checkpoint, config["model"], adversarial=args.adversarial
    )

    payload = {
        "params": model_vars["params"],
        "batch_stats": model_vars["batch_stats"],
    }
    if disc_vars is not None:
        payload["disc_params"] = disc_vars["params"]
        payload["disc_batch_stats"] = disc_vars["batch_stats"]

    import os

    out = os.path.abspath(args.out_dir)
    ocp.PyTreeCheckpointer().save(out, payload, force=True)
    print(f"Wrote {out}")


if __name__ == "__main__":
    main()
