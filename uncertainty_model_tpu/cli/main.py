"""Training CLI (reference main.py).

Mirrors the reference's argparse surface::

    python main.py <config.yml> <da-vinci|scared> [--epochs N] [--batch-size B]
        [--learning-rate LR] [--adversarial] [--finetune-from PATH]
        [--training-size N] [--validation-size N] [--workers W]
        [--save-model-to DIR] [--save-results-to DIR]
        [--save-model-every N] [--evaluate-every N]
        [--no-pbar] [--no-augment] [--home DIR]

plus TPU-native extras: ``--platform`` (axon/tpu/cpu), ``--precision``
(float32/bfloat16 matmuls).  Data parallelism over all local devices is
always on — a 1-device mesh degenerates to the reference's serial mode.
"""

from __future__ import annotations

import argparse
import json
import os
from datetime import datetime


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser()
    parser.add_argument("config", type=str,
                        help="The config file path to build the model from.")
    parser.add_argument("dataset", choices=["da-vinci", "scared", "cityscapes"],
                        help="The dataset to use for training.")
    parser.add_argument("--epochs", "-e", default=200, type=int)
    parser.add_argument("--learning-rate", "-lr", default=1e-4, type=float)
    parser.add_argument("--batch-size", "-b", default=8, type=int,
                        help="Global batch size (sharded over the mesh).")
    parser.add_argument("--adversarial", action="store_true", default=False)
    parser.add_argument("--finetune-from", default=None, type=str,
                        help="Path to an orbax checkpoint dir or reference .pt file. "
                             "Reference finetune semantics: schedules restart "
                             "(lr/4, scale=1, reference train/utils.py:345-346).")
    parser.add_argument("--resume-from", default=None, type=str,
                        help="Path to an orbax checkpoint dir (epoch_NNN). "
                             "Restores params + Adam moments + epoch and "
                             "continues schedules from there — identical to "
                             "an uninterrupted run (preemption recovery; the "
                             "reference has no resume path, SURVEY.md §5).")
    parser.add_argument("--training-size", default=None, nargs="?", type=int)
    parser.add_argument("--validation-size", default=None, nargs="?", type=int)
    parser.add_argument("--workers", "-w", default=8, type=int)
    parser.add_argument("--save-model-to", default=None, type=str)
    parser.add_argument("--save-results-to", default=None, type=str)
    parser.add_argument("--save-model-every", default=10, type=int)
    parser.add_argument("--evaluate-every", default=10, type=int)
    parser.add_argument("--no-pbar", action="store_true", default=False)
    parser.add_argument("--no-augment", action="store_true", default=False)
    parser.add_argument("--home", default=os.environ.get("HOME", "."), type=str)
    parser.add_argument("--image-size", default=(256, 512), nargs=2, type=int)
    parser.add_argument("--seed", default=0, type=int)
    # TPU-native extras
    parser.add_argument("--platform", default=None, type=str,
                        help="Force a JAX platform (cpu for smoke tests).")
    parser.add_argument("--precision", default="float32",
                        choices=["float32", "bfloat16"],
                        help="Matmul/conv precision on device.")
    parser.add_argument("--data-backend", default="auto",
                        choices=["auto", "native", "pil"],
                        help="Image decode path: native C++ (libpng + thread "
                             "pool) or PIL; auto prefers native when built.")
    parser.add_argument("--profile-dir", default=None, type=str,
                        help="Write a jax.profiler trace of epoch 0 here "
                             "(view with TensorBoard).")
    return parser


def main(args: argparse.Namespace) -> None:
    if args.platform is not None:
        import jax

        jax.config.update("jax_platforms", args.platform)

    import jax
    import jax.numpy as jnp
    import yaml

    from ..data import (
        CityScapesDataset,
        DaVinciDataset,
        DataLoader,
        SCAREDDataset,
        default_augment_transform,
        default_eval_transform,
    )
    from ..models import RandomDiscriminator, RandomlyConnectedModel
    from ..parallel import create_mesh
    from ..train import Trainer, evaluate_model
    from ..train.checkpoint import load_checkpoint, load_torch_checkpoint

    compute_dtype = None
    if args.precision == "bfloat16":
        # mixed precision: f32 master params + losses, bf16 module compute
        jax.config.update("jax_default_matmul_precision", "bfloat16")
        compute_dtype = jnp.bfloat16

    print("Arguments passed:")
    for key, value in vars(args).items():
        print(f"\t- {key}: {value}")

    dataset_path = os.path.join(args.home, "datasets", args.dataset)
    dataset_class = {
        "da-vinci": DaVinciDataset,
        "scared": SCAREDDataset,
        "cityscapes": CityScapesDataset,
    }[args.dataset]

    with open(args.config) as f:
        config = yaml.load(f, Loader=yaml.Loader)

    size = tuple(args.image_size)
    train_transform = (
        default_eval_transform(size) if args.no_augment
        else default_augment_transform(size)
    )
    eval_split = "test" if args.dataset != "cityscapes" else "val"
    train_dataset = dataset_class(dataset_path, "train", train_transform,
                                  args.training_size)
    val_dataset = dataset_class(dataset_path, eval_split,
                                default_eval_transform(size), args.validation_size)

    print(f"Dataset size:"
          f"\n\tTrain: {len(train_dataset):,} images."
          f"\n\tTest: {len(val_dataset):,} images.")

    # per-host data sharding (DistributedSampler analogue): each host loads
    # 1/process_count of every global batch
    per_host_batch = args.batch_size // jax.process_count()
    train_loader = DataLoader(train_dataset, per_host_batch, shuffle=True,
                              seed=args.seed, num_workers=args.workers,
                              drop_last=True, backend=args.data_backend,
                              shard_index=jax.process_index(),
                              num_shards=jax.process_count())
    # eval keeps partial batches (at most one extra compile for the remainder)
    val_loader = DataLoader(val_dataset, per_host_batch, shuffle=False,
                            num_workers=args.workers, drop_last=False,
                            backend=args.data_backend,
                            shard_index=jax.process_index(),
                            num_shards=jax.process_count())

    mesh = create_mesh()
    print(f"Mesh: {mesh} over {len(jax.devices())} device(s).")

    model = RandomlyConnectedModel.from_config(**config["model"], dtype=compute_dtype)
    disc = (RandomDiscriminator.from_config(**config["discriminator"],
                                            dtype=compute_dtype)
            if args.adversarial else None)

    trainer = Trainer(model, config["loss"], disc=disc, mesh=mesh)

    input_shape = (1, size[0], size[1], 3)
    start_epoch = 0
    restore_path = args.resume_from or args.finetune_from
    if args.resume_from is not None and args.finetune_from is not None:
        raise SystemExit("--resume-from and --finetune-from are exclusive")
    if restore_path is not None:
        if restore_path.endswith(".pt"):
            if args.resume_from is not None:
                raise SystemExit("--resume-from needs an orbax checkpoint "
                                 "(.pt files carry no optimiser state/epoch)")
            model_vars, disc_vars = load_torch_checkpoint(
                restore_path, config["model"], adversarial=args.adversarial)
        else:
            restored = load_checkpoint(restore_path)
            model_vars = {"params": restored["params"],
                          "batch_stats": restored["batch_stats"],
                          "opt_state": restored.get("opt_state")}
            disc_vars = (
                {"params": restored["disc_params"],
                 "batch_stats": restored["disc_batch_stats"],
                 "opt_state": restored.get("disc_opt_state")}
                if "disc_params" in restored else None
            )
            if args.resume_from is not None:
                start_epoch = int(restored.get("epoch", 0))
        state = trainer.load_state(model_vars, disc_vars)
    else:
        state = trainer.init_state(jax.random.PRNGKey(args.seed), input_shape)

    n_params = sum(p.size for p in jax.tree.leaves(state.params))
    print(f"Model has {n_params:,} learnable parameters."
          f"\n\tPlatform: {jax.devices()[0].platform}")
    if disc is not None:
        n_disc = sum(p.size for p in jax.tree.leaves(state.disc_params))
        print(f"Discriminator has {n_disc:,} learnable parameters.")

    # output directories are rank-0-only, like every save path (the
    # reference's rank gating: train/train.py:245-265)
    date = datetime.now().strftime("%Y%m%d%H%M%S")
    folder = f"model_{date}"
    if jax.process_count() > 1:
        # every rank must agree on the run folder: orbax checkpointing is a
        # collective (all ranks call save and sync on the SAME path), and
        # the per-rank timestamps can differ
        import numpy as _np

        from jax.experimental import multihost_utils

        payload = _np.frombuffer(folder.ljust(64).encode(), dtype=_np.uint8)
        folder = bytes(multihost_utils.broadcast_one_to_all(payload)
                       ).decode().strip()
    model_directory = (os.path.join(args.save_model_to, folder)
                       if args.save_model_to else None)
    results_directory = (os.path.join(args.save_results_to, folder)
                         if args.save_results_to else None)
    if jax.process_index() == 0:
        # writing stays rank-0-only (reference rank gating,
        # train/train.py:245-265); orbax handles its own primary-host logic
        for d in (model_directory, results_directory):
            if d:
                os.makedirs(d, exist_ok=True)

    state, training_losses, validation_metrics = trainer.train_model(
        state, train_loader, args.epochs, args.learning_rate,
        val_loader=val_loader,
        evaluate_every=args.evaluate_every,
        save_evaluation_to=results_directory,
        save_every=args.save_model_every,
        save_model_to=model_directory,
        finetune=(args.finetune_from is not None),
        no_pbar=args.no_pbar,
        process_index=jax.process_index(),
        profile_dir=args.profile_dir,
        start_epoch=start_epoch,
    )

    if results_directory is not None and jax.process_index() == 0:
        _write_results(results_directory, args, config,
                       training_losses, validation_metrics)


def _write_results(results_directory, args, config, training_losses,
                   validation_metrics) -> None:
    """results.json with the reference's schema (reference main.py:165-205)."""
    losses_filepath = os.path.join(results_directory, "results.json")

    disp, unc, disc = (zip(*training_losses) if training_losses
                       else ((), (), ()))
    results_dict = {
        "arguments": vars(args),
        "config": config,
        "losses": {
            "training": {
                "disparity": list(disp),
                "uncertainty": list(unc),
                "discriminator": list(disc) if args.adversarial else None,
            }
        },
    }

    if validation_metrics:
        ssims, spars = zip(*validation_metrics)
        left_ssim, right_ssim = zip(*ssims)
        ause, aurg = zip(*spars)
        results_dict["losses"]["validation"] = {
            "ssim": {"left": list(left_ssim), "right": list(right_ssim)},
            "sparsification": {"ause": list(ause), "aurg": list(aurg)},
        }

    print(f"Saving args and losses to:\n\t{losses_filepath}")
    with open(losses_filepath, "w") as f:
        json.dump(results_dict, f, indent=4)


if __name__ == "__main__":
    main(build_parser().parse_args())
