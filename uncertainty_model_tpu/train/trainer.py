"""Training runtime: jitted data-parallel train step + epoch loop.

TPU-native redesign of reference train/train.py:

* One jitted ``train_step`` (forward, 4-scale pyramid, stereo warp, composite
  loss, backward, Adam update — and the discriminator's step when
  adversarial) compiled once; the disparity-scale curriculum, learning rate
  and batch index enter as traced scalars so schedules never recompile.
* The global batch is sharded over the mesh's ``data`` axis; GSPMD inserts
  gradient all-reduces (DDP equivalent) and global-batch BN statistics
  (SyncBatchNorm equivalent, parallel_main.py:156-170) automatically.
* The perceptual loss's lagged discriminator (the reference's ``disc_clone``
  deep-copy refreshed every 10 batches, train/train.py:107,151-152) is a
  parameter copy refreshed with a ``jnp.where`` inside the step.
* Adam is ``optax.scale_by_adam`` with the learning rate applied as a traced
  multiplier (torch.optim.Adam parity: eps after the bias-corrected sqrt).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
import optax
from flax import struct

from ..losses import TukraUncertaintyLoss, discriminator_loss
from ..ops import reconstruct_pyramid_with_lr, scale_pyramid
from ..parallel.mesh import create_mesh, replicate_tree, shard_batch
from ..utils.schedules import adjust_disparity, learning_rate_for_epoch


@struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    disc_params: Any = None
    disc_batch_stats: Any = None
    disc_opt_state: Any = None
    disc_lag_params: Any = None  # lagged copy for generator/perceptual loss


def _tree_where(pred, a, b):
    return jax.tree.map(lambda x, y: jnp.where(pred, x, y), a, b)


class Trainer:
    def __init__(
        self,
        model,
        loss_config: Optional[dict] = None,
        disc=None,
        mesh=None,
        scales: int = 4,
        perceptual_update_freq: int = 10,
    ) -> None:
        self.model = model
        self.disc = disc
        self.loss = TukraUncertaintyLoss(**(loss_config or {}))
        self.mesh = mesh if mesh is not None else create_mesh()
        self.scales = scales
        self.perceptual_update_freq = perceptual_update_freq
        self.tx = optax.scale_by_adam(b1=0.9, b2=0.999, eps=1e-8)
        self._train_step = jax.jit(self._train_step_impl, donate_argnums=(0,))

    # ------------------------------------------------------------------
    # Initialisation
    # ------------------------------------------------------------------

    def init_state(self, rng: jax.Array, input_shape=(1, 256, 512, 3)) -> TrainState:
        model_rng, disc_rng = jax.random.split(rng)
        variables = self.model.init(
            model_rng, jnp.zeros(input_shape, jnp.float32), disp_scale=1.0
        )
        params = variables["params"]
        batch_stats = variables["batch_stats"]
        opt_state = self.tx.init(params)

        disc_params = disc_batch_stats = disc_opt_state = disc_lag = None
        if self.disc is not None:
            h, w = input_shape[1], input_shape[2]
            pyramid = [
                jnp.zeros((1, h // 2**i, w // 2**i, 6), jnp.float32)
                for i in range(self.scales)
            ]
            disc_vars = self.disc.init(disc_rng, pyramid)
            disc_params = disc_vars["params"]
            disc_batch_stats = disc_vars["batch_stats"]
            disc_opt_state = self.tx.init(disc_params)
            disc_lag = jax.tree.map(jnp.copy, disc_params)

        state = TrainState(
            params=params,
            batch_stats=batch_stats,
            opt_state=opt_state,
            disc_params=disc_params,
            disc_batch_stats=disc_batch_stats,
            disc_opt_state=disc_opt_state,
            disc_lag_params=disc_lag,
        )
        return replicate_tree(state, self.mesh)

    def load_state(self, variables: dict, disc_variables: Optional[dict] = None) -> TrainState:
        """Build a TrainState from converted/restored variables (finetune
        path, reference main.py:126-137).

        When the restored payload carries an ``opt_state`` (orbax checkpoints
        written by :func:`save_checkpoint`), the Adam moments are restored so
        training resumes identically to an uninterrupted run; reference
        ``.pt`` restores carry weights only and reproduce the reference's
        fresh-optimiser finetune semantics.
        """
        params = variables["params"]

        def restore_opt(restored, p):
            fresh = self.tx.init(p)
            if restored is None:
                return fresh

            # orbax restores optax namedtuple states as dicts keyed by FIELD
            # NAME (e.g. {'count', 'mu', 'nu'}), so rebuild by name against
            # the fresh template — correct for any field ordering and for
            # chained transforms (a leaf-order zip would silently permute
            # moment tensors if a state's fields weren't alphabetical).
            def rebuild(template, data):
                if hasattr(template, "_fields"):  # optax state namedtuples
                    return type(template)(*(
                        rebuild(getattr(template, f), data[f])
                        for f in template._fields
                    ))
                if isinstance(template, (tuple, list)):  # chained transforms
                    if isinstance(data, dict):  # orbax stores as {'0': ...}
                        data = [data[str(i)] for i in range(len(template))]
                    return type(template)(
                        rebuild(t, d) for t, d in zip(template, data)
                    )
                if isinstance(template, dict):
                    return {k: rebuild(v, data[k]) for k, v in template.items()}
                return data

            rebuilt = rebuild(fresh, restored)
            assert len(jax.tree.leaves(rebuilt)) == len(jax.tree.leaves(fresh))
            return rebuilt

        state = TrainState(
            params=params,
            batch_stats=variables["batch_stats"],
            opt_state=restore_opt(variables.get("opt_state"), params),
            disc_params=disc_variables["params"] if disc_variables else None,
            disc_batch_stats=disc_variables["batch_stats"] if disc_variables else None,
            disc_opt_state=restore_opt(
                disc_variables.get("opt_state"), disc_variables["params"]
            ) if disc_variables else None,
            disc_lag_params=jax.tree.map(jnp.copy, disc_variables["params"])
            if disc_variables
            else None,
        )
        return replicate_tree(state, self.mesh)

    # ------------------------------------------------------------------
    # The jitted step
    # ------------------------------------------------------------------

    def _apply_disc(self, params, batch_stats, pyramid, method=None):
        """Train-mode discriminator apply; batch-stat mutations are returned
        so the caller decides whether to keep them.

        The lagged clone's mutations are DISCARDED.  The reference's
        ``disc_clone`` deepcopy does accumulate BN buffer updates between
        refreshes (train/train.py:107,151-152), but those buffers are dead
        state: train-mode BatchNorm normalises by the current *batch*
        statistics (running buffers are written, never read), the clone is
        only ever applied in train mode, and its buffers are never copied
        back to the live discriminator.  Discarding them therefore changes
        no loss value, gradient, or checkpoint — pinned by
        tests/test_train_smoke.py::test_lag_disc_bn_stats_immaterial."""
        out, mutated = self.disc.apply(
            {"params": params, "batch_stats": batch_stats},
            pyramid,
            train=True,
            mutable=["batch_stats"],
            method=method,
        )
        return out, mutated["batch_stats"]

    def _train_step_impl(self, state: TrainState, batch, disp_scale, lr, step_idx):
        images = jnp.concatenate([batch["left"], batch["right"]], axis=-1)
        image_pyramid = scale_pyramid(images, self.scales)
        batch_size = batch["left"].shape[0]

        adversarial = self.disc is not None

        def loss_fn(params):
            disparities, mutated = self.model.apply(
                {"params": params, "batch_stats": state.batch_stats},
                batch["left"],
                disp_scale=disp_scale,
                train=True,
                mutable=["batch_stats"],
            )
            # losses always in f32 (model compute may be bf16 mixed precision)
            disparities = [d.astype(jnp.float32) for d in disparities]
            # recon + LR-consistency warps fused (same warp fields)
            recon_pyramid, lr_pyramid = reconstruct_pyramid_with_lr(
                disparities, image_pyramid
            )

            disc_apply = disc_features = None
            if adversarial:
                def disc_apply(pyr):
                    out, _ = self._apply_disc(
                        state.disc_lag_params, state.disc_batch_stats, pyr
                    )
                    return out

                def disc_features(pyr):
                    out, _ = self._apply_disc(
                        state.disc_lag_params, state.disc_batch_stats, pyr,
                        method="features",
                    )
                    return out

            disp_loss, error_loss = self.loss(
                image_pyramid, disparities, recon_pyramid,
                step=step_idx, disc_apply=disc_apply, disc_features=disc_features,
                lr_pyramid=lr_pyramid,
            )
            total = disp_loss + error_loss
            aux = (mutated["batch_stats"], disp_loss, error_loss, recon_pyramid)
            return total, aux

        grads, (new_batch_stats, disp_loss, error_loss, recon_pyramid) = jax.grad(
            loss_fn, has_aux=True
        )(state.params)

        updates, new_opt_state = self.tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: -lr * u, updates)
        new_params = optax.apply_updates(state.params, updates)

        metrics = {"disp_loss": disp_loss, "error_loss": error_loss}
        new_state = state.replace(
            params=new_params, batch_stats=new_batch_stats, opt_state=new_opt_state
        )

        if adversarial:
            def disc_loss_fn(disc_params):
                stats_box = {}

                def disc_apply_train(pyr):
                    out, new_stats = self._apply_disc(
                        disc_params, state.disc_batch_stats, pyr
                    )
                    stats_box["batch_stats"] = new_stats
                    return out

                loss = discriminator_loss(
                    image_pyramid, recon_pyramid, disc_apply_train, batch_size
                )
                return loss, stats_box["batch_stats"]

            (disc_loss, new_disc_stats), disc_grads = jax.value_and_grad(
                disc_loss_fn, has_aux=True
            )(state.disc_params)

            disc_updates, new_disc_opt = self.tx.update(
                disc_grads, state.disc_opt_state, state.disc_params
            )
            disc_updates = jax.tree.map(lambda u: -lr * u, disc_updates)
            new_disc_params = optax.apply_updates(state.disc_params, disc_updates)

            refresh = (step_idx % self.perceptual_update_freq) == 0
            new_lag = _tree_where(refresh, new_disc_params, state.disc_lag_params)

            metrics["disc_loss"] = disc_loss
            new_state = new_state.replace(
                disc_params=new_disc_params,
                disc_batch_stats=new_disc_stats,
                disc_opt_state=new_disc_opt,
                disc_lag_params=new_lag,
            )

        return new_state, metrics

    # ------------------------------------------------------------------
    # Epoch loops (host side)
    # ------------------------------------------------------------------

    def train_one_epoch(
        self,
        state: TrainState,
        loader,
        disp_scale: float,
        lr: float,
        epoch_number: Optional[int] = None,
        log_every: int = 0,
        progress: Optional[Callable[[dict], None]] = None,
        pbar: bool = False,
        metrics_every: int = 10,
    ):
        """One pass over the loader (reference train/train.py:51-170).

        Per-step loss scalars stay on device and are fetched every
        ``metrics_every`` batches — a per-step ``device_get`` would serialise
        dispatch behind the host<->device link (~30 ms/step through this
        environment's tunnel).

        Returns (state, per-image average losses dict).
        """
        running = {"disp_loss": 0.0, "error_loss": 0.0, "disc_loss": 0.0}
        n_images = 0
        averages = {"disp": float("nan"), "unc": float("nan"), "disc": None,
                    "scale": disp_scale}  # value when the loader is empty
        pending: list = []  # device-side metric dicts awaiting fetch

        iterator = loader
        tepoch = None
        if pbar:
            import tqdm

            description = (f"Epoch #{epoch_number}" if epoch_number is not None
                           else "Epoch")
            tepoch = tqdm.tqdm(loader, description, unit="batch")
            iterator = tepoch

        def drain():
            for fetched in jax.device_get(pending):
                for key in ("disp_loss", "error_loss", "disc_loss"):
                    if key in fetched:
                        running[key] += float(fetched[key])
            pending.clear()
            return {
                "disp": running["disp_loss"] / n_images,
                "unc": running["error_loss"] / n_images,
                "disc": running["disc_loss"] / n_images if self.disc else None,
                "scale": disp_scale,
            }

        # metric fetches happen on drain boundaries; honour a finer log_every
        # by draining at gcd(metrics_every, log_every) so requested logging
        # cadences below metrics_every aren't silently coarsened
        drain_every = max(metrics_every, 1)
        if log_every:
            import math

            drain_every = math.gcd(drain_every, log_every)

        for i, batch in enumerate(iterator):
            sharded = shard_batch(batch, self.mesh)
            state, metrics = self._train_step(
                state, sharded, jnp.float32(disp_scale), jnp.float32(lr), jnp.int32(i)
            )

            n_images += batch["left"].shape[0]
            pending.append(metrics)
            if (i + 1) % drain_every != 0:
                continue
            averages = drain()
            if tepoch is not None:
                tepoch.set_postfix(disp=averages["disp"], unc=averages["unc"],
                                   disc=averages["disc"], scale=disp_scale)
            elif progress is not None:
                progress({"batch": i, **averages})
            elif log_every and (i + 1) % log_every == 0:
                print(
                    f"Epoch #{epoch_number} [{i + 1}/{len(loader)}] "
                    f"disp={averages['disp']:.2e} unc={averages['unc']:.2e}"
                )

        if pending:
            averages = drain()
        return state, averages

    def train_model(
        self,
        state: TrainState,
        loader,
        epochs: int,
        learning_rate: float,
        val_loader=None,
        evaluate_every: Optional[int] = None,
        save_evaluation_to: Optional[str] = None,
        save_every: Optional[int] = None,
        save_model_to: Optional[str] = None,
        finetune: bool = False,
        no_pbar: bool = False,
        process_index: int = 0,
        profile_dir: Optional[str] = None,
        start_epoch: int = 0,
    ):
        """Multi-epoch training (reference train/train.py:173-267).

        ``profile_dir``: write a jax.profiler trace of the first epoch
        (the reference has no profiler at all, SURVEY.md §5).

        ``start_epoch``: first epoch index to run (resume path): with the
        Adam moments restored by :meth:`load_state` and ``start_epoch`` set
        to the checkpoint's epoch number, training continues identically to
        an uninterrupted run — the LR schedule and disparity-scale
        curriculum pick up where they left off.  (``finetune`` instead
        reproduces the reference's weights-only restart semantics:
        schedules reset, lr/4, scale=1 — train/utils.py:345-346.)
        """
        from .checkpoint import save_checkpoint
        from .evaluate import evaluate_model

        training_losses = []
        validation_metrics = []

        for epoch in range(start_epoch, epochs):
            if profile_dir is not None and epoch == 0:
                jax.profiler.start_trace(profile_dir)
            lr = learning_rate_for_epoch(epoch, learning_rate, finetune)
            disp_scale = 1.0 if finetune else adjust_disparity(epoch)
            if hasattr(loader, "set_epoch"):
                loader.set_epoch(epoch)

            t0 = time.time()
            state, averages = self.train_one_epoch(
                state, loader, disp_scale, lr, epoch_number=epoch + 1,
                log_every=10 if no_pbar else 0,
                pbar=(not no_pbar and process_index == 0),
            )
            if profile_dir is not None and epoch == 0:
                jax.tree.map(lambda x: x.block_until_ready(), state.params)
                jax.profiler.stop_trace()
            if process_index == 0:
                training_losses.append(
                    (averages.get("disp"), averages.get("unc"), averages.get("disc"))
                )
                print(
                    f"Epoch #{epoch + 1}:"
                    f"\n\tdisparity loss: {averages['disp']:.2e}"
                    f"\n\tuncertainty loss: {averages['unc']:.2e}"
                    f"\n\tdisparity scale: {disp_scale:.2f}"
                    f"\n\ttime: {time.time() - t0:.1f}s"
                )

            if evaluate_every is not None and (epoch + 1) % evaluate_every == 0:
                metrics = evaluate_model(
                    self.model, state, val_loader,
                    save_evaluation_to=save_evaluation_to,
                    epoch_number=epoch + 1, is_final=False, scale=disp_scale,
                    mesh=self.mesh, process_index=process_index,
                )
                if process_index == 0:
                    validation_metrics.append(metrics)

            if (
                save_every is not None
                and (epoch + 1) % save_every == 0
                and save_model_to is not None
            ):
                # ALL ranks call save (orbax checkpointing is a collective
                # with its own primary-host gating; a rank-0-only call
                # deadlocks the internal sync barrier)
                save_checkpoint(save_model_to, state, epoch_number=epoch + 1)

        if process_index == 0:
            print("Training completed.")
        if save_model_to is not None:
            save_checkpoint(save_model_to, state, is_final=True)

        return state, training_losses, validation_metrics
