"""Trainer: fit / validate / test / predict loops.

Replaces the reference's Lightning Trainer + callbacks with an explicit
loop built around jitted steps on a GSPMD mesh. Covered reference
behaviors (SURVEY.md §3.1, §5):

- epoch loop with val after each train epoch; ``val_loss`` drives
  EarlyStopping (patience) and best-checkpoint retention,
- ReduceLROnPlateau stepping on the epoch val metric,
- visualization rendered only when a new best checkpoint is saved
  (reference tools/callbacks/segmentation_visualization.py:41-76),
- auto-test after fit on the best checkpoint
  (reference train.py:30-62 ``after_fit``),
- per-class IoU at test with class-label names,
- warm start via ``weights_from_checkpoint_path`` + ``load_parts``.
"""

from __future__ import annotations

import logging
import time
from dataclasses import dataclass, field
from pathlib import Path
from typing import Any, Iterable

import jax
import jax.numpy as jnp
import numpy as np

from geo_deep_learning_tpu.core.mesh import (
    MeshConfig,
    create_mesh,
    host0_only,
    is_host0,
    shard_batch,
)
from geo_deep_learning_tpu.core.precision import Precision, PrecisionPolicy
from geo_deep_learning_tpu.core.train_state import TrainState
from geo_deep_learning_tpu.ops import metrics as M
from geo_deep_learning_tpu.ops.augment import AugmentConfig
from geo_deep_learning_tpu.training import optim as optim_lib
from geo_deep_learning_tpu.training.checkpoint import (
    CheckpointManager,
    load_weights_from_checkpoint,
)
from geo_deep_learning_tpu.training.steps import (
    device_batch,
    make_eval_step,
    make_predict_step,
    make_train_step,
)
from geo_deep_learning_tpu.training.task import SegmentationTask
from geo_deep_learning_tpu.tools.tracking import Tracker

logger = logging.getLogger(__name__)


@dataclass
class EarlyStopping:
    """val-metric early stopping (reference Lightning EarlyStopping)."""

    monitor: str = "val_loss"
    mode: str = "min"
    patience: int = 20
    best: float | None = None
    bad_epochs: int = 0

    def update(self, value: float) -> bool:
        """Returns True when training should stop."""
        better = (
            self.best is None
            or (self.mode == "min" and value < self.best)
            or (self.mode == "max" and value > self.best)
        )
        if better:
            self.best = value
            self.bad_epochs = 0
            return False
        self.bad_epochs += 1
        return self.bad_epochs > self.patience


def build_schedule(
    sched_cfg: dict,
    lr: float,
    total_steps: int | None,
    steps_per_epoch: int | None,
    onecycle_ctx: dict | None = None,
) -> tuple[Any, optim_lib.PlateauController | None]:
    """Map a (normalized) reference scheduler config onto an optax schedule
    or a host-side plateau controller.

    Reference scheduler semantics this mirrors: ReduceLROnPlateau /
    OneCycleLR wiring in tasks_with_models/segmentation_dofa.py:149-195 and
    ``LinearWarmupCosineAnnealingLR`` (tools/schedulers/lr_scheduler.py:13),
    whose ``warmup_epochs``/``max_epochs`` are EPOCH counts (Lightning steps
    it once per epoch) — converted here to optimizer steps via
    ``steps_per_epoch`` because optax schedules advance per update.
    """
    sched_cfg = dict(sched_cfg)
    sched_name = sched_cfg.pop("name", sched_cfg.pop("class_path", None))
    if sched_name in (
        "ReduceLROnPlateau",
        "torch.optim.lr_scheduler.ReduceLROnPlateau",
    ):
        plateau = optim_lib.PlateauController(
            mode=sched_cfg.get("mode", "min"),
            factor=float(sched_cfg.get("factor", 0.1)),
            patience=int(sched_cfg.get("patience", 10)),
            cooldown=int(sched_cfg.get("cooldown", 0)),
            min_lr=float(sched_cfg.get("min_lr", 0.0)),
            threshold=float(sched_cfg.get("threshold", 1e-4)),
            threshold_mode=sched_cfg.get("threshold_mode", "rel"),
            eps=float(sched_cfg.get("eps", 1e-8)),
            base_lr=lr,
        )
        return None, plateau
    if sched_name in ("OneCycleLR", "torch.optim.lr_scheduler.OneCycleLR"):
        # the reference's three total-steps fallbacks, in ITS order
        # (segmentation_dofa.py:149-191): (1) the trainer's estimated
        # stepping batches when the loader is sized; (2) streaming
        # datamodules expose epoch_size -> steps_per_epoch + an
        # accumulation buffer; (3) the config's own total_steps
        ctx = onecycle_ctx or {}
        accum = max(int(ctx.get("accumulate", 1)), 1)
        if total_steps:
            steps = -(-int(total_steps) // accum)
        elif ctx.get("epoch_size") and ctx.get("batch_size"):
            import math

            spe = math.ceil(
                int(ctx["epoch_size"]) / (int(ctx["batch_size"]) * accum)
            )
            buffer_steps = int(spe * accum)
            steps = (spe + buffer_steps) * int(ctx.get("max_epochs", 1))
        else:
            steps = int(sched_cfg.get("total_steps") or 1000)
        kw = {
            k: float(sched_cfg[k])
            for k in ("pct_start", "div_factor", "final_div_factor")
            if k in sched_cfg
        }
        if sched_cfg.get("anneal_strategy", "cos") != "cos":
            logger.warning(
                "OneCycleLR anneal_strategy=%r not supported; using cos",
                sched_cfg["anneal_strategy"],
            )
        return (
            optim_lib.one_cycle(
                max_lr=float(sched_cfg.get("max_lr", lr)),
                total_steps=steps,
                **kw,
            ),
            None,
        )
    if sched_name in (
        "LinearWarmupCosineAnnealingLR",
        "tools.schedulers.lr_scheduler.LinearWarmupCosineAnnealingLR",
    ):
        spe = steps_per_epoch or 1
        if steps_per_epoch is None:
            logger.warning(
                "LinearWarmupCosineAnnealingLR: steps_per_epoch unknown "
                "(streaming loader?); treating warmup/max epochs as steps"
            )
        return (
            optim_lib.linear_warmup_cosine_annealing(
                warmup_epochs=int(sched_cfg.get("warmup_epochs", 0)) * spe,
                max_epochs=int(sched_cfg.get("max_epochs", total_steps or 1000))
                * spe,
                warmup_start_lr=float(sched_cfg.get("warmup_start_lr", 0.0)),
                eta_min=float(sched_cfg.get("eta_min", 0.0)),
                base_lr=lr,
            ),
            None,
        )
    return None, None


@dataclass
class TrainerConfig:
    max_epochs: int = 10
    precision: str = "bf16-mixed"
    grad_clip: float | None = 1.0
    monitor: str = "val_loss"
    monitor_mode: str = "min"
    early_stopping_patience: int | None = 20
    checkpoint_dir: str = "checkpoints"
    log_every_n_steps: int = 10
    seed: int = 42
    augment: bool = True
    accumulate_grad_batches: int = 1
    mesh: MeshConfig = field(default_factory=MeshConfig)
    visualize_max_samples: int = 3
    auto_test_after_fit: bool = True


class Trainer:
    def __init__(
        self,
        config: TrainerConfig | None = None,
        tracker: Tracker | None = None,
    ) -> None:
        self.config = config or TrainerConfig()
        self.tracker = tracker or Tracker()
        self.mesh = create_mesh(self.config.mesh)
        self.precision = PrecisionPolicy.create(Precision(self.config.precision))
        self.ckpt: CheckpointManager | None = None
        self.state: TrainState | None = None
        self._plateau: optim_lib.PlateauController | None = None
        self._schedule = None
        self._base_lr = float("nan")
        # datamodule facts for OneCycleLR's streaming-loader fallback
        # (reference segmentation_dofa.py:163-180); filled in by fit()
        self._onecycle_ctx: dict = {}

    def _current_lr(self, step: int) -> float:
        """Effective learning rate for metric logging (reference logs
        ``lr`` per epoch via Lightning's LearningRateMonitor semantics)."""
        if self._plateau is not None:
            return self._plateau.lr
        if self._schedule is not None:
            return float(self._schedule(step))
        return self._base_lr

    # ------------------------------------------------------------------
    def _init_state(
        self,
        task: SegmentationTask,
        sample_batch: dict,
        optimizer: dict | None,
        scheduler: dict | None,
        total_steps: int | None,
        steps_per_epoch: int | None = None,
        weights_from_checkpoint_path: str | None = None,
        load_parts: list[str] | None = None,
        freeze_layers: list[str] | None = None,
        torch_weights: dict | None = None,
    ) -> TrainState:
        rng = jax.random.PRNGKey(self.config.seed)

        converted = None
        if torch_weights:
            # warm start the encoder from a torch checkpoint file or a
            # pre-converted .msgpack from scripts/fetch_weights.py
            # ({"path", "format": resnet|mit|dofa, "in_channels", "subtree"})
            from geo_deep_learning_tpu.models import convert as cv

            converted = cv.load_pretrained_tree(
                torch_weights["path"],
                fmt=torch_weights.get("format", "resnet"),
                in_channels=int(torch_weights.get("in_channels", 3)),
            )
            # DOFA artifacts carry the pretrained pos-embed table as a
            # side entry (not a param); route it into the model the same
            # way the reference's loader does (dofa_v2.py:349-392 resizes
            # the checkpoint's pos_embed) instead of falling back to
            # fresh sincos positions
            pos_table = converted.get("pos_embed")
            if (
                pos_table is not None
                and hasattr(task.model, "pos_embed_table")
                and task.model.pos_embed_table is None
            ):
                task.model = task.model.clone(
                    pos_embed_table=np.asarray(pos_table)
                )

        variables = task.init_variables(rng, device_batch(sample_batch))
        if converted is not None:
            variables = cv.merge_pretrained(
                dict(variables), converted, torch_weights.get("subtree", "encoder")
            )

        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})

        if weights_from_checkpoint_path:
            params, batch_stats = load_weights_from_checkpoint(
                weights_from_checkpoint_path, params, load_parts, batch_stats
            )

        def normalize(cfg):
            """Accept both flat {'name', ...} and YAML
            {'class_path', 'init_args': {...}} shapes."""
            cfg = dict(cfg)
            if "init_args" in cfg:
                args = cfg.pop("init_args") or {}
                cfg.update(args)
            return cfg

        opt_cfg = normalize(optimizer or {"name": "adam", "lr": 1e-4})
        name = opt_cfg.pop("name", opt_cfg.pop("class_path", "adam"))
        lr = float(opt_cfg.pop("lr", 1e-4))

        sched_cfg = normalize(scheduler or {})
        schedule, self._plateau = build_schedule(
            sched_cfg, lr, total_steps, steps_per_epoch,
            onecycle_ctx=self._onecycle_ctx,
        )
        self._schedule = schedule
        self._base_lr = lr

        tx = optim_lib.build_optimizer(
            params,
            optimizer=name,
            lr=lr,
            schedule=schedule,
            plateau=self._plateau,
            accumulate_steps=self.config.accumulate_grad_batches,
            grad_clip=self.config.grad_clip,
            freeze_patterns=freeze_layers,
            **opt_cfg,
        )
        state = TrainState.create(
            apply_fn=task.model.apply,
            params=params,
            tx=tx,
            batch_stats=batch_stats,
            rng=jax.random.fold_in(rng, 1),
        )
        # place the state over the mesh: pure DP replicates everything;
        # a model axis > 1 (``trainer.mesh: {data: N, model: M}``) applies
        # the Megatron-style TENSOR_PARALLEL_RULES to params AND the
        # optimizer moments, so the jitted step inherits the TP layout
        # end to end (collectives are emitted by XLA from the shardings)
        from geo_deep_learning_tpu.parallel import (
            TENSOR_PARALLEL_RULES,
            count_model_sharded,
            model_axis_size,
            place_state,
        )

        rules = None
        if model_axis_size(self.mesh) > 1:
            rules = TENSOR_PARALLEL_RULES
        state = place_state(state, self.mesh, rules)
        if rules is not None:
            n_tp = count_model_sharded(state.params)
            if n_tp == 0:
                logger.warning(
                    "mesh has model axis %d but no parameter matched the "
                    "tensor-parallel rules; running fully replicated",
                    model_axis_size(self.mesh),
                )
            else:
                logger.info(
                    "tensor parallelism: %d param tensors sharded over "
                    "model axis of size %d",
                    n_tp,
                    model_axis_size(self.mesh),
                )
        return state

    # ------------------------------------------------------------------
    def fit(
        self,
        task: SegmentationTask,
        datamodule,
        optimizer: dict | None = None,
        scheduler: dict | None = None,
        ckpt_path: str | None = None,
        weights_from_checkpoint_path: str | None = None,
        load_parts: list[str] | None = None,
        freeze_layers: list[str] | None = None,
        torch_weights: dict | None = None,
    ) -> dict:
        cfg = self.config
        datamodule.setup("fit")
        train_loader = datamodule.train_dataloader()
        steps_per_epoch = getattr(train_loader, "__len__", lambda: None)()
        total_steps = (
            steps_per_epoch * cfg.max_epochs if steps_per_epoch else None
        )
        self._onecycle_ctx = {
            "epoch_size": getattr(datamodule, "epoch_size", None),
            "batch_size": getattr(datamodule, "batch_size", None),
            "accumulate": cfg.accumulate_grad_batches,
            "max_epochs": cfg.max_epochs,
        }

        first_batch = next(iter(train_loader))
        self.state = self._init_state(
            task,
            first_batch,
            optimizer,
            scheduler,
            total_steps,
            steps_per_epoch,
            weights_from_checkpoint_path,
            load_parts,
            freeze_layers,
            torch_weights,
        )
        self.ckpt = CheckpointManager(
            cfg.checkpoint_dir, monitor=cfg.monitor, mode=cfg.monitor_mode
        )
        if ckpt_path:
            self.state = self.ckpt.restore(ckpt_path, self.state)
            logger.info("resumed from %s", ckpt_path)
        elif self.ckpt.best_path is not None:
            # fresh fit into a dir holding an earlier run's checkpoints:
            # a stale best (possibly from a DIFFERENT optimizer/scheduler
            # config, hence a different opt_state tree) must not gate
            # this run's saves or be restored by the auto-test — Lightning
            # avoids this via versioned run dirs; we reset the tracking
            # (old files stay on disk until a same-named save replaces them)
            logger.warning(
                "checkpoint dir %s holds an earlier run's best (%s); "
                "starting fresh best tracking for this fit",
                cfg.checkpoint_dir,
                self.ckpt.best_path,
            )
            self.ckpt.reset_best()

        train_step = make_train_step(
            task,
            self.precision,
            AugmentConfig() if cfg.augment else None,
            freeze_patterns=freeze_layers,
            mesh=self.mesh,
        )
        eval_step = make_eval_step(task, self.precision, mesh=self.mesh)

        stopper = (
            EarlyStopping(
                monitor=cfg.monitor,
                mode=cfg.monitor_mode,
                patience=cfg.early_stopping_patience,
            )
            if cfg.early_stopping_patience is not None
            else None
        )

        global_step = int(self.state.step)
        history: dict[str, float] = {}
        for epoch in range(cfg.max_epochs):
            # ---- train ----
            t0 = time.time()
            losses = []
            n_samples = 0
            for batch in train_loader:
                db = shard_batch(device_batch(batch), self.mesh)
                self.state, step_metrics = train_step(self.state, db)
                losses.append(step_metrics["loss"])
                n_samples += int(np.asarray(db["image"].shape[0]))
                global_step += 1
                if global_step % cfg.log_every_n_steps == 0:
                    self.tracker.log_metrics(
                        {"train_loss_step": float(step_metrics["loss"])}, global_step
                    )
            train_loss = float(jnp.mean(jnp.stack(losses))) if losses else float("nan")
            epoch_time = time.time() - t0
            throughput = n_samples / epoch_time if epoch_time > 0 else 0.0

            # ---- validate ----
            val_metrics, val_sample = self._run_eval(
                task, eval_step, datamodule.val_dataloader(), prefix="val",
                keep_first_preds=True,
            )
            epoch_metrics = {
                "train_loss": train_loss,
                "epoch_time_s": epoch_time,
                "patches_per_sec": throughput,
                "lr": self._current_lr(global_step),
                **val_metrics,
            }
            self.tracker.log_metrics(epoch_metrics, epoch)
            logger.info(
                "epoch %d: train_loss=%.4f val_loss=%.4f (%.1f patches/s)",
                epoch,
                train_loss,
                val_metrics.get("val_loss", float("nan")),
                throughput,
            )
            history = epoch_metrics

            # ---- plateau scheduler ----
            if self._plateau is not None and cfg.monitor in val_metrics:
                old_scale = self._plateau.scale
                self._plateau.update(val_metrics[cfg.monitor])
                if self._plateau.scale != old_scale:
                    self.state = self.state.replace(
                        opt_state=optim_lib.set_learning_rate(
                            self.state.opt_state, self._plateau.lr
                        )
                    )

            # ---- checkpoint best (+ viz on new best, reference behavior) ----
            improved, _ = self.ckpt.save(self.state, epoch, epoch_metrics)
            if improved and val_sample is not None:
                self._log_visualizations(task, val_sample, epoch)

            # ---- early stopping ----
            if stopper and cfg.monitor in epoch_metrics and stopper.update(
                epoch_metrics[cfg.monitor]
            ):
                logger.info("early stopping at epoch %d", epoch)
                break

        self.ckpt.save_last(self.state)

        # ---- auto-test on best ckpt (reference train.py after_fit) ----
        # Runs on ALL processes: the jitted eval step reduces over globally
        # sharded arrays, so gating it on host0 would strand the collective
        # in a multi-host run. Only the logging side is host0-guarded (the
        # tracker factory already returns a no-op tracker off host 0).
        if cfg.auto_test_after_fit:
            try:
                test_loader = datamodule.test_dataloader()
            except Exception:
                test_loader = None
            if test_loader is not None:
                if self.ckpt.best_path is not None:
                    self.state = self.ckpt.restore(self.ckpt.best_path, self.state)
                test_metrics, _ = self._run_eval(
                    task, eval_step, test_loader, prefix="test", task_labels=task
                )
                self.tracker.log_metrics(test_metrics, cfg.max_epochs)
                history.update(test_metrics)
        return history

    # ------------------------------------------------------------------
    def _run_eval(
        self,
        task: SegmentationTask,
        eval_step,
        loader: Iterable,
        prefix: str = "val",
        task_labels=None,
        keep_first_preds: bool = False,
    ) -> tuple[dict, Any]:
        losses = []
        counts = []
        cm = jnp.zeros((task.eval_classes, task.eval_classes), dtype=jnp.float32)
        sample = None
        n = 0
        for batch in loader:
            db = shard_batch(device_batch(batch), self.mesh)
            out = eval_step(self.state, db)
            if sample is None and keep_first_preds:
                # preds stay on device for every other batch; only the
                # first batch is pulled to host to feed visualization
                sample = {"batch": batch, "preds": np.asarray(out["preds"])}
            losses.append(out["loss"])
            # epoch mean weighted by VALID samples: a padded tail batch
            # contributes proportionally to its real size, matching the
            # reference's Lightning batch-size-weighted epoch loss
            bsz = int(batch["mask"].shape[0])
            counts.append(int(np.asarray(batch.get("valid_count", bsz))))
            cm = cm + out["confusion"]
            n += 1
        if n == 0:
            return {}, None
        result = {
            f"{prefix}_loss": float(
                np.average(np.asarray(jnp.stack(losses)), weights=counts)
            )
            if sum(counts)
            else float("nan")
        }
        iou = M.iou_from_confusion(cm)
        result[f"{prefix}_miou"] = float(jnp.nanmean(iou))
        if task_labels is not None and task.class_labels:
            per_class = M.classwise(iou, list(task.class_labels), f"{prefix}_iou")
            result.update({k: float(v) for k, v in per_class.items()})
        if prefix == "test":
            # full test report: overall accuracy + per-class F1 from the
            # same dataset-level confusion matrix (reference logs only
            # IoU; these were computed here but previously unlogged)
            result[f"{prefix}_accuracy"] = float(M.accuracy_from_confusion(cm))
            f1 = M.f1_from_confusion(cm)
            result[f"{prefix}_mf1"] = float(jnp.nanmean(f1))
            if task_labels is not None and task.class_labels:
                per_f1 = M.classwise(f1, list(task.class_labels), f"{prefix}_f1")
                result.update({k: float(v) for k, v in per_f1.items()})
        return result, sample

    # ------------------------------------------------------------------
    @host0_only
    def _log_visualizations(self, task: SegmentationTask, sample: dict, epoch: int):
        from geo_deep_learning_tpu.tools.visualization import visualize_prediction

        try:
            batch = sample["batch"]
            preds = sample["preds"]
            n = min(self.config.visualize_max_samples, len(preds))
            mean = np.asarray(batch.get("mean", [0.0]))
            std = np.asarray(batch.get("std", [1.0]))
            names = batch.get("image_name", [str(i) for i in range(n)])
            for i in range(n):
                fig = visualize_prediction(
                    np.asarray(batch["image"][i]),
                    np.asarray(batch["mask"][i]),
                    preds[i],
                    mean=mean[i] if mean.ndim > 1 else mean,
                    std=std[i] if std.ndim > 1 else std,
                    class_colors=task.class_colors,
                    num_classes=task.eval_classes,
                    sample_name=str(names[i]),
                )
                self.tracker.log_figure(fig, f"epoch{epoch:03d}_sample{i}.png")
                import matplotlib.pyplot as plt

                plt.close(fig)
        except Exception:  # viz must never kill training (reference parity)
            logger.exception("visualization failed")

    # ------------------------------------------------------------------
    def validate(self, task: SegmentationTask, datamodule) -> dict:
        datamodule.setup("validate")
        eval_step = make_eval_step(task, self.precision, mesh=self.mesh)
        metrics, _ = self._run_eval(
            task, eval_step, datamodule.val_dataloader(), prefix="val"
        )
        return metrics

    def test(
        self, task: SegmentationTask, datamodule, ckpt_path: str | None = None
    ) -> dict:
        datamodule.setup("test")
        if ckpt_path and self.state is not None:
            mgr = self.ckpt or CheckpointManager(self.config.checkpoint_dir)
            self.state = mgr.restore(ckpt_path, self.state)
        eval_step = make_eval_step(task, self.precision, mesh=self.mesh)
        metrics, _ = self._run_eval(
            task,
            eval_step,
            datamodule.test_dataloader(),
            prefix="test",
            task_labels=task,
        )
        return metrics

    def predict(self, task: SegmentationTask, loader: Iterable):
        predict_step = make_predict_step(task, self.precision, mesh=self.mesh)
        for batch in loader:
            db = shard_batch(device_batch(batch), self.mesh)
            out = predict_step(self.state, db)
            yield {
                "preds": np.asarray(out["preds"]),
                "probs": np.asarray(out["probs"]),
                "batch": batch,
            }
