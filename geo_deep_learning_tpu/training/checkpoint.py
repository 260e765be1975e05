"""Checkpointing: Orbax-backed save/restore + partial warm-start loading.

Reference capabilities covered (SURVEY.md §5 checkpoint/resume):

- best-by-monitor retention, ``save_top_k=1`` semantics
  (reference Lightning ``ModelCheckpoint``, configs/dofa_config_RGB.yaml:28-33)
- resume from a checkpoint path (``ckpt_path`` config key)
- warm start: load weights only, optionally filtered by PyTree prefix
  (reference ``load_weights_from_checkpoint`` + ``load_parts``,
  utils/models.py:10-66)
"""

from __future__ import annotations

import json
import logging
import shutil
from pathlib import Path
from typing import Any

import jax
import orbax.checkpoint as ocp

logger = logging.getLogger(__name__)


class CheckpointManager:
    """Save/restore train state; keep the best checkpoint by a monitor."""

    def __init__(
        self,
        directory: str | Path,
        monitor: str = "val_loss",
        mode: str = "min",
        save_top_k: int = 1,
    ) -> None:
        self.directory = Path(directory).absolute()
        self.directory.mkdir(parents=True, exist_ok=True)
        self.monitor = monitor
        self.mode = mode
        self.save_top_k = save_top_k
        self.best_score: float | None = None
        self.best_path: Path | None = None
        self._checkpointer = ocp.StandardCheckpointer()
        self._load_index()

    # -- index persistence so resume knows the best score -------------
    def _index_file(self) -> Path:
        return self.directory / "index.json"

    def _load_index(self) -> None:
        if self._index_file().exists():
            idx = json.loads(self._index_file().read_text())
            self.best_score = idx.get("best_score")
            best = idx.get("best_path")
            self.best_path = Path(best) if best else None

    def _save_index(self) -> None:
        self._index_file().write_text(
            json.dumps(
                {
                    "best_score": self.best_score,
                    "best_path": str(self.best_path) if self.best_path else None,
                    "monitor": self.monitor,
                }
            )
        )

    def reset_best(self) -> None:
        """Forget a previous run's best (fresh fit into a reused dir —
        its checkpoint may have an incompatible optimizer-state tree)."""
        self.best_score = None
        self.best_path = None
        self._save_index()

    def _is_better(self, score: float) -> bool:
        if self.best_score is None:
            return True
        return score < self.best_score if self.mode == "min" else score > self.best_score

    def save(
        self, state: Any, epoch: int, metrics: dict[str, float]
    ) -> tuple[bool, Path | None]:
        """Save if the monitored metric improved; returns (improved, path)."""
        score = float(metrics[self.monitor])
        if not self._is_better(score):
            return False, None
        prev = self.best_path
        name = f"model-epoch={epoch:02d}-{self.monitor}={score:.3f}"
        path = self.directory / name
        # orbax requires a fresh directory
        if path.exists():
            shutil.rmtree(path)
        self._checkpointer.save(path, self._saveable(state))
        self._checkpointer.wait_until_finished()
        self.best_score = score
        self.best_path = path
        if prev is not None and prev.exists() and self.save_top_k == 1:
            shutil.rmtree(prev, ignore_errors=True)
        self._save_index()
        logger.info("saved checkpoint %s", path)
        return True, path

    def save_last(self, state: Any) -> Path:
        """Unconditional 'last' checkpoint for resume."""
        path = self.directory / "last"
        if path.exists():
            shutil.rmtree(path)
        self._checkpointer.save(path, self._saveable(state))
        self._checkpointer.wait_until_finished()
        return path

    @staticmethod
    def _saveable(state: Any) -> dict:
        """Strip non-array fields (apply_fn/tx) into a plain PyTree."""
        return {
            "step": state.step,
            "params": state.params,
            "opt_state": state.opt_state,
            "batch_stats": state.batch_stats,
            "rng": state.rng,
        }

    def restore(self, path: str | Path, state: Any) -> Any:
        """Restore a full train state (resume)."""
        target = self._saveable(state)
        restored = self._checkpointer.restore(Path(path).absolute(), target)
        return state.replace(**restored)


def load_weights_from_checkpoint(
    checkpoint_path: str | Path,
    params: Any,
    load_parts: list[str] | str | None = None,
    batch_stats: Any = None,
) -> tuple[Any, Any]:
    """Warm-start parameters from a saved checkpoint.

    Reference equivalent: ``utils/models.py:10-66`` — full load, or
    selective load of subtrees whose top-level path starts with any
    ``load_parts`` prefix (e.g. ``["encoder"]``), reporting what was
    skipped. Returns (params, batch_stats).
    """
    if isinstance(load_parts, str):
        load_parts = [load_parts]
    path = Path(checkpoint_path).absolute()
    if not path.exists():
        msg = f"checkpoint not found: {path}"
        raise FileNotFoundError(msg)
    checkpointer = ocp.StandardCheckpointer()
    target = {"params": params}
    if batch_stats is not None:
        target["batch_stats"] = batch_stats
    # restore into abstract target shapes; tolerate extra keys in ckpt
    restored = checkpointer.restore(
        path, ocp.args.StandardRestore(target, strict=False)
    )

    if not load_parts:
        return restored["params"], restored.get("batch_stats", batch_stats)

    def merge(old, new, prefix=""):
        if isinstance(old, dict):
            return {
                k: merge(old[k], new.get(k, old[k]), f"{prefix}{k}/")
                for k in old
            }
        take = any(prefix.startswith(p) or p in prefix for p in load_parts)
        return new if take else old

    merged_params = merge(params, restored["params"])
    merged_stats = batch_stats
    if batch_stats is not None and "batch_stats" in restored:
        merged_stats = merge(batch_stats, restored["batch_stats"])
    loaded = [p for p in load_parts]
    logger.info("warm-started parts %s from %s", loaded, path)
    return merged_params, merged_stats
