"""Checkpoint save/restore via Orbax, with last/best semantics and resume.

Capability parity with /root/reference/main/utils_train.py:140-168
(save_checkpoint/load_checkpoint: {'epoch','state_dict','best_loss','optimizer'}
-> model_last/model_best) re-designed on orbax.checkpoint: atomic on-disk
snapshots of the whole TrainState pytree plus metadata; deterministic resume
restores params, optimizer state, BN stats, spectral vectors, and epoch.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def _to_numpy(tree):
    return jax.tree_util.tree_map(np.asarray, tree)


class CheckpointManager:
    """last/best checkpoints under ``ckpt_dir`` (model_last/, model_best/)."""

    def __init__(self, ckpt_dir: str):
        self.ckpt_dir = os.path.abspath(ckpt_dir)
        os.makedirs(self.ckpt_dir, exist_ok=True)
        self._ckpt = ocp.StandardCheckpointer()

    def _path(self, tag: str) -> str:
        return os.path.join(self.ckpt_dir, f"model_{tag}")

    def save(self, tag: str, state_tree: Any, epoch: int, best_loss: float):
        payload = {
            "state": _to_numpy(state_tree),
            "meta": {"epoch": np.asarray(epoch, np.int64), "best_loss": np.asarray(best_loss, np.float64)},
        }
        path = self._path(tag)
        self._ckpt.save(path, payload, force=True)
        self._ckpt.wait_until_finished()

    def restore(self, tag: str, target_tree: Any):
        """Restore into the structure of ``target_tree``; returns (state, epoch, best_loss)."""
        path = self._path(tag)
        if not os.path.exists(path):
            raise FileNotFoundError(path)
        template = {
            "state": _to_numpy(target_tree),
            "meta": {"epoch": np.asarray(0, np.int64), "best_loss": np.asarray(1e9, np.float64)},
        }
        payload = self._ckpt.restore(path, template)
        return payload["state"], int(payload["meta"]["epoch"]), float(payload["meta"]["best_loss"])

    def exists(self, tag: str) -> bool:
        return os.path.exists(self._path(tag))
