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


def fold_spectral_variables(variables: dict) -> dict:
    """Fold spectral-norm sigma into the kernels (inference-ready weights).

    Computes sigma exactly as models/layers.py::SNConv does from the persisted
    power-iteration vector ``u``, divides each kernel by it, and drops the
    ``spectral`` collection — the same transform the torch converter applies
    with sn_folded=True, but applied to this framework's own training
    checkpoints so they load into the inference model (built with
    sn_folded=True) without conversion.
    """
    spectral = variables.get("spectral")
    out = {k: v for k, v in variables.items() if k != "spectral"}
    if not spectral:
        return out
    # tree_map rebuilds every container, so in-place edits below are safe
    params = jax.tree_util.tree_map(lambda x: x, out["params"])

    def fold(p_sub, s_sub):
        for key, val in s_sub.items():
            if key == "u":
                kernel = np.asarray(p_sub["kernel"])
                w_mat = kernel.reshape(-1, kernel.shape[-1]).T  # (O, HWI)
                u = np.asarray(val)
                v = w_mat.T @ u
                v = v / (np.linalg.norm(v) + 1e-12)
                u_new = w_mat @ v
                u_new = u_new / (np.linalg.norm(u_new) + 1e-12)
                sigma = float(u_new @ (w_mat @ v))
                p_sub["kernel"] = kernel / sigma
            else:
                fold(p_sub[key], val)

    fold(params, spectral)
    out["params"] = params
    return out


def load_train_variables(path: str, fold_spectral: bool = True) -> dict:
    """Model variables from an Orbax snapshot written by the trainers.

    Accepts the snapshot directory itself (``.../checkpts/model_last``) or a
    directory containing ``model_best``/``model_last`` (a run's ``checkpts``
    dir or the run dir); prefers ``model_best``. The snapshot holds a full
    TrainState (params + BN stats + spectral vectors + optimizer state); this
    restores template-free and returns just the inference variables, so the
    stage-2 trainer can consume stage-1's native checkpoint directly
    (reference: load_and_froze_weight on its own .pth.tar, model.py:78-87) and
    the inference CLI can load a trainer run without conversion.
    """
    path = os.path.abspath(path)
    for sub in ("checkpts",):
        if os.path.isdir(os.path.join(path, sub)):
            path = os.path.join(path, sub)
    for tag in ("model_best", "model_last"):
        if os.path.isdir(os.path.join(path, tag)):
            path = os.path.join(path, tag)
            break
    payload = ocp.StandardCheckpointer().restore(path)
    state = payload.get("state", payload)
    if not isinstance(state, dict) or "params" not in state:
        raise ValueError(f"no 'params' tree in checkpoint at {path}")
    variables = {"params": state["params"]}
    for coll in ("batch_stats", "spectral"):
        if state.get(coll):
            variables[coll] = state[coll]
    return fold_spectral_variables(variables) if fold_spectral else variables


def restore_with_clip_migration(mgr: CheckpointManager, tag: str, state, make_alt_state, logger=None):
    """Restore ``tag`` into ``state``; migrate across a --grad_clip change.

    Orbax restores strictly by pytree structure, and toggling --grad_clip
    between a save and a resume changes the optimizer wrapper structure
    (optim.py::build_optimizer) — which made the NaN-abort's own advice
    ("resume from the last finite checkpoint with --grad_clip > 0")
    impossible to follow. On a structure mismatch this retries with the
    alternate-structure template from ``make_alt_state()`` (the same
    TrainState built with the opposite clip setting) and grafts the restored
    optimizer moments into the requested structure
    (optim.py::adapt_opt_state). Adam moments/counts survive bit-intact;
    only the clip wrapper's bookkeeping starts fresh.
    """
    from .optim import adapt_opt_state

    try:
        return mgr.restore(tag, state)
    except ValueError:
        alt = make_alt_state()
        restored, epoch, best = mgr.restore(tag, alt)
        migrated = restored.replace(
            opt_state=adapt_opt_state(state.opt_state, restored.opt_state), tx=state.tx
        )
        if logger is not None:
            logger.info("optimizer state migrated across a --grad_clip change")
        return migrated, epoch, best
