"""Train state: params + BN stats + spectral-norm vectors + optimizer state.

Replaces the reference's torch Module state_dict / optimizer checkpoint dict
(/root/reference/main/utils_train.py:140-168) with an explicit pytree that
Orbax can snapshot atomically. The frozen segnet's parameters live in the same
tree but are masked out of the optimizer via ``trainable_mask`` (the TPU-native
equivalent of requires_grad=False, model.py:84-87).
"""

from __future__ import annotations

from typing import Any

import flax
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    spectral: Any
    opt_state: Any
    tx: optax.GradientTransformation = flax.struct.field(pytree_node=False)

    @classmethod
    def create(cls, variables: dict, tx: optax.GradientTransformation, trainable_mask=None):
        params = variables["params"]
        masked_tx = tx
        if trainable_mask is not None:
            masked_tx = optax.multi_transform(
                {"train": tx, "frozen": optax.set_to_zero()},
                trainable_mask,
            )
        return cls(
            step=jnp.zeros((), jnp.int32),
            params=params,
            batch_stats=variables.get("batch_stats", {}),
            spectral=variables.get("spectral", {}),
            opt_state=masked_tx.init(params),
            tx=masked_tx,
        )

    def variables(self) -> dict:
        v = {"params": self.params}
        if self.batch_stats:
            v["batch_stats"] = self.batch_stats
        if self.spectral:
            v["spectral"] = self.spectral
        return v

    def apply_gradients(self, grads, new_batch_stats=None, new_spectral=None):
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1,
            params=new_params,
            opt_state=new_opt_state,
            batch_stats=self.batch_stats if new_batch_stats is None else new_batch_stats,
            spectral=self.spectral if new_spectral is None else new_spectral,
        )


def segnet_frozen_mask(params) -> Any:
    """Label pytree: 'frozen' for the segnet subtree, 'train' elsewhere.

    Mirrors the reference freezing of the pretrained SpixelNet inside the
    colorizer (model.py:78-87).
    """

    def label(path, _):
        return "frozen" if (path and path[0].key == "segnet") else "train"

    return jax.tree_util.tree_map_with_path(label, params)
