"""Checkpointing via orbax — weights + scalers + optimizer state.

Replaces the reference's ``torch.save(state_dict)`` + pickled sklearn scalers
(train/train_diff_mlp.py:179-189) and adds what the reference lacks
(SURVEY §5.4): optimizer/step resume.
"""

from __future__ import annotations

import os
from typing import Any, Optional

import jax
import orbax.checkpoint as ocp


def save_checkpoint(path: str, tree: Any) -> None:
    """Save an arbitrary pytree (params / opt_state / scalers) to ``path``."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, tree, force=True)
    ckptr.wait_until_finished()


def load_checkpoint(path: str, target: Optional[Any] = None) -> Any:
    """Restore a pytree; ``target`` (matching structure of abstract arrays)
    enables exact dtype/shard restoration."""
    path = os.path.abspath(path)
    ckptr = ocp.StandardCheckpointer()
    if target is not None:
        target = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        return ckptr.restore(path, target)
    return ckptr.restore(path)


__all__ = ["save_checkpoint", "load_checkpoint"]
