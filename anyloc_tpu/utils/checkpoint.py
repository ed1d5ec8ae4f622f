"""Training checkpoint save/resume — dvgl ``util.py:22-60`` semantics
(last + best checkpoints, resume restoring model/optimizer/epoch/best-R@5)
over orbax (array-native, sharded-aware) instead of torch pickles.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import numpy as np


def _ckptr():
    import orbax.checkpoint as ocp

    return ocp.PyTreeCheckpointer()


def save_checkpoint(
    output_dir: str,
    state: Dict[str, Any],
    is_best: bool,
    filename: str = "last_checkpoint",
) -> None:
    """state: pytree dict (params/opt_state/epoch/best_r5/...). Writes
    ``<dir>/<filename>`` and copies to ``<dir>/best_checkpoint`` when
    ``is_best`` (util.py:22-26)."""
    import orbax.checkpoint as ocp

    ckptr = _ckptr()
    path = os.path.abspath(os.path.join(output_dir, filename))
    ckptr.save(path, state, force=True)
    if is_best:
        best = os.path.abspath(os.path.join(output_dir, "best_checkpoint"))
        ckptr.save(best, state, force=True)


def load_checkpoint(path: str, target: Optional[Any] = None) -> Dict[str, Any]:
    """Restore a checkpoint. With ``target`` (a pytree of jax.Arrays or
    ShapeDtypeStructs carrying ``.sharding``), each array is restored
    DIRECTLY into the target's sharding — the multi-chip resume path
    (FSDP-sharded optimizer moments, tp-split params) never materializes a
    full replicated copy per host."""
    if target is None:
        return _ckptr().restore(os.path.abspath(path))
    import orbax.checkpoint as ocp

    restore_args = ocp.checkpoint_utils.construct_restore_args(target)
    return _ckptr().restore(
        os.path.abspath(path),
        args=ocp.args.PyTreeRestore(
            item=target,
            restore_args=restore_args,
        ),
    )


def resume_train(
    output_dir: str,
    template_state: Optional[Dict[str, Any]] = None,
    filename: str = "last_checkpoint",
) -> Tuple[Dict[str, Any], int, float]:
    """-> (state, start_epoch, best_r5) (util.py:29-60 semantics)."""
    path = os.path.abspath(os.path.join(output_dir, filename))
    restored = (
        _ckptr().restore(path, item=template_state)
        if template_state is not None
        else _ckptr().restore(path)
    )
    start_epoch = int(np.asarray(restored.get("epoch", 0)))
    best_r5 = float(np.asarray(restored.get("best_r5", 0.0)))
    return restored, start_epoch, best_r5
