"""Checkpoint / resume for inverse-rendering optimization.

The reference is a single-shot CLI with no checkpointing (SURVEY.md §5);
this is the north-star addition for the training loop: optimizer state +
scene parameters + step counter, saved via orbax (multi-host safe) with a
plain-numpy fallback.
"""

from __future__ import annotations

import os
import pathlib
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp

    _HAVE_ORBAX = True
except Exception:  # pragma: no cover
    _HAVE_ORBAX = False


def save_checkpoint(path: str, params: Dict, opt_state: Any, step: int) -> None:
    """Persist (params, opt_state, step) to `path` (a directory)."""
    path = os.path.abspath(path)
    state = {"params": params, "opt_state": opt_state, "step": step}
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        ckptr.save(pathlib.Path(path) / f"step_{step}", state, force=True)
        ckptr.wait_until_finished()
        return
    # numpy fallback: flatten with stable paths
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(state)
    np.savez(
        os.path.join(path, f"step_{step}.npz"),
        *[np.asarray(l) for l in leaves],
        __treedef__=str(treedef),
    )


def latest_step(path: str) -> Optional[int]:
    """Newest checkpoint step under `path`, or None."""
    p = pathlib.Path(path)
    if not p.exists():
        return None
    steps = []
    for child in p.iterdir():
        name = child.name
        if name.startswith("step_"):
            try:
                steps.append(int(name[5:].split(".")[0]))
            except ValueError:
                pass
    return max(steps) if steps else None


def restore_checkpoint(
    path: str, like_params: Dict, like_opt_state: Any, step: Optional[int] = None
) -> Optional[Tuple[Dict, Any, int]]:
    """Restore (params, opt_state, step); None when no checkpoint exists.
    `like_*` provide the pytree structure/shapes to restore into."""
    if step is None:
        step = latest_step(path)
    if step is None:
        return None
    target = {"params": like_params, "opt_state": like_opt_state, "step": step}
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        abstract = jax.tree.map(ocp.utils.to_shape_dtype_struct, target)
        state = ckptr.restore(
            pathlib.Path(os.path.abspath(path)) / f"step_{step}", abstract
        )
        return state["params"], state["opt_state"], int(state["step"])
    data = np.load(os.path.join(path, f"step_{step}.npz"), allow_pickle=False)
    leaves = [data[k] for k in data.files if k != "__treedef__"]
    _, treedef = jax.tree.flatten(target)
    state = jax.tree.unflatten(treedef, leaves)
    return state["params"], state["opt_state"], int(state["step"])
