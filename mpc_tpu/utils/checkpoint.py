"""Checkpoint / resume for long batched runs (orbax).

The reference has NO checkpointing (SURVEY.md §5: the only state carried
across steps is the warm start).  For pod-scale batch runs this module
snapshots the closed-loop carry (plant states, warm-start solver state, PRNG
keys, step index) so a preempted run resumes exactly.

Sharding-aware: sharded ``jax.Array``s are handed to orbax's
``StandardCheckpointer`` as-is — each host writes its own shards (no
device_get funnel through one host) — and ``restore_checkpoint`` restores
them with the shardings of the ``like`` pytree, so a resumed run starts
already distributed.
"""
from __future__ import annotations

import os
from typing import Any, Optional

import jax
import numpy as np

try:
    import orbax.checkpoint as ocp
    _HAVE_ORBAX = True
except Exception:  # pragma: no cover - orbax is in the image, but be safe
    _HAVE_ORBAX = False


def save_checkpoint(path: str, state: Any, step: int) -> str:
    """Snapshot a pytree (e.g. batched SqpState + plant states) at ``step``.

    Sharded arrays are saved distributed (orbax handles per-shard IO); no
    host gather happens on this path.
    """
    path = os.path.abspath(path)
    if _HAVE_ORBAX:
        ckptr = ocp.StandardCheckpointer()
        target = os.path.join(path, f"step_{step:08d}")
        ckptr.save(target, state, force=True)
        ckptr.wait_until_finished()
        return target
    # numpy fallback
    os.makedirs(path, exist_ok=True)
    leaves, treedef = jax.tree.flatten(jax.device_get(state))
    target = os.path.join(path, f"step_{step:08d}.npz")
    np.savez(target, n=len(leaves),
             **{f"leaf_{i}": np.asarray(l) for i, l in enumerate(leaves)})
    return target


def latest_step(path: str) -> Optional[int]:
    if not os.path.isdir(path):
        return None
    steps = []
    for name in os.listdir(path):
        if name.startswith("step_"):
            steps.append(int(name.split("_")[1].split(".")[0]))
    return max(steps) if steps else None


def _abstract_like(like: Any):
    """Abstract restore target carrying shape/dtype AND sharding."""
    def one(x):
        if isinstance(x, jax.Array):
            return jax.ShapeDtypeStruct(x.shape, x.dtype,
                                        sharding=x.sharding)
        return x
    return jax.tree.map(one, like)


def restore_checkpoint(path: str, like: Any, step: Optional[int] = None
                       ) -> Any:
    """Restore a pytree with the structure/shapes/SHARDINGS of ``like``."""
    if step is None:
        step = latest_step(path)
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {path}")
    if _HAVE_ORBAX:
        target = os.path.join(os.path.abspath(path), f"step_{step:08d}")
        if os.path.isdir(target):
            ckptr = ocp.StandardCheckpointer()
            return ckptr.restore(target, _abstract_like(like))
    target = os.path.join(path, f"step_{step:08d}.npz")
    data = np.load(target)
    leaves, treedef = jax.tree.flatten(like)
    new_leaves = [data[f"leaf_{i}"] for i in range(len(leaves))]
    return jax.tree.unflatten(treedef, new_leaves)
