"""Checkpointing: one orbax pytree per save (params, optimizer states, stage
bookkeeping, epoch/loss metadata) with the reference's best-val policy and stage
chaining (reference torch_utils.py:112-120, run_dl.py:692-730 — there one .pth per
stateful; here a single atomic pytree directory).
"""

from pathlib import Path

import orbax.checkpoint as ocp


def save_checkpoint(path, state):
    """Atomically save a pytree checkpoint to ``path`` (directory)."""
    path = Path(path).resolve()
    path.parent.mkdir(parents=True, exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, state, force=True)


def load_checkpoint(path, item=None):
    """Load a pytree checkpoint; ``item`` optionally provides the reference
    structure (with shapes/dtypes) for restoration.

    Arrays are restored as host numpy arrays: a checkpoint written from a TPU
    process carries device shardings orbax cannot re-materialize in a CPU-only
    process (restore raises "sharding ... Got None"); numpy restore is
    device-agnostic and the consumers jnp.asarray as needed."""
    path = Path(path).resolve()
    import numpy as np
    with ocp.PyTreeCheckpointer() as ckptr:
        if item is not None:
            return ckptr.restore(path, item=item)
        try:
            import jax
            meta = ckptr.metadata(path).item_metadata.tree
            restore_args = jax.tree_util.tree_map(
                lambda _: ocp.RestoreArgs(restore_type=np.ndarray), meta)
            return ckptr.restore(
                path, args=ocp.args.PyTreeRestore(restore_args=restore_args))
        except Exception:
            return ckptr.restore(path)


def checkpoint_exists(path):
    return Path(path).is_dir() and any(Path(path).iterdir())
