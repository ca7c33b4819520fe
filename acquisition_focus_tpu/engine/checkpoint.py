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
    structure (with shapes/dtypes) for restoration."""
    path = Path(path).resolve()
    with ocp.PyTreeCheckpointer() as ckptr:
        if item is not None:
            return ckptr.restore(path, item=item)
        return ckptr.restore(path)


def checkpoint_exists(path):
    return Path(path).is_dir() and any(Path(path).iterdir())
