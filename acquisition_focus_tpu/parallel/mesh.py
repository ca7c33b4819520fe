"""Device mesh construction and sharding rules.

The reference is strictly single-GPU (SURVEY.md §2: no distributed backend at all);
multi-chip execution is a new first-class capability here. The parallelization axes
native to this workload:

* ``data``  — batch (and grad-accum microbatch) dimension: pure data parallelism,
  gradients all-reduced by XLA from the jitted update.
* ``model`` — feature tensor parallelism on the reconstruction U-Net: conv kernels
  and norm scales split along their output-feature (last) axis (``shard_params``),
  so each chip computes a feature slice of every conv and XLA inserts the
  all-gathers/reduce-scatters over ICI at the layer boundaries it chooses. The ATM
  params stay replicated — their vmapped per-view heads end in 1-channel outputs
  that cannot split. (The per-view work itself is embarrassingly parallel, but the
  views are folded into the batch axis inside the step, so view parallelism is
  already what the ``data`` axis delivers; see tests/test_parallel.py for the
  TP==DP equivalence check.)

Shardings are expressed as NamedSharding constraints on inputs and params; XLA's
SPMD partitioner inserts the collectives.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape=None, devices=None):
    """mesh_shape: dict axis->size, e.g. {'data': 4, 'model': 2}; None -> None."""
    if not mesh_shape:
        return None
    devices = devices if devices is not None else jax.devices()
    sizes = tuple(mesh_shape.values())
    n = int(np.prod(sizes))
    assert len(devices) >= n, f"need {n} devices, have {len(devices)}"
    dev_array = np.asarray(devices[:n]).reshape(sizes)
    return Mesh(dev_array, tuple(mesh_shape.keys()))


def batch_shardings(mesh, train=True):
    """PartitionSpecs for the batch dict. Train batches carry a leading
    (accum, B, ...) pair — B is the data axis; view_affines carry (accum, V, B, ...).
    On a model-only mesh (no 'data' axis) batches are replicated."""
    if mesh is None:
        return None
    d_axis = 'data' if 'data' in mesh.axis_names else None
    v_axis = None  # view affines follow the (replicated) ATM params
    if train:
        return {
            'label': P(None, d_axis),
            'image': P(None, d_axis),
            'nii_affine': P(None, d_axis),
            'view_affines': P(None, v_axis, d_axis),
            # cached per-sample thetas (theta-refresh cadence): (accum, A, B, 4, 4)
            'thetas': P(None, v_axis, d_axis),
        }
    return {
        'label': P(d_axis),
        'image': P(d_axis),
        'nii_affine': P(d_axis),
        'view_affines': P(v_axis, d_axis),
        'thetas': P(v_axis, d_axis),
    }


def shard_batch(batch, mesh, train=True):
    if mesh is None:
        return batch
    specs = batch_shardings(mesh, train)
    return {
        k: jax.device_put(v, NamedSharding(mesh, specs[k])) for k, v in batch.items()
    }


def replicate(tree, mesh):
    if mesh is None:
        return tree
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def _feature_shard_leaf(mesh, model_size):
    def shard_leaf(x):
        if getattr(x, 'ndim', 0) >= 1 and x.shape[-1] % model_size == 0 \
                and x.shape[-1] > 1:
            spec = P(*([None] * (x.ndim - 1) + ['model']))
            return jax.device_put(x, NamedSharding(mesh, spec))
        return jax.device_put(x, NamedSharding(mesh, P()))
    return shard_leaf


def shard_params(unet_params, atm_params, mesh):
    """Tensor-parallel sharding of the reconstruction net over the 'model' axis:
    conv kernels and affine norms split along their output-feature (last) dimension;
    XLA's SPMD partitioner inserts the matching all-gathers/reduce-scatters over ICI.
    ATM params stay replicated (their vmapped per-view 1-channel head cannot split).
    """
    if mesh is None:
        return unet_params, atm_params
    atm_params = replicate(atm_params, mesh)
    if 'model' not in mesh.axis_names:
        return replicate(unet_params, mesh), atm_params

    shard_leaf = _feature_shard_leaf(mesh, mesh.shape['model'])
    unet_params = jax.tree_util.tree_map(shard_leaf, unet_params)
    return unet_params, atm_params


def shard_opt_state(opt_state, mesh):
    """Shard an optimizer state co-located with feature-sharded params: Adam's
    mu/nu mirror the param shapes, so the same last-dim rule applies leaf-wise
    (scalar counts and schedule states stay replicated). Without this the Adam
    state — 2x the param bytes — is fully replicated on every chip and dominates
    per-chip argument memory (measured 430/505 MB at reference widths)."""
    if mesh is None:
        return opt_state
    if 'model' not in mesh.axis_names:
        return replicate(opt_state, mesh)
    shard_leaf = _feature_shard_leaf(mesh, mesh.shape['model'])
    return jax.tree_util.tree_map(shard_leaf, opt_state)
