"""Optimizers and LR schedules for the reconstruction and transform models.

Parity targets (/root/reference/acquisition_focus/running/run_dl.py:80-81,129-130):
  reconstruction: AdamW(lr), ExponentialLR(gamma=0.995) stepped per epoch;
  transform:      AdamW(lr*2, weight_decay=0.1),
                  CosineAnnealingWarmRestarts(T_0=epochs//4+1, T_mult=1) per epoch.

Schedules are expressed over the optimizer *update* count; callers provide
updates_per_epoch so the per-epoch stepping of the reference maps onto steps.
"""

import jax.numpy as jnp
import optax


def exponential_epoch_schedule(base_lr, gamma, updates_per_epoch):
    def schedule(count):
        epoch = count // max(1, updates_per_epoch)
        return base_lr * (gamma ** epoch.astype(jnp.float32)
                          if hasattr(epoch, 'astype') else gamma ** epoch)
    return schedule


def cosine_warm_restarts_epoch_schedule(base_lr, t_0, updates_per_epoch, eta_min=0.0):
    def schedule(count):
        epoch = count // max(1, updates_per_epoch)
        t_cur = epoch % t_0
        cos = jnp.cos(jnp.pi * t_cur / t_0)
        return eta_min + (base_lr - eta_min) * (1 + cos) / 2
    return schedule


def make_reconstruction_optimizer(lr, updates_per_epoch, use_scheduling=True):
    sched = (exponential_epoch_schedule(lr, 0.995, updates_per_epoch)
             if use_scheduling else lr)
    return optax.adamw(sched, weight_decay=0.01)  # torch AdamW default decay


def make_transform_optimizer(lr, epochs, updates_per_epoch, use_scheduling=True):
    t_0 = int(epochs / 4) + 1
    sched = (cosine_warm_restarts_epoch_schedule(2.0 * lr, t_0, updates_per_epoch)
             if use_scheduling else 2.0 * lr)
    return optax.adamw(sched, weight_decay=0.1)


def make_epix2vox_optimizer(updates_per_epoch, use_scheduling=True):
    """(E)Pix2Vox baseline optimizer: Adam with per-submodule learning rates
    (encoder/decoder/refiner 1e-3, merger 1e-4) and MultiStepLR(milestones=[150],
    gamma=0.5) per epoch (reference epix2vox.py:33-59)."""
    import jax.numpy as jnp

    def sched(base_lr):
        if not use_scheduling:
            return base_lr

        def fn(count):
            epoch = count // max(1, updates_per_epoch)
            return base_lr * jnp.where(epoch >= 150, 0.5, 1.0)
        return fn

    def label_fn(params):
        import jax
        top = {'merger': 'merger'}

        def leaf_label(path, _):
            name = path[0].key if hasattr(path[0], 'key') else str(path[0])
            # params structure: {'params': {'encoder': ..., 'merger': ...}}
            if name == 'params' and len(path) > 1:
                name = path[1].key if hasattr(path[1], 'key') else str(path[1])
            return top.get(name, 'main')

        return jax.tree_util.tree_map_with_path(leaf_label, params)

    return optax.multi_transform(
        {'main': optax.adam(sched(1e-3), b1=0.9, b2=0.999),
         'merger': optax.adam(sched(1e-4), b1=0.9, b2=0.999)},
        label_fn)
