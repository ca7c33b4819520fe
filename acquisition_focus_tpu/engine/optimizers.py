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
