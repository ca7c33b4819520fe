"""Affine Transform Module (ATM): learns a constrained affine correction on top of a
clinically initialized view plane.

TPU-first re-design of the reference ATM stack
(/root/reference/acquisition_focus/models/learnable_transform.py:64-415):

* the rotation head (R6 / angle-axis / normal-vector), soft-argmax translation head and
  tanh-clipped zoom head are pure functions of the localization net output;
* all per-view modules are stacked into ONE module whose parameters carry a leading
  view axis, evaluated with ``nn.vmap`` — no Python loop over submodules, and
  per-view trainability becomes a gradient mask over that axis instead of
  requires_grad flipping (reference run_dl.py:116-123);
* 'is_optimized' bookkeeping lives in the training state, not the module.
"""

import flax.linen as nn
import jax.numpy as jnp

from acquisition_focus_tpu.models.localization import LocalizationNet
from acquisition_focus_tpu.ops.affine import compose
from acquisition_focus_tpu.ops.rotations import (
    rotation_from_angle_axis, rotation_from_normal, rotation_from_r6)

_OPTIM_METHODS = {
    'angle-axis': (3, rotation_from_angle_axis),
    'normal-vector': (3, rotation_from_normal),
    'R6-vector': (6, rotation_from_r6),
}

# Identity-rotation inits per parameterization (reference learnable_transform.py:83-93).
_INIT_AP = {
    'angle-axis': jnp.zeros(3),
    'normal-vector': jnp.zeros(3),
    'R6-vector': jnp.asarray([1e-2, 0, 0, 0, 1e-2, 0]),
}


def vox_range_for_clip(offset_clip_value, spat):
    """Width (in voxels) of the translation search window: the soft-argmax attends to
    this many positions centered in the volume (reference learnable_transform.py:112-116).
    """
    lo = ((-offset_clip_value + 1.0) * spat - 1.0) / 2.0
    hi = ((offset_clip_value + 1.0) * spat - 1.0) / 2.0
    return int(round(hi - lo))


def atm_theta_from_heads(head_out, optim_method, spat, offset_clip_value,
                         zoom_clip_value):
    """Convert localization-net outputs into the (B, 4, 4) learned view affine.

    theta = theta_t @ theta_a @ theta_z with
      theta_a: constrained rotation from the chosen parameterization,
      theta_t: soft-argmax expectation over vox_range voxel positions per axis,
      theta_z: isotropic zoom, tanh-clipped to 1 +- zoom_clip_value.

    Parity: ``AffineTransformModule.get_batch_affines`` + ``get_gs_offsets_from_theta_tp``
    (learnable_transform.py:163-230, 272).
    """
    ap_space, rot_fn = _OPTIM_METHODS[optim_method]
    vox_range = vox_range_for_clip(offset_clip_value, spat)
    B = head_out.shape[0]

    theta_ap = head_out[:, :ap_space] + _INIT_AP[optim_method][None, :]
    theta_tp = head_out[:, ap_space:-1].reshape(B, 3, vox_range)
    theta_zp = head_out[:, -1:] + 1.0  # init zoom parameter = 1

    if optim_method == 'normal-vector':
        theta_ap = theta_ap / jnp.linalg.norm(theta_ap, axis=1, keepdims=True)
    theta_a = rot_fn(theta_ap)

    positions = jnp.arange(vox_range, dtype=head_out.dtype) + (spat - vox_range) // 2
    soft_pos = (nn.softmax(theta_tp, axis=2) * positions[None, None, :]).sum(-1)
    gs_offsets = (2.0 * soft_pos + 1.0) / spat - 1.0
    if offset_clip_value == 0.0:
        gs_offsets = 0.0 * gs_offsets
    theta_t = jnp.broadcast_to(jnp.eye(4, dtype=head_out.dtype), (B, 4, 4))
    theta_t = theta_t.at[:, :3, 3].set(gs_offsets)

    zoom = zoom_clip_value * -jnp.tanh(theta_zp) + 1.0
    ones = jnp.ones_like(theta_zp)
    theta_z = jnp.stack([
        jnp.concatenate([zoom, ones * 0, ones * 0, ones * 0], -1),
        jnp.concatenate([ones * 0, zoom, ones * 0, ones * 0], -1),
        jnp.concatenate([ones * 0, ones * 0, zoom, ones * 0], -1),
        jnp.concatenate([ones * 0, ones * 0, ones * 0, ones], -1),
    ], axis=1)

    return compose(theta_t, theta_a, theta_z)


class AffineTransformModule(nn.Module):
    """One view's learnable transform: prescan volume -> constrained affine."""
    optim_method: str = 'R6-vector'
    prescan_spat: int = 128
    offset_clip_value: float = 0.2
    zoom_clip_value: float = 0.0
    dtype: jnp.dtype = jnp.float32
    locnet_width: int = 32
    pre_blocked: bool = False

    @nn.compact
    def __call__(self, x_prescan):
        """x_prescan: (B, D, H, W, C) channels-last prescan volume (or its
        space_to_depth blocking when ``pre_blocked``). -> (B, 4, 4)."""
        ap_space, _ = _OPTIM_METHODS[self.optim_method]
        vox_range = vox_range_for_clip(self.offset_clip_value, self.prescan_spat)
        head = LocalizationNet(ap_space + 3 * vox_range + 1, dtype=self.dtype,
                               width=self.locnet_width,
                               pre_blocked=self.pre_blocked)(x_prescan)
        return atm_theta_from_heads(
            head, self.optim_method, self.prescan_spat,
            self.offset_clip_value, self.zoom_clip_value)


class StackedATMs(nn.Module):
    """All views' ATMs as one module with a leading view axis on params and I/O.

    __call__: (V, B, D, H, W, C) prescan volumes -> (V, B, 4, 4) learned affines.
    """
    n_views: int
    optim_method: str = 'R6-vector'
    prescan_spat: int = 128
    offset_clip_value: float = 0.2
    zoom_clip_value: float = 0.0
    dtype: jnp.dtype = jnp.float32
    locnet_width: int = 32

    @nn.compact
    def __call__(self, x_prescans):
        vmapped = nn.vmap(
            AffineTransformModule,
            variable_axes={'params': 0},
            split_rngs={'params': True},
            in_axes=0, out_axes=0,
        )
        return vmapped(
            optim_method=self.optim_method,
            prescan_spat=self.prescan_spat,
            offset_clip_value=self.offset_clip_value,
            zoom_clip_value=self.zoom_clip_value,
            dtype=self.dtype,
            locnet_width=self.locnet_width,
            name='atms',
        )(x_prescans)


def apply_stacked_atms(stacked_params, x_prescans, *, optim_method, prescan_spat,
                       offset_clip_value, zoom_clip_value, dtype=jnp.float32,
                       remat=False, locnet_width=32, train_mask=None):
    """Apply StackedATMs params with a per-view Python loop instead of nn.vmap.

    XLA lowers the vmapped per-view conv stack to feature-group convolutions, which
    measured 3x slower than running each view's plain conv net on the batch axis
    (PERF.md). Parameter layout is identical to StackedATMs (leading view axis on
    every leaf — init/checkpoints/masking unchanged); only execution differs.

    Rematerialization: each view's chain always runs under ``jax.checkpoint``.
    With remat=False (default) the policy saves only the named bf16 'conv_out'
    activations and recomputes the cheap f32 norm/leaky elementwise in backward —
    no conv recompute, and the f32 norm intermediates (which OOM the chip if saved:
    21GB measured at the default workload) never persist. remat=True recomputes
    the full chain (max memory savings, one extra conv forward per view).

    Frozen views: ``train_mask`` (static bool sequence, one per view) marks which
    views' localization nets receive gradients this stage. Unmasked ("frozen")
    views run under ``stop_gradient`` on both params and output, so NO backward
    chain is traced for them at all. This matters because the runner's
    per-view gradient mask (train.py ``view_train_mask``) only zeroes cotangents
    at runtime — the XLA trace still contains every frozen view's full locnet
    backward (device trace: one 512->512 wgrad per view, trainable or not). In
    'opt-current-fix-previous' stages (the reference's standard sweep mode,
    run_dl.py:284-289) all but ONE view are frozen, so structural elimination
    removes (V-1)/V of the locnet backward. Values and gradients are identical:
    frozen views' grads were exact zeros before; now they are never computed.

    Args: stacked_params as produced by StackedATMs.init; x_prescans (V, B, D, H, W, C).
    Returns: (V, B, 4, 4).
    """
    import jax
    from acquisition_focus_tpu.models.localization import space_to_depth

    # Hoist the space_to_depth blocking of the (no-grad) locnet input out of the
    # per-view checkpoint: the blocking is a pure relayout copy (~4.8 ms per
    # view at 128^3x6ch, device trace) that the remat policy would otherwise
    # recompute in every view's backward. Blocked here, the saved residual IS
    # the blocked tensor (same bytes) and backward recompute starts at Conv_0.
    pre_blocked = all(s % 2 == 0 for s in x_prescans.shape[2:5])
    if pre_blocked:
        V_, B_ = x_prescans.shape[:2]
        flat = space_to_depth(
            x_prescans.reshape((V_ * B_,) + x_prescans.shape[2:]))
        x_prescans = flat.reshape((V_, B_) + flat.shape[1:])

    module = AffineTransformModule(
        optim_method=optim_method, prescan_spat=prescan_spat,
        offset_clip_value=offset_clip_value, zoom_clip_value=zoom_clip_value,
        dtype=dtype, locnet_width=locnet_width, pre_blocked=pre_blocked)
    V = x_prescans.shape[0]
    inner = stacked_params['params']['atms']

    def run_view(view_params, x):
        return module.apply({'params': view_params}, x)

    if remat:
        run_view = jax.checkpoint(run_view)
    else:
        run_view = jax.checkpoint(
            run_view,
            policy=jax.checkpoint_policies.save_only_these_names('conv_out'))

    thetas = []
    for v in range(V):
        view_params = jax.tree_util.tree_map(lambda p: p[v], inner)
        if train_mask is not None and not bool(train_mask[v]):
            theta = jax.lax.stop_gradient(run_view(
                jax.lax.stop_gradient(view_params), x_prescans[v]))
        else:
            theta = run_view(view_params, x_prescans[v])
        thetas.append(theta)
    return jnp.stack(thetas)
