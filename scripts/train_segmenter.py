"""Train the frozen prescan segmenter (2D U-Net + GIN augmentation).

Replaces the reference's external nnU-Net training with GIN trainers
(/root/reference/acquisition_focus/models/segmentation/nnUNetTrainer_GIN*.py): the
2D slices of a prepared dataset's volumes are the training set; GIN random intensity
transforms + discrete low-resolution simulation provide domain generalization; the
result is an orbax checkpoint served by ``engine.segmenter.make_segment_fn``.

Usage:
  python scripts/train_segmenter.py --data_dir <prepared files> --out <ckpt dir>
      [--epochs 50] [--dataset mmwhs] [--multires]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import numpy as np  # noqa: E402


def sample_slices(dataset, rng, batch, slice_axis=0):
    """Random (image, label) 2D slices from random cases, biased to foreground."""
    ids = dataset.get_3d_ids()
    imgs, lbls = [], []
    while len(imgs) < batch:
        case = dataset.cases[ids[rng.integers(len(ids))]]
        img, lbl = case['image'], case['label']
        d = rng.integers(img.shape[slice_axis])
        lbl_slc = np.take(lbl, d, axis=slice_axis)
        if lbl_slc.sum() == 0 and rng.random() < 0.7:
            continue  # foreground oversampling
        imgs.append(np.take(img, d, axis=slice_axis))
        lbls.append(lbl_slc)
    return np.stack(imgs)[..., None], np.stack(lbls)


def simulate_lowres(key, x, zoom_options=(1.0, 1.0 / 2, 1.0 / 4, 1.0 / 6)):
    """Discrete random downsample+upsample per sample (reference
    discrete_downsampling.py:7-71 / nnUNetTrainer_GIN_MultiRes.py:56-70)."""
    import jax
    import jax.numpy as jnp
    B, H, W, C = x.shape

    def one(k, img):
        zoom = jax.random.choice(k, jnp.asarray(zoom_options))
        # static branch per zoom option via switch
        def make_branch(z):
            h, w = max(1, int(H * z)), max(1, int(W * z))

            def br(im):
                lo = jax.image.resize(im, (h, w, C), 'linear')
                return jax.image.resize(lo, (H, W, C), 'nearest')
            return br
        idx = jnp.argmin(jnp.abs(jnp.asarray(zoom_options) - zoom))
        return jax.lax.switch(idx, [make_branch(z) for z in zoom_options], img)

    return jax.vmap(one)(jax.random.split(key, B), x)


def main():
    import jax
    import jax.numpy as jnp
    import optax
    from acquisition_focus_tpu.data.cache import load_or_build
    from acquisition_focus_tpu.data.mrxcat import get_dataset_class
    from acquisition_focus_tpu.engine.checkpoint import save_checkpoint
    from acquisition_focus_tpu.engine.config import load_config
    from acquisition_focus_tpu.engine.losses import dice_ce_loss
    from acquisition_focus_tpu.models.segmentation.gin import gin_aug
    from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D

    p = argparse.ArgumentParser()
    p.add_argument('--data_dir', required=True)
    p.add_argument('--out', required=True)
    p.add_argument('--dataset', default='mmwhs')
    p.add_argument('--epochs', type=int, default=50)
    p.add_argument('--steps_per_epoch', type=int, default=50)
    p.add_argument('--batch', type=int, default=8)
    p.add_argument('--lr', type=float, default=1e-3)
    p.add_argument('--multires', action='store_true',
                   help='add discrete low-res simulation (GIN_MultiRes)')
    p.add_argument('--seed', type=int, default=0)
    p.add_argument('--spat', type=int, default=None,
                   help='override hires/prescan FOV to spat voxels @ 1.5 mm '
                        '(use the smoke configs\' 32 to train at smoke scale)')
    args = p.parse_args()

    overrides = {'dataset': [args.dataset, args.data_dir]}
    if args.spat:
        fov = args.spat * 1.5
        overrides.update(
            hires_fov_mm=[fov] * 3, hires_fov_vox=[args.spat] * 3,
            prescan_fov_mm=[fov] * 3, prescan_fov_vox=[args.spat] * 3,
            slice_fov_mm=[fov, fov, 1.5], slice_fov_vox=[args.spat, args.spat, 1])
    config = load_config(overrides=overrides)
    ds = load_or_build(get_dataset_class(args.dataset), args.data_dir, config,
                       state='train')
    num_classes = len(ds.label_tags)
    print(f"training segmenter on {len(ds)} cases, {num_classes} classes")

    model = SegUnet2D(num_classes=num_classes)
    rng = np.random.default_rng(args.seed)
    x0, _ = sample_slices(ds, rng, 2)
    params = model.init(jax.random.key(args.seed), jnp.asarray(x0))
    opt = optax.adamw(args.lr, weight_decay=1e-5)
    opt_state = opt.init(params)

    @jax.jit
    def train_step(params, opt_state, x, y, key):
        k_gin, k_lo = jax.random.split(key)
        x = gin_aug(k_gin, x)
        if args.multires:
            x = simulate_lowres(k_lo, x)

        def loss_fn(p):
            logits = model.apply(p, x)
            onehot = jax.nn.one_hot(y, num_classes, dtype=jnp.float32)
            return dice_ce_loss(jnp.transpose(logits, (0, 3, 1, 2)),
                                jnp.transpose(onehot, (0, 3, 1, 2)))

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    step_id = 0
    for epoch in range(args.epochs):
        losses = []
        for _ in range(args.steps_per_epoch):
            x, y = sample_slices(ds, rng, args.batch)
            params, opt_state, loss = train_step(
                params, opt_state, jnp.asarray(x), jnp.asarray(y),
                jax.random.fold_in(jax.random.key(args.seed + 1), step_id))
            losses.append(float(loss))
            step_id += 1
        print(f"epoch {epoch}: loss {np.mean(losses):.4f}")

    save_checkpoint(args.out, {'params': params, 'num_classes': num_classes})
    print(f"saved segmenter checkpoint to {args.out}")


if __name__ == '__main__':
    main()
