"""MRXCAT phantom preparation CLI (replaces preprocess_mrxcat.ipynb):
  python scripts/preprocess_mrxcat.py --raw_dir <phantoms> --out_dir <prepared>
Expects per-frame files phantom_XXX_tYYY_{image,label}.nii.gz (4D phantoms must be
split into frames upstream or named accordingly).
"""
import argparse
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from acquisition_focus_tpu.data.preprocess import (  # noqa: E402
    MRXCAT_LABEL_MAP, preprocess_case, write_data_split)


def main():
    import jax
    jax.config.update('jax_platforms', 'cpu')  # offline host work; never claims the chip
    from acquisition_focus_tpu.data import native
    native.ensure_built()  # host fast path for resample_iso; JAX fallback if no compiler
    p = argparse.ArgumentParser()
    p.add_argument('--raw_dir', required=True)
    p.add_argument('--out_dir', required=True)
    p.add_argument('--test_phantoms', nargs='*', type=int, default=[],
                   help='phantom ids held out as test')
    p.add_argument('--num_folds', type=int, default=3)
    args = p.parse_args()

    raw = Path(args.raw_dir)
    images = sorted(raw.glob('phantom_*_image.nii.gz'))
    train_files, test_files = [], []
    for img_path in images:
        pid, frame = re.findall(r'phantom_(\d{3})_t(\d{3})_image', img_path.name)[0]
        lbl_path = raw / img_path.name.replace('_image', '_label')
        if not lbl_path.exists():
            continue
        stem = f'phantom_{pid}_t{frame}'
        img_name, lbl_name = preprocess_case(
            img_path, lbl_path, args.out_dir, stem, label_map=MRXCAT_LABEL_MAP)
        bucket = test_files if int(pid) in args.test_phantoms else train_files
        bucket += [img_name, lbl_name]
        print(f'prepared {stem}')
    write_data_split(args.out_dir, train_files, test_files, args.num_folds)


if __name__ == '__main__':
    main()
