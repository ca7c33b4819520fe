"""MRXCAT phantom dataset (same label vocabulary as MMWHS; fold splits group by
phantom + time frame through the 8-char 3d-id prefix).

Parity: /root/reference/acquisition_focus/datasets/mrxcat_dataset.py:11-48.
"""

import re
from pathlib import Path

from acquisition_focus_tpu.data.base_dataset import BaseDataset


class MRXCATDataset(BaseDataset):
    @staticmethod
    def get_file_id(file_path):
        name = Path(file_path).name
        patient_id, frame_idx, type_str = re.findall(
            r'phantom_(\d{3})_t(\d{3})_(.*?).nii.gz', name)[0]
        mrxcat_id = f"{int(patient_id):03d}_t{int(frame_idx):03d}"
        return mrxcat_id, (type_str == 'label')

    def extract_3d_id(self, file_id):
        return file_id[:8]

    def set_segment_fn(self, fold_idx):
        from acquisition_focus_tpu.engine.segmenter import make_segment_fn
        self.segment_fn = make_segment_fn(
            self.config.get('segment_model_path'), fold_idx,
            num_classes=6, extra_permute=False)


def get_dataset_class(name):
    from acquisition_focus_tpu.data.mmwhs import MMWHSDataset
    # 'synthetic' resolves to MMWHSDataset because the phantom writer
    # (data/synthetic.py: write_phantom_dataset) emits MMWHS-style file names
    # and split JSON on purpose — the synthetic set is an MMWHS stand-in.
    registry = {'mmwhs': MMWHSDataset, 'mrxcat': MRXCATDataset,
                'synthetic': MMWHSDataset}
    return registry[name]
