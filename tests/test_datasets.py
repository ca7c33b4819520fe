"""Dataset-class identity logic: file-id regexes, 3d-id fold grouping, tags,
registry (reference mmwhs_dataset.py:35-43, mrxcat_dataset.py:32-45)."""

import pytest

from acquisition_focus_tpu.data.mmwhs import MMWHSDataset
from acquisition_focus_tpu.data.mrxcat import MRXCATDataset, get_dataset_class


class TestMRXCATIds:
    def test_file_id_regex(self):
        fid, is_label = MRXCATDataset.get_file_id("phantom_004_t002_image.nii.gz")
        assert fid == "004_t002" and not is_label
        fid, is_label = MRXCATDataset.get_file_id(
            "/some/dir/phantom_012_t010_label.nii.gz")
        assert fid == "012_t010" and is_label

    def test_3d_id_groups_by_phantom_and_frame(self):
        ds = MRXCATDataset.__new__(MRXCATDataset)  # id logic needs no build
        # 8-char prefix: phantom+frame -> one fold bucket per time frame
        assert ds.extract_3d_id("004_t002") == "004_t002"
        assert ds.extract_3d_id("004_t002_extra") == "004_t002"

    def test_rejects_foreign_names(self):
        with pytest.raises(IndexError):
            MRXCATDataset.get_file_id("mr_train_1001_image.nii.gz")


class TestMMWHSIds:
    def test_file_id_regex(self):
        fid, is_label = MMWHSDataset.get_file_id("mr_train_1001_image.nii.gz")
        assert fid == "mr_1001" and not is_label
        fid, is_label = MMWHSDataset.get_file_id("ct_train_1007_label.nii.gz")
        assert fid == "ct_1007" and is_label

    def test_rejects_foreign_names(self):
        with pytest.raises(IndexError):
            MMWHSDataset.get_file_id("phantom_004_t002_image.nii.gz")


def test_registry():
    assert get_dataset_class("mrxcat") is MRXCATDataset
    assert get_dataset_class("mmwhs") is MMWHSDataset
    # the synthetic phantom writer emits MMWHS-style names on purpose
    assert get_dataset_class("synthetic") is MMWHSDataset
    with pytest.raises(KeyError):
        get_dataset_class("nope")


def test_label_tags_default_and_binarized():
    assert MRXCATDataset.label_tags == (
        "background", "MYO", "LV", "RV", "LA", "RA")
    assert MMWHSDataset.label_tags == MRXCATDataset.label_tags
