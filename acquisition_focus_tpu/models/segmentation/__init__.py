from acquisition_focus_tpu.models.segmentation.gin import gin_aug
from acquisition_focus_tpu.models.segmentation.unet2d import SegUnet2D
