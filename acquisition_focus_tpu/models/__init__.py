from acquisition_focus_tpu.models.localization import LocalizationNet
from acquisition_focus_tpu.models.atm import (
    AffineTransformModule,
    StackedATMs,
    atm_theta_from_heads,
)
from acquisition_focus_tpu.models.hybrid_unet import HybridUnet
