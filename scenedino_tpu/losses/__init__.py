from scenedino_tpu.losses.reconstruction import (  # noqa: F401
    ReconstructionLossConfig,
    cosine_error,
    edge_aware_smoothness,
    invalid_mask,
    reconstruction_error,
    reconstruction_loss,
)
from scenedino_tpu.losses.ssim import l1_ssim, ssim_error  # noqa: F401
