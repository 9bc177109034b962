from srgan_tpu.ops.losses import (  # noqa: F401
    lsgan_loss,
    masked_lsgan_loss,
    domain_classification_loss,
    kl_loss,
    batch_kl_loss,
    corrcoef,
    corrcoef_loss,
    gaussian_histogram,
    histogram_target,
    histogram_imitation_loss,
    diversification_loss,
    l1_loss,
)
from srgan_tpu.ops.image import min_max, to_uint8_images  # noqa: F401
