from srgan_tpu.nn.layers import (  # noqa: F401
    Conv2d,
    ConvTranspose2d,
    Dense,
    CBINorm,
    CBBNorm,
    instance_norm,
    avg_pool2d,
    adaptive_avg_pool,
    get_norm_kind,
)
from srgan_tpu.nn.generator import SingleGenerator  # noqa: F401
from srgan_tpu.nn.discriminator import (  # noqa: F401
    SingleDiscriminatorOriginal,
    SingleDiscriminatorOriginalMulti,
    SingleDiscriminatorSolo,
    SingleDiscriminatorSoloMulti,
)
from srgan_tpu.nn.encoder import (  # noqa: F401
    EncoderOriginal,
    Encoder,
    EncoderClassifier,
)
