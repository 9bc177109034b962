"""srgan_tpu — a TPU-native (JAX/Flax/XLA/Pallas) Style-Restricted GAN framework.

A ground-up rebuild of the capabilities of shinshoji01/Style-Restricted_GAN
(reference: /root/reference, arXiv:2105.07621) designed for TPU hardware:

- NHWC layouts, XLA-compiled conv stacks, optional bfloat16 compute
- one fully-jitted train step (unrolled-k discriminator loop included)
- data parallelism over a ``jax.sharding.Mesh`` with GSPMD-global batch losses
- a Pallas soft-histogram kernel for the diversification loss stack

Public surface mirrors the reference's ``pyfiles/{model,dataset,evaluation}.py``
capability-for-capability (see each module's docstring for file:line cites).
"""

__version__ = "0.3.0"

from srgan_tpu import configs  # noqa: F401
