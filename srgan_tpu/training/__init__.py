from srgan_tpu.training.state import GANTrainState, adam_chain, adam_apply  # noqa: F401
from srgan_tpu.training.gan import GANTrainer  # noqa: F401
from srgan_tpu.training.classifier import ClassifierTrainer  # noqa: F401
