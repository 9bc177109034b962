from srgan_tpu.evaluation.prdc import compute_prdc  # noqa: F401
from srgan_tpu.evaluation.features import VGG19BN, vgg_feature_extractor  # noqa: F401
from srgan_tpu.evaluation.harness import GANEvaluation, evaluation_init  # noqa: F401
