from srgan_tpu.utils.checkpoint import (  # noqa: F401
    save_checkpoint,
    restore_checkpoint,
    import_torch_generator,
    import_torch_solo_discriminator,
    import_torch_original_discriminator,
    import_torch_encoder,
    import_torch_classifier,
    import_torch_vgg,
    export_torch_vgg,
    load_torch_state_dict,
)
from srgan_tpu.utils.metrics import MetricLogger, StepTimer  # noqa: F401
