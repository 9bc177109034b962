from srgan_tpu.parallel.mesh import make_mesh, shard_batch, replicate  # noqa: F401
from srgan_tpu.parallel.collectives import (  # noqa: F401
    global_batch_kl,
    global_corrcoef_loss,
    global_diversification_loss,
    global_histogram_imitation,
    global_kl_loss,
    global_masked_lsgan_loss,
)
