from srgan_tpu.ops.pallas.histogram import soft_histogram_cols  # noqa: F401
