from srgan_tpu.data.sampling import (  # noqa: F401
    class_encode,
    get_class_label,
    get_target,
)
from srgan_tpu.data.attributes import (  # noqa: F401
    build_label_folder,
    load_label_store,
    parse_attr_file,
)
from srgan_tpu.data.dataset import DEFAULT_DATASET_LABEL, FaceDataset  # noqa: F401
from srgan_tpu.data.loader import DataLoader, prefetch_to_device  # noqa: F401
from srgan_tpu.data.synthetic import (  # noqa: F401
    make_scale_attr_file,
    make_synthetic_celeba,
)
