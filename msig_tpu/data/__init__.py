"""Data layer: domain discovery, sampling semantics, host pipeline."""

from msig_tpu.data.dataset import (  # noqa: F401
    IMAGE_EXTENSIONS,
    MultiDomainDataset,
    discover_inference_domains,
    discover_target_domains,
    list_image_files,
)
from msig_tpu.data.pipeline import (  # noqa: F401
    TrainLoader,
    load_inference_image,
    load_train_image,
    random_resized_crop_params,
)
