from image_restoration_tpu.data.augment import data_augmentation, random_augmentation  # noqa: F401
from image_restoration_tpu.data.degradations import add_gaussian_noise, add_gaussian_noise_np  # noqa: F401
from image_restoration_tpu.data.datasets import (  # noqa: F401
    AIOTrainDataset,
    CDD11,
    PairedFolderDataset,
    DenoiseBenchmark,
    TASK_SPECS,
)
from image_restoration_tpu.data.pipeline import Loader, make_train_iterator  # noqa: F401
