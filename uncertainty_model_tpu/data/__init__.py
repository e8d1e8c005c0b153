from .datasets import (  # noqa: F401
    CityScapesDataset,
    DaVinciDataset,
    SCAREDDataset,
    StereoPairDataset,
)
from .transforms import (  # noqa: F401
    Compose,
    RandomAugment,
    RandomFlip,
    ResizeImage,
    ToArray,
    default_augment_transform,
    default_eval_transform,
)
from .loader import DataLoader  # noqa: F401
