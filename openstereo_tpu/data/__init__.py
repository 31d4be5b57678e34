from . import datasets  # noqa: F401  (registers dataset classes)
from .loader import StereoDataLoader, build_datasets  # noqa: F401
from .transforms import build_transforms, Compose  # noqa: F401
from . import readers  # noqa: F401
