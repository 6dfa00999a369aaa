from .io import save_data, load_data, load_attr, RawDataset
from .datasets import (
    DiffusionIterable,
    DiffusionForwardIterable,
    NoTimeIterable,
    ValidationView,
    get_dataloaders,
    get_validation_view,
)

__all__ = [
    "save_data",
    "load_data",
    "load_attr",
    "RawDataset",
    "DiffusionIterable",
    "DiffusionForwardIterable",
    "NoTimeIterable",
    "ValidationView",
    "get_dataloaders",
    "get_validation_view",
]
