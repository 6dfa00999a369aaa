from .masks import (
    random_boundary_mask,
    random_interior_mask,
    combine_masks,
    get_masks_from_config,
)
from .test_loop import test_loop

__all__ = [
    "random_boundary_mask",
    "random_interior_mask",
    "combine_masks",
    "get_masks_from_config",
    "test_loop",
]
