from .laplacian import laplacian_pallas, laplacian_auto

__all__ = ["laplacian_pallas", "laplacian_auto"]
