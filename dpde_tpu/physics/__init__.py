from . import heat

__all__ = ["heat"]
