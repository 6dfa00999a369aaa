from .config import Config, load_config, main
from .paths import get_repo_root, resolve_data_path
from .jaxcache import enable_compilation_cache
from . import metrics

__all__ = [
    "Config",
    "load_config",
    "main",
    "get_repo_root",
    "resolve_data_path",
    "enable_compilation_cache",
    "metrics",
]
