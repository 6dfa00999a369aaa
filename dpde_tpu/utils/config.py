"""Hierarchical YAML config system (Hydra-compatible subset).

The reference uses Hydra 1.3 + OmegaConf (reference: conf/train.yaml:1-4,
train.py:10). Hydra is not available in this environment, so this module
implements the subset of behavior the framework needs, with the same user
surface:

  * a root config with a ``defaults`` list that composes config *groups*
    (``dataset/``, ``model/``, ``sampling_conf/``) into named sub-trees,
  * CLI overrides: ``group=option`` swaps a whole group config,
    ``a.b.c=value`` overrides a leaf, ``+a.b=value`` adds a new leaf,
  * ``${oc.env:VAR,default}`` environment interpolation.

Configs are plain nested dicts wrapped in :class:`Config` for attribute
access, so downstream code reads ``cfg.dataset.training.batch_size`` exactly
like the reference does with a DictConfig.
"""

from __future__ import annotations

import os
import re
from pathlib import Path
from typing import Any, Iterable

import yaml

# innermost-first: the body may not contain braces, so nested defaults
# like ${oc.env:REPO_ROOT,${oc.env:PWD}} resolve inner-out in a loop
_ENV_RE = re.compile(
    r"\$\{oc\.env:([A-Za-z_][A-Za-z0-9_]*)(?:,([^{}]*))?\}")


class Config(dict):
    """A dict with attribute access and recursive wrapping (DictConfig-lite)."""

    def __getattr__(self, name: str) -> Any:
        try:
            return self[name]
        except KeyError as e:  # pragma: no cover - attribute protocol
            raise AttributeError(name) from e

    def __setattr__(self, name: str, value: Any) -> None:
        self[name] = value

    def get(self, key, default=None):
        return super().get(key, default)

    @staticmethod
    def wrap(obj: Any) -> Any:
        if isinstance(obj, dict):
            return Config({k: Config.wrap(v) for k, v in obj.items()})
        if isinstance(obj, (list, tuple)):
            return [Config.wrap(v) for v in obj]
        return obj

    def to_dict(self) -> dict:
        def unwrap(o):
            if isinstance(o, dict):
                return {k: unwrap(v) for k, v in o.items()}
            if isinstance(o, list):
                return [unwrap(v) for v in o]
            return o

        return unwrap(self)


def _interp_env(obj: Any) -> Any:
    """Resolve ``${oc.env:VAR,default}`` interpolations in strings."""
    if isinstance(obj, str):
        def sub(m: re.Match) -> str:
            var, default = m.group(1), m.group(2)
            return os.environ.get(var, default if default is not None else "")

        prev = None
        while prev != obj and "${oc.env:" in obj:
            prev = obj
            obj = _ENV_RE.sub(sub, obj)
        return obj
    if isinstance(obj, dict):
        return {k: _interp_env(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_interp_env(v) for v in obj]
    return obj


def _parse_value(raw: str) -> Any:
    """Parse a CLI override value with YAML semantics ('1e-4' -> float etc.)."""
    try:
        val = yaml.safe_load(raw)
    except yaml.YAMLError:
        return raw
    # YAML parses bare '1e-4' as a string; coerce numeric-looking strings.
    if isinstance(val, str):
        try:
            return int(val)
        except ValueError:
            pass
        try:
            return float(val)
        except ValueError:
            pass
    return val


def _set_dotted(tree: dict, key: str, value: Any, *, allow_new: bool) -> None:
    parts = key.split(".")
    node = tree
    for p in parts[:-1]:
        if p not in node or not isinstance(node[p], dict):
            if not allow_new:
                raise KeyError(
                    f"Override key '{key}' not found (use '+{key}=...' to add)"
                )
            node[p] = {}
        node = node[p]
    if parts[-1] not in node and not allow_new:
        raise KeyError(f"Override key '{key}' not found (use '+{key}=...' to add)")
    node[parts[-1]] = value


def _merge(base: dict, other: dict) -> dict:
    out = dict(base)
    for k, v in other.items():
        if k in out and isinstance(out[k], dict) and isinstance(v, dict):
            out[k] = _merge(out[k], v)
        else:
            out[k] = v
    return out


def _coerce_numbers(obj: Any) -> Any:
    """PyYAML parses '1e-4' as a string (YAML 1.1 float grammar needs a
    dot); OmegaConf — which the reference's configs were written for —
    parses it as a float. Coerce purely-numeric-looking strings so configs
    behave identically."""
    if isinstance(obj, str):
        try:
            return int(obj)
        except ValueError:
            pass
        try:
            return float(obj)
        except ValueError:
            return obj
    if isinstance(obj, dict):
        return {k: _coerce_numbers(v) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_coerce_numbers(v) for v in obj]
    return obj


def _load_yaml(path: Path) -> dict:
    with open(path) as f:
        data = yaml.safe_load(f)
    return _coerce_numbers(data or {})


def load_config(
    config_dir: str | Path,
    config_name: str,
    overrides: Iterable[str] = (),
) -> Config:
    """Compose a config the way ``@hydra.main`` would (reference train.py:10).

    Parameters
    ----------
    config_dir : directory holding the root config and its group subdirs.
    config_name : root config name without extension (e.g. ``"train"``).
    overrides : CLI-style override strings.
    """
    config_dir = Path(config_dir)
    root = _load_yaml(config_dir / f"{config_name}.yaml")

    defaults = root.pop("defaults", [])
    # group overrides on the CLI replace entries in the defaults list
    group_over: dict[str, str] = {}
    leaf_over: list[tuple[str, Any, bool]] = []
    for ov in overrides:
        allow_new = ov.startswith("+")
        ov_body = ov[1:] if allow_new else ov
        if "=" not in ov_body:
            raise ValueError(f"Malformed override: {ov!r}")
        key, raw = ov_body.split("=", 1)
        if "." not in key and (config_dir / key).is_dir() and not allow_new:
            group_over[key] = raw
        else:
            leaf_over.append((key, _parse_value(raw), allow_new))

    composed: dict = {}
    self_merged = False
    for entry in defaults:
        if entry == "_self_":
            composed = _merge(composed, root)
            self_merged = True
            continue
        if isinstance(entry, dict):
            [(group, option)] = entry.items()
        else:
            group, option = entry, None
        if group in group_over:
            option = group_over.pop(group)
        sub = _load_yaml(config_dir / str(group) / f"{option}.yaml")
        composed = _merge(composed, {str(group): sub})
    if not self_merged:
        composed = _merge(composed, root)
    for group, option in group_over.items():
        sub = _load_yaml(config_dir / group / f"{option}.yaml")
        composed = _merge(composed, {group: sub})

    for key, value, allow_new in leaf_over:
        _set_dotted(composed, key, value, allow_new=allow_new)

    return Config.wrap(_interp_env(composed))


def main(config_path: str, config_name: str):
    """Decorator mirroring ``@hydra.main`` for entry scripts.

    Reads overrides from ``sys.argv[1:]``.
    """

    def deco(fn):
        def wrapped():
            import sys

            cfg = load_config(config_path, config_name, sys.argv[1:])
            return fn(cfg)

        return wrapped

    return deco
