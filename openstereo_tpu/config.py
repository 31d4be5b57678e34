"""YAML experiment configs.

Keeps the reference's section vocabulary (DATA_CONFIG / MODEL / OPTIMIZATION /
EVALUATOR / TRAINER — see reference docs/3.detailed_config.md) so existing
OpenStereo YAMLs translate mechanically, but loads into an immutable-ish
attribute dict with explicit helpers instead of EasyDict
(reference: stereo/utils/common_utils.py:18-21).
"""

from __future__ import annotations

import copy
import inspect
from typing import Any, Dict, List, Optional

import yaml


class Config(dict):
    """Attribute-accessible nested dict: cfg.MODEL.NAME."""

    def __getattr__(self, key: str) -> Any:
        try:
            return self[key]
        except KeyError as e:
            raise AttributeError(key) from e

    def __setattr__(self, key: str, value: Any) -> None:
        self[key] = value

    def __deepcopy__(self, memo):
        return Config({k: copy.deepcopy(v, memo) for k, v in self.items()})

    @staticmethod
    def _wrap(value: Any) -> Any:
        if isinstance(value, dict):
            return Config({k: Config._wrap(v) for k, v in value.items()})
        if isinstance(value, (list, tuple)):
            return type(value)(Config._wrap(v) for v in value)
        return value

    @classmethod
    def from_dict(cls, d: Dict[str, Any]) -> "Config":
        return cls._wrap(dict(d))

    @classmethod
    def from_file(cls, path: str) -> "Config":
        with open(path, "r") as f:
            return cls.from_dict(yaml.safe_load(f))

    def merged(self, other: Dict[str, Any]) -> "Config":
        """Deep-merge `other` on top of self, returning a new Config."""
        out = copy.deepcopy(self)
        for k, v in other.items():
            if k in out and isinstance(out[k], dict) and isinstance(v, dict):
                out[k] = Config.from_dict(out[k]).merged(v)
            else:
                out[k] = Config._wrap(v)
        return out


def load_config(path: str) -> Config:
    return Config.from_file(path)


def get_valid_kwargs(fn, cfg: Dict[str, Any], ignore: Optional[List[str]] = None) -> Dict[str, Any]:
    """Filter a config section down to kwargs `fn` accepts (lower-cased keys).

    Mirrors the reference's signature-introspection kwarg filtering
    (stereo/utils/common_utils.py:50-71): YAML keys are UPPER_CASE, callables
    take lower_case kwargs, and unknown keys are silently dropped.
    """
    ignore = set(ignore or [])
    sig = inspect.signature(fn)
    accepted = set(sig.parameters)
    out = {}
    for k, v in cfg.items():
        lk = k.lower()
        if lk in ignore or lk == "name":
            continue
        if lk in accepted:
            out[lk] = v
    return out
