"""Generic name → object registry.

The reference wires models/datasets through hand-maintained dicts
(`stereo/modeling/__init__.py:17-36`, `stereo/datasets/__init__.py:21-35`).
Here a single Registry class backs models, datasets, and transforms.
"""

from __future__ import annotations

from typing import Any, Dict, Iterator, Optional


class Registry:
    def __init__(self, name: str):
        self.name = name
        self._obj_map: Dict[str, Any] = {}

    def register(self, obj: Any = None, *, name: Optional[str] = None) -> Any:
        """Use as decorator (`@REG.register` / `@REG.register(name=...)`) or call."""
        if obj is None:
            return lambda o: self.register(o, name=name)
        key = name or obj.__name__
        if key in self._obj_map:
            raise KeyError(f"{key!r} already registered in {self.name!r}")
        self._obj_map[key] = obj
        return obj

    def get(self, name: str) -> Any:
        if name not in self._obj_map:
            raise KeyError(
                f"{name!r} not found in registry {self.name!r}; "
                f"available: {sorted(self._obj_map)}"
            )
        return self._obj_map[name]

    def __contains__(self, name: str) -> bool:
        return name in self._obj_map

    def __iter__(self) -> Iterator[str]:
        return iter(self._obj_map)

    def keys(self):
        return self._obj_map.keys()


MODELS = Registry("models")
DATASETS = Registry("datasets")
TRANSFORMS = Registry("transforms")
