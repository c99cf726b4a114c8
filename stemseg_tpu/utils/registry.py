"""Named string→factory registries.

Equivalent to the reference's ``GlobalRegistry``
(``/root/reference/stemseg/utils/global_registry.py:23-74``): a flat two-level
namespace of registries, each mapping names to factories/classes, with a
decorator-style ``add``.
"""

from __future__ import annotations

from typing import Any, Callable, Dict, Optional


class Registry:
    _registries: Dict[str, "Registry"] = {}

    def __init__(self, name: str):
        self._name = name
        self._entries: Dict[str, Any] = {}

    @classmethod
    def get(cls, name: str) -> "Registry":
        """Fetch (or lazily create) the registry with the given name."""
        if name not in cls._registries:
            cls._registries[name] = Registry(name)
        return cls._registries[name]

    def add(self, key: str, value: Optional[Any] = None) -> Callable:
        """Register ``value`` under ``key``. Usable as a decorator when
        ``value`` is omitted."""
        if value is not None:
            self._register(key, value)
            return value

        def decorator(obj):
            self._register(key, obj)
            return obj

        return decorator

    def _register(self, key: str, value: Any) -> None:
        if key in self._entries:
            raise KeyError(
                f"Key {key!r} already exists in registry {self._name!r}")
        self._entries[key] = value

    def __getitem__(self, key: str) -> Any:
        if key not in self._entries:
            raise KeyError(
                f"No entry {key!r} in registry {self._name!r} "
                f"(have: {sorted(self._entries)})")
        return self._entries[key]

    def __contains__(self, key: str) -> bool:
        return key in self._entries

    def keys(self):
        return self._entries.keys()

    @property
    def name(self) -> str:
        return self._name
