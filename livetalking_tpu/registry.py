"""Plugin registry: decorator registration + factory creation.

Behavioral contract mirrors the reference registry (reference: registry.py:8-57):
categories ``stt`` / ``llm`` / ``tts`` / ``avatar`` / ``streamout`` (the
reference registers streamout plugins under the category string "streamout"
while documenting it as "output"; we keep both spellings resolving to the
same table so either name works).
"""

from __future__ import annotations

import threading
from typing import Any, Callable, Dict, List, Optional, Type

from livetalking_tpu.utils.logger import logger

_ALIASES = {"output": "streamout"}

_registry_lock = threading.Lock()
_REGISTRY: Dict[str, Dict[str, Type]] = {
    "stt": {},
    "llm": {},
    "tts": {},
    "avatar": {},
    "streamout": {},
}


def _canon(category: str) -> str:
    return _ALIASES.get(category, category)


def register(category: str, name: str) -> Callable[[Type], Type]:
    """Class decorator registering ``cls`` as ``category/name``.

    Usage::

        @register("tts", "edgetts")
        class EdgeTTS(BaseTTS): ...
    """

    def decorator(cls: Type) -> Type:
        cat = _canon(category)
        with _registry_lock:
            table = _REGISTRY.setdefault(cat, {})
            table[name] = cls
        logger.info("Registered %s/%s: %s", cat, name, cls.__name__)
        return cls

    return decorator


def create(category: str, name: str, **kwargs: Any) -> Any:
    """Instantiate the plugin registered as ``category/name``.

    Raises ``ValueError`` listing available plugins when the name is unknown
    (same error contract as reference registry.py:35-50).
    """
    cat = _canon(category)
    with _registry_lock:
        cls = _REGISTRY.get(cat, {}).get(name)
        available = list(_REGISTRY.get(cat, {}).keys())
    if cls is None:
        raise ValueError(
            f"Plugin '{name}' not found in category '{cat}'. Available: {available}"
        )
    return cls(**kwargs)


def list_plugins(category: Optional[str] = None) -> Dict[str, List[str]]:
    """List registered plugin names, optionally for one category."""
    with _registry_lock:
        if category:
            cat = _canon(category)
            return {cat: list(_REGISTRY.get(cat, {}).keys())}
        return {cat: list(tbl.keys()) for cat, tbl in _REGISTRY.items()}
