"""Model factory — the reference's ``builders/model_builder.py :: build_model``
[R] re-done as a registry instead of an if/elif ladder.

``build_model(name, num_classes)`` returns a Module; canonical names follow
the reference's CLI spellings (case-insensitive, aliases included).
"""
from __future__ import annotations

from typing import Callable, Dict

from .. import nn

_REGISTRY: Dict[str, Callable[..., nn.Module]] = {}
_ALIASES: Dict[str, str] = {}


def register(name: str, *aliases: str):
    def deco(ctor):
        _REGISTRY[name.lower()] = ctor
        for a in aliases:
            _ALIASES[a.lower()] = name.lower()
        return ctor
    return deco


def available_models():
    return sorted(_REGISTRY)


def build_model(model_name: str, num_classes: int, **kwargs) -> nn.Module:
    key = model_name.lower()
    key = _ALIASES.get(key, key)
    if key not in _REGISTRY:
        raise KeyError(f"unknown model {model_name!r}; "
                       f"available: {available_models()}")
    return _REGISTRY[key](classes=num_classes, **kwargs)


# --- registrations (import side effects kept in one place) -----------------
from .enet import ENet  # noqa: E402

register("enet")(ENet)


def _register_all():
    """Import every model family; called lazily so partial builds still work."""
    from . import (erfnet, edanet, esnet, linknet, segnet, unet, sqnet,  # noqa
                   fssnet, espnet, espnetv2, cgnet, dabnet, lednet, fpenet,
                   fastscnn, contextnet)


try:
    _register_all()
except ImportError:
    pass  # during incremental construction some families may not exist yet
