"""Layer / pooling registry.

The reference registers its layers into PyG GraphGym
(`@register_layer('fsw_conv')`, `@register_pooling('fsw_readout')`,
fsw_conv.py:54, 451) so config-driven frameworks can instantiate them by
name.  This is the framework-local equivalent: a simple name -> module-class
registry plus config-driven construction (see FSWConv.from_config for the
reference's config-dict override semantics, fsw_conv.py:192-205).
"""
from __future__ import annotations

from typing import Callable, Dict, Type

_LAYERS: Dict[str, type] = {}
_POOLINGS: Dict[str, type] = {}


def register_layer(name: str) -> Callable[[type], type]:
    def deco(cls):
        _LAYERS[name] = cls
        return cls
    return deco


def register_pooling(name: str) -> Callable[[type], type]:
    def deco(cls):
        _POOLINGS[name] = cls
        return cls
    return deco


def get_layer(name: str) -> type:
    return _LAYERS[name]


def get_pooling(name: str) -> type:
    return _POOLINGS[name]


def available_layers():
    return sorted(_LAYERS)


def available_poolings():
    return sorted(_POOLINGS)
