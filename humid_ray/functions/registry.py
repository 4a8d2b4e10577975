"""User-extension surface: pluggable signature sources.

The reference's only behavioral extension points are CLI flags
(reference src/humid.cc:413-429); the idiomatic Ray Data analog is a
registry of named signature sources. A source is a vectorized batch
kernel ``fn(batch: pa.Table) -> (hashes: uint64[n], ok: bool[n])`` —
its top bits join the composite word under the same budget-split rules
as the built-ins, and ``~ok`` rows become filtered.

    from humid_ray.functions.registry import register_signature_source

    def fmt_hash(batch):
        ...
        return hashes, ok

    register_signature_source("fmt", fmt_hash)
    cfg = HumidConfig(sources=("phash", "fmt"))
"""

from __future__ import annotations

from collections.abc import Callable

import numpy as np

_REGISTRY: dict[str, Callable] = {}


def register_signature_source(name: str, fn: Callable) -> None:
    if name in ("phash", "simhash"):
        raise ValueError(f"'{name}' is a built-in source")
    _REGISTRY[name] = fn


def get_signature_source(name: str) -> Callable:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(
            f"unknown signature source '{name}' — register it with "
            "register_signature_source()"
        ) from None


def has_signature_source(name: str) -> bool:
    return name in _REGISTRY


def clear_registry() -> None:
    _REGISTRY.clear()
