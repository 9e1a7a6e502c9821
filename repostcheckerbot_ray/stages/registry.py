"""Stage protocol + registry — the user-extension surface (SURVEY.md §2.H).

The reference has no extension surface (modality dispatch is hard-coded,
/root/reference/database.py:727-753; config is a positional tuple,
config.py:9-19). The engine exposes one: a ``Stage`` is any object with a
``name`` and ``apply(Dataset, ctx) -> Dataset``; registering a fingerprinter
or scorer stage makes it addressable from config/CLI by name.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field
from typing import Any, Protocol, runtime_checkable


@runtime_checkable
class Stage(Protocol):
    name: str

    def apply(self, ds: Any, ctx: dict) -> Any:  # Dataset -> Dataset
        ...


@dataclass
class FnStage:
    """Adapter: wrap a plain ``fn(ds, ctx) -> ds`` as a Stage."""

    name: str
    fn: Callable[[Any, dict], Any]
    schema_in: list = field(default_factory=list)
    schema_out: list = field(default_factory=list)

    def apply(self, ds: Any, ctx: dict) -> Any:  # noqa: ANN001
        return self.fn(ds, ctx)


_REGISTRY: dict[str, Stage] = {}


def register(stage: Stage) -> Stage:
    if stage.name in _REGISTRY:
        raise ValueError(f"duplicate stage name: {stage.name}")
    _REGISTRY[stage.name] = stage
    return stage


def get(name: str) -> Stage:
    try:
        return _REGISTRY[name]
    except KeyError:
        raise KeyError(f"unknown stage {name!r}; registered: {sorted(_REGISTRY)}") from None


def names() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtins() -> None:
    from .blocking import dedup_by_url, explode_text_bands
    from .fingerprint_stage import fingerprint_dataset
    from .multimodal import media_features

    register(FnStage("fingerprint", lambda ds, ctx: fingerprint_dataset(
        ds, num_parts=ctx.get("num_parts", 16),
        batch_size=ctx.get("batch_size", 512),
        concurrency=ctx.get("concurrency", 4))))
    register(FnStage("dedup_by_url", lambda ds, ctx: dedup_by_url(ds)))
    register(FnStage("explode_text_bands", lambda ds, ctx: explode_text_bands(ds)))
    register(FnStage("media_features", lambda ds, ctx: media_features(
        ds, batch_size=ctx.get("batch_size", 64),
        concurrency=ctx.get("concurrency", 2))))


_register_builtins()
