"""Unified config layer: every subsystem config serializes to/from JSON.

The reference scatters configuration across argparse (CLI), FlagConfig
attribute bags (Triton clients), yolov5 yamls (arch), config.pbtxt (serving)
and module-level UPPER_CASE constants (pipelines) — SURVEY.md §5. Here all
runtime configs are dataclasses with one JSON round-trip, so a CLI flag file,
a service deployment config and a pipeline job spec share one format.
"""
from __future__ import annotations

import dataclasses
import json
from typing import Any, Dict, Type, TypeVar

T = TypeVar("T")


def to_dict(cfg: Any) -> Dict[str, Any]:
    """Dataclass -> plain dict (non-serializable leaves stringified)."""
    out = {}
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            v = to_dict(v)
        elif not isinstance(v, (int, float, str, bool, list, tuple, dict,
                                type(None))):
            v = str(v)
        out[f.name] = v
    return out


def save_config(cfg: Any, path: str) -> None:
    with open(path, "w") as f:
        json.dump(to_dict(cfg), f, indent=2)


def load_config(cls: Type[T], path: str, **overrides) -> T:
    """JSON -> dataclass; unknown keys rejected, tuples restored, overrides
    applied last."""
    with open(path) as f:
        data = json.load(f)
    data.update(overrides)
    names = {f.name: f for f in dataclasses.fields(cls)}
    unknown = set(data) - set(names)
    if unknown:
        raise ValueError(f"unknown config keys for {cls.__name__}: {sorted(unknown)}")
    kwargs = {}
    for k, v in data.items():
        default = names[k].default
        if isinstance(default, tuple) and isinstance(v, list):
            v = tuple(tuple(x) if isinstance(x, list) else x for x in v)
        if names[k].name == "dtype" and isinstance(v, str):
            import jax.numpy as jnp

            v = {"float32": jnp.float32, "bfloat16": jnp.bfloat16}.get(
                v.split(".")[-1].replace("'>", ""), jnp.float32
            )
        kwargs[k] = v
    return cls(**kwargs)
