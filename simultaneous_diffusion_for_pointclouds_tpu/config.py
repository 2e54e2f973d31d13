"""Config system: YAML -> nested namespace, schema-compatible with the reference.

The reference converts YAML dicts to nested ``argparse.Namespace`` objects
(reference ``LiDARGen/main.py:166-174`` ``dict2namespace``) and injects a few
runtime keys (``main.py:43-48``).  We keep the exact same schema so the
reference's config files (Line.yml / Inpainting.yml / Densification.yml /
HDVMine*.yml) load unchanged, but add typed accessors and defaulting so code
does not need ``hasattr`` chains.
"""

from __future__ import annotations

import argparse
import copy
from typing import Any, Mapping

import yaml


def dict2namespace(config: Mapping[str, Any]) -> argparse.Namespace:
    """Recursively convert a mapping into nested Namespaces.

    Mirrors reference ``LiDARGen/main.py:166-174`` so configs round-trip.
    """
    namespace = argparse.Namespace()
    for key, value in config.items():
        if isinstance(value, dict):
            value = dict2namespace(value)
        setattr(namespace, key, value)
    return namespace


def namespace2dict(ns: Any) -> Any:
    if isinstance(ns, argparse.Namespace):
        return {k: namespace2dict(v) for k, v in vars(ns).items()}
    return ns


def cfg_get(config: Any, dotted: str, default: Any = None) -> Any:
    """Fetch ``config.a.b.c`` with a default when any level is missing."""
    node = config
    for part in dotted.split("."):
        if not hasattr(node, part):
            return default
        node = getattr(node, part)
    return node


def load_config(
    path: str,
    *,
    densification: bool = False,
    interpolation: bool = False,
    inpainting: bool = True,
) -> argparse.Namespace:
    """Load a YAML config file into a nested namespace.

    Applies the same runtime-injected defaults as the reference CLI
    (``main.py:43-48``): ``data.image_width`` falls back to ``image_size``,
    and the sampling-task flags come from CLI switches.
    """
    with open(path, "r") as f:
        raw = yaml.safe_load(f)
    raw = copy.deepcopy(raw)
    if "image_width" not in raw["data"]:
        raw["data"]["image_width"] = raw["data"]["image_size"]
    raw.setdefault("sampling", {})
    raw["sampling"]["densification"] = densification
    raw["sampling"]["interpolation"] = interpolation
    raw["sampling"]["inpainting"] = inpainting
    return dict2namespace(raw)


def save_config(config: argparse.Namespace, path: str) -> None:
    with open(path, "w") as f:
        yaml.dump(namespace2dict(config), f, default_flow_style=False)
