"""Convert reference (torch) NCSNv2 checkpoints to Flax parameter trees.

The reference ships/loads ``.pth`` checkpoints of the form
``[model_state, optimizer_state, epoch, step, (ema_state)]``
(``runners/ncsn_runner.py:168-179``), with ``nn.DataParallel`` prefixes
(``module.``).  This module maps those state dicts onto the parameter tree
of our Flax models so the pretrained LiDARGen KITTI checkpoint
(``ncsn_runner_kitti_simultaneous.py:472``) can seed sampling without
retraining, and so parity tests can compare forwards numerically.

Layout changes:
- conv weights  (O, I, kh, kw) -> (kh, kw, I, O)
- everything else (alpha/gamma/beta/bias vectors) passes through
- ``sigmas`` buffers are dropped (static in our models)
"""

from __future__ import annotations

from typing import Any, Dict, Mapping

import numpy as np


def _flatten(tree: Mapping, prefix=()) -> Dict[tuple, Any]:
    out = {}
    for k, v in tree.items():
        if isinstance(v, Mapping):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat: Dict[tuple, Any]) -> Dict:
    tree: Dict = {}
    for path, v in flat.items():
        node = tree
        for p in path[:-1]:
            node = node.setdefault(p, {})
        node[path[-1]] = v
    return tree


def _torch_key_to_stem(key: str) -> tuple:
    """``res1.0.conv1`` -> ('res1_0', 'conv1'): merge integer list indices
    into their parent name (matching our Flax module naming)."""
    merged = []
    for part in key.split("."):
        if part.isdigit() and merged:
            merged[-1] = f"{merged[-1]}_{part}"
        else:
            merged.append(part)
    return tuple(merged)


def torch_state_dict_to_flax(state_dict: Mapping[str, Any], flax_params: Mapping) -> Dict:
    """Map a reference model state dict onto ``flax_params``' structure.

    Raises if any target parameter is left unmatched or shapes disagree.
    """
    target = _flatten(dict(flax_params))
    result: Dict[tuple, Any] = {}

    for key, value in state_dict.items():
        if key.startswith("module."):
            key = key[len("module.") :]
        if key.endswith("sigmas") or "num_batches_tracked" in key:
            continue
        arr = np.asarray(value.detach().cpu().numpy() if hasattr(value, "detach") else value)
        stem = _torch_key_to_stem(key)
        parent, leaf = stem[:-1], stem[-1]

        if leaf == "weight" and arr.ndim == 4:
            arr = arr.transpose(2, 3, 1, 0)
            candidates = [parent + ("conv", "kernel"), parent + ("kernel",)]
        elif leaf == "weight":
            candidates = [parent + ("weight",), parent + ("scale",)]
            if parent and parent[-1] == "embed":  # nn.Embedding -> "embedding"
                candidates.insert(0, parent[:-1] + ("embedding",))
        elif leaf == "bias":
            candidates = [parent + ("conv", "bias"), parent + ("bias",)]
        else:  # alpha / gamma / beta of InstanceNorm++
            candidates = [parent + (leaf,)]

        for cand in candidates:
            if cand in target:
                if target[cand].shape != arr.shape:
                    raise ValueError(
                        f"shape mismatch for {key}: torch {arr.shape} vs flax "
                        f"{target[cand].shape} at {cand}"
                    )
                result[cand] = arr.astype(np.asarray(target[cand]).dtype)
                break
        else:
            raise KeyError(f"no flax target for torch param {key} (tried {candidates})")

    missing = set(target) - set(result)
    if missing:
        raise KeyError(f"flax params not covered by checkpoint: {sorted(missing)[:10]}")
    return _unflatten(result)


def load_reference_checkpoint(path: str):
    """Load a reference ``.pth`` list-checkpoint; returns a dict with
    ``model``, ``optimizer``, ``epoch``, ``step`` and optional ``ema``."""
    import torch

    states = torch.load(path, map_location="cpu", weights_only=False)
    out = {"model": states[0], "optimizer": states[1], "epoch": states[2], "step": states[3]}
    if len(states) > 4:
        out["ema"] = states[4]
    return out
