"""Checkpointing: Orbax for native state, plus reference-.pth interop.

The reference saves ``[model_sd, opt_sd, epoch, step, (ema_sd)]`` to
``checkpoint_{step}.pth`` and a rolling ``checkpoint.pth``
(ncsn_runner.py:168-179).  We keep the same file layout discipline with
Orbax directories: ``ckpt_{step}/`` plus a rolling ``ckpt/`` symlink-like
copy, holding {params, opt_state, ema_params, epoch, step}.
"""

from __future__ import annotations

import json
import logging
import os
import re
from typing import Any, Dict, Optional

import jax
import orbax.checkpoint as ocp


def _ckptr():
    return ocp.PyTreeCheckpointer()


def is_complete_ckpt(path: str) -> bool:
    """True iff ``path`` is an Orbax OCDBT checkpoint with its data blobs.

    Rolling checkpoints churn their ``d/`` blob files on every save; a
    checkout that carried only the manifests (e.g. a clone made while the
    blobs were untracked) still LOOKS like a checkpoint dir but crashes on
    restore.  Guard on the blob directory being non-empty.
    """
    if not os.path.isfile(os.path.join(path, "_CHECKPOINT_METADATA")):
        return False
    d = os.path.join(path, "ocdbt.process_0", "d")
    try:
        return len(os.listdir(d)) > 0
    except OSError:
        return False


def resolve_ckpt_dir(path: str) -> Optional[str]:
    """Resolve ``path`` to a restorable checkpoint directory.

    Accepts either a checkpoint dir itself or a training log dir (the
    parent holding ``ckpt``/``ckpt_{step}``).  If the named dir is missing
    or incomplete (manifests without data blobs), falls back to the newest
    complete sibling/child snapshot — ``ckpt_{step}`` ordered by step, the
    rolling ``ckpt`` ranked by the ``progress.json`` sidecar's step.
    Returns None when nothing restorable exists.
    """
    path = os.path.abspath(path)
    if is_complete_ckpt(path):
        return path
    bases = [b for b in (path, os.path.dirname(path)) if os.path.isdir(b)]
    best, best_step = None, -1
    for base in bases:
        progress = load_progress(base)
        for name in sorted(os.listdir(base)):
            cand = os.path.join(base, name)
            if name == "ckpt":
                step = int(progress.get("step", 0)) if progress else 0
            else:
                m = re.fullmatch(r"ckpt_(\d+)", name)
                if not m:
                    continue
                step = int(m.group(1))
            if step > best_step and is_complete_ckpt(cand):
                best, best_step = cand, step
        if best is not None:
            break  # prefer children of the named dir over its siblings
    if best is not None and best != path:
        logging.warning(
            "checkpoint %s is missing or incomplete; restoring %s instead",
            path,
            best,
        )
    return best


def _restore_as_numpy(path: str):
    """Topology-independent restore: read every leaf as a host numpy array.

    A checkpoint saved on one device topology (e.g. the TPU chip) records
    per-leaf shardings; a plain ``restore`` on a different topology (CPU
    tests, a differently-sized mesh) fails trying to rebuild them.  Restoring
    to numpy sidesteps the recorded shardings entirely — callers device_put
    (or jit-shard) the tree themselves.
    """
    import numpy as np

    ckptr = _ckptr()
    meta = ckptr.metadata(path)
    # PyTreeCheckpointer.metadata returns a StepMetadata wrapper; the actual
    # saved pytree (ArrayMetadata leaves) lives under item_metadata.tree.
    tree = getattr(getattr(meta, "item_metadata", meta), "tree", meta)
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    return ckptr.restore(path, restore_args=restore_args)


def save_checkpoint(
    log_path: str,
    state: Dict[str, Any],
    step: int,
    progress: Optional[Dict[str, int]] = None,
) -> None:
    """Write ``ckpt_{step}`` and refresh the rolling ``ckpt``.  ``progress``
    (loop counters: step/true_step/max_reachable) goes to a JSON sidecar —
    the reference stores epoch/step inside its .pth (ncsn_runner.py:168-179);
    a sidecar keeps the Orbax tree layout unchanged for samplers/tests."""
    state = jax.tree.map(lambda x: x, state)
    ckptr = _ckptr()
    path = os.path.join(os.path.abspath(log_path), f"ckpt_{step}")
    ckptr.save(path, state, force=True)
    rolling = os.path.join(os.path.abspath(log_path), "ckpt")
    ckptr.save(rolling, state, force=True)
    if progress is not None:
        with open(os.path.join(os.path.abspath(log_path), "progress.json"), "w") as f:
            json.dump(progress, f)


def restore_checkpoint(log_path: str, step: Optional[int] = None, target=None):
    """Restore ``ckpt_{step}`` (or the rolling ``ckpt``).  Pass ``target``
    (a state pytree of the right structure, e.g. from ``init_state``) to
    recover exact container types — without it Orbax returns plain nested
    dicts, which breaks optax NamedTuple opt_states on resume."""
    path = os.path.join(
        os.path.abspath(log_path), f"ckpt_{step}" if step is not None else "ckpt"
    )
    path = resolve_ckpt_dir(path) or path
    try:
        if target is None:
            return _ckptr().restore(path)
        return _ckptr().restore(path, item=target)
    except ValueError:  # saved on a different device topology
        if target is None:
            return _restore_as_numpy(path)
        import numpy as np

        restore_args = jax.tree.map(
            lambda _: ocp.RestoreArgs(restore_type=np.ndarray), target
        )
        return _ckptr().restore(path, item=target, restore_args=restore_args)


def load_progress(log_path: str) -> Optional[Dict[str, int]]:
    path = os.path.join(os.path.abspath(log_path), "progress.json")
    if not os.path.isfile(path):
        return None
    with open(path) as f:
        return json.load(f)


def load_score_params(ckpt_path: str, model, example_input, example_labels):
    """Load score-network params from either an Orbax dir or a reference
    torch ``.pth`` checkpoint (converted on the fly; EMA weights preferred,
    as the reference applies EMA before sampling,
    ncsn_runner_kitti_simultaneous.py:485-489)."""
    if os.path.isdir(ckpt_path):
        path = resolve_ckpt_dir(ckpt_path)
        if path is None:
            raise FileNotFoundError(
                f"no complete checkpoint under {os.path.abspath(ckpt_path)} "
                "(manifests without data blobs?)"
            )
        try:
            state = _ckptr().restore(path)
        except ValueError:  # saved on a different device topology
            state = _restore_as_numpy(path)
        return state.get("ema_params", state["params"])
    from .torch_convert import load_reference_checkpoint, torch_state_dict_to_flax

    ref = load_reference_checkpoint(ckpt_path)
    variables = model.init(jax.random.PRNGKey(0), example_input, example_labels)
    source = ref.get("ema", ref["model"])
    return torch_state_dict_to_flax(source, variables["params"])
