"""Checkpoint / resume.

Reference: ``torch.save({'epoch','model'})`` per epoch + ``--resume``; the
optimizer state is NOT saved, so reference resumes are inexact
[R: train.py; SURVEY.md §5]. Here a checkpoint is the full TrainState
(params + BN stats + optimizer state + step) plus metadata, serialized with
flax msgpack — resume is bit-exact. ``convert_state.py``'s job (strip
DataParallel prefixes) has no analogue: there is nothing to strip.

Layout: ``{savedir}/model_{epoch}.ckpt`` (msgpack bytes), mirroring the
reference's ``model_{epoch}.pth`` naming so sweep tooling (--best) ports over.
"""
from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional, Tuple

import jax
import numpy as np
from flax import serialization

from .state import TrainState

_CKPT_RE = re.compile(r"model_(\d+)\.ckpt$")


def _to_host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(savedir: str, epoch: int, state: TrainState,
                    extra: Optional[Dict[str, Any]] = None) -> str:
    os.makedirs(savedir, exist_ok=True)
    payload = {
        "state": serialization.to_state_dict(_to_host(state)),
        "meta": {"epoch": int(epoch), **(extra or {})},
    }
    data = serialization.msgpack_serialize(payload)
    path = os.path.join(savedir, f"model_{epoch}.ckpt")
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)  # atomic: a crash never leaves a torn checkpoint
    return path


def load_checkpoint(path: str, target_state: TrainState
                    ) -> Tuple[TrainState, Dict[str, Any]]:
    """Restore into the structure of ``target_state`` (shape-checked)."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    state = serialization.from_state_dict(target_state, payload["state"])
    return state, dict(payload.get("meta", {}))


def load_variables(path: str, target_variables):
    """Restore only {params, stats} from a full checkpoint — for inference
    CLIs, which must load checkpoints regardless of how the optimizer chain
    was configured at train time."""
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    sd = payload["state"]
    restored = {
        "params": serialization.from_state_dict(
            target_variables["params"], sd["params"], name="params"),
        "stats": serialization.from_state_dict(
            target_variables["stats"], sd["stats"], name="stats"),
    }
    return restored, dict(payload.get("meta", {}))


def latest_checkpoint(savedir: str) -> Optional[str]:
    if not os.path.isdir(savedir):
        return None
    best, best_epoch = None, -1
    for name in os.listdir(savedir):
        m = _CKPT_RE.search(name)
        if m and int(m.group(1)) > best_epoch:
            best_epoch = int(m.group(1))
            best = os.path.join(savedir, name)
    return best


def list_checkpoints(savedir: str):
    """All (epoch, path) pairs, sorted — powers test.py --best sweeps [R]."""
    out = []
    if os.path.isdir(savedir):
        for name in os.listdir(savedir):
            m = _CKPT_RE.search(name)
            if m:
                out.append((int(m.group(1)), os.path.join(savedir, name)))
    return sorted(out)


def save_params_only(path: str, variables) -> None:
    """Inference-only export (params + stats)."""
    data = serialization.msgpack_serialize(_to_host(variables))
    with open(path, "wb") as f:
        f.write(data)


def load_params_only(path: str, target_variables):
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    return serialization.from_state_dict(target_variables, payload)


def load_encoder(path: str, variables, subtree: str = "enc"):
    """Graft a pretrained sub-model checkpoint into ``variables[*][subtree]``.

    Reference counterpart: ESPNet's two-stage recipe — train ESPNet-C, then
    construct ESPNet with ``encoderFile=...`` so the decoder trains on top of
    the frozen-format encoder weights [R: model/ESPNet.py ESPNet.__init__].
    The donor checkpoint's param/stat tree must be a superset of the
    ``subtree`` slice (extra donor leaves — e.g. the C-classifier head — are
    ignored).
    """
    with open(path, "rb") as f:
        payload = serialization.msgpack_restore(f.read())
    sd = payload["state"]

    def graft(dst, src, what):
        out = {}
        for k, v in dst.items():
            if k not in src:
                raise KeyError(f"encoder checkpoint missing {what}/{k}")
            if isinstance(v, dict):
                out[k] = graft(v, src[k], f"{what}/{k}")
            else:
                a = np.asarray(src[k])
                if a.shape != v.shape:
                    raise ValueError(
                        f"{what}/{k}: donor {a.shape} != target {v.shape}")
                out[k] = a.astype(v.dtype) if hasattr(v, "dtype") else a
        return out

    new = {
        "params": dict(variables["params"]),
        "stats": dict(variables["stats"]),
    }
    new["params"][subtree] = graft(
        variables["params"][subtree], sd["params"], f"params[{subtree}]")
    new["stats"][subtree] = graft(
        variables["stats"][subtree], sd["stats"], f"stats[{subtree}]")
    return new, dict(payload.get("meta", {}))
