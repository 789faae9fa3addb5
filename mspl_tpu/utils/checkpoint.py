"""Checkpoint save/load/resume (reference behavior: per-epoch
`checkpoint.pth.tar` + `*_best.pth` on best val mIoU, `--resume` restores
model+optimizer+epoch — SURVEY.md §5 "Checkpoint / resume").

Format: flax msgpack serialization of the full state pytree (params, BN
stats, optimizer state) + a JSON sidecar with step/epoch/best-metric.  Writes
are atomic (tmp + rename) so a preempted TPU job can always resume from the
last complete checkpoint (SURVEY.md §5: "Checkpoint-every-N-steps +
auto-resume on restart covers TPU preemption").
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization

LAST_NAME = "checkpoint_last"
BEST_NAME = "checkpoint_best"


def _atomic_write(path: str, data: bytes) -> None:
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        f.write(data)
    os.replace(tmp, path)


def save_checkpoint(
    ckpt_dir: str,
    state: Any,
    meta: Optional[Dict] = None,
    is_best: bool = False,
    name: str = LAST_NAME,
) -> str:
    """Serialize `state` (any pytree) + meta; copy to best on new best."""
    os.makedirs(ckpt_dir, exist_ok=True)
    state = jax.device_get(state)
    path = os.path.join(ckpt_dir, name + ".msgpack")
    _atomic_write(path, serialization.to_bytes(state))
    meta_path = os.path.join(ckpt_dir, name + ".json")
    _atomic_write(meta_path, json.dumps(meta or {}).encode())
    if is_best:
        shutil.copyfile(path, os.path.join(ckpt_dir, BEST_NAME + ".msgpack"))
        shutil.copyfile(meta_path, os.path.join(ckpt_dir, BEST_NAME + ".json"))
    return path


def load_checkpoint(
    path_or_dir: str,
    target: Any,
    best: bool = False,
) -> Tuple[Any, Dict]:
    """Restore a checkpoint into the structure of `target` (same pytree)."""
    if os.path.isdir(path_or_dir):
        name = BEST_NAME if best else LAST_NAME
        path = os.path.join(path_or_dir, name + ".msgpack")
    else:
        path = path_or_dir
    with open(path, "rb") as f:
        state = serialization.from_bytes(target, f.read())
    meta_path = os.path.splitext(path)[0] + ".json"
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return state, meta


def has_checkpoint(ckpt_dir: str, best: bool = False) -> bool:
    name = BEST_NAME if best else LAST_NAME
    return os.path.exists(os.path.join(ckpt_dir, name + ".msgpack"))
