"""Checkpoint save/resume with the reference's exact lifecycle.

Parity with `save_checkpoint` + resume (Birds_Eye_View_Loss/main.py:122-143,
504-519): state = {epoch, best epoch, arch, state_dict, loss, optimizer};
`checkpoint_model_epoch_N` rolling (epoch N-1 deleted), `model_best_epoch_N`
copy on improvement, `first_run.txt` latest-epoch marker.

Serialization: flax msgpack for the device pytrees (params / batch_stats /
optimizer state) inside a single pickled dict — a portable, dependency-free
equivalent of torch.save.
"""

from __future__ import annotations

import glob
import os
import pickle
import shutil
from typing import Optional

import jax
from flax import serialization

from lanedetection_end2end_tpu.train.state import TrainState
from lanedetection_end2end_tpu.utils.observability import write_run_marker


def _ckpt_path(save_path: str, epoch: int) -> str:
    return os.path.join(save_path,
                        f"checkpoint_model_epoch_{epoch}.pkl")


def save_checkpoint(save_path: str, state: TrainState, epoch: int,
                    best_epoch: int, best_score: float, arch: str = "erfnet",
                    is_best: bool = False) -> str:
    """Write epoch checkpoint; copy to model_best on improvement; delete the
    previous epoch's checkpoint (main.py:504-519); update first_run.txt."""
    host_state = jax.device_get(state)
    payload = {
        "epoch": epoch + 1,
        "best epoch": best_epoch,
        "arch": arch,
        "loss": best_score,
        "state_dict": serialization.to_bytes(host_state),
    }
    filepath = _ckpt_path(save_path, epoch)
    with open(filepath, "wb") as f:
        pickle.dump(payload, f)
    if is_best:
        for old in glob.glob(os.path.join(save_path, "model_best_epoch_*.pkl")):
            os.remove(old)
        shutil.copyfile(
            filepath, os.path.join(save_path, f"model_best_epoch_{epoch}.pkl"))
    prev = _ckpt_path(save_path, epoch - 1)
    if os.path.exists(prev):
        os.remove(prev)
    write_run_marker(save_path, epoch)
    return filepath


def latest_checkpoint_epoch(save_path: str) -> Optional[int]:
    """Epoch recorded in first_run.txt, if a matching checkpoint exists."""
    marker = os.path.join(save_path, "first_run.txt")
    if not os.path.exists(marker):
        return None
    text = open(marker).read().strip()
    if not text:
        return None
    epoch = int(text)
    return epoch if os.path.exists(_ckpt_path(save_path, epoch)) else None


def load_checkpoint(path: str, template: TrainState):
    """Restore (state, payload) from a checkpoint file; `template` supplies
    the pytree structure (an initialized TrainState)."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    state = serialization.from_bytes(template, payload["state_dict"])
    return state, payload


def best_checkpoint_path(save_path: str) -> Optional[str]:
    """The model_best* file (main.py:146-149)."""
    matches = sorted(glob.glob(os.path.join(save_path, "model_best*")))
    return matches[0] if matches else None
