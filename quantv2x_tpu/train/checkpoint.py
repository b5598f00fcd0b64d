"""Checkpoint save/restore (orbax) — epoch-granular with best-val tracking.

Parity: tools/train.py:176-215 (net_epoch%d + best-val with old-best
deletion) and train_utils.load_saved_model:171-219 (resume by scanning the
run dir). Uses orbax StandardCheckpointer over the TrainState pytree.
"""

import os
import re
import shutil
from typing import Optional

import jax
import orbax.checkpoint as ocp


def _ckpt_dir(run_dir: str, epoch: int) -> str:
    return os.path.join(os.path.abspath(run_dir), f"epoch_{epoch}")


def save_checkpoint(run_dir: str, epoch: int, state, best_val: Optional[float] = None,
                    prev_best_epoch: Optional[int] = None):
    """Save state; if best_val given, mark as best and drop the old best mark."""
    os.makedirs(run_dir, exist_ok=True)
    path = _ckpt_dir(run_dir, epoch)
    with ocp.StandardCheckpointer() as ckptr:
        if os.path.exists(path):
            shutil.rmtree(path)
        ckptr.save(path, jax.device_get(state))
    if best_val is not None:
        marker = os.path.join(run_dir, "best")
        with open(marker, "w") as f:
            f.write(f"{epoch} {best_val}\n")
    return path


def latest_epoch(run_dir: str) -> Optional[int]:
    if not os.path.isdir(run_dir):
        return None
    epochs = [
        int(m.group(1))
        for d in os.listdir(run_dir)
        if (m := re.fullmatch(r"epoch_(\d+)", d))
    ]
    return max(epochs) if epochs else None


def restore_checkpoint(run_dir: str, state_like, epoch: Optional[int] = None):
    """Restore into the structure of ``state_like``. epoch=None -> latest."""
    if epoch is None:
        epoch = latest_epoch(run_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {run_dir}")
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(
            _ckpt_dir(run_dir, epoch), jax.device_get(state_like)
        )
    return restored, epoch
