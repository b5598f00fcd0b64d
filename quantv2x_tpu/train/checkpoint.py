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
        # parity: the reference deletes the superseded best checkpoint
        # (train.py:181-215 removes the old net_epoch_bestval_at file)
        if prev_best_epoch is not None and prev_best_epoch != epoch:
            old = _ckpt_dir(run_dir, prev_best_epoch)
            if os.path.exists(old):
                shutil.rmtree(old)
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


# leaf-path renames across code revisions (old name -> current name).
# "conv/kernel" under a grouped conv became the explicit block-diagonal
# parameter "conv_kernel_grouped" (same (kh, kw, cin/groups, out) shape).
_LEGACY_ALIASES = (("conv_kernel_grouped", "conv/kernel"),)


def _key_name(k):
    for attr in ("name", "key", "idx"):
        if hasattr(k, attr):
            return str(getattr(k, attr))
    return str(k)


def _graft_by_path(raw, state_like):
    """Fill state_like's structure from a raw dict checkpoint by leaf path,
    resolving legacy names. Missing/extra leaves are reported, not fatal
    (parity: train_utils.check_missing_key:145-168)."""
    raw_leaves = {
        "/".join(_key_name(k) for k in kp): v
        for kp, v in jax.tree_util.tree_flatten_with_path(raw)[0]
    }
    used, missing = set(), []

    flat, treedef = jax.tree_util.tree_flatten_with_path(state_like)
    out = []
    for kp, cur in flat:
        path = "/".join(_key_name(k) for k in kp)
        cand = [path] + [path.replace(new, old)
                         for new, old in _LEGACY_ALIASES if new in path]
        hit = next((c for c in cand if c in raw_leaves), None)
        if hit is not None and getattr(raw_leaves[hit], "shape", None) == \
                getattr(cur, "shape", None):
            out.append(raw_leaves[hit].astype(cur.dtype)
                       if hasattr(raw_leaves[hit], "astype")
                       else raw_leaves[hit])
            used.add(hit)
        else:
            missing.append(path)
            out.append(cur)
    if missing:
        print(f"[checkpoint] {len(missing)} leaves missing from checkpoint "
              f"(kept init values): {missing[:5]}...")
    extra = set(raw_leaves) - used
    if extra:
        print(f"[checkpoint] {len(extra)} checkpoint leaves unused: "
              f"{sorted(extra)[:5]}...")
    return jax.tree_util.tree_unflatten(treedef, out)


def restore_checkpoint(run_dir: str, state_like, epoch: Optional[int] = None):
    """Restore into the structure of ``state_like``. epoch=None -> latest.

    Falls back to path-wise grafting (with legacy-name aliases) when the
    checkpoint tree no longer matches the live model exactly."""
    if epoch is None:
        epoch = latest_epoch(run_dir)
        if epoch is None:
            raise FileNotFoundError(f"no checkpoints under {run_dir}")
    path = _ckpt_dir(run_dir, epoch)
    try:
        with ocp.StandardCheckpointer() as ckptr:
            restored = ckptr.restore(path, jax.device_get(state_like))
    except Exception:
        with ocp.PyTreeCheckpointer() as ckptr:
            raw = ckptr.restore(path)
        restored = _graft_by_path(raw, jax.device_get(state_like))
    return restored, epoch
