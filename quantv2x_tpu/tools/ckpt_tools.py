"""Checkpoint surgery utilities (parity: tools/heal_tools.py,
merge_model_w_adapter.py, stamp_tools.py checkpoint merging).

Functions to merge parameter subtrees from different runs (e.g. graft a
newly trained modality branch or adapter into a deployed collab model) and
to report structural mismatches (check_missing_key parity,
train_utils.py:145-168).
"""

import argparse
import json
from typing import Dict, Sequence


def tree_paths(tree, prefix=()):
    out = []
    if isinstance(tree, dict):
        for k, v in tree.items():
            out += tree_paths(v, prefix + (k,))
    else:
        out.append("/".join(prefix))
    return out


def report_mismatch(target_params, source_params):
    """-> dict(missing_in_source, extra_in_source) path lists."""
    t = set(tree_paths(target_params))
    s = set(tree_paths(source_params))
    return {
        "missing_in_source": sorted(t - s),
        "extra_in_source": sorted(s - t),
        "matched": len(t & s),
    }


def merge_subtrees(target_params, source_params,
                   scopes: Sequence[str]):
    """Copy top-level subtrees named in ``scopes`` from source into target.

    Returns a new params dict; untouched subtrees are shared, shapes must
    match (orbax-restored trees satisfy this).
    """
    out = dict(target_params)
    for s in scopes:
        if s not in source_params:
            raise KeyError(f"scope {s!r} not in source checkpoint")
        out[s] = source_params[s]
    return out


def main():
    ap = argparse.ArgumentParser(
        description="merge subtrees of one run's params into another's")
    ap.add_argument("--target_dir", required=True)
    ap.add_argument("--source_dir", required=True)
    ap.add_argument("--out_dir", required=True)
    ap.add_argument("--scopes", nargs="+", required=True)
    ap.add_argument("--report_only", action="store_true")
    args = ap.parse_args()

    import jax
    from quantv2x_tpu.train import checkpoint as ckpt
    import orbax.checkpoint as ocp

    with ocp.StandardCheckpointer() as c:
        import os
        t_ep = ckpt.latest_epoch(args.target_dir)
        s_ep = ckpt.latest_epoch(args.source_dir)
        target = c.restore(os.path.join(os.path.abspath(args.target_dir),
                                        f"epoch_{t_ep}"))
        source = c.restore(os.path.join(os.path.abspath(args.source_dir),
                                        f"epoch_{s_ep}"))
    print(json.dumps(report_mismatch(target["params"], source["params"]),
                     indent=2)[:2000])
    if args.report_only:
        return
    target["params"] = merge_subtrees(target["params"], source["params"],
                                      args.scopes)
    ckpt.save_checkpoint(args.out_dir, t_ep, target)
    print(f"[ckpt_tools] merged {args.scopes} -> {args.out_dir}")


if __name__ == "__main__":
    main()
