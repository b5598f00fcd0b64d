"""Training loop: jit'd step, optax Adam + multistep LR, checkpointing.

Parity targets: tools/train.py:45-231 (epoch loop, AMP, best-val tracking)
and train_utils.py (Adam eps 1e-10, weight decay 1e-4, multistep gamma 0.1 —
see hypes optimizer/lr_scheduler blocks, e.g. lidar_pyramid.yaml:198-208).

TPU-first: labels are assigned on device inside the jitted step (no CPU
label workers); data parallelism comes from NamedSharding over a "data" mesh
axis — the same step function runs on 1 chip or N (see parallel/).
"""

import dataclasses
import functools
from typing import Any, Optional

import flax
from flax.traverse_util import flatten_dict, unflatten_dict
import jax
import jax.numpy as jnp
import optax

from quantv2x_tpu.data import anchors as anc
from quantv2x_tpu.loss.detection_loss import (
    LossCfg,
    detection_loss,
    pyramid_occupancy_loss,
)


@flax.struct.dataclass
class TrainState:
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jnp.ndarray
    extra_vars: Any = flax.core.FrozenDict()  # e.g. codebook_stats


@dataclasses.dataclass(frozen=True)
class OptimCfg:
    lr: float = 0.002
    eps: float = 1e-10
    weight_decay: float = 1e-4
    lr_milestones: tuple = (15, 25)   # epochs
    lr_gamma: float = 0.1
    steps_per_epoch: int = 1000
    grad_clip: Optional[float] = None


def make_optimizer(cfg: OptimCfg, trainable_mask=None):
    """trainable_mask: optional pytree-of-bool (or fn params->pytree) marking
    which params get updates — the stage-2 codebook-only training path
    (parity: tools/train_stage2.py:67-95 freezes everything but
    model.codebook)."""
    boundaries = {
        m * cfg.steps_per_epoch: cfg.lr_gamma for m in cfg.lr_milestones
    }
    schedule = optax.piecewise_constant_schedule(cfg.lr, boundaries)
    txs = []
    if cfg.grad_clip:
        txs.append(optax.clip_by_global_norm(cfg.grad_clip))
    txs.append(
        optax.adamw(schedule, eps=cfg.eps, weight_decay=cfg.weight_decay)
    )
    tx = optax.chain(*txs)
    if trainable_mask is not None:
        labels = jax.tree.map(
            lambda t: "train" if t else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx


def path_mask(params, predicate):
    """Pytree-of-bool from a predicate over 'a/b/c' param path strings."""
    return jax.tree_util.tree_map_with_path(
        lambda path, _: predicate("/".join(p.key for p in path)), params
    )


def create_train_state(model, rng, sample_batch, optim_cfg: OptimCfg,
                       trainable_predicate=None, init_rngs=None):
    # jitted init: eager init dispatches thousands of tiny ops (pathological
    # over a remote-TPU tunnel)
    rngs = dict(init_rngs or {}, params=rng)
    variables = jax.jit(
        lambda b: model.init(rngs, b, train=True)
    )(sample_batch)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    extra_vars = {k: v for k, v in variables.items()
                  if k not in ("params", "batch_stats")}
    mask = (
        path_mask(params, trainable_predicate)
        if trainable_predicate is not None else None
    )
    tx = make_optimizer(optim_cfg, mask)
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
        extra_vars=extra_vars,
    ), tx


def assign_batch_targets(batch, anchor_pack):
    """vmapped on-device label assignment for a whole batch."""
    anchors, slot_cls, m_thr, u_thr = anchor_pack
    return jax.vmap(
        lambda b, c, m: anc.assign_targets(b, c, m, anchors, slot_cls, m_thr, u_thr)
    )(batch["gt_boxes"], batch["gt_classes"], batch["gt_mask"])


def make_train_step(model, tx, anchor_pack, loss_cfg: LossCfg,
                    occ_supervision: bool = True,
                    trainable_predicate=None,
                    apply_train_kwargs=None):
    """Returns a jit-compatible (state, batch) -> (state, metrics) function.

    trainable_predicate (same callable as create_train_state's): when
    given, batch_stats of FROZEN scopes keep their old values instead of
    absorbing current-data statistics — otherwise a frozen donor branch
    (--init_from + --trainable) silently drifts from the donor even
    though its weights never update (the reference avoids this by
    putting fix_modules in eval()).

    apply_train_kwargs: overrides the model.apply train flags (default
    {"train": True}). Codebook stage 2 passes
    {"train": False, "compressor_train": True} so the FROZEN detector
    runs in eval mode (BN normalizes with the stage-1 running stats, and
    the codebook trains on the true eval-time feature distribution)
    while only the compressor takes the gumbel soft path — round-4
    stage-2 ran the whole model in train mode and the 'frozen' detector
    silently co-adapted through its BatchNorm buffers."""
    apply_train_kwargs = apply_train_kwargs or {"train": True}

    def loss_fn(params, batch_stats, extra_vars, batch, labels, rng):
        variables = {"params": params, "batch_stats": batch_stats, **extra_vars}
        out, mutated = model.apply(
            variables, batch, **apply_train_kwargs,
            mutable=["batch_stats"] + list(extra_vars),
            rngs={"gumbel": rng},
        )
        total, metrics = detection_loss(out, labels, loss_cfg)
        if occ_supervision and out.get("occ_maps"):
            occ = pyramid_occupancy_loss(out["occ_maps"], labels, loss_cfg)
            total = total + occ
            metrics = dict(metrics, occ_loss=occ)
        if "aux_loss" in out:
            total = total + out["aux_loss"]
            metrics = dict(metrics, aux_loss=out["aux_loss"])
        if "unc_preds" in out:
            # uncertainty head trains with the KL family (aux_losses);
            # dim inferred from the head width vs the 7-dof reg head
            from quantv2x_tpu.loss.aux_losses import (
                UncertaintyCfg, uncertainty_loss)
            S = out["reg_preds"].shape[-1] // 7
            dim = out["unc_preds"].shape[-1] // S
            unc = uncertainty_loss(out, labels, UncertaintyCfg(dim=dim))
            total = total + unc
            metrics = dict(metrics, unc_loss=unc)
        metrics = dict(metrics, total_loss=total)
        return total, (mutated, metrics)

    def train_step(state: TrainState, batch):
        labels = assign_batch_targets(batch, anchor_pack)
        rng = jax.random.fold_in(jax.random.PRNGKey(17), state.step)
        extra = dict(state.extra_vars)
        grads, (mutated, metrics) = jax.grad(loss_fn, has_aux=True)(
            state.params, state.batch_stats, extra, batch, labels, rng,
        )
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        new_extra = {k: v for k, v in mutated.items() if k != "batch_stats"}
        # .get: norm-free models (LayerNorm/GroupNorm only) have no
        # batch_stats collection to mutate
        new_bs = mutated.get("batch_stats", state.batch_stats)
        if trainable_predicate is not None and state.batch_stats:
            flat_old = flatten_dict(state.batch_stats)
            flat_new = flatten_dict(new_bs)
            kept = {
                k: (v if trainable_predicate("/".join(k)) else flat_old[k])
                for k, v in flat_new.items()
            }
            new_bs = unflatten_dict(kept)
        return TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
            extra_vars={**extra, **new_extra},
        ), metrics

    return train_step


def make_eval_step(model, anchor_pack, loss_cfg: LossCfg):
    def eval_step(state: TrainState, batch):
        labels = assign_batch_targets(batch, anchor_pack)
        out = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats,
             **dict(state.extra_vars)},
            batch, train=False,
        )
        total, metrics = detection_loss(out, labels, loss_cfg)
        return dict(metrics, total_loss=total), out

    return eval_step
