"""Optimizer construction: 3 parameter groups + warmup-aware schedules.

Capability parity with reference utils/torch_utils.py:318-346 smart_optimizer
(group 0: weights with decay; group 1: BN scales, no decay; group 2: biases,
no decay, separate warmup start) and the per-iteration warmup of
segment/train.py:521-529, re-expressed as optax transforms:

- optax.multi_transform with labels computed from param paths
- each group wraps inject_hyperparams(sgd/adam/...) so learning rate AND
  momentum follow schedules (momentum warmup included)
- linear / one_cycle epoch schedules (reference utils/general.py:683)
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, NamedTuple, Optional

import jax.numpy as jnp
import numpy as np
import optax

from yolo_dual_tpu.utils.general import LOGGER


def param_group_label(path) -> str:
    """g0: kernels with decay; g1: BN scales (no decay); g2: biases (no decay)."""
    names = [p.key if hasattr(p, "key") else str(p) for p in path]
    leaf = names[-1]
    if leaf == "bias":
        return "g2"
    if leaf == "scale" or (leaf == "kernel" and "bn" in names):
        return "g1"
    if leaf == "scale":
        return "g1"
    return "g0"


def one_cycle(y1: float, y2: float, steps: int) -> Callable[[float], float]:
    return lambda x: ((1 - math.cos(x * math.pi / steps)) / 2) * (y2 - y1) + y1


def build_lr_schedule(hyp: Dict, epochs: int, steps_per_epoch: int,
                      cos_lr: bool = False, group: str = "g0",
                      accumulate: int = 1) -> Callable:
    """Per-step schedule combining epoch decay + iteration warmup.

    Reference warmup (segment/train.py:521-529): over the first
    max(3·steps_per_epoch, 100) iterations, lr ramps linearly from
    0 (groups 0/1) or warmup_bias_lr (group 2) to lr0·lf(epoch).
    """
    lr0 = hyp.get("lr0", 0.01)
    lrf = hyp.get("lrf", 0.01)
    if cos_lr:
        lf = one_cycle(1.0, lrf, epochs)
    else:
        def lf(e):
            return (1 - e / epochs) * (1.0 - lrf) + lrf
    nw = max(round(hyp.get("warmup_epochs", 3.0) * steps_per_epoch), 100)
    warm_start = hyp.get("warmup_bias_lr", 0.1) if group == "g2" else 0.0

    def sched(step):
        # optax.MultiSteps advances the inner step only on "real" updates;
        # scale back to data iterations for warmup bookkeeping
        ni = step * accumulate
        e = jnp.minimum(ni / steps_per_epoch, epochs - 1e-6)
        # torch LambdaLR steps per epoch: lf evaluated at integer epoch
        base = lr0 * _lf_jnp(jnp.floor(e), epochs, lrf, cos_lr)
        frac = jnp.clip(ni / nw, 0.0, 1.0)
        warm = warm_start + (base - warm_start) * frac
        return jnp.where(ni < nw, warm, base)

    return sched


def _lf_jnp(e, epochs, lrf, cos_lr):
    if cos_lr:
        return ((1 - jnp.cos(e * math.pi / epochs)) / 2) * (lrf - 1.0) + 1.0
    return (1 - e / epochs) * (1.0 - lrf) + lrf


def build_momentum_schedule(hyp: Dict, steps_per_epoch: int, accumulate: int = 1) -> Callable:
    m0 = hyp.get("warmup_momentum", 0.8)
    m1 = hyp.get("momentum", 0.937)
    nw = max(round(hyp.get("warmup_epochs", 3.0) * steps_per_epoch), 100)

    def sched(step):
        ni = step * accumulate
        frac = jnp.clip(ni / nw, 0.0, 1.0)
        return m0 + (m1 - m0) * frac

    return sched


def smart_optimizer(params, name: str = "SGD", hyp: Optional[Dict] = None,
                    epochs: int = 100, steps_per_epoch: int = 100,
                    cos_lr: bool = False, accumulate: int = 1,
                    total_batch_size: Optional[int] = None,
                    nominal_batch_size: int = 64,
                    fused: bool = True) -> optax.GradientTransformation:
    """Build the 3-group optimizer. `accumulate` wraps it in optax.MultiSteps
    (the reference's gradient accumulation toward nominal batch 64,
    segment/train.py:444-446, :531-539).

    `fused=True` (default) computes the update over ONE raveled parameter
    vector — identical math (tested to 1e-6 against the per-leaf path) but
    O(1) elementwise kernels instead of O(leaves): the per-leaf
    multi_transform/inject_hyperparams chain costs ~4 tiny kernels per leaf
    per step, which on a ~300-leaf model is milliseconds of pure dispatch
    overhead inside an otherwise ~35 ms train step."""
    import jax
    hyp = dict(hyp or {})
    decay = hyp.get("weight_decay", 5e-4)
    if total_batch_size is not None:
        # reference scales weight decay with the effective batch
        decay = decay * total_batch_size * accumulate / nominal_batch_size

    if fused:
        return _fused_smart_optimizer(params, name, hyp, decay, epochs,
                                      steps_per_epoch, cos_lr, accumulate)

    labels = jax.tree_util.tree_map_with_path(lambda p, _: param_group_label(p), params)

    def group_tx(group: str):
        lr = build_lr_schedule(hyp, epochs, steps_per_epoch, cos_lr, group, accumulate)
        mom = build_momentum_schedule(hyp, steps_per_epoch, accumulate)
        wd = decay if group == "g0" else 0.0
        if name in ("SGD", "sgd"):
            @optax.inject_hyperparams
            def tx(learning_rate, momentum):
                chain = [optax.add_decayed_weights(wd)] if wd else []
                chain += [optax.trace(decay=momentum, nesterov=True),
                          optax.scale_by_learning_rate(learning_rate)]
                return optax.chain(*chain)
            return tx(learning_rate=lr, momentum=mom)
        if name in ("Adam", "adam"):
            return optax.inject_hyperparams(
                lambda learning_rate, b1: optax.chain(
                    optax.scale_by_adam(b1=b1, b2=0.999),
                    *( [optax.add_decayed_weights(wd)] if wd else [] ),
                    optax.scale_by_learning_rate(learning_rate)))(learning_rate=lr, b1=mom)
        if name in ("AdamW", "adamw"):
            return optax.inject_hyperparams(
                lambda learning_rate, b1: optax.chain(
                    optax.scale_by_adam(b1=b1, b2=0.999),
                    *( [optax.add_decayed_weights(wd)] if wd else [] ),
                    optax.scale_by_learning_rate(learning_rate)))(learning_rate=lr, b1=mom)
        if name in ("RMSProp", "rmsprop"):
            return optax.inject_hyperparams(
                lambda learning_rate, momentum: optax.chain(
                    optax.scale_by_rms(decay=0.9),
                    *( [optax.add_decayed_weights(wd)] if wd else [] ),
                    optax.scale_by_learning_rate(learning_rate)))(learning_rate=lr, momentum=mom)
        raise NotImplementedError(f"Optimizer {name} not implemented")

    tx = optax.multi_transform({g: group_tx(g) for g in ("g0", "g1", "g2")}, labels)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    n0 = sum(1 for l in jax.tree_util.tree_leaves(labels) if l == "g0")
    n1 = sum(1 for l in jax.tree_util.tree_leaves(labels) if l == "g1")
    n2 = sum(1 for l in jax.tree_util.tree_leaves(labels) if l == "g2")
    LOGGER.info(f"optimizer: {name}(lr={hyp.get('lr0', 0.01)}) with groups "
                f"{n0} weight(decay={decay:.5g}), {n1} weight(decay=0.0), {n2} bias")
    return tx


class FusedOptState(NamedTuple):
    """Optimizer state over ONE raveled vector spanning every param leaf.

    m1 = SGD momentum trace / Adam first moment (None when unused);
    m2 = Adam/RMSProp second moment (None when unused)."""

    count: Any
    m1: Any
    m2: Any


def _fused_smart_optimizer(params, name, hyp, decay, epochs, steps_per_epoch,
                           cos_lr, accumulate) -> optax.GradientTransformation:
    """Flat-vector twin of the per-leaf `smart_optimizer` chain.

    Group semantics are preserved elementwise: weight decay is premultiplied
    into a mask vector (g0 leaves only) and the bias group's warmup lr is
    selected by a boolean mask — everything else (trace/nesterov, Adam
    moments+bias correction, RMS) is the same math optax applies per leaf,
    evaluated once over the concatenated parameter vector. Kernel count per
    step drops from O(leaves)·4 to ~8 + one slice per leaf at unravel."""
    import jax
    from jax.flatten_util import ravel_pytree

    labels = jax.tree_util.tree_map_with_path(lambda p, _: param_group_label(p), params)
    label_leaves = jax.tree_util.tree_leaves(labels)
    param_leaves = jax.tree_util.tree_leaves(params)
    assert len(label_leaves) == len(param_leaves)
    wd_mask = np.concatenate([np.full(l.size, lab == "g0", np.float32)
                              for l, lab in zip(param_leaves, label_leaves)])
    bias_mask = np.concatenate([np.full(l.size, lab == "g2", bool)
                                for l, lab in zip(param_leaves, label_leaves)])
    wd_v = jnp.asarray(wd_mask * decay) if decay else None
    bias_v = jnp.asarray(bias_mask)

    lr01 = build_lr_schedule(hyp, epochs, steps_per_epoch, cos_lr, "g0", accumulate)
    lr2 = build_lr_schedule(hyp, epochs, steps_per_epoch, cos_lr, "g2", accumulate)
    mom_s = build_momentum_schedule(hyp, steps_per_epoch, accumulate)

    sgd = name in ("SGD", "sgd")
    adam = name in ("Adam", "adam", "AdamW", "adamw")
    rms = name in ("RMSProp", "rmsprop")
    if not (sgd or adam or rms):
        raise NotImplementedError(f"Optimizer {name} not implemented")

    def init_fn(params):
        flat, _ = ravel_pytree(params)
        z = jnp.zeros_like(flat)
        return FusedOptState(jnp.zeros((), jnp.int32),
                             z if (sgd or adam) else None,
                             z if (adam or rms) else None)

    def update_fn(grads, state, params=None):
        assert params is not None, "fused optimizer needs params (weight decay)"
        flat_g, _ = ravel_pytree(grads)
        flat_p, unravel = ravel_pytree(params)
        c = state.count
        # inject_hyperparams evaluates schedules at the pre-increment count
        lr = jnp.where(bias_v, lr2(c), lr01(c))
        m = mom_s(c)
        m1, m2 = state.m1, state.m2
        if sgd:
            g = flat_g + wd_v * flat_p if wd_v is not None else flat_g
            m1 = g + m * m1                      # optax.trace
            u = -(lr * (g + m * m1))             # nesterov
        elif adam:
            b2, eps = 0.999, 1e-8
            ci = (c + 1).astype(flat_g.dtype)
            m1 = m * m1 + (1.0 - m) * flat_g
            m2 = b2 * m2 + (1.0 - b2) * jnp.square(flat_g)
            mu_hat = m1 / (1.0 - jnp.power(m, ci))
            nu_hat = m2 / (1.0 - jnp.power(b2, ci))
            u = mu_hat / (jnp.sqrt(nu_hat) + eps)
            if wd_v is not None:
                u = u + wd_v * flat_p
            u = -(lr * u)
        else:  # rms
            m2 = 0.9 * m2 + 0.1 * jnp.square(flat_g)
            u = flat_g * jax.lax.rsqrt(m2 + 1e-8)
            if wd_v is not None:
                u = u + wd_v * flat_p
            u = -(lr * u)
        return unravel(u), FusedOptState(c + 1, m1, m2)

    tx = optax.GradientTransformation(init_fn, update_fn)
    if accumulate > 1:
        tx = optax.MultiSteps(tx, every_k_schedule=accumulate)
    n0 = int(wd_mask.sum() > 0 and sum(1 for l in label_leaves if l == "g0"))
    LOGGER.info(f"optimizer: fused {name}(lr={hyp.get('lr0', 0.01)}) over "
                f"{len(param_leaves)} leaves ({wd_mask.size} elements; "
                f"{n0} decayed leaves, decay={decay:.5g})")
    return tx


def freeze_layers(tx: optax.GradientTransformation, params,
                  freeze) -> optax.GradientTransformation:
    """Zero the UPDATES of frozen graph layers (reference --freeze,
    segment/train.py:429-431: requires_grad=False by 'backbone.{i}.' prefix).

    `freeze`: a single-element list [N] freezes layers 0..N-1; a longer list
    freezes exactly those layer indices (reference flag semantics). Params are
    keyed `model_{i}` at the tree root. Zeroing updates (not grads) keeps
    weight decay from shrinking frozen weights."""
    import jax
    frozen = set(freeze if len(freeze) > 1 else range(freeze[0]))
    if not frozen:
        return tx

    def is_frozen(path, _):
        top = getattr(path[0], "key", str(path[0]))
        # repeated layers are named model_{i}_{r}: the LAYER index is the
        # first numeric segment, not the last (rsplit would key by repeat)
        return top.startswith("model_") and int(top.split("_")[1]) in frozen

    mask = jax.tree_util.tree_map_with_path(is_frozen, params)
    n = sum(jax.tree_util.tree_leaves(
        jax.tree_util.tree_map(lambda m: int(m), mask)))
    LOGGER.info(f"freezing {sorted(frozen)} -> {n} frozen param leaves")

    def update_fn(grads, state, params=None):
        updates, state = tx.update(grads, state, params)
        updates = jax.tree_util.tree_map(
            lambda u, m: jnp.zeros_like(u) if m else u, updates, mask)
        return updates, state

    return optax.GradientTransformation(tx.init, update_fn)
