"""Training engine: jitted train step, EMA, grad accumulation, early stop.

Capability parity with the reference training loops (reference
segment/train.py:348-589, seg_diceloss_Resnet50.py:875-1215) re-designed
TPU-first:

- ONE compiled `train_step` contains forward, loss, backward, optimizer,
  EMA and BN-stat update — no per-step Python in the hot loop.
- Mixed precision = bf16 compute / f32 params via the model dtype policy
  (the XLA analog of torch.cuda.amp autocast); no loss scaling is needed in
  bf16 (same exponent range as f32), replacing the reference's GradScaler.
- Gradient accumulation is optax.MultiSteps inside the optimizer
  (reference accumulate = max(round(64/bs),1), segment/train.py:444-446).
- Data parallelism: the same step jitted under a Mesh with the batch sharded
  on the 'data' axis — XLA inserts gradient all-reduces (reference DDP).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct

from yolo_dual_tpu.train.ema import ModelEMA
from yolo_dual_tpu.utils.general import LOGGER


class TrainState(struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    ema: Any            # {'ema': variables, 'updates': int} or None
    step: jnp.ndarray


class EarlyStopping:
    """Stop after `patience` epochs without fitness improvement
    (reference utils/torch_utils.py:381-401)."""

    def __init__(self, patience: int = 100):
        self.best_fitness = 0.0
        self.best_epoch = 0
        self.patience = patience or float("inf")
        self.possible_stop = False

    def __call__(self, epoch: int, fitness: float) -> bool:
        if fitness >= self.best_fitness:
            self.best_epoch = epoch
            self.best_fitness = fitness
        delta = epoch - self.best_epoch
        self.possible_stop = delta >= (self.patience - 1)
        stop = delta >= self.patience
        if stop:
            LOGGER.info(f"Stopping early: no improvement in last {self.patience} epochs "
                        f"(best epoch {self.best_epoch}).")
        return stop


@dataclasses.dataclass
class Trainer:
    """Builds compiled train/eval steps for any of the four tasks."""

    model: Any                       # BaseModel wrapper (models/model.py)
    loss_fn: Any                     # task loss callable
    tx: Any                          # optax transformation
    ema: Optional[ModelEMA] = None
    task: str = "semantic"           # semantic | detect | segment | classify
    mesh: Any = None                 # jax.sharding.Mesh for data parallelism
    remat: bool = False              # jax.checkpoint the forward (trade FLOPs for HBM)
    accumulate: int = 1              # grad-accumulation factor (must match the
    # optax.MultiSteps every_k_schedule in `tx`): EMA advances only on real
    # optimizer steps, like the reference's once-per-step ModelEMA.update
    dropout: bool = False            # supply a per-step 'dropout' rng (heads
    # with nn.Dropout, e.g. Classify(dropout=...); folds the step counter
    # into a fixed key, so resume keeps the stream deterministic)

    def init_state(self, variables: dict) -> TrainState:
        params = variables["params"]
        batch_stats = variables.get("batch_stats", {})
        opt_state = self.tx.init(params)
        ema_state = self.ema.init({"params": params, "batch_stats": batch_stats}) if self.ema else None
        state = TrainState(params=params, batch_stats=batch_stats,
                           opt_state=opt_state, ema=ema_state,
                           step=jnp.zeros((), jnp.int32))
        if self.mesh is not None:
            from yolo_dual_tpu.parallel import replicate
            state = replicate(state, self.mesh)
        return state

    # ------------------------------------------------------------------
    def _forward_loss(self, params, batch_stats, batch, rngs=None):
        from yolo_dual_tpu.data.loader import normalize_image
        variables = {"params": params, "batch_stats": batch_stats}
        x = normalize_image(batch["image"])
        if self.remat:
            # rematerialize the backbone forward in the backward pass:
            # activations are recomputed instead of stored (HBM for FLOPs)
            apply = jax.checkpoint(
                lambda v, xx, **kw: self.model.module.apply(v, xx, **kw),
                static_argnums=())
        else:
            apply = self.model.module.apply
        if self.task == "semantic":
            out, upd = apply(variables, x, train=True,
                             mutable=["batch_stats"], rngs=rngs)
            from yolo_dual_tpu.nn.common import resize_bilinear
            if out.shape[1:3] != x.shape[1:3]:
                out = resize_bilinear(out, x.shape[1:3])
            loss, items = self.loss_fn(out, batch["mask"])
            items = jnp.stack(items)
        elif self.task == "detect":
            out, upd = apply(variables, x, train=True, decode=False,
                             mutable=["batch_stats"], rngs=rngs)
            loss, items = self.loss_fn(out, batch["targets"], batch["tmask"])
        elif self.task == "segment":
            out, upd = apply(variables, x, train=True, decode=False,
                             mutable=["batch_stats"], rngs=rngs)
            loss, items = self.loss_fn(out, batch["targets"], batch["tmask"], batch["masks"])
        elif self.task == "classify":
            out, upd = apply(variables, x, train=True,
                             mutable=["batch_stats"], rngs=rngs)
            loss, items = self.loss_fn(out, batch["label"])
            items = jnp.stack(items) if isinstance(items, (tuple, list)) else items
        else:
            raise ValueError(self.task)
        return loss, (items, upd.get("batch_stats", batch_stats))

    def make_train_step(self, donate: bool = False) -> Callable:
        # NOTE donation is opt-in: the remote-TPU (axon) backend in this
        # environment rejects donated buffers for large train graphs
        # (runtime INVALID_ARGUMENT); the memory saving (~params+opt state)
        # is negligible next to HBM at these model sizes.
        def step(state: TrainState, batch: Dict[str, jnp.ndarray]):
            rngs = ({"dropout": jax.random.fold_in(jax.random.PRNGKey(17), state.step)}
                    if self.dropout else None)
            grad_fn = jax.value_and_grad(self._forward_loss, has_aux=True)
            (loss, (items, new_bs)), grads = grad_fn(state.params, state.batch_stats,
                                                     batch, rngs)
            updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
            import optax
            params = optax.apply_updates(state.params, updates)
            ema_state = state.ema
            if self.ema is not None:
                new_ema = self.ema.update(state.ema, {"params": params, "batch_stats": new_bs})
                if self.accumulate > 1:
                    # params only change on MultiSteps boundaries; advancing
                    # the EMA ramp on no-op micro-steps would speed it up
                    # `accumulate`× vs the reference (advisor finding r1).
                    # Read the boundary from the MultiSteps counter itself —
                    # mini_step wraps to 0 exactly when the inner update just
                    # applied — so it stays in phase across --resume, where
                    # TrainState.step restarts at 0 but the restored
                    # opt_state keeps its mid-cycle value (advisor r2).
                    if hasattr(opt_state, "mini_step"):
                        boundary = opt_state.mini_step == 0
                    else:
                        boundary = (state.step + 1) % self.accumulate == 0
                    new_ema = jax.tree_util.tree_map(
                        lambda n, o: jnp.where(boundary, n, o), new_ema, state.ema)
                ema_state = new_ema
            new_state = state.replace(params=params, batch_stats=new_bs,
                                      opt_state=opt_state, ema=ema_state,
                                      step=state.step + 1)
            return new_state, {"loss": loss, "items": items}

        if self.mesh is not None:
            from jax.sharding import NamedSharding, PartitionSpec as P
            from yolo_dual_tpu.parallel.mesh import _SPATIAL_KEYS, batch_spec
            data = NamedSharding(self.mesh, P("data"))
            spatial = "space" in self.mesh.axis_names

            def constrain(key, x):
                if jnp.ndim(x) < 1:
                    return x
                if spatial and key in _SPATIAL_KEYS and jnp.ndim(x) >= 3:
                    # image/mask H sharded over 'space' (spatial partitioning;
                    # XLA emits the conv halo exchanges)
                    sh = NamedSharding(self.mesh, batch_spec(self.mesh, jnp.ndim(x)))
                else:
                    sh = data
                return jax.lax.with_sharding_constraint(x, sh)

            def sharded_step(state, batch):
                batch = {k: constrain(k, v) for k, v in batch.items()}
                return step(state, batch)
            return jax.jit(sharded_step, donate_argnums=(0,) if donate else ())
        return jax.jit(step, donate_argnums=(0,) if donate else ())

    def make_eval_step(self) -> Callable:
        def step(state: TrainState, batch):
            from yolo_dual_tpu.data.loader import normalize_image
            variables = state.ema["ema"] if (self.ema and state.ema is not None) else \
                {"params": state.params, "batch_stats": state.batch_stats}
            x = normalize_image(batch["image"])
            if self.task == "semantic":
                out = self.model.module.apply(variables, x, train=False)
                from yolo_dual_tpu.nn.common import resize_bilinear
                if out.shape[1:3] != x.shape[1:3]:
                    out = resize_bilinear(out, x.shape[1:3])
                return out
            if self.task in ("detect", "segment"):
                return self.model.module.apply(variables, x, train=False)
            return self.model.module.apply(variables, x, train=False)
        return jax.jit(step)


def classify_loss(logits, labels, label_smoothing: float = 0.0):
    """smartCrossEntropyLoss equivalent (reference classify/train.py +
    utils/torch_utils.py smart loss)."""
    import optax
    nc = logits.shape[-1]
    onehot = jax.nn.one_hot(labels, nc)
    if label_smoothing:
        onehot = onehot * (1 - label_smoothing) + label_smoothing / nc
    loss = optax.softmax_cross_entropy(logits, onehot).mean()
    acc = (logits.argmax(-1) == labels).mean()
    return loss, (loss, acc)
