"""Fused (flat-vector) optimizer/EMA parity vs the per-leaf optax path.

The fused path must be the SAME math as the multi_transform/inject_hyperparams
chain (reference utils/torch_utils.py:318-346 smart_optimizer semantics) —
only the kernel count changes. Trajectories are compared over several steps
with warmup active (exercises the per-group lr split) and weight decay on.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from yolo_dual_tpu.train.ema import ModelEMA
from yolo_dual_tpu.train.optim import smart_optimizer

HYP = dict(lr0=0.01, lrf=0.1, momentum=0.937, weight_decay=5e-4,
           warmup_epochs=1.0, warmup_momentum=0.8, warmup_bias_lr=0.1)


def _params(rng):
    def arr(*shape):
        return jnp.asarray(rng.normal(size=shape).astype(np.float32))
    return {
        "conv0": {"kernel": arr(3, 3, 4, 8), "bias": arr(8)},
        "bn0": {"scale": arr(8), "bias": arr(8)},
        "conv1": {"kernel": arr(1, 1, 8, 16), "bias": arr(16)},
        "bn1": {"scale": arr(16), "bias": arr(16)},
    }


def _run(tx, params, grads_seq):
    import optax
    state = tx.init(params)

    @jax.jit
    def step(params, state, grads):
        updates, state = tx.update(grads, state, params)
        return optax.apply_updates(params, updates), state

    out = []
    for g in grads_seq:
        params, state = step(params, state, g)
        out.append(params)
    return out


@pytest.mark.parametrize("name", ["SGD", "Adam", "AdamW", "RMSProp"])
def test_fused_matches_per_leaf(name, rng):
    params = _params(rng)
    grads_seq = [jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), params)
        for _ in range(6)]
    # steps_per_epoch tiny so warmup (nw=100 iters) stays active across all
    # steps AND the epoch-decay factor moves: both lr branches exercised
    kw = dict(hyp=HYP, epochs=3, steps_per_epoch=2)
    ref = _run(smart_optimizer(params, name, fused=False, **kw), params, grads_seq)
    got = _run(smart_optimizer(params, name, fused=True, **kw), params, grads_seq)
    for r, g in zip(ref, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7), r, g)


def test_fused_multisteps_matches(rng):
    params = _params(rng)
    grads_seq = [jax.tree_util.tree_map(
        lambda p: jnp.asarray(rng.normal(size=p.shape).astype(np.float32)), params)
        for _ in range(8)]
    kw = dict(hyp=HYP, epochs=2, steps_per_epoch=2, accumulate=4)
    ref = _run(smart_optimizer(params, "SGD", fused=False, **kw), params, grads_seq)
    got = _run(smart_optimizer(params, "SGD", fused=True, **kw), params, grads_seq)
    for r, g in zip(ref, got):
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-7), r, g)


def test_fused_ema_blend_matches_per_leaf(rng):
    ema = ModelEMA(decay=0.999, tau=10.0)
    variables = {"params": _params(rng), "batch_stats": {"bn0": {
        "mean": jnp.asarray(rng.normal(size=8).astype(np.float32)),
        "var": jnp.asarray(rng.uniform(0.5, 2.0, 8).astype(np.float32))}}}
    state = ema.init(variables)
    # legacy per-leaf blend computed by hand for comparison
    new_vars = jax.tree_util.tree_map(lambda v: v + 0.5, variables)
    got = ema.update(state, new_vars)
    d = ema.decay * (1.0 - np.exp(-1.0 / ema.tau))
    want = jax.tree_util.tree_map(lambda e, v: e * d + (1 - d) * v,
                                  variables, new_vars)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-7),
        want, got["ema"])
    assert int(got["updates"]) == 1


def test_fused_ema_mixed_dtype_falls_back(rng):
    ema = ModelEMA(decay=0.999, tau=10.0)
    variables = {"w": jnp.ones((4,), jnp.float32), "count": jnp.zeros((), jnp.int32)}
    state = ema.init(variables)
    got = ema.update(state, {"w": jnp.full((4,), 2.0), "count": jnp.ones((), jnp.int32)})
    assert got["ema"]["count"].dtype == jnp.int32 and int(got["ema"]["count"]) == 1
    assert np.all(np.asarray(got["ema"]["w"]) > 1.0)
