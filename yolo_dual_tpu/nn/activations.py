"""Activation zoo (capability parity with reference utils/activations.py:11-103).

All activations are plain jnp functions — XLA fuses them into the preceding
conv/matmul, so there is no need for "memory-efficient" variants here.
Pluggable via the model-YAML ``activation:`` key (reference models/yolo.py:303-305).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def silu(x):
    return jax.nn.silu(x)


def relu(x):
    return jax.nn.relu(x)


def leaky_relu(x, negative_slope: float = 0.1):
    return jax.nn.leaky_relu(x, negative_slope=negative_slope)


def hardswish(x):
    return jax.nn.hard_swish(x)


def mish(x):
    return x * jnp.tanh(jax.nn.softplus(x))


def frelu_pointwise(x):
    # FReLU requires a depthwise conv; handled as a module in common.py. Fallback: relu.
    return jax.nn.relu(x)


def sigmoid(x):
    return jax.nn.sigmoid(x)


def identity(x):
    return x


# Names accepted in model YAML `activation:` keys. Both our short names and the
# reference's `nn.XYZ()` spellings resolve here.
ACTIVATIONS = {
    "silu": silu,
    "relu": relu,
    "leaky_relu": leaky_relu,
    "leakyrelu": leaky_relu,
    "hardswish": hardswish,
    "mish": mish,
    "sigmoid": sigmoid,
    "identity": identity,
    "none": identity,
    # reference YAML spellings (models/hub/yolov5s-LeakyReLU.yaml uses nn.LeakyReLU(0.1))
    "nn.silu()": silu,
    "nn.relu()": relu,
    "nn.leakyrelu(0.1)": leaky_relu,
    "nn.hardswish()": hardswish,
}


def resolve_act(act):
    """Resolve an activation spec (True/False/None/str/callable) to a function.

    True -> default SiLU, False/None -> identity, str -> registry lookup.
    """
    if act is True:
        return silu
    if act is False or act is None:
        return identity
    if callable(act):
        return act
    key = str(act).strip().lower()
    if key in ACTIVATIONS:
        return ACTIVATIONS[key]
    raise KeyError(f"Unknown activation {act!r}; known: {sorted(set(ACTIVATIONS))}")
