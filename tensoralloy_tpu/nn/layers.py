"""Dense-stack building block (the reference's `convolution1x1`,
`tensoralloy/nn/convolutional.py:154-300`, re-expressed functionally).

A "1x1 convolution over atoms" is just a dense layer applied to the
feature axis — on TPU this is a plain [atoms, features] @ [features, out]
matmul that XLA tiles onto the MXU, so no conv machinery is needed.

Params are plain pytrees: {"layers": [{"w": ..., "b": ...}, ...]}.
Supports the reference's resnet-dt residual (when consecutive widths
match, x_{l+1} = f(W x + b) * dt + x_l with trainable dt) and a fixed or
trainable output bias used for per-element static energies.
"""
from __future__ import annotations

from typing import List, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..precision import get_float_dtype


def softplus(x):
    return jax.nn.softplus(x)


def squareplus(x, b: float = 4.0):
    """x/2 + sqrt(x^2 + b)/2 (reference `nn/utils.py:39-74`)."""
    return 0.5 * (x + jnp.sqrt(jnp.square(x) + b))


ACTIVATIONS = {
    "softplus": softplus,
    "squareplus": squareplus,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "leaky_relu": jax.nn.leaky_relu,
    "elu": jax.nn.elu,
    "gelu": jax.nn.gelu,
    "sigmoid": jax.nn.sigmoid,
    "softsign": jax.nn.soft_sign,
}


def get_activation(name: str):
    return ACTIVATIONS[name]


def init_dense_stack(key, in_dim: int, hidden_sizes: Sequence[int],
                     out_dim: int = 1,
                     output_bias: bool = True,
                     output_bias_mean: float = 0.0,
                     resnet_dt: bool = False,
                     kernel_init: str = "he_normal",
                     dtype=None) -> dict:
    """Initialize an MLP param pytree: hidden layers + linear output."""
    dtype = dtype or get_float_dtype()
    sizes = [in_dim] + list(hidden_sizes) + [out_dim]
    layers = []
    for li in range(len(sizes) - 1):
        key, sub = jax.random.split(key)
        fan_in, fan_out = sizes[li], sizes[li + 1]
        if kernel_init == "he_normal":
            std = np.sqrt(2.0 / fan_in)
        elif kernel_init == "lecun_normal":
            std = np.sqrt(1.0 / fan_in)
        else:  # glorot
            std = np.sqrt(2.0 / (fan_in + fan_out))
        layer = {"w": (jax.random.normal(sub, (fan_in, fan_out)) *
                       std).astype(dtype)}
        is_output = li == len(sizes) - 2
        if not is_output:
            layer["b"] = jnp.zeros((fan_out,), dtype)
            if resnet_dt and fan_in == fan_out:
                layer["dt"] = jnp.full((fan_out,), 0.1, dtype)
        elif output_bias:
            layer["b"] = jnp.full((fan_out,), output_bias_mean, dtype)
        layers.append(layer)
    return {"layers": layers}


def apply_dense_stack(params: dict, x: jnp.ndarray,
                      activation: str = "softplus") -> jnp.ndarray:
    """Apply the MLP along the last axis of ``x``."""
    act = get_activation(activation)
    layers: List[dict] = params["layers"]
    for li, layer in enumerate(layers):
        h = x @ layer["w"]
        if "b" in layer:
            h = h + layer["b"]
        if li < len(layers) - 1:
            h = act(h)
            if "dt" in layer:
                h = h * layer["dt"] + x
        x = h
    return x


def l2_of_stack(params: dict) -> jnp.ndarray:
    """Sum of squared kernel weights (for L2 regularization)."""
    return sum(jnp.sum(jnp.square(layer["w"])) for layer in params["layers"])


def minmax_normalize_init(feature_dim: int, dtype=None) -> dict:
    """Running min-max input scaling state (reference
    `nn/atomic/atomic.py:157-195` keeps xlo/xhi as non-trainable vars)."""
    dtype = dtype or get_float_dtype()
    return {"xlo": jnp.zeros((feature_dim,), dtype),
            "xhi": jnp.ones((feature_dim,), dtype)}


def minmax_normalize_apply(state: dict, x: jnp.ndarray) -> jnp.ndarray:
    span = jnp.maximum(state["xhi"] - state["xlo"], 1e-12)
    return (x - state["xlo"]) / span
