"""Element-specific finite-temperature models (reference
`tensoralloy/nn/atomic/special/beryllium.py`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .finite_temperature import TemperatureDependentAtomicNN


class BeNN(TemperatureDependentAtomicNN):
    """Be free-electron-model entropy head: a fitted semi-analytic
    S0(T) = a T^2 f(T) + b T + c (1 - f(T)), f = relu(1 - 1.45 T)^2,
    modulated by a softplus NN deviation factor (the NN head output
    feeds the modulation, everything else is the parent model)."""

    _A, _B, _C, _D = -0.5718444, 0.83744317, -0.2110962, 1.45

    def _entropy_from_head(self, s_raw: jnp.ndarray,
                           t: jnp.ndarray) -> jnp.ndarray:
        ft = jnp.square(jax.nn.relu(1.0 - self._D * t))
        s0 = self._A * t * t * ft + self._B * t + self._C * (1.0 - ft)
        return s0 * jax.nn.softplus(s_raw)

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["class"] = "BeNN"
        return d
