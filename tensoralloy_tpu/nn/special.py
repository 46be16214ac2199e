"""Element-specific finite-temperature models (reference
`tensoralloy/nn/atomic/special/beryllium.py`)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .finite_temperature import TemperatureDependentAtomicNN
from .layers import apply_dense_stack


class BeNN(TemperatureDependentAtomicNN):
    """Be free-electron-model entropy head: a fitted semi-analytic
    S0(T) = a T^2 f(T) + b T + c (1 - f(T)), f = relu(1 - 1.45 T)^2,
    modulated by a softplus NN deviation factor."""

    _A, _B, _C, _D = -0.5718444, 0.83744317, -0.2110962, 1.45

    def _atomic_heads(self, params, features):
        g = self.descriptors(features, params)
        t = features["etemperature"]
        masks = features["atom_masks"]
        ft = jnp.square(jax.nn.relu(1.0 - self._D * t))
        s0 = self._A * t * t * ft + self._B * t + self._C * (1.0 - ft)
        u_out = jnp.zeros((self.n_atoms_vap,), g.dtype)
        s_out = jnp.zeros((self.n_atoms_vap,), g.dtype)
        for e in self.elements:
            lo, cnt = self.layout[e]
            if cnt == 0:
                continue
            x = jax.lax.dynamic_slice_in_dim(g, lo, cnt, axis=0)
            if self.minmax_scale:
                norm = jax.lax.stop_gradient(params[e]["norm"])
                span = jnp.maximum(norm["xhi"] - norm["xlo"], 1e-12)
                x = (x - norm["xlo"]) / span
            h = apply_dense_stack(params[e]["trunk"], x,
                                  self.ft_activation)
            tcol = jnp.full((cnt, 1), t, h.dtype)
            ht = jnp.concatenate([h, tcol], axis=1)
            u = apply_dense_stack(params[e]["head_u"], ht,
                                  self.activation)[:, 0]
            deviation = jax.nn.softplus(apply_dense_stack(
                params[e]["head_s"], ht, self.activation)[:, 0])
            s = s0 * deviation
            u_out = jax.lax.dynamic_update_slice_in_dim(u_out, u, lo, 0)
            s_out = jax.lax.dynamic_update_slice_in_dim(s_out, s, lo, 0)
        u_out = u_out * masks
        s_out = s_out * masks
        return {"energy": u_out, "eentropy": s_out,
                "free_energy": u_out - t * s_out}

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["class"] = "BeNN"
        return d
