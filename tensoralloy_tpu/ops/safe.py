"""Gradient-safe power (reference `extension/grad_ops.py:16-74`):
``x**y`` whose derivatives are finite at x == 0 (plain `jnp.power`
produces NaN/Inf in first/second derivatives there, which poisons
force-loss gradients w.r.t. potential parameters)."""
from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_jvp
def safe_pow(x, y):
    return jnp.power(x, y)


@safe_pow.defjvp
def _safe_pow_jvp(primals, tangents):
    x, y = primals
    dx, dy = tangents
    primal = safe_pow(x, y)
    # d/dx x^y = y x^(y-1): finite unless x == 0 and y < 1
    dfdx = jnp.where(x != 0, y * safe_pow(jnp.where(x != 0, x, 1.0),
                                          y - 1.0), 0.0)
    # d/dy x^y = x^y ln x: define 0 at x <= 0
    safe_x = jnp.where(x > 0, x, 1.0)
    dfdy = jnp.where(x > 0, primal * jnp.log(safe_x), 0.0)
    return primal, dfdx * dx + dfdy * dy
