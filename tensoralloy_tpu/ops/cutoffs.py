"""Smooth cutoff functions (reference `tensoralloy/nn/cutoff.py:20-143`).

All are pure jnp functions of the scaled/unscaled distance and vanish
(or saturate) outside the cutoff; shapes broadcast.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def cosine_cutoff(r, rc):
    """Behler cosine cutoff: 0.5 (cos(pi min(r/rc, 1)) + 1)."""
    z = jnp.minimum(r / rc, 1.0)
    return 0.5 * (jnp.cos(z * np.pi) + 1.0)


def polynomial_cutoff(r, rc, gamma: float = 5.0):
    """Peterson polynomial cutoff:
    1 + g (r/rc)^(g+1) - (g+1)(r/rc)^g, clamped at r = rc."""
    z = jnp.minimum(r / rc, 1.0)
    return 1.0 + gamma * z ** (gamma + 1.0) - (gamma + 1.0) * z ** gamma


def meam_cutoff(x):
    """MEAM cutoff of the *scaled* coordinate x in [0, 1]."""
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.square(1.0 - (1.0 - x) ** 4)


def deepmd_cutoff(r, rc, rcs):
    """DeePMD switching: 1/r inside rcs, smooth cosine decay to rc."""
    z = jnp.clip((r - rcs) / (rc - rcs), 0.0, 1.0)
    recip = jnp.where(r > 0, 1.0 / jnp.where(r > 0, r, 1.0), 0.0)
    return recip * (0.5 * jnp.cos(np.pi * z) + 0.5)


def tersoff_cutoff(r, R, D):
    """Tersoff cutoff: 1 for r<R-D, 0 for r>R+D, sine ramp between."""
    z = jnp.clip((r - R) / D, -1.0, 1.0)
    return 0.5 - 0.5 * jnp.sin(0.5 * np.pi * z)


CUTOFFS = {
    "cosine": cosine_cutoff,
    "polynomial": polynomial_cutoff,
}


def apply_cutoff(name: str, r, rc):
    return CUTOFFS[name](r, rc)
