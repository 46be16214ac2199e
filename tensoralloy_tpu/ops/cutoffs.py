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


def meam_radial_cutoff(r, rc, delta=None):
    """MEAM cutoff as a radial function: fc((rc - r)/delta).

    `delta` is the smoothing window (defaults to the full range rc, a
    ramp over [0, rc]); the function is 1 for r <= rc - delta and 0 at
    r >= rc.
    """
    d = rc if delta is None else delta
    return meam_cutoff((rc - r) / d)


def deepmd_radial_cutoff(r, rc, rcs=None):
    """DeePMD switching with rcs defaulting to 2/3 rc."""
    return deepmd_cutoff(r, rc, (2.0 / 3.0) * rc if rcs is None else rcs)


def tersoff_radial_cutoff(r, rc, d_frac=0.1):
    """Tersoff cutoff pinned so f == 0 exactly at r = rc:
    R = rc - D with half-width D = d_frac * rc."""
    D = d_frac * rc
    return tersoff_cutoff(r, rc - D, D)


# Registry keyed by the `cutoff_function` TOML option.  The reference
# restricts descriptor configs to cosine/polynomial
# (`choices.toml:25-29`) but defines all five (`nn/cutoff.py:20-143`);
# here every form is selectable.
CUTOFFS = {
    "cosine": cosine_cutoff,
    "polynomial": polynomial_cutoff,
    "meam": meam_radial_cutoff,
    "deepmd": deepmd_radial_cutoff,
    "tersoff": tersoff_radial_cutoff,
}


def apply_cutoff(name: str, r, rc, **kwargs):
    return CUTOFFS[name](r, rc, **kwargs)
