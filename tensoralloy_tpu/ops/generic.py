"""Generic analytic radial forms (reference
`tensoralloy/nn/eam/potentials/generic.py`), as pure jnp functions."""
from __future__ import annotations

import jax.numpy as jnp


def morse(r, d, gamma, r0):
    """d [exp(-2 g (r-r0)) - 2 exp(-g (r-r0))]."""
    x = gamma * (r - r0)
    return d * (jnp.exp(-2.0 * x) - 2.0 * jnp.exp(-x))


def buckingham(r, a, rho, c, order=6):
    """A exp(-r/rho) - C / r^order."""
    return a * jnp.exp(-r / rho) - c / r ** order


def density_exp(r, a, b, re):
    """a exp(-b (r/re - 1))."""
    return a * jnp.exp(-b * (r / re - 1.0))


def zhou_exp(r, a, b, c, re, order=20):
    """a exp(-b (r/re - 1)) / (1 + (r/re - c)^order)."""
    x = r / re
    return a * jnp.exp(-b * (x - 1.0)) / (1.0 + (x - c) ** order)


def power_exp(r, rl, pl):
    """exp(-(r/rl)^pl) (Oganov)."""
    return jnp.exp(-((r / rl) ** pl))


def mishin_cutoff(x):
    """psi(x) = z^4/(1+z^4) with z = relu(-x); 0 for x >= 0."""
    z = jnp.maximum(-x, 0.0)
    z4 = z ** 4
    return z4 / (1.0 + z4)


def mishin_polar(x, p1, p2, p3, rc, h):
    """(p1 exp(-p2 x) + p3) psi((x - rc)/h)."""
    return (p1 * jnp.exp(-p2 * x) + p3) * mishin_cutoff((x - rc) / h)
