"""Differentiable cubic-spline evaluation on uniform grids.

The reference ships (but is missing in the snapshot) a C/C++
interpolation extension used by its `spline@...` potentials
(`setup.py:11`, `training.py:259-263`). Here the spline COEFFICIENTS
are precomputed on the host (scipy) and evaluation is pure jnp:
piecewise cubic via gather of coefficient rows — C2-smooth, so forces
and Hessians from `jax.grad` are well-defined.
"""
from __future__ import annotations


import jax.numpy as jnp
import numpy as np


class UniformCubicSpline:
    """y(x) tabulated on x = x0 + i*dx, i in [0, n)."""

    def __init__(self, y: np.ndarray, x0: float, dx: float,
                 bc_type: str = "not-a-knot",
                 extrapolate_zero: bool = True):
        from scipy.interpolate import CubicSpline
        y = np.asarray(y, dtype=np.float64)
        self.n = len(y)
        self.x0 = float(x0)
        self.dx = float(dx)
        self.extrapolate_zero = extrapolate_zero
        x = x0 + np.arange(self.n) * dx
        cs = CubicSpline(x, y, bc_type=bc_type)
        # coefficients per interval: value = sum_k c[k, i] * t^(3-k)
        self.coeffs = np.ascontiguousarray(cs.c.T)  # [n-1, 4]
        self.y = y

    def __call__(self, r):
        """Evaluate at jnp array `r` (any shape)."""
        c = jnp.asarray(self.coeffs, r.dtype)
        idx_f = (r - self.x0) / self.dx
        idx = jnp.clip(idx_f.astype(jnp.int32), 0, self.n - 2)
        t = r - (self.x0 + idx.astype(r.dtype) * self.dx)
        rows = c[idx]                                   # [..., 4]
        val = ((rows[..., 0] * t + rows[..., 1]) * t +
               rows[..., 2]) * t + rows[..., 3]
        if self.extrapolate_zero:
            upper = self.x0 + (self.n - 1) * self.dx
            val = jnp.where(r >= upper, 0.0, val)
        return val
