"""Derived physical properties by automatic differentiation.

Reference math (`tensoralloy/nn/basic.py:276-421`):
  forces  F = -dE/dR
  virial  W = (dE/dR)^T R + (dE/dh)^T h        (h = cell rows)
  stress  sigma = W / V (eV/A^3), Voigt order [xx, yy, zz, yz, xz, xy]
  total pressure P = -tr(sigma)/3 in GPa
  hessian H = d2E/dR2

In JAX these are one `jax.grad` (or `jax.hessian`) of the pure energy
function — no graph re-traversal machinery needed.
"""
from __future__ import annotations

from typing import Callable, Dict

import jax
import jax.numpy as jnp

# eV/A^3 -> GPa
EV_ANGSTROM3_TO_GPA = 160.21766208
GPa = 1.0 / EV_ANGSTROM3_TO_GPA  # 1 GPa in eV/A^3


def full_to_voigt(s: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([s[..., 0, 0], s[..., 1, 1], s[..., 2, 2],
                      0.5 * (s[..., 1, 2] + s[..., 2, 1]),
                      0.5 * (s[..., 0, 2] + s[..., 2, 0]),
                      0.5 * (s[..., 0, 1] + s[..., 1, 0])], axis=-1)


def make_efs_fn(energy_fn: Callable,
                extras_fn: Callable = None) -> Callable:
    """energy_fn(params, features) -> scalar.

    Returns fn(params, features) -> dict with energy, forces
    [n_vap, 3], virial/stress [3,3], stress_voigt [6], total_pressure
    (GPa); `extras_fn(params, features) -> dict` outputs (e.g. atomic
    energies, finite-T heads) are merged in so everything compiles into
    ONE executable (critical over slow host<->device links).
    """

    def efs(params, features) -> Dict[str, jnp.ndarray]:
        pos = features["positions"]
        cell = features["cell"]

        def e_of(p, h):
            f = dict(features)
            f["positions"] = p
            f["cell"] = h
            return energy_fn(params, f)

        energy, (gpos, gcell) = jax.value_and_grad(
            e_of, argnums=(0, 1))(pos, cell)
        forces = -gpos
        virial = gpos.T @ pos + gcell.T @ cell
        volume = jnp.abs(jnp.linalg.det(cell))
        stress = virial / volume
        voigt = full_to_voigt(stress)
        pressure = -jnp.trace(stress) / 3.0 * EV_ANGSTROM3_TO_GPA
        out = {"energy": energy, "forces": forces, "virial": virial,
               "stress": stress, "stress_voigt": voigt,
               "total_pressure": pressure}
        if extras_fn is not None:
            out.update(extras_fn(params, features))
        return out

    return efs


def make_hessian_fn(energy_fn: Callable) -> Callable:
    """-> fn(params, features) -> [n_vap, 3, n_vap, 3] Hessian."""

    def hess(params, features):
        pos = features["positions"]

        def e_of(p):
            f = dict(features)
            f["positions"] = p
            return energy_fn(params, f)

        return jax.hessian(e_of)(pos)

    return hess
