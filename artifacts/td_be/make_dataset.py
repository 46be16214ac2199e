"""Synthetic finite-temperature Be database with an exactly known
generating free-energy model.

Why: the reference's finite-T family (`finite_temperature.py:211-357`)
was trained on AIMD/finite-T VASP data that is not bundled (the
snapshot carries ONE Be vasprun calculation and a 3-frame TS extxyz —
not trainable). This generator produces a physically-shaped dataset
whose ground truth is known in closed form, so a TD model's
eentropy/free_energy convergence and its F = U - TS force consistency
can be demonstrated and checked:

  E0(R)   = sum_pairs morse(r)                      (cold energy)
  rho_i   = sum_j exp(-r_ij / 1.5)                  (local density)
  gamma_i = g0 * (1 + 0.25 * tanh((rho_i - rho_ref) / 2))
  U       = E0 + sum_i gamma_i/2 * T^2              ('energy' label)
  S       = sum_i gamma_i * T                       ('eentropy')
  F       = U - T*S = E0 - sum_i gamma_i/2 * T^2    ('free_energy')
  forces  = -dF/dR, virial from dF/dcell            (TD convention:
            forces/stress differentiate the FREE energy)

gamma depends on the local environment, so entropy gradients
contribute to forces — the TD head must actually learn S(x, T).
"""
import sys
sys.path.insert(0, '/root/repo')
import os

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp

from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.data.crystals import hcp
from tensoralloy_tpu.neighbor import neighbor_list
from tensoralloy_tpu.io.sqlite import connect

rng = np.random.RandomState(611)
G0, RHO_REF = 0.05, 6.0

from functools import partial


@partial(jax.jit, static_argnums=(7,))
def _compute(pos, cell, i, j, S_, msk, T, n):
    def terms(pos, cell):
        vec = pos[j] + S_ @ cell - pos[i]
        r = jnp.sqrt(jnp.sum(vec * vec, axis=1) + 1e-18)
        x = jnp.exp(-1.4 * (r - 2.2))
        e0 = 0.5 * jnp.sum(msk * 0.4 * (x * x - 2 * x))
        rho = jax.ops.segment_sum(msk * jnp.exp(-r / 1.5), i,
                                  num_segments=n)
        gamma = G0 * (1 + 0.25 * jnp.tanh((rho - RHO_REF) / 2))
        return e0, gamma

    def free_energy(pos, cell):
        e0, gamma = terms(pos, cell)
        return e0 - jnp.sum(gamma) / 2 * T * T

    e0, gamma = terms(pos, cell)
    f, (gpos, gcell) = jax.value_and_grad(
        free_energy, argnums=(0, 1))(pos, cell)
    return f, e0, jnp.sum(gamma), gpos, gcell


def labels_for(s, T):
    i0, j0, shifts, _, _ = neighbor_list(s, 4.5)
    nij = len(i0)
    cap = 1 << (nij - 1).bit_length()     # bucket: stable jit shapes
    pad = cap - nij
    i = jnp.asarray(np.pad(i0, (0, pad)))
    j = jnp.asarray(np.pad(j0, (0, pad)))
    S_ = jnp.asarray(np.pad(np.asarray(shifts, np.float64),
                            ((0, pad), (0, 0))))
    msk = jnp.asarray(np.pad(np.ones(nij), (0, pad)))
    n = len(s)

    f, e0, gsum, gpos, gcell = _compute(
        jnp.asarray(s.positions), jnp.asarray(s.cell), i, j, S_, msk,
        jnp.asarray(float(T)), n)
    gamma_sum = float(gsum)
    pos = np.asarray(s.positions); cell = np.asarray(s.cell)
    vir = np.asarray(gpos).T @ pos + np.asarray(gcell).T @ cell
    vol = abs(float(np.linalg.det(cell)))
    st = vir / vol
    u = float(e0) + gamma_sum / 2 * T * T
    return {
        "energy": u,
        "eentropy": gamma_sum * T,
        "free_energy": float(f),
        "etemperature": float(T),
        "forces": -np.asarray(gpos),
        "stress": np.array([st[0, 0], st[1, 1], st[2, 2],
                            st[1, 2], st[0, 2], st[0, 1]]),
    }


def main():
    base = hcp("Be", 2.29, 3.58).repeat((3, 3, 2))
    out = []
    for k in range(420):
        eps = np.eye(3) * rng.uniform(-0.04, 0.04)
        sh = rng.uniform(-0.02, 0.02, 3)
        eps[0, 1] = eps[1, 0] = sh[0]
        eps[0, 2] = eps[2, 0] = sh[1]
        eps[1, 2] = eps[2, 1] = sh[2]
        fmat = np.eye(3) + eps
        cell = base.cell @ fmat.T
        pos = (base.positions @ fmat.T +
               rng.normal(0, rng.uniform(0.02, 0.15),
                          base.positions.shape))
        s = Structure.from_symbols(["Be"] * len(base), pos, cell,
                                   pbc=[True] * 3)
        T = rng.uniform(0.05, 1.0)          # electron temperature (eV)
        s.info.update(labels_for(s, T))
        out.append(s)
        if (k + 1) % 100 == 0:
            print(f"{k + 1}/420", flush=True)
    db_path = os.path.join(os.path.dirname(__file__), "td-Be.db")
    if os.path.exists(db_path):
        os.remove(db_path)
    db = connect(db_path)
    db.write_many(out)
    print("db:", db_path, len(db), db.elements)


if __name__ == "__main__":
    main()
