"""Device-resident molecular dynamics.

The reference delegates MD to LAMMPS/ASE through its exporters; here
the trained potential IS a jittable function, so the whole integrator
runs on the TPU: velocity-Verlet steps inside one `jax.lax.scan`
(forces re-derived by `jax.grad` each step), with the host only
rebuilding the neighbor list between chunks. No per-step host-device
round trips.

Units: positions A, velocities A/fs, masses amu, energies eV,
time fs. eV/A / amu = 9.64853e-3 A/fs^2.
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .atoms import Structure

# (eV/A) / amu in A/fs^2
FORCE_TO_ACC = 9.648533290731905e-3
# Boltzmann constant in eV/K
KB = 8.617330337217213e-05


def maxwell_boltzmann_velocities(masses: np.ndarray, temperature: float,
                                 seed: int = 0) -> np.ndarray:
    """[N, 3] velocities (A/fs) at `temperature` K, COM removed."""
    rng = np.random.RandomState(seed)
    sigma = np.sqrt(KB * temperature / masses * FORCE_TO_ACC)
    v = rng.normal(size=(len(masses), 3)) * sigma[:, None]
    v -= np.average(v, axis=0, weights=masses)
    return v


class VelocityVerlet:
    """NVE dynamics for one structure with a fixed stoichiometry.

    The pair list is built with a `skin` margin and reused for
    `chunk_size` jitted steps; call `run(n_steps)` and it handles the
    rebuild cadence. Choose `chunk_size * timestep * v_max < skin / 2`.
    """

    def __init__(self, model, params, structure: Structure,
                 timestep: float = 1.0, skin: float = 1.0,
                 chunk_size: int = 20,
                 temperature: Optional[float] = None, seed: int = 0,
                 target_temperature: Optional[float] = None,
                 friction: Optional[float] = None,
                 device_nl: bool = False):
        """`temperature` seeds Maxwell-Boltzmann initial velocities
        (NVE). Setting BOTH `target_temperature` (K) and `friction`
        (1/fs) switches the integrator to the BAOAB Langevin
        splitting (Leimkuhler & Matthews 2013) — NVT sampling with
        the same one-force-evaluation-per-step cost, noise generated
        on device inside the scan.

        `device_nl=True` moves the between-chunk neighbor-list rebuild
        onto the device too (`transform/device_nl.py`): each jitted
        chunk re-bins atoms, rebuilds the skinned pair list, and
        integrates `chunk_size` steps — positions/velocities never
        leave the device, the host only checks the overflow
        diagnostics (two scalars per chunk)."""
        self.base_model = model
        self.params = params
        self.structure = structure.copy()
        self.timestep = float(timestep)
        self.skin = float(skin)
        self.chunk_size = int(chunk_size)
        self.target_temperature = target_temperature
        self.friction = friction
        if (target_temperature is None) != (friction is None):
            raise ValueError("Langevin NVT needs both "
                             "target_temperature and friction")
        self._key = jax.random.PRNGKey(seed + 7919)

        self.model = model.clone_for(Counter(structure.symbols))
        self.fz = model.featurizer
        self.vap = self.fz.make_vap(structure,
                                    Counter(structure.symbols))
        masses_local = structure.masses
        self.masses_vap = np.zeros(self.model.n_atoms_vap)
        self.masses_vap[self.vap.local_to_vap] = masses_local
        self.masses_vap[0] = 1.0     # virtual atom: inert unit mass

        velocities = (maxwell_boltzmann_velocities(
            masses_local, temperature, seed)
            if temperature else np.zeros((len(structure), 3)))
        self.velocities_vap = np.zeros((self.model.n_atoms_vap, 3))
        self.velocities_vap[self.vap.local_to_vap] = velocities

        self._scan = None
        self._nij_cached = -1
        self._nl = None
        if device_nl:
            from .calculator import model_feature_layout
            from .transform.device_nl import DeviceNeighborList
            self._nl = DeviceNeighborList(
                self.fz, self.vap, structure,
                cutoff=self.fz.max_cutoff + self.skin,
                layout=model_feature_layout(self.model))

    # ------------------------------------------------------------------
    def _build_features(self, positions_local: np.ndarray) -> Dict:
        from .calculator import model_feature_layout
        s = self.structure.copy()
        s.positions = positions_local
        pad = lambda n: max(256, 1 << int(np.ceil(np.log2(max(n, 1)))))
        wpad = lambda n: max(32, 1 << int(np.ceil(np.log2(max(n, 1)))))
        feats = self.fz.featurize(
            s, self.vap, pair_bucket=pad, trip_bucket=pad,
            nnl_bucket=wpad, ntl_bucket=wpad,
            dtype=np.float64 if jax.config.jax_enable_x64
            else np.float32,
            layout=model_feature_layout(self.model))
        return feats

    def _make_scan(self):
        model, dt = self.model, self.timestep
        masses = jnp.asarray(self.masses_vap)[:, None]
        mask = jnp.asarray(self.vap.atom_masks)[:, None]
        langevin = self.friction is not None
        if langevin:
            c1 = float(np.exp(-self.friction * dt))
            c2 = float(np.sqrt(1.0 - c1 * c1))
            # thermal velocity scale per atom (A/fs)
            sigma_v = jnp.sqrt(KB * self.target_temperature / masses *
                               FORCE_TO_ACC) * mask

        def forces_of(feats, pos):
            f = dict(feats)
            f["positions"] = pos
            g = jax.grad(lambda p: model.variational_energy(
                self.params, dict(f, positions=p)))(pos)
            return -g * f["atom_masks"][:, None]

        def step(carry, _):
            # carry the end-of-step acceleration: both integrators need
            # ONE new force evaluation per step, not two
            pos, vel, acc, key, feats = carry
            if langevin:
                # BAOAB: B(half kick) A(half drift) O(OU noise)
                #        A(half drift) B(half kick)
                vel = vel + 0.5 * dt * acc
                pos = pos + 0.5 * dt * vel
                key, sub = jax.random.split(key)
                xi = jax.random.normal(sub, vel.shape, vel.dtype)
                vel = c1 * vel + c2 * sigma_v * xi
                pos = pos + 0.5 * dt * vel
                acc_new = forces_of(feats, pos) / masses * FORCE_TO_ACC
                vel = vel + 0.5 * dt * acc_new
                return (pos, vel, acc_new, key, feats), None
            vel_half = vel + 0.5 * dt * acc
            pos_new = pos + dt * vel_half
            acc_new = forces_of(feats, pos_new) / masses * FORCE_TO_ACC
            vel_new = vel_half + 0.5 * dt * acc_new
            return (pos_new, vel_new, acc_new, key, feats), None

        def chunk(pos, vel, key, feats, n):
            acc0 = forces_of(feats, pos) / masses * FORCE_TO_ACC
            (pos, vel, _, key, _), _ = jax.lax.scan(
                step, (pos, vel, acc0, key, feats), None, length=n)
            f = dict(feats)
            f["positions"] = pos
            energy = model.variational_energy(self.params, f)
            ke = 0.5 * jnp.sum(masses * jnp.square(vel) * mask) / \
                FORCE_TO_ACC
            return pos, vel, key, energy, ke

        return jax.jit(chunk, static_argnames="n")

    def _make_scan_device(self):
        """Chunk kernel with the neighbor rebuild INSIDE the jit: bin,
        compact, integrate `n` steps — one device call per chunk."""
        model, dt = self.model, self.timestep
        builder = self._nl
        masses = jnp.asarray(self.masses_vap)[:, None]
        mask = jnp.asarray(self.vap.atom_masks)[:, None]
        langevin = self.friction is not None
        if langevin:
            c1 = float(np.exp(-self.friction * dt))
            c2 = float(np.sqrt(1.0 - c1 * c1))
            sigma_v = jnp.sqrt(KB * self.target_temperature / masses *
                               FORCE_TO_ACC) * mask

        def forces_of(feats, pos):
            f = dict(feats)
            f["positions"] = pos
            g = jax.grad(lambda p: model.variational_energy(
                self.params, dict(f, positions=p)))(pos)
            return -g * f["atom_masks"][:, None]

        def step(carry, _):
            pos, vel, acc, key, feats = carry
            if langevin:
                vel = vel + 0.5 * dt * acc
                pos = pos + 0.5 * dt * vel
                key, sub = jax.random.split(key)
                xi = jax.random.normal(sub, vel.shape, vel.dtype)
                vel = c1 * vel + c2 * sigma_v * xi
                pos = pos + 0.5 * dt * vel
                acc_new = forces_of(feats, pos) / masses * FORCE_TO_ACC
                vel = vel + 0.5 * dt * acc_new
                return (pos, vel, acc_new, key, feats), None
            vel_half = vel + 0.5 * dt * acc
            pos_new = pos + dt * vel_half
            acc_new = forces_of(feats, pos_new) / masses * FORCE_TO_ACC
            vel_new = vel_half + 0.5 * dt * acc_new
            return (pos_new, vel_new, acc_new, key, feats), None

        etemp0 = float(self.structure.info.get("etemperature", 0.0) or 0.0)

        def chunk(pos, vel, key, n):
            feats, diag = builder._build(
                pos, jnp.asarray(builder.cell0, pos.dtype),
                jnp.asarray(etemp0, pos.dtype))
            acc0 = forces_of(feats, pos) / masses * FORCE_TO_ACC
            (pos, vel, _, key, _), _ = jax.lax.scan(
                step, (pos, vel, acc0, key, feats), None, length=n)
            f = dict(feats)
            f["positions"] = pos
            energy = model.variational_energy(self.params, f)
            ke = 0.5 * jnp.sum(masses * jnp.square(vel) * mask) / \
                FORCE_TO_ACC
            return pos, vel, key, energy, ke, diag

        return jax.jit(chunk, static_argnames="n")

    def _run_device(self, n_steps: int):
        dtype = (np.float64 if jax.config.jax_enable_x64
                 else np.float32)
        pos = jnp.asarray(self.vap.map_positions(
            self.structure.positions).astype(dtype))
        vel = jnp.asarray(self.velocities_vap.astype(dtype))
        if self._scan is None:
            self._scan = self._make_scan_device()
        history = {"potential": [], "kinetic": [], "total": [],
                   "temperature": []}
        ndof = 3 * len(self.structure)
        remaining = n_steps
        while remaining > 0:
            n = min(self.chunk_size, remaining)
            out = self._scan(pos, vel, self._key, n)
            diag = jax.device_get(out[5])
            try:
                self._nl.check(diag)
            except RuntimeError:
                # capacity overflow: the chunk used a truncated pair
                # list — grow the builder and REDO it from the carried
                # pre-chunk state (pos/vel were not reassigned yet)
                self._nl = self._nl.grow(diag)
                self._scan = self._make_scan_device()
                continue
            pos, vel, self._key, pe, ke, _ = out
            history["potential"].append(float(pe))
            history["kinetic"].append(float(ke))
            history["total"].append(float(pe) + float(ke))
            history["temperature"].append(2.0 * float(ke) / (ndof * KB))
            remaining -= n
        self.structure.positions = np.asarray(pos)[self.vap.local_to_vap]
        self.velocities_vap = np.asarray(vel)
        return history

    # ------------------------------------------------------------------
    def run(self, n_steps: int):
        """Integrate `n_steps`; returns a dict with the trajectory of
        (potential, kinetic, total) energies per chunk."""
        if self._nl is not None:
            return self._run_device(n_steps)
        pos_local = self.structure.positions.copy()
        vel = jnp.asarray(self.velocities_vap)
        history = {"potential": [], "kinetic": [], "total": [],
                   "temperature": []}
        ndof = 3 * len(self.structure)
        remaining = n_steps
        while remaining > 0:
            n = min(self.chunk_size, remaining)
            # rebuild the (skinned) neighbor list on the host
            old_rcut = self.fz.rcut
            feats_np = None
            try:
                self.fz.rcut += self.skin
                feats_np = self._build_features(pos_local)
            finally:
                self.fz.rcut = old_rcut
            feats = {k: jnp.asarray(v) for k, v in feats_np.items()}
            # one scan closure for the run; jit re-specializes per
            # feature shape signature (dense layouts have no pair_i)
            if self._scan is None:
                self._scan = self._make_scan()
            pos_vap = jnp.asarray(self.vap.map_positions(
                pos_local).astype(np.asarray(feats["positions"]).dtype))
            feats["positions"] = pos_vap
            pos_vap, vel, self._key, pe, ke = self._scan(
                pos_vap, vel, self._key, feats, n)
            pos_local = np.asarray(pos_vap)[self.vap.local_to_vap]
            history["potential"].append(float(pe))
            history["kinetic"].append(float(ke))
            history["total"].append(float(pe) + float(ke))
            history["temperature"].append(2.0 * float(ke) /
                                          (ndof * KB))
            remaining -= n
        self.structure.positions = pos_local
        self.velocities_vap = np.asarray(vel)
        return history

    @property
    def temperature(self) -> float:
        """Instantaneous temperature (K)."""
        masses = self.masses_vap[:, None]
        mask = self.vap.atom_masks[:, None]
        ke = 0.5 * np.sum(masses * self.velocities_vap ** 2 * mask) / \
            FORCE_TO_ACC
        ndof = 3 * len(self.structure)
        return 2.0 * ke / (ndof * KB)
