"""Physics-constraint losses (reference `tensoralloy/nn/constraint/`).

All constraints share one pattern: featurize reference crystals ONCE at
setup into constant feature dicts, then add analytic residuals of model
outputs on those constants to the training loss. In JAX this is plain
function composition — no variable-scope graph cloning
(contrast the reference's AUTO_REUSE machinery, `elastic.py:94-267`).

Implemented: elastic constants (C_ij via jacfwd of stress w.r.t.
strain), Rose equation of state, energy differences (ediff), electron
entropy pinning, second-order force constants (hessian/c vs phonopy
fc2), and extra-database energy/force terms.
"""
from __future__ import annotations

import dataclasses
import tomllib
import os
from collections import Counter
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ..atoms import Structure
from ..nn.fields import EV_ANGSTROM3_TO_GPA
from ..transform.featurizer import Featurizer, batch_features


def _safe_norm(x, eps: float = 1e-14):
    """Norm with finite gradient at 0 (jnp.linalg.norm grads NaN there
    — and equilibrium crystals have exactly-zero forces/pressure)."""
    return jnp.sqrt(jnp.sum(jnp.square(x)) + eps)

GPa = 1.0 / EV_ANGSTROM3_TO_GPA


# ----------------------------------------------------------------------
@dataclasses.dataclass
class ElasticConstant:
    vi: int            # Voigt index, 1-based
    vj: int
    value: float       # GPa
    weight: float = 1.0


@dataclasses.dataclass
class CrystalSpec:
    name: str
    structure: Structure
    phase: str = ""
    bulk_modulus: float = 0.0          # GPa
    elastic_constants: List[ElasticConstant] = \
        dataclasses.field(default_factory=list)
    temperature: float = 0.0           # eV
    supercell: Optional[Structure] = None
    fc2: Optional[np.ndarray] = None   # [N, N, 3, 3] phonopy format
    eentropy: float = 0.0


def get_crystal(obj, base_dir: str = ".") -> CrystalSpec:
    """Resolve a crystal from a built-in name / CrystalSpec / TOML path
    / cif path.

    Built-in names ('Ni', 'Mo/dft', 'Ni3Mo', ... — reference
    `nn/constraint/data.py:91-180`) resolve from the bundled library.
    TOML files accept both this framework's [[elastic_constants]]
    entries {vi, vj, value, weight} and the reference's flat
    ``cNM = value`` / ``cNM = [value, weight]`` keys
    (`data/crystals/Ni3Mo_elastic_tensor.toml`).
    """
    if isinstance(obj, CrystalSpec):
        return obj
    if isinstance(obj, str):
        from ..data.crystals import built_in_crystals
        lib = built_in_crystals()
        if obj in lib:
            return lib[obj]
    path = obj if os.path.isabs(obj) else os.path.join(base_dir, obj)
    if path.endswith(".cif"):
        from ..io.cif import read_cif
        s = read_cif(path)
        return CrystalSpec(name=os.path.basename(path)[:-4], structure=s)
    if path.endswith(".toml"):
        with open(path, "rb") as fh:
            d = tomllib.load(fh)
        ddir = os.path.dirname(os.path.abspath(path))
        from ..io.cif import read_cif
        s = read_cif(os.path.join(ddir, d["file"]))
        spec = CrystalSpec(
            name=d.get("name", "crystal"), structure=s,
            phase=d.get("phase", ""),
            bulk_modulus=float(d.get("bulk_modulus", 0.0)),
            temperature=float(d.get("temperature", 0.0)),
            eentropy=float(d.get("eentropy", 0.0)))
        if d.get("supercell"):
            spec.supercell = read_cif(os.path.join(ddir, d["supercell"]))
        if d.get("fc2"):
            spec.fc2 = np.load(os.path.join(ddir, d["fc2"]))
        for row in d.get("elastic_constants", []):
            spec.elastic_constants.append(ElasticConstant(
                vi=int(row["vi"]), vj=int(row["vj"]),
                value=float(row["value"]),
                weight=float(row.get("weight", 1.0))))
        # reference-format flat keys: c11 = 385 / c66 = [94.0, 0.0]
        for key, value in d.items():
            if len(key) == 3 and key[0] == "c" and key[1:].isdigit():
                if isinstance(value, (list, tuple)):
                    cij = float(value[0])
                    weight = float(value[1]) if len(value) > 1 else 1.0
                else:
                    cij, weight = float(value), 1.0
                spec.elastic_constants.append(ElasticConstant(
                    vi=int(key[1]), vj=int(key[2]), value=cij,
                    weight=weight))
        return spec
    raise ValueError(f"cannot resolve crystal from {obj!r}")


# ----------------------------------------------------------------------
def _constant_features(model, structure: Structure, temperature: float = 0.0
                       ) -> Dict[str, jnp.ndarray]:
    """Featurize a crystal with the model's own featurizer; static."""
    fz: Featurizer = model.featurizer
    s = structure.copy()
    s.info["etemperature"] = temperature
    vap = fz.make_vap(s)
    feats = fz.featurize(s, vap)
    return {k: jnp.asarray(v) for k, v in feats.items()}


def _variant_for(model, structure: Structure):
    """Model clone laid out for this crystal's stoichiometry."""
    return model.clone_for(Counter(structure.symbols))


def strained_energy_fn(model, params, feats):
    """E(eps6): energy under symmetric strain (Voigt 6-vector)."""
    pos0 = feats["positions"]
    cell0 = feats["cell"]

    def energy(eps6):
        e = jnp.asarray(
            [[eps6[0], eps6[5] / 2, eps6[4] / 2],
             [eps6[5] / 2, eps6[1], eps6[3] / 2],
             [eps6[4] / 2, eps6[3] / 2, eps6[2]]])
        m = jnp.eye(3, dtype=pos0.dtype) + e
        f = dict(feats)
        f["positions"] = pos0 @ m.T
        f["cell"] = cell0 @ m.T
        return model.variational_energy(params, f)

    return energy


def elastic_tensor(model, params, feats) -> jnp.ndarray:
    """Full 6x6 C_ij (GPa) = (1/V) d^2 E / d eps_i d eps_j via
    jacfwd-over-grad (reference computes dsigma/dh @ h / V,
    `elastic.py:24-91` — identical up to symmetrization)."""
    energy = strained_energy_fn(model, params, feats)
    vol = jnp.abs(jnp.linalg.det(feats["cell"]))
    zero = jnp.zeros((6,), feats["positions"].dtype)
    hess = jax.jacfwd(jax.grad(energy))(zero)
    return hess / vol * EV_ANGSTROM3_TO_GPA


# ----------------------------------------------------------------------
@dataclasses.dataclass
class ElasticConstraintOptions:
    use_kbar: bool = True
    forces_weight: float = 1.0
    stress_weight: float = 0.1
    tau: float = 1.0


class ElasticConstraint:
    """RMSE (GPa) of chosen C_ij vs references, with ReLU(mae - tau)
    gating + equilibrium (forces/stress-norm) penalties."""

    name = "elastic"

    def __init__(self, model, crystals: Sequence, weight: float = 0.1,
                 options: Optional[ElasticConstraintOptions] = None,
                 base_dir: str = "."):
        self.weight = weight
        self.options = options or ElasticConstraintOptions()
        self.entries = []
        for c in crystals:
            spec = get_crystal(c, base_dir)
            variant = _variant_for(model, spec.structure)
            feats = _constant_features(variant, spec.structure,
                                       spec.temperature)
            self.entries.append((spec, variant, feats))

    def loss(self, params) -> jnp.ndarray:
        from .fields import make_efs_fn
        opt = self.options
        total = 0.0
        for spec, model, feats in self.entries:
            efs = make_efs_fn(model.variational_energy)(params, feats)
            c = elastic_tensor(model, params, feats)
            preds, labels, weights = [], [], []
            for ec in spec.elastic_constants:
                preds.append(c[ec.vi - 1, ec.vj - 1])
                labels.append(ec.value)
                weights.append(ec.weight)
            if preds:
                preds = jnp.stack(preds)
                labels = jnp.asarray(labels, preds.dtype)
                weights = jnp.asarray(weights, preds.dtype)
                diff = preds - labels
                mse = jnp.mean(weights * jnp.square(diff))
                mae = jnp.mean(jnp.abs(diff))
                gate = jax.nn.relu(mae - opt.tau)
                total = total + jnp.sqrt(mse * gate + 1e-14) * self.weight
            # equilibrium penalties
            f_norm = _safe_norm(
                efs["forces"] * feats["atom_masks"][:, None])
            unit = (10.0 / GPa) if opt.use_kbar else (1e4 / GPa)
            s_norm = _safe_norm(efs["stress_voigt"] * unit)
            total = total + opt.forces_weight * f_norm \
                + opt.stress_weight * s_norm
        return total


# ----------------------------------------------------------------------
@dataclasses.dataclass
class RoseConstraintOptions:
    crystals: Sequence = ()
    weight: float = 1.0
    beta: Sequence[float] = ()
    dx: float = 0.01
    xlo: float = 0.90
    xhi: float = 1.02
    p_target: Sequence[float] = ()
    E_target: Sequence[float] = ()


class RoseConstraint:
    """Rose universal EOS residual (`nn/constraint/rose.py:84-284`):
    energies of isotropically scaled cells must follow
    E(x) = E0 exp(-a x) [1 + a x + beta (a x)^3 (2x+3)/(x+1)^2],
    a = sqrt(-9 V0 B / E0). Fits the bulk modulus."""

    name = "rose"

    def __init__(self, model, options: RoseConstraintOptions,
                 base_dir: str = "."):
        self.options = options
        self.entries = []
        for idx, c in enumerate(options.crystals):
            spec = get_crystal(c, base_dir)
            if spec.bulk_modulus == 0:
                continue
            variant = _variant_for(model, spec.structure)
            eq_feats = _constant_features(variant, spec.structure,
                                          spec.temperature)
            scales = np.arange(options.xlo - 1.0, options.xhi - 1.0,
                               options.dx)
            scaled = []
            for x in scales:
                s = spec.structure.copy()
                s.cell = spec.structure.cell * (1.0 + x)
                s.positions = spec.structure.positions * (1.0 + x)
                s.info["etemperature"] = spec.temperature
                scaled.append(s)
            fz = variant.featurizer
            sizes = [fz.neighbor_size(s) for s in scaled]
            nij_max = max(z.nij for z in sizes)
            nijk_max = max(z.nijk for z in sizes) if fz.angular else None
            nnl_max = max(z.nnl_tot for z in sizes)
            ntl_max = max(z.ntl for z in sizes) if fz.angular else None
            vap = fz.make_vap(spec.structure)
            batch = batch_features([
                fz.featurize(s, vap, nij_max=nij_max, nijk_max=nijk_max,
                             nnl_max=nnl_max, ntl_max=ntl_max)
                for s in scaled])
            batch = {k: jnp.asarray(v) for k, v in batch.items()}
            beta = (options.beta[idx] if idx < len(options.beta) else 0.0)
            p_t = (options.p_target[idx]
                   if idx < len(options.p_target) else 0.0)
            e_t = (options.E_target[idx]
                   if idx < len(options.E_target) else None)
            self.entries.append(
                (spec, variant, eq_feats, batch,
                 jnp.asarray(scales), beta, p_t, e_t))

    def loss(self, params) -> jnp.ndarray:
        from .fields import make_efs_fn
        total = 0.0
        for (spec, model, eq_feats, batch, x, beta, p_t, e_t) in \
                self.entries:
            efs = make_efs_fn(model.variational_energy)(params, eq_feats)
            e0 = efs["energy"]
            v0 = jnp.abs(jnp.linalg.det(eq_feats["cell"]))
            p0 = -efs["stress_voigt"][:3] / GPa
            b_ev = spec.bulk_modulus * GPa    # eV/A^3
            # a = sqrt(-9 V0 B / E0) is only real for a bound crystal
            # (E0 < 0); early in training the prediction can be >= 0,
            # which would make the whole loss NaN (or exp(-a x) inf)
            # and destroy the Adam state — clamp E0 below zero and cap
            # a far above its physical range (~3-10) so the residual
            # stays finite while the energy/pressure terms pull E0 down
            a = jnp.minimum(
                jnp.sqrt(-9.0 * v0 * b_ev / jnp.minimum(e0, -1e-6)),
                25.0)
            ax = a * x
            coef = jnp.exp(-ax) * (
                1.0 + ax + beta * ax ** 3 * (2.0 * x + 3.0) /
                jnp.square(x + 1.0))
            e_ref = (e_t if e_t is not None else e0)
            labels = e_ref * coef
            preds = jax.vmap(
                lambda f: model.variational_energy(params, f))(batch)
            diff = preds - labels
            residual = jnp.sqrt(jnp.sum(jnp.square(diff)) + 1e-14)
            ploss = _safe_norm(p0 - p_t * jnp.ones(3, p0.dtype))
            eloss = jnp.abs(e0 - e_t) if e_t is not None else 0.0
            total = total + (residual + ploss + eloss) * \
                self.options.weight
        return total


# ----------------------------------------------------------------------
class EnergyDifferenceConstraint:
    """Pin energy differences between crystal pairs
    (`nn/constraint/ediff.py:20-121`): | (E_t - E_r)/natoms - diff |."""

    name = "ediff"

    def __init__(self, model, references: Sequence, crystals: Sequence,
                 diffs: Sequence[float], weight: float = 1.0,
                 method: str = "mae", base_dir: str = "."):
        self.weight = weight
        self.method = method
        self.entries = []
        for ref, tgt, diff in zip(references, crystals, diffs):
            r = get_crystal(ref, base_dir)
            t = get_crystal(tgt, base_dir)
            vr = _variant_for(model, r.structure)
            vt = _variant_for(model, t.structure)
            self.entries.append(
                (vr, _constant_features(vr, r.structure, r.temperature),
                 len(r.structure),
                 vt, _constant_features(vt, t.structure, t.temperature),
                 len(t.structure), float(diff)))

    def loss(self, params) -> jnp.ndarray:
        from .losses import logcosh
        total = 0.0
        for vr, fr, nr, vt, ft, nt, diff in self.entries:
            er = vr.variational_energy(params, fr) / nr
            et = vt.variational_energy(params, ft) / nt
            x = (et - er) - diff
            total = total + (jnp.abs(x) if self.method == "mae"
                             else logcosh(x)) * self.weight
        return total


class EntropyConstraint:
    """Pin electron entropies of crystals
    (`nn/constraint/eentropy.py:23-85`)."""

    name = "eentropy/c"

    def __init__(self, model, crystals: Sequence, weight: float = 1.0,
                 base_dir: str = "."):
        self.weight = weight
        self.entries = []
        for c in crystals:
            spec = get_crystal(c, base_dir)
            variant = _variant_for(model, spec.structure)
            feats = _constant_features(variant, spec.structure,
                                       spec.temperature)
            self.entries.append((variant, feats, spec.eentropy,
                                 len(spec.structure)))

    def loss(self, params) -> jnp.ndarray:
        total = 0.0
        for model, feats, s_ref, n in self.entries:
            ops = model.energy_ops(params, feats)
            total = total + jnp.abs(ops["eentropy"] - s_ref) / n * \
                self.weight
        return total


class ForceConstantsConstraint:
    """Second-order force constants of a supercell vs a phonopy fc2
    reference (`nn/constraint/fc.py:23-147`)."""

    name = "hessian/c"

    def __init__(self, model, crystals: Sequence, weight: float = 1.0,
                 forces_weight: float = 1.0, base_dir: str = "."):
        self.weight = weight
        self.forces_weight = forces_weight
        self.entries = []
        for c in crystals:
            spec = get_crystal(c, base_dir)
            if spec.fc2 is None or spec.supercell is None:
                continue
            sc = spec.supercell
            variant = _variant_for(model, sc)
            fz = variant.featurizer
            vap = fz.make_vap(sc)
            feats = {k: jnp.asarray(v)
                     for k, v in fz.featurize(sc, vap).items()}
            self.entries.append(
                (variant, feats, vap, jnp.asarray(spec.fc2)))

    def loss(self, params) -> jnp.ndarray:
        from .fields import make_hessian_fn, make_efs_fn
        total = 0.0
        for model, feats, vap, fc2 in self.entries:
            h = make_hessian_fn(model.variational_energy)(params, feats)
            idx = jnp.asarray(vap.local_to_vap)
            # phonopy layout [N, N, 3, 3]
            hp = h[idx][:, :, idx, :].transpose(0, 2, 1, 3)
            diff = hp - fc2
            total = total + jnp.sqrt(jnp.mean(jnp.square(diff)) + 1e-14) \
                * self.weight
            efs = make_efs_fn(model.variational_energy)(params, feats)
            total = total + self.forces_weight * _safe_norm(
                efs["forces"] * feats["atom_masks"][:, None])
        return total


class ExtraDatabaseConstraint:
    """Auxiliary database of structures contributing fixed-batch
    energy/forces losses (`nn/constraint/extra_db.py:19-220`)."""

    name = "extra/c"

    def __init__(self, model, filename: str, weight: float = 1.0,
                 minimize: Sequence[str] = ("energy",)):
        from ..io.sqlite import connect
        self.weight = weight
        self.minimize = tuple(minimize)
        db = connect(filename)
        structures = list(db)
        fz = model.featurizer
        max_occurs = Counter()
        for s in structures:
            for e, c in s.count().items():
                max_occurs[e] = max(max_occurs[e], c)
        self.variant = model.clone_for(max_occurs)
        sizes = [fz.neighbor_size(s) for s in structures]
        nij_max = max(z.nij for z in sizes)
        nijk_max = (max(z.nijk for z in sizes) if fz.angular else None)
        nnl_max = max(z.nnl_tot for z in sizes)
        ntl_max = (max(z.ntl for z in sizes) if fz.angular else None)
        feats_list, e_list, f_list, w_list = [], [], [], []
        for s in structures:
            vap = fz.make_vap(s, max_occurs)
            feats_list.append(fz.featurize(s, vap, nij_max=nij_max,
                                           nijk_max=nijk_max,
                                           nnl_max=nnl_max,
                                           ntl_max=ntl_max))
            e_list.append(s.energy if s.energy is not None else 0.0)
            f = s.forces
            f_list.append(vap.map_forces(f) if f is not None else
                          np.zeros((vap.n_atoms_vap, 3)))
            w_list.append(float(np.atleast_1d(
                s.info.get("weights", [1.0]))[0]))
        batch = batch_features(feats_list)
        self.feats = {k: jnp.asarray(v) for k, v in batch.items()}
        self.energies = jnp.asarray(e_list)
        self.forces = jnp.asarray(np.stack(f_list))
        self.sample_weights = jnp.asarray(w_list)
        # label-presence masks: rows without a stored energy/forces
        # must not contribute (a missing energy is NOT 0 eV)
        self.has_energy = jnp.asarray(
            [1.0 if s.energy is not None else 0.0 for s in structures])
        self.has_forces = jnp.asarray(
            [1.0 if s.forces is not None else 0.0 for s in structures])
        self.n_atoms = jnp.asarray(
            [float(len(s)) for s in structures])

    def loss(self, params) -> jnp.ndarray:
        from .fields import make_efs_fn
        efs = jax.vmap(lambda f: make_efs_fn(
            self.variant.variational_energy)(params, f))(self.feats)
        total = 0.0
        if "energy" in self.minimize:
            diff = (efs["energy"] - self.energies) / self.n_atoms
            w = self.sample_weights * self.has_energy
            total = total + jnp.sqrt(
                jnp.sum(w * jnp.square(diff)) /
                jnp.maximum(jnp.sum(self.has_energy), 1.0) + 1e-14)
        if "forces" in self.minimize:
            mask = (self.feats["atom_masks"][:, 1:] *
                    self.has_forces[:, None])
            d = (efs["forces"][:, 1:] - self.forces[:, 1:]) * \
                mask[..., None]
            total = total + jnp.sqrt(
                jnp.sum(jnp.square(d)) /
                jnp.maximum(jnp.sum(mask) * 3.0, 1.0) + 1e-14)
        return total * self.weight
