"""EAM-family potential models: EAM/alloy, EAM/Finnis-Sinclair, ADP.

Reference math (`tensoralloy/nn/eam/{eam,alloy,fs,adp}.py`, SURVEY
Appendix A):

  E_i = F_a(rho_i) + 1/2 sum_j phi_ab(r_ij)                    (alloy/fs)
  rho_i = sum_j rho_b(r_ij)            (alloy: neighbor element only)
  rho_i = sum_j rho_ab(r_ij)           (fs: ordered element pair)
  ADP adds per (merged symmetric) k-body term t:
    mu_t^a    = sum_{j in t} u_t(r_ij) d_ij^a
    lam_t^ab  = sum_{j in t} w_t(r_ij) d_ij^a d_ij^b
    E_i += 1/2 sum_a mu^2 + 1/2 sum_{a<=b} c_ab lam_ab^2 - 1/6 nu^2
  with c_ab = 1 (a==b) else 2 and nu = trace(lam). Note the reference
  groups the dipole/quadrupole sums per k-body term before squaring
  (`adp.py:369-500`); `adp_per_term=False` switches to the
  LAMMPS-standard convention of summing over all neighbors first.

Every phi / rho / embed / dipole / quadrupole function is independently
either an MLP ("nn") or an analytic form from
`potentials.available_potentials`; analytic parameters live in the
params pytree and are trainable unless listed in `fixed_functions`.

In the flat-pair layout each branch is: elementwise f(r) over the pair
axis -> masked select by term -> one segment_sum. XLA fuses the selects
into the function evaluations; there is no dynamic partition/stitch
(contrast `eam.py:451-493`).
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, List, Optional, Sequence, Union

import jax
import jax.numpy as jnp
import numpy as np

from ...transform.featurizer import Featurizer
from ...utils import get_elements_from_kbody_term
from ..layers import apply_dense_stack, init_dense_stack, l2_of_stack
from ...ops.pairs import pair_vectors, safe_norm
from .potentials import resolve_potential


class EamNN:
    """Shared machinery for the EAM family."""

    tag = "base"
    minmax_scale = False

    def __init__(self,
                 featurizer: Featurizer,
                 max_occurs: Counter,
                 custom_potentials: Union[str, dict, None] = None,
                 hidden_sizes: Union[dict, Sequence[int], None] = None,
                 activation: str = "softplus",
                 fixed_functions: Optional[List[str]] = None,
                 use_resnet_dt: bool = False,
                 adp_per_term: bool = True):
        self.featurizer = featurizer
        self.max_occurs = Counter(max_occurs)
        self.elements: List[str] = featurizer.elements
        self.activation = activation
        self.use_resnet_dt = use_resnet_dt
        self.fixed_functions = list(fixed_functions or [])
        self.adp_per_term = adp_per_term
        self._custom_potentials = custom_potentials
        self._hidden_sizes_arg = hidden_sizes

        n = len(self.elements)
        # unique (unordered) pair terms, sorted for a deterministic order
        self.unique_kbody_terms = sorted(
            {"".join(sorted([a, b]))
             for a in self.elements for b in self.elements})

        # VAP layout (same contract as AtomicNN)
        offset = 1
        self.layout: Dict[str, tuple] = {}
        for e in self.elements:
            cnt = int(self.max_occurs.get(e, 0))
            self.layout[e] = (offset, cnt)
            offset += cnt
        self.n_atoms_vap = offset
        vei = np.zeros(self.n_atoms_vap, dtype=np.int32)
        for e in self.elements:
            lo, cnt = self.layout[e]
            vei[lo:lo + cnt] = self.elements.index(e)
        self.vap_element_idx = vei

        # (center, neighbor) element idx -> unordered term index
        self._uterm_table = np.zeros((n, n), dtype=np.int32)
        for i, a in enumerate(self.elements):
            for j, b in enumerate(self.elements):
                self._uterm_table[i, j] = self.unique_kbody_terms.index(
                    "".join(sorted([a, b])))

        self.potentials = self._setup_potentials(custom_potentials)
        self.hidden_sizes = self._resolve_hidden_sizes(hidden_sizes)

    # ------------------------------------------------------------------
    @property
    def _sections(self) -> Dict[str, List[str]]:
        """{section: [function keys]} — subclass-specific."""
        raise NotImplementedError

    def _setup_potentials(self, custom) -> Dict[str, Dict[str, str]]:
        out = {}
        for section, keys in self._sections.items():
            out[section] = {}
            for key in keys:
                if custom is None:
                    name = "nn"
                elif isinstance(custom, str):
                    name = custom
                else:
                    name = custom.get(section, {}).get(key, "nn")
                if name != "nn":
                    resolve_potential(name)   # raises on unknown names
                out[section][key] = name
        return out

    def _resolve_hidden_sizes(self, hs) -> Dict[str, Dict[str, List[int]]]:
        default = [32, 32] if hs is None or isinstance(hs, dict) else list(hs)
        out = {}
        for section, keys in self._sections.items():
            out[section] = {}
            for key in keys:
                v = default
                if isinstance(hs, dict):
                    got = hs.get(section)
                    if isinstance(got, dict):
                        v = got.get(key, default)
                    elif got is not None:
                        v = got
                out[section][key] = list(v)
        return out

    # ------------------------------------------------------------------
    def init_params(self, key) -> dict:
        params: dict = {"nn": {}}
        emp_sections: Dict[str, set] = {}
        for section, keys in self._sections.items():
            for fkey in keys:
                name = self.potentials[section][fkey]
                if name == "nn":
                    key, sub = jax.random.split(key)
                    params["nn"][f"{section}.{fkey}"] = init_dense_stack(
                        sub, 1, self.hidden_sizes[section][fkey], out_dim=1,
                        output_bias=False, resnet_dt=self.use_resnet_dt)
                else:
                    emp_sections.setdefault(name, set()).update(
                        self._empirical_sections_for(name, section, fkey))
        for name, sections in emp_sections.items():
            pot = resolve_potential(name)
            initial = pot.initial_params(sorted(sections))
            if initial:
                params[pot.name] = initial
        return params

    def _empirical_sections_for(self, name: str, section: str,
                                fkey: str) -> List[str]:
        """Sections of the analytic potential's parameter table needed to
        evaluate (section, fkey) — e.g. zjw04 phi('NiMo') needs Ni & Mo."""
        pot = resolve_potential(name)
        if not pot.defaults:
            # generic potentials (morse/buckingham/...) parameterize
            # whatever section they're assigned to; spline potentials
            # have no parameters at all (initial_params -> {})
            return [section]
        candidates = [section] + get_elements_from_kbody_term(section)
        wanted = {s for s in candidates if s in pot.defaults}
        return sorted(wanted) if wanted else sorted(pot.defaults)

    # ------------------------------------------------------------------
    def _fn(self, params, section: str, fkey: str, kind: str):
        """Return f(x) for (section, fkey); kind selects the empirical
        method name ('phi'/'rho'/'embed'/'dipole'/'quadrupole')."""
        name = self.potentials[section][fkey]
        fixed = f"{section}.{fkey}" in self.fixed_functions
        if name == "nn":
            mlp = params["nn"][f"{section}.{fkey}"]
            if fixed:
                mlp = jax.lax.stop_gradient(mlp)

            def f(x):
                return apply_dense_stack(mlp, x[..., None],
                                         self.activation)[..., 0]
            return f
        pot = resolve_potential(name)
        method = getattr(pot, kind)
        return lambda x: method(params, x, section, fixed=fixed)

    # ------------------------------------------------------------------
    def _pair_geometry(self, features):
        vec = pair_vectors(features)
        mask = features["pair_mask"]
        r = safe_norm(vec)
        r = jnp.where(mask > 0, r, 1.0)
        # Mask pairs beyond the model cutoff ON DEVICE.  Skinned MD
        # neighbor lists (rcut+skin, `dynamics.py`) and exact-rcut
        # featurization must give identical energies, and the
        # in-framework model must agree with its own truncated setfl
        # export (reference tables stop at rcut, `eam.py:300-362`).
        mask = mask * (r < self.featurizer.rcut).astype(mask.dtype)
        elem = jnp.asarray(self.vap_element_idx)
        ei = jnp.take(elem, features["pair_i"])
        ej = jnp.take(elem, features["pair_j"])
        return vec, r, mask, ei, ej

    def _phi_energy(self, params, features, r, mask, ei, ej) -> jnp.ndarray:
        """1/2 sum phi over directed pairs -> [n_vap]."""
        ut = jnp.asarray(self._uterm_table)[ei, ej]
        total = jnp.zeros_like(r)
        for t, term in enumerate(self.unique_kbody_terms):
            if not self._term_possible(term):
                continue
            phi = self._fn(params, term, "phi", "phi")(r)
            total = total + jnp.where(ut == t, phi, 0.0)
        n_vap = features["positions"].shape[0]
        return 0.5 * jax.ops.segment_sum(total * mask, features["pair_i"],
                                         num_segments=n_vap)

    def _term_possible(self, term: str) -> bool:
        a, b = get_elements_from_kbody_term(term)
        return self.max_occurs.get(a, 0) > 0 and self.max_occurs.get(b, 0) > 0

    def _embed_energy(self, params, rho_i: jnp.ndarray) -> jnp.ndarray:
        """F_e(rho) applied on each element's static row block."""
        out = jnp.zeros_like(rho_i)
        for e in self.elements:
            lo, cnt = self.layout[e]
            if cnt == 0:
                continue
            x = jax.lax.dynamic_slice_in_dim(rho_i, lo, cnt, axis=0)
            y = self._fn(params, e, "embed", "embed")(x)
            out = jax.lax.dynamic_update_slice_in_dim(out, y, lo, axis=0)
        return out

    # ------------------------------------------------------------------
    def atomic_energies(self, params, features) -> jnp.ndarray:
        raise NotImplementedError

    def energy(self, params, features) -> jnp.ndarray:
        return jnp.sum(self.atomic_energies(params, features))

    # -- chunked-pair evaluation (large-cell single-chip inference) ----
    # The EAM family is a finalize(sum-over-pairs) computation: every
    # pair contributes linearly to per-atom accumulators (rho, phi and,
    # for ADP, the pre-square mu/lambda moments) and only the FINALIZE
    # step is nonlinear.  Scanning rematerialized pair blocks therefore
    # reproduces the monolithic energy bit-for-math while the backward
    # pass holds one block + the per-atom accumulator cotangents
    # instead of every per-pair intermediate (the monolithic backward
    # needs ~24.5 GB at 131k atoms / 11M pairs; reference computed 128k
    # atoms on an 11 GB GPU, `cpc_speed.py:36-74`).

    def _pair_term_accumulators(self, params, features) -> dict:
        """One flat-pair block -> linear per-atom accumulators."""
        _, r, mask, ei, ej = self._pair_geometry(features)
        return {"rho": self._rho_sum(params, features, r, mask, ei, ej),
                "phi": self._phi_energy(params, features, r, mask, ei, ej)}

    def _finalize_accumulators(self, params, acc: dict,
                               features) -> jnp.ndarray:
        embed = self._embed_energy(params, acc["rho"])
        return (embed + acc["phi"]) * features["atom_masks"]

    def energy_chunked(self, params, features,
                       pair_chunk: int = 1 << 20) -> jnp.ndarray:
        """Total energy with the pair axis processed in rematerialized
        `lax.scan` blocks of `pair_chunk` pairs.  Equal to `energy` up
        to float summation order; peak memory is O(natoms + chunk)."""
        # flat-layout pair arrays only (leading axis nij); the dense
        # per-atom layout ("pair_*_d", [A, N]) is not chunked here
        pair_keys = [k for k in features
                     if (k.startswith("pair_") and not k.endswith("_d"))
                     or k == "rij"]
        nij = int(features["pair_i"].shape[0])
        chunk = int(min(pair_chunk, nij))
        n_chunks = -(-nij // chunk)
        pad = n_chunks * chunk - nij
        base = {k: v for k, v in features.items() if k not in pair_keys}

        def blocked(v):
            if pad:
                width = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
                v = jnp.pad(v, width)   # index-0 pairs with mask 0
            return v.reshape((n_chunks, chunk) + v.shape[1:])

        chunks = {k: blocked(features[k]) for k in pair_keys}
        probe = {**base, **{k: v[0] for k, v in chunks.items()}}
        shapes = jax.eval_shape(
            lambda p, f: self._pair_term_accumulators(p, f),
            params, probe)
        init = jax.tree_util.tree_map(
            lambda s: jnp.zeros(s.shape, s.dtype), shapes)

        @jax.checkpoint
        def body(carry, ch):
            acc = self._pair_term_accumulators(params, {**base, **ch})
            return jax.tree_util.tree_map(jnp.add, carry, acc), None

        acc, _ = jax.lax.scan(body, init, chunks)
        return jnp.sum(self._finalize_accumulators(params, acc, features))

    def make_chunked_energy_fn(self, pair_chunk: int = 1 << 20):
        return lambda p, f: self.energy_chunked(p, f, pair_chunk)

    variational_energy = energy

    def l2_loss(self, params) -> jnp.ndarray:
        vals = [l2_of_stack(p) for p in params.get("nn", {}).values()]
        return sum(vals) if vals else jnp.asarray(0.0)

    def clone_for(self, max_occurs: Counter):
        return type(self)(self.featurizer, max_occurs,
                          custom_potentials=self._custom_potentials,
                          hidden_sizes=self._hidden_sizes_arg,
                          activation=self.activation,
                          fixed_functions=self.fixed_functions,
                          use_resnet_dt=self.use_resnet_dt,
                          adp_per_term=self.adp_per_term)

    # ------------------------------------------------------------------
    def export_to_setfl(self, path: str, params, nr: int = 2000,
                        nrho: int = 2000, rho_max: float = 100.0,
                        lattice: Optional[Dict[str, float]] = None,
                        structure: Optional[Dict[str, str]] = None):
        """Tabulate trained rho/F/phi (+u/w for ADP) onto (nr, nrho)
        grids and write a LAMMPS setfl file (reference
        `alloy.py:198-381`, `adp.py:588-794`)."""
        from ...io.lammps import (SetflData, write_eam_alloy_setfl,
                                  write_eam_fs_setfl)
        from ...elements import atomic_masses, atomic_numbers
        cutoff = self.featurizer.rcut
        dr = cutoff / nr
        drho = rho_max / nrho
        r = jnp.asarray(np.arange(nr) * dr)
        r_safe = jnp.maximum(r, 1e-8)
        rho_g = jnp.asarray(np.arange(nrho) * drho)
        frho, rho_t, phi_t = {}, {}, {}
        dipole_t = quadrupole_t = None
        for e in self.elements:
            frho[e] = np.asarray(self._fn(params, e, "embed", "embed")(
                rho_g))
            if self.tag in ("alloy", "adp"):
                rho_t[e] = np.asarray(self._fn(params, e, "rho", "rho")(
                    r_safe))
            else:  # fs: LAMMPS eam/fs wants rho_{a<-b} per ORDERED pair
                for other in self.elements:
                    rho_t[e + other] = np.asarray(self._fn(
                        params, e + other, "rho", "rho")(r_safe))
        for term in self.unique_kbody_terms:
            phi_t[term] = np.asarray(self._fn(params, term, "phi", "phi")(
                r_safe))
        if self.tag == "adp":
            dipole_t, quadrupole_t = {}, {}
            for term in self.unique_kbody_terms:
                dipole_t[term] = np.asarray(self._fn(
                    params, term, "dipole", "dipole")(r_safe))
                quadrupole_t[term] = np.asarray(self._fn(
                    params, term, "quadrupole", "quadrupole")(r_safe))
        data = SetflData(
            elements=self.elements, nrho=nrho, drho=drho, nr=nr, dr=dr,
            cutoff=cutoff,
            mass={e: float(atomic_masses[atomic_numbers[e]])
                  for e in self.elements},
            lattice=lattice or {e: 0.0 for e in self.elements},
            structure=structure or {e: "fcc" for e in self.elements},
            frho=frho, rho=rho_t, phi=phi_t,
            dipole=dipole_t, quadrupole=quadrupole_t)
        writer = (write_eam_fs_setfl if self.tag == "fs"
                  else write_eam_alloy_setfl)
        writer(path, data, comments=[
            f"tensoralloy_tpu {type(self).__name__} export",
            f"elements: {' '.join(self.elements)}", ""])
        return data

    def as_dict(self) -> dict:
        return {"class": type(self).__name__,
                "featurizer": self.featurizer.as_dict(),
                "max_occurs": dict(self.max_occurs),
                "custom_potentials": self._custom_potentials,
                "hidden_sizes": self._hidden_sizes_arg,
                "activation": self.activation,
                "fixed_functions": self.fixed_functions,
                "use_resnet_dt": self.use_resnet_dt,
                "adp_per_term": self.adp_per_term}


# ----------------------------------------------------------------------
class EamAlloyNN(EamNN):
    """eam/alloy: rho depends on the neighbor element only
    (`alloy.py:128-197`)."""

    tag = "alloy"

    @property
    def _sections(self):
        sections = {e: ["rho", "embed"] for e in self.elements}
        for term in self.unique_kbody_terms:
            sections[term] = ["phi"]
        return sections

    def _rho_sum(self, params, features, r, mask, ei, ej) -> jnp.ndarray:
        total = jnp.zeros_like(r)
        for idx, e in enumerate(self.elements):
            rho = self._fn(params, e, "rho", "rho")(r)
            total = total + jnp.where(ej == idx, rho, 0.0)
        n_vap = features["positions"].shape[0]
        return jax.ops.segment_sum(total * mask, features["pair_i"],
                                   num_segments=n_vap)

    def atomic_energies(self, params, features) -> jnp.ndarray:
        _, r, mask, ei, ej = self._pair_geometry(features)
        rho_i = self._rho_sum(params, features, r, mask, ei, ej)
        embed = self._embed_energy(params, rho_i)
        phi = self._phi_energy(params, features, r, mask, ei, ej)
        return (embed + phi) * features["atom_masks"]


class EamFsNN(EamNN):
    """eam/fs: rho indexed by the ordered (center, neighbor) pair
    (`fs.py:146-204`). The rho section name is 'AB' = center A,
    neighbor B."""

    tag = "fs"

    @property
    def _sections(self):
        sections = {e: ["embed"] for e in self.elements}
        for a in self.elements:
            for b in self.elements:
                sections.setdefault(a + b, []).append("rho")
        for term in self.unique_kbody_terms:
            sections.setdefault(term, [])
            if "phi" not in sections[term]:
                sections[term].append("phi")
        return sections

    def _rho_sum(self, params, features, r, mask, ei, ej) -> jnp.ndarray:
        n = len(self.elements)
        total = jnp.zeros_like(r)
        for i, a in enumerate(self.elements):
            for j, b in enumerate(self.elements):
                rho = self._fn(params, a + b, "rho", "rho")(r)
                total = total + jnp.where((ei == i) & (ej == j), rho, 0.0)
        n_vap = features["positions"].shape[0]
        return jax.ops.segment_sum(total * mask, features["pair_i"],
                                   num_segments=n_vap)

    atomic_energies = EamAlloyNN.atomic_energies


class AdpNN(EamAlloyNN):
    """Angular-dependent potential (`adp.py:315-588`): EAM/alloy plus
    dipole u(r) and quadrupole w(r) branches."""

    tag = "adp"

    @property
    def _sections(self):
        sections = {e: ["rho", "embed"] for e in self.elements}
        for term in self.unique_kbody_terms:
            sections[term] = ["phi", "dipole", "quadrupole"]
        return sections

    def _adp_moments(self, params, features, vec, r, mask, ei, ej):
        """Linear dipole/quadrupole moments (mu [nseg, 3],
        lam [nseg, 3, 3]) — accumulated BEFORE squaring so chunked
        evaluation stays exact."""
        n_vap = features["positions"].shape[0]
        n_ut = len(self.unique_kbody_terms)
        ut = jnp.asarray(self._uterm_table)[ei, ej]
        pair_i = features["pair_i"]
        if self.adp_per_term:
            seg = pair_i * n_ut + ut
            nseg = n_vap * n_ut
        else:
            seg = pair_i
            nseg = n_vap

        u_tot = jnp.zeros_like(r)
        w_tot = jnp.zeros_like(r)
        for t, term in enumerate(self.unique_kbody_terms):
            if not self._term_possible(term):
                continue
            sel = ut == t
            u_tot = u_tot + jnp.where(
                sel, self._fn(params, term, "dipole", "dipole")(r), 0.0)
            w_tot = w_tot + jnp.where(
                sel, self._fn(params, term, "quadrupole", "quadrupole")(r),
                0.0)
        u_tot = u_tot * mask
        w_tot = w_tot * mask

        mu = jax.ops.segment_sum(u_tot[:, None] * vec, seg,
                                 num_segments=nseg)
        dd = vec[:, :, None] * vec[:, None, :]
        lam = jax.ops.segment_sum(w_tot[:, None, None] * dd, seg,
                                  num_segments=nseg)
        return mu, lam

    def _adp_quadratic(self, mu, lam, n_vap) -> jnp.ndarray:
        e_mu = 0.5 * jnp.sum(jnp.square(mu), axis=-1)
        sq = jnp.square(lam)
        # 1/2 [sum_aa + 2 sum_{a<b}] = 1/2 sum over the full 3x3 with
        # off-diagonals counted twice = matches c_ab = 2 for a != b
        e_lam = 0.5 * jnp.sum(sq, axis=(-1, -2))
        nu = jnp.trace(lam, axis1=-2, axis2=-1)
        e_trace = jnp.square(nu) / 6.0
        e = e_mu + e_lam - e_trace
        if self.adp_per_term:
            e = e.reshape(n_vap, len(self.unique_kbody_terms)).sum(axis=1)
        return e

    def _adp_energy(self, params, features, vec, r, mask, ei, ej
                    ) -> jnp.ndarray:
        mu, lam = self._adp_moments(params, features, vec, r, mask, ei, ej)
        return self._adp_quadratic(mu, lam, features["positions"].shape[0])

    def _pair_term_accumulators(self, params, features) -> dict:
        vec, r, mask, ei, ej = self._pair_geometry(features)
        mu, lam = self._adp_moments(params, features, vec, r, mask, ei, ej)
        return {"rho": self._rho_sum(params, features, r, mask, ei, ej),
                "phi": self._phi_energy(params, features, r, mask, ei, ej),
                "mu": mu, "lam": lam}

    def _finalize_accumulators(self, params, acc: dict,
                               features) -> jnp.ndarray:
        embed = self._embed_energy(params, acc["rho"])
        adp = self._adp_quadratic(acc["mu"], acc["lam"],
                                  features["positions"].shape[0])
        return (embed + acc["phi"] + adp) * features["atom_masks"]

    def atomic_energies(self, params, features) -> jnp.ndarray:
        vec, r, mask, ei, ej = self._pair_geometry(features)
        rho_i = self._rho_sum(params, features, r, mask, ei, ej)
        embed = self._embed_energy(params, rho_i)
        phi = self._phi_energy(params, features, r, mask, ei, ej)
        adp = self._adp_energy(params, features, vec, r, mask, ei, ej)
        return (embed + phi + adp) * features["atom_masks"]


# ----------------------------------------------------------------------
def model_from_dict(d: dict, featurizer=None, max_occurs=None):
    from ...transform.featurizer import Featurizer as _F
    if featurizer is None:
        featurizer = _F.from_dict(d["featurizer"])
    if max_occurs is None:
        max_occurs = Counter(d["max_occurs"])
    cls = {"EamAlloyNN": EamAlloyNN, "EamFsNN": EamFsNN,
           "AdpNN": AdpNN}[d["class"]]
    return cls(featurizer, max_occurs,
               custom_potentials=d.get("custom_potentials"),
               hidden_sizes=d.get("hidden_sizes"),
               activation=d.get("activation", "softplus"),
               fixed_functions=d.get("fixed_functions"),
               use_resnet_dt=d.get("use_resnet_dt", False),
               adp_per_term=d.get("adp_per_term", True))
