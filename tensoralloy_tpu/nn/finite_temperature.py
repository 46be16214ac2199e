"""Temperature-dependent atomistic NN (reference
`tensoralloy/nn/atomic/finite_temperature.py`).

Per element: descriptors x -> shared trunk MLP (``layers[:-1]`` hidden,
``layers[-1]`` out) -> H; electron temperature T (eV) appended as one
extra channel -> Ht; two heads on Ht:

  * internal energy U (output bias = per-element static energy)
  * electron entropy S — "default": S = head(Ht); "Sommerfeld":
    S = head(Ht) * T (S ~ gamma(h) T semi-analytic form)

Free energy F = U - T S. Forces/stress/Hessian differentiate the
*free* energy (the variational energy, reference `basic.py:190-202`).
"""
from __future__ import annotations

from collections import Counter
from typing import Dict, Sequence

import jax
import jax.numpy as jnp

from .atomic import AtomicNN
from .layers import (apply_dense_stack, init_dense_stack, l2_of_stack,
                     freeze_output_bias, minmax_normalize_apply,
                     minmax_normalize_init)


class TemperatureDependentAtomicNN(AtomicNN):
    """Finite-temperature model; inherits descriptor/layout machinery."""

    def __init__(self, featurizer, max_occurs: Counter, descriptor,
                 layers: Sequence[int] = (128, 128),
                 eentropy_algo: str = "default",
                 ft_activation: str = "softplus",
                 **kwargs):
        super().__init__(featurizer, max_occurs, descriptor, **kwargs)
        self.layers = list(layers)
        self.eentropy_algo = eentropy_algo
        self.ft_activation = ft_activation

    # ------------------------------------------------------------------
    def clone_for(self, max_occurs: Counter):
        return type(self)(self.featurizer, max_occurs, self.descriptor,
                          layers=self.layers,
                          eentropy_algo=self.eentropy_algo,
                          ft_activation=self.ft_activation,
                          hidden_sizes=self.hidden_sizes,
                          activation=self.activation,
                          use_resnet_dt=self.use_resnet_dt,
                          minmax_scale=self.minmax_scale,
                          atomic_static_energy=self.atomic_static_energy,
                          fixed_static_energy=self.fixed_static_energy,
                          kernel_initializer=self.kernel_initializer)

    # -- atom-chunked evaluation (large-cell single-chip inference) ----
    def heads_chunked(self, params: dict, features,
                      atom_chunk: int = 4096) -> Dict[str, jnp.ndarray]:
        """Totals {'energy': U, 'eentropy': S, 'free_energy': U - T*S}
        with the dense per-atom layout processed in rematerialized
        `lax.scan` row blocks (trunk + U/S heads per block; equal to
        `energy_ops` up to float summation order).  Mirrors
        `AtomicNN.energy_chunked` for the finite-temperature head
        structure (reference `finite_temperature.py:211-357`)."""
        base, blocks, chunk, d_keys = self._chunk_blocks(
            features, atom_chunk)
        t = features["etemperature"]

        @jax.checkpoint
        def body(carry, blk):
            f = dict(base)
            f.update({k: blk[k] for k in d_keys})
            f["positions_rows"] = blk["positions_rows"]
            g = self.descriptors(f, params)          # [chunk, D]
            u_rows = jnp.zeros((chunk,), g.dtype)
            s_rows = jnp.zeros((chunk,), g.dtype)
            for ti, e in enumerate(self.elements):
                if self.max_occurs.get(e, 0) == 0:
                    continue
                x = g
                if self.minmax_scale:
                    x = minmax_normalize_apply(params[e]["norm"], x)
                h = apply_dense_stack(params[e]["trunk"], x,
                                      self.ft_activation)
                ht = jnp.concatenate(
                    [h, jnp.full((chunk, 1), t, h.dtype)], axis=1)
                head_u = params[e]["head_u"]
                if self.fixed_static_energy:
                    head_u = freeze_output_bias(head_u)
                u = apply_dense_stack(head_u, ht, self.activation)[:, 0]
                s = self._entropy_from_head(
                    apply_dense_stack(params[e]["head_s"], ht,
                                      self.activation)[:, 0], t)
                u_rows = jnp.where(blk["eidx_rows"] == ti, u, u_rows)
                s_rows = jnp.where(blk["eidx_rows"] == ti, s, s_rows)
            m = blk["atom_masks_rows"]
            return (carry[0] + jnp.sum(u_rows * m),
                    carry[1] + jnp.sum(s_rows * m)), None

        zero = jnp.zeros((), jnp.asarray(features["positions"]).dtype)
        (u_tot, s_tot), _ = jax.lax.scan(body, (zero, zero), blocks)
        return {"energy": u_tot, "eentropy": s_tot,
                "free_energy": u_tot - t * s_tot}

    def energy_chunked(self, params, features,
                       atom_chunk: int = 4096) -> jnp.ndarray:
        """Internal energy U via the chunked path."""
        return self.heads_chunked(params, features, atom_chunk)["energy"]

    def make_chunked_energy_fn(self, atom_chunk: int = 4096):
        """Chunked *variational* energy (free energy F = U - T S) —
        what large-cell forces/stress must differentiate for the
        finite-temperature family (reference `basic.py:190-202`)."""
        return lambda p, f: self.heads_chunked(
            p, f, atom_chunk)["free_energy"]

    def init_params(self, key) -> dict:
        params = {}
        key, sub = jax.random.split(key)
        dparams = self.descriptor.init_params(sub)
        if dparams:
            params["descriptor"] = dparams
        trunk_out = self.layers[-1]
        for e in self.elements:
            key, k1, k2, k3 = jax.random.split(key, 4)
            bias0 = float(self.atomic_static_energy.get(e, 0.0))
            p = {
                "trunk": init_dense_stack(
                    k1, self.feature_dim, self.layers[:-1],
                    out_dim=trunk_out, output_bias=True,
                    resnet_dt=self.use_resnet_dt,
                    kernel_init=self.kernel_initializer),
                "head_u": init_dense_stack(
                    k2, trunk_out + 1, self.hidden_sizes[e], out_dim=1,
                    output_bias=True, output_bias_mean=bias0,
                    resnet_dt=self.use_resnet_dt,
                    kernel_init=self.kernel_initializer),
                "head_s": init_dense_stack(
                    k3, trunk_out + 1, self.hidden_sizes[e], out_dim=1,
                    output_bias=True, output_bias_mean=0.0,
                    resnet_dt=self.use_resnet_dt,
                    kernel_init=self.kernel_initializer),
            }
            if self.minmax_scale:
                p["norm"] = minmax_normalize_init(
                    self.feature_dim, p["trunk"]["layers"][0]["w"].dtype)
            params[e] = p
        return params

    # hook: map the raw entropy-head output to S (subclasses override,
    # e.g. BeNN's semi-analytic free-electron form)
    def _entropy_from_head(self, s_raw: jnp.ndarray,
                           t: jnp.ndarray) -> jnp.ndarray:
        if self.eentropy_algo.lower() == "sommerfeld":
            return s_raw * t
        return s_raw

    # ------------------------------------------------------------------
    def _atomic_heads(self, params: dict, features
                      ) -> Dict[str, jnp.ndarray]:
        """-> {'energy': U_i, 'eentropy': S_i, 'free_energy': F_i},
        each [n_vap] masked."""
        g = self.descriptors(features, params)
        t = features["etemperature"]
        masks = features["atom_masks"]
        u_out = jnp.zeros((self.n_atoms_vap,), g.dtype)
        s_out = jnp.zeros((self.n_atoms_vap,), g.dtype)
        for e in self.elements:
            lo, cnt = self.layout[e]
            if cnt == 0:
                continue
            x = jax.lax.dynamic_slice_in_dim(g, lo, cnt, axis=0)
            if self.minmax_scale:
                x = minmax_normalize_apply(params[e]["norm"], x)
            h = apply_dense_stack(params[e]["trunk"], x,
                                  self.ft_activation)
            tcol = jnp.full((cnt, 1), t, h.dtype)
            ht = jnp.concatenate([h, tcol], axis=1)
            head_u = params[e]["head_u"]
            if self.fixed_static_energy:
                head_u = freeze_output_bias(head_u)
            u = apply_dense_stack(head_u, ht, self.activation)[:, 0]
            s = apply_dense_stack(params[e]["head_s"], ht,
                                  self.activation)[:, 0]
            s = self._entropy_from_head(s, t)
            u_out = jax.lax.dynamic_update_slice_in_dim(u_out, u, lo, 0)
            s_out = jax.lax.dynamic_update_slice_in_dim(s_out, s, lo, 0)
        u_out = u_out * masks
        s_out = s_out * masks
        return {"energy": u_out, "eentropy": s_out,
                "free_energy": u_out - t * s_out}

    def atomic_energies(self, params, features) -> jnp.ndarray:
        return self._atomic_heads(params, features)["energy"]

    def energy_ops(self, params, features) -> Dict[str, jnp.ndarray]:
        heads = self._atomic_heads(params, features)
        return {k: jnp.sum(v) for k, v in heads.items()}

    def energy(self, params, features) -> jnp.ndarray:
        """Internal energy U."""
        return jnp.sum(self.atomic_energies(params, features))

    def variational_energy(self, params, features) -> jnp.ndarray:
        """Free energy F = U - T S; this is what forces/stress
        differentiate for finite-temperature systems."""
        return jnp.sum(self._atomic_heads(params, features)["free_energy"])

    def l2_loss(self, params: dict) -> jnp.ndarray:
        total = 0.0
        for e in self.elements:
            for key in ("trunk", "head_u", "head_s"):
                total = total + l2_of_stack(params[e][key])
        return total

    def as_dict(self) -> dict:
        d = super().as_dict()
        d["class"] = "TemperatureDependentAtomicNN"
        d["layers"] = self.layers
        d["eentropy_algo"] = self.eentropy_algo
        d["ft_activation"] = self.ft_activation
        return d
