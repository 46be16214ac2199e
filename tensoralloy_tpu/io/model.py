"""Frozen-model serialization (the reference's frozen-graph `.pb` role,
`tensoralloy/nn/basic.py:1017-1153`).

A saved model is a single ``.npz`` holding the flat parameter arrays
plus a JSON config string (model class, featurizer, descriptor,
max_occurs, precision, metadata) — everything the calculator needs to
rebuild the jittable energy function. API version mirrors the
reference's exported-metadata contract ("1.1").
"""
from __future__ import annotations

import json
import time
from typing import Tuple

import jax
import numpy as np

API_VERSION = "1.1"


def _flatten(tree, prefix="p") -> dict:
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(tree):
        key = prefix + "/" + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        flat[key] = np.asarray(leaf)
    return flat


def _unflatten(flat: dict, template, prefix="p"):
    def visit(kp, leaf):
        key = prefix + "/" + "/".join(
            str(getattr(p, "key", getattr(p, "idx", p))) for p in kp)
        return flat[key]
    return jax.tree_util.tree_map_with_path(visit, template)


def save_model(path: str, model, params, extra_metadata: dict = None):
    """Serialize a trained model + params to one file."""
    config = {
        "model": model.as_dict(),
        "api_version": API_VERSION,
        "timestamp": time.strftime("%Y-%m-%d %H:%M:%S"),
        "framework": "tensoralloy_tpu",
        "precision": str(np.asarray(
            jax.tree_util.tree_leaves(params)[0]).dtype),
    }
    if extra_metadata:
        config.update(extra_metadata)
    flat = _flatten(params)
    flat["__config__"] = np.frombuffer(
        json.dumps(config).encode(), dtype=np.uint8)
    np.savez(path, **flat)


def load_model(path: str) -> Tuple[object, dict, dict]:
    """-> (model, params, config). Rebuilds the model from its config."""
    with np.load(path) as z:
        flat = {k: z[k] for k in z.files}
    config = json.loads(bytes(flat.pop("__config__")).decode())
    model = model_from_dict(config["model"])
    template = model.init_params(jax.random.PRNGKey(0))
    params = _unflatten(flat, template)
    return model, params, config


def model_from_dict(d: dict):
    """Model registry / factory."""
    from collections import Counter
    from ..transform.featurizer import Featurizer
    cls = d["class"]
    fz = Featurizer.from_dict(d["featurizer"])
    max_occurs = Counter(d["max_occurs"])
    if cls in ("AtomicNN", "TemperatureDependentAtomicNN", "BeNN"):
        desc = descriptor_from_dict(d["descriptor"])
        from ..nn.atomic import AtomicNN
        kwargs = dict(
            hidden_sizes=d.get("hidden_sizes"),
            activation=d.get("activation", "softplus"),
            use_resnet_dt=d.get("use_resnet_dt", True),
            minmax_scale=d.get("minmax_scale", True),
            atomic_static_energy=d.get("atomic_static_energy"),
            fixed_static_energy=d.get("fixed_static_energy", False))
        if cls == "AtomicNN":
            return AtomicNN(fz, max_occurs, desc, **kwargs)
        from ..nn.finite_temperature import TemperatureDependentAtomicNN
        from ..nn.special import BeNN
        td_cls = BeNN if cls == "BeNN" else TemperatureDependentAtomicNN
        return td_cls(
            fz, max_occurs, desc,
            layers=d.get("layers", [128, 128]),
            eentropy_algo=d.get("eentropy_algo", "default"),
            ft_activation=d.get("ft_activation", "softplus"),
            **kwargs)
    if cls in ("EamAlloyNN", "EamFsNN", "AdpNN"):
        from ..nn.eam import model_from_dict as eam_from_dict
        return eam_from_dict(d, fz, max_occurs)
    raise ValueError(f"unknown model class {cls}")


def descriptor_from_dict(d: dict):
    cls = d["class"]
    if cls == "SymmetryFunction":
        from ..nn.sf import SymmetryFunction
        return SymmetryFunction(
            d["elements"], eta=d["eta"], omega=d["omega"], beta=d["beta"],
            gamma=d["gamma"], zeta=d["zeta"],
            cutoff_function=d.get("cutoff_function", "cosine"),
            backend=d.get("backend", "segment"))
    if cls == "GenericRadialAtomicPotential":
        from ..nn.grap import GenericRadialAtomicPotential
        return GenericRadialAtomicPotential.from_dict(d)
    raise ValueError(f"unknown descriptor class {cls}")
