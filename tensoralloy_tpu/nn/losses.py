"""Training losses (reference `tensoralloy/nn/losses.py`).

All functions are pure: ``loss(labels, predictions, ...) -> (loss, mae)``
with jnp arrays; dynamic loss weights interpolate w0 -> w1 (linear or
log10) over `max_train_steps` given the current step.

Loss methods: rmse (sqrt of mse + eps), rrmse (mean row-norm ratio),
logcosh, ylogy (y (log y - log p)^2 — used for entropy heads).
"""
from __future__ import annotations

import dataclasses
from typing import Sequence, Tuple, Union

import jax.numpy as jnp
import jax


Weight = Union[float, Tuple[float, float], Sequence[float]]


@dataclasses.dataclass(frozen=True)
class LossOptions:
    weight: Weight = 1.0
    method: str = "rmse"
    per_atom_loss: bool = False
    logscaled_dynamic_weight: bool = False


@dataclasses.dataclass(frozen=True)
class L2LossOptions:
    weight: float = 0.0
    decayed: bool = True
    decay_rate: float = 0.99
    decay_steps: int = 1000


@dataclasses.dataclass(frozen=True)
class AdaptiveSampleWeightOptions:
    enabled: bool = False
    metric: str = "fmax"          # 'fmax' | 'norm'
    method: str = "sigmoid"
    params: Sequence[float] = (1.0, 5.0, 1.0, 0.1)  # slope, center, wmax, wmin
    normalized: bool = True


@dataclasses.dataclass(frozen=True)
class LossParameters:
    energy: LossOptions = LossOptions(weight=1.0, per_atom_loss=False)
    forces: LossOptions = LossOptions(weight=1.0)
    stress: LossOptions = LossOptions(weight=1.0)
    total_pressure: LossOptions = LossOptions(weight=0.0)
    eentropy: LossOptions = LossOptions(weight=0.0, method="ylogy")
    free_energy: LossOptions = LossOptions(weight=0.0)
    l2: L2LossOptions = L2LossOptions()
    adaptive_sample_weight: AdaptiveSampleWeightOptions = \
        AdaptiveSampleWeightOptions()


def resolve_weight(weight: Weight, step, max_train_steps,
                   logscale: bool = False):
    """Static scalar or (w0, w1) interpolated over training."""
    if isinstance(weight, (int, float)):
        return jnp.asarray(float(weight))
    w0, w1 = float(weight[0]), float(weight[1])
    t = jnp.clip(jnp.asarray(step, jnp.float32) /
                 max(float(max_train_steps or 1), 1.0), 0.0, 1.0)
    if logscale:
        l0, l1 = jnp.log10(jnp.asarray(w0)), jnp.log10(jnp.asarray(w1))
        return 10.0 ** (l0 + (l1 - l0) * t)
    return w0 + (w1 - w0) * t


def _eps(x) -> float:
    return 1e-14 if x.dtype == jnp.float64 else 1e-8


def _weighted_mean_sq(diff, sample_weight, normalized):
    if sample_weight is None:
        return jnp.mean(jnp.square(diff))
    w = sample_weight
    while w.ndim < diff.ndim:
        w = w[..., None]
    if normalized:
        denom = jnp.maximum(jnp.sum(sample_weight), 1e-12)
        scl = 1.0
        for d in diff.shape[1:]:
            scl *= d
        w = w / (denom * scl)
        return jnp.sum(jnp.square(diff) * w)
    return jnp.mean(jnp.square(diff) * w)


def logcosh(x):
    return x + jax.nn.softplus(-2.0 * x) - jnp.log(2.0)


def rmse_loss(labels, predictions, sample_weight=None, normalized=False):
    diff = labels - predictions
    mae = jnp.mean(jnp.abs(diff))
    mse = _weighted_mean_sq(diff, sample_weight, normalized)
    return jnp.sqrt(mse + _eps(diff)), mae


def rrmse_loss(labels, predictions, sample_weight=None):
    """Mean per-structure relative row-norm error (reference
    `losses.py:394-456`): right objective when label magnitudes span
    decades (e.g. +-60 GPa strained frames next to ~0.5 GPa
    equilibrium ones — an absolute loss optimizes only the big rows).
    `sample_weight` masks structures out entirely (has_stress): a
    frame without labels must not contribute a |pred|/eps blow-up."""
    if labels.ndim == 1:
        labels = labels[:, None]
        predictions = predictions[:, None]
    # eps inside the sqrt keeps the gradient finite at diff == 0
    upper = jnp.sqrt(jnp.sum(jnp.square(labels - predictions), axis=1)
                     + 1e-14)
    lower = jnp.maximum(jnp.linalg.norm(labels, axis=1), 1e-12)
    ratio = upper / lower
    adiff = jnp.abs(labels - predictions)
    if sample_weight is not None:
        w = sample_weight
        wsum = jnp.maximum(jnp.sum(w), 1e-12)
        return (jnp.sum(ratio * w) / wsum,
                jnp.sum(adiff * w[:, None]) / (wsum * labels.shape[1]))
    return jnp.mean(ratio), jnp.mean(adiff)


def logcosh_loss(labels, predictions, sample_weight=None, normalized=False):
    diff = labels - predictions
    mae = jnp.mean(jnp.abs(diff))
    v = logcosh(diff)
    if sample_weight is not None:
        w = sample_weight
        while w.ndim < v.ndim:
            w = w[..., None]
        if normalized:
            w = w / jnp.maximum(jnp.sum(sample_weight), 1e-12)
        return jnp.sum(v * w), mae
    return jnp.mean(v), mae


def ylogy_loss(labels, predictions, sample_weight=None, normalized=False):
    eps = 1e-12
    logx = jnp.log(jnp.maximum(labels, eps))
    logy = jnp.log(jnp.maximum(predictions, eps))
    v = jnp.square(logx - logy) * labels
    mae = jnp.mean(jnp.abs(labels - predictions))
    if sample_weight is not None:
        w = sample_weight
        while w.ndim < v.ndim:
            w = w[..., None]
        if normalized:
            w = w / jnp.maximum(jnp.sum(sample_weight), 1e-12)
        return jnp.sum(v * w), mae
    return jnp.mean(v), mae


_METHODS = {"rmse": rmse_loss, "logcosh": logcosh_loss, "ylogy": ylogy_loss}


def scalar_property_loss(labels, predictions, options: LossOptions,
                         n_atoms=None, sample_weight=None,
                         normalized=False):
    """Energy-style loss on [batch] scalars, optional per-atom scaling."""
    if options.per_atom_loss and n_atoms is not None:
        labels = labels / n_atoms
        predictions = predictions / n_atoms
    if options.method == "rrmse":
        return rrmse_loss(labels, predictions, sample_weight)
    return _METHODS[options.method](labels, predictions, sample_weight,
                                    normalized)


def forces_loss(labels, predictions, atom_masks, options: LossOptions,
                sample_weight=None, normalized=True):
    """Masked forces loss on [batch, n_vap, 3] arrays.

    The reference drops the virtual-atom row then boolean-masks padding
    (`losses.py:285-391`); here padding rows are zeroed and the mean runs
    over real entries only.
    """
    mask = atom_masks[:, 1:]                       # drop virtual atom
    diff = (labels[:, 1:] - predictions[:, 1:]) * mask[..., None]
    n_real = jnp.maximum(jnp.sum(mask) * 3.0, 1.0)
    mae = jnp.sum(jnp.abs(diff)) / n_real
    if sample_weight is not None:
        w = sample_weight[:, None, None] * mask[..., None]
        if normalized:
            w = w / (jnp.maximum(jnp.sum(w), 1e-12) * 3.0)
        val = jnp.sum(jnp.square(diff) * w)
    else:
        val = jnp.sum(jnp.square(diff)) / n_real
    if options.method == "logcosh":
        if sample_weight is not None:
            w = sample_weight[:, None, None] * mask[..., None]
            # w is per-atom but logcosh(diff) has 3 components per
            # atom: normalize by 3*sum(w) like the rmse branch, so
            # enabling sample weights does not rescale the loss 3x
            if normalized:
                w = w / (jnp.maximum(jnp.sum(w), 1e-12) * 3.0)
            return jnp.sum(logcosh(diff) * w), mae
        return jnp.sum(logcosh(diff)) / n_real, mae
    return jnp.sqrt(val + _eps(diff)), mae


def stress_loss(labels, predictions, options: LossOptions,
                sample_weight=None, normalized=False):
    if options.method == "rrmse":
        return rrmse_loss(labels, predictions, sample_weight)
    return _METHODS[options.method](labels, predictions, sample_weight,
                                    normalized)


def adaptive_sample_weight(true_forces, atom_masks, n_atoms,
                           options: AdaptiveSampleWeightOptions):
    """Sigmoid down-weighting of high-force structures
    (`losses.py:553-581`)."""
    f = true_forces[:, 1:] * atom_masks[:, 1:, None]
    if options.metric == "norm":
        v = jnp.sqrt(jnp.sum(jnp.square(f), axis=(1, 2)) /
                     jnp.maximum(n_atoms, 1.0))
    else:  # fmax
        v = jnp.max(jnp.abs(f), axis=(1, 2))
    slope, center, wmax, wmin = options.params
    return jax.nn.sigmoid(slope * (center - v)) * wmax + wmin
