"""MD trajectory observables: RDF, MSD, VACF, diffusion.

The reference delegates MD (and therefore all trajectory analysis) to
LAMMPS/ASE through its exporters; here the trajectory comes straight
out of `dynamics.VelocityVerlet`, so the observables live next to it.
The pair histogram — the O(N^2) hot loop — runs as ONE jitted device
program per frame (minimum-image deltas + bincount); the time-series
reductions (MSD/VACF averaging over lag origins) are cheap host numpy.

Units follow `dynamics.py`: positions A, velocities A/fs, time fs.
"""
from __future__ import annotations

from typing import Dict, List, Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..atoms import Structure

__all__ = ["radial_distribution", "mean_squared_displacement",
           "velocity_autocorrelation", "vibrational_dos",
           "diffusion_coefficient"]


def _pair_histogram_fn(nbins: int, rmax: float):
    """jit: (positions [N,3], cell [3,3], sel_i [N], sel_j [N]) ->
    distance histogram [nbins] over minimum-image pairs i in sel_i,
    j in sel_j, i != j. Selections are {0,1} masks so one compiled
    program serves every species pair of a frame."""

    def hist(pos, cell, sel_i, sel_j):
        inv = jnp.linalg.inv(cell)
        frac = pos @ inv
        d = frac[:, None, :] - frac[None, :, :]
        d = d - jnp.round(d)
        dr = jnp.einsum("ijk,kl->ijl", d, cell)
        r = jnp.sqrt(jnp.sum(dr * dr, axis=-1) + 1e-32)
        pair_w = sel_i[:, None] * sel_j[None, :]
        pair_w = pair_w * (1.0 - jnp.eye(pos.shape[0], dtype=pos.dtype))
        bins = jnp.floor(r / rmax * nbins).astype(jnp.int32)
        valid = (bins < nbins) & (pair_w > 0)
        bins = jnp.where(valid, bins, nbins)      # overflow bucket
        # counts are exact integers (selections are {0,1} masks):
        # accumulate int32, not pos.dtype — float32 scatter-adds lose
        # +1 increments once a bin passes ~1.6e7 (large-N frames put
        # N^2-scale counts in a bin) and silently underestimate g(r)
        return jnp.zeros(nbins + 1, jnp.int32).at[
            bins.reshape(-1)].add(
            valid.astype(jnp.int32).reshape(-1))[:nbins]

    return jax.jit(hist)


def radial_distribution(
        frames: Union[Structure, Sequence[Structure]],
        rmax: float = 6.0, nbins: int = 200,
        pairs: Optional[Sequence[Tuple[str, str]]] = None,
) -> Dict[str, np.ndarray]:
    """Partial radial distribution functions g_ab(r).

    `frames`: one Structure or a trajectory (all frames must share
    the stoichiometry; cells may differ, e.g. under NPT). `pairs`:
    species pairs to resolve (default: all unordered pairs plus the
    total). Normalization: g_ab(r) = <n_ab(r)> / (N_a rho_b 4 pi
    r^2 dr) with rho_b = N_b/V, so an ideal gas gives g = 1 and
    integrating rho_b g_ab 4 pi r^2 dr over the first peak yields the
    a-b coordination number.

    -> {"r": centers [nbins], "total": g [nbins], "Ni-Ni": ..., ...}
    `rmax` must stay below half the shortest cell width for the
    minimum-image convention to be exact (checked per frame).
    """
    if isinstance(frames, Structure):
        frames = [frames]
    symbols = frames[0].symbols
    species = sorted(set(symbols))
    if pairs is None:
        pairs = [(a, b) for i, a in enumerate(species)
                 for b in species[i:]]
    hist_fn = _pair_histogram_fn(nbins, float(rmax))
    edges = np.linspace(0.0, rmax, nbins + 1)
    dr = edges[1] - edges[0]
    centers = 0.5 * (edges[1:] + edges[:-1])
    masks = {el: np.asarray([s == el for s in symbols], float)
             for el in species}
    n_of = {el: masks[el].sum() for el in species}
    acc = {pair: np.zeros(nbins) for pair in pairs}
    acc_total = np.zeros(nbins)
    ones = np.ones(len(symbols))
    vol_mean = 0.0
    for s in frames:
        if list(s.symbols) != list(symbols):
            raise ValueError("all frames must share one stoichiometry")
        widths = s.volume / np.linalg.norm(
            np.cross(np.roll(s.cell, 1, 0), np.roll(s.cell, 2, 0)),
            axis=1)
        if rmax > 0.5 * widths.min() + 1e-9:
            raise ValueError(
                f"rmax={rmax} exceeds half the shortest cell width "
                f"({0.5 * widths.min():.3f} A): minimum image invalid")
        pos = jnp.asarray(s.positions, jnp.float32)
        cell = jnp.asarray(s.cell, jnp.float32)
        vol_mean += s.volume / len(frames)
        for a, b in pairs:
            h = np.asarray(hist_fn(pos, cell,
                                   jnp.asarray(masks[a], jnp.float32),
                                   jnp.asarray(masks[b], jnp.float32)))
            acc[(a, b)] += h / len(frames)
        acc_total += np.asarray(
            hist_fn(pos, cell, jnp.asarray(ones, jnp.float32),
                    jnp.asarray(ones, jnp.float32))) / len(frames)
    shell = 4.0 * np.pi * centers ** 2 * dr
    out = {"r": centers}
    n_all = float(len(symbols))
    out["total"] = acc_total / (shell * n_all * (n_all / vol_mean))
    for a, b in pairs:
        norm = shell * n_of[a] * (n_of[b] / vol_mean)
        out[f"{a}-{b}"] = acc[(a, b)] / np.maximum(norm, 1e-300)
    return out


def mean_squared_displacement(positions: np.ndarray,
                              timestep: float = 1.0,
                              max_lag: Optional[int] = None
                              ) -> Dict[str, np.ndarray]:
    """MSD(tau) averaged over all lag origins and atoms.

    `positions`: UNWRAPPED trajectory [T, N, 3] (the MD engine never
    wraps, so its recorded positions qualify). `timestep`: fs between
    frames. -> {"t": lag times [L], "msd": A^2 [L]} with L =
    min(max_lag, T-1).
    """
    pos = np.asarray(positions)
    t_frames, _, _ = pos.shape
    lmax = min(max_lag or (t_frames - 1), t_frames - 1)
    msd = np.empty(lmax)
    for lag in range(1, lmax + 1):
        d = pos[lag:] - pos[:-lag]
        msd[lag - 1] = np.mean(np.sum(d * d, axis=-1))
    return {"t": np.arange(1, lmax + 1) * timestep, "msd": msd}


def velocity_autocorrelation(velocities: np.ndarray,
                             timestep: float = 1.0,
                             max_lag: Optional[int] = None
                             ) -> Dict[str, np.ndarray]:
    """Normalized VACF(tau) = <v(t).v(t+tau)> / <v.v> over [T, N, 3]
    velocities. -> {"t": [L+1] (incl. tau=0), "vacf": [L+1]}."""
    v = np.asarray(velocities)
    t_frames = v.shape[0]
    lmax = min(max_lag or (t_frames - 1), t_frames - 1)
    c = np.empty(lmax + 1)
    for lag in range(lmax + 1):
        a = v[:t_frames - lag] if lag else v
        b = v[lag:] if lag else v
        c[lag] = np.mean(np.sum(a * b, axis=-1))
    return {"t": np.arange(lmax + 1) * timestep, "vacf": c / c[0]}


def vibrational_dos(velocities: np.ndarray, timestep: float = 1.0,
                    masses: Optional[np.ndarray] = None,
                    max_lag: Optional[int] = None
                    ) -> Dict[str, np.ndarray]:
    """Vibrational density of states from MD velocities: the cosine
    transform of the (mass-weighted) velocity autocorrelation with a
    Hann window — the anharmonic, finite-temperature counterpart of
    `analysis.phonon.PhononCalculator.dos` (exact q-mesh mode sums),
    usable to cross-check the harmonic spectrum or to see shifts in a
    liquid/hot crystal where the harmonic picture fails.

    `velocities` [T, N, 3] A/fs (as recorded by
    `dynamics.VelocityVerlet.run(record_trajectory=True)`), `timestep`
    fs BETWEEN FRAMES, `masses` [N] amu (uniform weights if omitted).

    Returns {"freq_thz", "dos"} with the DOS normalized to unit
    integral over the sampled band (Nyquist = 500/timestep THz).
    """
    v = np.asarray(velocities, dtype=np.float64)
    t_frames = v.shape[0]
    if t_frames < 2:
        raise ValueError("vibrational_dos needs at least 2 frames "
                         f"(got {t_frames})")
    lmax = min(max_lag or (t_frames - 1), t_frames - 1)
    w = (np.ones(v.shape[1]) if masses is None
         else np.asarray(masses, np.float64))
    c = np.empty(lmax + 1)
    for lag in range(lmax + 1):
        a = v[:t_frames - lag] if lag else v
        b = v[lag:] if lag else v
        c[lag] = np.mean(np.sum(a * b, axis=-1) @ w) / w.sum()
    c /= c[0]
    hann = 0.5 * (1.0 + np.cos(np.pi * np.arange(lmax + 1) / lmax))
    ct = c * hann
    # one-sided cosine transform on the lag grid
    nfreq = lmax + 1
    freqs = np.arange(nfreq) / (2.0 * lmax * timestep)   # 1/fs
    phase = 2.0 * np.pi * np.outer(freqs, np.arange(lmax + 1)
                                   * timestep)
    weights = np.ones(lmax + 1)
    weights[0] = 0.5                                      # trapezoid
    weights[-1] = 0.5
    dos = 2.0 * timestep * (np.cos(phase) * (ct * weights)).sum(axis=1)
    dos = np.maximum(dos, 0.0)
    area = np.trapezoid(dos, freqs) if hasattr(np, "trapezoid") \
        else np.trapz(dos, freqs)
    if area > 0:
        dos /= area
    return {"freq_thz": freqs * 1000.0, "dos": dos / 1000.0}


def diffusion_coefficient(positions: np.ndarray,
                          timestep: float = 1.0,
                          fit_start: float = 0.5) -> float:
    """Einstein diffusion coefficient D = slope(MSD)/6 in A^2/fs,
    least-squares over the tail of the MSD curve (`fit_start` as a
    fraction of the maximum lag, skipping the ballistic onset)."""
    res = mean_squared_displacement(positions, timestep)
    t, msd = res["t"], res["msd"]
    i0 = int(len(t) * fit_start)
    if len(t) - i0 < 2:
        i0 = max(0, len(t) - 2)
    slope = np.polyfit(t[i0:], msd[i0:], 1)[0]
    return float(slope / 6.0)
