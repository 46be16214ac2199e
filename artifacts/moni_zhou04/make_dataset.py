"""Build the mixed Ni-Mo binary training database labeled with the
published Zhou04 (zjw04) EAM alloy potential.

Why: the reference's flagship binary NN(Mo-Ni) model trained on a
3,673-structure DFT database (manuscript.tex:1188-1190) that is not
bundled with the reference snapshot and cannot be fetched offline.
This dataset reproduces the TASK — six subsets (bcc Mo, fcc Ni,
Ni4Mo, Ni3Mo, dilute Ni(Mo) antisite, dilute Mo(Ni) antisite) with
energies/forces/stresses — against ground truth this framework can
generate exactly: its own zjw04 implementation, which is verified to
machine precision against the published setfl tables
(tests/test_eam.py::test_zjw04_vs_published_tables). A model that
learns Mo-Ni cross interactions to low MAE here exercises every piece
of the binary machinery (Mo-Mo/Mo-Ni/Ni-Ni kbody channels, mixed
max_occurs, per-element static energies, alloy stress) on labels with
a known generating process.
"""
import sys
sys.path.insert(0, '/root/repo')
import os

import jax
jax.config.update('jax_platforms', 'cpu')
jax.config.update('jax_enable_x64', True)

import numpy as np
import jax.numpy as jnp
from collections import Counter

from tensoralloy_tpu.precision import set_precision
set_precision('high')
from tensoralloy_tpu.atoms import Structure
from tensoralloy_tpu.data.crystals import fcc, bcc, built_in_crystals
from tensoralloy_tpu.transform import Featurizer
from tensoralloy_tpu.nn.eam import EamAlloyNN
from tensoralloy_tpu.nn.fields import make_efs_fn
from tensoralloy_tpu.io.sqlite import connect

rng = np.random.RandomState(611)
A_NI, A_MO = 3.52, 3.147


def perturb(s, rattle, strain_iso, strain_shear):
    """Random rattle + random symmetric strain of a Structure."""
    eps = np.zeros((3, 3))
    eps += np.eye(3) * rng.uniform(-strain_iso, strain_iso)
    sh = rng.uniform(-strain_shear, strain_shear, 3)
    eps[0, 1] = eps[1, 0] = sh[0]
    eps[0, 2] = eps[2, 0] = sh[1]
    eps[1, 2] = eps[2, 1] = sh[2]
    f = np.eye(3) + eps
    cell = s.cell @ f.T
    pos = s.positions @ f.T + rng.normal(0, rattle, s.positions.shape)
    return Structure.from_symbols(list(s.symbols), pos, cell,
                                  pbc=[True] * 3)


def substitute(s, frm, to, count):
    syms = list(s.symbols)
    idx = [k for k, e in enumerate(syms) if e == frm]
    for k in rng.choice(idx, size=count, replace=False):
        syms[k] = to
    return Structure.from_symbols(syms, s.positions.copy(),
                                  s.cell.copy(), pbc=[True] * 3)


def subsets():
    ni = fcc("Ni", A_NI).repeat((3, 3, 3))          # 108 atoms
    mo = bcc("Mo", A_MO).repeat((3, 3, 3))          # 54 atoms
    cr = built_in_crystals()
    ni3mo = cr["Ni3Mo"].structure.repeat((2, 2, 1)) # ordered intermetallic
    ni4mo = cr["Ni4Mo"].structure.repeat((2, 2, 2))
    out = []
    def gen(tag, base0, n, rat=(0.02, 0.14), iso=0.05, shear=0.03,
            sub=None):
        for k in range(n):
            base = substitute(base0, *sub) if sub else base0
            s = perturb(base, rng.uniform(*rat), iso, shear)
            s.info["source"] = tag
            out.append(s)
    gen("Mo", mo, 260)
    gen("Ni", ni, 260)
    gen("Ni3Mo", ni3mo, 230)
    gen("Ni4Mo", ni4mo, 230)
    # dilute antisites: 1-4 substitutions
    for k in range(180):
        s = perturb(substitute(ni, "Ni", "Mo", rng.randint(1, 5)),
                    rng.uniform(0.02, 0.12), 0.04, 0.02)
        s.info["source"] = "Mo|Ni"    # Mo solutes in Ni host
        out.append(s)
    for k in range(180):
        s = perturb(substitute(mo, "Mo", "Ni", rng.randint(1, 5)),
                    rng.uniform(0.02, 0.12), 0.04, 0.02)
        s.info["source"] = "Ni|Mo"
        out.append(s)
    # random solid solutions near 50/50 (fcc + bcc hosts)
    for k in range(100):
        host, frm = (ni, "Ni") if k % 2 else (mo, "Mo")
        to = "Mo" if frm == "Ni" else "Ni"
        nsub = int(0.5 * sum(1 for e in host.symbols if e == frm))
        s = perturb(substitute(host, frm, to, nsub),
                    rng.uniform(0.03, 0.12), 0.04, 0.02)
        s.info["source"] = "ss"
        out.append(s)
    return out


def main():
    structures = subsets()
    rng.shuffle(structures)
    fz = Featurizer(["Mo", "Ni"], rcut=6.0)
    max_occurs = Counter()
    for s in structures:
        for e, c in Counter(s.symbols).items():
            max_occurs[e] = max(max_occurs[e], c)
    model = EamAlloyNN(fz, max_occurs, custom_potentials="zjw04")
    params = model.init_params(jax.random.PRNGKey(0))
    efs = jax.jit(make_efs_fn(model.energy))

    db_path = os.path.join(os.path.dirname(__file__), "moni-zhou04.db")
    if os.path.exists(db_path):
        os.remove(db_path)
    db = connect(db_path)
    done = []
    for k, s in enumerate(structures):
        vap = fz.make_vap(s, max_occurs)
        # bucket pair count so jit re-specializes only per bucket
        feats = {key: jnp.asarray(v) for key, v in fz.featurize(
            s, vap, pair_bucket=lambda m: 1 << (m - 1).bit_length(),
            dtype=np.float64).items()}
        out = efs(params, feats)
        s.info["energy"] = float(out["energy"])
        s.info["forces"] = vap.reverse_map(np.asarray(out["forces"]))
        # ase voigt order, eV/A^3
        st = np.asarray(out["stress"])
        s.info["stress"] = np.array([st[0, 0], st[1, 1], st[2, 2],
                                     st[1, 2], st[0, 2], st[0, 1]])
        done.append(s)
        if (k + 1) % 100 == 0:
            print(f"{k + 1}/{len(structures)} labeled", flush=True)
    db.write_many(done)
    print("db:", db_path, len(db), db.elements,
          "static:", db.get_atomic_static_energy())


if __name__ == "__main__":
    main()
