"""tensordb: vaspkit parsing on canned fixtures, sampler lifecycle,
microstructure generators."""
import json
import os

import numpy as np
import pytest

from tensoralloy_tpu.tensordb import (VaspJob, recommend_md_timestep,
                                      VaspAimdSampler,
                                      ExistedTrajectorySampler)
from tensoralloy_tpu.tensordb.sampler import (make_phase_structure,
                                              temperature_ladder,
                                              write_poscar)
from tensoralloy_tpu.tensordb import microstructure as ms

DATA = "/root/reference/tensordb/tests/data"


def test_vaspjob_incar_oszicar_outcar():
    job = VaspJob(DATA)
    assert job.get_incar_parameter("ENCUT") == "500.000000"
    assert job.get_incar_parameter("nelmin") == "4"
    steps = job.read_oszicar()
    assert len(steps) >= 1
    assert steps[0]["F"] == pytest.approx(-23.064597, abs=1e-5)
    assert steps[0]["nscf"] == 15
    ranks = job.get_vasp_mpi_omp_ranks()
    assert ranks["mpi"] == 64
    elapsed = job.get_vasp_elapsed_time()
    assert elapsed > 0
    su = job.get_vasp_job_service_unit()
    assert su.ncores == 64
    assert su.core_hours > 0
    assert job.check_vasp_job_scf_convergence() in (True, False)


def test_md_timestep():
    dt = recommend_md_timestep(1000.0, 63.5, 11.8)
    assert 0.1 < dt < 10.0


def test_phase_structures():
    for phase, natoms in [("fcc", 4), ("bcc", 2), ("hcp", 2),
                          ("diamond", 8), ("sc", 1)]:
        s = make_phase_structure("Cu", phase, 3.6)
        assert len(s) == natoms
        assert s.volume > 0
    ladder = temperature_ladder(300, 900, 4)
    np.testing.assert_allclose(ladder, [300, 500, 700, 900])


def test_sampler_lifecycle(tmp_path):
    config = {
        "species": ["Cu"],
        "phases": ["fcc"],
        "fcc": {"a": 3.6, "supercell": [[2, 2, 2]]},
        "aimd": {"sampling": {"nvt": {
            "fcc": {"t0": 300, "t1": 600, "size": 2, "scales": [1.0]},
        }}},
        "vasp": {"sampling": {"encut": 400}},
    }
    sampler = VaspAimdSampler(tmp_path / "work", config)
    created = sampler.create_tasks()
    assert len(created) == 2
    for task in created:
        assert (task / "POSCAR").exists()
        assert (task / "INCAR").exists()
        assert (task / "run.sh").exists()
        assert sampler.get_status(task)["status"] == "created"
    assert len(sampler.list_unsubmitted_tasks()) == 2
    sampler.set_status(created[0], "submitted")
    sampler.purge()   # no vasprun.xml -> reset to created
    assert sampler.get_status(created[0])["status"] == "created"
    # POSCAR sanity
    lines = (created[0] / "POSCAR").read_text().splitlines()
    assert lines[5].strip() == "Cu"
    assert int(lines[6]) == 32


def test_existing_trajectory_sampler(tmp_path):
    from tensoralloy_tpu.io.sqlite import connect
    config = {"species": ["Ni"], "trajectories": [
        "/root/reference/test_files/datasets/Ni/Ni.extxyz"]}
    sampler = ExistedTrajectorySampler(tmp_path / "w", config)
    db = connect(str(tmp_path / "out.db"))
    n = sampler.ingest(db)
    assert n == 2 and len(db) == 2


def test_microstructure_generators():
    s = make_phase_structure("Cu", "fcc", 3.6).repeat((2, 2, 2))
    t = ms.transmute(s, 0.25, "Ni", seed=1)
    assert (t.numbers != s.numbers).sum() == 8
    he = ms.insert_interstitials(s, "He", 3, seed=2)
    assert len(he) == len(s) + 3
    r = ms.rattle(s, stdev=0.05, seed=3)
    assert not np.allclose(r.positions, s.positions)
    assert np.abs(r.positions - s.positions).max() < 0.5
    v = ms.make_vacancy_cluster(s, 4, seed=4)
    assert len(v) == len(s) - 4
    st = ms.random_strain(s, 0.02, seed=5)
    assert not np.allclose(st.cell, s.cell)


def test_recompute_calculator(tmp_path):
    from tensoralloy_tpu.tensordb.sampler import (RecomputeCalculator,
                                                  make_phase_structure)
    s1 = make_phase_structure("Cu", "fcc", 3.6)
    s2 = make_phase_structure("Cu", "bcc", 2.9)
    s2.info["etemperature"] = 0.2
    calc = RecomputeCalculator(
        tmp_path / "recalc",
        {"vasp": {"calc": {"encut": 450, "kpar": 4}},
         "finite_temperature": True})
    tasks = calc.create_tasks([s1, s2])
    assert len(tasks) == 2
    incar = (tasks[1] / "INCAR").read_text()
    assert "ENCUT = 450" in incar
    assert "SIGMA = 0.2" in incar          # finite-T smearing follows T
    assert "KPAR = 4" in incar
    assert (tasks[0] / "POSCAR").exists()
    # idempotent without override
    assert calc.create_tasks([s1, s2]) == []


# ----------------------------------------------------------------------
# Recompute calculators (reference tensordb/calculator/*)
# ----------------------------------------------------------------------
class _TrajSampler:
    """Minimal sampler: one finished task backed by a real AIMD
    vasprun.xml fixture."""

    def __init__(self, taskdir):
        self.taskdir = taskdir

    def task_iterator(self):
        return [self.taskdir]

    def get_samples(self, task, interval=1, **kw):
        from tensoralloy_tpu.io.vasp import read_vasp_xml
        frames = read_vasp_xml(str(task / "vasprun.xml"),
                               index=slice(None))
        return frames[::max(interval, 1)]


def _make_traj_task(tmp_path):
    import shutil
    taskdir = tmp_path / "aimd_task"
    taskdir.mkdir(parents=True)
    shutil.copy("/root/reference/test_files/Be_md_vasprun.xml",
                taskdir / "vasprun.xml")
    return taskdir


def test_vasp_calculator_task_layout(tmp_path):
    """create_tasks: hash-deduped snapshots laid out as
    <N>atoms/group<G>/task<T> with POSCAR/INCAR/metadata (reference
    `calculator.py:273-341`); idempotent; status scan tolerates
    unfinished jobs."""
    from tensoralloy_tpu.tensordb import VaspCalculator
    sampler = _TrajSampler(_make_traj_task(tmp_path))
    calc = VaspCalculator(tmp_path / "root",
                          {"species": ["Be"],
                           "calc": {"interval": 4},
                           "vasp": {"calc": {"encut": 520, "kpar": 2}}})
    structures = calc.create_tasks({"aimd": sampler})
    assert len(structures) == 3          # 10 frames, every 4th
    tasks = list(calc.task_iterator())
    assert len(tasks) == 3
    n = len(structures[0])
    assert tasks[0].parts[-3] == f"{n}atoms"
    assert tasks[0].parts[-2] == "group0"
    meta = json.loads((tasks[0] / "metadata.json").read_text())
    assert meta["aid"].startswith(f"{n}.")
    incar = (tasks[0] / "INCAR").read_text()
    assert "ENCUT = 520" in incar and "KPAR = 2" in incar
    assert "LWAVE = .FALSE." in incar    # bools in VASP syntax
    assert (calc.workdir / "hash.json").exists()
    assert (calc.workdir / "accurate_dft_calc.extxyz").exists()
    # rerun: nothing new (hash dedup)
    assert len(calc.create_tasks({"aimd": sampler})) == 3
    assert len(list(calc.task_iterator())) == 3
    # update_status runs over not-yet-completed jobs without error
    calc.update_status()


def test_vasp_parameters_rules():
    """NBANDS scalar/dict/lambda rules and finite-T smearing
    (reference `setup_vasp_accurate_dft_parameters`)."""
    from tensoralloy_tpu.tensordb import VaspCalculator
    s = make_phase_structure("Cu", "fcc", 3.6).repeat((2, 2, 2))
    s.info["etemperature"] = 0.25
    calc = VaspCalculator("/tmp/_unused_vasp_params", {
        "species": ["Cu"], "finite_temperature": True,
        "vasp": {"calc": {
            "nbands": "lambda a, n, v, t: n * 4 + 8",
            "magmom": 0.6, "lsorbit": True}}})
    p = calc.vasp_parameters(s)
    assert p["nbands"] == 32 * 4 + 8
    assert p["sigma"] == pytest.approx(0.25)
    assert p["ismear"] == -1
    assert p["magmom"] == f"{32 * 3}*0.6"    # noncollinear 3N
    calc.config["vasp"]["calc"]["nbands"] = {"32": 144}
    del calc.config["vasp"]["calc"]["lsorbit"]
    p = calc.vasp_parameters(s)
    assert p["nbands"] == 144
    assert p["magmom"] == "32*0.6"


def test_aging_calculator_transmutation_and_bubble(tmp_path):
    """Aging modifications: exact transmutation counts at prob=1 and a
    helium bubble replacing a small cluster with min-distance-safe He
    positions (reference `aging.py:47-187,190-395`)."""
    from tensoralloy_tpu.tensordb import VaspAgingCalculator
    calc = VaspAgingCalculator(tmp_path / "r", {
        "species": ["Cu"],
        "aging": {"transmutation": {"Cu-Ni": {"prob": 1.0, "nmax": 3}},
                  "helium_bubble": {"target": "Cu",
                                    "max_target_size": 2,
                                    "max_bubble_size": 4,
                                    "max_ratio": 3.0}}})
    s = make_phase_structure("Cu", "fcc", 3.6).repeat((2, 2, 2))
    out = calc.may_modify_atoms(s)
    syms = np.asarray(out.symbols)
    n_he = int((syms == "He").sum())
    n_ni = int((syms == "Ni").sum())
    assert 1 <= n_he <= 4
    assert n_ni == 3
    # count conservation: hosts lost = cluster size (1..2)
    n_host = int((syms == "Cu").sum()) + n_ni
    assert len(s) - n_host in (1, 2)
    # He not on top of host atoms
    from tensoralloy_tpu.neighbor import neighbor_list
    ii, jj, _, d, _ = neighbor_list(out, 3.0)
    he = np.flatnonzero(syms == "He")
    host = syms != "He"
    for i in he:
        sel = (ii == i) & host[jj]
        if np.any(sel):
            assert d[sel].min() > 0.8
    # too-small cells are dropped
    assert calc.may_modify_atoms(make_phase_structure(
        "Cu", "fcc", 3.6)) is None


def test_neq_and_porous_calculators(tmp_path):
    from tensoralloy_tpu.tensordb import (VaspNonEquilibriumCalculator,
                                          VaspPorousCalculator)
    s = make_phase_structure("Cu", "fcc", 3.6).repeat((2, 2, 2))
    neq = VaspNonEquilibriumCalculator(
        tmp_path / "n", {"species": ["Cu"],
                         "neq": {"nmax": 3, "dmin": 1.2}})
    out = neq.may_modify_atoms(s)
    moved = np.flatnonzero(np.linalg.norm(
        out.positions - s.positions, axis=1) > 1e-9)
    assert 0 <= len(moved) <= 3
    assert len(out) == len(s)
    por = VaspPorousCalculator(
        tmp_path / "p", {"species": ["Cu"],
                         "porosity": {"porosity": 2.0}})
    out = por.may_modify_atoms(s)
    assert len(out) == len(s) // 2
    with pytest.raises(ValueError):
        VaspPorousCalculator(tmp_path / "p2",
                             {"species": ["Cu"], "porosity": {}})


def test_vasp_calculator_update_status_and_harvest(tmp_path):
    """A job dir with real OUTCAR/OSZICAR fixtures is counted as
    completed; metadata gains SU + convergence (reference
    `calculator.py:342-452`)."""
    import shutil
    from tensoralloy_tpu.tensordb import VaspCalculator
    sampler = _TrajSampler(_make_traj_task(tmp_path))
    calc = VaspCalculator(tmp_path / "root",
                          {"species": ["Be"], "calc": {"interval": 10}})
    structures = calc.create_tasks({"aimd": sampler})
    assert len(structures) == 1
    task = list(calc.task_iterator())[0]
    for name in ("INCAR", "OSZICAR", "OUTCAR"):
        shutil.copy(os.path.join(DATA, name), task / name)
    status = calc.update_status()
    assert status["total_jobs"][-1] == 1
    assert status["completed_jobs"][-1] == 1
    meta = json.loads((task / "metadata.json").read_text())
    assert "SU" in meta and meta["SU"]["ncores"] == 64
    assert "converged" in meta
    # harvest the converged job into a database
    if meta["converged"]:
        shutil.copy("/root/reference/test_files/Be_md_vasprun.xml",
                    task / "vasprun.xml")
        from tensoralloy_tpu.io.sqlite import connect
        db = connect(str(tmp_path / "harvest.db"))
        n = calc.harvest(db)
        assert n == 1 and len(db) == 1
        s = db.get(1)
        assert s.energy is not None


def test_tensordb_cli_pipeline(tmp_path):
    """The TensorDB orchestrator (reference `tools/tensordb`):
    sampling -> postprocess -> create calc -> gather over a real
    AIMD fixture, driven through the CLI entry."""
    import shutil
    from tensoralloy_tpu.tensordb.cli import TensorDB, main

    config = tmp_path / "config.toml"
    config.write_text("""
species = ["Be"]
phases = ["hcp"]
[hcp]
a = 2.29
supercell = [[2, 2, 2]]
[calc]
interval = 4
[aimd.sampling.nvt.hcp]
t0 = 300
t1 = 600
size = 1
[vasp.sampling]
encut = 400
[vasp.calc]
encut = 500
""")
    db = TensorDB(config)
    db.create_sampling_tasks()
    tasks = list(db.samplers["aimd"].task_iterator())
    assert len(tasks) == 1
    # simulate a finished AIMD job
    shutil.copy("/root/reference/test_files/Be_md_vasprun.xml",
                tasks[0] / "vasprun.xml")
    db.post_process()
    assert (tasks[0] / "trajectory.extxyz").exists()
    # high-precision recompute tasks from the sampled snapshots
    db.create_accurate_dft_tasks("calc")
    calc_tasks = list(db.calculators["calc"].task_iterator())
    assert len(calc_tasks) == 3          # 10 frames, every 4th
    assert (calc_tasks[0] / "INCAR").exists()
    # unknown calculator type errors clearly
    with pytest.raises(ValueError):
        db.create_accurate_dft_tasks("aging")
    # CLI surface: status over created-but-unfinished jobs
    assert main(["-i", str(config), "status", "calc"]) == 0
    # plot diagnostics from the post-processed trajectory
    out = db.plot(tasks[0] / "trajectory.extxyz")
    assert out.exists()
