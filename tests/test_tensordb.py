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
