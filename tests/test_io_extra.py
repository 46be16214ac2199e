"""IO round-trips: vasp xml, stepmax xyz, units, tersoff, meam/spline."""
import numpy as np
import pytest

FIX = "/root/reference/test_files"


def test_vasp_xml_finite_temperature():
    from tensoralloy_tpu.io.vasp import read_vasp_xml
    structs = read_vasp_xml(f"{FIX}/Be_md_vasprun.xml",
                            index=slice(None), finite_temperature=True)
    assert len(structs) == 10
    s = structs[0]
    assert len(s) == 128
    assert s.forces.shape == (128, 3)
    assert s.stress.shape == (6,)
    assert s.info["etemperature"] == pytest.approx(0.689386)
    assert s.info["eentropy"] > 0
    # U = F + T S
    assert s.energy == pytest.approx(
        s.info["free_energy"] +
        s.info["etemperature"] * s.info["eentropy"], abs=1e-6)


def test_vasp_xml_zero_temperature():
    from tensoralloy_tpu.io.vasp import read_vasp_xml
    s = read_vasp_xml(f"{FIX}/Be_hcp_4000K_vasprun.xml", index=-1,
                      finite_temperature=False)
    assert s.energy is not None
    assert np.isfinite(s.energy)


def test_stepmax_xyz_roundtrip(tmp_path):
    from tensoralloy_tpu.io.xyz import read_stepmax_xyz, write_stepmax_xyz
    s = read_stepmax_xyz(f"{FIX}/Pu8.stepmax.xyz")
    assert len(s) == 8
    assert s.energy == pytest.approx(-32.4 * 27.211386024367243)
    path = str(tmp_path / "out.xyz")
    write_stepmax_xyz(path, s)
    s2 = read_stepmax_xyz(path)
    np.testing.assert_allclose(s2.cell, s.cell, atol=1e-4)
    np.testing.assert_allclose(s2.positions, s.positions, atol=1e-5)


def test_unit_conversions():
    from tensoralloy_tpu.io.units import get_conversion_factor
    assert get_conversion_factor("eV") == 1.0
    assert get_conversion_factor("Hartree") == \
        pytest.approx(27.211386, abs=1e-5)
    assert get_conversion_factor("kcal/mol") == \
        pytest.approx(0.0433641, abs=1e-6)
    assert get_conversion_factor("GPa") == \
        pytest.approx(1 / 160.21766208)
    with pytest.raises(ValueError):
        get_conversion_factor("parsec")


def test_tersoff_roundtrip(tmp_path):
    from tensoralloy_tpu.io.lammps import (read_tersoff_file,
                                           write_tersoff_file)
    t = read_tersoff_file(f"{FIX}/lammps/Si.tersoff")
    assert t.elements == ["Si"]
    p = t.params["SiSiSi"]
    assert p["A"] == pytest.approx(3264.7)
    assert p["n"] == pytest.approx(0.78734) or p["n"] > 0
    path = str(tmp_path / "si.tersoff")
    write_tersoff_file(path, t)
    t2 = read_tersoff_file(path)
    for k, v in t.params["SiSiSi"].items():
        assert t2.params["SiSiSi"][k] == pytest.approx(v)


def test_meam_spline_reader():
    from tensoralloy_tpu.io.lammps import read_meam_spline_file
    import glob
    import os
    path = f"{FIX}/lammps/TiO.meam.spline"
    if not os.path.exists(path):
        candidates = glob.glob(f"{FIX}/lammps/*meam*")
        if not candidates:
            pytest.skip("no meam/spline fixture available")
        path = candidates[0]
    ms = read_meam_spline_file(path)
    assert ms.elements
    assert ms.phi and ms.rho and ms.embed
