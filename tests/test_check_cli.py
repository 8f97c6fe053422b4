"""Standalone comparator CLI (misc/eps_check.cc, misc/wcc_check.cc
analogs) — pure file I/O, no Ray."""

import subprocess
import sys


def _run(*args):
    return subprocess.run([sys.executable, "-m", "libgrape_lite_ray.check", *args],
                          capture_output=True, text=True, cwd="/root/repo")


def test_eps_check(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("0 1.000000000000000e+00\n1 infinity\n2 0.0\n")
    b.write_text("0 1.000050000000000e+00\n1 inf\n2 1e-320\n")
    assert _run("eps", str(a), str(b)).returncode == 0
    b.write_text("0 1.100000000000000e+00\n1 inf\n2 0.0\n")
    r = _run("eps", str(a), str(b))
    assert r.returncode == 1 and "vertex-0" in r.stdout


def test_eps_check_row_mismatches(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("0 1.0\n1 2.0\n")
    b.write_text("0 1.0\n")
    assert _run("eps", str(a), str(b)).returncode == 1
    b.write_text("0 1.0\n2 2.0\n")
    assert _run("eps", str(a), str(b)).returncode == 1


def test_wcc_iso(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    # same partition under different label names -> isomorphic
    a.write_text("0 5\n1 5\n2 9\n3 9\n")
    b.write_text("0 100\n1 100\n2 7\n3 7\n")
    assert _run("wcc-iso", str(a), str(b)).returncode == 0
    # different partition -> mismatch
    b.write_text("0 100\n1 7\n2 7\n3 7\n")
    assert _run("wcc-iso", str(a), str(b)).returncode == 1


def test_exact(tmp_path):
    a = tmp_path / "a.txt"
    b = tmp_path / "b.txt"
    a.write_text("0 x\n1 y\n")
    b.write_text("0 x\n1 y\n")
    assert _run("exact", str(a), str(b)).returncode == 0
    b.write_text("0 x\n1 z\n")
    assert _run("exact", str(a), str(b)).returncode == 1
