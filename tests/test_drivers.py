"""End-to-end CLI driver smoke tests (subprocess, CPU, tiny sizes).

The drivers are the reference's user surface (examples/{pmg,cg,amg,
mat_free}/main.cpp); importing them (test_examples_import) does not
catch argument-wiring or convergence regressions. Each run here pins
the driver's printed numerics, not just its exit code.
"""

import json
import pathlib
import subprocess
import sys

import numpy as np
import pytest

EXAMPLES = pathlib.Path(__file__).resolve().parent.parent / "examples"


def run(script, *args, timeout=300):
    r = subprocess.run(
        [sys.executable, str(EXAMPLES / script), "--cpu", "--dtype", "f64",
         *args],
        capture_output=True, text=True, timeout=timeout,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


def test_pmg_driver_converges():
    out = run("pmg.py", "--ndofs", "30000")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["rel_residual"] < 1e-3
    assert d["l2_error"] < 1e-4


def test_pmg_driver_robin_converges():
    """--robin y: manufactured Robin surface data on both y faces, FDM
    coarse; the printed L2 error pins the whole boundary-term wiring."""
    out = run("pmg.py", "--ndofs", "8000", "--robin", "y",
              "--coarse", "fdm", "--cycles", "20")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["rel_residual"] < 1e-4
    assert d["l2_error"] < 1e-4


def test_pmg_driver_sigma_honors_explicit_operator():
    """--sigma must NOT override an explicit general backend (the
    removed auto-switch silently benchmarked the wrong kernel)."""
    out = run("pmg.py", "--ndofs", "8000", "--sigma", "10",
              "--operator", "dofmap")
    assert "switching operator" not in out
    d = json.loads(out.strip().splitlines()[-1])
    assert d["rel_residual"] < 1e-2


@pytest.mark.parametrize("extra", [
    (),  # constant kappa, box: kron h-levels
    ("--mesh", "perturbed", "--kappa-field", "linear"),  # general family
])
def test_amg_driver_hmg_preconditioner(extra):
    """The BoomerAMG-replacement scenario (examples/amg/main.cpp): p=1
    problem, h-MG-preconditioned CG must converge in O(10) iterations
    on both the box and the curved/variable-kappa family."""
    out = run("amg.py", "--ndofs", "4000", "--pc", "hmg", *extra)
    line = next(ln for ln in out.splitlines() if "CG iterations" in ln)
    iters = int(line.split("CG iterations:")[1].split(",")[0])
    assert iters <= 15, line
    true_r = float(next(ln for ln in out.splitlines()
                        if "final true |r|" in ln).split("=")[1])
    assert true_r < 1e-6


def test_mat_free_driver_oracle():
    """--mat_comp: matvec vs the assembled matrix (the reference's
    mat_free verification, examples/mat_free/main.cpp:270-289)."""
    out = run("mat_free.py", "--ndofs", "4000", "--degree", "3",
              "--reps", "5", "--mat_comp")
    rel = float(next(ln for ln in out.splitlines()
                     if "y_assembled" in ln).split("=")[1])
    assert rel < 1e-12


def test_cg_driver_runs_chebyshev_demo():
    out = run("cg.py", "--ndofs", "4000", "--max-iters", "60")
    assert "ZZZ CG" in out and "Chebyshev" in out


def test_nonlinear_transient_driver_steady_state():
    """IMEX semilinear stepping drives the manufactured source to its
    steady state; the printed L2 error pins the scanned FDM+reaction
    stepping end-to-end."""
    out = run("nonlinear.py", "--transient", "--ndofs", "8000",
              "--steps", "120", "--dt", "5e-3")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["l2_error"] < 1e-3


def test_heat_driver_sharded_decay():
    """--shards 2,2,1: the scanned time loop runs as one shard_map
    program with a distributed FDM solve per step; printed L2 error
    pins the grid-layout stepping end-to-end."""
    out = run("heat.py", "--ndofs", "8000", "--steps", "10",
              "--dt", "1e-3", "--shards", "2,2,1")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["l2_error"] < 1e-3


def test_convdiff_transient_driver_steady_state():
    """IMEX transient convdiff driver: 150 CNAB steps drive the
    manufactured source to its steady state; the printed L2 error pins
    the scanned FDM+advection stepping end-to-end."""
    out = run("convdiff.py", "--transient", "--ndofs", "8000",
              "--steps", "150")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["l2_error"] < 1e-3


def test_convdiff_transient_driver_sigma_and_stabilize():
    """--transient honors --sigma (reaction folded into the implicit
    shift; the manufactured steady state now matches the shifted
    equation) and --stabilize (kappa_eff rides the FDM step solver) —
    the two flags ADVICE r3 found silently dropped."""
    out = run("convdiff.py", "--transient", "--ndofs", "8000",
              "--steps", "200", "--sigma", "4")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["l2_error"] < 1e-3
    out = run("convdiff.py", "--transient", "--ndofs", "8000",
              "--steps", "100", "--stabilize", "cell",
              "--velocity", "30,0,0")
    assert "SD stabilization (cell)" in out
    d = json.loads(out.strip().splitlines()[-1])
    assert np.isfinite(d["l2_error"])


def test_unstructured_driver_demo():
    """External-mesh driver, L-shape demo: manufactured L2 error and
    FCG iteration count pinned (the DOLFINx-ingestion parity surface)."""
    out = run("unstructured.py", "--demo-n", "3")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["niter"] <= 10
    assert d["l2_error"] < 1e-4


def test_wave_driver_ricker_pulse_radiates():
    """--pulse: the Ricker-driven run must radiate a NONZERO field (a
    closure bug once zeroed every source scale after the warmup call —
    this pins the whole f_time plumbing end-to-end)."""
    out = run("wave.py", "--ndofs", "8000", "--pulse", "2.5",
              "--dt", "2e-3", "--steps", "60")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["max_abs_u"] > 1e-8, d
    assert np.isfinite(d["energy_T"]) and d["energy_T"] > 0, d


def test_heat_driver_decay():
    """Transient heat driver: 10 CN steps on the separable decay mode;
    the printed L2 error pins the scanned FDM stepping end-to-end."""
    out = run("heat.py", "--ndofs", "8000", "--steps", "10",
              "--dt", "1e-3", "--grade", "z:4")
    d = json.loads(out.strip().splitlines()[-1])
    assert d["l2_error"] < 1e-3
