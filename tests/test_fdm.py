"""Fast Diagonalization direct solver tests."""

import jax.numpy as jnp
import numpy as np
import scipy.sparse.linalg as spla

from pmg_dolfinx_tpu.fem.assembly import assemble_rhs, assemble_stiffness, l2_error
from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.models.poisson import f_rhs, u_exact
from pmg_dolfinx_tpu.solvers.fdm import FastDiagonalizationSolver


def test_fdm_exact_direct_solve():
    """One FDM application == the sparse direct solve (f64)."""
    mesh = BoxMesh((4, 3, 5), extent=(1.0, 2.0, 0.7))
    P, kappa = 3, 2.0
    fdm = FastDiagonalizationSolver(mesh, P, kappa=kappa, dtype=jnp.float64)
    A = assemble_stiffness(mesh, P, kappa=kappa)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(mesh.num_dofs(P))
    b[np.asarray(mesh.boundary_dof_marker(P))] = 0.0
    u = np.asarray(fdm.solve(jnp.asarray(b)))
    u_ref = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-11


def test_fdm_poisson_manufactured():
    """FDM solves the flagship problem directly; L2 error at
    discretization level in a single application."""
    mesh = BoxMesh((8, 8, 8))
    P, kappa = 3, 2.0
    fdm = FastDiagonalizationSolver(mesh, P, kappa=kappa, dtype=jnp.float64)
    b = assemble_rhs(mesh, P, f_rhs(kappa))
    u = np.asarray(fdm.solve(jnp.asarray(b)))
    assert l2_error(mesh, P, u, u_exact) < 2e-5


def test_fdm_f32_with_refinement():
    """f32 FDM + f64 refinement reaches near-machine residuals."""
    mesh = BoxMesh((6, 6, 6))
    P, kappa = 3, 2.0
    fdm = FastDiagonalizationSolver(mesh, P, kappa=kappa, dtype=jnp.float32)
    b = assemble_rhs(mesh, P, f_rhs(kappa))
    u64, rnorms = fdm.refine(b, cycles=4)
    A = assemble_stiffness(mesh, P, kappa=kappa)
    r = np.linalg.norm(A @ np.asarray(u64) - b) / np.linalg.norm(b)
    assert r < 1e-10, (rnorms, r)
