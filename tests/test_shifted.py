"""Shifted / reaction-diffusion family: ``-div(kappa grad u) + sigma u = f``.

Beyond reference parity (the reference has only the pure Poisson form):
the GLL-lumped mass shift ``A + sigma M`` is a pointwise extension of
the Kronecker operator, the closed-form diagonal, the FDM direct solve
(the per-axis generalized eigenbasis turns M into the identity, so the
shift just adds to the eigenvalue sums) and the full PMG stack.
Oracles: independently assembled ``A + sigma diag(m3)`` and scipy
spsolve.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from pmg_dolfinx_tpu.fem.assembly import assemble_rhs, assemble_stiffness
from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.models.poisson import PoissonProblem, f_rhs
from pmg_dolfinx_tpu.ops.kron import KronLaplacian, axis_stiffness_mass

SIGMA = 37.0


def _shifted_assembled(mesh, P, kappa, sigma):
    """A + sigma*diag(m3) with bc rows untouched (identity)."""
    A = assemble_stiffness(mesh, P, kappa=kappa, bc=True).tocsr()
    ms = [axis_stiffness_mass(nc_a, P, h_a)[1]
          for nc_a, h_a in zip(mesh.nc, mesh.h)]
    m3 = np.einsum("a,b,c->abc", *ms).reshape(-1)
    m3[np.asarray(mesh.boundary_dof_marker(P))] = 0.0
    return A + sigma * sp.diags(m3)


def test_shifted_kron_vs_assembled():
    mesh = BoxMesh((3, 2, 4), extent=(1.0, 2.0, 0.5))
    P, kappa = 3, 2.0
    op = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float64, sigma=SIGMA)
    A = _shifted_assembled(mesh, P, kappa, SIGMA)
    x = np.random.default_rng(0).standard_normal(mesh.num_dofs(P))
    y = np.asarray(op(jnp.asarray(x)))
    err = np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x)
    assert err < 1e-12, err
    assert np.allclose(np.asarray(op.diag), A.diagonal(), atol=1e-11)


def test_shifted_fdm_exact_direct_solve():
    from pmg_dolfinx_tpu.solvers.fdm import FastDiagonalizationSolver

    mesh = BoxMesh((4, 3, 5), extent=(1.0, 2.0, 0.7))
    P, kappa = 3, 2.0
    fdm = FastDiagonalizationSolver(mesh, P, kappa=kappa,
                                    dtype=jnp.float64, sigma=SIGMA)
    A = _shifted_assembled(mesh, P, kappa, SIGMA)
    b = np.random.default_rng(1).standard_normal(mesh.num_dofs(P))
    b[np.asarray(mesh.boundary_dof_marker(P))] = 0.0
    u = np.asarray(fdm.solve(jnp.asarray(b)))
    u_ref = spla.spsolve(A.tocsc(), b)
    assert np.linalg.norm(u - u_ref) / np.linalg.norm(u_ref) < 1e-11


@pytest.mark.parametrize("coarse", ["fdm", "cg", "direct"])
def test_shifted_pmg_end_to_end(coarse):
    """Full PMG on the shifted problem: manufactured-solution accuracy
    and monotone residual convergence (the shift only helps MG)."""
    prob = PoissonProblem(nc=(6, 6, 6), degrees=(1, 3), kappa=2.0,
                          coarse=coarse, operator="kron", sigma=SIGMA)
    u, rn = prob.solve(num_cycles=12)
    r0 = float(np.linalg.norm(np.asarray(prob.b)))
    assert rn[-1] / r0 < 1e-8, np.array(rn) / r0
    assert all(b_ < a_ for a_, b_ in zip(rn, rn[1:]))
    # Solution oracle: scipy direct solve of the assembled shifted system.
    A = _shifted_assembled(prob.mesh, 3, 2.0, SIGMA)
    u_ref = spla.spsolve(A.tocsc(), np.asarray(prob.b))
    assert np.allclose(np.asarray(u), u_ref, atol=1e-8)
    err = prob.error_l2(u)
    assert err < 2e-4, err


def test_shifted_refined_solve():
    prob = PoissonProblem(nc=(6, 6, 6), degrees=(1, 3), kappa=2.0,
                          coarse="fdm", operator="kron", sigma=SIGMA,
                          dtype=jnp.float32)
    u, rn = prob.hierarchy.solve_refined(prob.b, num_cycles=15)
    r0 = float(np.linalg.norm(np.asarray(prob.b)))
    assert rn[-1] / r0 < 1e-8, np.array(rn) / r0


def test_sigma_rejected_where_unsupported():
    with pytest.raises(ValueError, match="sigma"):
        PoissonProblem(nc=(3, 3, 3), degrees=(1, 2), operator="lattice",
                       sigma=1.0, f=f_rhs(2.0, sigma=1.0))
    with pytest.raises(ValueError, match="hmg"):
        PoissonProblem(nc=(4, 4, 4), degrees=(1, 2), operator="kron",
                       coarse="hmg", sigma=1.0)


def test_shifted_dist_and_grid_match_single():
    """The shifted family under both decompositions: 4-shard slab and
    (2,2,2) grid trajectories match the single-device shifted solve."""
    from pmg_dolfinx_tpu.parallel.dist import DistPMG
    from pmg_dolfinx_tpu.parallel.grid2d import GridPMG

    nc = (8, 4, 4)
    single = PoissonProblem(nc=nc, degrees=(1, 3), kappa=2.0,
                            coarse="fdm", operator="kron", sigma=SIGMA)
    u_s, rn_s = single.solve(num_cycles=5)
    b = assemble_rhs(single.mesh, 3, f_rhs(2.0, sigma=SIGMA))
    dist = DistPMG(single.mesh, n_devices=4, degrees=(1, 3), kappa=2.0,
                   coarse="fdm", operator="kron", sigma=SIGMA)
    u_d, rn_d = dist.solve(b, num_cycles=5)
    assert np.allclose(rn_d, rn_s, rtol=1e-9), (rn_s, rn_d)
    assert np.allclose(u_d, np.asarray(u_s), atol=1e-10)

    mesh_g = BoxMesh((4, 4, 4))
    single_g = PoissonProblem(nc=(4, 4, 4), degrees=(1, 3), kappa=2.0,
                              coarse="cg", operator="kron", sigma=SIGMA)
    u_sg, rn_sg = single_g.solve(num_cycles=5)
    b_g = assemble_rhs(mesh_g, 3, f_rhs(2.0, sigma=SIGMA))
    grid = GridPMG(mesh_g, shards=(2, 2, 2), degrees=(1, 3), kappa=2.0,
                   coarse="cg", sigma=SIGMA)
    u_g, rn_g = grid.solve(b_g, num_cycles=5)
    assert np.allclose(rn_g, rn_sg, rtol=1e-9), (rn_sg, rn_g)
    assert np.allclose(u_g, np.asarray(u_sg), atol=1e-10)


def test_shifted_dist_direct_coarse_matches_single():
    """DistPMG sigma + coarse='direct': the coarse Cholesky must factor
    the SHIFTED operator A0 + sigma*M (advisor r2 medium finding — the
    unshifted factor silently degraded the 4-shard trajectory)."""
    from pmg_dolfinx_tpu.parallel.dist import DistPMG

    nc = (8, 4, 4)
    single = PoissonProblem(nc=nc, degrees=(1, 3), kappa=2.0,
                            coarse="direct", operator="kron", sigma=SIGMA)
    u_s, rn_s = single.solve(num_cycles=6)
    b = assemble_rhs(single.mesh, 3, f_rhs(2.0, sigma=SIGMA))
    dist = DistPMG(single.mesh, n_devices=4, degrees=(1, 3), kappa=2.0,
                   coarse="direct", operator="kron", sigma=SIGMA)
    u_d, rn_d = dist.solve(b, num_cycles=6)
    assert np.allclose(rn_d, rn_s, rtol=1e-9), (rn_s, rn_d)
    assert np.allclose(u_d, np.asarray(u_s), atol=1e-10)


def test_shifted_kron_blocked_matches_kron():
    """Sigma through the blocked Pallas kernels (interpret/emulation on
    CPU): trajectories match the XLA kron shifted backend."""
    kwargs = dict(nc=(4, 4, 4), degrees=(1, 3), kappa=2.0, sigma=SIGMA,
                  dtype=jnp.float32, coarse="cg")
    ref = PoissonProblem(operator="kron", **kwargs)
    blk = PoissonProblem(operator="kron_blocked", **kwargs)
    _, rn_ref = ref.solve(num_cycles=4)
    _, rn_blk = blk.solve(num_cycles=4)
    assert np.allclose(rn_ref, rn_blk, rtol=1e-4), (rn_ref, rn_blk)
    # Interpret-mode kernel parity against the f64 assembled oracle.
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import PallasKronBlocked

    mesh = BoxMesh((3, 2, 4), extent=(1.0, 2.0, 0.5))
    op = PallasKronBlocked(mesh, 3, kappa=2.0, sigma=SIGMA, interpret=True)
    A = _shifted_assembled(mesh, 3, 2.0, SIGMA)
    x = np.random.default_rng(2).standard_normal(mesh.num_dofs(3))
    y = np.asarray(op(jnp.asarray(x, jnp.float32)))
    err = np.linalg.norm(y - A @ x) / np.linalg.norm(A @ x)
    assert err < 1e-5, err
