"""Cell-wise FDM Schwarz smoother (solvers/schwarz.py).

The production-size robust smoother: per-cell blocks inverted by
separable fast diagonalization (Lottes & Fischer's spectral-element
smoother), O(ndofs) memory — the scalable sibling of the line smoother
(solvers/line.py). The reference smooths with point Jacobi only
(src/chebyshev.hpp).

Pinned measured facts:
- block exactness: for the Kronecker-form operator the separable FDM
  block equals the exact cell block of the bc-applied assembled matrix
  (oracle to roundoff, incl. the sigma shift);
- isotropic p=(1,3,6): V-cycle contraction 0.12/cycle vs 0.41 Jacobi;
- rotated 100:1 tensor: the stationary divergence at smoother_iters=2
  turns contracting;
- curved hexes + variable kappa (hmg coarse): FCG 21 -> 8 iterations.
"""

import warnings

import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from pmg_dolfinx_tpu.fem.assembly import assemble_rhs, assemble_stiffness
from pmg_dolfinx_tpu.fem.mesh import BoxMesh, PerturbedBoxMesh
from pmg_dolfinx_tpu.models.poisson import (
    f_rhs,
    f_rhs_tensor,
    f_rhs_variable,
    kappa_aniso,
    kappa_linear,
)
from pmg_dolfinx_tpu.solvers.pmg import PMGHierarchy
from pmg_dolfinx_tpu.solvers.schwarz import (
    build_schwarz,
    schwarz_precond_apply,
)

DIAG = np.diag([1.0, 2.0, 64.0])


@pytest.mark.parametrize("sigma", [0.0, 11.0])
def test_schwarz_matches_exact_block_solves(sigma):
    """M(r) == symmetric multiplicity-weighted sum of EXACT per-cell
    block solves of the bc-applied assembled (shifted) matrix — the
    separable FDM form is exact for the Kronecker-form operator."""
    from pmg_dolfinx_tpu.fem.assembly import lumped_mass_np

    mesh = BoxMesh((3, 4, 5))
    P = 2
    A = assemble_stiffness(mesh, P, kappa=DIAG).tolil()
    if sigma:
        A.setdiag(A.diagonal() + sigma * lumped_mass_np(mesh, P,
                                                        bc_zero=True))
    A = A.tocsr()
    dofmap = np.asarray(mesh.dofmap(P))
    N = mesh.num_dofs(P)
    mult = np.zeros(N)
    np.add.at(mult, dofmap.ravel(), 1.0)
    w = 1.0 / np.sqrt(mult)
    rng = np.random.default_rng(3)
    r = rng.standard_normal(N)
    want = np.zeros(N)
    rw = r * w
    for c in range(dofmap.shape[0]):
        d = dofmap[c]
        want[d] += np.linalg.solve(A[np.ix_(d, d)].toarray(), rw[d])
    want *= w
    bc = np.asarray(mesh.boundary_dof_marker(P), bool)
    want[bc] = r[bc]

    sw = build_schwarz(mesh, P, DIAG, jnp.float64, sigma=sigma)
    got = np.asarray(schwarz_precond_apply(sw, jnp.asarray(r),
                                           mesh.lattice_shape(P), P))
    assert np.allclose(got, want, atol=1e-13 * np.abs(want).max())
    assert np.allclose(got[bc], r[bc])  # identity on bc dofs


def test_schwarz_beats_jacobi_isotropic():
    """Isotropic p=(1,3,6) V-cycle: Schwarz contraction ~0.12/cycle vs
    ~0.41 point Jacobi (measured rel@10 4.6e-10 vs 1.6e-4)."""
    mesh = BoxMesh((6, 6, 6))
    b = jnp.asarray(np.asarray(assemble_rhs(mesh, 6, f_rhs(2.0))))
    rels = {}
    for sm in ("cheb", "schwarz"):
        h = PMGHierarchy(mesh, degrees=(1, 3, 6), kappa=2.0,
                         dtype=jnp.float64, coarse="direct",
                         operator="lattice", smoother=sm)
        _, rn = h.solve(b, num_cycles=10)
        rn = np.asarray(rn)
        rels[sm] = rn[-1] / rn[0]
    assert rels["schwarz"] < 1e-8, rels
    assert rels["schwarz"] < rels["cheb"] * 1e-3, rels


def test_schwarz_restores_stationary_rotated_tensor():
    """The pinned rotated-100:1 stationary divergence at the default
    smoother_iters=2 turns contracting with smoother='schwarz' — like
    the line smoother, but at O(ndofs) memory (any problem size)."""
    mesh = BoxMesh((6, 6, 6))
    K = kappa_aniso()
    b = jnp.asarray(np.asarray(assemble_rhs(mesh, 6, f_rhs_tensor(K))))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        h = PMGHierarchy(mesh, degrees=(1, 3, 6), kappa=K,
                         dtype=jnp.float64, coarse="direct",
                         operator="lattice", smoother="schwarz")
        _, rn = h.solve(b, num_cycles=10)
    rn = np.asarray(rn)
    assert rn[-1] / rn[0] < 0.05, rn  # measured 3.4e-3


@pytest.mark.parametrize("operator", ["lattice", "dofmap", "kron"])
def test_schwarz_backends_match_direct(operator):
    mesh = BoxMesh((6, 6, 8))
    b = jnp.asarray(assemble_rhs(mesh, 3, f_rhs_tensor(DIAG)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        hier = PMGHierarchy(mesh, degrees=(1, 3), kappa=DIAG,
                            dtype=jnp.float64, coarse="direct",
                            operator=operator, smoother="schwarz")
        u, niter = hier.solve_pcg(b, rtol=1e-10, maxiter=60)
    A = assemble_stiffness(mesh, 3, kappa=DIAG)
    u_ref = spla.spsolve(A.tocsc(), np.asarray(b))
    assert np.allclose(np.asarray(u), u_ref,
                       atol=1e-7 * max(1.0, np.abs(u_ref).max()))


def test_schwarz_general_family_curved_variable_kappa():
    """Curved hexes + variable DG-0 kappa with schwarz at the p-levels
    AND the rediscretized h-MG levels: FCG count drops vs Jacobi
    (measured 8 vs 21) and the answer matches the assembled solve."""
    mesh = PerturbedBoxMesh((6, 6, 6))
    b = jnp.asarray(np.asarray(
        assemble_rhs(mesh, 4, f_rhs_variable(kappa_linear))))
    iters = {}
    for sm in ("cheb", "schwarz"):
        hier = PMGHierarchy(mesh, degrees=(1, 4), kappa=kappa_linear,
                            dtype=jnp.float64, coarse="hmg",
                            operator="lattice", smoother=sm,
                            coarse_cfg=dict(smoother=sm))
        u, niter = hier.solve_pcg(b, rtol=1e-10, maxiter=40)
        iters[sm] = int(niter)
    assert iters["schwarz"] <= 12, iters  # measured 8
    assert iters["schwarz"] < iters["cheb"] - 5, iters  # measured 21
    A = assemble_stiffness(mesh, 4, kappa=kappa_linear)
    u_ref = spla.spsolve(A.tocsc(), np.asarray(b))
    assert np.allclose(np.asarray(u), u_ref,
                       atol=1e-7 * max(1.0, np.abs(u_ref).max()))


def test_schwarz_sigma_shifted():
    from pmg_dolfinx_tpu.fem.assembly import lumped_mass_np

    SIGMA = 7.0
    mesh = BoxMesh((6, 6, 8))
    b = jnp.asarray(assemble_rhs(mesh, 3, f_rhs_tensor(DIAG)))
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        hier = PMGHierarchy(mesh, degrees=(1, 3), kappa=DIAG,
                            dtype=jnp.float64, coarse="direct",
                            operator="lattice", smoother="schwarz",
                            sigma=SIGMA)
        u, niter = hier.solve_pcg(b, rtol=1e-10, maxiter=60)
    A = assemble_stiffness(mesh, 3, kappa=DIAG).tolil()
    A.setdiag(A.diagonal() + SIGMA * lumped_mass_np(mesh, 3, bc_zero=True))
    u_ref = spla.spsolve(A.tocsr().tocsc(), np.asarray(b))
    assert np.allclose(np.asarray(u), u_ref,
                       atol=1e-7 * max(1.0, np.abs(u_ref).max()))


def test_schwarz_sharded_rejected():
    """Not distributed yet: fail fast with guidance, never silently fall
    back to Jacobi."""
    from pmg_dolfinx_tpu.parallel.dist import DistPMG
    from pmg_dolfinx_tpu.parallel.grid2d import GridPMG

    mesh = BoxMesh((8, 4, 4))
    with pytest.raises(ValueError, match="not distributed yet"):
        DistPMG(mesh, n_devices=4, degrees=(1, 2), kappa=2.0,
                coarse="cg", operator="lattice", dtype=jnp.float64,
                smoother="schwarz")
    with pytest.raises(ValueError, match="not distributed yet"):
        GridPMG(mesh, shards=(2, 2, 1), degrees=(1, 2), kappa=2.0,
                coarse="cg", operator="lattice", dtype=jnp.float64,
                smoother="schwarz")


def test_schwarz_fuse_smoother_rejected():
    mesh = BoxMesh((8, 8, 8))
    with pytest.raises(ValueError, match="fuse_smoother"):
        PMGHierarchy(mesh, degrees=(1, 3), kappa=2.0, dtype=jnp.float32,
                     operator="kron_blocked", fuse_smoother=True,
                     smoother="schwarz")
