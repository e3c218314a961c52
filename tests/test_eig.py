"""Modal analysis (`solvers/eig.py`): smallest eigenpairs of
``K u = lam M u`` via shift-invert LOBPCG on the framework's own
inverses. Ground truth: scipy.sparse shift-invert eigsh on the
assembled free-dof pencil, and the analytic unit-cube spectrum."""

import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from pmg_dolfinx_tpu.fem.assembly import assemble_stiffness, lumped_mass_np
from pmg_dolfinx_tpu.fem.mesh import BoxMesh, PerturbedBoxMesh
from pmg_dolfinx_tpu.models.poisson import kappa_linear
from pmg_dolfinx_tpu.solvers.eig import lowest_eigenpairs


def _scipy_lowest(mesh, P, kappa, k, sigma=0.0):
    bc = np.asarray(mesh.boundary_dof_marker(P))
    free = ~bc
    K = assemble_stiffness(mesh, P, kappa=kappa, bc=False).tocsr()
    m = lumped_mass_np(mesh, P)
    if sigma:
        K = K + sp.diags(sigma * m)
    Kff = K[free][:, free]
    Mff = sp.diags(m[free])
    lams, _ = spla.eigsh(Kff, k=k, M=Mff, sigma=0.0, which="LM")
    return np.sort(lams)


def test_lowest_modes_box_match_scipy_and_analytic():
    mesh = BoxMesh((6, 6, 6))
    P, kappa, k = 2, 2.0, 4
    lams, U, iters = lowest_eigenpairs(mesh, P, kappa=kappa, k=k)
    ref = _scipy_lowest(mesh, P, kappa, k)
    assert np.allclose(lams, ref, rtol=1e-8), (lams, ref)
    # Analytic continuum spectrum: kappa pi^2 (i^2+j^2+k^2) =
    # (3, 6, 6, 6) kappa pi^2 — the discrete values converge to it.
    analytic = kappa * np.pi**2 * np.array([3.0, 6.0, 6.0, 6.0])
    assert np.allclose(lams, analytic, rtol=2e-2), (lams, analytic)
    # M-orthonormality of the returned vectors.
    m = lumped_mass_np(mesh, P)
    G = np.asarray(U).T @ (m[:, None] * np.asarray(U))
    assert np.allclose(G, np.eye(k), atol=1e-8)


def test_lowest_modes_mixed_bc_and_sigma():
    """Mixed faces + lumped-mass shift: spectrum just shifts by sigma,
    and the Neumann faces change the mode set — all vs scipy."""
    faces = ((True, True), (False, False), (True, True))
    mesh = BoxMesh((5, 5, 5), dirichlet_faces=faces)
    P, kappa, k, sigma = 2, 2.0, 3, 11.0
    lams, _, _ = lowest_eigenpairs(mesh, P, kappa=kappa, k=k, sigma=sigma)
    ref = _scipy_lowest(mesh, P, kappa, k, sigma=sigma)
    assert np.allclose(lams, ref, rtol=1e-8), (lams, ref)


def test_lowest_modes_sigma_field():
    """A sigma(x) reaction FIELD routes to the general (FCG) inverse
    even on an axis-aligned constant-kappa mesh — vs scipy."""
    from pmg_dolfinx_tpu.models.poisson import sigma_linear

    mesh = BoxMesh((5, 5, 5))
    P, k = 2, 3
    lams, _, _ = lowest_eigenpairs(mesh, P, kappa=2.0, k=k,
                                   sigma=sigma_linear)
    bc = np.asarray(mesh.boundary_dof_marker(P))
    free = ~bc
    K = assemble_stiffness(mesh, P, kappa=2.0, bc=False).tocsr()
    m = lumped_mass_np(mesh, P)
    K = K + sp.diags(m * sigma_linear(mesh.dof_coords(P).T))
    ref = np.sort(spla.eigsh(K[free][:, free], k=k, M=sp.diags(m[free]),
                             sigma=0.0, which="LM")[0])
    assert np.allclose(lams, ref, rtol=1e-8), (lams, ref)


def test_lowest_modes_general_family():
    """Curved hexes + variable DG-0 kappa: the FCG(V) inverse drives
    the same LOBPCG — matches scipy shift-invert."""
    mesh = PerturbedBoxMesh((4, 4, 4))
    P, k = 2, 3
    lams, _, _ = lowest_eigenpairs(mesh, P, kappa=kappa_linear, k=k,
                                   degrees=(1, 2))
    ref = _scipy_lowest(
        mesh, P,
        # resolve the callable the same way the hierarchy does:
        kappa_linear, k)
    assert np.allclose(lams, ref, rtol=1e-6), (lams, ref)


def test_lowest_modes_graded():
    """Graded spacing: the batched-FDM inverse action diagonalizes the
    graded pencils exactly, so shift-invert LOBPCG converges to the
    scipy spectrum of the graded assembled pencil."""
    from pmg_dolfinx_tpu.fem.mesh import geometric_spacing

    mesh = BoxMesh((6, 6, 6), spacing=(geometric_spacing(6, 4.0),
                                       None, geometric_spacing(6, 2.0)))
    P, kappa, k = 2, 2.0, 3
    lams, _, _ = lowest_eigenpairs(mesh, P, kappa=kappa, k=k)
    ref = _scipy_lowest(mesh, P, kappa, k)
    assert np.allclose(lams, ref, rtol=1e-8), (lams, ref)
