"""Assembled BCOO operator tests (reference test/test_csr.cpp pattern).

The reference's only compiled test builds the global interpolation matrix
between Q_p and Q_{p+1} spaces, interpolates a linear function and checks
norms to 1e-9 (test/test_csr.cpp:78-117). Same gates here, plus spmv
parity with the matrix-free operator.
"""

import jax.numpy as jnp
import numpy as np

from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.ops.csr import InterpolationMatrixOperator, MatrixOperator
from pmg_dolfinx_tpu.ops.interpolate import PInterpolator
from pmg_dolfinx_tpu.ops.laplacian import MatFreeLaplacian


def test_matrix_operator_matches_matfree():
    mesh = BoxMesh((3, 2, 3))
    P = 3
    mf = MatFreeLaplacian(mesh, P, kappa=2.0)
    mo = MatrixOperator(mesh, P, kappa=2.0)
    x = np.random.default_rng(0).standard_normal(mesh.num_dofs(P))
    y_mf = np.asarray(mf(jnp.asarray(x)))
    y_mo = np.asarray(mo(jnp.asarray(x)))
    assert np.allclose(y_mo, y_mf, atol=1e-11)
    assert np.allclose(np.asarray(mo.diag), np.asarray(mf.diag), atol=1e-11)


def test_interpolation_matrix_linear_exact():
    """Interpolating a linear function between degrees is exact — the
    reference's test_csr gate (|norm difference| < 1e-9)."""
    mesh = BoxMesh((3, 3, 3))
    Pc, Pf = 2, 3
    I = InterpolationMatrixOperator(mesh, Pc, Pf)
    cc = mesh.dof_coords(Pc)
    cf = mesh.dof_coords(Pf)
    lin = lambda c: 1.0 + 2 * c[:, 0] - 0.5 * c[:, 1] + 0.25 * c[:, 2]
    u_c = lin(cc)
    u_f = np.asarray(I.apply(jnp.asarray(u_c)))
    assert np.linalg.norm(u_f - lin(cf)) < 1e-9


def test_interpolation_matrix_matches_matfree_transfer():
    """Global assembled I / I^T == the matrix-free sum-factorized transfer
    (the contract validated against PETSc in
    python_tests/interpolation_matrix.py:65,78)."""
    mesh = BoxMesh((2, 3, 2))
    Pc, Pf = 1, 3
    I = InterpolationMatrixOperator(mesh, Pc, Pf)
    mf = PInterpolator(mesh, Pc, Pf)
    rng = np.random.default_rng(1)
    xc = rng.standard_normal(mesh.num_dofs(Pc))
    assert np.allclose(
        np.asarray(I.apply(jnp.asarray(xc))),
        np.asarray(mf.prolong(jnp.asarray(xc))),
        atol=1e-12,
    )
    xf = rng.standard_normal(mesh.num_dofs(Pf))
    assert np.allclose(
        np.asarray(I.transpose_apply(jnp.asarray(xf))),
        np.asarray(mf.restrict(jnp.asarray(xf))),
        atol=1e-12,
    )
