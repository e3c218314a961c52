"""Matrix-free Laplacian vs assembled oracle (SURVEY.md §7 step 2).

The reference's own correctness gate is `mat_free --mat_comp`: compare the
sum-factorized operator against the assembled CSR operator on identical
input (examples/mat_free/main.cpp:270-289). Same pattern here, with the
scipy-assembled golden matrix from fem.assembly.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pmg_dolfinx_tpu.fem.assembly import assemble_stiffness
from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.ops.laplacian import MatFreeLaplacian


@pytest.mark.parametrize(
    "nc,P",
    [((2, 2, 2), 1), ((2, 2, 2), 2), ((2, 1, 3), 3), ((2, 2, 2), 4), ((1, 1, 1), 6)],
)
def test_matfree_vs_assembled(nc, P):
    mesh = BoxMesh(nc)
    kappa = 2.0
    op = MatFreeLaplacian(mesh, P, kappa=kappa)
    A = assemble_stiffness(mesh, P, kappa=kappa, bc=True)
    rng = np.random.default_rng(42)
    for _ in range(3):
        x = rng.standard_normal(mesh.num_dofs(P))
        y_mf = np.asarray(op(jnp.asarray(x)))
        y_ref = A @ x
        err = np.linalg.norm(y_mf - y_ref) / np.linalg.norm(y_ref)
        assert err < 1e-12, (nc, P, err)


def test_bc_rows_identity():
    mesh = BoxMesh((2, 2, 2))
    P = 3
    op = MatFreeLaplacian(mesh, P)
    marker = mesh.boundary_dof_marker(P)
    x = np.random.default_rng(1).standard_normal(mesh.num_dofs(P))
    y = np.asarray(op(jnp.asarray(x)))
    assert np.allclose(y[marker], x[marker])


@pytest.mark.parametrize("P", [1, 2, 3, 5])
def test_matfree_diagonal(P):
    mesh = BoxMesh((2, 2, 1))
    kappa = 2.0
    op = MatFreeLaplacian(mesh, P, kappa=kappa)
    A = assemble_stiffness(mesh, P, kappa=kappa, bc=True)
    assert np.allclose(np.asarray(op.diag), A.diagonal(), atol=1e-12)


def test_operator_symmetry():
    """x^T A y == y^T A x on interior dofs (A with bc is not symmetric
    across the bc/interior block, so test with bc-zeroed vectors)."""
    mesh = BoxMesh((2, 2, 2))
    P = 3
    op = MatFreeLaplacian(mesh, P)
    marker = np.asarray(mesh.boundary_dof_marker(P))
    rng = np.random.default_rng(7)
    x = rng.standard_normal(mesh.num_dofs(P)) * (~marker)
    y = rng.standard_normal(mesh.num_dofs(P)) * (~marker)
    Ax = np.asarray(op(jnp.asarray(x)))
    Ay = np.asarray(op(jnp.asarray(y)))
    assert abs(x @ Ay - y @ Ax) < 1e-10 * np.linalg.norm(Ax) * np.linalg.norm(y)
