"""Lane-packed multi-RHS Kronecker kernel (ops/pallas_kron_packed.py):
interpret-mode + emulation parity against the XLA Kronecker apply, per
RHS, including sigma / mixed faces / Robin / odd batch padding."""

import jax.numpy as jnp
import numpy as np
import pytest

from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.ops.kron import KronLaplacian, kron_laplacian_apply
from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedKronBatch


def _batch_ref(mesh, P, U, kappa=2.0, sigma=0.0, robin=None):
    op = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32,
                       sigma=sigma)
    return np.stack([
        np.asarray(kron_laplacian_apply(
            jnp.asarray(u, jnp.float32), op.Ks, op.ms, op.bc_marker,
            sigma=sigma,
        ))
        for u in U
    ])


@pytest.mark.parametrize("nc,P,B", [((5, 4, 3), 4, 2), ((4, 5, 6), 3, 4),
                                    ((3, 3, 3), 8, 3)])
@pytest.mark.parametrize("interpret", [True, False])
def test_packed_matches_kron(nc, P, B, interpret):
    """interpret=True runs the Mosaic kernel through the Pallas
    interpreter; interpret=False exercises the off-TPU emulation twin
    (the same wiring the TPU path uses around the pallas_call)."""
    mesh = BoxMesh(nc)
    rng = np.random.default_rng(0)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    want = _batch_ref(mesh, P, U)
    op = PackedKronBatch(mesh, P, kappa=2.0, B=B, interpret=interpret)
    got = np.asarray(op(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-6, err
    # 4D carrier round-trip
    U4 = U.reshape((B,) + mesh.lattice_shape(P))
    assert op(jnp.asarray(U4)).shape == U4.shape


def test_packed_high_precision():
    mesh = BoxMesh((4, 4, 4))
    P, B = 3, 2
    rng = np.random.default_rng(1)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    want = _batch_ref(mesh, P, U)
    op = PackedKronBatch(mesh, P, B=B, precision="high", interpret=True)
    got = np.asarray(op(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-4, err


def test_packed_sigma_and_mixed_faces():
    mesh = BoxMesh((4, 3, 5), dirichlet_faces=((True, False),
                                               (False, False),
                                               (True, True)))
    P, B, sigma = 3, 2, 7.5
    rng = np.random.default_rng(2)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    want = _batch_ref(mesh, P, U, sigma=sigma)
    op = PackedKronBatch(mesh, P, B=B, sigma=sigma, interpret=True)
    got = np.asarray(op(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-6, err


def test_packed_robin():
    """Robin end updates ride base.Ks into the symmetrized factors."""
    mesh = BoxMesh((4, 4, 4),
                   dirichlet_faces=((True, True), (True, True),
                                    (False, False)),
                   robin=((0.0, 0.0), (0.0, 0.0), (2.0, 3.0)))
    P, B = 3, 2
    rng = np.random.default_rng(3)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    op_ref = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)
    want = np.stack([
        np.asarray(kron_laplacian_apply(jnp.asarray(u), op_ref.Ks,
                                        op_ref.ms, op_ref.bc_marker))
        for u in U
    ])
    op = PackedKronBatch(mesh, P, kappa=2.0, B=B, interpret=True)
    got = np.asarray(op(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-6, err


def test_packed_validation():
    mesh = BoxMesh((12, 12, 12))  # N = 12*6+1 = 73 > 64 at P=6
    with pytest.raises(ValueError, match="NZ <= 64"):
        PackedKronBatch(mesh, 6)
    with pytest.raises(ValueError, match="precision"):
        PackedKronBatch(BoxMesh((3, 3, 3)), 3, precision="default")


def test_packed_layout_roundtrip():
    mesh = BoxMesh((4, 5, 3))
    P, B = 2, 3
    op = PackedKronBatch(mesh, P, B=B, interpret=True)
    rng = np.random.default_rng(4)
    U = jnp.asarray(
        rng.standard_normal((B,) + mesh.lattice_shape(P)), jnp.float32
    )
    assert np.allclose(np.asarray(op.unpack(op.pack(U))), np.asarray(U))


# ---------------------------------------------------------------- FDM


def _fdm_ref(mesh, P, U, kappa=2.0, sigma=0.0):
    from pmg_dolfinx_tpu.solvers.fdm import FastDiagonalizationSolver

    fdm = FastDiagonalizationSolver(mesh, P, kappa=kappa, sigma=sigma)
    return np.stack([np.asarray(fdm.solve(jnp.asarray(u))) for u in U])


@pytest.mark.parametrize("nc,P,B", [((5, 4, 3), 4, 2), ((3, 3, 3), 8, 3)])
@pytest.mark.parametrize("interpret", [True, False])
def test_packed_fdm_matches_fdm(nc, P, B, interpret):
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMBatch

    mesh = BoxMesh(nc)
    rng = np.random.default_rng(10)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    want = _fdm_ref(mesh, P, U)
    fdm = PackedFDMBatch(mesh, P, kappa=2.0, B=B, interpret=interpret)
    got = np.asarray(fdm.solve(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5, err


def test_packed_fdm_is_exact_inverse():
    """solve() really inverts the packed kron apply: A (A^-1 b) = b."""
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMBatch

    mesh = BoxMesh((4, 5, 3))
    P, B, sigma = 3, 3, 4.2
    kappa = (2.0, 0.5, 7.0)  # per-axis diagonal tensor
    rng = np.random.default_rng(11)
    Bv = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    fdm = PackedFDMBatch(mesh, P, kappa=kappa, B=B, sigma=sigma,
                         interpret=True)
    op = PackedKronBatch(mesh, P, kappa=kappa, B=B, sigma=sigma,
                         interpret=True)
    U = fdm.solve(jnp.asarray(Bv))
    R = np.asarray(op(U)) - Bv
    rel = np.linalg.norm(R) / np.linalg.norm(Bv)
    assert rel < 1e-5, rel


def test_packed_fdm_mixed_faces_robin():
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMBatch

    mesh = BoxMesh((4, 4, 4),
                   dirichlet_faces=((True, False), (True, True),
                                    (False, False)),
                   robin=((0.0, 1.5), (0.0, 0.0), (2.0, 3.0)))
    P, B = 3, 2
    rng = np.random.default_rng(12)
    U = rng.standard_normal((B, mesh.num_dofs(P))).astype(np.float32)
    want = _fdm_ref(mesh, P, U)
    fdm = PackedFDMBatch(mesh, P, B=B, interpret=True)
    got = np.asarray(fdm.solve(jnp.asarray(U)))
    err = np.linalg.norm(got - want) / np.linalg.norm(want)
    assert err < 1e-5, err


def test_packed_fdm_singular_rejected():
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMBatch

    mesh = BoxMesh((3, 3, 3),
                   dirichlet_faces=((False, False),) * 3)
    with pytest.raises(ValueError, match="singular"):
        PackedFDMBatch(mesh, 3)
