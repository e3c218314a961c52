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


# ---------------------------------------------------------------------
# SINGLE-RHS lane packing (PackedKronSingle)
# ---------------------------------------------------------------------

@pytest.mark.parametrize("interpret", [False, True])
@pytest.mark.parametrize("nc,P", [((10, 10, 10), 6),   # 61^3: g=2
                                  ((5, 5, 5), 6),      # 31^3: g=4
                                  ((12, 9, 8), 5)])    # anisotropic box
def test_packed_single_matches_kron(nc, P, interpret):
    """The x-slab lane-packed single-RHS apply == the exact f64 kron
    operator at f32 accuracy (~1e-7), in both the jnp emulation and the
    interpret-mode kernel (which exercises the real kernel logic incl.
    the lane rolls and the adjacent-slab corner corrections)."""
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedKronSingle

    mesh = BoxMesh(nc)
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float64,
                       precision="highest", sigma=0.7)
    pk = PackedKronSingle(mesh, P, kappa=2.0, sigma=0.7,
                          interpret=interpret)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(mesh.num_dofs(P))
    y_ref = np.asarray(op(jnp.asarray(x)))
    y = np.asarray(pk(jnp.asarray(x, jnp.float32))).reshape(-1)
    assert np.linalg.norm(y - y_ref) < 3e-7 * np.linalg.norm(y_ref)
    # bc rows pass through
    bc = np.asarray(mesh.boundary_dof_marker(P))
    assert np.allclose(y[bc], x[bc].astype(np.float32))


def test_packed_single_families():
    """Graded spacing, per-axis kappa, mixed faces and Robin ends all
    ride the base per-axis factors; 'high' lands at bf16x3 accuracy."""
    from pmg_dolfinx_tpu.fem.mesh import geometric_spacing
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedKronSingle

    mesh = BoxMesh((12, 10, 10),
                   spacing=(None, geometric_spacing(10, 2.0), None),
                   dirichlet_faces=((True, False), (True, True),
                                    (True, True)),
                   robin=((0.0, 2.5), (0, 0), (0, 0)))
    P = 5
    op = KronLaplacian(mesh, P, kappa=(1.0, 2.0, 3.0),
                       dtype=jnp.float64, precision="highest")
    rng = np.random.default_rng(3)
    x = rng.standard_normal(mesh.num_dofs(P))
    y_ref = np.asarray(op(jnp.asarray(x)))
    for prec, tol in (("highest", 3e-7), ("high", 3e-5)):
        pk = PackedKronSingle(mesh, P, kappa=(1.0, 2.0, 3.0),
                              precision=prec)
        y = np.asarray(pk(jnp.asarray(x, jnp.float32))).reshape(-1)
        assert np.linalg.norm(y - y_ref) < tol * np.linalg.norm(y_ref), prec


def test_packed_single_validation_and_roundtrip():
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedKronSingle

    # NZ > 64 rejected
    with pytest.raises(ValueError, match="NZ <= 64"):
        PackedKronSingle(BoxMesh((11, 11, 11)), 6)
    # slab thinner than the 8-aligned band rejected (P=9 -> band 16)
    with pytest.raises(ValueError, match="XS"):
        PackedKronSingle(BoxMesh((1, 3, 3)), 9)
    # tiny NX with P <= 8 is fine now (8-aligned slabs hold the band)
    PackedKronSingle(BoxMesh((2, 4, 4)), 6)
    # pack/unpack identity
    mesh = BoxMesh((10, 9, 8))
    pk = PackedKronSingle(mesh, 6)
    rng = np.random.default_rng(1)
    x3 = rng.standard_normal(mesh.lattice_shape(6)).astype(np.float32)
    rt = np.asarray(pk.unpack(pk.pack(x3)))
    assert np.array_equal(rt, x3)


@pytest.mark.parametrize("interpret", [False, True])
@pytest.mark.parametrize("nc,P", [((10, 10, 10), 6),   # 61^3: g=2
                                  ((5, 5, 5), 6)])     # 31^3: g=4
def test_packed_fdm_single_matches_fdm(nc, P, interpret):
    """Single-RHS x-slab packed direct solve == FastDiagonalizationSolver
    at f32 accuracy, emulation and interpret-mode kernel (lane-rotated
    dense x-transform stacks included)."""
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMSingle
    from pmg_dolfinx_tpu.solvers.fdm import FastDiagonalizationSolver

    mesh = BoxMesh(nc)
    fdm = FastDiagonalizationSolver(mesh, P, kappa=2.0,
                                    dtype=jnp.float32, sigma=0.5)
    pk = PackedFDMSingle(mesh, P, kappa=2.0, sigma=0.5,
                         interpret=interpret)
    rng = np.random.default_rng(0)
    b = rng.standard_normal(mesh.num_dofs(P)).astype(np.float32)
    u_ref = np.asarray(fdm.solve(
        jnp.asarray(b).reshape(mesh.lattice_shape(P)))).reshape(-1)
    u = np.asarray(pk.solve(jnp.asarray(b))).reshape(-1)
    assert np.linalg.norm(u - u_ref) < 5e-6 * np.linalg.norm(u_ref)
    bc = np.asarray(mesh.boundary_dof_marker(P))
    assert np.allclose(u[bc], b[bc])


def test_packed_fdm_single_families_and_inverse():
    """Mixed faces + Robin + graded spacing + per-axis kappa ride the
    per-axis eigenproblems; solve(apply(x)) == x (exact inverse pair
    with PackedKronSingle at matching shift)."""
    from pmg_dolfinx_tpu.fem.mesh import geometric_spacing
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import (PackedFDMSingle,
                                                        PackedKronSingle)

    mesh = BoxMesh((12, 10, 10),
                   spacing=(None, geometric_spacing(10, 2.0), None),
                   dirichlet_faces=((True, False), (True, True),
                                    (True, True)),
                   robin=((0.0, 2.5), (0, 0), (0, 0)))
    P, kap, sig = 5, (1.0, 2.0, 3.0), 0.8
    op = PackedKronSingle(mesh, P, kappa=kap, sigma=sig)
    fdm = PackedFDMSingle(mesh, P, kappa=kap, sigma=sig)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(mesh.num_dofs(P)).astype(np.float32)
    rt = np.asarray(fdm.solve(op(jnp.asarray(x)))).reshape(-1)
    assert np.linalg.norm(rt - x) < 2e-5 * np.linalg.norm(x)


def test_packed_fdm_single_singular_rejected():
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMSingle

    mesh = BoxMesh((4, 4, 4), dirichlet_faces=((False, False),) * 3)
    with pytest.raises(ValueError, match="singular"):
        PackedFDMSingle(mesh, 3)
