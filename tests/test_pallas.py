"""Pallas kernel tests (interpret mode on CPU; the compiled kernels are
exercised on real TPU hardware by bench.py / examples/mat_free.py).

Both fused kernels must reproduce the XLA Kronecker apply: the
whole-lattice-in-VMEM kernel (ops/pallas_kron.py) and the blocked
two-kernel large-N variant (ops/pallas_kron_blocked.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from pmg_dolfinx_tpu.fem.mesh import BoxMesh
from pmg_dolfinx_tpu.ops.kron import KronLaplacian, kron_laplacian_apply


def _ref(mesh, P, x):
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)
    return op, kron_laplacian_apply(x, op.Ks, op.ms, op.bc_marker)


@pytest.mark.parametrize("nc,P", [((5, 4, 3), 4), ((4, 5, 6), 3),
                                  ((3, 3, 3), 8)])
def test_pallas_blocked_matches_kron(nc, P):
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import PallasKronBlocked

    mesh = BoxMesh(nc)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    op, y_ref = _ref(mesh, P, x)
    blk = PallasKronBlocked(mesh, P, kappa=2.0, interpret=True)
    err = float(jnp.linalg.norm(blk(x) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-6, err
    # 3D carrier round-trip
    x3 = x.reshape(mesh.lattice_shape(P))
    assert blk(x3).shape == x3.shape
    # diagonal matches the closed-form Kronecker diagonal
    assert np.allclose(np.asarray(blk.diag), np.asarray(op.diag))


def test_pallas_blocked_high_precision_matches():
    """bf16x3 ('high') kernels: same math, looser rounding (~1e-5)."""
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import PallasKronBlocked

    mesh = BoxMesh((5, 4, 3))
    P = 4
    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    _, y_ref = _ref(mesh, P, x)
    blk = PallasKronBlocked(mesh, P, kappa=2.0, interpret=True,
                            precision="high")
    err = float(jnp.linalg.norm(blk(x) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-4, err

    with pytest.raises(ValueError, match="precision"):
        PallasKronBlocked(mesh, P, interpret=True, precision="default")(x)


def test_fused_chebyshev_matches_generic():
    """The fused blocked Chebyshev-4 kernel reproduces the generic
    recurrence (`solvers.chebyshev.chebyshev4_solve`) exactly."""
    from pmg_dolfinx_tpu.ops.kron import kron_laplacian_apply
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        blocked_kron_cheb4,
        symmetrized_mats,
    )
    from pmg_dolfinx_tpu.solvers.chebyshev import chebyshev4_solve

    mesh = BoxMesh((5, 4, 3))
    P = 4
    shape = mesh.lattice_shape(P)
    rng = np.random.default_rng(3)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    x0 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)
    bc3 = op.bc_marker.reshape(shape)
    dinv3 = op.diag_inv.reshape(shape)
    lmax = jnp.asarray(3.1, jnp.float32)
    A = lambda v: kron_laplacian_apply(v, op.Ks, op.ms, bc3)
    x_ref = chebyshev4_solve(A, b, x0, dinv3, lmax, 2)
    mats = symmetrized_mats(op.Ks, op.ms)
    for prec, tol in (("highest", 1e-6), ("high", 1e-4)):
        x_fused = blocked_kron_cheb4(b, x0, bc3, mats, dinv3, lmax, 2,
                                     precision=prec, interpret=True)
        err = float(jnp.linalg.norm(x_fused - x_ref)
                    / jnp.linalg.norm(x_ref))
        assert err < tol, (prec, err)


def test_grid_edge_kernel_matches_emulation():
    """The grid kernel-2 variant (`_kernel_t23_grid`, interpret mode)
    reproduces the jnp twin exactly — including the neighbour-correction
    inputs folded into the accumulator's boundary planes — and the XLA
    `_edge_partials` match slices of the full contractions. Composed with
    the shard_map'd emulation trajectory tests (tests/test_grid2d.py)
    this covers the full real-kernel grid path: kernel == twin here,
    twin == single-device there."""
    from pmg_dolfinx_tpu.ops.kron import axis_stiffness_mass
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        _build_calls,
        _build_t23_grid_call,
        _edge_partials,
        _emu_t1,
        _emu_t23_grid,
        grid_symmetrized_mats,
    )

    mesh = BoxMesh((3, 4, 2))
    P = 3
    shape = mesh.lattice_shape(P)
    rng = np.random.default_rng(5)
    x3 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    bc3 = jnp.asarray(
        np.asarray(BoxMesh((3, 4, 2)).boundary_dof_marker(P)).reshape(shape)
    )
    Ks, ms = [], []
    for nc_a, h_a in zip(mesh.nc, mesh.h):
        K, m = axis_stiffness_mass(nc_a, P, h_a)
        Ks.append(2.0 * K)
        ms.append(m)
    mats, _ = grid_symmetrized_mats(Ks, ms, (1, 1, 1))

    # _edge_partials == boundary rows/cols of the full contractions.
    import jax

    HI = jax.lax.Precision.HIGHEST
    w = jnp.where(bc3, 0.0, x3) * mats["s23"][None]
    t2_full = jnp.einsum("by,xyz->xbz", mats["Kty"], w, precision=HI)
    t3_full = jnp.einsum("xyz,zc->xyc", w, mats["KtzT"], precision=HI)
    t2b, t3b = _edge_partials(x3, bc3, mats, True, True)
    assert np.allclose(t2b[:, 0, :], t2_full[:, 0, :], atol=1e-6)
    assert np.allclose(t2b[:, 1, :], t2_full[:, -1, :], atol=1e-6)
    assert np.allclose(t3b[:, :, 0], t3_full[:, :, 0], atol=1e-6)
    assert np.allclose(t3b[:, :, 1], t3_full[:, :, -1], atol=1e-6)

    # Random neighbour corrections: kernel == twin.
    cy = jnp.asarray(rng.standard_normal((shape[0], 2, shape[2])),
                     jnp.float32)
    cz = jnp.asarray(rng.standard_normal((shape[0], shape[1], 2)),
                     jnp.float32)
    r3 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    for sigma in (0.0, 37.0):
        t1c, _ = _build_calls(shape, 8, 8, False, True, (), sigma)
        t1 = t1c(x3, bc3, mats["Ktx"], mats["sxz"])
        y_ref = _emu_t23_grid(x3, bc3, t1, mats, sigma, cy, cz)
        for high, tol in ((False, 1e-6), (True, 1e-4)):
            t23g = _build_t23_grid_call(shape, 8, high, True, (), sigma,
                                        True, True)
            y = t23g(x3, bc3, t1, mats["Kty"], mats["KtzT"],
                     mats["sx2d"], mats["sycol"], mats["s23"], cy, cz)
            err = float(jnp.linalg.norm(y - y_ref)
                        / (1e-30 + jnp.linalg.norm(y_ref)))
            assert err < tol, (sigma, high, err)
            # Residual variant: fused ro = r - A u with the same
            # corrections.
            t23r = _build_t23_grid_call(shape, 8, high, True, (), sigma,
                                        True, True, residual=True)
            ro = t23r(x3, bc3, t1, mats["Kty"], mats["KtzT"],
                      mats["sx2d"], mats["sycol"], mats["s23"], cy, cz,
                      r3)
            err = float(jnp.linalg.norm(ro - (r3 - y_ref))
                        / (1e-30 + jnp.linalg.norm(r3 - y_ref)))
            assert err < tol, ("residual", sigma, high, err)


def test_blocked_transfer_matches_lattice_transfers():
    """Mosaic transfer kernels (interpret mode) == the XLA per-axis
    einsum transfers, both directions; and a V-cycle built with
    fuse_transfers=True tracks the default trajectories. (Measured
    performance parity on v5e — kept opt-in; see ops/pallas_transfer.py.)"""
    from pmg_dolfinx_tpu.fem.assembly import assemble_rhs
    from pmg_dolfinx_tpu.models.poisson import PoissonProblem, f_rhs
    from pmg_dolfinx_tpu.ops.lattice import (
        axis_interpolation_matrix,
        lattice_prolongate,
        lattice_restrict,
    )
    from pmg_dolfinx_tpu.ops.pallas_transfer import (
        blocked_transfer,
        transfer_mats,
    )
    from pmg_dolfinx_tpu.solvers.pmg import PMGHierarchy

    mesh = BoxMesh((4, 3, 5))
    Pc, Pf = 1, 3
    shape_f = mesh.lattice_shape(Pf)
    shape_c = mesh.lattice_shape(Pc)
    I1s = tuple(
        jnp.asarray(axis_interpolation_matrix(nc_a, Pc, Pf), jnp.float32)
        for nc_a in mesh.nc
    )
    rng = np.random.default_rng(8)
    r3 = jnp.asarray(rng.standard_normal(shape_f), jnp.float32)
    rc_ref = lattice_restrict(r3, I1s, shape_f, "highest")
    rc = blocked_transfer(r3, *transfer_mats(I1s, "restrict"),
                          interpret=True)
    assert float(jnp.linalg.norm(rc - rc_ref)
                 / jnp.linalg.norm(rc_ref)) < 1e-6
    pf_ref = lattice_prolongate(rc_ref, I1s, shape_c, "highest")
    pf = blocked_transfer(rc_ref, *transfer_mats(I1s, "prolong"),
                          interpret=True)
    assert float(jnp.linalg.norm(pf - pf_ref)
                 / jnp.linalg.norm(pf_ref)) < 1e-6

    with pytest.raises(ValueError, match="direction"):
        transfer_mats(I1s, "sideways")

    mesh2 = BoxMesh((4, 4, 4))
    kwargs = dict(degrees=(1, 3), kappa=2.0, dtype=jnp.float32,
                  coarse="cg", operator="kron_blocked")
    ref = PMGHierarchy(mesh2, **kwargs)
    fused = PMGHierarchy(mesh2, fuse_transfers=True, **kwargs)
    b = assemble_rhs(mesh2, 3, f_rhs(2.0))
    _, rn_ref = ref.solve(b, num_cycles=4)
    _, rn_fused = fused.solve(b, num_cycles=4)
    assert np.allclose(rn_ref, rn_fused, rtol=1e-4), (rn_ref, rn_fused)


def test_fused_residual_matches_generic():
    """The fused down-sweep residual kernel (`blocked_kron_residual`)
    reproduces ``b - A u`` of the XLA Kronecker apply (interpret mode;
    advisor r2 finding: this kernel previously had no test)."""
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        blocked_kron_residual,
        symmetrized_mats,
    )

    mesh = BoxMesh((5, 4, 3))
    P = 4
    shape = mesh.lattice_shape(P)
    rng = np.random.default_rng(4)
    b = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    u = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)
    bc3 = op.bc_marker.reshape(shape)
    r_ref = b - kron_laplacian_apply(u, op.Ks, op.ms, bc3)
    mats = symmetrized_mats(op.Ks, op.ms)
    for prec, tol in (("highest", 1e-6), ("high", 1e-4)):
        r = blocked_kron_residual(b, u, bc3, mats, precision=prec,
                                  interpret=True)
        err = float(jnp.linalg.norm(r - r_ref) / jnp.linalg.norm(r_ref))
        assert err < tol, (prec, err)


def test_fuse_smoother_hierarchy_matches_unfused():
    """PMGHierarchy(fuse_smoother=True) — the fused Chebyshev/residual
    cycle ops — tracks the unfused kron_blocked trajectories."""
    from pmg_dolfinx_tpu.fem.assembly import assemble_rhs
    from pmg_dolfinx_tpu.models.poisson import PoissonProblem, f_rhs
    from pmg_dolfinx_tpu.solvers.pmg import PMGHierarchy

    mesh = BoxMesh((4, 4, 4))
    kwargs = dict(degrees=(1, 3), kappa=2.0, dtype=jnp.float32,
                  coarse="cg", operator="kron_blocked")
    ref = PMGHierarchy(mesh, **kwargs)
    fused = PMGHierarchy(mesh, fuse_smoother=True, **kwargs)
    b = assemble_rhs(mesh, 3, f_rhs(2.0))
    _, rn_ref = ref.solve(b, num_cycles=4)
    _, rn_fused = fused.solve(b, num_cycles=4)
    assert np.allclose(rn_ref, rn_fused, rtol=1e-4), (rn_ref, rn_fused)

    with pytest.raises(ValueError, match="fuse_smoother"):
        PMGHierarchy(mesh, degrees=(1, 2), operator="kron",
                     fuse_smoother=True)


def test_kron_blocked_hierarchy_matches_kron():
    """operator='kron_blocked' V-cycles track the XLA kron backend."""
    from pmg_dolfinx_tpu.models.poisson import PoissonProblem

    kwargs = dict(nc=(4, 4, 4), degrees=(1, 3), kappa=2.0,
                  dtype=jnp.float32, coarse="cg")
    ref = PoissonProblem(operator="kron", **kwargs)
    blk = PoissonProblem(operator="kron_blocked", **kwargs)
    _, rn_ref = ref.solve(num_cycles=4)
    _, rn_blk = blk.solve(num_cycles=4)
    assert np.allclose(rn_ref, rn_blk, rtol=1e-4), (rn_ref, rn_blk)

    import jax

    with pytest.raises(ValueError, match="f32-only"):
        PoissonProblem(operator="kron_blocked", nc=(3, 3, 3),
                       degrees=(1, 2), dtype=jax.numpy.float64)


def test_pallas_lattice_blocked_matches_oracle():
    """Fused general-hex lattice kernel == XLA lattice path on a
    perturbed (non-affine) mesh, constant and per-cell DG-0 kappa."""
    from pmg_dolfinx_tpu.fem.assembly import resolve_kappa
    from pmg_dolfinx_tpu.fem.mesh import PerturbedBoxMesh
    from pmg_dolfinx_tpu.models.poisson import kappa_linear
    from pmg_dolfinx_tpu.ops.laplacian import MatFreeLaplacian
    from pmg_dolfinx_tpu.ops.lattice import LatticeLaplacian
    from pmg_dolfinx_tpu.ops.pallas_lattice_blocked import (
        PallasLatticeBlocked,
    )

    mesh = PerturbedBoxMesh((4, 3, 5))
    P = 3
    rng = np.random.default_rng(7)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    y_ref = LatticeLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)(x)
    for variant in ("yexp", "v1", "ym"):
        for bcells in (1, 2):
            blk = PallasLatticeBlocked(mesh, P, kappa=2.0, bcells=bcells,
                                       interpret=True, variant=variant)
            err = float(jnp.linalg.norm(blk(x) - y_ref)
                        / jnp.linalg.norm(y_ref))
            assert err < 1e-5, (variant, bcells, err)
    # 'ym' shared-split precisions: manual 6-pass == ~f32, 3-pass ~1e-5
    ym_hi = PallasLatticeBlocked(mesh, P, kappa=2.0, interpret=True,
                                 variant="ym", precision="high")
    err = float(jnp.linalg.norm(ym_hi(x) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 5e-5, err
    # emulation path (what non-TPU backends run by default)
    blk_e = PallasLatticeBlocked(mesh, P, kappa=2.0)
    err = float(jnp.linalg.norm(blk_e(x) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-5, err
    # variable DG-0 kappa vs the dofmap oracle, including the diagonal
    kc, _ = resolve_kappa(mesh, kappa_linear)
    mf = MatFreeLaplacian(mesh, P, kappa=kc, dtype=jnp.float32)
    blk_v = PallasLatticeBlocked(mesh, P, kappa=kappa_linear,
                                 interpret=True)
    err = float(jnp.linalg.norm(blk_v(x) - mf(x)) / jnp.linalg.norm(mf(x)))
    assert err < 1e-4, err
    assert np.allclose(np.asarray(blk_v.diag), np.asarray(mf.diag),
                       rtol=1e-5)


def test_pallas_lattice_geom_matches_oracle():
    """In-kernel-geometry variant ('geom'): the coefficient-grid
    reconstruction equals the f64 geometry factors exactly, and the
    interpret-mode kernel / emulation path match the XLA lattice oracle
    on a perturbed mesh with variable kappa."""
    from pmg_dolfinx_tpu.fem.assembly import resolve_kappa
    from pmg_dolfinx_tpu.fem.geometry import (
        geometry_factors,
        quadrature_weights_3d,
        tabulate_geometry_dphi,
    )
    from pmg_dolfinx_tpu.fem.mesh import PerturbedBoxMesh
    from pmg_dolfinx_tpu.models.poisson import kappa_linear
    from pmg_dolfinx_tpu.ops.lattice import geometry_to_qlattice
    from pmg_dolfinx_tpu.ops.pallas_lattice_blocked import (
        PallasLatticeBlocked,
        geom_to_G,
        lattice_geom_coefficients,
    )

    mesh = PerturbedBoxMesh((4, 3, 5))
    P = 3
    kc, _ = resolve_kappa(mesh, kappa_linear)
    # Host twin: bilinear-coefficient reconstruction == geometry_factors.
    G_cells, _ = geometry_factors(
        mesh.geometry_x, mesh.geometry_dofmap,
        tabulate_geometry_dphi(P), quadrature_weights_3d(P), xp=np,
    )
    Gq = geometry_to_qlattice(G_cells * kc[:, None, None], mesh.nc, P)
    co = lattice_geom_coefficients(mesh, P, kc)
    err = np.max(np.abs(geom_to_G(co, mesh.nc, P) - Gq)) / np.max(np.abs(Gq))
    assert err < 1e-12, err

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    from pmg_dolfinx_tpu.ops.laplacian import MatFreeLaplacian

    y_ref = MatFreeLaplacian(mesh, P, kappa=kc, dtype=jnp.float32)(x)
    nrm = float(jnp.linalg.norm(y_ref))
    for bcells in (1, 2):
        blk = PallasLatticeBlocked(mesh, P, kappa=kappa_linear,
                                   bcells=bcells, interpret=True,
                                   variant="geom")
        rel = float(jnp.linalg.norm(blk(x) - y_ref)) / nrm
        assert rel < 1e-5, (bcells, rel)
    # emulation path (non-TPU backends, interpret=False)
    blk_e = PallasLatticeBlocked(mesh, P, kappa=kappa_linear,
                                 variant="geom")
    rel = float(jnp.linalg.norm(blk_e(x) - y_ref)) / nrm
    assert rel < 1e-5, rel


def test_pallas_lattice_zgrp_matches_oracle():
    """z-grouped variant ('zgrp'): grouped-block z contractions match the
    XLA lattice path on a perturbed mesh (interpret mode + emulation),
    and the group-size selector's cost model behaves."""
    from pmg_dolfinx_tpu.fem.assembly import resolve_kappa
    from pmg_dolfinx_tpu.fem.mesh import PerturbedBoxMesh
    from pmg_dolfinx_tpu.models.poisson import kappa_linear
    from pmg_dolfinx_tpu.ops.laplacian import MatFreeLaplacian
    from pmg_dolfinx_tpu.ops.lattice import LatticeLaplacian
    from pmg_dolfinx_tpu.ops.pallas_lattice_blocked import (
        PallasLatticeBlocked,
        select_zgroup,
    )

    mesh = PerturbedBoxMesh((3, 2, 6))
    P = 3
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    y_ref = LatticeLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32)(x)
    nrm = float(jnp.linalg.norm(y_ref))
    for zb, bcells in ((2, 1), (3, 1), (2, 2)):
        blk = PallasLatticeBlocked(mesh, P, kappa=2.0, bcells=bcells,
                                   interpret=True, variant="zgrp", zb=zb)
        err = float(jnp.linalg.norm(blk(x) - y_ref)) / nrm
        assert err < 1e-5, (zb, bcells, err)
    # 'high' (bf16x3) keeps ~1e-3-grade accuracy through the group fold
    blk_h = PallasLatticeBlocked(mesh, P, kappa=2.0, interpret=True,
                                 variant="zgrp", zb=2, precision="high")
    err = float(jnp.linalg.norm(blk_h(x) - y_ref)) / nrm
    assert err < 5e-3, err
    # variable DG-0 kappa vs the dofmap oracle + emulation path
    kc, _ = resolve_kappa(mesh, kappa_linear)
    y_mf = MatFreeLaplacian(mesh, P, kappa=kc, dtype=jnp.float32)(x)
    blk_v = PallasLatticeBlocked(mesh, P, kappa=kappa_linear,
                                 interpret=True, variant="zgrp", zb=3)
    err = float(jnp.linalg.norm(blk_v(x) - y_mf)
                / jnp.linalg.norm(y_mf))
    assert err < 1e-4, err
    blk_e = PallasLatticeBlocked(mesh, P, kappa=kappa_linear,
                                 variant="zgrp", zb=3)
    err = float(jnp.linalg.norm(blk_e(x) - y_mf)
                / jnp.linalg.norm(y_mf))
    assert err < 1e-4, err

    # Selector: at 16.2M-scale (ncz=42, p=6) grouping halves the padded
    # MXU cost -> picks zb=14; tiny/prime ncz -> None (dense wins).
    assert select_zgroup(42, 6) == 14
    assert select_zgroup(3, 6) is None
    assert select_zgroup(41, 6) is None  # prime: no usable divisor
    with pytest.raises(ValueError, match="divide"):
        PallasLatticeBlocked(mesh, P, interpret=True, variant="zgrp",
                             zb=4)(x)
    with pytest.raises(ValueError, match="z-group"):
        PallasLatticeBlocked(PerturbedBoxMesh((3, 2, 3)), P,
                             interpret=True, variant="zgrp")


def test_lattice_blocked_hierarchy_matches_lattice():
    """operator='lattice_blocked' V-cycles track the XLA lattice backend
    on a perturbed mesh with variable kappa."""
    from pmg_dolfinx_tpu.fem.assembly import assemble_rhs
    from pmg_dolfinx_tpu.fem.mesh import PerturbedBoxMesh
    from pmg_dolfinx_tpu.models.poisson import f_rhs_variable, kappa_linear
    from pmg_dolfinx_tpu.solvers.pmg import PMGHierarchy

    mesh = PerturbedBoxMesh((3, 3, 3))
    b = assemble_rhs(mesh, 3, f_rhs_variable())
    kwargs = dict(degrees=(1, 3), kappa=kappa_linear, dtype=jnp.float32,
                  coarse="cg")
    ref = PMGHierarchy(mesh, operator="lattice", **kwargs)
    blk = PMGHierarchy(mesh, operator="lattice_blocked", **kwargs)
    _, rn_ref = ref.solve(b, num_cycles=4)
    _, rn_blk = blk.solve(b, num_cycles=4)
    assert np.allclose(rn_ref, rn_blk, rtol=1e-4), (rn_ref, rn_blk)


def test_pallas_whole_lattice_matches_kron():
    from pmg_dolfinx_tpu.ops.pallas_kron import PallasKronLaplacian

    mesh = BoxMesh((4, 4, 4))
    P = 3
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.standard_normal(mesh.num_dofs(P)), jnp.float32)
    op, y_ref = _ref(mesh, P, x)
    pk = PallasKronLaplacian(mesh, P, kappa=2.0, interpret=True)
    err = float(jnp.linalg.norm(pk(x) - y_ref) / jnp.linalg.norm(y_ref))
    assert err < 1e-6, err


def test_kron_blocked_refined_solve():
    """Single-device refinement over the blocked working cycle."""
    from pmg_dolfinx_tpu.models.poisson import PoissonProblem

    prob = PoissonProblem(nc=(4, 4, 4), degrees=(1, 3), kappa=2.0,
                          dtype=jnp.float32, coarse="cg",
                          operator="kron_blocked")
    u, rn = prob.hierarchy.solve_refined(prob.b, num_cycles=12)
    r0 = float(np.linalg.norm(np.asarray(prob.b)))
    assert rn[-1] / r0 < 1e-6, np.array(rn) / r0


def test_separable_mask_kernels_match_bc_kernels():
    """The separable-bc blocked kernels (no full-lattice bc operand —
    `symmetrized_mats(face_masks=)`) are BIT-IDENTICAL to the bc-array
    kernels, incl. mixed Dirichlet/Neumann faces, sigma, and the fused
    residual; `checked_face_masks` refuses non-separable markers."""
    import numpy as np

    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.kron import KronLaplacian
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        blocked_kron_apply, blocked_kron_residual, checked_face_masks,
        symmetrized_mats)

    mesh = BoxMesh((4, 3, 5), dirichlet_faces=((True, False),
                                               (True, True),
                                               (False, True)))
    P, sigma = 3, 2.5
    base = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32,
                         sigma=sigma)
    bc3 = base.bc_marker.reshape(mesh.lattice_shape(P))
    fm = checked_face_masks(mesh, P, base.bc_marker)
    assert fm is not None
    plain = symmetrized_mats(base.Ks, base.ms)
    masked = symmetrized_mats(base.Ks, base.ms, face_masks=fm)
    rng = np.random.default_rng(3)
    x3 = jnp.asarray(rng.standard_normal(mesh.lattice_shape(P)),
                     jnp.float32)
    b3 = jnp.asarray(rng.standard_normal(mesh.lattice_shape(P)),
                     jnp.float32)
    y_bc = blocked_kron_apply(x3, bc3, plain, interpret=True, sigma=sigma)
    y_m = blocked_kron_apply(x3, bc3, masked, interpret=True, sigma=sigma)
    assert np.array_equal(np.asarray(y_bc), np.asarray(y_m))
    r_bc = blocked_kron_residual(b3, x3, bc3, plain, interpret=True,
                                 sigma=sigma)
    r_m = blocked_kron_residual(b3, x3, bc3, masked, interpret=True,
                                sigma=sigma)
    assert np.array_equal(np.asarray(r_bc), np.asarray(r_m))

    # a non-separable marker (one interior dof flagged) is refused
    bad = np.asarray(base.bc_marker).copy()
    bad[bad.size // 2] = True
    assert checked_face_masks(mesh, P, bad) is None


def test_separable_mask_grid_kernel_matches_emulation():
    """The separable-mask GRID kernel-2 (`_kernel_t23_grid_m`) is
    bit-identical to the bc-array emulation twin, including the
    neighbour-correction inputs and the fused-residual variant."""
    from pmg_dolfinx_tpu.ops.kron import axis_stiffness_mass
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        _build_calls_m, _build_t23_grid_call_m, _emu_t1, _emu_t23_grid,
        axis_interior_masks, grid_symmetrized_mats)

    mesh = BoxMesh((3, 4, 2), dirichlet_faces=((True, False),
                                               (True, True),
                                               (False, True)))
    P = 3
    shape = mesh.lattice_shape(P)
    rng = np.random.default_rng(9)
    x3 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    bc3 = jnp.asarray(
        np.asarray(mesh.boundary_dof_marker(P)).reshape(shape))
    Ks, ms = [], []
    for nc_a, h_a in zip(mesh.nc, mesh.h):
        K, m = axis_stiffness_mass(nc_a, P, h_a)
        Ks.append(2.0 * K)
        ms.append(m)
    fm = axis_interior_masks(mesh, P)
    mats, _ = grid_symmetrized_mats(Ks, ms, (1, 1, 1),
                                    face_masks_dup=tuple(fm))

    cy = jnp.asarray(rng.standard_normal((shape[0], 2, shape[2])),
                     jnp.float32)
    cz = jnp.asarray(rng.standard_normal((shape[0], shape[1], 2)),
                     jnp.float32)
    r3 = jnp.asarray(rng.standard_normal(shape), jnp.float32)
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import (
        _build_t23_grid_call)

    for sigma in (0.0, 11.0):
        # t1: masked kernel ~= emu twin (different dot orders -> fp tol)
        t1c, _ = _build_calls_m(shape, 8, 8, False, True, (), sigma)
        t1 = t1c(x3, mats["myb"], mats["Ktx"], mats["sxzm"])
        t1_ref = _emu_t1(x3, bc3, mats)
        rel = (np.linalg.norm(np.asarray(t1) - np.asarray(t1_ref))
               / np.linalg.norm(np.asarray(t1_ref)))
        assert rel < 1e-6, rel
        # t23: masked kernel ~= emu (tol), and BIT-IDENTICAL to the
        # bc-array kernel (same dot implementation)
        y_ref = _emu_t23_grid(x3, bc3, jnp.asarray(t1_ref), mats, sigma,
                              cy, cz)
        t23m = _build_t23_grid_call_m(shape, 8, False, True, (), sigma,
                                      True, True)
        y = t23m(x3, mats["mx2"], jnp.asarray(t1_ref), mats["Kty"],
                 mats["KtzT"], mats["sx2d"], mats["sycol"],
                 mats["s23m"], mats["myb"], mats["mzrow"], cy, cz)
        rel = (np.linalg.norm(np.asarray(y) - np.asarray(y_ref))
               / np.linalg.norm(np.asarray(y_ref)))
        assert rel < 1e-6, (sigma, rel)
        t23g = _build_t23_grid_call(shape, 8, False, True, (), sigma,
                                    True, True)
        y_bc = t23g(x3, bc3, jnp.asarray(t1_ref), mats["Kty"],
                    mats["KtzT"], mats["sx2d"], mats["sycol"],
                    mats["s23"], cy, cz)
        assert np.array_equal(np.asarray(y), np.asarray(y_bc)), sigma
        t23r = _build_t23_grid_call_m(shape, 8, False, True, (), sigma,
                                      True, True, residual=True)
        ro = t23r(x3, mats["mx2"], jnp.asarray(t1_ref), mats["Kty"],
                  mats["KtzT"], mats["sx2d"], mats["sycol"],
                  mats["s23m"], mats["myb"], mats["mzrow"], cy, cz, r3)
        assert np.array_equal(np.asarray(ro),
                              np.asarray(r3 - y_bc)), sigma
