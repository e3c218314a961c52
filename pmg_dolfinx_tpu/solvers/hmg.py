"""Geometric h-multigrid on the structured lattice: the AMG replacement.

The reference's optional coarse-grid solver is hypre BoomerAMG behind a
PETSc KSP (src/amg.hpp, used at the p=1 level when `--amg` is passed).
Algebraic MG exists because unstructured meshes have no natural coarse
grids — but this framework's meshes are structured boxes, so *geometric*
h-coarsening (factor 2 per level, closed-form transfer operators) does the
same job with none of the setup machinery, and every level rides the same
Kronecker-sum MXU operator as the rest of the framework.

Built as data for the SAME generic `v_cycle` used by the p-hierarchy
(solvers/pmg.py): levels differ by mesh spacing instead of polynomial
degree; transfers are per-axis 1D nodal interpolation matrices between
nested lattices (restriction = plain transpose, as for p-transfer);
smoothers are the same calibrated fourth-kind Chebyshev.

Used via ``PMGHierarchy(..., coarse='hmg')``: the p-multigrid coarse
(p=1) problem is approximately solved by a fixed number of nested h-MG
V-cycles, with a dense Cholesky (or Chebyshev) bottom solve on the
coarsest lattice. The composition p-MG over h-MG is the classic
"p-multigrid with h-multigrid coarse solve" that the reference emulates
with AMG.
"""

import jax.numpy as jnp
import numpy as np

from ..fem.gll import gauss_lobatto, lagrange_tabulate
from ..ops.blas import inner_product
from ..fem.mesh import BoxMesh


def axis_h_interpolation(nc_coarse: int, P: int = 1, factor: int = 2,
                         dtype=np.float64):
    """1D nodal interpolation from an ``nc_coarse``-cell lattice to the
    ``factor``-refined ``factor * nc_coarse``-cell lattice at degree P.

    ``I[f, c] = l_c^{coarse}(x_f^{fine})``; each coarse cell contains
    ``factor`` fine cells whose nodes sit at ``(k + xg)/factor`` in the
    coarse cell's reference coordinates.
    """
    xg, _ = gauss_lobatto(P + 1)
    blocks = [
        lagrange_tabulate(xg, (k + xg) / factor, 0)[0]  # (P+1, P+1)
        for k in range(factor)
    ]
    Nf, Nc = factor * nc_coarse * P + 1, nc_coarse * P + 1
    I = np.zeros((Nf, Nc), dtype=dtype)
    for c in range(nc_coarse):
        cols = slice(c * P, c * P + P + 1)
        for k in range(factor):
            fcell = factor * c + k
            rows = slice(fcell * P, fcell * P + P + 1)
            I[rows, cols] = blocks[k]
    return I


def coarsenable_levels(nc, min_cells=2, max_levels=10):
    """Mesh sizes [finest, ..., coarsest], coarsening by factor 2 (or 3
    when 2 does not divide) while all axes stay above ``min_cells``."""
    out = [tuple(nc)]
    cur = tuple(nc)
    while len(out) < max_levels:
        nxt = None
        for f in (2, 3):
            if all(c % f == 0 and c // f >= min_cells for c in cur):
                nxt = tuple(c // f for c in cur)
                break
        if nxt is None:
            break
        cur = nxt
        out.append(cur)
    return out


def build_hmg(mesh, P, kappa, dtype, smoother_iters=2, min_cells=2,
              max_levels=10, precision="highest",
              calibration_iters=20, bottom="direct", sigma=0.0):
    """Construct (levels, data, bottom) for the generic `v_cycle`.

    Levels are ordered coarse->fine like the p-hierarchy. Smoother
    calibration reuses the recorded-CG/Lanczos machinery per level.
    Returns the static Level tuple, the array pytree (levels/transfer and
    optionally the dense bottom factor), and the bottom-solve mode.
    ``sigma`` rediscretizes the shifted operator ``A + sigma M`` on every
    h-level (the shift uses each level's OWN lumped mass — the natural
    geometric-MG hierarchy for the reaction-diffusion family).
    """
    import jax

    from ..ops.kron import axis_stiffness_mass, kron_diagonal
    from .cg import cg_solve
    from .pmg import (
        DEFAULT_CALIBRATION_RTOL,
        EIG_RANGE_FACTORS,
        Level,
        kron_cycle_ops,
    )
    from .tridiag import lanczos_eigenvalue_estimates

    sizes = coarsenable_levels(mesh.nc, min_cells=min_cells,
                               max_levels=max_levels)[::-1]  # coarse->fine
    meshes = [BoxMesh(nc, extent=mesh.extent) for nc in sizes]
    ops = kron_cycle_ops(precision, sigma=sigma)

    levels, level_data = [], []
    for m in meshes:
        lv = {}
        for name, nc_a, h_a in zip("xyz", m.nc, m.h):
            K, mass = axis_stiffness_mass(nc_a, P, h_a)
            lv["K" + name] = jnp.asarray(float(kappa) * K, dtype=dtype)
            lv["m" + name] = jnp.asarray(mass, dtype=dtype)
        bc = jnp.asarray(m.boundary_dof_marker(P))
        diag = kron_diagonal(
            (lv["Kx"], lv["Ky"], lv["Kz"]), (lv["mx"], lv["my"], lv["mz"]),
            bc, sigma=sigma,
        )
        # Lattice-shaped markers/diagonal: kron cycle vectors are 3D.
        lv["bc_marker"] = bc.reshape(m.lattice_shape(P))
        lv["diag_inv"] = (1.0 / diag).reshape(m.lattice_shape(P))
        level = Level(P=P, ndofs=m.num_dofs(P), smoother_iters=smoother_iters,
                      shape=m.lattice_shape(P))

        def _calib(lv_, b_, x0_, _level=level):
            A = lambda x: ops["apply"](lv_, x, _level)
            return cg_solve(
                A, b_, x0_, lv_["diag_inv"],
                rtol=DEFAULT_CALIBRATION_RTOL, maxiter=calibration_iters,
                record=True, dot=inner_product,
            )

        _, info = jax.jit(_calib)(
            lv,
            jnp.ones(level.shape, dtype=dtype),
            jnp.zeros(level.shape, dtype=dtype),
        )
        try:
            eigs = lanczos_eigenvalue_estimates(
                info["alphas"], info["betas"], info["stored"]
            )
            lmax = float(eigs[-1])
        except ValueError:
            # Near-trivial level (CG converged in < 2 iterations): the
            # Jacobi-preconditioned spectrum is within (0, 2]; use the
            # safe upper bound.
            lmax = 2.0
        lv["lmax"] = jnp.asarray(EIG_RANGE_FACTORS[1] * lmax, dtype=dtype)
        levels.append(level)
        level_data.append(lv)

    transfer = []
    for i in range(len(meshes) - 1):
        mc, mf = meshes[i], meshes[i + 1]
        tr = {
            "I" + name: jnp.asarray(
                axis_h_interpolation(nc_c, P, factor=nc_f // nc_c), dtype=dtype
            )
            for name, nc_c, nc_f in zip("xyz", mc.nc, mf.nc)
        }
        transfer.append(tr)

    data = dict(levels=tuple(level_data), transfer=tuple(transfer))
    if bottom == "direct" and meshes[0].num_dofs(P) > 4096:
        # A dense factor at this size would dwarf the cycle; fall back to
        # a Krylov bottom solve (the coarse-grid role hypre's own nested
        # hierarchy plays in the reference).
        bottom = "cg"
    if bottom == "direct":
        from ..fem.assembly import assemble_stiffness, lumped_mass_np

        A0 = assemble_stiffness(meshes[0], P, kappa=float(kappa)).toarray()
        if sigma:
            A0[np.diag_indices_from(A0)] += sigma * lumped_mass_np(
                meshes[0], P, bc_zero=True
            )
        data["coarse_chol"] = jnp.asarray(np.linalg.cholesky(A0), dtype=dtype)
    return tuple(levels), data, bottom
