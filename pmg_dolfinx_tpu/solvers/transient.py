"""Transient heat equation ``u_t - div(kappa grad u) = f``: implicit
time stepping on top of the shifted (reaction-diffusion) family.

Discretizing in time first (method of lines, GLL-lumped mass M):

- backward Euler:   ``(K + M/dt) u^{n+1} = (M/dt) u^n + b``
- Crank-Nicolson:   ``(K/2 + M/dt) u^{n+1} = (M/dt - K/2) u^n + b``

Both left-hand operators are exactly the framework's shifted form
``A + sigma M`` with ``sigma = 1/dt`` (CN additionally halves kappa),
so on the kron family every step is ONE exact FDM direct solve — six
MXU matmuls — and the whole time loop compiles to a single XLA program
(`lax.scan`): zero host round-trips between steps, the TPU-native shape
of a transient solve. General meshes (curved hexes / variable kappa)
step through the same shifted PMG hierarchies with an FCG solve per
step instead (see examples/heat.py).

The reference has no transient driver (steady Poisson only,
examples/pmg/main.cpp) — beyond-parity model-family coverage built
entirely from existing verified pieces: `FastDiagonalizationSolver
(sigma=1/dt)`, `fem.assembly.lumped_mass_np`, `ops.kron.KronLaplacian`.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import lumped_mass_np
from ..solvers.fdm import FastDiagonalizationSolver


def heat_fdm_evolve(mesh, P, kappa=1.0, dt=1e-2, scheme="cn",
                    dtype=jnp.float64, precision="highest", f=None):
    """Jitted ``evolve(u0, nsteps) -> u_T`` for the kron family
    (axis-aligned boxes incl. graded spacing, scalar / per-axis /
    diagonal-tensor kappa, mixed Dirichlet/Neumann faces).

    ``scheme``: 'be' (backward Euler, O(dt)) or 'cn' (Crank-Nicolson,
    O(dt^2)). ``f`` (optional) is a TIME-INDEPENDENT source vector
    (assembled load, Dirichlet rows zeroed); the steady state is then
    ``K u = f``. The step count is a trace-time constant of the scanned
    program; u0 must satisfy the Dirichlet data (rows pass through).
    """
    if scheme not in ("be", "cn"):
        raise ValueError(f"scheme must be 'be' or 'cn', got {scheme!r}")
    sigma = 1.0 / float(dt)
    m3 = jnp.asarray(lumped_mass_np(mesh, P, bc_zero=True), dtype=dtype)
    shape = mesh.lattice_shape(P)
    bc = jnp.asarray(np.asarray(mesh.boundary_dof_marker(P)).reshape(shape))
    fvec = (jnp.zeros(shape, dtype=dtype) if f is None
            else jnp.asarray(np.asarray(f).reshape(shape), dtype=dtype))
    m3 = m3.reshape(shape)

    if scheme == "be":
        solver = FastDiagonalizationSolver(mesh, P, kappa=kappa,
                                           dtype=dtype, sigma=sigma,
                                           precision=precision)

        def step(u, _):
            rhs = jnp.where(bc, u, sigma * m3 * u + fvec)
            return solver.solve(rhs), None
    else:
        # CN left operator: K/2 + M/dt = (A + sigma' M) with kappa/2.
        # The right operator M/dt - K/2 is evaluated as
        # 2 (M/dt) u - (K/2 + M/dt) u — one shifted kron apply.
        from ..ops.kron import KronLaplacian

        kap_half = _half_kappa(kappa)
        solver = FastDiagonalizationSolver(mesh, P, kappa=kap_half,
                                           dtype=dtype, sigma=sigma,
                                           precision=precision)
        op = KronLaplacian(mesh, P, kappa=kap_half, dtype=dtype,
                           precision=precision, sigma=sigma)

        def step(u, _):
            # KronLaplacian's public contract is flat-in/flat-out for a
            # flat bc marker; reshape at the call (free inside jit).
            Au = op(u.reshape(-1)).reshape(shape)
            rhs = 2.0 * sigma * m3 * u - Au + fvec
            rhs = jnp.where(bc, u, rhs)
            return solver.solve(rhs), None

    @partial(jax.jit, static_argnames="nsteps")
    def evolve(u0, nsteps):
        u0 = jnp.asarray(u0, dtype=dtype).reshape(shape)
        uT, _ = jax.lax.scan(step, u0, length=nsteps)
        return uT

    return evolve


def heat_packed_evolve(mesh, P, kappa=1.0, dt=1e-2, B=8, scheme="cn",
                       interpret=False):
    """Jitted ``evolve(U0[(B, ndofs)], nsteps) -> U_T`` stepping the
    whole batch through the LANE-PACKED serving kernels
    (ops/pallas_kron_packed.py, f32, NZ <= 64): the batch is packed
    into the 128-lane tiles ONCE, every step is one packed FDM direct
    solve (+ one packed shifted apply for CN) on the packed layout, and
    the result unpacks at the end — the serving analogue of the
    3D-native-lattice rule applied in time. Homogeneous Dirichlet data
    (the packed rows pass zeros through).
    """
    if scheme not in ("be", "cn"):
        raise ValueError(f"scheme must be 'be' or 'cn', got {scheme!r}")
    from ..ops.pallas_kron_packed import PackedFDMBatch, PackedKronBatch

    sigma = 1.0 / float(dt)
    kap_op = _half_kappa(kappa) if scheme == "cn" else kappa
    fdm = PackedFDMBatch(mesh, P, kappa=kap_op, B=B, sigma=sigma,
                         interpret=interpret)
    op = (PackedKronBatch(mesh, P, kappa=kap_op, B=B, sigma=sigma,
                          interpret=interpret) if scheme == "cn" else None)
    m3 = np.asarray(lumped_mass_np(mesh, P, bc_zero=True), np.float32)
    m3p = fdm.pack(jnp.broadcast_to(jnp.asarray(m3), (B, m3.size)))

    def step(Pu, _):
        if scheme == "be":
            rhs = sigma * m3p * Pu
        else:
            rhs = 2.0 * sigma * m3p * Pu - op.apply_packed(Pu)
        return fdm.solve_packed(rhs), None

    @partial(jax.jit, static_argnames="nsteps")
    def evolve(U0, nsteps):
        Pu = fdm.pack(jnp.asarray(U0, jnp.float32))
        PT, _ = jax.lax.scan(step, Pu, length=nsteps)
        return fdm.unpack(PT).reshape(B, -1)

    return evolve


def _half_kappa(kappa):
    """kappa/2 for scalar / per-axis / diagonal-tensor coefficients."""
    if np.isscalar(kappa):
        return 0.5 * float(kappa)
    k = np.asarray(kappa, dtype=np.float64)
    return 0.5 * k


def heat_pcg_evolve(hier, mesh, P, dt, scheme="cn", rtol=1e-9,
                    f=None):
    """``evolve(u0, nsteps) -> (u_T, iters)`` for the GENERAL family:
    each step solves the shifted system with the hierarchy's FCG(V)
    (``hier`` must be built with ``sigma = 1/dt``, and kappa/2 for CN —
    see examples/heat.py). Host python loop (one warm jitted solve per
    step); returns the per-step iteration counts.
    """
    if scheme not in ("be", "cn"):
        raise ValueError(f"scheme must be 'be' or 'cn', got {scheme!r}")
    sigma = 1.0 / float(dt)
    dtype = hier.dtype
    m3 = jnp.asarray(lumped_mass_np(mesh, P, bc_zero=True), dtype=dtype)
    fvec = (jnp.zeros_like(m3) if f is None
            else jnp.asarray(np.asarray(f).reshape(-1), dtype=dtype))
    A = hier.operator()  # shifted fine-level apply (flat contract)

    def evolve(u0, nsteps):
        u = jnp.asarray(u0, dtype=dtype).reshape(-1)
        iters = []
        for _ in range(int(nsteps)):
            Au = jnp.asarray(A(u)).reshape(-1)
            # Warm start via the error form: solve A e = rhs - A u, then
            # u += e (u^n is an O(dt) guess for u^{n+1}); one shifted
            # apply builds both the CN right side and the residual.
            if scheme == "be":
                res = sigma * m3 * u + fvec - Au
            else:
                res = 2.0 * (sigma * m3 * u - Au) + fvec
            e, niter = hier.solve_pcg(res, rtol=rtol)
            u = u + jnp.asarray(e).reshape(-1)
            iters.append(int(niter))
        return u, iters

    return evolve
