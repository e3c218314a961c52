"""Sharded transient stepping: the scanned heat / wave time loops on
slab and 2D/3D grid decompositions.

The single-device transient programs (`solvers/transient.py`) scan an
exact FDM direct solve per step. Their distributed counterparts ride
`parallel/fdm_dist.py` — the pencil-transpose direct solver — so the
WHOLE time loop is one jitted `shard_map` program (`lax.scan` inside the
shard-resident body): zero host round-trips between steps on any device
layout, the shape a pod-scale transient run actually wants.

The key identity that keeps every step SOLVE-ONLY (no distributed
forward operator apply is ever needed, because the FDM solve is exact):

- Crank-Nicolson: ``(M/dt + K/2) u^{n+1} = (M/dt - K/2) u^n + f`` and
  ``(M/dt - K/2) = 2 M/dt - (M/dt + K/2)``, so
  ``u^{n+1} = A^{-1}(2 (M/dt) u^n + f) - u^n`` — the explicit
  ``A u^n`` of the single-device path cancels against the exact
  inverse. (Trajectories match the single-device scheme to roundoff,
  not bit-exactly: pinned at 1e-10 in tests/test_transient_dist.py.)
- Newmark-beta is already solve-only in predictor form; the one
  operator application it needs (the initial acceleration) happens at
  SETUP time on the host via the single-device `KronLaplacian`.

Beyond reference parity twice over: the reference is steady-only AND
its solvers gather nothing — here the transient loop never leaves the
devices and never gathers (the FDM transforms all_to_all pencils over
ICI; see parallel/fdm_dist.py).
"""

import jax
import jax.numpy as jnp
import numpy as np

from ..fem.assembly import lumped_mass_np
from ..solvers.transient import _half_kappa
from .fdm_dist import DistFDM


def _dist_bundle(mesh, P, shards, kappa, sigma, dtype, precision,
                 devices, f):
    dfdm = DistFDM(mesh, P, shards, kappa=kappa, dtype=dtype,
                   precision=precision, sigma=sigma, devices=devices)
    m3 = lumped_mass_np(mesh, P, bc_zero=True)
    m3d = dfdm.to_dist(m3)
    fvec = (np.zeros(mesh.num_dofs(P)) if f is None
            else np.asarray(f, dtype=np.float64).reshape(-1))
    fd_vec = dfdm.to_dist(fvec)
    return dfdm, m3, m3d, fd_vec


def heat_dist_evolve(mesh, P, shards, kappa=1.0, dt=1e-2, scheme="cn",
                     dtype=jnp.float64, precision="highest", f=None,
                     f_time=None, devices=None):
    """Sharded ``evolve(u0, nsteps) -> u_T`` for the heat equation
    (global in / global out): BE or CN stepping with one distributed
    exact FDM solve per step, scanned inside a single shard_map program.

    ``shards``: int (x-slab) or 3-tuple (2D/3D device grid) — the same
    layouts as `DistFDM`. Graded spacing, mixed Dirichlet/Neumann
    faces, Robin ends and per-axis kappa all ride the fdm_dist
    embeddings unchanged. ``f`` is an optional time-independent load.
    """
    if scheme not in ("be", "cn"):
        raise ValueError(f"scheme must be 'be' or 'cn', got {scheme!r}")
    sigma = 1.0 / float(dt)
    kap_op = _half_kappa(kappa) if scheme == "cn" else kappa
    dfdm, _, m3d, fd_vec = _dist_bundle(mesh, P, shards, kap_op, sigma,
                                        dtype, precision, devices, f)
    solve_local, spec, lat = dfdm._solve_local, dfdm._spec, dfdm._lat_spec

    def local_run(fd, m3l, fl, u0l, scales):
        bcl = fd["bc"]
        if scheme == "be":
            def step(u, g):
                rhs = jnp.where(bcl, u, sigma * m3l * u + g * fl)
                return solve_local(fd, rhs), None
        else:
            # CN via the exact-inverse identity (module docstring):
            # u1 = A^{-1}(2 sigma M u + f) - u; Dirichlet rows carry 2u
            # so the pass-through lands back on u after the subtraction.
            def step(u, g):
                rhs = jnp.where(bcl, 2.0 * u,
                                2.0 * sigma * m3l * u + g * fl)
                return solve_local(fd, rhs) - u, None

        uT, _ = jax.lax.scan(step, u0l, scales)
        return uT

    from jax.sharding import PartitionSpec as P_

    @jax.jit
    def run(data, m3w, fw, u0w, scales):
        return jax.shard_map(
            local_run, mesh=dfdm.jmesh,
            in_specs=(spec, lat, lat, lat, P_()), out_specs=lat,
        )(data, m3w, fw, u0w, scales)

    when = "end" if scheme == "be" else "mid"

    def evolve(u0, nsteps):
        from ..solvers.transient import source_scales

        u0d = dfdm.to_dist(np.asarray(u0, dtype=np.float64))
        g = jnp.asarray(source_scales(f_time, dt, int(nsteps), when),
                        dtype=dtype)
        return dfdm.from_dist(run(dfdm.data, m3d, fd_vec, u0d,
                                  g)).reshape(-1)

    return evolve


def wave_leapfrog_dist_evolve(mesh, P, shards, kappa=1.0, dt=1e-2,
                              dtype=jnp.float64, precision="highest",
                              f=None, f_time=None, devices=None):
    """Sharded explicit leapfrog ``evolve(u0, v0, nsteps) -> (u_T,
    v_T)``: one distributed FORWARD operator apply per step — the
    mass-weighted eigen-transform form ``A = (⊗ M V) diag(d)
    (⊗ V^T M)`` riding the same pencil transposes as the solve
    (`parallel.fdm_dist.make_fdm_apply_dist`) — plus pointwise lumped
    updates, scanned inside one shard_map program. Conditionally
    stable: same ``wave_stable_dt`` bound as single-device (identical
    spectrum). The transform apply equals the kron 3-matmul apply to
    eigendecomposition roundoff, so trajectories match single device to
    ~1e-12 (pinned at 1e-9 over the tested horizon).
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P_

    from ..solvers.transient import source_scales
    from .fdm_dist import dist_layout, make_fdm_apply_dist
    from .multihost import fetch_global, put_global

    part, jmesh, axes_spec, lat_spec = dist_layout(mesh, shards,
                                                   devices=devices)
    data, spec, apply_local = make_fdm_apply_dist(
        mesh, P, part, axes_spec, lat_spec, kappa, dtype,
        precision=precision)
    with jmesh:
        data = jax.tree.map(
            lambda a, s: put_global(a, NamedSharding(jmesh, s)),
            data, spec)

    def to_d(u):
        ud = part.to_dist(P, np.asarray(u, dtype=np.float64))
        return put_global(np.asarray(ud, dtype=np.dtype(dtype)),
                          NamedSharding(jmesh, lat_spec))

    bc_np = np.asarray(mesh.boundary_dof_marker(P))
    m3 = lumped_mass_np(mesh, P, bc_zero=True)
    m3safe_d = to_d(np.where(bc_np, 1.0, m3))
    fvec = (np.zeros_like(m3) if f is None
            else np.asarray(f, dtype=np.float64).reshape(-1))
    fd_vec = to_d(fvec)

    def local_run(fd, msl, fl, u0l, v0l, g0, gT, scales):
        bcl = fd["bc"]

        def accel(u, g):
            Au = apply_local(fd, u)  # where(bc, u, A u_masked)
            return jnp.where(bcl, 0.0, (g * fl - Au) / msl)

        def step(carry, g):
            um1, u = carry
            u1 = jnp.where(bcl, u,
                           2.0 * u - um1 + (dt * dt) * accel(u, g))
            return (u, u1), None

        v0l = jnp.where(bcl, 0.0, v0l)
        u1 = jnp.where(bcl, u0l,
                       u0l + dt * v0l + (0.5 * dt * dt) * accel(u0l, g0))
        (um1, uT), _ = jax.lax.scan(step, (u0l, u1), scales)
        vT = (uT - um1) / dt + (0.5 * dt) * accel(uT, gT)
        return uT, vT

    @jax.jit
    def run(dataw, msl, fl, u0w, v0w, g0, gT, scales):
        return jax.shard_map(
            local_run, mesh=jmesh,
            in_specs=(spec, lat_spec, lat_spec, lat_spec, lat_spec,
                      P_(), P_(), P_()),
            out_specs=(lat_spec, lat_spec),
        )(dataw, msl, fl, u0w, v0w, g0, gT, scales)

    def evolve(u0, v0, nsteps):
        if int(nsteps) < 1:
            raise ValueError(
                f"leapfrog needs nsteps >= 1 (the Taylor start IS the "
                f"first step), got {nsteps}")
        g = jnp.asarray(
            source_scales(f_time, dt, int(nsteps) - 1, "end"), dtype=dtype)
        g0 = jnp.asarray(1.0 if f_time is None else float(f_time(0.0)),
                         dtype=dtype)
        gT = jnp.asarray(
            1.0 if f_time is None else float(f_time(dt * int(nsteps))),
            dtype=dtype)
        uT, vT = run(data, m3safe_d, fd_vec, to_d(u0), to_d(v0), g0, gT, g)
        return (part.from_dist(P, fetch_global(uT)).reshape(-1),
                part.from_dist(P, fetch_global(vT)).reshape(-1))

    return evolve


def semilinear_dist_evolve(mesh, P, shards, nonlin, kappa=1.0, dt=1e-3,
                           scheme="cnab", sigma=0.0, dtype=jnp.float64,
                           precision="highest", f=None, f_time=None,
                           devices=None):
    """Sharded IMEX semilinear reaction-diffusion ``evolve(u0, nsteps)
    -> u_T`` (global in / global out): implicit linear part via the
    distributed FDM, explicit pointwise collocated reaction ``m3 N(u)``
    — pointwise on consistent duplicated planes, so it needs NO
    exchange at all. Same schemes/identities as
    `solvers.transient.semilinear_fdm_evolve` (single-device match
    pinned at 1e-10 in tests/test_semilinear_transient.py).
    """
    from jax.sharding import PartitionSpec as P_

    from ..solvers.transient import source_scales

    if scheme not in ("be", "cnab"):
        raise ValueError(f"scheme must be 'be' or 'cnab', got {scheme!r}")
    sdt = 1.0 / float(dt)
    if scheme == "be":
        kap_op, shift, when = kappa, float(sigma) + sdt, "end"
    else:
        kap_op, shift, when = (_half_kappa(kappa),
                               0.5 * float(sigma) + sdt, "mid")
    dfdm, _, m3d, fd_vec = _dist_bundle(mesh, P, shards, kap_op, shift,
                                        dtype, precision, devices, f)
    solve_local, spec, lat = dfdm._solve_local, dfdm._spec, dfdm._lat_spec

    def local_run(fd, m3l, fl, u0l, scales):
        bcl = fd["bc"]
        if scheme == "be":
            def step(u, g):
                rhs = jnp.where(bcl, u,
                                sdt * m3l * u - m3l * nonlin.N(u)
                                + g * fl)
                return solve_local(fd, rhs), None

            uT, _ = jax.lax.scan(step, u0l, scales)
        else:
            def step(carry, g):
                u, N_m1 = carry
                N_n = nonlin.N(u)
                S = g * fl - m3l * (1.5 * N_n - 0.5 * N_m1)
                rhs = jnp.where(bcl, 2.0 * u, 2.0 * sdt * m3l * u + S)
                return (solve_local(fd, rhs) - u, N_n), None

            (uT, _), _ = jax.lax.scan(step, (u0l, nonlin.N(u0l)), scales)
        return uT

    @jax.jit
    def run(data, m3w, fw, u0w, scales):
        return jax.shard_map(
            local_run, mesh=dfdm.jmesh,
            in_specs=(spec, lat, lat, lat, P_()), out_specs=lat,
        )(data, m3w, fw, u0w, scales)

    def evolve(u0, nsteps):
        u0d = dfdm.to_dist(np.asarray(u0, dtype=np.float64))
        g = jnp.asarray(source_scales(f_time, dt, int(nsteps), when),
                        dtype=dtype)
        return dfdm.from_dist(run(dfdm.data, m3d, fd_vec, u0d,
                                  g)).reshape(-1)

    return evolve


def convdiff_dist_evolve(mesh, P, shards, velocity, kappa=1.0, dt=1e-3,
                         scheme="cnab", sigma=0.0, dtype=jnp.float64,
                         precision="highest", f=None, f_time=None,
                         devices=None):
    """Sharded IMEX convection-diffusion ``evolve(u0, nsteps) -> u_T``
    (global in / global out): implicit distributed FDM diffusion +
    explicit separable advection, scanned inside one shard_map program
    on slab or 2D/3D grid layouts.

    The advection data follows the distributed kron-level recipe: the
    scale-free local 1D advection matrix is REPLICATED (equal-cell
    shards, h cancels — graded axes included), the per-axis GLL masses
    ride the duplicated-plane layout (`duplicate_planes`, spec
    P(axis)), and each axis contraction's interface partials exchange
    along that axis only. CNAB's explicit diffusion term uses the same
    exact-inverse identity as the CN heat path, so the only operator
    evaluations per step are the 3 advection matmuls + the FDM solve.
    A linear reaction ``sigma u`` folds into the implicit shift (BE:
    sigma + 1/dt, CN: sigma/2 + 1/dt), matching `convdiff_fdm_evolve`.
    """
    from jax.sharding import NamedSharding
    from jax.sharding import PartitionSpec as P_

    from ..ops.kron import (axis_advection, axis_stiffness_mass,
                            kron_advection_terms)
    from ..solvers.transient import source_scales
    from .grid2d import AXES, _exchange_axis
    from .multihost import put_global
    from .partition import duplicate_planes

    if scheme not in ("be", "cnab"):
        raise ValueError(f"scheme must be 'be' or 'cnab', got {scheme!r}")
    cvel = np.asarray(velocity, dtype=np.float64)
    if cvel.shape != (3,):
        raise ValueError(f"velocity must be a 3-vector, got {cvel.shape}")
    sdt = 1.0 / float(dt)
    kap_op = _half_kappa(kappa) if scheme == "cnab" else kappa
    shift = (0.5 * float(sigma) + sdt if scheme == "cnab"
             else float(sigma) + sdt)
    dfdm, _, m3d, fd_vec = _dist_bundle(mesh, P, shards, kap_op, shift,
                                        dtype, precision, devices, f)
    solve_local, spec, lat = dfdm._solve_local, dfdm._spec, dfdm._lat_spec
    sh3 = ((int(shards), 1, 1) if np.ndim(shards) == 0
           else tuple(int(s) for s in shards))
    loc = tuple(dfdm.part.local_shape(P))

    def place(a, s):
        return put_global(np.asarray(a, dtype=np.dtype(dtype)),
                          NamedSharding(dfdm.jmesh, s))

    Cs, ms, ms_spec = [], [], []
    for a in range(3):
        Cs.append(place(axis_advection(mesh.nc[a] // sh3[a], P), P_()))
        m_g = axis_stiffness_mass(mesh.nc[a], P, mesh.h_cells[a])[1]
        if sh3[a] > 1:
            ms.append(place(duplicate_planes(m_g, loc[a], sh3[a]),
                            P_(AXES[a])))
            ms_spec.append(P_(AXES[a]))
        else:
            ms.append(place(m_g, P_()))
            ms_spec.append(P_())
    cvd = place(cvel, P_())
    exchanges = tuple(
        (lambda t, a=a: _exchange_axis(t, sh3[a], AXES[a], a))
        if sh3[a] > 1 else None
        for a in range(3))

    def local_run(fd, m3l, fl, Cl, ml, cv, u0l, scales):
        bcl = fd["bc"]

        def adv(u):
            w = jnp.where(bcl, jnp.zeros_like(u), u)
            return kron_advection_terms(w, Cl, ml, cv,
                                        precision=precision,
                                        exchanges=exchanges)

        if scheme == "be":
            def step(u, g):
                rhs = jnp.where(bcl, u,
                                sdt * m3l * u - adv(u) + g * fl)
                return solve_local(fd, rhs), None

            uT, _ = jax.lax.scan(step, u0l, scales)
        else:
            # Exact-inverse identity for the CN diffusion half (module
            # docstring); AB2 advection in the explicit remainder S.
            def step(carry, g):
                u, adv_m1 = carry
                adv_n = adv(u)
                S = g * fl - (1.5 * adv_n - 0.5 * adv_m1)
                rhs = jnp.where(bcl, 2.0 * u, 2.0 * sdt * m3l * u + S)
                return (solve_local(fd, rhs) - u, adv_n), None

            (uT, _), _ = jax.lax.scan(step, (u0l, adv(u0l)), scales)
        return uT

    @jax.jit
    def run(data, m3w, fw, Cw, mw, cv, u0w, scales):
        return jax.shard_map(
            local_run, mesh=dfdm.jmesh,
            in_specs=(spec, lat, lat, (P_(),) * 3, tuple(ms_spec), P_(),
                      lat, P_()),
            out_specs=lat,
        )(data, m3w, fw, Cw, mw, cv, u0w, scales)

    when = "end" if scheme == "be" else "mid"

    def evolve(u0, nsteps):
        u0d = dfdm.to_dist(np.asarray(u0, dtype=np.float64))
        g = jnp.asarray(source_scales(f_time, dt, int(nsteps), when),
                        dtype=dtype)
        return dfdm.from_dist(run(dfdm.data, m3d, fd_vec, tuple(Cs),
                                  tuple(ms), cvd, u0d, g)).reshape(-1)

    return evolve


def wave_newmark_dist_evolve(mesh, P, shards, kappa=1.0, dt=1e-2,
                             beta=0.25, gamma=0.5, dtype=jnp.float64,
                             precision="highest", f=None, f_time=None,
                             devices=None):
    """Sharded Newmark-beta ``evolve(u0, v0, nsteps) -> (u_T, v_T)``:
    one distributed exact FDM solve (sigma = 1/(beta dt^2)) per step
    plus pointwise updates, scanned inside one shard_map program. The
    initial acceleration's single operator application runs on the host
    at call time (setup-scale work); every timestep is gather-free.
    """
    from ..ops.kron import KronLaplacian

    if not (beta > 0.0 and gamma >= 0.5):
        raise ValueError(f"need beta > 0, gamma >= 1/2, got {beta}, {gamma}")
    c0 = 1.0 / (beta * dt * dt)
    dfdm, m3, m3d, fd_vec = _dist_bundle(mesh, P, shards, kappa, c0,
                                         dtype, precision, devices, f)
    solve_local, spec, lat = dfdm._solve_local, dfdm._spec, dfdm._lat_spec
    bc_np = np.asarray(mesh.boundary_dof_marker(P))
    m3safe = np.where(bc_np, 1.0, m3)
    fvec_np = (np.zeros_like(m3) if f is None
               else np.asarray(f, dtype=np.float64).reshape(-1))
    op = KronLaplacian(mesh, P, kappa=kappa, dtype=dtype,
                      precision=precision)

    def local_run(fd, m3l, fl, u0l, v0l, a0l, scales):
        bcl = fd["bc"]

        def step(carry, g):
            u, v, a = carry
            ustar = u + dt * v + ((0.5 - beta) * dt * dt) * a
            rhs = jnp.where(bcl, u, g * fl + c0 * m3l * ustar)
            u1 = solve_local(fd, rhs)
            a1 = jnp.where(bcl, 0.0, c0 * (u1 - ustar))
            v1 = v + dt * ((1.0 - gamma) * a + gamma * a1)
            return (u1, v1, a1), None

        (uT, vT, _), _ = jax.lax.scan(step, (u0l, v0l, a0l), scales)
        return uT, vT

    from jax.sharding import PartitionSpec as P_

    @jax.jit
    def run(data, m3w, fw, u0w, v0w, a0w, scales):
        return jax.shard_map(
            local_run, mesh=dfdm.jmesh,
            in_specs=(spec, lat, lat, lat, lat, lat, P_()),
            out_specs=(lat, lat),
        )(data, m3w, fw, u0w, v0w, a0w, scales)

    def evolve(u0, v0, nsteps):
        from ..solvers.transient import source_scales

        u0 = np.asarray(u0, dtype=np.float64).reshape(-1)
        v0 = np.where(bc_np, 0.0,
                      np.asarray(v0, dtype=np.float64).reshape(-1))
        g0 = 1.0 if f_time is None else float(f_time(0.0))
        Ku = np.asarray(op(jnp.asarray(u0, dtype=dtype)),
                        dtype=np.float64).reshape(-1)
        a0 = np.where(bc_np, 0.0, (g0 * fvec_np - Ku) / m3safe)
        g = jnp.asarray(source_scales(f_time, dt, int(nsteps), "end"),
                        dtype=dtype)
        uT, vT = run(dfdm.data, m3d, fd_vec, dfdm.to_dist(u0),
                     dfdm.to_dist(v0), dfdm.to_dist(a0), g)
        return dfdm.from_dist(uT).reshape(-1), dfdm.from_dist(vT).reshape(-1)

    return evolve
