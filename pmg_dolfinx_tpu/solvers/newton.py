"""Inexact Newton–Krylov for semilinear reaction-diffusion problems.

Discrete system (GLL-collocated, so the nonlinear reaction is pointwise
through the lumped mass — the same mechanism as the linear ``sigma``
shift, `fem.assembly.lumped_mass_np`):

    F(u) = A u + m3 * N(u) - b = 0,

where ``A`` is the fine-level operator of an already-built hierarchy
(any backend/decomposition — it may carry a linear ``sigma``/Robin shift
of its own), ``m3`` the bc-zeroed lumped mass and ``N`` a pointwise
nonlinearity (`models.semilinear.Nonlinearity`).

Each Newton step solves

    J(u_k) du = -F(u_k),    J(u) x = A x + m3 * N'(u) * x

matrix-free with flexible CG, preconditioned by the hierarchy's frozen
V-cycle (which ignores the u-dependent reaction term — FCG's flexible
beta absorbs the lag, the same robustness argument as for the inexact
coarse Krylov solve inside the cycle). Inner tolerances follow a
simplified Eisenstat–Walker forcing sequence so early steps don't
oversolve.

Works on `PMGHierarchy` (single device), `DistPMG` (1D slab) and
`GridPMG` (2D/3D device grid): the step program is generic over the
cycle-ops protocol and is wrapped in ``shard_map`` exactly like the
classes' own linear solve programs, so every Newton iterate rides the
duplicated-plane layouts with psum dots.

The reference framework (Wells-Group/pmg-dolfinx) is linear-only; this
module is a beyond-parity capability built entirely from existing
framework pieces (`v_cycle`, `fcg_solve`, the lumped-mass shift).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..fem.assembly import lumped_mass_np
from .cg import fcg_solve
from .pmg import v_cycle
from .shardwrap import is_sharded, layout_converters, vector_spec, \
    wrap_program

# Simplified Eisenstat–Walker (choice 2) forcing parameters.
EW_ETA0 = 1e-2
EW_ETA_MAX = 1e-2
EW_ETA_MIN = 1e-10
EW_GAMMA = 0.9


def _make_programs(hier, nonlin, lin_maxiter):
    """Build (jitted, possibly shard_map'd) ``resid`` and ``step``
    programs for this hierarchy + nonlinearity."""
    ops = hier._ops
    levels = hier.levels
    fine = levels[-1]
    coarse, coarse_cfg = hier.coarse, hier.coarse_cfg
    N, dN = nonlin.N, nonlin.dN

    def resid(data, u, bw, m3w):
        lv = data["levels"][-1]
        F = ops["apply"](lv, u, fine) + m3w * N(u) - bw
        return jnp.sqrt(ops["dot"](F, F, lv))

    def step(data, u, bw, m3w, eta, damp):
        lv = data["levels"][-1]
        A = lambda x: ops["apply"](lv, x, fine)
        F = A(u) + m3w * N(u) - bw
        w = dN(u)
        J = lambda x: A(x) + m3w * w * x
        M = lambda r: v_cycle(
            data, r, ops["pvary"](jnp.zeros_like(r)),
            levels=levels, coarse=coarse, coarse_cfg=coarse_cfg, ops=ops,
        )
        du, info = fcg_solve(
            J, -F, ops["pvary"](jnp.zeros_like(u)), M,
            rtol=eta, maxiter=lin_maxiter,
            dot=lambda a, c: ops["dot"](a, c, lv),
        )
        return u + damp * du, info["niter"]

    vspec = vector_spec(hier) if is_sharded(hier) else None
    resid = wrap_program(
        hier, resid,
        in_specs=(hier.data_specs, vspec, vspec, vspec) if vspec else None,
        out_specs=P(),
    )
    step = wrap_program(
        hier, step,
        in_specs=(hier.data_specs, vspec, vspec, vspec, P(), P())
        if vspec else None,
        out_specs=(vspec, P()),
    )
    return resid, step


def newton_solve(hier, b, nonlin, *, rtol=1e-9, atol=0.0, maxiter=20,
                 lin_rtol=None, lin_maxiter=60, u0=None, damping=1.0):
    """Solve ``A u + m3 N(u) = b`` by V-cycle-preconditioned inexact
    Newton.

    Parameters
    ----------
    hier : PMGHierarchy | DistPMG | GridPMG (already built; its linear
        operator — including any sigma/Robin shift — is ``A``).
    b : global rhs (flat, host contract — same as ``hier.solve``),
        Dirichlet rows zero (homogeneous bc).
    nonlin : `models.semilinear.Nonlinearity`.
    rtol, atol : stop when ``|F| <= rtol |F(u0)| + atol``.
    lin_rtol : inner FCG tolerance; None = Eisenstat–Walker forcing
        ``eta_k = clip(0.9 (|F_k|/|F_{k-1}|)^2, 1e-10, 1e-2)``.
    damping : fixed step damping factor (1.0 = full Newton).

    Returns ``(u, info)`` with ``info = dict(niter, fnorms, lin_iters,
    converged)``; ``fnorms[k] = |F(u_k)|`` includes the final iterate.
    """
    fine = hier.levels[-1]
    dtype = hier.dtype

    key = (id(nonlin), int(lin_maxiter))
    cache = getattr(hier, "_newton_cache", None)
    if cache is None:
        cache = hier._newton_cache = {}
    if key not in cache:
        cache[key] = _make_programs(hier, nonlin, int(lin_maxiter))
    resid_fn, step_fn = cache[key]

    sharded = is_sharded(hier)
    to_w, from_w = layout_converters(hier)

    bw = to_w(np.asarray(b, dtype=dtype))
    m3 = lumped_mass_np(hier.mesh, fine.P, bc_zero=True)
    m3w = to_w(m3.astype(dtype))
    uw = jnp.zeros_like(bw) if u0 is None else to_w(np.asarray(u0, dtype=dtype))
    if not sharded:
        # Device-resident once (to_dist already returns global arrays).
        bw, m3w, uw = (jnp.asarray(a) for a in (bw, m3w, uw))

    fnorms, lin_iters = [], []
    f_prev = None
    eta = float(lin_rtol) if lin_rtol is not None else EW_ETA0
    converged = False
    for _ in range(int(maxiter)):
        f_k = float(resid_fn(hier.data, uw, bw, m3w))
        fnorms.append(f_k)
        f0 = fnorms[0]
        if f_k <= rtol * f0 + atol:
            converged = True
            break
        if lin_rtol is None and f_prev is not None and f_prev > 0:
            eta = float(np.clip(EW_GAMMA * (f_k / f_prev) ** 2,
                                EW_ETA_MIN, EW_ETA_MAX))
        f_prev = f_k
        uw, nit = step_fn(hier.data, uw, bw, m3w,
                          jnp.asarray(eta, dtype=dtype),
                          jnp.asarray(damping, dtype=dtype))
        lin_iters.append(int(nit))
    else:
        # Loop exhausted: record the final residual for the caller.
        fnorms.append(float(resid_fn(hier.data, uw, bw, m3w)))
        converged = fnorms[-1] <= rtol * fnorms[0] + atol

    return from_w(uw), dict(
        niter=len(lin_iters), fnorms=fnorms, lin_iters=lin_iters,
        converged=converged,
    )
