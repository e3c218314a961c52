"""Steady convection-diffusion: ``-div(kappa grad u) + c . grad u
+ sigma u = f`` with a constant velocity ``c`` on axis-aligned boxes.

The advection operator factors per axis exactly like the Kronecker-sum
stiffness — ``c . grad -> sum_a c_a M_b (x) C_a (x) M_c`` with the
scale-free 1D weak-derivative matrices `ops.kron.axis_advection` — so
the full operator is three extra MXU matmuls on top of the diffusion
apply (`ops.kron.kron_convdiff_apply`). The system is nonsymmetric:
solved by `solvers.bicgstab` preconditioned with the hierarchy's
V-cycle on the SYMMETRIC (diffusion + sigma) part, which stays an
effective preconditioner up to moderate cell-Peclet numbers (the
advection perturbation is what BiCGStab absorbs). Measured (30k dofs,
p=3, f64, V(fdm) preconditioner): 11 iterations at cell Pe 0.02, 15 at
0.2, 92 at 1.9; beyond Pe ~ 1 the unstabilized Galerkin form is
under-resolved anyway (refine, or raise kappa) — the intended regime is
diffusion-dominated transport.

Generic over `PMGHierarchy` / `DistPMG` / `GridPMG` via
`solvers.shardwrap`: the advection contraction along a sharded axis is
interface-partial exactly like the stiffness term and rides the same
per-axis ppermute exchange (`shardwrap.axis_exchanges`); the 1D
advection matrices are scale-free hence shard-invariant (one local
matrix per axis, replicated).

Beyond reference parity: the reference (Wells-Group/pmg-dolfinx) is
symmetric-Poisson-only (src/cg.hpp requires SPD).
"""

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.kron import axis_advection, kron_advection_terms
from .bicgstab import bicgstab_solve
from .pmg import v_cycle
from .shardwrap import (axis_exchanges, is_sharded, layout_converters,
                        shards_of, vector_spec, wrap_program)


def _make_program(hier, lin_maxiter):
    ops = hier._ops
    levels = hier.levels
    fine = levels[-1]
    coarse, coarse_cfg = hier.coarse, hier.coarse_cfg
    precision = getattr(hier, "precision", "highest")
    exchanges = axis_exchanges(hier)

    def run(data, bw, u0, Cs, cvel, rtol):
        lv = data["levels"][-1]
        ms = (lv["mx"], lv["my"], lv["mz"])

        def A(x):
            yd = ops["apply"](lv, x, fine)  # diffusion+sigma, bc epilogue
            w = jnp.where(lv["bc_marker"], jnp.zeros_like(x), x)
            adv = kron_advection_terms(w, Cs, ms, cvel,
                                       precision=precision,
                                       exchanges=exchanges)
            return jnp.where(lv["bc_marker"], x, yd + adv)

        M = lambda r: v_cycle(
            data, r, ops["pvary"](jnp.zeros_like(r)),
            levels=levels, coarse=coarse, coarse_cfg=coarse_cfg, ops=ops,
        )
        return bicgstab_solve(
            A, bw, u0, M, rtol=rtol, maxiter=lin_maxiter,
            dot=lambda a, c: ops["dot"](a, c, lv),
        )

    vspec = vector_spec(hier) if is_sharded(hier) else None
    return wrap_program(
        hier, run,
        in_specs=(hier.data_specs, vspec, vspec, (P(), P(), P()), P(), P())
        if vspec else None,
        out_specs=(vspec, dict(niter=P(), rnorm=P(), rnorm0=P())),
    )


def convdiff_solve(hier, b, velocity, *, rtol=1e-8, maxiter=200, u0=None):
    """Solve the convection-diffusion system whose symmetric part is
    ``hier``'s fine-level operator (kappa diffusion + optional sigma
    shift) and whose advection velocity is the constant 3-vector
    ``velocity``.

    ``hier`` must be built with ``operator='kron'`` (the advection terms
    reuse the level's per-axis stiffness/mass data; box meshes —
    the same family the kron diffusion backend covers, graded spacing
    included since the 1D advection matrix is scale-free).

    Returns ``(u, info)``; ``info = dict(niter, rel_resid)`` from the
    preconditioned BiCGStab loop (one jitted — shard_map'd when sharded
    — while_loop program).
    """
    if getattr(hier, "operator_kind", None) != "kron":
        raise ValueError(
            "convdiff_solve needs a hierarchy built with operator='kron' "
            f"(got {getattr(hier, 'operator_kind', None)!r}): the "
            "advection terms ride the kron level data (per-axis masses)")
    dtype = hier.dtype
    fine = hier.levels[-1]
    shards = shards_of(hier)
    Cs = tuple(
        jnp.asarray(axis_advection(hier.mesh.nc[a] // shards[a], fine.P),
                    dtype=dtype)
        for a in range(3)
    )
    cvel = jnp.asarray(np.asarray(velocity, dtype=np.float64), dtype=dtype)
    if cvel.shape != (3,):
        raise ValueError(f"velocity must be a 3-vector, got {cvel.shape}")

    key = int(maxiter)
    cache = getattr(hier, "_convdiff_cache", None)
    if cache is None:
        cache = hier._convdiff_cache = {}
    if key not in cache:
        cache[key] = _make_program(hier, key)
    run = cache[key]

    to_w, from_w = layout_converters(hier)
    bw = to_w(np.asarray(b, dtype=dtype))
    uw = jnp.zeros_like(bw) if u0 is None else to_w(np.asarray(u0, dtype=dtype))
    u, info = run(hier.data, bw, uw, Cs, cvel,
                  jnp.asarray(rtol, dtype=dtype))
    rel = float(np.sqrt(float(info["rnorm"]) / max(float(info["rnorm0"]),
                                                   np.finfo(np.float64).tiny)))
    return from_w(u), dict(niter=int(info["niter"]), rel_resid=rel)
