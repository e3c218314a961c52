"""Preconditioned BiCGStab for nonsymmetric operators.

The convection-diffusion family's Krylov loop (van der Vorst 1992, the
standard right-preconditioned form: the preconditioner is applied to the
search direction ``p`` and the stabilizer ``s``). The framework's CG/FCG
(solvers/cg.py) require symmetry; advection breaks it. The whole solve
is one jittable while_loop, generic over the ``dot`` so it runs
unchanged inside the shard_map'd distributed programs (psum dots).

Beyond reference parity: the reference (Wells-Group/pmg-dolfinx) has
only symmetric operators and CG (src/cg.hpp).
"""

import jax
import jax.numpy as jnp

from .cg import _safe_div, _default_dot


def bicgstab_solve(A, b, x0, M, *, rtol=1e-8, maxiter=200,
                   dot=_default_dot):
    """Solve ``A x = b`` with preconditioner ``M`` (``r -> z``, e.g. a
    V-cycle on the symmetric part of ``A``).

    Returns ``(x, info)`` with ``info = dict(niter, rnorm, rnorm0)``
    tracking the TRUE residual 2-norm squared. Convergence:
    ``|r| <= rtol |b|``. Breakdown-safe divisions (zero denominators
    yield zero updates, matching `solvers.cg`).
    """
    r = b - A(x0)
    rhat = r  # shadow residual, fixed
    rnorm0 = dot(b, b)
    rho = dot(rhat, r)
    rtol2 = rtol * rtol

    def cond(state):
        k, x, r, p, v, rho, alpha, omega, rnorm, done = state
        return jnp.logical_and(k < maxiter, jnp.logical_not(done))

    def body(state):
        k, x, r, p, v, rho, alpha, omega, rnorm, _ = state
        ph = M(p)
        v = A(ph)
        alpha = _safe_div(rho, dot(rhat, v))
        s = r - alpha * v
        sh = M(s)
        t = A(sh)
        omega = _safe_div(dot(t, s), dot(t, t))
        x = x + alpha * ph + omega * sh
        r_new = s - omega * t
        rnorm = dot(r_new, r_new)
        done = rnorm <= rtol2 * rnorm0
        rho_new = dot(rhat, r_new)
        beta = _safe_div(rho_new, rho) * _safe_div(alpha, omega)
        p = r_new + beta * (p - omega * v)
        return k + 1, x, r_new, p, v, rho_new, alpha, omega, rnorm, done

    one = jnp.ones_like(rho)
    state = (0, x0, r, r, jnp.zeros_like(r), rho, one, one,
             dot(r, r), dot(r, r) <= rtol2 * rnorm0)
    k, x, r, p, v, rho, alpha, omega, rnorm, done = jax.lax.while_loop(
        cond, body, state)
    return x, dict(niter=k, rnorm=rnorm, rnorm0=rnorm0)
