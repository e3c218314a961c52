"""Semilinear reaction-diffusion models:

    -div(kappa grad u) + sigma u + N(u) = f      on the unit cube,
    u = 0 on Dirichlet faces,

with a pointwise nonlinearity ``N`` (collocated at the GLL nodes, so the
discrete nonlinear term is ``m3 * N(u)`` with the lumped mass ``m3`` —
exactly the mechanism the linear shifted family already uses for
``sigma * m3 * u``). Solved by the inexact Newton loop in
`solvers.newton` with the framework's own V-cycle as the (lagged)
preconditioner of every linear step.

This is a beyond-parity family: the reference (Wells-Group/pmg-dolfinx)
has no nonlinear capability — its single model is the linear Poisson
form (examples/pmg/poisson.py). The manufactured solutions reuse the
reference's ``u_e = sin(pi x) sin(pi y) sin(pi z)``
(python_tests/pmg.py:69-70) so the linear and semilinear families are
directly comparable.
"""

from dataclasses import dataclass
from typing import Callable

import numpy as np
import jax.numpy as jnp

from .poisson import u_exact


@dataclass(frozen=True)
class Nonlinearity:
    """A pointwise nonlinearity ``N`` and its derivative ``N'``.

    ``N``/``dN`` must be jnp-traceable (used inside jitted Newton steps);
    ``N_np`` is the NumPy twin for manufactured right-hand sides and the
    float64 host oracle.
    """

    name: str
    N: Callable
    dN: Callable
    N_np: Callable
    dN_np: Callable


def cubic(c: float = 1.0) -> Nonlinearity:
    """``N(u) = c u^3`` — the classic monotone semilinear test problem
    (the discrete system stays SPD-Jacobian for c >= 0, so plain Newton
    with an SPD-preconditioned FCG inner solve is provably safe)."""
    c = float(c)
    return Nonlinearity(
        name=f"cubic(c={c:g})",
        N=lambda u: c * u * u * u,
        dN=lambda u: 3.0 * c * u * u,
        N_np=lambda u: c * u**3,
        dN_np=lambda u: 3.0 * c * u**2,
    )


def bratu(lam: float = 1.0) -> Nonlinearity:
    """Bratu–Gelfand: ``-lap u - lam e^u = 0`` i.e. ``N(u) = -lam e^u``.

    The canonical nonlinear benchmark. The Jacobian ``A - lam e^u M`` is
    SPD only below the fold point (lam* ~ 6.8 on the 3D unit cube); keep
    lam moderate for the FCG inner solver. ``f = 0``, u = 0 on the
    boundary; the solution is positive in the interior.
    """
    lam = float(lam)
    return Nonlinearity(
        name=f"bratu(lam={lam:g})",
        N=lambda u: -lam * jnp.exp(u),
        dN=lambda u: -lam * jnp.exp(u),
        N_np=lambda u: -lam * np.exp(u),
        dN_np=lambda u: -lam * np.exp(u),
    )


def f_rhs_semilinear(kappa: float, nonlin: Nonlinearity, sigma: float = 0.0):
    """Manufactured source for ``-kappa lap u + sigma u + N(u) = f`` with
    ``u_e = sin(pi x) sin(pi y) sin(pi z)``:

        f = (3 pi^2 kappa + sigma) u_e + N(u_e).
    """

    def f(x):
        ue = u_exact(x)
        return (3.0 * np.pi**2 * kappa + sigma) * ue + nonlin.N_np(ue)

    return f
