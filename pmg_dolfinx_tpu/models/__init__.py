"""Problem definitions ("models"): the PDEs the framework solves.

The reference defines exactly one model — the constant-coefficient Poisson
problem ``-div(kappa grad u) = f`` with homogeneous Dirichlet BCs on the
unit cube (examples/*/poisson.py UFL forms; SURVEY.md L7) — with the
manufactured solution ``u = sin(pi x) sin(pi y) sin(pi z)`` used for
validation (python_tests/pmg.py:70).
"""

from .poisson import PoissonProblem, fit_box_cells
