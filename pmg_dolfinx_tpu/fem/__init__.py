"""FEM infrastructure: 1D GLL elements, structured hex meshes, geometry.

Replaces the reference's Basix/DOLFINx dependency (SURVEY.md §2.5): GLL
nodes/weights and Lagrange tabulation (basix quadrature + gll_warped
elements), tensor-product dofmaps on structured box meshes (dolfinx
mesh/dofmap), and the per-quadrature-point geometry factor G
(src/precompute.hpp, src/laplacian.hpp geometry_computation).
"""

from .gll import (
    gauss_legendre,
    gauss_lobatto,
    lagrange_tabulate,
    derivative_matrix,
)
from .mesh import BoxMesh, PerturbedBoxMesh, geometric_spacing
