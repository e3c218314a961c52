"""Slab partition of the structured box mesh for SPMD execution.

Replaces the reference's mesh partitioning + ghost-layer machinery
(DOLFINx partitioner + `ghost_layer_mesh`, src/mesh.hpp:17-98, and the
owned/ghost IndexMap layout of `acc::Vector`, src/vector.hpp:83-96) with
a closed-form decomposition the structured lattice makes trivial:

- cells are split into ``n_shards`` contiguous slabs along the x axis
  (cell ordering is x-slowest, so slabs are contiguous cell ranges);
- each shard stores the dof planes of its own cells *including* the
  interface plane shared with the right neighbour — interface planes are
  duplicated on both shards (the "ghost" layer, one plane deep);
- the invariant maintained by all operations is that duplicated planes
  hold identical values; cell-scatter operations produce partial sums on
  them which are reconciled by a neighbour `ppermute` exchange.

Ownership for reductions: every shard owns its planes ``[0, cpd*P)``;
the last shard additionally owns its final plane. A weight mask makes
global dot products exact despite duplication.
"""

import numpy as np

from ..fem.mesh import BoxMesh


def duplicate_planes(mg: np.ndarray, npl: int, n_shards: int) -> np.ndarray:
    """Global per-plane axis array -> duplicated-plane layout.

    Each shard's ``npl`` planes start at ``s*(npl-1)``: the interface
    plane shared with the right neighbour appears on BOTH shards (the
    layout invariant documented above). Used for the global axis-mass
    vectors of every distributed kron-family level.
    """
    return np.concatenate(
        [mg[s * (npl - 1): s * (npl - 1) + npl] for s in range(n_shards)]
    )


class SlabPartition:
    """Static partition data for ``mesh`` split into ``n_shards`` x-slabs."""

    def __init__(self, mesh: BoxMesh, n_shards: int):
        self.mesh = mesh
        self.n_shards = int(n_shards)
        nx = mesh.nc[0]
        if nx % self.n_shards != 0:
            raise ValueError(
                f"nx={nx} must be divisible by n_shards={self.n_shards} "
                "(pick the mesh with fit_box_cells(..., multiple=n_shards))"
            )
        self.cells_per_shard_x = nx // self.n_shards
        self.ncells_local = self.cells_per_shard_x * mesh.nc[1] * mesh.nc[2]

    # -- per-degree local layout ---------------------------------------

    def local_planes(self, P: int) -> int:
        """Number of x-planes stored per shard (owned + 1 shared)."""
        return self.cells_per_shard_x * P + 1

    def axis_starts(self, P: int):
        """Per-shard x-plane starts + local plane count of the
        duplicated-plane layout (the slab twin of
        `GridPartition._axis_starts`)."""
        npl = self.local_planes(P)
        return [s * (npl - 1) for s in range(self.n_shards)], npl

    def local_shape(self, P: int):
        _, NY, NZ = self.mesh.lattice_shape(P)
        return (self.local_planes(P), NY, NZ)

    def local_ndofs(self, P: int) -> int:
        npl, NY, NZ = self.local_shape(P)
        return npl * NY * NZ

    def local_dofmap(self, P: int) -> np.ndarray:
        """Cell dofmap of ONE slab in local-lattice flat indices.

        Identical for every shard (the slab geometry repeats), so it is
        passed replicated — the analogue of the reference uploading the
        per-rank dofmap to each GPU (examples/pmg/main.cpp:199-207).
        """
        sub = BoxMesh(
            (self.cells_per_shard_x, self.mesh.nc[1], self.mesh.nc[2]),
            extent=(1.0, 1.0, 1.0),  # only connectivity matters here
        )
        return sub.dofmap(P)

    # -- global <-> distributed layout ---------------------------------

    def to_dist(self, P: int, u: np.ndarray) -> np.ndarray:
        """Expand a global dof vector into the duplicated slab layout.

        Returns shape ``(n_shards * local_planes, NY, NZ)`` — shard axis 0
        with `jax.sharding` puts one slab (with its duplicated interface
        plane) on each device.
        """
        NX, NY, NZ = self.mesh.lattice_shape(P)
        lat = np.asarray(u).reshape(NX, NY, NZ)
        npl = self.local_planes(P)
        shards = [
            lat[s * (npl - 1): s * (npl - 1) + npl]
            for s in range(self.n_shards)
        ]
        return np.concatenate(shards, axis=0)

    def from_dist(self, P: int, ud: np.ndarray) -> np.ndarray:
        """Collapse the duplicated layout back to the global flat vector."""
        NX, NY, NZ = self.mesh.lattice_shape(P)
        npl = self.local_planes(P)
        ud = np.asarray(ud).reshape(self.n_shards, npl, NY, NZ)
        parts = [ud[s, :-1] for s in range(self.n_shards - 1)] + [ud[-1]]
        return np.concatenate(parts, axis=0).reshape(NX * NY * NZ)

    def ownership_weights(self, P: int) -> np.ndarray:
        """Per-entry weights making dots over the duplicated layout exact."""
        npl, NY, NZ = self.local_shape(P)
        w = np.ones((self.n_shards, npl, NY, NZ))
        w[:-1, -1] = 0.0  # duplicated interface plane counted on the owner
        return w.reshape(self.n_shards * npl, NY, NZ)

    def cell_slab_slices(self):
        """Global cell index ranges per shard (cells are slab-contiguous)."""
        return [
            slice(s * self.ncells_local, (s + 1) * self.ncells_local)
            for s in range(self.n_shards)
        ]
