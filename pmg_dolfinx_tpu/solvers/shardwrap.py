"""Shared plumbing for solver programs that are generic over the three
hierarchy classes (`PMGHierarchy` single-device, `DistPMG` 1D slab,
`GridPMG` 2D/3D device grid).

The classes expose identical protocol pieces (``data`` pytree +
``data_specs``, cycle-ops dict, ``to_dist``/``_to_work`` layout
converters); a new whole-solve program (Newton step, BiCGStab loop, ...)
only differs in whether it is wrapped in ``shard_map`` and which
PartitionSpecs its vectors carry. These helpers centralize that.
"""

import jax
from jax.sharding import PartitionSpec as P


def is_sharded(hier):
    return hasattr(hier, "jmesh")


def vector_spec(hier):
    """The shard_map PartitionSpec of a fine-level vector — identical to
    the spec of the level's ``bc_marker``, which every backend carries
    (lattice-shaped for the kron family, flat for general backends)."""
    return hier.data_specs["levels"][-1]["bc_marker"]


def wrap_program(hier, fn, in_specs=None, out_specs=None):
    """``jit(fn)`` on a single device, ``jit(shard_map(fn))`` on the
    sharded classes — the same wrapping the classes use for their own
    solve programs (e.g. `DistPMG.solve_pcg`)."""
    if is_sharded(hier):
        fn = jax.shard_map(fn, mesh=hier.jmesh,
                           in_specs=in_specs, out_specs=out_specs)
    return jax.jit(fn)


def layout_converters(hier):
    """(to_work, from_work): global flat host vector <-> the class's
    working layout (lattice-shaped / duplicated-plane sharded)."""
    if is_sharded(hier):
        return hier.to_dist, hier.from_dist
    return hier._to_work, hier._from_work


def shards_of(hier):
    """Per-axis shard counts of the dof lattice: (1,1,1) single device,
    (n,1,1) on the x-slab, the device-grid shape on `GridPMG`."""
    if not is_sharded(hier):
        return (1, 1, 1)
    part = hier.part
    if hasattr(part, "shards"):
        return tuple(part.shards)
    return (part.n_shards, 1, 1)


def axis_exchanges(hier):
    """Per-axis interface partial-sum exchanges (``lat -> lat``; None on
    unsharded axes) for custom operator terms, matching the class's own
    apply: the slab's single-axis ppermute pair, the grid's per-axis
    pairs. A term contracted along axis ``a`` is shard-partial exactly
    at the duplicated a-interface planes and must be exchanged along
    that axis ONLY (pointwise factors are already consistent)."""
    shards = shards_of(hier)
    if not is_sharded(hier):
        return (None, None, None)
    if hasattr(hier.part, "shards"):
        from ..parallel.grid2d import AXES, _exchange_axis

        return tuple(
            (lambda t, a=a: _exchange_axis(t, shards[a], AXES[a], a))
            if shards[a] > 1 else None
            for a in range(3)
        )
    from ..parallel.dist import _exchange_partials

    n = shards[0]
    return ((lambda t: _exchange_partials(t, n)) if n > 1 else None,
            None, None)


REPLICATED = P()
