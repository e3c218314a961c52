"""Distributed Fast Diagonalization: the exact direct solver under shard_map.

The single-device FDM (`solvers/fdm.py`) is six per-axis dense matmuls
plus a pointwise division. Distributing it is a data-LAYOUT problem, not
an algorithm problem: a transform along a sharded lattice axis needs that
axis resident on one device. The TPU-native answer is the pencil
transpose of parallel spectral codes (3D-FFT style), expressed as
`jax.lax.all_to_all` over the device-mesh axis that shards the lattice
axis:

    for each SHARDED lattice axis a (per transform sweep):
      1. zero-pad a "buddy" lattice axis to a multiple of the shard
         count, split it, and all_to_all over a's mesh axis concatenating
         along a  ->  axis a is now globally resident on every shard, the
         buddy axis is 1/n as long: memory stays O(N/n) throughout;
      2. drop the duplicated interface planes (the received windows
         overlap by one plane — the layout invariant of `SlabPartition`
         / `GridPartition`) with a static slice+concat;
      3. contract the full-size per-axis eigenvector matrix on the MXU;
      4. re-insert the duplicated planes and all_to_all back.

Unsharded axes are plain local einsums, identical to `fdm_solve`. The
eigenvalue-sum reciprocal `dinv` lives in the ordinary duplicated-plane
layout (a pointwise multiply between the forward and backward sweeps),
and the per-axis transforms use BOUNDARY-EMBEDDED matrices (zero rows /
columns at the Dirichlet end planes) so every shard runs the same static
program whether or not it holds a global boundary plane. Results match
the single-device `fdm_solve` to f64 roundoff: the embedded zero rows
only add exact-zero terms to the same dot products.

Communication: 2 all_to_alls per sharded axis per sweep — at most 12 per
solve, each moving N/n elements over ICI. The alternative used by every
other global coarse solver (`coarse_gather`: all_gather + redundant
solve + slice) replicates the whole problem onto every shard; this is
the scalable form, and it completes the gather-free story of the
distributed (dist=True) h-MG hierarchies, whose bottom solve was the one
remaining gathering step. Reference analogue: the coarse KSP/AMG solve
running under any rank layout (/root/reference/src/amg.hpp:67-113) —
except this one is exact, direct, and never gathers.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from ..fem.assembly import resolve_kappa_axes
from ..solvers.fdm import _axis_eig

# Per-axis contraction strings, identical to solvers.fdm.fdm_solve.
_AXIS_EINSUM = ("ax,xyz->ayz", "by,xyz->xbz", "cz,xyz->xyc")


def _embed_boundary(V, ends=(True, True)):
    """Free-node matrix -> full-size with zero rows/cols at the
    Dirichlet-flagged ends (natural-Neumann ends are free nodes)."""
    n = V.shape[0]
    lo, hi = int(ends[0]), int(ends[1])
    M = np.zeros((n + lo + hi, n + lo + hi), dtype=V.dtype)
    M[lo:lo + n, lo:lo + n] = V
    return M


def _dedup(x, dim, n_sh, npl):
    """Concat of n_sh duplicated-plane windows -> global axis.

    Window s covers global planes ``[s*(npl-1), s*(npl-1)+npl)``; drop
    each window's last plane except the final window's.
    """
    parts = [
        jax.lax.slice_in_dim(x, s * npl, s * npl + npl - 1, axis=dim)
        for s in range(n_sh - 1)
    ]
    parts.append(
        jax.lax.slice_in_dim(x, (n_sh - 1) * npl, n_sh * npl, axis=dim)
    )
    return jnp.concatenate(parts, axis=dim)


def _redup(x, dim, n_sh, npl):
    """Global axis -> concat of n_sh duplicated-plane windows."""
    parts = [
        jax.lax.slice_in_dim(
            x, s * (npl - 1), s * (npl - 1) + npl, axis=dim
        )
        for s in range(n_sh)
    ]
    return jnp.concatenate(parts, axis=dim)


def _transform_sharded(x, M, dim, axis_name, n_sh, precision):
    """Per-axis transform along a sharded lattice axis: transpose in
    (all_to_all), dedup, contract, redup, transpose out."""
    npl = x.shape[dim]
    # Buddy = the longest other LOCAL axis (least relative zero-padding).
    buddy = max(
        (d for d in range(3) if d != dim), key=lambda d: (x.shape[d], -d)
    )
    pad = (-x.shape[buddy]) % n_sh
    if pad:
        widths = [(0, 0)] * 3
        widths[buddy] = (0, pad)
        x = jnp.pad(x, widths)
    x = jax.lax.all_to_all(
        x, axis_name, split_axis=buddy, concat_axis=dim, tiled=True
    )
    x = _dedup(x, dim, n_sh, npl)
    x = jnp.einsum(_AXIS_EINSUM[dim], M, x, precision=precision)
    x = _redup(x, dim, n_sh, npl)
    x = jax.lax.all_to_all(
        x, axis_name, split_axis=dim, concat_axis=buddy, tiled=True
    )
    if pad:
        x = jax.lax.slice_in_dim(x, 0, x.shape[buddy] - pad, axis=buddy)
    return x


def _axis_transform(x, M, dim, spec, precision):
    if spec is None:  # lattice axis unsharded: plain local contraction
        return jnp.einsum(_AXIS_EINSUM[dim], M, x, precision=precision)
    axis_name, n_sh = spec
    return _transform_sharded(x, M, dim, axis_name, n_sh, precision)


def fdm_solve_dist(fd, b, local_shape, axes_spec, precision="highest"):
    """Shard-local exact solve ``u = A^{-1} b`` (shape-preserving).

    ``fd``: device dict from `make_fdm_dist` (embedded per-axis
    eigenvector matrices replicated, ``dinv``/``bc`` in the
    duplicated-plane layout). ``axes_spec``: per lattice axis, either
    ``None`` (unsharded) or ``(mesh_axis_name, n_shards)``. ``b`` may be
    flat or lattice-shaped; the output matches, with ``u[bc] = b[bc]``
    identity rows like every backend.
    """
    x = b.reshape(local_shape)
    for dim, M in enumerate((fd["Vxt"], fd["Vyt"], fd["Vzt"])):
        x = _axis_transform(x, M, dim, axes_spec[dim], precision)
    x = x * fd["dinv"]
    for dim, M in enumerate((fd["Vx"], fd["Vy"], fd["Vz"])):
        x = _axis_transform(x, M, dim, axes_spec[dim], precision)
    u = x.reshape(jnp.shape(b))
    return jnp.where(fd["bc"].reshape(jnp.shape(b)), b, u)


def make_fdm_dist(mesh, Pdeg, part, axes_spec, lat_spec, kappa, dtype,
                  precision="highest", sigma=0.0):
    """Build the distributed-FDM bundle for one partition layout.

    ``part`` is a `SlabPartition` or `GridPartition` (anything with
    ``to_dist(P, u)`` and ``local_shape(P)``), ``axes_spec`` the
    per-lattice-axis ``(mesh_axis_name, n_shards) | None`` tuple, and
    ``lat_spec`` the PartitionSpec of lattice-shaped arrays in that
    layout (``P('x')`` on the slab, ``P('x','y','z')`` on grids).

    Returns ``(data, spec, solve)``: device arrays, their PartitionSpec
    tree, and ``solve(fd, b_local)`` — the shard_map-resident hook wired
    into `v_cycle` as ``ops['fdm_dist']`` (or called directly for a
    whole-problem direct solve).
    """
    from ..fem.mesh import require_axis_aligned

    from ..ops.kron import robin_axis_ends

    require_axis_aligned(mesh, "distributed FDM")
    faces = getattr(mesh, "dirichlet_faces", ((True, True),) * 3)
    kx, ky, kz = resolve_kappa_axes(mesh, kappa)
    Vs, lams = [], []
    for a, (nc_a, h_a, ends, k_a) in enumerate(
            zip(mesh.nc, mesh.h_cells, faces, (kx, ky, kz))):
        # Robin end terms ride the kappa-free 1D eigenproblem with the
        # 1/k_a pre-divide (d sums k_a * lam — same fold as fdm.py).
        V, lam = _axis_eig(nc_a, Pdeg, h_a, ends=ends,
                           robin=robin_axis_ends(mesh, a, 1.0 / k_a))
        Vs.append(V)
        lams.append(lam)
    dmin = (kx * float(lams[0].min()) + ky * float(lams[1].min())
            + kz * float(lams[2].min())) + float(sigma)
    if dmin <= 1e-14:
        raise ValueError(
            "distributed FDM: singular operator (no Dirichlet face and "
            "sigma=0 leaves the constant nullspace); add a Dirichlet "
            "face or a positive sigma shift"
        )
    # Dirichlet slots carry eigenvalue 1.0: the embedded transforms zero
    # those rows, so the value is arbitrary — it only must keep 1/d
    # finite.
    le = []
    for lam, ends in zip(lams, faces):
        lo, hi = int(ends[0]), int(ends[1])
        e = np.ones(lam.shape[0] + lo + hi)
        e[lo:lo + lam.shape[0]] = lam
        le.append(e)
    d = (
        kx * le[0][:, None, None]
        + ky * le[1][None, :, None]
        + kz * le[2][None, None, :]
    ) + float(sigma)
    bc = np.asarray(mesh.boundary_dof_marker(Pdeg), dtype=np.float64)
    data = dict(
        Vx=jnp.asarray(_embed_boundary(Vs[0], faces[0]), dtype=dtype),
        Vy=jnp.asarray(_embed_boundary(Vs[1], faces[1]), dtype=dtype),
        Vz=jnp.asarray(_embed_boundary(Vs[2], faces[2]), dtype=dtype),
        Vxt=jnp.asarray(_embed_boundary(Vs[0].T, faces[0]), dtype=dtype),
        Vyt=jnp.asarray(_embed_boundary(Vs[1].T, faces[1]), dtype=dtype),
        Vzt=jnp.asarray(_embed_boundary(Vs[2].T, faces[2]), dtype=dtype),
        dinv=jnp.asarray(part.to_dist(Pdeg, 1.0 / d), dtype=dtype),
        bc=jnp.asarray(part.to_dist(Pdeg, bc)) > 0.5,
    )
    spec = dict(
        Vx=P(), Vy=P(), Vz=P(), Vxt=P(), Vyt=P(), Vzt=P(),
        dinv=lat_spec, bc=lat_spec,
    )
    solve = partial(
        fdm_solve_dist,
        local_shape=tuple(part.local_shape(Pdeg)),
        axes_spec=tuple(axes_spec),
        precision=precision,
    )
    return data, spec, solve


def dist_layout(mesh, shards, devices=None):
    """Resolve ``shards`` (int = x-slab, 3-tuple = device grid) to the
    layout quadruple ``(part, jmesh, axes_spec, lat_spec)`` shared by
    `DistFDM` and the forward-apply bundles."""
    from jax.sharding import Mesh

    if np.ndim(shards) == 0:
        from .dist import AXIS, make_mesh
        from .partition import SlabPartition

        n = int(shards)
        part = SlabPartition(mesh, n)
        jmesh = make_mesh(n, devices=devices)
        axes_spec = ((AXIS, n) if n > 1 else None, None, None)
        lat_spec = P(AXIS)
    else:
        from .grid2d import AXES, GridPartition, _norm_shards

        sh = _norm_shards(shards)
        part = GridPartition(mesh, sh)
        devices = (devices if devices is not None
                   else jax.devices()[: int(np.prod(sh))])
        jmesh = Mesh(np.array(devices).reshape(sh), AXES)
        axes_spec = tuple(
            (AXES[a], sh[a]) if sh[a] > 1 else None for a in range(3)
        )
        lat_spec = P(*AXES)
    return part, jmesh, axes_spec, lat_spec


def make_fdm_apply_dist(mesh, Pdeg, part, axes_spec, lat_spec, kappa,
                        dtype, precision="highest", sigma=0.0):
    """FORWARD operator bundle: ``A = (⊗ M V) diag(d) (⊗ V^T M)`` with
    ``V^T M V = I`` — the same pencil-transpose machinery as the solve,
    with mass-weighted eigenvector matrices and the NON-inverted
    eigenvalue sums. Returns ``(data, spec, apply)`` where ``apply(fd,
    x_local)`` IS `fdm_solve_dist` on the alternative data (identical
    loop; the boundary-embedded zero rows/cols give the operator's
    mask-in/identity-row convention via the same epilogue). Used by the
    sharded explicit (leapfrog) wave stepping — the one distributed
    transient path that needs a forward apply.
    """
    from ..fem.mesh import require_axis_aligned
    from ..ops.kron import axis_stiffness_mass, robin_axis_ends

    require_axis_aligned(mesh, "distributed FDM apply")
    faces = getattr(mesh, "dirichlet_faces", ((True, True),) * 3)
    kx, ky, kz = resolve_kappa_axes(mesh, kappa)
    Ws, Wts, lams = [], [], []
    for a, (nc_a, h_a, ends, k_a) in enumerate(
            zip(mesh.nc, mesh.h_cells, faces, (kx, ky, kz))):
        rob = robin_axis_ends(mesh, a, 1.0 / k_a)
        V, lam = _axis_eig(nc_a, Pdeg, h_a, ends=ends, robin=rob)
        _, m = axis_stiffness_mass(nc_a, Pdeg, h_a, robin=rob)
        lo = 1 if ends[0] else 0
        hi = -1 if ends[1] else None
        mi = m[lo:hi]
        Ws.append(mi[:, None] * V)
        Wts.append(V.T * mi[None, :])
        lams.append(lam)
    le = []
    for lam, ends in zip(lams, faces):
        lo, hi = int(ends[0]), int(ends[1])
        e = np.zeros(lam.shape[0] + lo + hi)  # embedded slots never mix in
        e[lo:lo + lam.shape[0]] = lam
        le.append(e)
    d = (
        kx * le[0][:, None, None]
        + ky * le[1][None, :, None]
        + kz * le[2][None, None, :]
    ) + float(sigma)
    bc = np.asarray(mesh.boundary_dof_marker(Pdeg), dtype=np.float64)
    data = dict(
        Vx=jnp.asarray(_embed_boundary(Ws[0], faces[0]), dtype=dtype),
        Vy=jnp.asarray(_embed_boundary(Ws[1], faces[1]), dtype=dtype),
        Vz=jnp.asarray(_embed_boundary(Ws[2], faces[2]), dtype=dtype),
        Vxt=jnp.asarray(_embed_boundary(Wts[0], faces[0]), dtype=dtype),
        Vyt=jnp.asarray(_embed_boundary(Wts[1], faces[1]), dtype=dtype),
        Vzt=jnp.asarray(_embed_boundary(Wts[2], faces[2]), dtype=dtype),
        dinv=jnp.asarray(part.to_dist(Pdeg, d), dtype=dtype),
        bc=jnp.asarray(part.to_dist(Pdeg, bc)) > 0.5,
    )
    spec = dict(
        Vx=P(), Vy=P(), Vz=P(), Vxt=P(), Vyt=P(), Vzt=P(),
        dinv=lat_spec, bc=lat_spec,
    )
    apply_fn = partial(
        fdm_solve_dist,
        local_shape=tuple(part.local_shape(Pdeg)),
        axes_spec=tuple(axes_spec),
        precision=precision,
    )
    return data, spec, apply_fn


class DistFDM:
    """Whole-problem distributed direct solver (constant / per-axis
    diagonal kappa, axis-aligned box).

    The sharded counterpart of `solvers.fdm.FastDiagonalizationSolver`:
    ``shards`` is an int (x-slab layout) or a 3-tuple (multi-axis grid
    layout); the solve is ONE jitted shard_map program — six per-axis
    contractions with pencil transposes on the sharded axes.
    """

    def __init__(self, mesh, Pdeg, shards, kappa=2.0, dtype=jnp.float32,
                 precision="highest", sigma=0.0, devices=None):
        from jax.sharding import NamedSharding

        from .multihost import put_global

        self.mesh = mesh
        self.P = int(Pdeg)
        self.dtype = dtype
        self.part, self.jmesh, axes_spec, lat_spec = dist_layout(
            mesh, shards, devices=devices)
        data, spec, solve = make_fdm_dist(
            mesh, self.P, self.part, axes_spec, lat_spec, kappa, dtype,
            precision=precision, sigma=sigma,
        )
        with self.jmesh:
            self.data = jax.tree.map(
                lambda a, s: put_global(a, NamedSharding(self.jmesh, s)),
                data, spec,
            )
        self._lat_spec = lat_spec
        self._axes_spec = tuple(axes_spec)
        self._spec = spec
        self._solve_local = solve  # shard_map-resident hook (fd, b_local)
        self._solve = jax.jit(
            jax.shard_map(
                solve,
                mesh=self.jmesh,
                in_specs=(spec, lat_spec),
                out_specs=lat_spec,
            )
        )

    def to_dist(self, u):
        from jax.sharding import NamedSharding

        from .multihost import put_global

        ud = self.part.to_dist(self.P, np.asarray(u))
        return put_global(
            np.asarray(ud, dtype=self.dtype),
            NamedSharding(self.jmesh, self._lat_spec),
        )

    def from_dist(self, ud):
        from .multihost import fetch_global

        return self.part.from_dist(self.P, fetch_global(ud))

    def solve(self, b):
        """Global rhs in, global solution out (exact, one application)."""
        return self.from_dist(self._solve(self.data, self.to_dist(b)))
