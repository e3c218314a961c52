"""2D device-mesh domain decomposition (x- and y-slabs) for the kron path.

The 1D slab partition (`parallel/dist.py`) caps the shard count at the
number of x-cells; production pods want 2D meshes. The Kronecker-sum
operator makes the 2D extension clean:

- the lattice is split into ``(sx, sy)`` pencils, duplicating interface
  planes along BOTH x and y (corner lines are duplicated 4x; ownership
  weights are the product of the per-axis masks, so reductions stay
  exact);
- the three operator terms are axis-separable: the K_x term is
  shard-partial only across x-interfaces, the K_y term only across
  y-interfaces, and the K_z term is complete locally — so one ppermute
  pair per sharded axis, applied to its own term, reconciles everything.
  NO corner/diagonal communication exists at all (compare: an MPI halo
  exchange on a 2D decomposition needs 8-neighbour corner messages);
- transfers: input weighted by the product ownership mask, local per-axis
  transposed matmuls, then the x-exchange followed by the y-exchange
  (linear, axiswise-independent — corners receive both and end complete).

Kron backend only (the production path); the general backends remain on
the 1D partition.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.mesh import BoxMesh
from ..solvers.cg import cg_solve
from ..solvers.pmg import (
    DEFAULT_CALIBRATION_ITERS,
    DEFAULT_CALIBRATION_RTOL,
    DEFAULT_SMOOTHER_ITERS,
    EIG_RANGE_FACTORS,
    Level,
    v_cycle,
)
from ..solvers.tridiag import lanczos_eigenvalue_estimates

AX, AY = "x", "y"


class GridPartition:
    """Static 2D (x, y) pencil partition with duplicated interface planes."""

    def __init__(self, mesh: BoxMesh, shards=(2, 2)):
        self.mesh = mesh
        self.sx, self.sy = int(shards[0]), int(shards[1])
        nx, ny = mesh.nc[0], mesh.nc[1]
        if nx % self.sx or ny % self.sy:
            raise ValueError(
                f"nc[0]={nx} / nc[1]={ny} must divide shards {shards}"
            )
        self.cpx, self.cpy = nx // self.sx, ny // self.sy

    def local_shape(self, Pdeg):
        NZ = self.mesh.lattice_shape(Pdeg)[2]
        return (self.cpx * Pdeg + 1, self.cpy * Pdeg + 1, NZ)

    def local_ndofs(self, Pdeg):
        a, b, c = self.local_shape(Pdeg)
        return a * b * c

    def _starts(self, Pdeg):
        nplx, nply, _ = self.local_shape(Pdeg)
        xs = [s * (nplx - 1) for s in range(self.sx)]
        ys = [s * (nply - 1) for s in range(self.sy)]
        return xs, ys, nplx, nply

    def to_dist(self, Pdeg, u):
        """Global flat vector -> duplicated 2D-pencil layout, shape
        ``(sx * nplx, sy * nply, NZ)`` (shardable with P('x','y'))."""
        NX, NY, NZ = self.mesh.lattice_shape(Pdeg)
        lat = np.asarray(u).reshape(NX, NY, NZ)
        xs, ys, nplx, nply = self._starts(Pdeg)
        rows = []
        for x0 in xs:
            cols = [lat[x0:x0 + nplx, y0:y0 + nply] for y0 in ys]
            rows.append(np.concatenate(cols, axis=1))
        return np.concatenate(rows, axis=0)

    def from_dist(self, Pdeg, ud):
        NX, NY, NZ = self.mesh.lattice_shape(Pdeg)
        xs, ys, nplx, nply = self._starts(Pdeg)
        ud = np.asarray(ud).reshape(self.sx, nplx, self.sy * nply, NZ)
        out = np.zeros((NX, NY, NZ), dtype=ud.dtype)
        for i, x0 in enumerate(xs):
            row = ud[i].reshape(nplx, self.sy, nply, NZ)
            for j, y0 in enumerate(ys):
                out[x0:x0 + nplx, y0:y0 + nply] = row[:, j]
        return out.reshape(-1)

    def ownership_weights(self, Pdeg):
        """Product of per-axis ownership masks (counts every dof once)."""
        nplx, nply, NZ = self.local_shape(Pdeg)
        wx = np.ones((self.sx, nplx))
        wx[:-1, -1] = 0.0
        wy = np.ones((self.sy, nply))
        wy[:-1, -1] = 0.0
        w = np.einsum("sa,tb->satb", wx, wy).reshape(
            self.sx * nplx, self.sy * nply
        )
        return np.repeat(w[:, :, None], NZ, axis=2)


def _exchange_axis(lat, n_shards, axis_name, dim):
    """Partial-sum reconciliation of duplicated planes along one lattice
    dim sharded over mesh axis ``axis_name`` (cf. dist._exchange_partials)."""
    if n_shards == 1:
        return lat
    fwd = [(i, i + 1) for i in range(n_shards - 1)]
    bwd = [(i + 1, i) for i in range(n_shards - 1)]
    if dim == 0:
        from_left = jax.lax.ppermute(lat[-1], axis_name, fwd)
        from_right = jax.lax.ppermute(lat[0], axis_name, bwd)
        return lat.at[0].add(from_left).at[-1].add(from_right)
    from_left = jax.lax.ppermute(lat[:, -1], axis_name, fwd)
    from_right = jax.lax.ppermute(lat[:, 0], axis_name, bwd)
    return lat.at[:, 0].add(from_left).at[:, -1].add(from_right)


def grid2d_kron_cycle_ops(sx, sy, precision="highest"):
    """V-cycle primitives on the 2D pencil partition (kron backend)."""
    from ..ops.kron import kron_laplacian_apply
    from ..ops.lattice import lattice_prolongate, lattice_restrict

    def apply_op(lv, x, level):
        nplx, nply, NZ = level.shape
        Ks = (lv["Kx"], lv["Ky"], lv["Kz"])
        ms = (lv["mx"], lv["my"], lv["mz"])
        # Axis-separable exchanges: the x-term via the hook, the y-term
        # reconciled afterwards (it is the only other partial term).
        xb = jnp.where(lv["bc_marker"], jnp.zeros_like(x), x).reshape(level.shape)
        t1 = jnp.einsum("ax,xyz->ayz", Ks[0], xb, precision=precision) * (
            ms[1][None, :, None] * ms[2][None, None, :]
        )
        t1 = _exchange_axis(t1, sx, AX, 0)
        t2 = jnp.einsum("by,xyz->xbz", Ks[1], xb, precision=precision) * (
            ms[0][:, None, None] * ms[2][None, None, :]
        )
        t2 = _exchange_axis(t2, sy, AY, 1)
        t3 = jnp.einsum("cz,xyz->xyc", Ks[2], xb, precision=precision) * (
            ms[0][:, None, None] * ms[1][None, :, None]
        )
        y = (t1 + t2 + t3).reshape(-1)
        return jnp.where(lv["bc_marker"], x, y)

    def restrict_op(tr, r, level_c, level_f):
        raw = lattice_restrict(
            r * tr["weights_f"], (tr["Ix"], tr["Iy"], tr["Iz"]),
            level_f.shape, precision,
        )
        lat = raw.reshape(level_c.shape)
        lat = _exchange_axis(lat, sx, AX, 0)
        lat = _exchange_axis(lat, sy, AY, 1)
        return lat.reshape(-1)

    def prolong_op(tr, u, level_c, level_f):
        return lattice_prolongate(
            u, (tr["Ix"], tr["Iy"], tr["Iz"]), level_c.shape, precision
        )

    def dot(u, v, lv):
        local = jnp.sum(u * v * lv["weights"])
        return jax.lax.psum(jax.lax.psum(local, AX), AY)

    def pvary(v):
        return jax.lax.pcast(v, (AX, AY), to="varying")

    return dict(apply=apply_op, restrict=restrict_op, prolong=prolong_op,
                dot=dot, pvary=pvary)


class GridPMG:
    """p-multigrid over a 2D (x, y) device mesh — kron backend.

    The 2D generalization of `DistPMG`: same duplicated-plane invariant
    per axis, axis-separable exchanges, everything inside one shard_map.
    Coarse solvers: 'cg' (default) or 'smoother'.
    """

    def __init__(self, mesh, shards=(2, 2), degrees=(1, 3), kappa=2.0,
                 dtype=jnp.float64, smoother_iters=DEFAULT_SMOOTHER_ITERS,
                 coarse="cg", coarse_cfg=None, devices=None,
                 calibration_iters=DEFAULT_CALIBRATION_ITERS,
                 precision="highest"):
        from ..fem.assembly import stiffness_diagonal_np
        from ..ops.kron import axis_stiffness_mass
        from ..ops.lattice import axis_interpolation_matrix

        self.part = GridPartition(mesh, shards)
        sx, sy = self.part.sx, self.part.sy
        devices = devices if devices is not None else jax.devices()[: sx * sy]
        self.jmesh = Mesh(np.array(devices).reshape(sx, sy), (AX, AY))
        self.mesh = mesh
        self.degrees = tuple(int(p) for p in degrees)
        self.kappa = float(kappa)
        self.dtype = dtype
        self.coarse = coarse
        self.coarse_cfg = dict(coarse_cfg or {})
        self.eigs = []
        part = self.part
        ops = grid2d_kron_cycle_ops(sx, sy, precision)
        self._ops = ops

        def dup_axis(vec, n_sh, npl):
            return np.concatenate(
                [vec[s * (npl - 1): s * (npl - 1) + npl] for s in range(n_sh)]
            )

        level_data, level_specs, levels = [], [], []
        with self.jmesh:
            for Pdeg in self.degrees:
                nplx, nply, NZ = part.local_shape(Pdeg)
                Kxl, _ = axis_stiffness_mass(part.cpx, Pdeg, mesh.h[0])
                Kyl, _ = axis_stiffness_mass(part.cpy, Pdeg, mesh.h[1])
                Kz, mz = axis_stiffness_mass(mesh.nc[2], Pdeg, mesh.h[2])
                _, mx_g = axis_stiffness_mass(mesh.nc[0], Pdeg, mesh.h[0])
                _, my_g = axis_stiffness_mass(mesh.nc[1], Pdeg, mesh.h[1])
                lv = dict(
                    Kx=jnp.asarray(self.kappa * Kxl, dtype=dtype),
                    Ky=jnp.asarray(self.kappa * Kyl, dtype=dtype),
                    Kz=jnp.asarray(self.kappa * Kz, dtype=dtype),
                    mx=jnp.asarray(dup_axis(mx_g, sx, nplx), dtype=dtype),
                    my=jnp.asarray(dup_axis(my_g, sy, nply), dtype=dtype),
                    mz=jnp.asarray(mz, dtype=dtype),
                    bc_marker=jnp.asarray(
                        part.to_dist(Pdeg, mesh.boundary_dof_marker(Pdeg)) > 0.5
                    ).reshape(-1),
                    weights=jnp.asarray(
                        part.ownership_weights(Pdeg), dtype=dtype
                    ).reshape(-1),
                    diag_inv=jnp.asarray(
                        part.to_dist(
                            Pdeg,
                            1.0 / stiffness_diagonal_np(mesh, Pdeg, self.kappa),
                        ),
                        dtype=dtype,
                    ).reshape(-1),
                )
                spec = dict(
                    Kx=P(), Ky=P(), Kz=P(), mx=P(AX), my=P(AY), mz=P(),
                    bc_marker=P(AX, AY), weights=P(AX, AY), diag_inv=P(AX, AY),
                )
                level = Level(P=Pdeg, ndofs=part.local_ndofs(Pdeg),
                              smoother_iters=smoother_iters,
                              shape=part.local_shape(Pdeg))
                # NOTE: flat local vectors; the sharded GLOBAL arrays are
                # 3D (sx*nplx, sy*nply, NZ) so both mesh axes shard. bc,
                # weights, diag_inv therefore stay 3D at rest and flatten
                # inside the kernel region.
                for k in ("bc_marker", "weights", "diag_inv"):
                    lv[k] = lv[k].reshape(sx * nplx, sy * nply, NZ)
                level_data.append(lv)
                level_specs.append(spec)
                levels.append(level)

            self.levels = tuple(levels)
            for lv, spec, level in zip(level_data, level_specs, levels):
                for k in lv:
                    lv[k] = jax.device_put(lv[k], NamedSharding(self.jmesh, spec[k]))

                def _calib(lv_, b_, x0_, _level=level):
                    lvf = {
                        k: (v.reshape(-1) if k in ("bc_marker", "weights",
                                                   "diag_inv") else v)
                        for k, v in lv_.items()
                    }
                    A = lambda x: ops["apply"](lvf, x, _level)
                    _, info = cg_solve(
                        A, b_.reshape(-1), x0_.reshape(-1), lvf["diag_inv"],
                        rtol=DEFAULT_CALIBRATION_RTOL,
                        maxiter=calibration_iters, record=True,
                        dot=lambda u, v: ops["dot"](u, v, lvf),
                    )
                    return info  # scalars only (replicated via psum dots)

                calib_fn = jax.jit(
                    jax.shard_map(
                        _calib, mesh=self.jmesh,
                        in_specs=(spec, P(AX, AY), P(AX, AY)),
                        out_specs=dict(
                            niter=P(), rnorm=P(), rnorm0=P(), alphas=P(),
                            betas=P(), residuals=P(), stored=P(),
                        ),
                    )
                )
                shape3 = (sx * level.shape[0], sy * level.shape[1],
                          level.shape[2])
                info = calib_fn(
                    lv,
                    jnp.ones(shape3, dtype=dtype),
                    jnp.zeros(shape3, dtype=dtype),
                )
                eigs = lanczos_eigenvalue_estimates(
                    info["alphas"], info["betas"], info["stored"]
                )
                self.eigs.append(eigs)
                lv["lmax"] = jax.device_put(
                    jnp.asarray(EIG_RANGE_FACTORS[1] * eigs[-1], dtype=dtype),
                    NamedSharding(self.jmesh, P()),
                )
                spec["lmax"] = P()

            transfer, transfer_specs = [], []
            for i in range(len(self.degrees) - 1):
                Pc, Pf = self.degrees[i], self.degrees[i + 1]
                tr = dict(
                    Ix=jnp.asarray(
                        axis_interpolation_matrix(part.cpx, Pc, Pf), dtype=dtype
                    ),
                    Iy=jnp.asarray(
                        axis_interpolation_matrix(part.cpy, Pc, Pf), dtype=dtype
                    ),
                    Iz=jnp.asarray(
                        axis_interpolation_matrix(mesh.nc[2], Pc, Pf),
                        dtype=dtype,
                    ),
                    weights_f=jnp.asarray(
                        part.ownership_weights(Pf), dtype=dtype
                    ),
                )
                spec = dict(Ix=P(), Iy=P(), Iz=P(), weights_f=P(AX, AY))
                for k in tr:
                    tr[k] = jax.device_put(tr[k], NamedSharding(self.jmesh, spec[k]))
                transfer.append(tr)
                transfer_specs.append(spec)

        self.data = dict(levels=tuple(level_data), transfer=tuple(transfer))
        self.data_specs = dict(levels=tuple(level_specs),
                               transfer=tuple(transfer_specs))

        def _cycle(data, b3, u3):
            # Flatten the 3D shard-local arrays for the generic v_cycle.
            data = dict(
                data,
                levels=tuple(
                    {
                        k: (v.reshape(-1) if k in ("bc_marker", "weights",
                                                   "diag_inv") else v)
                        for k, v in lv.items()
                    }
                    for lv in data["levels"]
                ),
                transfer=tuple(
                    {k: (v.reshape(-1) if k == "weights_f" else v)
                     for k, v in tr.items()}
                    for tr in data["transfer"]
                ),
            )
            u = v_cycle(
                data, b3.reshape(-1), u3.reshape(-1), levels=self.levels,
                coarse=self.coarse, coarse_cfg=self.coarse_cfg, ops=ops,
            )
            return u.reshape(b3.shape)

        self._vcycle = jax.jit(
            jax.shard_map(
                _cycle, mesh=self.jmesh,
                in_specs=(self.data_specs, P(AX, AY), P(AX, AY)),
                out_specs=P(AX, AY),
            )
        )

    # -- API -------------------------------------------------------------

    def to_dist(self, u, level=-1):
        Pdeg = self.degrees[level]
        with self.jmesh:
            return jax.device_put(
                jnp.asarray(self.part.to_dist(Pdeg, np.asarray(u)),
                            dtype=self.dtype),
                NamedSharding(self.jmesh, P(AX, AY)),
            )

    def from_dist(self, ud, level=-1):
        return self.part.from_dist(self.degrees[level], np.asarray(ud))

    def solve(self, b, num_cycles=10, residuals=True):
        bd = self.to_dist(b)
        ud = jnp.zeros_like(bd)
        ops = self._ops
        fine = self.levels[-1]
        rnorms = []
        for _ in range(num_cycles):
            ud = self._vcycle(self.data, bd, ud)
            if residuals:
                def _rn(lv, b3, u3):
                    lvf = {
                        k: (v.reshape(-1) if k in ("bc_marker", "weights",
                                                   "diag_inv") else v)
                        for k, v in lv.items()
                    }
                    r = b3.reshape(-1) - ops["apply"](lvf, u3.reshape(-1), fine)
                    return jnp.sqrt(ops["dot"](r, r, lvf))

                rn_fn = jax.jit(
                    jax.shard_map(
                        _rn, mesh=self.jmesh,
                        in_specs=(self.data_specs["levels"][-1],
                                  P(AX, AY), P(AX, AY)),
                        out_specs=P(),
                    )
                )
                rnorms.append(float(rn_fn(self.data["levels"][-1], bd, ud)))
        return self.from_dist(ud), rnorms
