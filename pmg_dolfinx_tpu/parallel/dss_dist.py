"""Distributed UNSTRUCTURED-topology PMG: the DSS backend under shard_map.

First distributed version of the unstructured path (VERDICT r4 item 4)
— the reference ghost-layers and partitions ANY DOLFINx mesh
(src/mesh.hpp:17-98) and reconciles shared dofs with its Scatterer
(src/vector.hpp:83-96, 186-294); here the same roles are played by:

- CELL PARTITION: contiguous cell ranges (the mesh builders emit cells
  in a spatially coherent order), padded to a common per-shard count
  with DUMMY cells whose geometry factors are zero and whose
  contribution rows no entity references — they gather garbage, apply
  zero, and scatter nowhere (no masking needed anywhere in the hot
  path).
- LOCAL DSS LAYOUT per shard: each shard enumerates the faces / edges
  / vertices its cells touch (entities on shard boundaries are
  DUPLICATED on every touching shard — the unstructured analogue of
  the box layouts' duplicated interface planes, same "duplicates
  equal" invariant). Local gather/scatter tables are row-slices of the
  global ones (local storage keeps the GLOBAL canonical orientation,
  so the variant bit-planes transfer unchanged).
- SHARED-ENTITY EXCHANGE (the Scatterer analogue): after the local
  scatter each shard holds partial sums on its shared entities. Every
  shard row-GATHERS its partials into a global-shared-slot buffer
  (zero rows for entities it does not touch), one ``psum`` over the
  shard axis sums the partials, and a second row gather + select
  writes the totals back — all indexed ops are row gathers, exactly
  like the single-device path. Prolongation needs no exchange
  (duplicates compute equal values); applies and restrictions do.
- DOTS: ownership weights (owner = shard of an entity's first global
  sharer) + psum (`ops.blas.dist_inner_product`).

Trajectory-exact vs the single-device DSS hierarchy to fp roundoff
(tests/test_dss_dist.py; summation order across shards differs, so
"exact" means ~1e-12 in f64, like the box layouts).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..fem.geometry import (
    geometry_factors,
    quadrature_weights_3d,
    tabulate_geometry_dphi,
)
from ..fem.gll import derivative_matrix, interpolation_matrix_1d
from ..fem.assembly import resolve_kappa_split, resolve_sigma, scale_G
from ..ops.blas import dist_inner_product
from ..ops.unstructured import (
    DSSMeta,
    _offsets,
    _pad_cols,
    _padw,
    apply_cells,
    dss_gather,
    dss_prolongate,
    dss_restrict,
    dss_scatter,
)
from ..solvers.cg import cg_solve
from ..solvers.pmg import (
    DEFAULT_CALIBRATION_ITERS,
    DEFAULT_CALIBRATION_RTOL,
    DEFAULT_SMOOTHER_ITERS,
    EIG_RANGE_FACTORS,
    Level,
    pcast_varying,
    v_cycle,
)
from ..solvers.tridiag import lanczos_eigenvalue_estimates
from .dist import AXIS, make_mesh
from .multihost import fetch_global, put_global


# -- host-side partition ------------------------------------------------


def _entity_partition(global_id, global_src, n_ent, nloc_cf, cell_shard,
                      n_shards):
    """Per-shard local tables for one entity kind.

    ``global_id (nc, nloc)`` entity index per cell slot; ``global_src
    (n_ent, K)`` global sharer table (flat cellface = cell * nloc +
    loc); ``cell_shard (nc,)`` shard of every cell. Returns a dict of
    per-shard stacked arrays (lists indexed by shard) plus the shared-
    entity enumeration."""
    nc, nloc = global_id.shape
    del nloc_cf
    # Which shards touch each entity (via its sharer cells).
    ent_shards = [set() for _ in range(n_ent)]
    pad = nc * nloc
    for ent in range(n_ent):
        for k in range(global_src.shape[1]):
            s = global_src[ent, k]
            if s != pad:
                ent_shards[ent].add(cell_shard[s // nloc])
    shared = [e for e in range(n_ent) if len(ent_shards[e]) > 1]
    shared_slot = {e: i for i, e in enumerate(shared)}
    owner = np.empty(n_ent, dtype=np.int64)
    for e in range(n_ent):
        owner[e] = cell_shard[global_src[e, 0] // nloc]

    out = []
    for s in range(n_shards):
        cells_s = np.where(cell_shard == s)[0]
        ids_s = global_id[cells_s]                      # (ncl, nloc)
        loc_ents = np.unique(ids_s)
        g2l = {g: i for i, g in enumerate(loc_ents)}
        nEl = len(loc_ents)
        local_id = np.vectorize(g2l.__getitem__, otypes=[np.int64])(
            ids_s) if ids_s.size else np.zeros_like(ids_s)
        # Local sharer lists: global sharers whose cell is in this shard.
        cmap = {int(c): i for i, c in enumerate(cells_s)}
        lsrc = []
        for g in loc_ents:
            row = []
            for k in range(global_src.shape[1]):
                sgl = global_src[g, k]
                if sgl != pad and cell_shard[sgl // nloc] == s:
                    row.append(cmap[sgl // nloc] * nloc + sgl % nloc)
            lsrc.append(row)
        Kl = max((len(r) for r in lsrc), default=1)
        src = np.full((nEl, Kl), -1, dtype=np.int64)
        for i, row in enumerate(lsrc):
            src[i, :len(row)] = row
        out.append(dict(
            ents=loc_ents, local_id=local_id, src=src,
            pack=np.array([g2l.get(e, -1) for e in shared],
                          dtype=np.int64),
            unpack=np.array([shared_slot.get(int(g), -1)
                             for g in loc_ents], dtype=np.int64),
            is_shared=np.array([int(g) in shared_slot for g in loc_ents],
                               dtype=bool),
            owned=np.array([owner[int(g)] == s for g in loc_ents],
                           dtype=bool),
        ))
    return out, len(shared)


def _pad_stack(arrs, fill):
    """Stack variable-size per-shard arrays padded with ``fill`` to a
    common shape; returns (stacked, sizes)."""
    sizes = [a.shape[0] for a in arrs]
    m = max(sizes) if sizes else 0
    rest = arrs[0].shape[1:]
    out = np.full((len(arrs), m) + rest, fill, dtype=arrs[0].dtype)
    for i, a in enumerate(arrs):
        out[i, :a.shape[0]] = a
    return out, sizes


class DSSPartition:
    """Host-side cell partition + per-shard DSS tables for one degree.

    Cells are split into ``n_shards`` contiguous ranges padded with
    dummy cells to a common count. All per-shard tables are stacked
    with a leading shard axis (PartitionSpec ``P(AXIS)``), padded so
    every shard's slice has the same static shape."""

    def __init__(self, mesh, n_shards):
        self.mesh = mesh
        self.n_shards = int(n_shards)
        nc = mesh.ncells
        base, extra = divmod(nc, self.n_shards)
        counts = [base + (i < extra) for i in range(self.n_shards)]
        self.cell_shard = np.repeat(np.arange(self.n_shards), counts)
        self.ncl = max(counts)          # padded per-shard cell count
        self.counts = counts
        self._per_degree = {}

    def tables(self, Pdeg):
        if Pdeg in self._per_degree:
            return self._per_degree[Pdeg]
        mesh = self.mesh
        lt = mesh.dss_layout(Pdeg)
        m = lt["m"]
        n = Pdeg + 1
        S = self.n_shards
        ncl = self.ncl
        kinds = {}
        sizes = {}
        for kind, nloc in (("face", 6), ("edge", 12), ("vert", 8)):
            n_ent = lt["nF"] if kind == "face" else (
                lt["nE"] if kind == "edge" else lt["nV"])
            if kind != "vert" and m == 0:
                kinds[kind] = None
                sizes[kind] = [0] * S
                continue
            per, nsh = _entity_partition(
                lt[f"{kind}_id"], lt[f"{kind}_src"], n_ent, nloc,
                self.cell_shard, S)
            kinds[kind] = (per, nsh)
            sizes[kind] = [p["ents"].shape[0] for p in per]

        nFl = max(sizes["face"]) if m else 0
        nEl = max(sizes["edge"]) if m else 0
        nVl = max(sizes["vert"])
        ent_w = {"face": m * m, "edge": m, "vert": 1}
        meta = DSSMeta(nc=ncl, P=Pdeg, m=m, n_int=ncl * m ** 3,
                       nF=nFl, nE=nEl, nV=nVl,
                       Wf=_padw(m * m), We=_padw(m))
        ndl = meta.n_int + nFl * m * m + nEl * m + nVl

        dev = {}      # stacked per-shard device tables
        w = np.zeros((S, ndl))        # ownership weights
        bcl = np.ones((S, ndl), dtype=bool)
        l2g = np.full((S, ndl), -1, dtype=np.int64)
        marker = np.asarray(mesh.boundary_dof_marker(Pdeg))
        o_f, o_e, o_v = _offsets(meta)
        offs_g = dict(face=lt["nc"] * m ** 3,
                      edge=lt["nc"] * m ** 3 + lt["nF"] * m * m,
                      vert=lt["nc"] * m ** 3 + lt["nF"] * m * m
                      + lt["nE"] * m)
        offs_l = dict(face=o_f, edge=o_e, vert=o_v)
        nEl_pad = dict(face=nFl, edge=nEl, vert=nVl)

        # Per-cell tables: local entity ids + per-shard variant bit
        # planes (local storage keeps the global canonical orientation,
        # so the global variant tables row-slice directly), zero for
        # dummy cells — their slots are never scattered.
        from ..ops.unstructured import _VAR_BITS

        for kind, nloc in (("face", 6), ("edge", 12), ("vert", 8)):
            if kinds[kind] is None:
                continue
            per, nsh = kinds[kind]
            ids, srcs, packs, unpacks, shareds = [], [], [], [], []
            for s, p in enumerate(per):
                idl = np.zeros((ncl, nloc), dtype=np.int64)
                idl[:p["local_id"].shape[0]] = p["local_id"]
                ids.append(idl)
                # local src: pad value -> the padded-cellface zero row
                srcs.append(np.where(p["src"] < 0, ncl * nloc, p["src"]))
                pk = np.where(p["pack"] < 0, nEl_pad[kind], p["pack"])
                packs.append(pk)
                up = np.where(p["unpack"] < 0, nsh, p["unpack"])
                unpacks.append(up)
                shareds.append(p["is_shared"])
                # ownership + l2g for this kind
                lo = offs_l[kind]
                wdt = ent_w[kind]
                for i, g in enumerate(p["ents"]):
                    gbase = offs_g[kind] + int(g) * wdt
                    lbase = lo + i * wdt
                    l2g[s, lbase:lbase + wdt] = np.arange(
                        gbase, gbase + wdt)
                    w[s, lbase:lbase + wdt] = float(p["owned"][i])
            dev[f"{kind}_id"] = np.stack(ids).astype(np.int32)
            Kl = max(a.shape[1] for a in srcs)
            srcs = [np.pad(a, ((0, nEl_pad[kind] - a.shape[0]),
                               (0, Kl - a.shape[1])),
                           constant_values=ncl * nloc) for a in srcs]
            dev[f"{kind}_src"] = np.stack(srcs).astype(np.int32)
            dev[f"{kind}_pack"], _ = _pad_stack(
                [a.astype(np.int64) for a in packs], nEl_pad[kind])
            dev[f"{kind}_pack"] = dev[f"{kind}_pack"].astype(np.int32)
            up_st = [np.pad(a, (0, nEl_pad[kind] - a.shape[0]),
                            constant_values=nsh) for a in unpacks]
            dev[f"{kind}_unpack"] = np.stack(up_st).astype(np.int32)
            sh_st = [np.pad(a, (0, nEl_pad[kind] - a.shape[0]))
                     for a in shareds]
            dev[f"{kind}_shared"] = np.stack(sh_st)
            dev[f"{kind}_nsh"] = nsh
        if m:
            for key in ("face_var", "face_inv"):
                bits = _VAR_BITS[lt[key]]
                for b, name in enumerate(("t", "r1", "r2")):
                    arr = np.zeros((S, ncl, 6), dtype=bool)
                    for s in range(S):
                        cs = np.where(self.cell_shard == s)[0]
                        arr[s, :len(cs)] = bits[cs, :, b]
                    dev[f"{key}_{name}"] = arr
            for key in ("edge_var", "edge_inv"):
                arr = np.zeros((S, ncl, 12), dtype=bool)
                for s in range(S):
                    cs = np.where(self.cell_shard == s)[0]
                    arr[s, :len(cs)] = lt[key][cs] == 1
                dev[f"{key}_r"] = arr

        # Interior dofs: l2g / weights / bc for real cells.
        if m:
            for s in range(S):
                cs = np.where(self.cell_shard == s)[0]
                nreal = len(cs) * m ** 3
                l2g[s, :nreal] = (cs[:, None] * m ** 3
                                  + np.arange(m ** 3)).reshape(-1)
                w[s, :nreal] = 1.0
        # bc marker via l2g (padding dofs stay bc=True).
        for s in range(S):
            sel = l2g[s] >= 0
            bcl[s, sel] = marker[l2g[s, sel]]

        out = dict(meta=meta, ndl=ndl, dev=dev, l2g=l2g, weights=w,
                   bc=bcl)
        self._per_degree[Pdeg] = out
        return out

    # -- vector converters (host) --------------------------------------

    def to_dist(self, Pdeg, u):
        t = self.tables(Pdeg)
        u = np.asarray(u).reshape(-1)
        out = np.zeros((self.n_shards, t["ndl"]), dtype=u.dtype)
        sel = t["l2g"] >= 0
        out[sel] = u[t["l2g"][sel]]
        return out.reshape(-1)

    def from_dist(self, Pdeg, ud):
        t = self.tables(Pdeg)
        ud = np.asarray(ud).reshape(self.n_shards, t["ndl"])
        out = np.zeros(self.mesh.num_dofs(Pdeg), dtype=ud.dtype)
        sel = (t["l2g"] >= 0) & (t["weights"] > 0.5)
        out[t["l2g"][sel]] = ud[sel]
        return out


# -- device-side exchange ----------------------------------------------


def _exchange_kind(rows, pack, unpack, shared):
    """Shared-entity partial-sum exchange for one kind: row-gather the
    local partials into the global shared-slot buffer (zero rows where
    this shard does not touch the slot), psum, row-gather the totals
    back and select them on the shared rows."""
    W = rows.shape[1]
    padded = jnp.concatenate([rows, jnp.zeros((1, W), rows.dtype)])
    buf = padded[pack]
    buf = jax.lax.psum(buf, AXIS)
    bufp = jnp.concatenate([buf, jnp.zeros((1, W), rows.dtype)])
    tot = bufp[unpack]
    return jnp.where(shared[:, None], tot, rows)


def dss_exchange(y, t, meta):
    """Reconcile shared-entity partial sums of a local DSS dof vector
    (inside shard_map)."""
    m = meta.m
    o_f, o_e, o_v = _offsets(meta)
    parts = [y[:o_f]]
    if m:
        yf = _exchange_kind(
            _pad_cols(y[o_f:o_e].reshape(meta.nF, m * m), meta.Wf),
            t["face_pack"], t["face_unpack"], t["face_shared"])
        parts.append(yf[:, :m * m].reshape(-1))
        ye = _exchange_kind(
            _pad_cols(y[o_e:o_v].reshape(meta.nE, m), meta.We),
            t["edge_pack"], t["edge_unpack"], t["edge_shared"])
        parts.append(ye[:, :m].reshape(-1))
    yv = _exchange_kind(
        jnp.broadcast_to(y[o_v:, None], (meta.nV, 8)),
        t["vert_pack"], t["vert_unpack"], t["vert_shared"])
    parts.append(yv[:, 0])
    return jnp.concatenate(parts)


def dss_dist_cycle_ops(precision="highest", sigma=0.0):
    """Sharded V-cycle primitives for the DSS backend: the single-device
    row-gather machinery on shard-local tables + the shared-entity
    exchange after every overlap-add."""

    def apply_op(lv, x, level):
        bc = lv["bc_marker"]
        xb = jnp.where(bc, jnp.zeros_like(x), x)
        u = dss_gather(xb, lv, level.dss)
        yc = apply_cells(u, lv["G"], lv["coeff"], lv["D"],
                         precision=precision)
        y = dss_exchange(dss_scatter(yc, lv, level.dss), lv, level.dss)
        if sigma:
            y = y + sigma * lv["m3"] * x
        return jnp.where(bc, x, y)

    def restrict_op(tr, r, level_c, level_f):
        raw = dss_restrict(r, tr["M1"], tr["tf"], level_f.dss,
                           tr["tc"], level_c.dss, tr["inv_mult_f"])
        return dss_exchange(raw, tr["tc"], level_c.dss)

    def prolong_op(tr, u, level_c, level_f):
        # Duplicated entities compute identical values on every touching
        # shard (consistent coarse duplicates) — no exchange needed.
        return dss_prolongate(u, tr["M1"], tr["tc"], level_c.dss,
                              tr["tf"], level_f.dss)

    return dict(
        apply=apply_op,
        restrict=restrict_op,
        prolong=prolong_op,
        dot=lambda u, v, lv: dist_inner_product(u, v, lv["weights"], AXIS),
        pvary=lambda v: pcast_varying(v, (AXIS,)),
        dss_exchange=dss_exchange,
    )


class DSSDist:
    """Multi-device p-multigrid on an UNSTRUCTURED hex mesh (DSS
    backend). Coarse solvers: 'cg' (fully distributed) or 'direct'
    (gathered dense Cholesky, solved redundantly). Smoothers: 'cheb'
    (point Jacobi) or 'schwarz' (cell-local blocks + exchange)."""

    def __init__(self, mesh, n_devices=None, degrees=(1, 3), kappa=2.0,
                 dtype=jnp.float64, smoother_iters=DEFAULT_SMOOTHER_ITERS,
                 coarse="cg", coarse_cfg=None, devices=None,
                 calibration_iters=DEFAULT_CALIBRATION_ITERS,
                 precision="highest", sigma=0.0, smoother="cheb"):
        if not hasattr(mesh, "dss_layout"):
            raise ValueError("DSSDist needs an UnstructuredHexMesh")
        if coarse not in ("cg", "direct", "smoother"):
            raise ValueError(
                "DSSDist coarse must be 'cg', 'direct' or 'smoother' "
                "(v1; 'amg' is single-device for now)")
        n_devices = n_devices or len(jax.devices())
        self.jmesh = make_mesh(n_devices, devices)
        self.n_shards = n_devices
        self.part = DSSPartition(mesh, n_devices)
        self.mesh = mesh
        self.degrees = tuple(int(p) for p in degrees)
        self.dtype = dtype
        self.sigma, sigma_field = resolve_sigma(sigma)
        if sigma_field is not None:
            raise ValueError("DSSDist supports a scalar sigma only (v1)")
        self._kc, self._kappa_fold, _ = resolve_kappa_split(mesh, kappa)
        self.kappa_cells = (self._kappa_fold
                            if self._kappa_fold is not None else self._kc)
        self.coarse = coarse
        self.coarse_cfg = dict(coarse_cfg or {})
        self.eigs = []
        ops = dss_dist_cycle_ops(precision, sigma=self.sigma)
        self._ops = ops

        S = self.n_shards
        cell_shard = self.part.cell_shard
        ncl = self.part.ncl
        level_data, level_specs, levels = [], [], []
        for Pdeg in self.degrees:
            t = self.part.tables(Pdeg)
            meta = t["meta"]
            G_cells, _ = geometry_factors(
                mesh.geometry_x, mesh.geometry_dofmap,
                tabulate_geometry_dphi(Pdeg),
                quadrature_weights_3d(Pdeg), xp=np,
                kappa=self._kappa_fold,
            )
            n = Pdeg + 1
            Gl = np.zeros((S, ncl, n ** 3, 6))
            cl = np.zeros((S, ncl))
            for s in range(S):
                cs = np.where(cell_shard == s)[0]
                Gl[s, :len(cs)] = G_cells[cs]
                cl[s, :len(cs)] = self._kc[cs]
            lv = {k: jnp.asarray(v) for k, v in t["dev"].items()
                  if not k.endswith("_nsh")}
            lv.update(
                G=jnp.asarray(Gl.reshape(S * ncl, n ** 3, 6), dtype=dtype),
                coeff=jnp.asarray(cl.reshape(-1), dtype=dtype),
                D=jnp.asarray(derivative_matrix(Pdeg), dtype=dtype),
                bc_marker=jnp.asarray(t["bc"].reshape(-1)),
                weights=jnp.asarray(t["weights"].reshape(-1),
                                    dtype=dtype),
            )
            # reshape stacked tables to (S*rows, ...) so P(AXIS) slices
            # per shard
            for k in list(lv):
                if k in ("G", "coeff", "D", "bc_marker", "weights"):
                    continue
                a = lv[k]
                lv[k] = a.reshape((a.shape[0] * a.shape[1],)
                                  + a.shape[2:])
            if meta.m:
                # block->lattice permutation + variant-stacking matmul
                # operands: identical on every shard (global cell-slot
                # structure), replicated specs.
                from ..ops.unstructured import perm_matrix

                lv["pmat"] = perm_matrix(mesh.dss_layout(Pdeg), dtype)
            # nsh values are static per kind: fold into meta-side dict?
            # They are only used as python ints at trace time via the
            # table shapes; keep them on the level as plain attributes.
            from ..fem.assembly import (shifted_mass_np,
                                        stiffness_diagonal_np)

            dg = stiffness_diagonal_np(mesh, Pdeg, self.kappa_cells)
            if self.sigma:
                m3g = shifted_mass_np(mesh, Pdeg, None)
                dg = dg + self.sigma * m3g
                m3l = np.zeros((S, t["ndl"]))
                sel = t["l2g"] >= 0
                m3l[sel] = np.where(
                    t["bc"][sel], 0.0, m3g[t["l2g"][sel]])
                lv["m3"] = jnp.asarray(m3l.reshape(-1), dtype=dtype)
            dl = np.ones((S, t["ndl"]))
            sel = t["l2g"] >= 0
            dl[sel] = np.where(t["bc"][sel], 1.0, dg[t["l2g"][sel]])
            lv["diag_inv"] = jnp.asarray(1.0 / dl.reshape(-1),
                                         dtype=dtype)
            level = Level(P=Pdeg, ndofs=t["ndl"],
                          smoother_iters=smoother_iters, dss=meta)
            if smoother == "schwarz":
                from ..solvers.schwarz_dss import build_schwarz_dss

                sw = build_schwarz_dss(mesh, Pdeg, kappa, dtype,
                                       sigma=self.sigma)
                Vl = np.zeros((S, ncl, 3, n, n))
                gl = np.zeros((S, ncl, n, n, n))
                Vg = np.asarray(sw["V"])
                gg = np.asarray(sw["ginv"])
                for s in range(S):
                    cs = np.where(cell_shard == s)[0]
                    Vl[s, :len(cs)] = Vg[cs]
                    gl[s, :len(cs)] = gg[cs]
                wl = np.zeros((S, t["ndl"]))
                wl[sel] = np.asarray(sw["w"])[t["l2g"][sel]]
                lv["schwarz"] = dict(
                    V=jnp.asarray(Vl.reshape(S * ncl, 3, n, n),
                                  dtype=dtype),
                    ginv=jnp.asarray(gl.reshape(S * ncl, n, n, n),
                                     dtype=dtype),
                    w=jnp.asarray(wl.reshape(-1), dtype=dtype),
                    bc=lv["bc_marker"],
                )
            spec = {k: P(AXIS) for k in lv}
            spec["D"] = P()
            if "pmat" in lv:
                spec["pmat"] = P()
            if "schwarz" in lv:
                spec["schwarz"] = dict(V=P(AXIS), ginv=P(AXIS),
                                       w=P(AXIS), bc=P(AXIS))
            level_data.append(lv)
            level_specs.append(spec)
            levels.append(level)
        self.levels = tuple(levels)

        # -- coarse ----------------------------------------------------
        self._coarse_data = None
        if coarse == "direct":
            from ..fem.assembly import assemble_stiffness, shifted_mass_np
            import scipy.sparse as sp_

            A0 = assemble_stiffness(
                mesh, self.degrees[0],
                kappa=(self._kappa_fold if self._kappa_fold is not None
                       else self._kc)).toarray()
            if self.sigma:
                A0[np.diag_indices_from(A0)] += (
                    self.sigma * shifted_mass_np(mesh, self.degrees[0],
                                                 None))
            chol = np.linalg.cholesky(A0)
            self._coarse_data = ("coarse_chol",
                                 jnp.asarray(chol, dtype=dtype))
            t0 = self.part.tables(self.degrees[0])
            l2g0 = np.where(t0["l2g"] >= 0, t0["l2g"], 0)
            own0 = (t0["l2g"] >= 0) & (t0["weights"] > 0.5)
            nd0 = mesh.num_dofs(self.degrees[0])
            # Closed over REPLICATED stacked tables; each shard selects
            # its row by axis_index (coarse-size arrays — the closure-
            # constant folding hazard does not bite at ~nd0*S ints).
            l2g_all = jnp.asarray(l2g0)      # (S, ndl0)
            own_all = jnp.asarray(own0)

            def coarse_gather(v):
                # owned local values scattered into the global coarse
                # vector + psum (coarse level is small: the element
                # scatter is acceptable here and ONLY here).
                s = jax.lax.axis_index(AXIS)
                g = jnp.zeros(nd0, v.dtype).at[l2g_all[s]].add(
                    jnp.where(own_all[s], v, 0.0))
                return jax.lax.psum(g, AXIS)

            def coarse_slice(g):
                return g[l2g_all[jax.lax.axis_index(AXIS)]]

            ops["coarse_gather"] = coarse_gather
            ops["coarse_slice"] = coarse_slice

        # -- place + calibrate ----------------------------------------
        with self.jmesh:
            for lv, spec, level in zip(level_data, level_specs, levels):
                for k in lv:
                    if isinstance(lv[k], dict):
                        lv[k] = {kk: put_global(
                            vv, NamedSharding(self.jmesh, spec[k][kk]))
                            for kk, vv in lv[k].items()}
                    else:
                        lv[k] = put_global(
                            lv[k], NamedSharding(self.jmesh, spec[k]))

                def _calib(lv_, b_, x0_):
                    A = lambda x: ops["apply"](lv_, x, level)
                    pre = None
                    if "schwarz" in lv_:
                        from ..solvers.schwarz_dss import dss_schwarz_apply

                        pre = lambda r: dss_schwarz_apply(
                            lv_["schwarz"], r, lv_, level.dss,
                            exchange=lambda y: dss_exchange(
                                y, lv_, level.dss))
                    return cg_solve(
                        A, b_, x0_, lv_["diag_inv"],
                        rtol=DEFAULT_CALIBRATION_RTOL,
                        maxiter=calibration_iters, record=True,
                        dot=lambda u, v: ops["dot"](u, v, lv_),
                        precond=pre,
                    )

                calib_fn = jax.jit(jax.shard_map(
                    _calib, mesh=self.jmesh,
                    in_specs=(spec, P(AXIS), P(AXIS)),
                    out_specs=(P(AXIS), dict(
                        niter=P(), rnorm=P(), rnorm0=P(), alphas=P(),
                        betas=P(), residuals=P(), stored=P())),
                ))
                vshape = (level.ndofs * S,)
                vsh = NamedSharding(self.jmesh, P(AXIS))
                ones = self.part.to_dist(
                    level.P, np.ones(mesh.num_dofs(level.P)))
                _, info = calib_fn(
                    lv,
                    put_global(np.asarray(ones, dtype=dtype), vsh),
                    put_global(np.zeros(vshape, dtype=dtype), vsh),
                )
                eigs = lanczos_eigenvalue_estimates(
                    info["alphas"], info["betas"], info["stored"])
                self.eigs.append(eigs)
                lv["lmax"] = put_global(
                    jnp.asarray(EIG_RANGE_FACTORS[1] * eigs[-1],
                                dtype=dtype),
                    NamedSharding(self.jmesh, P()))
                spec["lmax"] = P()

        # -- transfers -------------------------------------------------
        transfer, transfer_specs = [], []
        for i in range(len(self.degrees) - 1):
            Pc, Pf = self.degrees[i], self.degrees[i + 1]
            tf_t = self.part.tables(Pf)
            inv_mult = np.zeros((S, tf_t["ndl"]))
            sel = tf_t["l2g"] >= 0
            inv_mult[sel] = 1.0 / np.asarray(
                mesh.dof_multiplicity(Pf))[tf_t["l2g"][sel]]
            tr = dict(
                M1=put_global(
                    jnp.asarray(interpolation_matrix_1d(Pc, Pf),
                                dtype=dtype),
                    NamedSharding(self.jmesh, P())),
                tc=level_data[i],
                tf=level_data[i + 1],
                inv_mult_f=put_global(
                    jnp.asarray(inv_mult.reshape(-1), dtype=dtype),
                    NamedSharding(self.jmesh, P(AXIS))),
            )
            spec = dict(M1=P(), tc=level_specs[i], tf=level_specs[i + 1],
                        inv_mult_f=P(AXIS))
            transfer.append(tr)
            transfer_specs.append(spec)

        self.data = dict(levels=tuple(level_data), transfer=tuple(transfer))
        self.data_specs = dict(levels=tuple(level_specs),
                               transfer=tuple(transfer_specs))
        if self._coarse_data is not None:
            key, cdata = self._coarse_data
            with self.jmesh:
                self.data[key] = put_global(
                    cdata, NamedSharding(self.jmesh, P()))
            self.data_specs[key] = P()

        self._vcycle = jax.jit(jax.shard_map(
            partial(v_cycle, levels=self.levels, coarse=self.coarse,
                    coarse_cfg=self.coarse_cfg, ops=ops),
            mesh=self.jmesh,
            in_specs=(self.data_specs, P(AXIS), P(AXIS)),
            out_specs=P(AXIS),
        ))
        fine = self.levels[-1]
        fine_spec = self.data_specs["levels"][-1]

        def _rnorm(lv, b, u):
            r = b - ops["apply"](lv, u, fine)
            return jnp.sqrt(ops["dot"](r, r, lv))

        self._rnorm = jax.jit(jax.shard_map(
            _rnorm, mesh=self.jmesh,
            in_specs=(fine_spec, P(AXIS), P(AXIS)), out_specs=P()))

    # -- vector layout helpers -----------------------------------------

    def to_dist(self, u, level=-1):
        ud = self.part.to_dist(self.degrees[level], np.asarray(u))
        return put_global(np.asarray(ud, dtype=self.dtype),
                          NamedSharding(self.jmesh, P(AXIS)))

    def from_dist(self, ud, level=-1):
        return self.part.from_dist(self.degrees[level], fetch_global(ud))

    # -- solver API ----------------------------------------------------

    def solve(self, b, num_cycles=10):
        """Stationary V-cycle iteration from zero; ``b`` global (host)
        or already dist. Returns ``(u_global, residual_norms)``."""
        bd = b if hasattr(b, "sharding") else self.to_dist(b)
        nd = self.n_shards * self.levels[-1].ndofs
        ud = put_global(np.zeros(nd, dtype=self.dtype),
                        NamedSharding(self.jmesh, P(AXIS)))
        res = []
        for _ in range(num_cycles):
            ud = self._vcycle(self.data, bd, ud)
            res.append(float(self._rnorm(self.data["levels"][-1], bd, ud)))
        return self.from_dist(ud), np.asarray(res)

    def solve_pcg(self, b, rtol=1e-8, maxiter=50):
        """FCG with the sharded V-cycle preconditioner (rtol/maxiter
        baked per compiled program, like `DistPMG.solve_pcg`)."""
        from ..solvers.cg import fcg_solve

        bd = b if hasattr(b, "sharding") else self.to_dist(b)
        if not hasattr(self, "_pcg_cache"):
            self._pcg_cache = {}
        key = (float(rtol), int(maxiter))
        if key not in self._pcg_cache:
            ops = self._ops
            fine = self.levels[-1]

            def _run(data, b_, u0, _rtol=key[0], _maxiter=key[1]):
                lvf = data["levels"][-1]
                A = lambda x: ops["apply"](lvf, x, fine)
                M = lambda r: v_cycle(
                    data, r, ops["pvary"](jnp.zeros_like(r)),
                    levels=self.levels, coarse=self.coarse,
                    coarse_cfg=self.coarse_cfg, ops=ops)
                return fcg_solve(
                    A, b_, u0, M, rtol=_rtol, maxiter=_maxiter,
                    dot=lambda u, v: ops["dot"](u, v, lvf))

            self._pcg_cache[key] = jax.jit(jax.shard_map(
                _run, mesh=self.jmesh,
                in_specs=(self.data_specs, P(AXIS), P(AXIS)),
                out_specs=(P(AXIS),
                           dict(niter=P(), rnorm=P(), rnorm0=P())),
            ))
        nd = self.n_shards * self.levels[-1].ndofs
        u0 = put_global(np.zeros(nd, dtype=self.dtype),
                        NamedSharding(self.jmesh, P(AXIS)))
        ud, info = self._pcg_cache[key](self.data, bd, u0)
        return self.from_dist(ud), int(info["niter"])
