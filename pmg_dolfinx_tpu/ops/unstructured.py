"""Fast matrix-free Laplacian on UNSTRUCTURED hex topology: the DSS path.

TPU-native redesign of the reference hot kernel's topology-agnostic
gather -> per-cell sum-factorized apply -> atomicAdd scatter
(src/laplacian.hpp:143-278, gather :182-189, scatter :272-277), which
runs any conforming hex mesh at full speed on GPUs. A literal port
(``x[dofmap]`` / ``.at[dofmap].add``) runs at 0.04 GDOF/s on TPU:
measured in isolation (tools/gather_bench.py, v5e, 2.05M dofs), XLA
ELEMENT gathers and scatter-adds both cost ~7 cycles per element —
while ROW gathers of >=8-lane rows run at HBM speed (60k x 128 f32
rows in 0.079 ms ~= 390 GB/s). The redesign therefore reformulates the
whole assembly exchange as *direct stiffness summation over mesh
entities* with row-shaped transfers only:

- The dof vector is stored entity-blocked (`fem.unstructured._build_dss`):
  ``[cell interiors | face interiors | edge interiors | vertices]``.
- Cell-interior dofs (~58% of cell-local values at p=6) move by pure
  reshape — zero indexed ops.
- Face/edge interiors move as (nF, m^2)/(nE, m) ROW gathers, padded to
  >=8 lanes; relative orientation of a shared face is one of the 8
  dihedral transforms, applied vectorized as a select over the 8
  statically-transformed variants (no per-element indexing).
- Vertices move as width-8 REPLICATED rows (a width-1 row gather
  degenerates to element-gather speed — measured 6.9 ns/row vs 1.6 at
  width 8).
- The scatter-add direction needs no scatter at all: each entity SUMS
  its (<= 2 faces / Ke edges / Kv verts) sharers' contribution rows by
  K more row gathers from the per-cell contribution array (owner-first
  source tables, zero-row padded).

The per-cell contraction between the two exchanges is the same
cell-batched sum-factorized kernel as `ops.laplacian.laplacian_apply_cells`
with explicit MXU precision control. Everything is static-shape XLA;
no Mosaic needed — the op is row-gather/HBM-bound, not compute-bound.
"""

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from ..fem.unstructured import _EDGES, _FACES


class DSSMeta(NamedTuple):
    """Static (hashable) sizes of a DSS layout — carried on `Level.dss`
    so jitted cycle programs can specialize on them."""

    nc: int
    P: int
    m: int
    n_int: int
    nF: int
    nE: int
    nV: int
    Wf: int   # face row width, m^2 padded to a multiple of 8 (>= 8)
    We: int   # edge row width, m padded likewise


def _padw(w):
    return max(8, -(-w // 8) * 8)


def dss_meta(layout) -> DSSMeta:
    m = layout["m"]
    return DSSMeta(
        nc=layout["nc"], P=layout["P"], m=m, n_int=layout["n_int"],
        nF=layout["nF"], nE=layout["nE"], nV=layout["nV"],
        Wf=_padw(m * m), We=_padw(m),
    )


# Bit decomposition of the 8 dihedral variants: VAR2D[v](M) =
# rev_rows^r1( rev_cols^r2( transpose^t(M) ) ) with (t, r1, r2) below.
# Kept for reference/tests; the production path applies variants as
# one-hot MXU matmuls instead (see `_variant_mats`): per-row masked
# transpose/reverse passes measured 2.8 ms of a 4.4 ms exchange round
# trip at 2.24M dofs on v5e — tiny-minor-dim reverses and broadcasted
# bool selects are the worst-case ops for the TPU vector unit, while
# an (R, m^2) x (m^2, 8 m^2) one-hot matmul producing ALL 8 variants
# costs ~0.1 ms and turns the variant CHOICE into a precomputed
# combined row-gather index (row = entity*8 + variant).
_VAR_BITS = np.array(
    [(0, 0, 0), (1, 0, 0), (0, 1, 0), (0, 0, 1),
     (0, 1, 1), (1, 1, 0), (1, 0, 1), (1, 1, 1)], dtype=bool)


def _variant_mats(m, dtype):
    """One-hot variant-stacking matmul operands: ``fmat[(m^2, 8 m^2)]``
    with ``(X @ fmat)[r, v*m^2 + p] = VAR2D[v](X_r)[p]`` and the edge
    analogue ``emat[(m, 2m)]``. Exact at precision='highest' in every
    dtype (one-hot rows, see `perm_matrix`)."""
    from ..fem.unstructured import VAR1D, VAR2D

    base = np.arange(m * m).reshape(m, m)
    fmat = np.zeros((m * m, 8 * m * m))
    for v, T in enumerate(VAR2D):
        src = np.asarray(T(base)).ravel()  # p_out -> p_in
        fmat[src, v * m * m + np.arange(m * m)] = 1.0
    ebase = np.arange(m)
    emat = np.zeros((m, 2 * m))
    for v, T in enumerate(VAR1D):
        src = np.asarray(T(ebase)).ravel()
        emat[src, v * m + np.arange(m)] = 1.0
    return jnp.asarray(fmat, dtype=dtype), jnp.asarray(emat, dtype=dtype)


def perm_matrix(layout, dtype):
    """One-hot (n^3, n^3) block-order -> lattice-order column
    permutation matrix ``pmat[l, b] = 1 iff perm_lat[b] == l``. Applied
    as a matmul it is EXACT at precision='highest' in every dtype
    (each output is one input times 1.0; the bf16 3-way split of an f32
    reconstructs exactly)."""
    perm = layout["perm_lat"]
    n3 = len(perm)
    M = np.zeros((n3, n3), dtype=np.float64)
    M[perm, np.arange(n3)] = 1.0
    return jnp.asarray(M, dtype=dtype)


def combined_indices(layout):
    """Variant-combined index tables (host NumPy):

    - ``face_gidx (nc*6,)`` = ``face_id*8 + face_var`` — row into the
      8-variant stacked canonical-face array (gather side);
    - ``face_sidx (nF, <=2)`` = ``src*8 + face_inv[src]`` — row into
      the 8-variant stacked contribution array (scatter side), padded
      with ``nc*6*8`` (the zero row);
    - edge analogues with the 2 direction variants.
    """
    nc = layout["nc"]
    out = {}
    for kind, nloc, nv in (("face", 6, 8), ("edge", 12, 2)):
        gid = layout[f"{kind}_id"].astype(np.int64)
        var = layout[f"{kind}_var"].astype(np.int64)
        inv = layout[f"{kind}_inv"].astype(np.int64).ravel()
        out[f"{kind}_gidx"] = (gid * nv + var).reshape(-1).astype(np.int32)
        src = layout[f"{kind}_src"].astype(np.int64)
        pad = nc * nloc
        sidx = np.where(src == pad, nv * pad,
                        src * nv + inv[np.minimum(src, pad - 1)])
        out[f"{kind}_sidx"] = sidx.astype(np.int32)
    return out


def dss_device_tables(layout, dtype=jnp.float64) -> dict:
    """Device copies of the index tables the apply reads: the
    variant-combined gather/scatter row indices (`combined_indices`),
    the variant-stacking one-hot matmul operands (`_variant_mats`), the
    vertex tables, and the block->lattice permutation matmul operand
    (`perm_matrix`) — all in the working ``dtype``."""
    t = {k: jnp.asarray(layout[k]) for k in ("vert_id", "vert_src")}
    if layout["m"]:
        t.update({k: jnp.asarray(v)
                  for k, v in combined_indices(layout).items()})
        t["face_vmat"], t["edge_vmat"] = _variant_mats(layout["m"], dtype)
        t["pmat"] = perm_matrix(layout, dtype)
    return t


def _pad_cols(a, W):
    if a.shape[1] == W:
        return a
    return jnp.pad(a, ((0, 0), (0, W - a.shape[1])))


def _offsets(meta):
    o_f = meta.n_int
    o_e = o_f + meta.nF * meta.m * meta.m
    o_v = o_e + meta.nE * meta.m
    return o_f, o_e, o_v


def _gather_rows(x, t, meta):
    """The three entity row-gather stages: face rows (nc, 6*m*m) in
    LOCAL orientation, edge rows (nc, 12*m), vertex values (nc, 8).
    Orientation rides the variant-stacked one-hot matmul + the
    combined gather index (no per-row transforms)."""
    m = meta.m
    o_f, o_e, o_v = _offsets(meta)
    rows = er = None
    if m:
        xf = x[o_f:o_e].reshape(meta.nF, m * m)
        stk = jnp.einsum("fp,pq->fq", xf, t["face_vmat"],
                         precision="highest").reshape(meta.nF * 8, m * m)
        stk = _pad_cols(stk, meta.Wf)
        rows = stk[t["face_gidx"]][:, :m * m].reshape(meta.nc, 6 * m * m)
        xe = x[o_e:o_v].reshape(meta.nE, m)
        estk = jnp.einsum("ep,pq->eq", xe, t["edge_vmat"],
                          precision="highest").reshape(meta.nE * 2, m)
        estk = _pad_cols(estk, meta.We)
        er = estk[t["edge_gidx"]][:, :m].reshape(meta.nc, 12 * m)
    xv8 = jnp.broadcast_to(x[o_v:, None], (meta.nV, 8))
    rv = xv8[t["vert_id"].reshape(-1)][:, 0].reshape(meta.nc, 8)
    return rows, er, rv


def dss_gather(x, t, meta):
    """Continuous dof vector ``(ndofs,)`` -> cell slabs
    ``(nc, n, n, n)`` (the reference gather, src/laplacian.hpp:182-189,
    as reshapes + row gathers). The slab is assembled in entity-block
    COLUMN order — one wide 4-piece concat — and mapped to lattice
    order by a single exact one-hot matmul (``pmat``): assembling from
    27 small blocks cost ~4.5 ms at 2.24M dofs on v5e (tiny-piece
    concat; a 27-op dynamic-update-slice chain was 78 ms), while the
    (nc, n^3) x (n^3, n^3) permutation matmul rides the MXU."""
    nc, m = meta.nc, meta.m
    n = meta.P + 1
    rows, er, rv = _gather_rows(x, t, meta)
    if m == 0:
        return rv.reshape(nc, 2, 2, 2)
    ublk = jnp.concatenate(
        [x[:meta.n_int].reshape(nc, m ** 3), rows, er, rv], axis=1)
    u = jnp.einsum("cb,lb->cl", ublk, t["pmat"], precision="highest")
    return u.reshape(nc, n, n, n)


def _src_sum(rows2d, src, first):
    """Entity sums: K row gathers from the zero-row-padded contribution
    array (owner first)."""
    rows2d = jnp.concatenate(
        [rows2d, jnp.zeros((1, rows2d.shape[1]), rows2d.dtype)])
    acc = rows2d[src[:, 0]]
    if not first:
        for k in range(1, src.shape[1]):
            acc = acc + rows2d[src[:, k]]
    return acc


def dss_scatter(yc, t, meta, first=False):
    """Cell slabs ``(nc, n, n, n)`` -> continuous dof vector: each
    entity row-gathers and sums its sharers' contribution rows (the
    reference's atomicAdd scatter, src/laplacian.hpp:272-277, with
    ZERO scatter ops). ``first=True`` takes the owner's row only —
    exact for value-consistent fields (prolongation writes identical
    values from every sharer)."""
    nc, m = meta.nc, meta.m
    n = meta.P + 1
    if m == 0:
        cv = yc.reshape(nc, 8)
        cv8 = jnp.broadcast_to(cv.reshape(-1)[:, None], (nc * 8, 8))
        return _src_sum(cv8, t["vert_src"], first)[:, 0]
    # Lattice -> block column order (exact one-hot matmul), then the
    # entity sections are CONTIGUOUS column ranges.
    yblk = jnp.einsum("cl,lb->cb", yc.reshape(nc, n ** 3), t["pmat"],
                      precision="highest")
    o1 = m ** 3
    o2 = o1 + 6 * m * m
    o3 = o2 + 12 * m
    parts = [yblk[:, :o1].reshape(-1)]
    # Contribution rows stacked in all 8 orientations (one-hot matmul);
    # the combined source index picks the inverse-variant row per
    # sharer — no per-row transforms.
    cf = yblk[:, o1:o2].reshape(nc * 6, m * m)
    cstk = jnp.einsum("fp,pq->fq", cf, t["face_vmat"],
                      precision="highest").reshape(nc * 6 * 8, m * m)
    acc = _src_sum(_pad_cols(cstk, meta.Wf), t["face_sidx"], first)
    parts.append(acc[:, :m * m].reshape(-1))
    ce = yblk[:, o2:o3].reshape(nc * 12, m)
    estk = jnp.einsum("ep,pq->eq", ce, t["edge_vmat"],
                      precision="highest").reshape(nc * 12 * 2, m)
    acc = _src_sum(_pad_cols(estk, meta.We), t["edge_sidx"], first)
    parts.append(acc[:, :m].reshape(-1))
    cv8 = jnp.broadcast_to(yblk[:, o3:].reshape(-1)[:, None], (nc * 8, 8))
    parts.append(_src_sum(cv8, t["vert_src"], first)[:, 0])
    return jnp.concatenate(parts)


def apply_cells(u_cells, G, coeff, D, precision="highest"):
    """Cell-local stiffness action with explicit MXU precision (the
    f32-on-TPU variant of `ops.laplacian.laplacian_apply_cells`;
    'highest' = true-f32 3-pass matmuls — TPU einsums default to
    single-pass bf16 inputs, ~1e-3 error)."""
    n = D.shape[0]
    g = G.reshape(G.shape[0], n, n, n, 6)
    ux = jnp.einsum("qi,cijk->cqjk", D, u_cells, precision=precision)
    uy = jnp.einsum("qj,cijk->ciqk", D, u_cells, precision=precision)
    uz = jnp.einsum("qk,cijk->cijq", D, u_cells, precision=precision)
    c = coeff[:, None, None, None]
    fw0 = c * (g[..., 0] * ux + g[..., 1] * uy + g[..., 2] * uz)
    fw1 = c * (g[..., 1] * ux + g[..., 3] * uy + g[..., 4] * uz)
    fw2 = c * (g[..., 2] * ux + g[..., 4] * uy + g[..., 5] * uz)
    return (
        jnp.einsum("qi,cqjk->cijk", D, fw0, precision=precision)
        + jnp.einsum("qj,ciqk->cijk", D, fw1, precision=precision)
        + jnp.einsum("qk,cijq->cijk", D, fw2, precision=precision)
    )


def dss_laplacian_apply(x, lv, meta, precision="highest", sigma=0.0,
                        apply_bc=True):
    """Full matrix-free ``y = A x`` on the DSS dof vector (jittable).

    ``lv`` holds the device tables plus ``G (nc, n^3, 6)``, ``coeff
    (nc,)``, ``D (n, n)``, ``bc_marker`` and (when ``sigma``) the
    bc-zeroed lumped mass ``m3``. Semantics identical to
    `ops.laplacian.laplacian_apply` (bc zero on gather, identity rows)."""
    bc = lv["bc_marker"]
    xb = jnp.where(bc, jnp.zeros_like(x), x)
    u = dss_gather(xb, lv, meta)
    yc = apply_cells(u, lv["G"], lv["coeff"], lv["D"], precision=precision)
    y = dss_scatter(yc, lv, meta)
    if sigma:
        y = y + sigma * lv["m3"] * x
    if not apply_bc:
        return y
    return jnp.where(bc, x, y)


def dss_prolongate(xc, M1, lv_c, meta_c, lv_f, meta_f,
                   precision="highest"):
    """Coarse->fine p-transfer: cell-gather coarse, per-cell 1D-Kronecker
    interpolation, owner-write fine (values agree across sharers — the
    C0 interpolant; same semantics as `ops.interpolate.prolongate`)."""
    u = dss_gather(xc, lv_c, meta_c)
    v = jnp.einsum("ai,bj,ck,xijk->xabc", M1, M1, M1, u,
                   precision=precision)
    return dss_scatter(v, lv_f, meta_f, first=True)


def dss_restrict(xf, M1, lv_f, meta_f, lv_c, meta_c, inv_mult_f,
                 precision="highest"):
    """Fine->coarse multiplicity-weighted transpose transfer (same
    semantics as `ops.interpolate.restrict`)."""
    u = dss_gather(xf * inv_mult_f, lv_f, meta_f)
    v = jnp.einsum("ai,bj,ck,xabc->xijk", M1, M1, M1, u,
                   precision=precision)
    return dss_scatter(v, lv_c, meta_c)
