"""Indexed-memory primitive costs on the real TPU (round-5 design probe
for the fast unstructured-hex operator, VERDICT r4 item 1).

The unstructured apply is gather -> cell-batched contraction ->
scatter-add (reference src/laplacian.hpp:143-278 runs this shape at
full speed on GPUs via atomicAdd). On TPU the dofmap backend measures
0.04 GDOF/s and the blame is conventionally put on XLA scatter being
serial — but the DESIGN decision (gather-table scatter replacement vs
face/edge/vertex DSS vs coloring) hinges on the per-primitive numbers,
which have never been measured here in isolation:

- elem_gather_S      x[dm]            S=3.18M elements from N=2.05M
- elem_gather_pib    same, promise_in_bounds (skips the clamp)
- scatter_add        zeros.at[dm].add(s)     (the current sink)
- table_scatter      multiplicity-class gather tables: scatter-add
                     replaced by sum_k sv[tab_m[:, k]] per class + concat
                     (zero scatter ops; needs class-sorted dof order)
- table_scatter_2d   same via one 2D-output gather sv[tab].sum(1)
- segment_sum        jax.ops.segment_sum on slot-sorted values
- cumsum_S           jnp.cumsum over S (the prefix-sum alternative)
- row_gather_128     (60k, 128) f32 row gather (the DSS face-row shape)
- cells_apply        laplacian_apply_cells at 9.2k cells n=7 (MXU part)
- full_chain         gather -> cells -> table_scatter (the candidate op)
- chain_overhead     the rep-chaining add pass itself (subtract mentally)

Indices come from a real BoxMesh p=6 dofmap (same multiplicity classes
1/2/4/8 and locality statistics as a well-ordered unstructured hex
mesh). Run from the repo root on TPU: `python tools/gather_bench.py`
(add --cpu for a smoke run). Prints one JSON line. Self-limiting.
"""

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def build_tables(dmf, ndofs):
    """Multiplicity-class slot tables: list of (c_m, m) int32 arrays of
    slot indices, one per multiplicity value, dofs class-sorted."""
    order = np.argsort(dmf, kind="stable")
    counts = np.bincount(dmf, minlength=ndofs)
    offs = np.concatenate([[0], np.cumsum(counts)])
    tables = []
    for m in sorted(set(counts.tolist())):
        dofs_m = np.where(counts == m)[0]
        idx = offs[dofs_m][:, None] + np.arange(m)[None, :]
        tables.append(np.ascontiguousarray(order[idx].astype(np.int32)))
    return tables


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--nc", type=int, default=21)
    ap.add_argument("--widths", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    if args.widths:
        return row_widths_probe()
    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.laplacian import laplacian_apply_cells
    from pmg_dolfinx_tpu.utils.measure import measure as _measure

    P = 6
    n = P + 1
    mesh = BoxMesh((args.nc,) * 3)
    dm = np.asarray(mesh.dofmap(P))
    ncells = dm.shape[0]
    nd = mesh.num_dofs(P)
    S = dm.size
    dmf = dm.ravel()
    tables = build_tables(dmf, nd)
    print(f"ncells={ncells} ndofs={nd} slots={S} "
          f"classes={[t.shape for t in tables]}", flush=True)

    dmj = jnp.asarray(dmf)
    tabs = [jnp.asarray(t) for t in tables]
    x = jnp.ones(nd, dtype=jnp.float32)
    s = jnp.ones(S, dtype=jnp.float32)
    from pmg_dolfinx_tpu.fem.geometry import (
        geometry_factors, quadrature_weights_3d, tabulate_geometry_dphi)
    from pmg_dolfinx_tpu.fem.gll import derivative_matrix

    G_np, _ = geometry_factors(
        mesh.geometry_x, mesh.geometry_dofmap, tabulate_geometry_dphi(P),
        quadrature_weights_3d(P), xp=np)
    G = jnp.asarray(G_np, dtype=jnp.float32)
    coeff = jnp.ones(ncells, dtype=jnp.float32)
    D = jnp.asarray(derivative_matrix(P), dtype=jnp.float32)

    nrows = 60000
    rng = np.random.default_rng(0)
    T = jnp.ones((nrows, 128), dtype=jnp.float32)
    ridx = jnp.asarray(rng.integers(0, nrows, nrows).astype(np.int32))

    def table_scatter(sv, tabs_):
        parts = []
        for t in tabs_:
            v = sv[t[:, 0]]
            for k in range(1, t.shape[1]):
                v = v + sv[t[:, k]]
            parts.append(v)
        return jnp.concatenate(parts)

    def table_scatter_2d(sv, tabs_):
        return jnp.concatenate([sv[t].sum(axis=1) for t in tabs_])

    J = partial(jax.jit, static_argnums=(0,))

    @J
    def c_overhead(reps, v):
        def body(i, v):
            return v + 1e-30 * v[0]
        return jax.lax.fori_loop(0, reps, body, v)[0]

    @J
    def c_gather(reps, v, idx):
        def body(i, v):
            y = v[idx]
            return v + 1e-30 * y[0]
        return jax.lax.fori_loop(0, reps, body, v)[0]

    @J
    def c_gather_pib(reps, v, idx):
        def body(i, v):
            y = v.at[idx].get(mode="promise_in_bounds")
            return v + 1e-30 * y[0]
        return jax.lax.fori_loop(0, reps, body, v)[0]

    @J
    def c_scatter_add(reps, sv, idx):
        def body(i, sv):
            z = jnp.zeros(nd, jnp.float32).at[idx].add(sv, mode="drop")
            return sv + 1e-30 * z[0]
        return jax.lax.fori_loop(0, reps, body, sv)[0]

    @J
    def c_table(reps, sv, *tabs_):
        def body(i, sv):
            y = table_scatter(sv, tabs_)
            return sv + 1e-30 * y[0]
        return jax.lax.fori_loop(0, reps, body, sv)[0]

    @J
    def c_table2d(reps, sv, *tabs_):
        def body(i, sv):
            y = table_scatter_2d(sv, tabs_)
            return sv + 1e-30 * y[0]
        return jax.lax.fori_loop(0, reps, body, sv)[0]

    @J
    def c_segsum(reps, sv, seg):
        def body(i, sv):
            y = jax.ops.segment_sum(sv, seg, num_segments=nd,
                                    indices_are_sorted=True)
            return sv + 1e-30 * y[0]
        return jax.lax.fori_loop(0, reps, body, sv)[0]

    @J
    def c_cumsum(reps, sv):
        def body(i, sv):
            y = jnp.cumsum(sv)
            return sv + 1e-30 * y[-1]
        return jax.lax.fori_loop(0, reps, body, sv)[0]

    @J
    def c_rowgather(reps, T_, idx):
        def body(i, T_):
            Y = T_[idx]
            return T_ + 1e-30 * Y[0, 0]
        return jax.lax.fori_loop(0, reps, body, T_)[0, 0]

    @J
    def c_cells(reps, u, G_, coeff_, D_):
        def body(i, u):
            y = laplacian_apply_cells(u, G_, coeff_, D_)
            return u + 1e-30 * y
        return jax.lax.fori_loop(0, reps, body, u)[0, 0, 0, 0]

    @J
    def c_full(reps, v, idx, G_, coeff_, D_, *tabs_):
        def body(i, v):
            u = v[idx].reshape(ncells, n, n, n)
            y = laplacian_apply_cells(u, G_, coeff_, D_)
            return v + 1e-30 * table_scatter(y.reshape(-1), tabs_)
        return jax.lax.fori_loop(0, reps, body, v)[0]

    seg_sorted = jnp.asarray(np.sort(dmf))
    sv_sorted = jnp.ones(S, dtype=jnp.float32)
    u0 = jnp.ones((ncells, n, n, n), dtype=jnp.float32)

    runs = [
        ("chain_overhead", lambda r: float(c_overhead(r, x)), 50, 250),
        ("elem_gather_S", lambda r: float(c_gather(r, jnp.ones(max(nd, S),
         jnp.float32), dmj)), 5, 20),
        ("elem_gather_pib", lambda r: float(c_gather_pib(r, jnp.ones(
         max(nd, S), jnp.float32), dmj)), 5, 20),
        ("scatter_add", lambda r: float(c_scatter_add(r, s, dmj)), 2, 6),
        ("table_scatter", lambda r: float(c_table(r, s, *tabs)), 5, 20),
        ("table_scatter_2d", lambda r: float(c_table2d(r, s, *tabs)), 5, 20),
        ("segment_sum", lambda r: float(c_segsum(r, sv_sorted, seg_sorted)),
         2, 6),
        ("cumsum_S", lambda r: float(c_cumsum(r, s)), 5, 20),
        ("row_gather_128", lambda r: float(c_rowgather(r, T, ridx)), 10, 40),
        ("cells_apply", lambda r: float(c_cells(r, u0, G, coeff, D)), 5, 20),
        ("full_chain", lambda r: float(c_full(r, x, dmj, G, coeff, D,
                                              *tabs)), 5, 20),
    ]
    out = {}
    for name, run, lo, hi in runs:
        try:
            per, spread = _measure(run, lo, hi, min_samples=5)
            out[name] = dict(ms=per * 1e3, spread=round(spread, 3))
            print(f"{name}: {per*1e3:.3f} ms (spread {spread:.3f})",
                  flush=True)
        except Exception as e:  # keep probing the rest
            out[name] = dict(error=str(e)[:200])
            print(f"{name}: FAILED {e}", flush=True)
    out["full_chain_gdofs"] = (
        nd / out["full_chain"]["ms"] / 1e6
        if "ms" in out.get("full_chain", {}) else None)
    print(json.dumps(dict(ndofs=nd, slots=S, results=out)), flush=True)




def row_widths_probe():
    """Follow-up probe: row-gather cost vs row width (1/8/32/128) at the
    DSS-relevant row counts — run with --widths."""
    import jax
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.utils.measure import measure as _measure

    rng = np.random.default_rng(0)
    out = {}
    for nrows, w in ((74088, 1), (111132, 8), (55566, 32), (55566, 128),
                     (9261, 128)):
        T = jnp.ones((nrows, w), dtype=jnp.float32)
        idx = jnp.asarray(rng.integers(0, nrows, nrows).astype(np.int32))

        @partial(jax.jit, static_argnums=(0,))
        def chain(reps, T_, idx_):
            def body(i, T_):
                Y = T_[idx_]
                return T_ + 1e-30 * Y[0, 0]
            return jax.lax.fori_loop(0, reps, body, T_)[0, 0]

        per, spread = _measure(lambda r: float(chain(r, T, idx)), 10, 40,
                               min_samples=5)
        out[f"{nrows}x{w}"] = dict(ms=per * 1e3, spread=round(spread, 3))
        print(f"row_gather {nrows}x{w}: {per*1e3:.3f} ms "
              f"(spread {spread:.3f})", flush=True)
    print(json.dumps(out), flush=True)

if __name__ == "__main__":
    main()
