"""Per-degree kron_blocked tile sweep (VERDICT r4 item 6): at p=7/8 the
blocked Mosaic kernel with the p=6-tuned by=bx=8 tiles loses to the XLA
kron path (9.3 vs 11.1 GDOF/s at p=8/2M). Sweep (by, bx) for n=8..10 at
~2M dofs and report the per-degree winner so `PallasKronBlocked` /
`kron_blocked_cycle_ops` can dispatch tiles by degree.

Run on TPU from the repo root: `python tools/p8_tile_sweep.py
[--degrees 7 8]`. Prints one JSON line per degree. Self-limiting.
"""

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--degrees", type=int, nargs="+", default=[7, 8])
    ap.add_argument("--tiles", type=int, nargs="+",
                    default=[4, 6, 8, 12, 16])
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.kron import KronLaplacian, kron_laplacian_apply
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import PallasKronBlocked
    from pmg_dolfinx_tpu.utils.measure import measure as _measure

    for P in args.degrees:
        # ~2M dofs: nc such that (nc*P+1)^3 ~ 2.05e6 -> nc*P ~ 126
        nc = max(2, round(126 / P))
        mesh = BoxMesh((nc,) * 3)
        nd = mesh.num_dofs(P)
        shape = mesh.lattice_shape(P)
        x3 = jnp.ones(shape, jnp.float32)
        out = {"P": P, "nc": nc, "ndofs": nd}

        op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32,
                           precision="highest")
        bc3 = op.bc_marker.reshape(shape)

        @partial(jax.jit, static_argnums=(4,))
        def chain_xla(x, Ks, ms, bc, reps):
            def body(i, v):
                return kron_laplacian_apply(x + 1e-30 * v, Ks, ms, bc,
                                            precision="highest")
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        per, spread = _measure(
            lambda r: float(chain_xla(x3, op.Ks, op.ms, bc3, r)), 20, 100,
            min_samples=5)
        out["xla"] = round(nd / per / 1e9, 2)
        print(f"P={P} xla: {nd/per/1e9:.2f} GDOF/s", flush=True)

        best = ("xla", out["xla"])
        for by in args.tiles:
            for bx in args.tiles:
                try:
                    blk = PallasKronBlocked(mesh, P, kappa=2.0, by=by,
                                            bx=bx)

                    @partial(jax.jit, static_argnums=(1,))
                    def chain_blk(x, reps, _b=blk):
                        def body(i, v):
                            return _b._apply_impl(x + 1e-30 * v)
                        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

                    per, spread = _measure(
                        lambda r: float(chain_blk(x3, r)), 20, 100,
                        min_samples=5)
                    g = nd / per / 1e9
                    out[f"blk_{by}_{bx}"] = round(g, 2)
                    print(f"P={P} blk by={by} bx={bx}: {g:.2f} GDOF/s "
                          f"(spread {spread:.3f})", flush=True)
                    if g > best[1]:
                        best = (f"blk_{by}_{bx}", g)
                    del blk
                except Exception as e:
                    out[f"blk_{by}_{bx}"] = f"err: {e}"[:100]
                    print(f"P={P} blk by={by} bx={bx}: FAILED "
                          f"{str(e)[:120]}", flush=True)
        out["best"] = best[0]
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
