"""Measure the lattice_blocked 'ym' variant (merged-plane z dots +
shared operand splits) against the production variants on the real TPU.

Sizes: 2.05M (21^3 cells) and 16.2M (42^3) at p=6; box geometry carries
the same kernel cost as curved (identical code path). Self-limiting;
prints one JSON line at the end and partial lines as it goes.
"""

import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pmg_dolfinx_tpu.fem.mesh import BoxMesh  # noqa: E402
from pmg_dolfinx_tpu.ops.pallas_lattice_blocked import (  # noqa: E402
    PallasLatticeBlocked,
)
from pmg_dolfinx_tpu.utils.measure import measure  # noqa: E402


def bench(nc, configs, lo, hi):
    mesh = BoxMesh((nc, nc, nc))
    P = 6
    nd = mesh.num_dofs(P)
    x = jnp.ones((nd,), jnp.float32)
    out = {}
    for variant, prec in configs:
        t0 = time.time()
        op = PallasLatticeBlocked(mesh, P, kappa=2.0, precision=prec,
                                  variant=variant)

        # Gt/bc as jit ARGS: a closed-over geometry slab overflows the
        # remote-compile payload (HTTP 413 — CLAUDE.md closure rule).
        @partial(jax.jit, static_argnums=(3,))
        def chain(v, Gt, bc, reps, op=op):
            def body(i, u):
                return op._apply_impl(v + 1e-30 * u, op.mats, Gt, bc)

            return jnp.sum(jax.lax.fori_loop(0, reps, body, v))

        per, spread = measure(
            lambda r: float(chain(x, op.Gt, op.bc_marker, r)), lo, hi,
            min_samples=4)
        key = f"{variant}_{prec}"
        out[key] = dict(gdofs=round(nd / per / 1e9, 3),
                        spread=round(spread, 3),
                        setup_s=round(time.time() - t0, 1))
        print(f"[{nc}^3 {key}] {out[key]}", flush=True)
        del op
    return nd, out


def main():
    res = {}
    nd, res["2M"] = bench(21, [("yexp", "highest"), ("ym", "highest"),
                               ("ym", "high"), ("v1", "high")], 20, 100)
    nd16, res["16M"] = bench(42, [("yexp", "highest"), ("ym", "highest"),
                                  ("ym", "high")], 8, 40)
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
