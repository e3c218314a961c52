"""Lane-packed multi-RHS apply throughput on the real TPU.

Measures the small-N serving kernel (`ops/pallas_kron_packed.py`) at
p=6 / ~227k dofs (61^3 lattice, the MXU pad-cliff size): per-RHS GDOF/s
for batch 2 and 8, 'highest' and 'high', packed-resident (pack once,
chain applies on the packed layout — the serving steady state).
Baselines (tools/batched_bench.py, same size): 11.8 GDOF/s single RHS,
12.7 per-RHS vmapped batch-8.

Run from the repo root: `python tools/packed_bench.py [--cpu]`.
Prints one JSON line. Self-limiting (no external timeout kills).
"""

import argparse
import json
import os
import sys
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pmg_dolfinx_tpu.utils.measure import measure as _measure  # noqa: E402


def _chain_measure(step, P0, lo, hi):
    @partial(jax.jit, static_argnums=(1,))
    def chain(P3, reps):
        def body(i, V):
            return step(P3 + 1e-30 * V)

        return jnp.sum(jax.lax.fori_loop(0, reps, body, P3))

    return _measure(lambda r: float(chain(P0, r)), lo, hi, min_samples=5)


def bench_packed(nc=(10, 10, 10), P=6, lo=50, hi=250, batches=(2, 8),
                 single=True):
    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.pallas_kron_packed import (
        PackedFDMBatch,
        PackedKronBatch,
        PackedKronSingle,
    )

    mesh = BoxMesh(nc)
    nd = mesh.num_dofs(P)
    out = {"ndofs": nd}
    if single:
        # SINGLE-RHS x-slab lane packing (the r4 pad-cliff kernel);
        # baseline: 11.8 GDOF/s plain kron apply at 61^3.
        for prec in ("highest", "high"):
            op = PackedKronSingle(mesh, P, kappa=2.0, precision=prec)
            P0 = op.pack(jnp.ones(mesh.lattice_shape(P), jnp.float32))
            # ~8 us/apply: long chains beat the tunnel jitter floor.
            per, spread = _chain_measure(op._apply_impl, P0,
                                         40 * lo, 32 * hi)
            key = f"single_{prec}"
            out[key] = dict(
                gdofs=round(nd / per / 1e9, 3),
                spread=round(spread, 3),
            )
            print(f"[packed {key}] {out[key]}", flush=True)
        from pmg_dolfinx_tpu.ops.pallas_kron_packed import PackedFDMSingle

        fdm1 = PackedFDMSingle(mesh, P, kappa=2.0)
        P0 = fdm1.pack(jnp.ones(mesh.lattice_shape(P), jnp.float32))
        per, spread = _chain_measure(fdm1._solve_impl, P0, 40 * lo,
                                     32 * hi)
        out["fdm_single"] = dict(solve_ms=round(1e3 * per, 4),
                                 spread=round(spread, 3))
        print(f"[packed fdm_single] {out['fdm_single']}", flush=True)
    for B in batches:
        for prec in ("highest", "high"):
            op = PackedKronBatch(mesh, P, kappa=2.0, B=B, precision=prec)
            P0 = op.pack(jnp.ones((B,) + mesh.lattice_shape(P),
                                  jnp.float32))
            per, spread = _chain_measure(op._apply_impl, P0, lo, hi)
            key = f"b{B}_{prec}"
            out[key] = dict(
                gdofs_per_rhs=round(B * nd / per / 1e9, 3),
                spread=round(spread, 3),
            )
            print(f"[packed {key}] {out[key]}", flush=True)
        fdm = PackedFDMBatch(mesh, P, kappa=2.0, B=B)
        P0 = fdm.pack(jnp.ones((B,) + mesh.lattice_shape(P), jnp.float32))
        per, spread = _chain_measure(fdm._solve_impl, P0, lo, hi)
        out[f"fdm_b{B}"] = dict(
            solve_ms_per_rhs=round(1e3 * per / B, 4),
            spread=round(spread, 3),
        )
        print(f"[packed fdm_b{B}] {out[f'fdm_b{B}']}", flush=True)
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true",
                    help="tiny logic check on CPU (timings meaningless)")
    args = ap.parse_args()
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    tiny = dict(nc=(4, 4, 4), P=3, lo=2, hi=6) if args.cpu else {}
    print(json.dumps(bench_packed(**tiny)), flush=True)


if __name__ == "__main__":
    main()
