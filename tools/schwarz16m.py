"""Production-size smoother shootout: Chebyshev(point-Jacobi) vs the
cell-wise FDM Schwarz smoother (solvers/schwarz.py) at 16.2M dofs,
p=(1,3,6), kron_blocked operator, FDM coarse, f32 'highest' — the
configuration behind the pinned 13.0 ms/cycle number.

The Schwarz preconditioner contracts ~3.4x more per cycle at small
sizes (0.12 vs 0.41, tests/test_schwarz.py) for roughly one extra
operator-sized pass per smoother application, so it can win
TIME-TO-SOLUTION even if the per-cycle cost rises. This measures, on
the real TPU:

- per-cycle time for both smoothers (bench.py slope methodology);
- cycles and wall time to rel residual < 1e-8 (stationary iteration);
- FCG(V) iteration counts and per-solve time to rtol 1e-8.

Run from the repo root: `python tools/schwarz16m.py [--ndofs N]`.
Prints one JSON line. Self-limiting (no external timeout kills).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from pmg_dolfinx_tpu.utils.measure import measure as _measure  # noqa: E402
from pmg_dolfinx_tpu.models.poisson import (  # noqa: E402
    PoissonProblem,
    fit_box_cells,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ndofs", type=float, default=16.2e6)
    ap.add_argument("--cycles", type=int, default=12)
    ap.add_argument("--cpu", action="store_true",
                    help="tiny-size logic check on CPU (timings "
                         "meaningless; Mosaic kernels interpreted)")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    nc = fit_box_cells(args.ndofs, 6)
    out = {}
    for sm in ("cheb", "schwarz"):
        prob = PoissonProblem(nc=nc, degrees=(1, 3, 6), kappa=2.0,
                              dtype=jnp.float32, coarse="fdm",
                              operator="kron_blocked", smoother=sm)
        nd = prob.mesh.num_dofs(6)
        run = lambda n: float(prob.solve(num_cycles=n)[1][-1])
        per_cycle, spread = _measure(run, 2, 8, min_samples=5)
        _, rn = prob.solve(num_cycles=args.cycles)
        rn = np.asarray(rn, np.float64)
        rel = rn / rn[0]
        hit = np.nonzero(rel < 1e-6)[0]
        cyc6 = int(hit[0]) + 1 if hit.size else None
        # Per-cycle contraction from the early cycles (before the f32
        # residual floor flattens the trajectory).
        k = min(5, len(rel))
        contraction = float(rel[k - 1] ** (1.0 / k))
        # FCG(V) to the same 1e-6 target as the pinned 116 ms number.
        u, it = prob.hierarchy.solve_pcg(prob.b, rtol=1e-6, maxiter=40)
        import time

        t0 = time.time()  # warm repeat (compile + first-run cost excluded)
        _, it2 = prob.hierarchy.solve_pcg(prob.b, rtol=1e-6, maxiter=40)
        fcg_s = time.time() - t0
        out[sm] = dict(
            ms_per_cycle=round(per_cycle * 1e3, 3),
            spread=round(spread, 3),
            contraction=round(contraction, 4),
            cycles_to_1em6=cyc6,
            ms_to_1em6=(round(per_cycle * 1e3 * cyc6, 1)
                        if cyc6 else None),
            fcg_iters=int(it),
            fcg_warm_s=round(fcg_s, 3),
        )
        print(f"[{sm}] {out[sm]}", flush=True)
    out["ndofs"] = int(np.prod([c * 6 + 1 for c in nc]))
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
