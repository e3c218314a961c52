"""Time the 100M-dof p=(1,3,6) V-cycle on the real TPU (kron_blocked,
fdm coarse, f32 'highest') — the 3.3x-reference-profile-size solve item
from the round-3 measurement queue (CLAUDE.md). The matching apply
measured 7.09 GDOF/s (ARTIFACTS/large_n_r3.md); the earlier V-cycle
attempt died when the remote TPU worker went down mid-setup.

Run from the repo root: `python tools/vcycle100m.py`.
Prints one JSON line. Self-limiting: reuses bench.py's slope
methodology (block_until_ready does not sync under the axon tunnel).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402

from pmg_dolfinx_tpu.utils.measure import measure as _measure  # noqa: E402
from pmg_dolfinx_tpu.models.poisson import PoissonProblem  # noqa: E402


def main():
    # fit_box_cells(100e6, 6) -> 72x78x82 cells = 100.117M dofs at p=6.
    prob = PoissonProblem(nc=(72, 78, 82), degrees=(1, 3, 6), kappa=2.0,
                          dtype=jnp.float32, coarse="fdm",
                          operator="kron_blocked")
    nd = prob.mesh.num_dofs(6)
    print(f"ndofs={nd / 1e6:.3f}M, degrees (1,3,6), coarse=fdm, "
          f"operator=kron_blocked", flush=True)
    # Residual readback per call forces the host sync.
    run = lambda n: float(prob.solve(num_cycles=n)[1][-1])
    per_cycle, spread = _measure(run, 2, 8, min_samples=5)
    _, rn = prob.solve(num_cycles=8)
    rel = float(rn[-1] / rn[0])
    print(json.dumps({
        "vcycle_100M_p136_fdm_ms": round(per_cycle * 1e3, 3),
        "spread": round(spread, 3),
        "ndofs": int(nd),
        "rel_residual_8_cycles": rel,
    }), flush=True)


if __name__ == "__main__":
    main()
