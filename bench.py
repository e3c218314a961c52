"""Benchmark harness: matrix-free p=6 Laplacian apply throughput (GDOF/s).

Mirrors the reference's operator micro-benchmark `mat_free --ndofs N`
(examples/mat_free/main.cpp:260-265: 1000 repeated matvecs under a timer,
the "% Mat-free Matvec" number; SURVEY.md §6). Baseline target from
BASELINE.md: >= 1 GDOF/s per chip for the sum-factorized p=6 apply.

Uses the production operator for the reference's own benchmark problem
(axis-aligned unit-cube mesh): the Kronecker-sum backend (ops/kron.py),
float32 with precision='highest' (true-f32 MXU matmuls; agrees with the
f64 assembled oracle to ~1e-7, verified in tests). The general-hex
lattice backend runs ~2 GDOF/s on the same problem (examples/mat_free.py
--operator lattice).

Timing methodology: the axon TPU tunnel's `block_until_ready` does not
reliably synchronize, so reps are chained inside one jitted `fori_loop`
with a scalar reduction forced to host; per-apply time is the slope
between two rep counts (subtracting launch/readback overhead).

Prints exactly ONE JSON line.
"""

import json
import time
from functools import partial

import jax
import jax.numpy as jnp


def main():
    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.kron import KronLaplacian, kron_laplacian_apply

    P = 6
    mesh = BoxMesh((21, 21, 21))  # ~2.05M dofs at p=6
    nd = mesh.num_dofs(P)
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32, precision="highest")
    x = jnp.ones(nd, dtype=jnp.float32)

    @partial(jax.jit, static_argnums=(4,))
    def chain(x, Ks, ms, bc, reps):
        def body(i, v):
            # Data-dependent perturbation prevents loop-invariant hoisting;
            # 1e-30 underflows against O(1) values so the input stays x.
            return kron_laplacian_apply(
                x + 1e-30 * v, Ks, ms, bc, precision="highest"
            )
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    def run(reps):
        return float(chain(x, op.Ks, op.ms, op.bc_marker, reps))

    # Warm up / compile both shapes.
    run(50)
    run(250)
    # Tunnel round-trip jitter is significant; take the median of
    # repeated slope measurements.
    slopes = []
    for _ in range(5):
        t0 = time.time()
        run(50)
        t_lo = time.time() - t0
        t0 = time.time()
        run(250)
        t_hi = time.time() - t0
        slopes.append((t_hi - t_lo) / 200)
    per_apply = sorted(slopes)[len(slopes) // 2]
    gdofs = nd / per_apply / 1e9
    print(
        json.dumps(
            {
                "metric": "matfree_laplacian_apply_p6_f32_kron",
                "value": round(gdofs, 3),
                "unit": "GDOF/s",
                "vs_baseline": round(gdofs / 1.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
