"""Benchmark harness: matrix-free p=6 Laplacian apply throughput (GDOF/s).

Mirrors the reference's operator micro-benchmark `mat_free --ndofs N`
(examples/mat_free/main.cpp:260-265: 1000 repeated matvecs under a timer,
the "% Mat-free Matvec" number; SURVEY.md §6). Baseline target from
BASELINE.md: >= 1 GDOF/s per chip for the sum-factorized p=6 apply.
Two problem sizes: 2.05M dofs (the round-1 config) and 16.2M dofs (the
reference profiles up to 30M dofs, examples/cg/submit_rocprof.sh — the
large-N regime where the dense axis contraction's O(N) flops/dof bound
bites; see the roofline note in README).

Uses the production operator for the reference's own benchmark problem
(axis-aligned unit-cube mesh): the Kronecker-sum backend (ops/kron.py),
float32 with precision='highest' (true-f32 MXU matmuls; agrees with the
f64 assembled oracle to ~1e-7, verified in tests), carrying
LATTICE-SHAPED vectors (the TPU-native layout — flat vectors would add
two physical relayouts per apply).

Timing methodology: the axon TPU tunnel's `block_until_ready` does not
reliably synchronize, so reps are chained inside one jitted loop with a
scalar reduction forced to host; per-apply time is the slope between two
rep counts (subtracting launch/readback overhead). The slope is sampled
repeatedly; the reported value is the median, and sampling widens until
the inner-quartile spread is below SPREAD_TARGET (or the attempt cap is
hit, in which case the spread is reported honestly in the JSON line).

Artifact contract (round-4 hardening; the r3 artifact was lost to an
external timeout, rc=124 with zero output): the headline JSON line is
emitted IMMEDIATELY after the first measurement, and the line is
RE-EMITTED with the enriched extras after every completed extra — the
driver records the LAST valid JSON line, so an external kill at any
point still captures everything measured up to it. Extras are also
time-boxed by BENCH_TIME_BUDGET_S (wall clock since process start,
default 2400 s — comfortably under any plausible driver budget): an
extra whose estimated cost does not fit the remaining budget is skipped
with an explicit "skipped_budget" marker instead of running the whole
bench into an rc=124 timeout.
"""

import os
import sys
import json
import time
import threading
from functools import partial

import jax
import jax.numpy as jnp

# The remote TPU worker goes down spontaneously (CLAUDE.md: observed
# multi-hour outages with zero client activity); device ENUMERATION
# still works while EXECUTION hangs forever. A hung bench leaves no
# artifact at all, which is strictly worse than an honest error line —
# so main() probes execution up-front (bounded retries) and arms a
# wall-clock watchdog for mid-run hangs. Both emit the single JSON
# line with value 0.0 + an "error" field instead of wedging.
PROBE_DEADLINE_S = float(os.environ.get("BENCH_PROBE_DEADLINE_S", 1800))
WALL_DEADLINE_S = float(os.environ.get("BENCH_WALL_DEADLINE_S", 7200))
# Extras time budget (seconds of wall clock since process start). Extras
# whose estimated cost exceeds the remaining budget are skipped with a
# "skipped_budget" marker so the process exits 0 well before the
# driver's external timeout (round-3 postmortem: rc=124, no artifact).
TIME_BUDGET_S = float(os.environ.get("BENCH_TIME_BUDGET_S", 2400))
_T_START = time.time()

_PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "print(float(jnp.sum(jnp.arange(8.0))), flush=True)\n"
)


def _tpu_alive(timeout=240):
    """True iff a tiny device EXECUTION completes, probed in a
    subprocess so a worker-outage hang times out here instead of
    wedging the bench process itself."""
    import subprocess

    try:
        r = subprocess.run(
            [sys.executable, "-c", _PROBE_SRC],
            timeout=timeout, capture_output=True, text=True,
        )
        return r.returncode == 0 and "28.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def _emit(payload):
    print(json.dumps(payload), flush=True)


# Shared with the tools/ scripts; lives in the package so importing it
# never re-executes this module's body (bench.py runs as __main__).
from pmg_dolfinx_tpu.utils.measure import measure as _measure  # noqa: E402


def _bench_size(nc, lo, hi):
    """Benchmark BOTH production kernels (XLA symmetrized kron and the
    blocked fused Pallas kernels) at this size; return the best plus the
    per-kernel detail."""
    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.ops.kron import KronLaplacian, kron_laplacian_apply
    from pmg_dolfinx_tpu.ops.pallas_kron_blocked import PallasKronBlocked

    P = 6
    mesh = BoxMesh((nc, nc, nc))
    nd = mesh.num_dofs(P)
    op = KronLaplacian(mesh, P, kappa=2.0, dtype=jnp.float32,
                       precision="highest")
    blk = PallasKronBlocked(mesh, P, kappa=2.0)
    blk_hi = PallasKronBlocked(mesh, P, kappa=2.0, precision="high")
    shape = mesh.lattice_shape(P)
    x3 = jnp.ones(shape, dtype=jnp.float32)
    bc3 = op.bc_marker.reshape(shape)

    @partial(jax.jit, static_argnums=(4,))
    def chain_xla(x, Ks, ms, bc, reps):
        def body(i, v):
            # Data-dependent perturbation prevents loop-invariant hoisting;
            # 1e-30 underflows against O(1) values so the input stays x.
            return kron_laplacian_apply(
                x + 1e-30 * v, Ks, ms, bc, precision="highest"
            )
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    # bc/mats deliberately closed over: +10% at 16.2M vs jit args (XLA
    # pre-lays-out constants for the Pallas operands; safe — Pallas
    # inputs are opaque to constant folding).
    @partial(jax.jit, static_argnums=(1,))
    def chain_blk(x, reps):
        def body(i, v):
            return blk._apply_impl(x + 1e-30 * v)
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    @partial(jax.jit, static_argnums=(1,))
    def chain_blk_hi(x, reps):
        def body(i, v):
            return blk_hi._apply_impl(x + 1e-30 * v)
        return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

    detail = {}
    for name, run in (
        ("xla", lambda r: float(chain_xla(x3, op.Ks, op.ms, bc3, r))),
        ("pallas_blocked", lambda r: float(chain_blk(x3, r))),
        # bf16x3 matmuls (~1e-5 error): the preconditioner-apply mode,
        # reported for visibility but NOT eligible for the headline
        # (the headline stays true-f32, ~1e-7 vs the f64 oracle).
        ("pallas_blocked_bf16x3", lambda r: float(chain_blk_hi(x3, r))),
    ):
        per_apply, spread = _measure(run, lo, hi)
        detail[name] = (nd / per_apply / 1e9, spread)
    exact = [k for k in detail if k != "pallas_blocked_bf16x3"]
    best = max(exact, key=lambda k: detail[k][0])
    return nd, detail[best][0], detail[best][1], best, detail


def _bench_vcycle_16m(smoother="cheb"):
    """16.2M-dof p=(1,3,6) V-cycle wall time (fdm coarse, f32 'highest')
    for the production kron_blocked backend, timed as the slope of the
    jitted cycle scan. (The XLA-kron twin measured 14.38 ms under the
    same harness — dropped from the routine run to keep the bench within
    its wall-time budget: each 16.2M hierarchy costs ~5 min of remote
    compiles, which the TPU plugin cannot cache.) ``smoother='schwarz'``
    pins the dense-form cell-wise FDM Schwarz cycle (the robustness
    smoother, ARTIFACTS/smoother16m_r3.md) — a deliberate second 16.2M
    hierarchy spend (~5 min), accepted within the 2 h watchdog budget
    because the dense-form claim is round-artifact-worthy; it runs LAST
    so an outage costs only this number."""
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.models.poisson import PoissonProblem

    out = {}
    for op in ("kron_blocked",):
        prob = PoissonProblem(nc=(42, 42, 42), degrees=(1, 3, 6), kappa=2.0,
                              dtype=jnp.float32, coarse="fdm", operator=op,
                              smoother=smoother)
        # The residual readback forces the host sync (block_until_ready
        # does not synchronize under the axon tunnel — CLAUDE.md).
        run = lambda n: float(prob.solve(num_cycles=n)[1][-1])
        per_cycle, spread = _measure(run, 4, 16, min_samples=5)
        out[op] = (per_cycle * 1e3, spread)
        del prob
    return out


def _bench_lattice_blocked_2m():
    """General-hex fused Mosaic lattice kernel at 2.05M dofs (box
    geometry carries the same cost as curved — identical kernel)."""
    import jax
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.solvers.pmg import PMGHierarchy

    P = 6
    mesh = BoxMesh((21, 21, 21))
    nd = mesh.num_dofs(P)
    out = {}
    for prec in ("highest", "high"):
        hier = PMGHierarchy(mesh, degrees=(P,), kappa=2.0,
                            dtype=jnp.float32, coarse="smoother",
                            operator="lattice_blocked", precision=prec)
        lv = hier.data["levels"][-1]
        level = hier.levels[-1]
        apply_op = hier.ops["apply"]

        @partial(jax.jit, static_argnums=(2,))
        def chain(lv_, x, reps):
            def body(i, v):
                return apply_op(lv_, x + 1e-30 * v, level)
            return jnp.sum(jax.lax.fori_loop(0, reps, body, x))

        x = jnp.ones((nd,), dtype=jnp.float32)
        run = lambda r: float(chain(lv, x, r))
        per_apply, spread = _measure(run, 20, 100, min_samples=5)
        out[prec] = (nd / per_apply / 1e9, spread)
        del hier
    return nd, out


def _bench_fdm_solve_2m():
    """Whole-system FDM direct solve at 2.05M dofs (constant kappa):
    the 6-matmul fast-diagonalization SOLVE wall time in ms."""
    import jax
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.solvers.fdm import FastDiagonalizationSolver

    P = 6
    mesh = BoxMesh((21, 21, 21))
    from pmg_dolfinx_tpu.solvers.fdm import fdm_solve

    fdm = FastDiagonalizationSolver(mesh, P, kappa=2.0, dtype=jnp.float32)
    shape = mesh.lattice_shape(P)
    b3 = jnp.ones(shape, dtype=jnp.float32)

    # Solver arrays are jit ARGUMENTS, not closures: the 2M-entry
    # dinv/bc lattices feed XLA matmul/elementwise graphs and would
    # constant-fold into the HLO otherwise (CLAUDE.md closure rule).
    @partial(jax.jit, static_argnums=(5, 6))
    def chain(b, Vs, Vts, dinv, bc, shp, reps):
        def body(i, v):
            return fdm_solve(b + 1e-30 * v, Vs, Vts, dinv, bc, shp)
        return jnp.sum(jax.lax.fori_loop(0, reps, body, b))

    run = lambda r: float(chain(b3, fdm.Vs, fdm.Vts, fdm.dinv,
                                fdm.bc_marker, shape, r))
    per_solve, spread = _measure(run, 50, 250, min_samples=5)
    return per_solve * 1e3, spread


def _bench_curved_2m():
    """Curved-hex (PerturbedBoxMesh) 2.05M p=(1,3,6) GENERAL-family
    flagship tracking (VERDICT r4 weak #3: the curved numbers lived
    only in ARTIFACTS/CLAUDE.md): V-cycle ms (slope-timed) + warm
    FCG(V) iteration count to 1e-6, for cheb AND Schwarz smoothers
    (lattice_blocked 'highest', cg coarse — the r3 flagship recipe at
    the 2M size whose setup compiles in ~1 min, unlike the ~10-30 min
    16.2M hierarchy)."""
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.mesh import PerturbedBoxMesh
    from pmg_dolfinx_tpu.models.poisson import PoissonProblem

    out = {}
    for sm in ("cheb", "schwarz"):
        prob = PoissonProblem(mesh=PerturbedBoxMesh((21, 21, 21)),
                              degrees=(1, 3, 6), kappa=2.0,
                              dtype=jnp.float32, coarse="cg",
                              operator="lattice_blocked", smoother=sm)
        run = lambda n: float(prob.solve(num_cycles=n)[1][-1])
        per_cycle, spread = _measure(run, 4, 16, min_samples=5)
        _, niter = prob.hierarchy.solve_pcg(prob.b, rtol=1e-6)  # warm
        _, niter = prob.hierarchy.solve_pcg(prob.b, rtol=1e-6)
        out[sm] = dict(vcycle_ms=round(per_cycle * 1e3, 3),
                       spread=round(spread, 3), fcg_iters=int(niter))
        del prob
    return out


def _bench_heat_steps_2m():
    """Scanned transient stepping throughput (VERDICT r4 weak #3: the
    steps/s numbers were driver-printed once in r4, never in the
    artifact): heat CN at 2.05M dofs p=3, constant kappa — one scanned
    FDM-step program, slope between two step counts (nsteps is a
    trace-time constant, so both programs are warmed first; the slope
    removes the per-call tunnel dispatch)."""
    import time as _time

    import numpy as np
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.mesh import BoxMesh
    from pmg_dolfinx_tpu.solvers.transient import heat_fdm_evolve

    mesh = BoxMesh((42, 42, 42))
    P = 3
    c = mesh.dof_coords(P)
    u0 = np.asarray(
        np.sin(np.pi * c[:, 0]) * np.sin(np.pi * c[:, 1])
        * np.sin(np.pi * c[:, 2]), dtype=np.float32)
    evolve = heat_fdm_evolve(mesh, P, kappa=2.0, dt=1e-4, scheme="cn",
                             dtype=jnp.float32)
    lo, hi = 200, 1000
    np.asarray(evolve(u0, lo))
    np.asarray(evolve(u0, hi))  # warm both step-count programs
    samples = []
    for _ in range(5):
        t0 = _time.time()
        np.asarray(evolve(u0, lo))
        t_lo = _time.time() - t0
        t0 = _time.time()
        np.asarray(evolve(u0, hi))
        samples.append(((_time.time() - t0) - t_lo) / (hi - lo))
    per_step = sorted(samples)[len(samples) // 2]
    return 1.0 / per_step


def _bench_unstructured_2m():
    """Fast unstructured (DSS row-gather) operator at 2.24M dofs p=6 on
    the L-shaped mesh (round-5 headline for the unstructured wedge;
    reference parity target: src/laplacian.hpp runs this topology at
    full speed). Slope-timed f32 'highest' apply; the rep count is a
    TRACED argument (a static trip count invites XLA to unroll the
    27-block concat graph — observed 45+ min compiles)."""
    import time as _time

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pmg_dolfinx_tpu.fem.geometry import (
        geometry_factors as _gf,
        quadrature_weights_3d as _qw,
        tabulate_geometry_dphi as _tg,
    )
    from pmg_dolfinx_tpu.fem.gll import derivative_matrix as _dm
    from pmg_dolfinx_tpu.fem.unstructured import l_shaped_hex_mesh
    from pmg_dolfinx_tpu.ops.unstructured import (
        dss_device_tables,
        dss_laplacian_apply,
        dss_meta,
    )

    Pdeg = 6
    mesh = l_shaped_hex_mesh(15)
    nd = mesh.num_dofs(Pdeg)
    lt = mesh.dss_layout(Pdeg)
    meta = dss_meta(lt)
    G_np, _ = _gf(mesh.geometry_x, mesh.geometry_dofmap, _tg(Pdeg),
                  _qw(Pdeg), xp=np)
    lv = dict(
        dss_device_tables(lt, dtype=jnp.float32),
        G=jnp.asarray(G_np, jnp.float32),
        coeff=jnp.full(mesh.ncells, 2.0, jnp.float32),
        D=jnp.asarray(_dm(Pdeg), jnp.float32),
        bc_marker=jnp.asarray(mesh.boundary_dof_marker(Pdeg)),
    )
    x = jnp.ones(nd, jnp.float32)

    @jax.jit
    def chain(reps, x_, lv_):
        def body(i, v):
            # Pure scaled linear chain: the scalar v[0] perturbation
            # used elsewhere blows this graph's TPU compile past 45 min
            # (measured); the 1e-4 scale keeps 40 chained applies in
            # f32 range.
            return 1e-4 * dss_laplacian_apply(v, lv_, meta,
                                              precision="highest")
        return jax.lax.fori_loop(0, reps, body, x_)[0]

    run = lambda r: float(chain(r, x, lv))
    per, spread = _measure(run, 10, 40, min_samples=5)
    return nd, nd / per / 1e9, spread


def _bench_packed_227k():
    """Lane-packed serving kernels at the MXU pad-cliff size (61^3 p=6):
    per-RHS apply GDOF/s ('highest' and 'high') + FDM direct-solve ms at
    batch 8 (tools/packed_bench.py carries the full sweep)."""
    from tools.packed_bench import bench_packed as _bp

    return _bp(lo=50, hi=250, batches=(8,))


def _fallback(extra, error):
    return {
        "metric": "matfree_laplacian_apply_p6_f32_kron",
        "value": 0.0,
        "unit": "GDOF/s",
        "vs_baseline": 0.0,
        "error": error,
        "extra": extra,
    }


def main():
    extra = {}

    # Gate on device EXECUTION before any real work: if the worker is
    # down, retry within PROBE_DEADLINE_S, then record the outage
    # honestly rather than hang on the first jit.
    t0 = time.time()
    while not _tpu_alive():
        waited = time.time() - t0
        if waited > PROBE_DEADLINE_S:
            _emit(_fallback(extra, (
                f"TPU worker unreachable for {int(waited)}s (execution "
                "probe hung; spontaneous worker outage — CLAUDE.md)"
            )))
            return
        print(f"bench: TPU execution probe failed after {int(waited)}s; "
              "retrying in 60s", file=sys.stderr, flush=True)
        time.sleep(60)
    if time.time() - t0 > 5:
        extra["probe_wait_s"] = round(time.time() - t0, 1)

    # Mid-run hang guard: the worker can die between the probe and the
    # last extra (remote compiles alone vary 2-5x between sessions).
    # The watchdog emits the best line available (the measured headline
    # if it exists, else the 0.0 fallback) and hard-exits.
    holder = {}

    def _watchdog():
        msg = (f"watchdog: wall deadline {int(WALL_DEADLINE_S)}s exceeded "
               "(worker hang mid-bench); extras collected so far included")
        if "result" in holder:
            holder["result"]["extra"]["watchdog"] = msg
            _emit(holder["result"])
        else:
            _emit(_fallback(extra, msg))
        os._exit(0)

    wd = threading.Timer(WALL_DEADLINE_S, _watchdog)
    wd.daemon = True
    wd.start()

    # 2.05M dofs: enough reps that the slope dwarfs tunnel jitter.
    # The headline number runs first; every extra is independently
    # fault-tolerant so one flaky remote compile (the tunnel's TPU
    # worker restarts spontaneously, CLAUDE.md) cannot wipe the whole
    # round artifact.
    try:
        nd_s, gdofs_s, spread_s, kern_s, det_s = _bench_size(21, 200, 1000)
    except Exception as e:  # noqa: BLE001 — record, don't wipe the line
        wd.cancel()
        _emit(_fallback(extra, f"headline: {type(e).__name__}: {e}"[:300]))
        return
    extra.update(
        ndofs=nd_s,
        kernel=kern_s,
        per_kernel_2M={k: round(v[0], 2) for k, v in det_s.items()},
    )

    # The headline line goes out the moment it exists — an external kill
    # during ANY extra still leaves a parseable artifact (the driver
    # records the last valid JSON line, so later re-emissions win).
    result = {
        "metric": "matfree_laplacian_apply_p6_f32_kron",
        "value": round(gdofs_s, 3),
        "unit": "GDOF/s",
        "vs_baseline": round(gdofs_s / 1.0, 3),
        "spread": round(spread_s, 3),
        "extra": extra,
    }
    holder["result"] = result
    _emit(result)

    def guarded(label, est_s, fn):
        """Run one extra: skip (with a marker) if its estimated cost
        does not fit the remaining time budget, record exceptions
        without aborting, and re-emit the enriched line on success."""
        import traceback

        elapsed = time.time() - _T_START
        if elapsed + est_s > TIME_BUDGET_S:
            extra[label] = "skipped_budget"
            print(f"bench: skipping {label} (elapsed {int(elapsed)}s + "
                  f"est {int(est_s)}s > budget {int(TIME_BUDGET_S)}s)",
                  file=sys.stderr, flush=True)
            return
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — record, keep benching
            extra[label + "_error"] = f"{type(e).__name__}: {e}"[:200]
            traceback.print_exc(file=sys.stderr)
        _emit(result)

    def bench_16m():
        # 16.2M dofs: ~1.2 ms/apply, fewer reps needed.
        nd_l, gdofs_l, spread_l, kern_l, det_l = _bench_size(42, 20, 100)
        extra.update(
            gdofs_16M=round(gdofs_l, 3), ndofs_16M=nd_l,
            spread_16M=round(spread_l, 3), kernel_16M=kern_l,
            per_kernel_16M={k: round(v[0], 2) for k, v in det_l.items()},
        )

    def bench_30m():
        # 30.4M dofs (N=313): the reference's rocprof profile size
        # (examples/cg/submit_rocprof.sh --ndofs 30000000).
        nd_x, gdofs_x, spread_x, kern_x, det_x = _bench_size(52, 10, 50)
        extra.update(
            gdofs_30M=round(gdofs_x, 3), ndofs_30M=nd_x,
            spread_30M=round(spread_x, 3), kernel_30M=kern_x,
            per_kernel_30M={k: round(v[0], 2) for k, v in det_x.items()},
        )

    def bench_vcycle():
        vcycle = _bench_vcycle_16m()
        extra["vcycle_16M_p136_fdm_ms"] = {
            k: round(v[0], 2) for k, v in vcycle.items()
        }

    def bench_lat():
        _, lat_blk = _bench_lattice_blocked_2m()
        extra["lattice_blocked_2M_gdofs"] = {
            k: round(v[0], 2) for k, v in lat_blk.items()
        }

    def bench_fdm():
        fdm_ms, _ = _bench_fdm_solve_2m()
        extra["fdm_solve_2M_ms"] = round(fdm_ms, 3)

    def bench_vcycle_schwarz():
        vcycle = _bench_vcycle_16m(smoother="schwarz")
        extra["vcycle_16M_p136_schwarz_ms"] = {
            k: round(v[0], 2) for k, v in vcycle.items()
        }

    def bench_curved():
        extra["curved_2M_p136"] = _bench_curved_2m()

    def bench_heat():
        extra["heat_cn_2M_steps_per_s"] = round(_bench_heat_steps_2m(), 1)

    def bench_unstructured():
        nd_u, gdofs_u, spread_u = _bench_unstructured_2m()
        extra["unstructured_dss_2M"] = dict(
            ndofs=nd_u, gdofs=round(gdofs_u, 3),
            spread=round(spread_u, 3))

    def bench_packed():
        # Lane-packed serving kernels at the 227k MXU pad-cliff size
        # (61^3, p=6): per-RHS apply GDOF/s and FDM direct-solve ms at
        # batch 8. Baselines: 11.8 GDOF/s single RHS, 12.7 vmapped b8.
        res = _bench_packed_227k()
        extra["packed_227k"] = {
            "apply_single_highest_gdofs": res["single_highest"]["gdofs"],
            "apply_single_highest_spread": res["single_highest"]["spread"],
            "apply_single_high_gdofs": res["single_high"]["gdofs"],
            "apply_b8_highest_gdofs_per_rhs":
                res["b8_highest"]["gdofs_per_rhs"],
            "apply_b8_high_gdofs_per_rhs": res["b8_high"]["gdofs_per_rhs"],
            "apply_b8_high_spread": res["b8_high"]["spread"],
            "fdm_b8_solve_ms_per_rhs": res["fdm_b8"]["solve_ms_per_rhs"],
            "fdm_single_solve_ms": res["fdm_single"]["solve_ms"],
        }

    # Priority order = value of the number to the round artifact, after
    # one cheap warmup-size extra. Estimated costs are conservative
    # remote-compile+measure figures (CLAUDE.md: remote compiles vary
    # 2-5x between sessions); the budget gate turns a would-be external
    # timeout into explicit skip markers. The expensive tail extras
    # (schwarz V-cycle, lattice_blocked) rotate across rounds rather
    # than running every time.
    guarded("fdm_solve_2M", 120, bench_fdm)
    guarded("unstructured_dss_2M", 300, bench_unstructured)
    guarded("16M", 420, bench_16m)
    guarded("30M", 420, bench_30m)
    guarded("vcycle_16M", 540, bench_vcycle)
    guarded("curved_2M", 300, bench_curved)
    guarded("heat_cn_2M", 240, bench_heat)
    guarded("packed_227k", 300, bench_packed)
    guarded("lattice_blocked_2M", 240, bench_lat)
    guarded("vcycle_16M_schwarz", 540, bench_vcycle_schwarz)
    wd.cancel()
    _emit(result)


if __name__ == "__main__":
    main()
