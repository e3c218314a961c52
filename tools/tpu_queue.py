"""Watch the remote TPU worker and drain the round-3 measurement queue
the moment it recovers (CLAUDE.md "remaining ideas / TPU measurement
queue"). The worker goes down spontaneously for hours; this runner makes
sure no recovery window is wasted.

Discipline (CLAUDE.md environment gotchas):
- ONE TPU process at a time: items run strictly sequentially.
- Probe EXECUTION (tiny jnp.sum in a subprocess), not jax.devices() —
  enumeration works while execution hangs during an outage.
- Prefer self-limiting items; the per-item wall cap is a LAST resort
  (if an item hangs past it, the worker is already wedged — killing the
  client can't make a dead worker deader).
- Items whose stderr shows a transport/worker outage stay PENDING and
  the runner drops back into the probe loop; real failures (parity
  mismatch, Mosaic lowering error) are PERMANENT and skip dependents.

State in /tmp/tpu_q/state.json, per-item logs /tmp/tpu_q/<name>.log.
Run from the repo root: `nohup python tools/tpu_queue.py &`.

A follow-up queue can be supplied as JSON (list of
``[name, argv, cap_s, depends_on]``): `python tools/tpu_queue.py
--items tools/queue_r3b.json --dir /tmp/tpu_q_r3b`.
"""

import json
import os
import re
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QDIR = "/tmp/tpu_q"
STATE = os.path.join(QDIR, "state.json")
PROBE_SRC = (
    "import jax, jax.numpy as jnp\n"
    "print(float(jnp.sum(jnp.arange(8.0))), flush=True)\n"
)
OUTAGE_RE = re.compile(
    r"UNAVAILABLE|Connection (refused|Failed)|transport:|"
    r"worker process crashed|DEADLINE_EXCEEDED", re.I)

MF = [sys.executable, os.path.join(REPO, "examples", "mat_free.py")]
ZG = ["--operator", "lattice_blocked", "--variant", "zgrp", "--degree", "6"]

# (name, argv, last-resort wall cap seconds, depends-on or None)
ITEMS = [
    ("kron_spot", MF + ["--operator", "kron", "--degree", "6",
                        "--ndofs", "2050000", "--reps", "500"], 2400, None),
    ("zgrp_parity", MF + ZG + ["--ndofs", "200000", "--reps", "100",
                               "--mat_comp"], 2400, None),
    ("zgrp_2m_highest", MF + ZG + ["--ndofs", "2050000", "--reps", "300"],
     3600, "zgrp_parity"),
    ("zgrp_2m_high", MF + ZG + ["--ndofs", "2050000", "--reps", "300",
                                "--precision", "high"], 3600, "zgrp_parity"),
    ("zgrp_16m_highest", MF + ZG + ["--ndofs", "16200000", "--reps", "60"],
     5400, "zgrp_parity"),
    ("zgrp_16m_high", MF + ZG + ["--ndofs", "16200000", "--reps", "60",
                                 "--precision", "high"], 5400, "zgrp_parity"),
    ("vcycle_100m", [sys.executable, os.path.join(REPO, "tools",
                                                  "vcycle100m.py")],
     7200, None),
    # Line-relaxation smoother on real TPU (solvers/line.py): 500k-dof
    # p=(1,3) per-axis 100:1 anisotropy — measures the batched
    # block-matvec cost in the V-cycle + FCG count. (Setup assembles
    # the global matrix on host for the blocks: ndofs*(2P+1)^3 nnz
    # bounds the feasible size, ~1.7e8 here; p=6 at 2M+ is infeasible.)
    ("line_aniso_500k", [sys.executable, os.path.join(REPO, "examples",
                                                      "pmg.py"),
                         "--ndofs", "500000", "--degrees", "1", "3",
                         "--kappa-field", "aniso-diag", "--coarse", "hmg",
                         "--operator", "kron", "--smoother", "line",
                         "--hmg-smoother", "line", "--pcg", "--warm"],
     5400, None),
    # Cell-FDM Schwarz smoother at production size (solvers/schwarz.py;
    # no assembly in setup — scales): isotropic 2.05M p=(1,3,6) FCG,
    # measures the V+Vt batched-matmul smoother cost vs point Jacobi.
    ("schwarz_iso_2m", [sys.executable, os.path.join(REPO, "examples",
                                                     "pmg.py"),
                        "--ndofs", "2000000", "--degrees", "1", "3", "6",
                        "--operator", "kron", "--coarse", "fdm",
                        "--smoother", "schwarz", "--pcg", "--warm"],
     5400, None),
    # Full bench last: self-limiting (own probe gate + watchdog), and a
    # fresh successful run validates the round-end artifact path early.
    ("bench_full", [sys.executable, os.path.join(REPO, "bench.py")],
     9000, None),
]


def load_state():
    try:
        with open(STATE) as f:
            return json.load(f)
    except Exception:
        return {}


def save_state(st):
    with open(STATE, "w") as f:
        json.dump(st, f, indent=1)


def log(msg):
    print(f"{time.strftime('%m-%d %H:%M:%S')} {msg}", flush=True)


def tpu_alive():
    try:
        r = subprocess.run([sys.executable, "-c", PROBE_SRC], timeout=240,
                           capture_output=True, text=True)
        return r.returncode == 0 and "28.0" in r.stdout
    except subprocess.TimeoutExpired:
        return False


def run_item(name, argv, cap):
    out_path = os.path.join(QDIR, f"{name}.log")
    log(f"RUN {name} (cap {cap}s): {' '.join(argv[1:])}")
    t0 = time.time()
    with open(out_path, "w") as out:
        try:
            r = subprocess.run(argv, cwd=REPO, stdout=out,
                               stderr=subprocess.STDOUT, timeout=cap)
            rc = r.returncode
        except subprocess.TimeoutExpired:
            log(f"  {name}: HUNG past {cap}s cap (worker wedged?) -> pending")
            return "pending_outage"
    dt = time.time() - t0
    text = open(out_path).read()
    if rc == 0:
        tail = text.strip().splitlines()[-1] if text.strip() else ""
        log(f"  {name}: OK in {dt:.0f}s | {tail[:160]}")
        if name == "zgrp_parity":
            m = re.search(r"= ([0-9.e+-]+)\s*$", text, re.M)
            if m and float(m.group(1)) > 1e-4:
                log(f"  {name}: parity ERROR too large ({m.group(1)})")
                return "failed"
        return "done"
    if OUTAGE_RE.search(text):
        log(f"  {name}: worker outage mid-run (rc={rc}) -> pending")
        return "pending_outage"
    log(f"  {name}: FAILED rc={rc} | {text.strip().splitlines()[-1][:160]}")
    return "failed"


def main():
    global QDIR, STATE, ITEMS
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--items", default=None,
                    help="JSON file: list of [name, argv, cap_s, dep]")
    ap.add_argument("--dir", default=None,
                    help="state/log directory (default /tmp/tpu_q, or "
                         "/tmp/tpu_q_<items-stem> when --items is given "
                         "so a follow-up queue never shares state — a "
                         "name collision would mark its items done "
                         "without running them)")
    args = ap.parse_args()
    if args.dir is None:
        args.dir = ("/tmp/tpu_q_" + os.path.splitext(
            os.path.basename(args.items))[0] if args.items else QDIR)
    QDIR, STATE = args.dir, os.path.join(args.dir, "state.json")
    if args.items:
        with open(args.items) as f:
            ITEMS = [(n, [a if a != "PYTHON" else sys.executable
                          for a in argv], cap, dep)
                     for n, argv, cap, dep in json.load(f)]
    os.makedirs(QDIR, exist_ok=True)
    st = load_state()
    while True:
        pending = [it for it in ITEMS
                   if st.get(it[0]) not in ("done", "failed", "skipped")]
        if not pending:
            log("queue drained: " + json.dumps(st))
            with open(os.path.join(QDIR, "DONE"), "w") as f:
                json.dump(st, f)
            return
        if not tpu_alive():
            log(f"TPU down ({len(pending)} items pending); sleep 300")
            time.sleep(300)
            continue
        log(f"TPU UP — {len(pending)} items pending")
        for name, argv, cap, dep in ITEMS:
            if st.get(name) in ("done", "failed", "skipped"):
                continue
            if dep and st.get(dep) != "done":
                if st.get(dep) == "failed":
                    st[name] = "skipped"
                    save_state(st)
                    log(f"  {name}: skipped (dependency {dep} failed)")
                continue
            res = run_item(name, argv, cap)
            if res == "pending_outage":
                break  # back to the probe loop
            st[name] = res
            save_state(st)
        time.sleep(60)


if __name__ == "__main__":
    main()
