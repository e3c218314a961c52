"""Shared CLI plumbing for the example drivers."""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def base_parser(description):
    p = argparse.ArgumentParser(description=description)
    p.add_argument("--ndofs", type=int, default=50000,
                   help="target number of dofs (global)")
    p.add_argument("--dtype", choices=["f32", "f64"], default="f32")
    p.add_argument("--cpu", action="store_true", help="force CPU backend")
    p.add_argument("--operator",
                   choices=["kron", "kron_blocked", "lattice",
                            "lattice_blocked", "dofmap", "csr", "dss"],
                   default="kron", help="kernel backend ('kron_blocked' = "
                   "fused blocked Pallas kernels, fastest at >~8M dofs; "
                   "'lattice_blocked' = fused general-hex kernel; 'dss' = "
                   "row-gather unstructured-topology backend; 'csr' = "
                   "assembled sparse matvec, parity/oracle path)")
    p.add_argument("--kappa", type=float, default=2.0)
    return p


def setup_jax(args, n_cpu_devices=None):
    import jax

    # Persistent compilation cache: repeat driver runs skip the (remote)
    # XLA compiles.
    jax.config.update("jax_compilation_cache_dir",
                      os.path.expanduser("~/.cache/pmg_tpu_jax"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    if args.cpu:
        # NOTE: the JAX_PLATFORMS env var is not honoured under the axon
        # TPU plugin; the config update is.
        jax.config.update("jax_platforms", "cpu")
        if n_cpu_devices:
            jax.config.update("jax_num_cpu_devices", int(n_cpu_devices))
    if args.dtype == "f64":
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    return jnp.float64 if args.dtype == "f64" else jnp.float32


def parse_shards(s):
    """'4' -> 4 (x-slab), '2,2,1' -> (2, 2, 1) (device grid)."""
    parts = [int(v) for v in s.split(",")]
    if len(parts) == 1:
        return parts[0]
    if len(parts) != 3:
        raise SystemExit("--shards expects 'N' or 'sx,sy,sz'")
    return tuple(parts)
