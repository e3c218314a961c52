"""Shared helpers for the Mosaic kernel modules.

Single home for the bf16x3 operand split and the shard_map vma
bookkeeping used by both `pallas_kron_blocked` and
`pallas_lattice_blocked` (one implementation to keep in sync with JAX's
evolving vma API).
"""

import jax
import jax.numpy as jnp


def split_bf16(a):
    """Split f32 into (hi, lo) bf16 parts with a ~= hi + lo (the operand
    decomposition behind XLA's Precision.HIGH, done manually because
    Mosaic does not lower that precision)."""
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def join_vma(*arrays):
    """Union of the arrays' varying-mesh-axes sets (vma tracking under
    shard_map; empty outside). Pallas outputs must declare their vma."""
    vma = set()
    for a in arrays:
        try:
            vma |= set(jax.typeof(a).vma)
        except Exception:
            pass
    return tuple(sorted(vma))


def out_struct(shape, vma, dtype=jnp.float32):
    """ShapeDtypeStruct for a pallas_call output, carrying the vma when
    inside shard_map."""
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=frozenset(vma))
    return jax.ShapeDtypeStruct(shape, dtype)


def pvary_all(vma, *arrays):
    """Promote every array to vary over ``vma`` (vma tracking requires
    uniform varying axes across pallas_call inputs under shard_map;
    identity outside shard_map)."""
    if not vma:
        return arrays
    out = []
    for a in arrays:
        try:
            cur = jax.typeof(a).vma
        except Exception:
            cur = ()
        missing = tuple(ax for ax in vma if ax not in cur)
        out.append(jax.lax.pcast(a, missing, to="varying") if missing else a)
    return tuple(out)
