"""Blocked Mosaic kernels for the per-axis tensor-product transfers.

The inter-degree (and inter-mesh h-) transfers are triple Kronecker
actions ``y = (M_x o M_y o M_z) x`` — three per-axis dense matmuls
(`ops.lattice.lattice_restrict/prolongate`). As separate XLA einsums at
16.2M dofs the fine-level restrict+prolong pair costs 0.79 ms/cycle
(measured v5e, p=(1,3,6) V-cycle) — about 2x its HBM roofline, because
each einsum round-trips a full intermediate lattice. This module fuses
the y/z contractions of each transfer into one kernel so only ONE
intermediate lattice (after the x-contraction) touches HBM:

- kernel 1, grid over y-slabs: ``t1 = M_x-contraction(x)`` — needs the
  full x extent; blocks ``(NX, By, NZ) -> (A, By, NZ)``;
- kernel 2, grid over a-slabs of t1: per slice ``out_a = M_y @ t1_a @
  M_z^T`` — two MXU dots, no further intermediates.

Works for restriction (``M_a = I_a^T``) and prolongation (``M_a =
I_a``), p-transfer and h-transfer alike; f32 with true-f32 (HIGHEST)
matmuls. Off-TPU the wrapper falls back to the exact XLA einsum path
(identical contraction order x,y,z).

MEASURED RESULT (v5e, 253^3<->127^3 pair): 0.786 ms fused vs 0.779 ms
XLA — parity, not a win. The transfer cost is dominated by the
HIGHEST-precision (6-pass bf16) MXU time (~0.5 ms of the pair), not by
the intermediate-lattice HBM round-trips this fusion removes (~0.04 ms).
Kept as an opt-in (`kron_blocked_cycle_ops(fuse_transfers=True)`) with
interpret-mode parity tests; the XLA einsum path stays the default.

Reference analogue: the overlap-fused interpolation kernels
(src/interpolate.hpp:22-87), restructured for MXU + VMEM.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import join_vma as _join_vma
from .pallas_util import out_struct as _out_struct
from .pallas_util import pvary_all as _pvary_all

_HI = jax.lax.Precision.HIGHEST
_DOT = partial(jnp.dot, preferred_element_type=jnp.float32, precision=_HI)


def _kernel_tx(x_ref, Mx_ref, out_ref):
    # block (NX, By, NZ) -> (A, By, NZ): per y-slice MXU dot.
    Mx = Mx_ref[:]
    By = x_ref.shape[1]
    for j in range(By):
        out_ref[:, j, :] = _DOT(Mx, x_ref[:, j, :])


def _kernel_tyz(t1_ref, My_ref, MzT_ref, out_ref):
    # block (bx, NY, NZ) -> (bx, B, C): two MXU dots per a-slice.
    My = My_ref[:]
    MzT = MzT_ref[:]
    Bx = t1_ref.shape[0]
    for i in range(Bx):
        out_ref[i] = _DOT(_DOT(My, t1_ref[i]), MzT)


@lru_cache(maxsize=None)
def _build_transfer_calls(shape_in, shape_out, by, bx, interpret, vma=()):
    NX, NY, NZ = shape_in
    A, B, C = shape_out
    k1 = pl.pallas_call(
        _kernel_tx,
        grid=(pl.cdiv(NY, by),),
        in_specs=[
            pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
            pl.BlockSpec((A, NX), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((A, by, NZ), lambda j: (0, j, 0)),
        out_shape=_out_struct((A, NY, NZ), vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    k2 = pl.pallas_call(
        _kernel_tyz,
        grid=(pl.cdiv(A, bx),),
        in_specs=[
            pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
            pl.BlockSpec((B, NY), lambda i: (0, 0)),
            pl.BlockSpec((NZ, C), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bx, B, C), lambda i: (i, 0, 0)),
        out_shape=_out_struct((A, B, C), vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024
        ),
        interpret=interpret,
    )
    return k1, k2


def blocked_transfer(x3, Mx, My, MzT, *, by=8, bx=8, interpret=None):
    """``y[a,b,c] = sum_{xyz} Mx[a,x] My[b,y] MzT[z,c] x3[x,y,z]`` as two
    fused Mosaic kernels (f32). ``MzT`` arrives pre-transposed (the
    z-contraction is a right-multiplication). Off-TPU: exact XLA einsums
    in the same x,y,z order."""
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    if emulate:
        t = jnp.einsum("ax,xyz->ayz", Mx, x3, precision=_HI)
        t = jnp.einsum("by,xyz->xbz", My, t, precision=_HI)
        return jnp.einsum("xyz,zc->xyc", t, MzT, precision=_HI)
    shape_in = tuple(x3.shape)
    shape_out = (Mx.shape[0], My.shape[0], MzT.shape[1])
    by = min(by, shape_in[1])
    bx = min(bx, shape_out[0])
    vma = _join_vma(x3, Mx, My, MzT)
    k1, k2 = _build_transfer_calls(shape_in, shape_out, by, bx, interpret,
                                   vma)
    x3, Mx, My, MzT = _pvary_all(vma, x3, Mx, My, MzT)
    return k2(k1(x3, Mx), My, MzT)


def transfer_mats(I1s, direction, dtype=jnp.float32):
    """(Mx, My, MzT) for `blocked_transfer` from per-axis interpolation
    matrices ``I1s = (Ix, Iy, Iz)`` (fine x coarse): ``direction`` is
    'prolong' (coarse->fine: M = I) or 'restrict' (fine->coarse:
    M = I^T)."""
    Ix, Iy, Iz = (jnp.asarray(I, dtype) for I in I1s)
    if direction == "prolong":
        return Ix, Iy, Iz.T
    if direction == "restrict":
        return Ix.T, Iy.T, Iz
    raise ValueError(f"unknown direction {direction!r}")
