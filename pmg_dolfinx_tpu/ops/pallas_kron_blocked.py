"""Blocked Pallas kernels for the Kronecker-sum apply at large N.

`ops/pallas_kron.py` keeps the whole lattice in VMEM — impossible above
~#VMEM/8 dofs (a 16M-dof lattice is 65 MB). This module tiles the apply
into two Mosaic kernels so only O(slab) lives in VMEM while the
bc-masking, symmetric scaling and term accumulation FUSE into the
matmul pipelines (in the XLA path they are separate HBM passes):

- kernel 1, grid over y-slabs: ``out1 = Kt_x-contraction(w)`` — the only
  term needing the full x extent; blocks are ``(NX, By, NZ)``.
- kernel 2, grid over x-slabs: ``out = s3 * (out1 + Kt_y-contraction(w)
  + Kt_z-contraction(w))`` with the bc epilogue — both terms are local
  to an x-slab; blocks are ``(Bx, NY, NZ)``.

``w = bc_mask(x) * s3`` is recomputed per kernel from x (cheaper than a
round-trip). All matmuls run at HIGHEST precision. Per-apply HBM
traffic: 2 reads of x/bc + 1 write/read of out1 + 1 write of out
(~360 MB at 16M dofs) vs ~6-8 lattice passes for the unfused XLA path.

Block shapes use full array extents on the minor dims (Mosaic handles
the physical 128-lane padding), so NO host-side pad/unpad copies are
needed.

Shape sensitivity (measured v5e, p=6): on near-cubic lattices whose
minor dim sits close to a 128 multiple (e.g. 127^3, 253^3) this wins
clearly at large N (+28% at 16.2M dofs); on lattices with a badly
padded minor dim (e.g. NZ=151 -> 41% lane padding, paid by every
per-slice dot) the XLA path is faster. bench.py measures both and
reports the winner; pick per shape.

Reference analogue: the tiled shared-memory stiffness kernel
(src/laplacian.hpp:143-278), restructured for the MXU + VMEM hierarchy.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def _kernel_t1(x_ref, bc_ref, Ktx_ref, sxz_ref, out_ref):
    # block (NX, By, NZ): full x extent, y-slab. The sy factor commutes
    # with the x-contraction (pointwise in y), so this kernel computes
    # t1' = Ktx @ (mask(x) * sx (x) sz) and kernel 2 applies sy. The
    # scale arrives as the 2-D plane sxz = outer(sx, sz) (Mosaic cannot
    # broadcast 1-D vectors along major dims).
    Ktx = Ktx_ref[:]
    sxz = sxz_ref[:]
    By = x_ref.shape[1]
    for j in range(By):  # By small; per-plane (NX,NX)@(NX,NZ) MXU dots
        w1j = jnp.where(bc_ref[:, j, :], 0.0, x_ref[:, j, :]) * sxz
        out_ref[:, j, :] = jnp.dot(Ktx, w1j,
                                   preferred_element_type=jnp.float32,
                                   precision=HI)


def _kernel_t23(x_ref, bc_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref,
                sycol_ref, s23_ref, out_ref):
    # block (Bx, NY, NZ): x-slab, full y/z extents. Per x-slice i with
    # scalar sx_i (delivered as a (Bx, 1) block):
    #   what = mask(x_i) * s23            (s23 = outer(sy, sz), 2-D input)
    #   y_i  = (sy*t1'_i + sx_i*(Kty @ what + what @ KtzT)) * sx_i * s23
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]  # (NY, 1): lane-broadcasts over z
    s23 = s23_ref[:]
    Bx = x_ref.shape[0]
    for i in range(Bx):
        xi = x_ref[i]
        bci = bc_ref[i]
        sxi = sx2_ref[i, 0]
        what = jnp.where(bci, 0.0, xi) * s23
        t2 = jnp.dot(Kty, what, preferred_element_type=jnp.float32,
                     precision=HI)
        t3 = jnp.dot(what, KtzT, preferred_element_type=jnp.float32,
                     precision=HI)
        yi = (sycol * t1_ref[i] + sxi * (t2 + t3)) * (sxi * s23)
        out_ref[i] = jnp.where(bci, xi, yi)


class PallasKronBlocked:
    """Blocked fused-kernel Kronecker apply for large lattices (f32).

    Same operator contract as `ops.kron.KronLaplacian` restricted to
    lattice-shaped (3D) inputs; bit-compatible math with the symmetrized
    XLA path up to matmul rounding.
    """

    def __init__(self, mesh, P, kappa=2.0, by=8, bx=None, interpret=False):
        from .kron import KronLaplacian, kron_diagonal

        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32)
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.shape = mesh.lattice_shape(P)
        NX, NY, NZ = self.shape
        self.diag = base.diag
        self.diag_inv = base.diag_inv
        self.bc3 = base.bc_marker.reshape(self.shape)

        Ks64 = [np.asarray(K, np.float64) for K in base.Ks]
        ms64 = [np.asarray(m, np.float64) for m in base.ms]
        ss = [np.sqrt(m) for m in ms64]
        Kts = [K / s[:, None] / s[None, :] for K, s in zip(Ks64, ss)]
        self.Ktx = jnp.asarray(Kts[0], jnp.float32)
        self.Kty = jnp.asarray(Kts[1], jnp.float32)
        self.KtzT = jnp.asarray(Kts[2].T.copy(), jnp.float32)
        self.sx2d = jnp.asarray(ss[0][:, None], jnp.float32)   # (NX, 1)
        self.sxz = jnp.asarray(np.outer(ss[0], ss[2]), jnp.float32)
        self.sycol = jnp.asarray(ss[1][:, None], jnp.float32)   # (NY, 1)
        self.s23 = jnp.asarray(np.outer(ss[1], ss[2]), jnp.float32)

        # Fixed slab sizes with cdiv grids: edge blocks are partial, which
        # is safe here because every y-slice (kernel 1) / x-slice
        # (kernel 2) is computed independently and out-of-bounds rows are
        # masked on the (blocked) output write.
        by = min(by, NY)
        bx = min(bx or 8, NX)
        self.by, self.bx = by, bx

        vmem = 64 * 1024 * 1024
        self._t1 = pl.pallas_call(
            _kernel_t1,
            grid=(pl.cdiv(NY, by),),
            in_specs=[
                pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
                pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
                pl.BlockSpec((NX, NX), lambda j: (0, 0)),
                pl.BlockSpec((NX, NZ), lambda j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
            out_shape=jax.ShapeDtypeStruct(self.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            interpret=interpret,
        )
        self._t23 = pl.pallas_call(
            _kernel_t23,
            grid=(pl.cdiv(NX, bx),),
            in_specs=[
                pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
                pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
                pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
                pl.BlockSpec((NY, NY), lambda i: (0, 0)),
                pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),
                pl.BlockSpec((bx, 1), lambda i: (i, 0)),
                pl.BlockSpec((NY, 1), lambda i: (0, 0)),
                pl.BlockSpec((NY, NZ), lambda i: (0, 0)),
            ],
            out_specs=pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
            out_shape=jax.ShapeDtypeStruct(self.shape, jnp.float32),
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
            interpret=interpret,
        )
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, x3):
        t1 = self._t1(x3, self.bc3, self.Ktx, self.sxz)
        return self._t23(x3, self.bc3, t1, self.Kty, self.KtzT,
                         self.sx2d, self.sycol, self.s23)

    def __call__(self, x):
        """Apply on a lattice-shaped (3D) or flat vector."""
        y = self._apply(jnp.asarray(x, jnp.float32).reshape(self.shape))
        return y if jnp.ndim(x) == 3 else y.reshape(-1)
