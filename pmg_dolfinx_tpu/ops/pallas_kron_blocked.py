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
round-trip). Matmul precision is selectable: 'highest' (default,
true-f32 via 6-pass bf16 decomposition, ~1e-7 error vs the f64 oracle)
or 'high' (3-pass bf16x3, ~1e-5 error — the right trade for
*preconditioner* applies inside V-cycles, where the outer residual is
recomputed exactly anyway; see PMGHierarchy(precision='high')).
Per-apply HBM traffic: 2 reads of x/bc + 1 write/read of out1 + 1 write
of out (~360 MB at 16M dofs) vs ~6-8 lattice passes for the unfused XLA
path.

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

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import join_vma as _join_vma
from .pallas_util import out_struct as _out_struct_util
from .pallas_util import pvary_all as _pvary_all
from .pallas_util import split_bf16 as _split_bf16


_DOT = partial(jnp.dot, preferred_element_type=jnp.float32)


def _dot3(a_split, b_split):
    """bf16x3 matmul: 3 single-pass MXU dots with f32 accumulation.

    Drops only the lo*lo term (the XLA `Precision.HIGH` decomposition,
    ~1e-5 relative error on O(1) data). Mosaic does not lower
    `precision=HIGH` itself, so the split is done explicitly; operands
    arrive pre-split so loop-invariant matrices split once per block.
    """
    a_hi, a_lo = a_split
    b_hi, b_lo = b_split
    return _DOT(a_hi, b_hi) + (_DOT(a_hi, b_lo) + _DOT(a_lo, b_hi))


def _kernel_t1(x_ref, bc_ref, Ktx_ref, sxz_ref, out_ref, *, high):
    # block (NX, By, NZ): full x extent, y-slab. The sy factor commutes
    # with the x-contraction (pointwise in y), so this kernel computes
    # t1' = Ktx @ (mask(x) * sx (x) sz) and kernel 2 applies sy. The
    # scale arrives as the 2-D plane sxz = outer(sx, sz) (Mosaic cannot
    # broadcast 1-D vectors along major dims).
    Ktx = Ktx_ref[:]
    sxz = sxz_ref[:]
    if high:
        Ktx_split = _split_bf16(Ktx)  # loop-invariant: split once
    By = x_ref.shape[1]
    for j in range(By):  # By small; per-plane (NX,NX)@(NX,NZ) MXU dots
        w1j = jnp.where(bc_ref[:, j, :], 0.0, x_ref[:, j, :]) * sxz
        if high:
            out_ref[:, j, :] = _dot3(Ktx_split, _split_bf16(w1j))
        else:
            out_ref[:, j, :] = _DOT(Ktx, w1j,
                                    precision=jax.lax.Precision.HIGHEST)


def _kernel_t23(x_ref, bc_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref,
                sycol_ref, s23_ref, out_ref, *, high, sigma=0.0):
    # block (Bx, NY, NZ): x-slab, full y/z extents. Per x-slice i with
    # scalar sx_i (delivered as a (Bx, 1) block):
    #   what = mask(x_i) * s23            (s23 = outer(sy, sz), 2-D input)
    #   y_i  = (sy*t1'_i + sx_i*(Kty @ what + what @ KtzT)) * sx_i * s23
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]  # (NY, 1): lane-broadcasts over z
    s23 = s23_ref[:]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = x_ref.shape[0]
    for i in range(Bx):
        xi = x_ref[i]
        bci = bc_ref[i]
        sxi = sx2_ref[i, 0]
        what = jnp.where(bci, 0.0, xi) * s23
        if high:
            what_split = _split_bf16(what)  # shared by t2 and t3
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            t2 = _DOT(Kty, what, precision=jax.lax.Precision.HIGHEST)
            t3 = _DOT(what, KtzT, precision=jax.lax.Precision.HIGHEST)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            # Lumped-mass shift: sigma*sx_i*what*(sx_i*s23) ==
            # sigma*M*mask(x) (see ops.kron.kron_laplacian_apply).
            acc = acc + (sigma * sxi) * what
        yi = acc * (sxi * s23)
        out_ref[i] = jnp.where(bci, xi, yi)


def _kernel_t1_m(x_ref, myb_ref, Ktx_ref, sxzm_ref, out_ref, *, high):
    # `_kernel_t1` with the bc mask SEPARATED into the scale factors:
    # on a box the Dirichlet marker is a union of face planes, i.e.
    # bc = NOT (mx (x) my (x) mz) with per-axis 0/1 interior vectors, so
    # mask(x) * sx (x) sz == x * (my_j * sxzm) with sxzm = (mx*sx) (x)
    # (mz*sz) and the scalar my_j per y-plane. This removes the
    # full-lattice bc operand entirely — a bool kernel input ships as a
    # CONVERTED s32 buffer (write + read per apply: ~195 MB of HBM
    # traffic at 16.2M dofs across the kernel pair, r4 measured in the
    # lowered HLO).
    Ktx = Ktx_ref[:]
    sxzm = sxzm_ref[:]
    if high:
        Ktx_split = _split_bf16(Ktx)
    By = x_ref.shape[1]
    for j in range(By):
        w1j = x_ref[:, j, :] * (myb_ref[j, 0] * sxzm)
        if high:
            out_ref[:, j, :] = _dot3(Ktx_split, _split_bf16(w1j))
        else:
            out_ref[:, j, :] = _DOT(Ktx, w1j,
                                    precision=jax.lax.Precision.HIGHEST)


def _kernel_t23_m(x_ref, mx2_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref,
                  sycol_ref, s23m_ref, myb_ref, mzrow_ref, out_ref, *,
                  high, sigma=0.0):
    # `_kernel_t23` with the separable bc mask (see `_kernel_t1_m`):
    # input masking = x_i * s23m * mx_i (s23m = (my*sy) (x) (mz*sz),
    # mx_i a (Bx, 1) 0/1 column); the epilogue rebuilds the interior
    # plane as the outer product mx_i * (myb (x) mzrow) — bit-identical
    # to where(bc, x, y) for finite x (y*1 and x*(1-0) are exact).
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23m = s23m_ref[:]
    inter_yz = myb_ref[:] * mzrow_ref[:]         # (NY, NZ) 0/1
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = x_ref.shape[0]
    for i in range(Bx):
        xi = x_ref[i]
        mxi = mx2_ref[i, 0]
        sxi = sx2_ref[i, 0]
        what = xi * (mxi * s23m)
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            t2 = _DOT(Kty, what, precision=jax.lax.Precision.HIGHEST)
            t3 = _DOT(what, KtzT, precision=jax.lax.Precision.HIGHEST)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        yi = acc * (sxi * s23m)
        out_ref[i] = xi * (1.0 - mxi * inter_yz) + yi * mxi


def _kernel_t23_res_m(v_ref, mx2_ref, t1_ref, Kty_ref, KtzT_ref,
                      sx2_ref, sycol_ref, s23m_ref, myb_ref, mzrow_ref,
                      r_ref, ro_ref, *, high, sigma=0.0):
    # `_kernel_t23_res` (fused down-sweep residual ro = r - A v) with
    # the separable bc mask.
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23m = s23m_ref[:]
    inter_yz = myb_ref[:] * mzrow_ref[:]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = v_ref.shape[0]
    for i in range(Bx):
        vi = v_ref[i]
        mxi = mx2_ref[i, 0]
        sxi = sx2_ref[i, 0]
        what = vi * (mxi * s23m)
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            t2 = _DOT(Kty, what, precision=jax.lax.Precision.HIGHEST)
            t3 = _DOT(what, KtzT, precision=jax.lax.Precision.HIGHEST)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        yi = acc * (sxi * s23m)
        Av = vi * (1.0 - mxi * inter_yz) + yi * mxi
        ro_ref[i] = r_ref[i] - Av


def _kernel_t23_cheb(v_ref, bc_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref,
                     sycol_ref, s23_ref, x_ref, r_ref, dinv_ref, coef_ref,
                     xo_ref, ro_ref, zo_ref, *, high, sigma=0.0):
    # Kernel 2 with the fourth-kind-Chebyshev update fused in. Per x-slice
    # i: Av = bc-epilogued operator apply on v, then
    #     x' = x + gamma*v ;  r' = r - Av ;  z' = a*v + b*dinv*r'
    # (gamma, a, b) arrive as a (1, 3) block; with (0, 0, 4/(3 lmax)) this
    # is the smoother's init step (v = x), with (1, a_k, b_k) a loop step
    # (v = z). Fusing removes ~8 whole-lattice HBM passes per smoothing
    # iteration vs apply + XLA elementwise chain (the pallas_call is
    # opaque to XLA fusion, so they cannot fuse from outside).
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23 = s23_ref[:]
    gamma = coef_ref[0, 0]
    a = coef_ref[0, 1]
    bco = coef_ref[0, 2]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = v_ref.shape[0]
    for i in range(Bx):
        vi = v_ref[i]
        bci = bc_ref[i]
        sxi = sx2_ref[i, 0]
        what = jnp.where(bci, 0.0, vi) * s23
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            t2 = _DOT(Kty, what, precision=jax.lax.Precision.HIGHEST)
            t3 = _DOT(what, KtzT, precision=jax.lax.Precision.HIGHEST)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        yi = acc * (sxi * s23)
        Av = jnp.where(bci, vi, yi)
        ri = r_ref[i] - Av
        xo_ref[i] = x_ref[i] + gamma * vi
        ro_ref[i] = ri
        zo_ref[i] = a * vi + bco * dinv_ref[i] * ri


def _kernel_t23_res(v_ref, bc_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref,
                    sycol_ref, s23_ref, r_ref, ro_ref, *, high, sigma=0.0):
    # Kernel 2 with the residual fused: ro = r_in - Av (the down-sweep's
    # r = b - A u without a separate whole-lattice subtract pass).
    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23 = s23_ref[:]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = v_ref.shape[0]
    for i in range(Bx):
        vi = v_ref[i]
        bci = bc_ref[i]
        sxi = sx2_ref[i, 0]
        what = jnp.where(bci, 0.0, vi) * s23
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            t2 = _DOT(Kty, what, precision=jax.lax.Precision.HIGHEST)
            t3 = _DOT(what, KtzT, precision=jax.lax.Precision.HIGHEST)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        yi = acc * (sxi * s23)
        ro_ref[i] = r_ref[i] - jnp.where(bci, vi, yi)


def _kernel_t23_grid(*refs, high, sigma=0.0, need_y, need_z,
                     residual=False):
    # Kernel 2 for multi-axis device grids: `_kernel_t23` plus tiny
    # neighbour-correction INPUTS applied to the accumulator's boundary
    # planes BEFORE the final scaling:
    #   cy[i] (2, NZ): exchanged t2 partials for my first/last y-plane,
    #   cz[i] (NY, 2): exchanged t3 partials for my first/last z-plane.
    # Corrections enter as sxi * c (the same factor the local t2/t3 terms
    # get), and the shared (sxi * s23) output scaling then completes
    # sx^2 * sy_edge * sz. The bc epilogue overwrites bc rows afterwards,
    # so corrections need no masking. Design history (measured, 16.2M v5e,
    # plain pair = 1.13 ms): edge-partial OUTPUTS + post-kernel XLA plane
    # adds cost +0.9 ms (narrow-matmul variant +1.1) -- the 4 full-lattice
    # dynamic-update-slices dominate; computing the edge partials from x
    # in XLA (~0.3 ms), exchanging, and folding the correction into this
    # kernel is the cheapest structure.
    it = iter(refs)
    x_ref, bc_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref, sycol_ref, s23_ref = (
        next(it) for _ in range(8)
    )
    cy_ref = next(it) if need_y else None
    cz_ref = next(it) if need_z else None
    r_ref = next(it) if residual else None  # fused ro = r - A u
    out_ref = next(it)

    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23 = s23_ref[:]
    NY = Kty.shape[0]
    NZ = KtzT.shape[1]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = x_ref.shape[0]
    for i in range(Bx):
        xi = x_ref[i]
        bci = bc_ref[i]
        sxi = sx2_ref[i, 0]
        what = jnp.where(bci, 0.0, xi) * s23
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            HI = jax.lax.Precision.HIGHEST
            t2 = _DOT(Kty, what, precision=HI)
            t3 = _DOT(what, KtzT, precision=HI)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        # Corrections as iota-masked broadcasts (Mosaic has no
        # scatter-add/DUS on values; these are plain VPU selects).
        if need_y:
            iy = jax.lax.broadcasted_iota(jnp.int32, (NY, NZ), 0)
            acc = acc + sxi * (
                jnp.where(iy == 0, cy_ref[i, 0:1, :], 0.0)
                + jnp.where(iy == NY - 1, cy_ref[i, 1:2, :], 0.0)
            )
        if need_z:
            iz = jax.lax.broadcasted_iota(jnp.int32, (NY, NZ), 1)
            acc = acc + sxi * (
                jnp.where(iz == 0, cz_ref[i, :, 0:1], 0.0)
                + jnp.where(iz == NZ - 1, cz_ref[i, :, 1:2], 0.0)
            )
        yi = acc * (sxi * s23)
        Av = jnp.where(bci, xi, yi)
        out_ref[i] = r_ref[i] - Av if residual else Av


def _kernel_t23_grid_m(*refs, high, sigma=0.0, need_y, need_z,
                       residual=False):
    # `_kernel_t23_grid` with the separable bc mask (`_kernel_t1_m`):
    # no full-lattice bc operand. The neighbour-correction inputs are
    # handled exactly as before; at local edge planes that are GLOBAL
    # boundary rows the s23m/epilogue masking zeroes them where the bc
    # kernel's epilogue overwrote them — bit-identical output.
    it = iter(refs)
    (x_ref, mx2_ref, t1_ref, Kty_ref, KtzT_ref, sx2_ref, sycol_ref,
     s23m_ref, myb_ref, mzrow_ref) = (next(it) for _ in range(10))
    cy_ref = next(it) if need_y else None
    cz_ref = next(it) if need_z else None
    r_ref = next(it) if residual else None
    out_ref = next(it)

    Kty = Kty_ref[:]
    KtzT = KtzT_ref[:]
    sycol = sycol_ref[:]
    s23m = s23m_ref[:]
    inter_yz = myb_ref[:] * mzrow_ref[:]
    NY = Kty.shape[0]
    NZ = KtzT.shape[1]
    if high:
        Kty_split = _split_bf16(Kty)
        KtzT_split = _split_bf16(KtzT)
    Bx = x_ref.shape[0]
    for i in range(Bx):
        xi = x_ref[i]
        mxi = mx2_ref[i, 0]
        sxi = sx2_ref[i, 0]
        what = xi * (mxi * s23m)
        if high:
            what_split = _split_bf16(what)
            t2 = _dot3(Kty_split, what_split)
            t3 = _dot3(what_split, KtzT_split)
        else:
            HI = jax.lax.Precision.HIGHEST
            t2 = _DOT(Kty, what, precision=HI)
            t3 = _DOT(what, KtzT, precision=HI)
        acc = sycol * t1_ref[i] + sxi * (t2 + t3)
        if sigma:
            acc = acc + (sigma * sxi) * what
        if need_y:
            iy = jax.lax.broadcasted_iota(jnp.int32, (NY, NZ), 0)
            acc = acc + sxi * (
                jnp.where(iy == 0, cy_ref[i, 0:1, :], 0.0)
                + jnp.where(iy == NY - 1, cy_ref[i, 1:2, :], 0.0)
            )
        if need_z:
            iz = jax.lax.broadcasted_iota(jnp.int32, (NY, NZ), 1)
            acc = acc + sxi * (
                jnp.where(iz == 0, cz_ref[i, :, 0:1], 0.0)
                + jnp.where(iz == NZ - 1, cz_ref[i, :, 1:2], 0.0)
            )
        yi = acc * (sxi * s23m)
        Av = xi * (1.0 - mxi * inter_yz) + yi * mxi
        out_ref[i] = r_ref[i] - Av if residual else Av


@lru_cache(maxsize=None)
def _build_t23_grid_call_m(shape, bx, high, interpret, vma=(), sigma=0.0,
                           need_y=False, need_z=False, residual=False):
    """Separable-mask grid kernel-2 (`_kernel_t23_grid_m`)."""
    NX, NY, NZ = shape
    lat = lambda: pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0))
    in_specs = [
        lat(),                                      # x
        pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # mx slab
        lat(),                                      # t1'
        pl.BlockSpec((NY, NY), lambda i: (0, 0)),   # Kty
        pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),   # KtzT
        pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
        pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
        pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23m plane
        pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # my column
        pl.BlockSpec((1, NZ), lambda i: (0, 0)),    # mz row
    ]
    if need_y:
        in_specs.append(pl.BlockSpec((bx, 2, NZ), lambda i: (i, 0, 0)))
    if need_z:
        in_specs.append(pl.BlockSpec((bx, NY, 2), lambda i: (i, 0, 0)))
    if residual:
        in_specs.append(lat())
    return pl.pallas_call(
        partial(_kernel_t23_grid_m, high=high, sigma=sigma,
                need_y=need_y, need_z=need_z, residual=residual),
        grid=(pl.cdiv(NX, bx),),
        in_specs=in_specs,
        out_specs=lat(),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


def symmetrized_mats(Ks, ms, dtype=jnp.float32, face_masks=None):
    """Build the symmetrized-scaling arrays the blocked kernels consume.

    Given per-axis stiffness ``Ks`` and (diagonal, GLL-lumped) mass ``ms``
    the Kronecker-sum apply factorizes as ``S (Kt-contractions) S`` with
    ``S = diag(sx (x) sy (x) sz)``, ``Kt_a = K_a / (s_a s_a^T)`` — the
    symmetric form needs one scale plane per kernel instead of three 1-D
    broadcasts (which Mosaic cannot do along major dims). Computed in
    float64 and cast once.

    ``face_masks`` (optional, per-axis 0/1 interior vectors from
    `axis_interior_masks`) adds the SEPARABLE-bc arrays: the Dirichlet
    marker of a box is a union of face planes, so the mask folds into
    the scale factors and the blocked kernels drop the full-lattice bc
    operand (`_kernel_t1_m`/`_kernel_t23_m` — at 16.2M that operand is
    a ~65 MB converted-s32 buffer per kernel per apply).
    """
    Ks64 = [np.asarray(K, np.float64) for K in Ks]
    ms64 = [np.asarray(m, np.float64) for m in ms]
    ss = [np.sqrt(m) for m in ms64]
    Kts = [K / s[:, None] / s[None, :] for K, s in zip(Ks64, ss)]
    out = dict(
        Ktx=jnp.asarray(Kts[0], dtype),
        Kty=jnp.asarray(Kts[1], dtype),
        KtzT=jnp.asarray(Kts[2].T.copy(), dtype),
        sx2d=jnp.asarray(ss[0][:, None], dtype),            # (NX, 1)
        sxz=jnp.asarray(np.outer(ss[0], ss[2]), dtype),
        sycol=jnp.asarray(ss[1][:, None], dtype),            # (NY, 1)
        s23=jnp.asarray(np.outer(ss[1], ss[2]), dtype),
    )
    if face_masks is not None:
        mx, my, mz = [np.asarray(m, np.float64) for m in face_masks]
        out.update(
            sxzm=jnp.asarray(np.outer(mx * ss[0], mz * ss[2]), dtype),
            s23m=jnp.asarray(np.outer(my * ss[1], mz * ss[2]), dtype),
            mx2=jnp.asarray(mx[:, None], dtype),             # (NX, 1)
            myb=jnp.asarray(my[:, None], dtype),             # (NY, 1)
            mzrow=jnp.asarray(mz[None, :], dtype),           # (1, NZ)
        )
    return out


def checked_face_masks(mesh, P, bc_marker):
    """`axis_interior_masks` VERIFIED against the actual dof marker:
    returns the per-axis vectors iff their outer-product union equals
    ``bc_marker`` exactly, else None (callers then keep the bc-array
    kernels — future-proofing against non-separable markers)."""
    mx, my, mz = axis_interior_masks(mesh, P)
    interior = (mx[:, None, None] * my[None, :, None]
                * mz[None, None, :]) > 0.5
    bc3 = np.asarray(bc_marker).reshape(interior.shape)
    if np.array_equal(bc3, ~interior):
        return mx, my, mz
    return None


def axis_interior_masks(mesh, P):
    """Per-axis 0/1 INTERIOR vectors whose outer product is the box
    interior (bc = NOT the product): 0 at the ends of axes whose faces
    carry Dirichlet flags. Valid for the whole BoxMesh family (the
    marker is exactly this union of face planes — asserted where used).
    """
    faces = getattr(mesh, "dirichlet_faces", ((True, True),) * 3)
    masks = []
    for a in range(3):
        n = mesh.nc[a] * P + 1
        m = np.ones(n)
        lo, hi = faces[a]
        if lo:
            m[0] = 0.0
        if hi:
            m[-1] = 0.0
        masks.append(m)
    return masks


def grid_symmetrized_mats(Ks_local, ms_dup, shards, dtype=jnp.float32,
                          face_masks_dup=None):
    """Per-shard symmetrized arrays for the multi-axis grid decomposition,
    stacked along each sharded device axis.

    ``Ks_local``: per-axis LOCAL 1D stiffness — either ``(npl_a, npl_a)``
    (kappa folded in; identical for every shard along the axis on a
    uniform mesh) or a per-shard ROW-STACKED ``(S_a * npl_a, npl_a)``
    array (a sharded axis whose global ends carry Robin terms — only the
    end shards differ, `ops.kron.stacked_local_K`). ``ms_dup``: per-axis
    GLOBAL lumped mass in the duplicated-plane layout ``(S_a * npl_a,)``
    — the sqrt-mass scalings differ between boundary and interior shards,
    so every mass-scaled factor is built per shard and stacked for
    sharding.

    Returns ``(mats, axes)``: the array dict plus a parallel dict naming
    the device-mesh axis (or axis pair) each array shards over — the
    caller turns these into PartitionSpecs.
    """
    mx, my, mz = (np.asarray(m, np.float64) for m in ms_dup)
    sx, sy, sz = np.sqrt(mx), np.sqrt(my), np.sqrt(mz)
    Sx, Sy, Sz = shards
    Kx, Ky, Kz = (np.asarray(K, np.float64) for K in Ks_local)
    nplx, nply, nplz = Kx.shape[-1], Ky.shape[-1], Kz.shape[-1]
    # Normalize to per-shard (S, npl, npl) blocks.
    Kx, Ky, Kz = (
        (K.reshape(S, npl, npl) if K.shape[0] == S * npl
         else np.broadcast_to(K, (S, npl, npl)))
        for K, S, npl in ((Kx, Sx, nplx), (Ky, Sy, nply), (Kz, Sz, nplz))
    )

    def stacked(K3, s_all, S, npl, pick=None, transpose=False):
        out = []
        for K, sl in zip(K3, s_all.reshape(S, npl)):
            Kt = K / sl[:, None] / sl[None, :]
            if transpose:
                Kt = Kt.T.copy()
                if pick is not None:
                    Kt = Kt[:, pick]
            elif pick is not None:
                Kt = Kt[pick]
            out.append(Kt)
        return np.concatenate(out, axis=0)

    edge = np.array([0, -1])
    mats = dict(
        Ktx=stacked(Kx, sx, Sx, nplx),
        Kty=stacked(Ky, sy, Sy, nply),
        KtzT=stacked(Kz, sz, Sz, nplz, transpose=True),
        # Interface rows of Kty / cols of KtzT: the XLA edge-partial
        # operands (`_edge_partials`); identical values to the kernel's
        # own contraction rows/cols.
        Ktye=stacked(Ky, sy, Sy, nply, pick=edge),
        KtzTe=stacked(Kz, sz, Sz, nplz, transpose=True, pick=edge),
        sx2d=sx[:, None],
        sycol=sy[:, None],
        sxz=np.outer(sx, sz),
        s23=np.outer(sy, sz),
    )
    axes = dict(
        Ktx=("x", None), Kty=("y", None), KtzT=("z", None),
        Ktye=("y", None), KtzTe=("z", None),
        sx2d=("x", None), sycol=("y", None),
        sxz=("x", "z"), s23=("y", "z"),
    )
    if face_masks_dup is not None:
        # Separable bc masks in the SAME duplicated-plane stacked layout
        # as ms_dup (the caller slices the global axis masks with
        # `duplicate_planes`): the kernels drop the full-lattice bc
        # operand (see symmetrized_mats / _kernel_t1_m).
        mxd, myd, mzd = (np.asarray(m, np.float64)
                         for m in face_masks_dup)
        mats.update(
            sxzm=np.outer(mxd * sx, mzd * sz),
            s23m=np.outer(myd * sy, mzd * sz),
            mx2=mxd[:, None],
            myb=myd[:, None],
            mzrow=mzd[None, :],
        )
        axes.update(
            sxzm=("x", "z"), s23m=("y", "z"),
            mx2=("x", None), myb=("y", None), mzrow=(None, "z"),
        )
    return {k: jnp.asarray(v, dtype) for k, v in mats.items()}, axes


_out_struct = _out_struct_util


# --- jnp twins of the kernels -------------------------------------------
#
# Off-TPU the wrappers default to these exact emulations instead of
# Pallas interpret mode: the HLO interpreter cannot evaluate in-kernel
# slicing under shard_map vma tracking (upstream limitation), and the
# emulation keeps the distributed CPU tests exercising the real wiring
# (exchange placement, bc semantics) with identical math. Explicit
# ``interpret=True`` still runs the actual kernels through the
# interpreter (covered by the single-device tests).

def _emu_t1(x3, bc3, m):
    w = jnp.where(bc3, 0.0, x3) * m["sxz"][:, None, :]
    return jnp.einsum("ax,xyz->ayz", m["Ktx"], w,
                      precision=jax.lax.Precision.HIGHEST)


def _emu_t23_core(x3, bc3, t1, m, sigma=0.0):
    HI = jax.lax.Precision.HIGHEST
    what = jnp.where(bc3, 0.0, x3) * m["s23"][None]
    t2 = jnp.einsum("by,xyz->xbz", m["Kty"], what, precision=HI)
    t3 = jnp.einsum("xyz,zc->xyc", what, m["KtzT"], precision=HI)
    sx = m["sx2d"][:, 0][:, None, None]
    sy = m["sycol"][:, 0][None, :, None]
    acc = sy * t1 + sx * (t2 + t3)
    if sigma:
        acc = acc + (sigma * sx) * what
    return acc * (sx * m["s23"][None])


def _emu_apply(x3, bc3, t1, m, sigma=0.0):
    return jnp.where(bc3, x3, _emu_t23_core(x3, bc3, t1, m, sigma=sigma))


def default_tiles(P):
    """Per-degree (by, bx) block defaults (VERDICT r4 item 6): the
    by=bx=8 tiles are tuned for the p=6 flagship (n=7); at p>=7 the
    larger axis matrices shift the sweet spot — measured p=8 at 2.15M
    dofs on v5e (tools/p8_tile_sweep.py): by=4/bx=8 7.09 GDOF/s vs 5.65
    with the p=6 tiles and 6.66 for the XLA kron path (bx != 8 fails
    Mosaic's block-divisibility lowering at n=9). kron_blocked now
    BEATS XLA at p=8 with the dispatched tiles."""
    return (8, 8) if P <= 6 else (4, 8)


def _clamp_blocks(shape, by, bx):
    """Clamp slab sizes to the lattice extents. Mosaic requires the
    2nd-to-last block dim to be a multiple of 8 or the full extent, so
    ``by`` snaps down to a multiple of 8 when it isn't the whole of NY."""
    NX, NY, NZ = shape
    by = min(by, NY)
    if by != NY and by % 8:
        by = max(8 * (by // 8), 8) if NY >= 8 else NY
    bx = min(bx or 8, NX)
    return by, bx


@lru_cache(maxsize=None)
def _build_calls(shape, by, bx, high, interpret, vma=(), sigma=0.0):
    """The two pallas_calls for a given lattice shape + block config.

    Cached so cycle-ops can call `blocked_kron_apply` freely: rebuilding
    the pallas_call objects at every trace would re-trace the kernels.
    """
    NX, NY, NZ = shape
    # 100M-dof lattices need ~73 MiB for kernel 2's double-buffered
    # 8-row slabs (8 x NY x NZ x 4B x in/out pairs); v5e has 128 MiB.
    vmem = 100 * 1024 * 1024
    # Fixed slab sizes with cdiv grids: edge blocks are partial, which
    # is safe here because every y-slice (kernel 1) / x-slice (kernel 2)
    # is computed independently and out-of-bounds rows are masked on the
    # (blocked) output write.
    t1 = pl.pallas_call(
        partial(_kernel_t1, high=high),
        grid=(pl.cdiv(NY, by),),
        in_specs=[
            pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
            pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
            pl.BlockSpec((NX, NX), lambda j: (0, 0)),
            pl.BlockSpec((NX, NZ), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )
    t23 = pl.pallas_call(
        partial(_kernel_t23, high=high, sigma=sigma),
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
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )
    return t1, t23


@lru_cache(maxsize=None)
def _build_calls_m(shape, by, bx, high, interpret, vma=(), sigma=0.0):
    """The separable-bc-mask kernel pair (`_kernel_t1_m`/`_kernel_t23_m`)
    — no full-lattice bc operand (see `symmetrized_mats(face_masks=)`).
    """
    NX, NY, NZ = shape
    vmem = 100 * 1024 * 1024
    t1 = pl.pallas_call(
        partial(_kernel_t1_m, high=high),
        grid=(pl.cdiv(NY, by),),
        in_specs=[
            pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
            pl.BlockSpec((by, 1), lambda j: (j, 0)),    # my slab
            pl.BlockSpec((NX, NX), lambda j: (0, 0)),
            pl.BlockSpec((NX, NZ), lambda j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((NX, by, NZ), lambda j: (0, j, 0)),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )
    t23 = pl.pallas_call(
        partial(_kernel_t23_m, high=high, sigma=sigma),
        grid=(pl.cdiv(NX, bx),),
        in_specs=[
            pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # mx slab
            pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
            pl.BlockSpec((NY, NY), lambda i: (0, 0)),
            pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
            pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23m plane
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # my column
            pl.BlockSpec((1, NZ), lambda i: (0, 0)),    # mz row
        ],
        out_specs=pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0)),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )
    return t1, t23


@lru_cache(maxsize=None)
def _build_res_call_m(shape, bx, high, interpret, vma=(), sigma=0.0):
    """Separable-mask fused residual kernel (`_kernel_t23_res_m`)."""
    NX, NY, NZ = shape
    lat = lambda: pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0))
    return pl.pallas_call(
        partial(_kernel_t23_res_m, high=high, sigma=sigma),
        grid=(pl.cdiv(NX, bx),),
        in_specs=[
            lat(),                                      # v
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # mx slab
            lat(),                                      # t1'
            pl.BlockSpec((NY, NY), lambda i: (0, 0)),   # Kty
            pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),   # KtzT
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
            pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23m plane
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # my column
            pl.BlockSpec((1, NZ), lambda i: (0, 0)),    # mz row
            lat(),                                      # r_in
        ],
        out_specs=lat(),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_cheb_call(shape, bx, high, interpret, vma=(), sigma=0.0):
    """The fused Chebyshev-step kernel for a lattice shape (see
    `_kernel_t23_cheb`); pairs with kernel 1 from `_build_calls`."""
    NX, NY, NZ = shape
    vmem = 100 * 1024 * 1024
    lat = lambda: pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0))
    out = _out_struct(shape, vma)
    return pl.pallas_call(
        partial(_kernel_t23_cheb, high=high, sigma=sigma),
        grid=(pl.cdiv(NX, bx),),
        in_specs=[
            lat(),                                      # v
            lat(),                                      # bc
            lat(),                                      # t1'
            pl.BlockSpec((NY, NY), lambda i: (0, 0)),   # Kty
            pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),   # KtzT
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
            pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23 plane
            lat(),                                      # x
            lat(),                                      # r
            lat(),                                      # diag_inv
            pl.BlockSpec((1, 3), lambda i: (0, 0)),     # (gamma, a, b)
        ],
        out_specs=(lat(), lat(), lat()),
        out_shape=(out, out, out),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=vmem),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_res_call(shape, bx, high, interpret, vma=(), sigma=0.0):
    """The fused residual kernel (see `_kernel_t23_res`)."""
    NX, NY, NZ = shape
    lat = lambda: pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0))
    return pl.pallas_call(
        partial(_kernel_t23_res, high=high, sigma=sigma),
        grid=(pl.cdiv(NX, bx),),
        in_specs=[
            lat(), lat(), lat(),                        # v, bc, t1'
            pl.BlockSpec((NY, NY), lambda i: (0, 0)),   # Kty
            pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),   # KtzT
            pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
            pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
            pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23 plane
            lat(),                                      # r_in
        ],
        out_specs=lat(),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_t23_grid_call(shape, bx, high, interpret, vma=(), sigma=0.0,
                         need_y=False, need_z=False, residual=False):
    """Kernel-2 pallas_call with neighbour-correction inputs (see
    `_kernel_t23_grid`); pairs with kernel 1 from `_build_calls`.
    With ``residual=True`` the kernel takes an extra r input and emits
    the fused ``r - A u`` (the down-sweep residual)."""
    NX, NY, NZ = shape
    lat = lambda: pl.BlockSpec((bx, NY, NZ), lambda i: (i, 0, 0))
    in_specs = [
        lat(), lat(), lat(),                        # x, bc, t1'
        pl.BlockSpec((NY, NY), lambda i: (0, 0)),   # Kty
        pl.BlockSpec((NZ, NZ), lambda i: (0, 0)),   # KtzT
        pl.BlockSpec((bx, 1), lambda i: (i, 0)),    # sx slab
        pl.BlockSpec((NY, 1), lambda i: (0, 0)),    # sy column
        pl.BlockSpec((NY, NZ), lambda i: (0, 0)),   # s23 plane
    ]
    if need_y:
        in_specs.append(pl.BlockSpec((bx, 2, NZ), lambda i: (i, 0, 0)))
    if need_z:
        in_specs.append(pl.BlockSpec((bx, NY, 2), lambda i: (i, 0, 0)))
    if residual:
        in_specs.append(lat())                      # r_in
    return pl.pallas_call(
        partial(_kernel_t23_grid, high=high, sigma=sigma,
                need_y=need_y, need_z=need_z, residual=residual),
        grid=(pl.cdiv(NX, bx),),
        in_specs=in_specs,
        out_specs=lat(),
        out_shape=_out_struct(shape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=80 * 1024 * 1024
        ),
        interpret=interpret,
    )


def _edge_partials(x3, bc3, m, need_y, need_z):
    """Pre-scaling partial sums of the t2 / t3 contractions on the local
    boundary planes, computed from x in XLA (one masked-scale pass + two
    narrow contractions; ~0.3 ms at 16.2M on v5e):
    ``t2b[x, e, z] = (Kty[[0, -1], :] @ what)`` and
    ``t3b[x, y, e] = (what @ KtzT[:, [0, -1]])`` with
    ``what = mask(x) * s23`` -- exactly the boundary rows/cols of the
    contractions kernel 2 computes (same scaled operands)."""
    HI = jax.lax.Precision.HIGHEST
    w = jnp.where(bc3, 0.0, x3) * m["s23"][None]
    t2b = (jnp.einsum("eb,xbz->xez", m["Ktye"], w, precision=HI)
           if need_y else None)
    t3b = (jnp.einsum("xyz,ze->xye", w, m["KtzTe"], precision=HI)
           if need_z else None)
    return t2b, t3b


def _emu_t23_grid(x3, bc3, t1, m, sigma, cy, cz):
    """jnp twin of `_kernel_t23_grid` (corrections added to the
    accumulator's boundary planes before the final scaling)."""
    HI = jax.lax.Precision.HIGHEST
    what = jnp.where(bc3, 0.0, x3) * m["s23"][None]
    t2 = jnp.einsum("by,xyz->xbz", m["Kty"], what, precision=HI)
    t3 = jnp.einsum("xyz,zc->xyc", what, m["KtzT"], precision=HI)
    sx = m["sx2d"][:, 0][:, None, None]
    sy = m["sycol"][:, 0][None, :, None]
    acc = sy * t1 + sx * (t2 + t3)
    if sigma:
        acc = acc + (sigma * sx) * what
    sx2 = m["sx2d"][:, 0][:, None]
    if cy is not None:
        acc = acc.at[:, 0, :].add(sx2 * cy[:, 0, :])
        acc = acc.at[:, -1, :].add(sx2 * cy[:, 1, :])
    if cz is not None:
        acc = acc.at[:, :, 0].add(sx2 * cz[:, :, 0])
        acc = acc.at[:, :, -1].add(sx2 * cz[:, :, 1])
    return jnp.where(bc3, x3, acc * (sx * m["s23"][None]))


def blocked_kron_apply_grid(x3, bc3, mats, *, by=8, bx=8,
                            precision="highest", interpret=None,
                            exchange_x=None, ex_y=None, ex_z=None,
                            sigma=0.0, r3=None):
    """Blocked Kronecker apply under a multi-axis (x, y, z) device grid.

    ``mats`` is the dict from `grid_symmetrized_mats` (per-shard local
    arrays). Three independent per-axis reconciliations:

    - ``exchange_x``: applied to kernel 1's output (the x-stiffness term,
      shard-partial across x-interfaces) -- same hook as the 1D slab path;
    - ``ex_y(first, last) -> (add_first, add_last)``: ppermutes the t2
      edge-partial planes (`_edge_partials`) to the y-neighbours; the
      received neighbour partials feed kernel 2 as tiny inputs folded
      into the accumulator's duplicated y-planes;
    - ``ex_z``: same for the t3 term across z-interfaces.

    The exchanges depend only on x (not on kernel 2's output), so the
    ppermutes overlap with kernel 1/2 under XLA's latency-hiding
    scheduler. bc rows need no correction masking (the kernel's bc
    epilogue overwrites them). With ``r3`` given, the kernel emits the
    fused down-sweep residual ``r3 - A x`` instead (bit-exact vs the
    separate subtract; measured on v5e). Reference bar: the hot kernel
    running under ANY rank decomposition (src/laplacian.hpp:378-455).
    """
    if precision not in ("highest", "high"):
        raise ValueError(
            f"precision must be 'highest' or 'high', got {precision!r}"
        )
    need_y = ex_y is not None
    need_z = ex_z is not None
    if not (need_y or need_z):
        if r3 is not None:
            return blocked_kron_residual(
                r3, x3, bc3, mats, by=by, bx=bx, precision=precision,
                interpret=interpret, exchange=exchange_x, sigma=sigma,
            )
        return blocked_kron_apply(
            x3, bc3, mats, by=by, bx=bx, precision=precision,
            interpret=interpret, exchange=exchange_x, sigma=sigma,
        )
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False

    # Edge partials from x (XLA), exchanged to the neighbours; the
    # RECEIVED planes become kernel-2 correction inputs.
    t2b, t3b = _edge_partials(x3, bc3, mats, need_y, need_z)
    cy = cz = None
    if need_y:
        add0, add1 = ex_y(t2b[:, 0, :], t2b[:, 1, :])
        cy = jnp.stack([add0, add1], axis=1)            # (nplx, 2, nplz)
    if need_z:
        add0, add1 = ex_z(t3b[:, :, 0], t3b[:, :, 1])
        cz = jnp.stack([add0, add1], axis=-1)           # (nplx, nply, 2)

    if emulate:
        t1 = _emu_t1(x3, bc3, mats)
        if exchange_x is not None:
            t1 = exchange_x(t1)
        Av = _emu_t23_grid(x3, bc3, t1, mats, sigma, cy, cz)
        return Av if r3 is None else r3 - Av

    by, bx = _clamp_blocks(x3.shape, by, bx)
    high = precision == "high"
    if "sxzm" in mats:
        # Separable-bc kernels (no full-lattice bc operand per shard).
        vma = _join_vma(x3, cy, cz, r3, *mats.values())
        t1c, _ = _build_calls_m(tuple(x3.shape), by, bx, high,
                                interpret, vma, sigma)
        t23g = _build_t23_grid_call_m(tuple(x3.shape), bx, high,
                                      interpret, vma, sigma, need_y,
                                      need_z, residual=r3 is not None)
        names = ["Ktx", "sxzm", "Kty", "KtzT", "sx2d", "sycol", "s23m",
                 "mx2", "myb", "mzrow"]
        x3, *mvals = _pvary_all(vma, x3, *(mats[k] for k in names))
        m = dict(zip(names, mvals))
        t1 = t1c(x3, m["myb"], m["Ktx"], m["sxzm"])
        if exchange_x is not None:
            t1 = exchange_x(t1)
        args = [x3, m["mx2"], t1, m["Kty"], m["KtzT"], m["sx2d"],
                m["sycol"], m["s23m"], m["myb"], m["mzrow"]]
    else:
        vma = _join_vma(x3, bc3, cy, cz, r3, *mats.values())
        t1c, _ = _build_calls(tuple(x3.shape), by, bx, high, interpret,
                              vma, sigma)
        t23g = _build_t23_grid_call(tuple(x3.shape), bx, high, interpret,
                                    vma, sigma, need_y, need_z,
                                    residual=r3 is not None)
        names = ["Ktx", "sxz", "Kty", "KtzT", "sx2d", "sycol", "s23"]
        x3, bc3, *mvals = _pvary_all(vma, x3, bc3,
                                     *(mats[k] for k in names))
        m = dict(zip(names, mvals))
        t1 = t1c(x3, bc3, m["Ktx"], m["sxz"])
        if exchange_x is not None:
            t1 = exchange_x(t1)
        args = [x3, bc3, t1, m["Kty"], m["KtzT"], m["sx2d"], m["sycol"],
                m["s23"]]
    if need_y:
        (cy,) = _pvary_all(vma, cy)
        args.append(cy)
    if need_z:
        (cz,) = _pvary_all(vma, cz)
        args.append(cz)
    if r3 is not None:
        (r3,) = _pvary_all(vma, r3)
        args.append(r3)
    return t23g(*args)


def blocked_kron_residual(b3, u3, bc3, mats, *, by=8, bx=8,
                          precision="highest", interpret=None,
                          exchange=None, sigma=0.0):
    """Fused ``r = b - A u`` through the blocked kernel pair."""
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    if emulate:
        t1 = _emu_t1(u3, bc3, mats)
        if exchange is not None:
            t1 = exchange(t1)
        return b3 - _emu_apply(u3, bc3, t1, mats, sigma=sigma)
    by, bx = _clamp_blocks(u3.shape, by, bx)
    high = precision == "high"
    if "sxzm" in mats:
        vma = _join_vma(b3, u3, *mats.values())
        t1c, _ = _build_calls_m(tuple(u3.shape), by, bx, high, interpret,
                                vma, sigma)
        resc = _build_res_call_m(tuple(u3.shape), bx, high, interpret,
                                 vma, sigma)
        names = ("Ktx", "sxzm", "Kty", "KtzT", "sx2d", "sycol", "s23m",
                 "mx2", "myb", "mzrow")
        b3, u3, *mvals = _pvary_all(vma, b3, u3,
                                    *(mats[k] for k in names))
        m = dict(zip(names, mvals))
        t1 = t1c(u3, m["myb"], m["Ktx"], m["sxzm"])
        if exchange is not None:
            t1 = exchange(t1)
        return resc(u3, m["mx2"], t1, m["Kty"], m["KtzT"], m["sx2d"],
                    m["sycol"], m["s23m"], m["myb"], m["mzrow"], b3)
    vma = _join_vma(b3, u3, bc3, *mats.values())
    t1c, _ = _build_calls(tuple(u3.shape), by, bx, high, interpret, vma,
                          sigma)
    resc = _build_res_call(tuple(u3.shape), bx, high, interpret, vma,
                           sigma)
    names = ("Ktx", "sxz", "Kty", "KtzT", "sx2d", "sycol", "s23")
    b3, u3, bc3, *mvals = _pvary_all(vma, b3, u3, bc3,
                                     *(mats[k] for k in names))
    m = dict(zip(names, mvals))
    t1 = t1c(u3, bc3, m["Ktx"], m["sxz"])
    if exchange is not None:
        t1 = exchange(t1)
    return resc(u3, bc3, t1, m["Kty"], m["KtzT"], m["sx2d"],
                m["sycol"], m["s23"], b3)


def blocked_kron_cheb4(b3, x3, bc3, mats, dinv3, lmax, num_iters, *,
                       by=8, bx=8, precision="highest", interpret=None,
                       exchange=None, sigma=0.0):
    """Fourth-kind Chebyshev smoothing with the update fused into the
    blocked operator kernels (numerically identical to
    `solvers.chebyshev.chebyshev4_solve` over the same operator; tested).

    Same recurrence and operator count (1 + num_iters applies); each apply
    is kernel 1 + the fused kernel `_kernel_t23_cheb`, so the smoother
    touches HBM only through the two Mosaic pipelines.
    """
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    by, bx = _clamp_blocks(x3.shape, by, bx)
    high = precision == "high"
    vma = _join_vma(b3, x3, bc3, dinv3, *mats.values())
    if not emulate:
        t1c, _ = _build_calls(tuple(x3.shape), by, bx, high, interpret,
                              vma, sigma)
        chebc = _build_cheb_call(tuple(x3.shape), bx, high, interpret,
                                 vma, sigma)
        names = ("Ktx", "sxz", "Kty", "KtzT", "sx2d", "sycol", "s23")
        b3, x3, bc3, dinv3, *mvals = _pvary_all(vma, b3, x3, bc3, dinv3,
                                                *(mats[k] for k in names))
        m = dict(zip(names, mvals))

    def halfstep(v, x, r_in, coef):
        if emulate:
            t1 = _emu_t1(v, bc3, mats)
            if exchange is not None:
                t1 = exchange(t1)
            Av = _emu_apply(v, bc3, t1, mats, sigma=sigma)
            gamma, a, bco = coef[0, 0], coef[0, 1], coef[0, 2]
            r_new = r_in - Av
            return (x + gamma * v, r_new,
                    a * v + bco * dinv3 * r_new)
        t1 = t1c(v, bc3, m["Ktx"], m["sxz"])
        if exchange is not None:
            t1 = exchange(t1)
        (coef,) = _pvary_all(vma, coef)
        return chebc(v, bc3, t1, m["Kty"], m["KtzT"], m["sx2d"],
                     m["sycol"], m["s23"], x, r_in, dinv3, coef)

    dt = x3.dtype
    zero = jnp.zeros((), dt)
    c0 = (4.0 / (3.0 * lmax)).astype(dt)
    x, r, z = halfstep(x3, x3, b3, jnp.stack([zero, zero, c0]).reshape(1, 3))

    def body(i, state):
        x, r, z = state
        kf = jnp.asarray(i + 1, dt)
        a = (2.0 * kf - 1.0) / (2.0 * kf + 3.0)
        bco = (8.0 * kf + 4.0) / ((2.0 * kf + 3.0) * lmax)
        coef = jnp.stack([jnp.ones((), dt), a, bco.astype(dt)]).reshape(1, 3)
        return halfstep(z, x, r, coef)

    x, r, z = jax.lax.fori_loop(0, num_iters, body, (x, r, z))
    return x


def blocked_kron_apply(x3, bc3, mats, *, by=8, bx=8, precision="highest",
                       interpret=None, exchange=None, sigma=0.0):
    """Functional blocked Kronecker apply on a lattice-shaped f32 vector.

    ``mats`` is the dict from `symmetrized_mats`. ``interpret=None``
    auto-selects interpret mode off-TPU (the Mosaic kernels only compile
    for TPU; tests run them interpreted on CPU).

    ``exchange`` (optional) is applied to kernel 1's output — which is
    exactly the x-stiffness term, the only shard-partial quantity under
    an x-slab decomposition — before kernel 2 consumes it; the
    distributed layer passes the interface partial-sum ppermute here
    (same contract as `ops.kron.kron_laplacian_apply`).
    """
    if precision not in ("highest", "high"):
        raise ValueError(
            f"precision must be 'highest' or 'high', got {precision!r}"
        )
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    if emulate:
        t1 = _emu_t1(x3, bc3, mats)
        if exchange is not None:
            t1 = exchange(t1)
        return _emu_apply(x3, bc3, t1, mats, sigma=sigma)
    by, bx = _clamp_blocks(x3.shape, by, bx)
    if "sxzm" in mats:
        # Separable-bc kernels: no full-lattice bc operand (the bool
        # array ships as a converted s32 buffer — see _kernel_t1_m).
        vma = _join_vma(x3, *mats.values())
        t1c, t23c = _build_calls_m(tuple(x3.shape), by, bx,
                                   precision == "high", interpret, vma,
                                   sigma)
        names = ("Ktx", "sxzm", "Kty", "KtzT", "sx2d", "sycol", "s23m",
                 "mx2", "myb", "mzrow")
        x3, *mvals = _pvary_all(vma, x3, *(mats[k] for k in names))
        m = dict(zip(names, mvals))
        t1 = t1c(x3, m["myb"], m["Ktx"], m["sxzm"])
        if exchange is not None:
            t1 = exchange(t1)
        return t23c(x3, m["mx2"], t1, m["Kty"], m["KtzT"], m["sx2d"],
                    m["sycol"], m["s23m"], m["myb"], m["mzrow"])
    vma = _join_vma(x3, bc3, *mats.values())
    t1c, t23c = _build_calls(tuple(x3.shape), by, bx,
                             precision == "high", interpret, vma, sigma)
    names = ("Ktx", "sxz", "Kty", "KtzT", "sx2d", "sycol", "s23")
    x3, bc3, *mvals = _pvary_all(vma, x3, bc3, *(mats[k] for k in names))
    m = dict(zip(names, mvals))
    t1 = t1c(x3, bc3, m["Ktx"], m["sxz"])
    if exchange is not None:
        t1 = exchange(t1)
    return t23c(x3, bc3, t1, m["Kty"], m["KtzT"],
                m["sx2d"], m["sycol"], m["s23"])


class PallasKronBlocked:
    """Blocked fused-kernel Kronecker apply for large lattices (f32).

    Same operator contract as `ops.kron.KronLaplacian` restricted to
    lattice-shaped (3D) inputs; bit-compatible math with the symmetrized
    XLA path up to matmul rounding.
    """

    def __init__(self, mesh, P, kappa=2.0, by=None, bx=None,
                 interpret=False, precision="highest", sigma=0.0):
        from .kron import KronLaplacian

        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32,
                             sigma=sigma)
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.shape = mesh.lattice_shape(P)
        self.precision = precision
        self.sigma = float(sigma)
        self.diag = base.diag
        self.diag_inv = base.diag_inv
        self.bc3 = base.bc_marker.reshape(self.shape)
        self.mats = symmetrized_mats(
            base.Ks, base.ms,
            face_masks=checked_face_masks(mesh, P, base.bc_marker))
        dby, dbx = default_tiles(self.P)
        self.by, self.bx = _clamp_blocks(self.shape, by or dby, bx or dbx)
        self._interpret = interpret
        # bc3/mats are deliberately CLOSED OVER (HLO constants): measured
        # +10% at 16.2M vs passing them as jit arguments (14.4 vs 13.1
        # GDOF/s — XLA pre-lays-out constants for the Pallas operands).
        # This is safe for Pallas inputs, which are opaque to constant
        # folding; the CLAUDE.md never-close-over rule targets arrays
        # feeding XLA elementwise graphs (where folding explodes compile
        # time) and huge f32 payloads like the lattice geometry.
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, x3):
        return blocked_kron_apply(
            x3, self.bc3, self.mats, by=self.by, bx=self.bx,
            precision=self.precision, sigma=self.sigma,
            interpret=True if self._interpret else None,
        )

    def __call__(self, x):
        """Apply on a lattice-shaped (3D) or flat vector."""
        y = self._apply(jnp.asarray(x, jnp.float32).reshape(self.shape))
        return y if jnp.ndim(x) == 3 else y.reshape(-1)
