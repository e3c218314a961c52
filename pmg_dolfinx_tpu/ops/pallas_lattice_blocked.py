"""Blocked Pallas kernel for the general-hex lattice apply.

The XLA lattice path (`ops/lattice.py`) materializes ~12 quadrature-
lattice intermediates per apply (ux/uy/uz, tx/ty/tz, the partial
foldbacks) plus the 6-entry geometry stream — each a whole-lattice HBM
pass. This module fuses the entire per-cell-slab pipeline into ONE
Mosaic kernel so the only HBM traffic is: the x-expanded input slab, the
geometry slab, and the output slab.

Structure (cell-slab = one layer of cells along x, ``n = P+1``
quadrature planes):

- XLA prologue: ``xb = where(bc, 0, x)`` then `expand_axis0` (a
  reshape/concat copy, NOT a matmul) to the x-expanded lattice
  ``(Qx, NY, NZ)``. After expansion EVERY x-contraction is local to a
  cell slab (the slab holds exactly the cell's P+1 dof planes), so slabs
  are disjoint — no halos, no atomic scatters.
- kernel, grid over cell slabs: per x-plane, the z- and y-contractions
  are natural MXU dots (``plane @ EzT``, ``Ey @ plane``, ...); the
  x-derivative is an n-term VPU plane sum with the 1D matrix ``D1``
  (n is small — 7 at p=6 — so the MXU would idle on it); the 6-entry
  symmetric G (streamed as a ``(6, n, Qy, Qz)`` slab) applies pointwise
  in VMEM; then everything transposes back to an x-expanded output slab.
- XLA epilogue: `fold_axis0` (the overlap-add along x, again a
  reshape/concat) + the Dirichlet ``where(bc, x, y)`` rows.

Off-TPU the wrapper falls back to the exact XLA implementation
(`lattice_laplacian_apply` — same math; the Mosaic kernel itself is
covered by interpret-mode tests). Reference analogue: the shared-memory
sum-factorized stiffness kernel, src/laplacian.hpp:143-278, restructured
for the MXU/VMEM hierarchy with the atomicAdd scatter replaced by the
overlap-add fold.
"""

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .lattice import expand_axis0, fold_axis0
from .pallas_util import join_vma as _join_vma
from .pallas_util import out_struct
from .pallas_util import pvary_all as _pvary_all
from .pallas_util import split_bf16 as _split_bf16

HI = jax.lax.Precision.HIGHEST


_DOT = partial(jnp.dot, preferred_element_type=jnp.float32)


def _mk_dot(high):
    """dot(a, b) at the requested precision; at 'high' both operands are
    split per call (the small 1D matrices are cheap to re-split)."""
    if not high:
        return lambda a, b: _DOT(a, b, precision=HI)

    def dot3(a, b):
        a_hi, a_lo = _split_bf16(a)
        b_hi, b_lo = _split_bf16(b)
        return _DOT(a_hi, b_hi) + (_DOT(a_hi, b_lo) + _DOT(a_lo, b_hi))

    return dot3


def _kernel_lattice(xq_ref, g_ref, Ey_ref, EyT_ref, Dy_ref, DyT_ref,
                    Ez_ref, EzT_ref, Dz_ref, DzT_ref, D1_ref, out_ref,
                    *, n, bcells, high):
    dot = _mk_dot(high)
    Ey, EyT = Ey_ref[:], EyT_ref[:]
    Dy, DyT = Dy_ref[:], DyT_ref[:]
    Ez, EzT = Ez_ref[:], EzT_ref[:]
    Dz, DzT = Dz_ref[:], DzT_ref[:]
    # D1 arrives as an (n, n) block; its entries index a traced ref, so
    # read the full tile once and slice (static indices).
    D1 = D1_ref[:]
    for c in range(bcells):
        o = c * n
        # Forward: values of grad(u) on the cell slab's quadrature planes.
        tzy, uy, uz = [], [], []
        for p in range(n):
            xp = xq_ref[o + p]                     # (NY, NZ)
            tz_p = dot(xp, EzT)                    # (NY, Qz)
            dz_p = dot(xp, DzT)
            tzy.append(dot(Ey, tz_p))              # (Qy, Qz)
            uy.append(dot(Dy, tz_p))
            uz.append(dot(Ey, dz_p))
        # x-derivative: n-term VPU plane sums (n small; MXU would idle).
        ux = [
            sum(D1[q, j] * tzy[j] for j in range(n))
            for q in range(n)
        ]
        # Geometry: 6-entry symmetric G per quadrature point, then the
        # transposed x-derivative back onto the slab planes.
        tx, ty, tz = [], [], []
        for q in range(n):
            g0 = g_ref[0, o + q]
            g1 = g_ref[1, o + q]
            g2 = g_ref[2, o + q]
            g3 = g_ref[3, o + q]
            g4 = g_ref[4, o + q]
            g5 = g_ref[5, o + q]
            tx.append(g0 * ux[q] + g1 * uy[q] + g2 * uz[q])
            ty.append(g1 * ux[q] + g3 * uy[q] + g4 * uz[q])
            tz.append(g2 * ux[q] + g4 * uy[q] + g5 * uz[q])
        # Backward: D1^T along x (VPU), then transposed y/z contractions.
        for j in range(n):
            bx_j = sum(D1[q, j] * tx[q] for q in range(n))  # (Qy, Qz)
            cxy = dot(EyT, bx_j) + dot(DyT, ty[j])           # (NY, Qz)
            cz = dot(EyT, tz[j])
            out_ref[o + j] = dot(cxy, Ez) + dot(cz, Dz)      # (NY, NZ)


def _kernel_lattice_yx(xe_ref, g_ref, Ez_ref, EzT_ref, Dz_ref, DzT_ref,
                       D1_ref, out_ref, *, n, ncy, bcells, high):
    # v2 ("yexp") kernel: the input arrives x- AND y-pre-expanded
    # (XLA reshape/concat copies), so BOTH the x- and y-direction
    # derivative contractions collapse to n-term block-D1 VPU sums —
    # only the z-direction keeps MXU dots (4 per plane instead of 10).
    # Algebra: Dy = BD1_y @ Ey with BD1_y block-diagonal D1, so
    # Dy-contract(x) == BD1-rows(expand_y(x)) and Dy^T-contract ==
    # fold_y(BD1^T-rows(.)); the fold_y moves to the XLA epilogue and
    # commutes with the z-direction matmuls (different axes). Measured
    # v5e 16.2M 'highest': 8.7 -> 3.1 ms/apply vs the v1 kernel.
    dot = _mk_dot(high)
    Ez, EzT = Ez_ref[:], EzT_ref[:]
    Dz, DzT = Dz_ref[:], DzT_ref[:]
    D1 = D1_ref[:]
    Qy = xe_ref.shape[1]
    Qz = EzT.shape[1]

    def block_d1(planes_r, transpose):
        # planes_r: (ncy, n, Qz) cell-blocked rows of one (Qy, Qz) plane.
        # Returns the per-cell D1 (or D1^T) action, same shape.
        rows = []
        for q in range(n):
            if transpose:
                rows.append(sum(D1[i, q] * planes_r[:, i, :]
                                for i in range(n)))
            else:
                rows.append(sum(D1[q, i] * planes_r[:, i, :]
                                for i in range(n)))
        return jnp.stack(rows, axis=1)

    for c in range(bcells):
        o = c * n
        v, uz = [], []
        for p in range(n):
            xp = xe_ref[o + p]                     # (Qy, NZ)
            v.append(dot(xp, EzT))                 # (Qy, Qz) full values
            uz.append(dot(xp, DzT))
        ux = [
            sum(D1[q, j] * v[j] for j in range(n))
            for q in range(n)
        ]
        uy = [
            block_d1(v[p].reshape(ncy, n, Qz), False).reshape(Qy, Qz)
            for p in range(n)
        ]
        tx, ty, tz = [], [], []
        for q in range(n):
            g0 = g_ref[0, o + q]
            g1 = g_ref[1, o + q]
            g2 = g_ref[2, o + q]
            g3 = g_ref[3, o + q]
            g4 = g_ref[4, o + q]
            g5 = g_ref[5, o + q]
            tx.append(g0 * ux[q] + g1 * uy[q] + g2 * uz[q])
            ty.append(g1 * ux[q] + g3 * uy[q] + g4 * uz[q])
            tz.append(g2 * ux[q] + g4 * uy[q] + g5 * uz[q])
        for j in range(n):
            bx_j = sum(D1[q, j] * tx[q] for q in range(n))
            by_j = block_d1(ty[j].reshape(ncy, n, Qz), True
                            ).reshape(Qy, Qz)
            out_ref[o + j] = dot(bx_j + by_j, Ez) + dot(tz[j], Dz)


def _split3_bf16(a):
    """3-limb bf16 split: a == a0 + a1 + a2 exactly to f32 precision
    (8+8+8 mantissa bits cover the 24-bit f32 significand)."""
    a0 = a.astype(jnp.bfloat16).astype(jnp.float32)
    r = a - a0
    a1 = r.astype(jnp.bfloat16).astype(jnp.float32)
    a2 = (r - a1).astype(jnp.bfloat16).astype(jnp.float32)
    return a0, a1, a2


def _mk_split_dot(prec):
    """(split, dot) pair with SHARED operand splits: the caller splits
    each operand once and reuses it across every dot it feeds — unlike
    `precision=HIGHEST`, which re-decomposes both operands inside every
    dot. 'highest' = manual 6-pass bf16x3x3 (error ~1e-7, the HIGHEST
    decomposition); 'high' = 3-pass bf16x2 (drops lo*lo, ~1e-5)."""
    if prec == "native":
        # Merged-plane dots with Mosaic's own HIGHEST lowering — the
        # control that isolates the merged-plane effect from the
        # manual-split effect (measured: the manual splits LOSE).
        return (lambda a: a), (lambda a, b: _DOT(a, b, precision=HI))
    if prec == "high":
        def dot3(a_split, b_split):
            a_hi, a_lo = a_split
            b_hi, b_lo = b_split
            return _DOT(a_hi, b_hi) + (_DOT(a_hi, b_lo) + _DOT(a_lo, b_hi))

        return _split_bf16, dot3

    def dot6(a_split, b_split):
        a0, a1, a2 = a_split
        b0, b1, b2 = b_split
        return (_DOT(a0, b0)
                + (_DOT(a0, b1) + _DOT(a1, b0))
                + (_DOT(a0, b2) + _DOT(a1, b1) + _DOT(a2, b0)))

    return _split3_bf16, dot6


def _kernel_lattice_ym(xe_ref, g_ref, Ez_ref, EzT_ref, Dz_ref, DzT_ref,
                       D1_ref, out_ref, *, n, ncy, bcells, prec):
    # v5 ("ym") kernel: the yexp structure with two MXU restructurings.
    # MEASURED NEGATIVE RESULT on v5e (r4) — both levers LOSE; kept
    # opt-in as a design datapoint (auto-select never picks it):
    # (1) MERGED-PLANE z dots: the n per-plane (Qy, NZ) @ (NZ, Qz)
    #     dots of a cell slab become one (n*Qy, NZ) @ (NZ, Qz) dot —
    #     per-plane m = Qy pads to ceil(Qy/128) sublane tiles (~23%
    #     waste at Qy=294); merged m = n*Qy pads once (~5%). Measured
    #     2.05M 'highest': 2.13 GDOF/s with native-HIGHEST merged dots
    #     (prec='native') vs yexp's per-plane 3.76 — the m-pad model
    #     was wrong about what matters: the giant merged operands and
    #     backward jnp.stack copies break Mosaic's per-plane pipeline.
    # (2) SHARED OPERAND SPLITS at BOTH precisions (`_mk_split_dot`):
    #     the z matrices split once per kernel launch, the slab/stack
    #     data once per dot pair — precision=HIGHEST instead re-splits
    #     inside each dot. Measured: 1.81 GDOF/s (manual 6-pass) vs
    #     2.13 (native merged) — the split VPU passes on merged-size
    #     arrays cost more than Mosaic's internal decomposition.
    # At 16.2M the same ordering holds: ym 1.76 / yexp 2.12 'highest'.
    # Together with r3's negatives (zgrp, geom, transfer kernels,
    # bcells) this pins yexp-with-native-HIGHEST as the local optimum:
    # ~2.1 GDOF/s at 16.2M is the practical true-f32 roofline for this
    # operator structure on v5e; the remaining lever is precision
    # ('high' v1: 2.78, safe under FCG/refined outer loops).
    split, mdot = _mk_split_dot(prec)
    Ezs = split(Ez_ref[:])
    EzTs = split(EzT_ref[:])
    Dzs = split(Dz_ref[:])
    DzTs = split(DzT_ref[:])
    D1 = D1_ref[:]
    Qy = xe_ref.shape[1]
    NZ = xe_ref.shape[2]
    Qz = EzT_ref.shape[1]

    def block_d1(planes_r, transpose):
        rows = []
        for q in range(n):
            if transpose:
                rows.append(sum(D1[i, q] * planes_r[:, i, :]
                                for i in range(n)))
            else:
                rows.append(sum(D1[q, i] * planes_r[:, i, :]
                                for i in range(n)))
        return jnp.stack(rows, axis=1)

    for c in range(bcells):
        o = c * n
        slab = xe_ref[o:o + n].reshape(n * Qy, NZ)
        slab_s = split(slab)
        Vm = mdot(slab_s, EzTs).reshape(n, Qy, Qz)
        UZm = mdot(slab_s, DzTs).reshape(n, Qy, Qz)
        v = [Vm[p] for p in range(n)]
        uz = [UZm[p] for p in range(n)]
        ux = [
            sum(D1[q, j] * v[j] for j in range(n))
            for q in range(n)
        ]
        uy = [
            block_d1(v[p].reshape(ncy, n, Qz), False).reshape(Qy, Qz)
            for p in range(n)
        ]
        tx, ty, tz = [], [], []
        for q in range(n):
            g0 = g_ref[0, o + q]
            g1 = g_ref[1, o + q]
            g2 = g_ref[2, o + q]
            g3 = g_ref[3, o + q]
            g4 = g_ref[4, o + q]
            g5 = g_ref[5, o + q]
            tx.append(g0 * ux[q] + g1 * uy[q] + g2 * uz[q])
            ty.append(g1 * ux[q] + g3 * uy[q] + g4 * uz[q])
            tz.append(g2 * ux[q] + g4 * uy[q] + g5 * uz[q])
        bxy = []
        for j in range(n):
            bx_j = sum(D1[q, j] * tx[q] for q in range(n))
            by_j = block_d1(ty[j].reshape(ncy, n, Qz), True
                            ).reshape(Qy, Qz)
            bxy.append(bx_j + by_j)
        B = jnp.stack(bxy).reshape(n * Qy, Qz)
        T = jnp.stack(tz).reshape(n * Qy, Qz)
        out = mdot(split(B), Ezs) + mdot(split(T), Dzs)
        out_ref[o:o + n] = out.reshape(n, Qy, NZ)


@lru_cache(maxsize=None)
def _build_call_ym(qshape, Qz, n, ncy, bcells, prec, interpret, vma=()):
    """qshape = (Qx, Qy, NZ) of the x+y-expanded lattice (ym variant)."""
    Qx, Qy, NZ = qshape
    bq = bcells * n
    return pl.pallas_call(
        partial(_kernel_lattice_ym, n=n, ncy=ncy, bcells=bcells,
                prec=prec),
        grid=(pl.cdiv(Qx, bq),),
        in_specs=[
            pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),        # xe
            pl.BlockSpec((6, bq, Qy, Qz), lambda i: (0, i, 0, 0)),  # G
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Ez
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # EzT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Dz
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # DzT
            pl.BlockSpec((n, n), lambda i: (0, 0)),     # D1
        ],
        out_specs=pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),
        out_shape=out_struct(qshape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )


def _kernel_lattice_zg(xg_ref, g_ref, EzTb_ref, Ezb_ref, DzTb_ref,
                       Dzb_ref, D1_ref, out_ref, *, n, ncy, ngz, bcells,
                       high):
    # v4 ("zgrp") kernel: x/y handled exactly as in the yexp kernel, but
    # the z-direction MXU dots contract GROUPED block matrices instead of
    # the dense global (NZ, Qz) pair. The global Ez/Dz are block-banded
    # (n nonzeros per row), so the dense dots do ~NZ/n redundant MXU
    # flops; splitting z into ngz groups of zb cells (shared interface
    # plane duplicated, like the cell-level expand) contracts
    # (K=zb*P+1, zb*n) blocks that are the SAME for every group
    # (translation invariance: axis_matrices(zb, P)). Padded-MXU-cycle
    # model: ngz*pad128(K)*pad128(zb*n) vs pad128(NZ)*pad128(Qz) — a ~2x
    # cut at 16.2M (ncz=42, zb=14). All group arrays live in their own
    # (sublane, lane) tiles, so no in-kernel relayouts; the group
    # overlap-add rides the XLA epilogue like the cell-level folds.
    #
    # MEASURED NEGATIVE RESULT (v5e, r3): parity-exact (rel 5.7e-8 vs
    # the assembled oracle at 380k), but SLOWER than the production
    # variants everywhere it fits — 16.2M: 1.65 GDOF/s 'highest' vs
    # yexp 2.14, 1.75 'high' vs v1 2.78 (the grouped (Q, 6*ngz, Qy,
    # zbn) layout inflates the input/output windows; the MXU saving
    # never shows because the kernel is VPU/window-bound, consistent
    # with the bcells finding) — and the fatter windows VMEM-OOM at
    # 30.4M (zb=19: a (329,18,364,133) f32 input). Kept opt-in
    # (variant='zgrp') as a measured design datapoint; the auto-select
    # never picks it.
    dot = _mk_dot(high)
    EzTb, Ezb = EzTb_ref[:], Ezb_ref[:]
    DzTb, Dzb = DzTb_ref[:], Dzb_ref[:]
    D1 = D1_ref[:]
    Qy = xg_ref.shape[2]
    zbn = EzTb.shape[1]

    def block_d1(planes_r, transpose):
        rows = []
        for q in range(n):
            if transpose:
                rows.append(sum(D1[i, q] * planes_r[:, i, :]
                                for i in range(n)))
            else:
                rows.append(sum(D1[q, i] * planes_r[:, i, :]
                                for i in range(n)))
        return jnp.stack(rows, axis=1)

    for c in range(bcells):
        o = c * n
        v = [[None] * ngz for _ in range(n)]
        uz = [[None] * ngz for _ in range(n)]
        for p in range(n):
            for g in range(ngz):
                xpg = xg_ref[o + p, g]                 # (Qy, K)
                v[p][g] = dot(xpg, EzTb)               # (Qy, zbn)
                uz[p][g] = dot(xpg, DzTb)
        tx = [[None] * ngz for _ in range(n)]
        ty = [[None] * ngz for _ in range(n)]
        tz = [[None] * ngz for _ in range(n)]
        for q in range(n):
            for g in range(ngz):
                uxqg = sum(D1[q, j] * v[j][g] for j in range(n))
                uyqg = block_d1(v[q][g].reshape(ncy, n, zbn), False
                                ).reshape(Qy, zbn)
                g0 = g_ref[o + q, 0 * ngz + g]
                g1 = g_ref[o + q, 1 * ngz + g]
                g2 = g_ref[o + q, 2 * ngz + g]
                g3 = g_ref[o + q, 3 * ngz + g]
                g4 = g_ref[o + q, 4 * ngz + g]
                g5 = g_ref[o + q, 5 * ngz + g]
                tx[q][g] = g0 * uxqg + g1 * uyqg + g2 * uz[q][g]
                ty[q][g] = g1 * uxqg + g3 * uyqg + g4 * uz[q][g]
                tz[q][g] = g2 * uxqg + g4 * uyqg + g5 * uz[q][g]
        for j in range(n):
            for g in range(ngz):
                bx = sum(D1[q, j] * tx[q][g] for q in range(n))
                by = block_d1(ty[j][g].reshape(ncy, n, zbn), True
                              ).reshape(Qy, zbn)
                out_ref[o + j, g] = (dot(bx + by, Ezb)
                                     + dot(tz[j][g], Dzb))


def _kernel_lattice_geom(xe_ref, co_ref, Sy_ref, SyE_ref, SyW_ref,
                         SzT_ref, SzET_ref, SzWT_ref, Ez_ref, EzT_ref,
                         Dz_ref, DzT_ref, D1_ref, out_ref,
                         *, n, ncy, bcells, high, xi, wx):
    # v3 ("geom") kernel: same contraction structure as the yexp kernel,
    # but the 6-entry geometry stream is REPLACED by on-the-fly geometry:
    # per cell, the trilinear map's Jacobian columns are bilinear in the
    # two non-derivative reference coordinates (d x/d xi has no xi
    # dependence, etc.), so J is reconstructed from 36 per-cell
    # coefficients. Coefficient grids (ncy, ncz) expand to quadrature
    # planes via small MXU matmuls against cell->point expansion
    # matrices (Sy / SzT; the E-scaled variants fold the within-cell
    # coordinate factor into the expansion, the W-scaled ones the GLL
    # weights), then adj(J), detJ and the w*kappa/detJ scale are VPU
    # plane math. HBM geometry traffic drops from 6 floats/qpoint to
    # 37 floats/cell ((P+1)^3/6 ~ 57x at p=6) — the enabler for general
    # hexes at the reference's 30.4M profile size, where the f32 G slab
    # alone is 1.16 GB. Reference analogue: the in-kernel
    # `geometry_computation` path (src/laplacian.hpp:22-113) that the
    # reference runs at setup; here it runs per apply because HBM
    # bandwidth, not FLOPs, bounds this kernel.
    dot = _mk_dot(high)     # operator contractions honor `precision`
    dotg = _mk_dot(False)   # geometry expansions stay exact f32
    Ez, EzT = Ez_ref[:], EzT_ref[:]
    Dz, DzT = Dz_ref[:], DzT_ref[:]
    D1 = D1_ref[:]
    Sy, SyE, SyW = Sy_ref[:], SyE_ref[:], SyW_ref[:]
    SzT, SzET, SzWT = SzT_ref[:], SzET_ref[:], SzWT_ref[:]
    Qy = xe_ref.shape[1]
    Qz = EzT.shape[1]

    def block_d1(planes_r, transpose):
        rows = []
        for q in range(n):
            if transpose:
                rows.append(sum(D1[i, q] * planes_r[:, i, :]
                                for i in range(n)))
            else:
                rows.append(sum(D1[q, i] * planes_r[:, i, :]
                                for i in range(n)))
        return jnp.stack(rows, axis=1)

    for c in range(bcells):
        o = c * n
        cg = lambda t: co_ref[t, c]
        # J column 0 (xi-derivative of x/y/z): bilinear in (eta, zeta),
        # constant across the slab's xi planes — expand once per cell.
        c0 = []
        for i in range(3):
            A, B, C, D = (cg((i * 3 + 0) * 4 + t) for t in range(4))
            c0.append(dotg(Sy, dotg(A, SzT) + dotg(C, SzET))
                      + dotg(SyE, dotg(B, SzT) + dotg(D, SzET)))
        # Columns 1/2: bilinear in (xi, zeta) / (xi, eta); the xi factor
        # is a static scalar per plane, so expand the xi-constant and
        # xi-linear parts once and FMA per plane below.
        U1, V1, U2, V2 = [], [], [], []
        for i in range(3):
            A, B, C, D = (cg((i * 3 + 1) * 4 + t) for t in range(4))
            U1.append(dotg(Sy, dotg(A, SzT) + dotg(C, SzET)))
            V1.append(dotg(Sy, dotg(B, SzT) + dotg(D, SzET)))
        for i in range(3):
            A, B, C, D = (cg((i * 3 + 2) * 4 + t) for t in range(4))
            U2.append(dotg(dotg(Sy, A) + dotg(SyE, C), SzT))
            V2.append(dotg(dotg(Sy, B) + dotg(SyE, D), SzT))
        # kappa * wy * wz plane (wx folds in per xi plane below).
        kw = dotg(SyW, dotg(cg(36), SzWT))

        v, uz = [], []
        for p in range(n):
            xp = xe_ref[o + p]                     # (Qy, NZ)
            v.append(dot(xp, EzT))                 # (Qy, Qz)
            uz.append(dot(xp, DzT))
        ux = [
            sum(D1[q, j] * v[j] for j in range(n))
            for q in range(n)
        ]
        uy = [
            block_d1(v[p].reshape(ncy, n, Qz), False).reshape(Qy, Qz)
            for p in range(n)
        ]
        tx, ty, tz = [], [], []
        for q in range(n):
            a, d, g = c0[0], c0[1], c0[2]                    # J[i][0]
            b = U1[0] + xi[q] * V1[0]                        # J[0][1]
            e = U1[1] + xi[q] * V1[1]                        # J[1][1]
            h = U1[2] + xi[q] * V1[2]                        # J[2][1]
            cc = U2[0] + xi[q] * V2[0]                       # J[0][2]
            f = U2[1] + xi[q] * V2[1]                        # J[1][2]
            i_ = U2[2] + xi[q] * V2[2]                       # J[2][2]
            # Adjugate K = detJ * J^{-1} (cofactor form, as
            # fem/geometry.py:_adjugate_3x3) and the cofactor-expansion
            # determinant.
            K00 = e * i_ - f * h
            K01 = cc * h - b * i_
            K02 = b * f - cc * e
            K10 = f * g - d * i_
            K11 = a * i_ - cc * g
            K12 = cc * d - a * f
            K20 = d * h - e * g
            K21 = b * g - a * h
            K22 = a * e - b * d
            det = a * K00 + d * K01 + g * K02
            s = (kw * wx[q]) / det
            # t = s * K K^T u, factored as K (s * (K^T u)) — skips ever
            # materializing the 6 G entries.
            w0 = s * (K00 * ux[q] + K10 * uy[q] + K20 * uz[q])
            w1 = s * (K01 * ux[q] + K11 * uy[q] + K21 * uz[q])
            w2 = s * (K02 * ux[q] + K12 * uy[q] + K22 * uz[q])
            tx.append(K00 * w0 + K01 * w1 + K02 * w2)
            ty.append(K10 * w0 + K11 * w1 + K12 * w2)
            tz.append(K20 * w0 + K21 * w1 + K22 * w2)
        for j in range(n):
            bx_j = sum(D1[q, j] * tx[q] for q in range(n))
            by_j = block_d1(ty[j].reshape(ncy, n, Qz), True
                            ).reshape(Qy, Qz)
            out_ref[o + j] = dot(bx_j + by_j, Ez) + dot(tz[j], Dz)


@lru_cache(maxsize=None)
def _build_call_geom(qshape, Qz, n, nc_yz, bcells, high, xi, wx,
                     interpret, vma=()):
    """qshape = (Qx, Qy, NZ) of the x+y-expanded lattice; nc_yz =
    (ncy, ncz); xi/wx are the static per-plane GLL point/weight tuples."""
    Qx, Qy, NZ = qshape
    ncy, ncz = nc_yz
    bq = bcells * n
    return pl.pallas_call(
        partial(_kernel_lattice_geom, n=n, ncy=ncy, bcells=bcells,
                high=high, xi=xi, wx=wx),
        grid=(pl.cdiv(Qx, bq),),
        in_specs=[
            pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),          # xe
            pl.BlockSpec((37, bcells, ncy, ncz), lambda i: (0, i, 0, 0)),
            pl.BlockSpec((Qy, ncy), lambda i: (0, 0)),  # Sy
            pl.BlockSpec((Qy, ncy), lambda i: (0, 0)),  # SyE
            pl.BlockSpec((Qy, ncy), lambda i: (0, 0)),  # SyW
            pl.BlockSpec((ncz, Qz), lambda i: (0, 0)),  # SzT
            pl.BlockSpec((ncz, Qz), lambda i: (0, 0)),  # SzET
            pl.BlockSpec((ncz, Qz), lambda i: (0, 0)),  # SzWT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Ez
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # EzT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Dz
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # DzT
            pl.BlockSpec((n, n), lambda i: (0, 0)),     # D1
        ],
        out_specs=pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),
        out_shape=out_struct(qshape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_call_zg(qshape, zbn, n, ncy, bcells, high, interpret, vma=()):
    """qshape = (Qx, ngz, Qy, K) of the x+y-expanded, z-grouped lattice."""
    Qx, ngz, Qy, K = qshape
    bq = bcells * n
    return pl.pallas_call(
        partial(_kernel_lattice_zg, n=n, ncy=ncy, ngz=ngz, bcells=bcells,
                high=high),
        grid=(pl.cdiv(Qx, bq),),
        in_specs=[
            pl.BlockSpec((bq, ngz, Qy, K), lambda i: (i, 0, 0, 0)),   # xg
            pl.BlockSpec((bq, 6 * ngz, Qy, zbn),
                         lambda i: (i, 0, 0, 0)),                      # G
            pl.BlockSpec((K, zbn), lambda i: (0, 0)),   # EzTb
            pl.BlockSpec((zbn, K), lambda i: (0, 0)),   # Ezb
            pl.BlockSpec((K, zbn), lambda i: (0, 0)),   # DzTb
            pl.BlockSpec((zbn, K), lambda i: (0, 0)),   # Dzb
            pl.BlockSpec((n, n), lambda i: (0, 0)),     # D1
        ],
        out_specs=pl.BlockSpec((bq, ngz, Qy, K), lambda i: (i, 0, 0, 0)),
        out_shape=out_struct(qshape, vma),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )


def _pad128(v):
    return -(-int(v) // 128) * 128


def select_zgroup(ncz, P, max_groups=8, margin=0.8):
    """Pick the z-group size ``zb`` for the 'zgrp' kernel, or None.

    Cost model: padded MXU cycles of the per-plane z-direction dots —
    dense ``pad128(NZ) * pad128(Qz)`` vs grouped
    ``ngz * pad128(zb*P+1) * pad128(zb*n)``. Returns the divisor of
    ``ncz`` minimizing the grouped cost if it beats dense by at least
    ``1 - margin`` (grouping adds small prologue/epilogue copies, so a
    paper-thin MXU win is not worth taking); else None."""
    n = P + 1
    dense = _pad128(ncz * P + 1) * _pad128(ncz * n)
    best, best_cost = None, dense * margin
    for zb in range(1, ncz):
        if ncz % zb:
            continue
        ngz = ncz // zb
        if ngz < 2 or ngz > max_groups:
            continue
        cost = ngz * _pad128(zb * P + 1) * _pad128(zb * n)
        if cost < best_cost:
            best, best_cost = zb, cost
    return best


def zgroup_matrices(zb, P, dtype=jnp.float32):
    """The (shared-by-every-group) z-block expansion/derivative matrices:
    `axis_matrices` of a zb-cell axis, shapes ``(zb*(P+1), zb*P+1)``."""
    from .lattice import axis_matrices

    E, Dg = axis_matrices(zb, P)
    f = lambda a: jnp.asarray(a, dtype)
    return dict(EzTb=f(E.T.copy()), Ezb=f(E),
                DzTb=f(Dg.T.copy()), Dzb=f(Dg))


def geometry_to_zgrouped(Gq, zb, P):
    """Reorder quadrature-lattice geometry ``(Qx, Qy, Qz, 6)`` to the
    z-grouped kernel layout ``(Qx, 6*ngz, Qy, zb*(P+1))`` (entry-major
    on dim 1; done once at setup so the kernel never pays a per-apply
    G relayout)."""
    Gq = np.asarray(Gq)
    Qx, Qy, Qz, _ = Gq.shape
    zbn = zb * (P + 1)
    ngz = Qz // zbn
    G = Gq.reshape(Qx, Qy, ngz, zbn, 6)
    G = np.transpose(G, (0, 4, 2, 1, 3))    # (Qx, 6, ngz, Qy, zbn)
    return np.ascontiguousarray(G.reshape(Qx, 6 * ngz, Qy, zbn))


def blocked_lattice_apply_zgrp(x, mats, zmats, Gz, bc_marker, nc, P, zb,
                               *, bcells=1, precision="highest",
                               interpret=None, apply_bc=True):
    """Fused ``y = A x`` with the z axis processed in groups of ``zb``
    cells (`_kernel_lattice_zg`). ``zmats`` from `zgroup_matrices`,
    ``Gz`` from `geometry_to_zgrouped`; ``zb`` must divide ``nc[2]``
    (use `select_zgroup`). Off TPU falls back to the exact XLA lattice
    path on the ungrouped geometry."""
    if precision not in ("highest", "high"):
        raise ValueError(
            f"precision must be 'highest' or 'high', got {precision!r}"
        )
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    ncx, ncy, ncz = nc
    n = P + 1
    NX, NY, NZ = ncx * P + 1, ncy * P + 1, ncz * P + 1
    if ncz % zb:
        raise ValueError(f"zb={zb} must divide ncz={ncz}")
    ngz = ncz // zb
    K = zb * P + 1
    zbn = zb * n
    if emulate:
        from .lattice import lattice_laplacian_apply

        G = jnp.transpose(
            jnp.reshape(Gz, (ncx * n, 6, ngz, ncy * n, zbn)),
            (0, 3, 2, 4, 1),
        ).reshape(ncx * n, ncy * n, ncz * n, 6)
        xl_mats = {k: mats[k] for k in ("Ex", "Dx", "Ey", "Dy", "Ez", "Dz")}
        return lattice_laplacian_apply(
            x, xl_mats, G, bc_marker, precision="highest",
            apply_bc=apply_bc,
        )

    from .lattice import _expand, _fold

    xb = jnp.where(bc_marker, jnp.zeros_like(x), x).reshape(NX, NY, NZ)
    xq = expand_axis0(xb, ncx, P)                      # (Qx, NY, NZ)
    xe = _expand(xq, 1, ncy, P)                        # (Qx, Qy, NZ)
    # z-group expand: overlapping K-wide windows (interface plane shared
    # by adjacent groups, duplicated like the cell-level expand).
    xg = jnp.stack(
        [xe[..., g * zb * P: g * zb * P + K] for g in range(ngz)], axis=1
    )                                                  # (Qx, ngz, Qy, K)
    vma = _join_vma(x, bc_marker, Gz, *zmats.values(), mats["D1"])
    call = _build_call_zg((ncx * n, ngz, ncy * n, K), zbn, n, ncy,
                          min(bcells, ncx), precision == "high",
                          interpret, vma)
    names = ("EzTb", "Ezb", "DzTb", "Dzb")
    xg, Gz, *mvals = _pvary_all(
        vma, xg, Gz, *(zmats[k] for k in names), mats["D1"]
    )
    yg = call(xg, Gz, *mvals)                          # (Qx, ngz, Qy, K)
    # Group-fold along z: adjacent groups overlap in ONE plane.
    parts = [yg[:, 0]] + [yg[:, g, :, 1:] for g in range(1, ngz)]
    yq = jnp.concatenate(parts, axis=-1)               # (Qx, Qy, NZ)
    for g in range(1, ngz):
        yq = yq.at[:, :, g * zb * P].add(yg[:, g, :, 0])
    yq = _fold(yq, 1, ncy, P)
    y = fold_axis0(yq, ncx, P).reshape(jnp.shape(x))
    if not apply_bc:
        return y
    return jnp.where(bc_marker, x, y)


@lru_cache(maxsize=None)
def _build_call_yx(qshape, Qz, n, ncy, bcells, high, interpret, vma=()):
    """qshape = (Qx, Qy, NZ) of the x+y-expanded lattice."""
    Qx, Qy, NZ = qshape
    bq = bcells * n
    return pl.pallas_call(
        partial(_kernel_lattice_yx, n=n, ncy=ncy, bcells=bcells, high=high),
        grid=(pl.cdiv(Qx, bq),),
        in_specs=[
            pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),        # xe
            pl.BlockSpec((6, bq, Qy, Qz), lambda i: (0, i, 0, 0)),  # G
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Ez
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # EzT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Dz
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # DzT
            pl.BlockSpec((n, n), lambda i: (0, 0)),     # D1
        ],
        out_specs=pl.BlockSpec((bq, Qy, NZ), lambda i: (i, 0, 0)),
        out_shape=out_struct(qshape, vma),
        compiler_params=pltpu.CompilerParams(
            # bcells=2 at 16M needs ~113 MiB (the 29 MiB/cell G slab,
            # double-buffered); v5e has 128 MiB of VMEM.
            vmem_limit_bytes=120 * 1024 * 1024
        ),
        interpret=interpret,
    )


@lru_cache(maxsize=None)
def _build_call(qshape, nyz, n, bcells, high, interpret, vma=()):
    """qshape = (Qx, NY, NZ) of the x-expanded lattice; nyz = (Qy, Qz)."""
    Qx, NY, NZ = qshape
    Qy, Qz = nyz
    bq = bcells * n
    out = out_struct(qshape, vma)
    return pl.pallas_call(
        partial(_kernel_lattice, n=n, bcells=bcells, high=high),
        grid=(pl.cdiv(Qx, bq),),
        in_specs=[
            pl.BlockSpec((bq, NY, NZ), lambda i: (i, 0, 0)),       # xq
            pl.BlockSpec((6, bq, Qy, Qz), lambda i: (0, i, 0, 0)),  # G
            pl.BlockSpec((Qy, NY), lambda i: (0, 0)),   # Ey
            pl.BlockSpec((NY, Qy), lambda i: (0, 0)),   # EyT
            pl.BlockSpec((Qy, NY), lambda i: (0, 0)),   # Dy
            pl.BlockSpec((NY, Qy), lambda i: (0, 0)),   # DyT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Ez
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # EzT
            pl.BlockSpec((Qz, NZ), lambda i: (0, 0)),   # Dz
            pl.BlockSpec((NZ, Qz), lambda i: (0, 0)),   # DzT
            pl.BlockSpec((n, n), lambda i: (0, 0)),     # D1
        ],
        out_specs=pl.BlockSpec((bq, NY, NZ), lambda i: (i, 0, 0)),
        out_shape=out,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024
        ),
        interpret=interpret,
    )


def lattice_blocked_mats(nc, P, dtype=jnp.float32):
    """The small per-axis matrices the kernel consumes (replicated).

    ``nc`` is the (shard-local) cell-count triple — `BoxMesh.nc` on a
    single device, `GridPartition.cells_per_shard` under shard_map.
    ``Ex``/``Dx`` are only used by the exact-XLA fallback on non-TPU
    backends (the kernel handles the x direction with ``D1`` plane sums).
    """
    from ..fem.gll import derivative_matrix
    from .lattice import axis_matrices

    ncx, ncy, ncz = nc
    Ex, Dx = axis_matrices(ncx, P)
    Ey, Dy = axis_matrices(ncy, P)
    Ez, Dz = axis_matrices(ncz, P)
    f = lambda a: jnp.asarray(a, dtype)
    return dict(
        Ex=f(Ex), Dx=f(Dx),
        Ey=f(Ey), EyT=f(Ey.T.copy()), Dy=f(Dy), DyT=f(Dy.T.copy()),
        Ez=f(Ez), EzT=f(Ez.T.copy()), Dz=f(Dz), DzT=f(Dz.T.copy()),
        D1=f(derivative_matrix(P)),
    )


def geometry_to_gfirst(Gq):
    """Reorder the quadrature-lattice geometry ``(Qx, Qy, Qz, 6)`` to
    ``(6, Qx, Qy, Qz)`` (the 6 G-entries must not sit on the 128-lane
    minor dim)."""
    return np.ascontiguousarray(np.moveaxis(np.asarray(Gq), -1, 0))


def _bilinear_coeffs(f):
    """Coefficients (A, B, C, D) of ``A + B s + C t + D s t`` from corner
    values ``f[..., s, t]`` (s, t in {0, 1}, reference coords in [0, 1])."""
    A = f[..., 0, 0]
    B = f[..., 1, 0] - A
    C = f[..., 0, 1] - A
    D = f[..., 1, 1] - f[..., 1, 0] - f[..., 0, 1] + A
    return A, B, C, D


def lattice_geom_coefficients(mesh, P, kappa_cells):
    """Per-cell Jacobian coefficient grids ``(37, ncx, ncy, ncz)`` f64.

    Rows 0..35: entry ``(i*3 + j)*4 + term`` holds bilinear term
    ``term`` (1, s, t, st) of Jacobian entry ``J[i][j] = d x_i / d xi_j``
    over its two free reference coordinates (the trilinear map's
    derivative in direction j is constant in coordinate j). Row 36 is
    the DG-0 coefficient. Host-side, float64 (cast at upload)."""
    ncx, ncy, ncz = mesh.nc
    coords = np.asarray(mesh.geometry_x)[np.asarray(mesh.geometry_dofmap)]
    # Corner index (a*2 + b)*2 + c (tabulate_geometry_dphi convention).
    X = coords.reshape(ncx, ncy, ncz, 2, 2, 2, 3)
    co = np.empty((37, ncx, ncy, ncz), np.float64)
    # J column j: corner differences along axis j; free corners keep
    # tabulation order (axis order after the diff is the free pair).
    cols = (
        X[:, :, :, 1, :, :, :] - X[:, :, :, 0, :, :, :],  # d/dxi: (b, c)
        X[:, :, :, :, 1, :, :] - X[:, :, :, :, 0, :, :],  # d/deta: (a, c)
        X[:, :, :, :, :, 1, :] - X[:, :, :, :, :, 0, :],  # d/dzeta: (a, b)
    )
    for j, fj in enumerate(cols):
        # (..., s, t, 3) -> (..., 3, s, t): free corner pair last.
        terms = _bilinear_coeffs(np.moveaxis(fj, -1, -3))
        for i in range(3):
            for t in range(4):
                co[(i * 3 + j) * 4 + t] = terms[t][..., i]
    co[36] = np.asarray(kappa_cells, np.float64).reshape(ncx, ncy, ncz)
    return co


def _cell_expansion_1d(nc, vals):
    """(nc*n, nc) cell->point expansion ``S[c*n + j, c] = vals[j]``."""
    n = vals.shape[0]
    S = np.zeros((nc * n, nc))
    rows = np.arange(nc * n)
    S[rows, rows // n] = vals[rows % n]
    return S


def lattice_geom_data(nc, P, dtype=jnp.float32):
    """Static expansion matrices + GLL point/weight tuples for the geom
    kernel. ``co`` (from `lattice_geom_coefficients`) is the only
    mesh-sized array; everything here is O(Q x nc)."""
    from ..fem.gll import gauss_lobatto

    ncx, ncy, ncz = nc
    n = P + 1
    q1, w1 = gauss_lobatto(n)
    f = lambda a: jnp.asarray(a, dtype)
    return dict(
        Sy=f(_cell_expansion_1d(ncy, np.ones(n))),
        SyE=f(_cell_expansion_1d(ncy, q1)),
        SyW=f(_cell_expansion_1d(ncy, w1)),
        SzT=f(_cell_expansion_1d(ncz, np.ones(n)).T.copy()),
        SzET=f(_cell_expansion_1d(ncz, q1).T.copy()),
        SzWT=f(_cell_expansion_1d(ncz, w1).T.copy()),
    ), tuple(float(v) for v in q1), tuple(float(v) for v in w1)


def geom_to_G(co, nc, P, xp=np):
    """Reconstruct the quadrature-lattice geometry ``(Qx, Qy, Qz, 6)``
    from the coefficient grids — the twin of the kernel's in-VMEM
    pipeline. ``xp=np`` gives the float64 host version (parity tests);
    ``xp=jnp`` is jittable and feeds the exact-XLA fallback off TPU."""
    from ..fem.geometry import _adjugate_3x3
    from ..fem.gll import gauss_lobatto

    ncx, ncy, ncz = nc
    n = P + 1
    q1, w1 = gauss_lobatto(n)
    if xp is np:
        co = np.asarray(co, np.float64)
    # Block-form coordinate factors over (ncx, n, ncy, n, ncz, n).
    xi = q1.reshape(1, n, 1, 1, 1, 1)
    eta = q1.reshape(1, 1, 1, n, 1, 1)
    zeta = q1.reshape(1, 1, 1, 1, 1, n)
    if xp is not np:
        xi, eta, zeta = (xp.asarray(v, co.dtype) for v in (xi, eta, zeta))
    free = {0: (eta, zeta), 1: (xi, zeta), 2: (xi, eta)}
    cell = lambda t: co[t][:, None, :, None, :, None]
    Jcols = []
    for i in range(3):
        row = []
        for j in range(3):
            s, t = free[j]
            base = (i * 3 + j) * 4
            v = (cell(base) + cell(base + 1) * s
                 + cell(base + 2) * t + cell(base + 3) * s * t)
            row.append(xp.broadcast_to(v, (ncx, n, ncy, n, ncz, n)))
        Jcols.append(xp.stack(row, axis=-1))
    Jq = xp.stack(Jcols, axis=-2)      # (..., i, j)
    K = _adjugate_3x3(Jq, xp=xp)
    det = (Jq[..., 0, 0] * K[..., 0, 0] + Jq[..., 1, 0] * K[..., 0, 1]
           + Jq[..., 2, 0] * K[..., 0, 2])
    KKt = xp.einsum("...am,...bm->...ab", K, K)
    w = np.einsum("i,j,k->ijk", w1, w1, w1)[None, :, None, :, None, :]
    if xp is not np:
        w = xp.asarray(w, co.dtype)
    scale = w * cell(36) / det
    G = xp.stack(
        [KKt[..., 0, 0], KKt[..., 1, 0], KKt[..., 2, 0],
         KKt[..., 1, 1], KKt[..., 2, 1], KKt[..., 2, 2]],
        axis=-1,
    ) * scale[..., None]
    # Block order (ncx, n, ncy, n, ncz, n, 6) IS the lattice layout.
    return G.reshape(ncx * n, ncy * n, ncz * n, 6)


def blocked_lattice_apply_geom(x, mats, co, geom, bc_marker, nc, P, *,
                               xi, wx, bcells=1, precision="highest",
                               interpret=None, apply_bc=True):
    """Fused ``y = A x`` with IN-KERNEL geometry: no G stream. ``co`` is
    the (37, ncx, ncy, ncz) coefficient array (f32 on device), ``geom``
    the small expansion-matrix dict and ``xi``/``wx`` the static GLL
    tuples from `lattice_geom_data`. Off TPU falls back to the exact
    XLA lattice path with `geom_to_G`-reconstructed factors."""
    if precision not in ("highest", "high"):
        raise ValueError(
            f"precision must be 'highest' or 'high', got {precision!r}"
        )
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    ncx, ncy, ncz = nc
    n = P + 1
    NX, NY, NZ = ncx * P + 1, ncy * P + 1, ncz * P + 1
    if emulate:
        from .lattice import lattice_laplacian_apply

        G = geom_to_G(co, nc, P, xp=jnp)
        xl_mats = {k: mats[k] for k in ("Ex", "Dx", "Ey", "Dy", "Ez", "Dz")}
        return lattice_laplacian_apply(
            x, xl_mats, G, bc_marker, precision="highest",
            apply_bc=apply_bc,
        )

    from .lattice import _expand, _fold

    xb = jnp.where(bc_marker, jnp.zeros_like(x), x).reshape(NX, NY, NZ)
    xq = expand_axis0(xb, ncx, P)                      # (Qx, NY, NZ)
    xe = _expand(xq, 1, ncy, P)                        # (Qx, Qy, NZ)
    vma = _join_vma(x, bc_marker, co, *geom.values(), *mats.values())
    call = _build_call_geom((ncx * n, ncy * n, NZ), ncz * n, n,
                            (ncy, ncz), min(bcells, ncx),
                            precision == "high", xi, wx, interpret, vma)
    names = ("Ez", "EzT", "Dz", "DzT", "D1")
    gnames = ("Sy", "SyE", "SyW", "SzT", "SzET", "SzWT")
    xe, co, *vals = _pvary_all(
        vma, xe, co, *(geom[k] for k in gnames), *(mats[k] for k in names)
    )
    yq = call(xe, co, *vals)
    yq = _fold(yq, 1, ncy, P)
    y = fold_axis0(yq, ncx, P).reshape(jnp.shape(x))
    if not apply_bc:
        return y
    return jnp.where(bc_marker, x, y)


def blocked_lattice_apply(x, mats, Gt, bc_marker, nc, P, *, bcells=1,
                          precision="highest", interpret=None,
                          apply_bc=True, variant=None):
    """Fused ``y = A x`` on general hexes (shape-preserving like
    `lattice_laplacian_apply`). ``Gt`` is the ``(6, Qx, Qy, Qz)`` array
    from `geometry_to_gfirst`; ``mats`` from `lattice_blocked_mats`.

    ``variant``: 'yexp' pre-expands BOTH x and y in XLA so the kernel
    keeps MXU dots only for the z direction (`_kernel_lattice_yx`);
    'v1' is the original x-expanded kernel (y via E/D matmuls). Measured
    (v5e, p=6 general hex, GDOF/s at 2.05M / 16.2M):
    'highest': yexp 4.13 / 2.14 vs v1 3.21 / 1.88 — yexp wins;
    'high' (bf16x3): v1 5.61 / 2.78 vs yexp 4.57 / 2.49 — v1 wins (the
    bf16 split speeds the matmuls v1 leans on, while the VPU block-D1
    sums gain nothing). Default (None): picked by precision. 'ym'
    (merged-plane dots + shared operand splits) measured SLOWER at both
    sizes and stays opt-in — see `_kernel_lattice_ym` and
    ARTIFACTS/lattice_roofline_r4.md for the roofline diagnosis.
    """
    if precision not in ("highest", "high"):
        raise ValueError(
            f"precision must be 'highest' or 'high', got {precision!r}"
        )
    if variant is None:
        variant = "v1" if precision == "high" else "yexp"
    if variant not in ("yexp", "v1", "ym"):
        raise ValueError(f"unknown variant {variant!r} (the in-kernel-"
                         "geometry 'geom' and z-grouped 'zgrp' variants "
                         "have their own entry points, "
                         "`blocked_lattice_apply_geom` / "
                         "`blocked_lattice_apply_zgrp`)")
    emulate = False
    if interpret is None:
        emulate = jax.default_backend() != "tpu"
        interpret = False
    ncx, ncy, ncz = nc
    n = P + 1
    NX, NY, NZ = ncx * P + 1, ncy * P + 1, ncz * P + 1
    if emulate:
        # Exact XLA fallback (same math) for non-TPU backends; the kernel
        # itself is covered by interpret-mode tests.
        from .lattice import lattice_laplacian_apply

        G = jnp.moveaxis(Gt, 0, -1)
        xl_mats = {k: mats[k] for k in ("Ex", "Dx", "Ey", "Dy", "Ez", "Dz")}
        return lattice_laplacian_apply(
            x, xl_mats, G, bc_marker, precision="highest",
            apply_bc=apply_bc,
        )

    xb = jnp.where(bc_marker, jnp.zeros_like(x), x).reshape(NX, NY, NZ)
    xq = expand_axis0(xb, ncx, P)                      # (Qx, NY, NZ) copy
    vma = _join_vma(x, bc_marker, Gt, *mats.values())
    if variant in ("yexp", "ym"):
        from .lattice import _expand, _fold

        xe = _expand(xq, 1, ncy, P)                    # (Qx, Qy, NZ)
        if variant == "ym":
            call = _build_call_ym((ncx * n, ncy * n, NZ), ncz * n, n,
                                  ncy, min(bcells, ncx), precision,
                                  interpret, vma)
        else:
            call = _build_call_yx((ncx * n, ncy * n, NZ), ncz * n, n,
                                  ncy, min(bcells, ncx),
                                  precision == "high", interpret, vma)
        names = ("Ez", "EzT", "Dz", "DzT", "D1")
        xe, Gt, *mvals = _pvary_all(vma, xe, Gt, *(mats[k] for k in names))
        yq = call(xe, Gt, *mvals)
        yq = _fold(yq, 1, ncy, P)                      # y overlap-add
    else:
        call = _build_call((ncx * n, NY, NZ), (ncy * n, ncz * n), n,
                           min(bcells, ncx), precision == "high",
                           interpret, vma)
        names = ("Ey", "EyT", "Dy", "DyT", "Ez", "EzT", "Dz", "DzT", "D1")
        xq, Gt, *mvals = _pvary_all(vma, xq, Gt, *(mats[k] for k in names))
        yq = call(xq, Gt, *mvals)
    y = fold_axis0(yq, ncx, P).reshape(jnp.shape(x))
    if not apply_bc:
        return y
    return jnp.where(bc_marker, x, y)


class PallasLatticeBlocked:
    """Drop-in general-hex operator over the fused lattice kernel.

    Same contract as `LatticeLaplacian` (apply + diag), f32 only.
    ``kappa`` may be scalar or per-cell DG-0. ``variant='geom'`` selects
    the in-kernel-geometry kernel: no quadrature-lattice G array exists
    at all (37 floats/cell upload instead of 6 floats/qpoint) — the
    memory-scalable configuration for large general-hex problems.
    """

    def __init__(self, mesh, P, kappa=2.0, bcells=1, interpret=False,
                 precision="highest", variant=None, zb=None):
        from ..fem.assembly import resolve_kappa_split, scale_G
        from ..fem.geometry import (
            geometry_factors,
            quadrature_weights_3d,
            tabulate_geometry_dphi,
        )
        from ..fem.gll import derivative_matrix
        from .laplacian import laplacian_diagonal
        from .lattice import geometry_to_qlattice

        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.precision = precision
        self.bcells = int(bcells)
        self.variant = variant
        self._interpret = interpret
        kappa_cells, kt, _ = resolve_kappa_split(mesh, kappa)
        if kt is not None and variant == "geom":
            raise ValueError(
                "variant='geom' rebuilds geometry from scalar-kappa "
                "coefficients in-kernel; tensor kappa needs the "
                "G-streaming variants ('yexp'/'v1'/'zgrp')"
            )
        G_cells, _ = geometry_factors(
            mesh.geometry_x,
            mesh.geometry_dofmap,
            tabulate_geometry_dphi(self.P),
            quadrature_weights_3d(self.P),
            xp=np,
            kappa=kt,
        )
        self.Gz = self.zb = self.zmats = None
        if variant == "geom":
            # In-kernel geometry: upload only the per-cell coefficient
            # grids (37 floats/cell) — no quadrature-lattice G stream.
            self.co = jnp.asarray(
                lattice_geom_coefficients(mesh, self.P, kappa_cells),
                jnp.float32,
            )
            self.geom, self._xi, self._wx = lattice_geom_data(
                mesh.nc, self.P
            )
            self.Gt = None
        elif variant == "zgrp":
            self.zb = int(zb) if zb else select_zgroup(mesh.nc[2], self.P)
            if self.zb is None:
                raise ValueError(
                    f"variant='zgrp': ncz={mesh.nc[2]} has no z-group "
                    "divisor that beats the dense z dots (see "
                    "select_zgroup) — use variant='yexp'"
                )
            if mesh.nc[2] % self.zb:
                raise ValueError(
                    f"zb={self.zb} must divide ncz={mesh.nc[2]}"
                )
            Gq = geometry_to_qlattice(
                scale_G(G_cells, kappa_cells, kt), mesh.nc, self.P
            )
            self.Gz = jnp.asarray(
                geometry_to_zgrouped(Gq, self.zb, self.P), jnp.float32
            )
            self.zmats = zgroup_matrices(self.zb, self.P)
            self.Gt = self.co = None
        else:
            Gq = geometry_to_qlattice(
                scale_G(G_cells, kappa_cells, kt), mesh.nc, self.P
            )
            self.Gt = jnp.asarray(geometry_to_gfirst(Gq), jnp.float32)
            self.co = None
        self.mats = lattice_blocked_mats(mesh.nc, self.P)
        self.bc_marker = jnp.asarray(mesh.boundary_dof_marker(self.P))
        # Exact diagonal via the (setup-time) dofmap formulation.
        diag = jax.jit(laplacian_diagonal, static_argnums=(5,))(
            jnp.asarray(mesh.dofmap(self.P)),
            jnp.asarray(G_cells, jnp.float32),
            jnp.asarray(kappa_cells, jnp.float32),
            jnp.asarray(derivative_matrix(self.P), jnp.float32),
            self.bc_marker,
            self.ndofs,
        )
        self.diag = jnp.asarray(diag, jnp.float32)
        self.diag_inv = 1.0 / self.diag
        # All arrays are jit ARGUMENTS — the (6, Qx, Qy, Qz) geometry is
        # hundreds of MB at large N and must never be closed over (HLO
        # constants explode compile time / the remote-compile payload).
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, x, mats, Gt, bc_marker):
        if self.variant == "geom":
            # `Gt` carries the coefficient grids here; the small
            # expansion matrices are closed over (pallas-only operands —
            # opaque to XLA constant folding, measured faster as
            # constants).
            return blocked_lattice_apply_geom(
                x, mats, Gt, self.geom, bc_marker, self.mesh.nc, self.P,
                xi=self._xi, wx=self._wx, bcells=self.bcells,
                precision=self.precision,
                interpret=True if self._interpret else None,
            )
        if self.variant == "zgrp":
            # `Gt` carries the z-grouped geometry here; the small group
            # matrices are closed over (pallas-only operands).
            return blocked_lattice_apply_zgrp(
                x, mats, self.zmats, Gt, bc_marker, self.mesh.nc, self.P,
                self.zb, bcells=self.bcells, precision=self.precision,
                interpret=True if self._interpret else None,
            )
        return blocked_lattice_apply(
            x, mats, Gt, bc_marker, self.mesh.nc, self.P,
            bcells=self.bcells, precision=self.precision,
            interpret=True if self._interpret else None,
            variant=self.variant,
        )

    def __call__(self, x):
        op_arrays = {"geom": self.co, "zgrp": self.Gz}.get(
            self.variant, self.Gt
        )
        return self._apply(jnp.asarray(x, jnp.float32), self.mats,
                           op_arrays, self.bc_marker)
