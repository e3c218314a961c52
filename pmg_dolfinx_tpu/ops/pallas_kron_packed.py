"""Lane-packed multi-RHS Kronecker apply for SMALL lattices (serving).

The small-N MXU pad cliff: a p=6 apply runs 11.8 GDOF/s at 227k dofs
(61^3 lattice) vs 25.9 at 2.05M because every per-axis contraction is a
(61, 61) matmul whose minor dim pads to the 128-lane tile — >2x of the
MXU's cycles multiply zeros, and batching RHS with `vmap` does not help
(+7% measured: vmap adds a grid/batch dim, it does not fill lanes).

This kernel fills the lanes with the BATCH instead: ``g = 128 // Zp``
right-hand sides are packed per 128-lane tile (``Zp`` = z extent padded
to 32 or 64), working layout ``P[x, y, b*Zp + z]``. The whole packed
batch lives in VMEM (serving sizes are ~1 MB/RHS) and one Mosaic kernel
performs all three contractions + scalings + bc epilogue:

- x-term: one merged matmul ``Ktx @ P.reshape(NX, NY*L)`` — the lane
  dim is the full (y, b, z) extent, ~91% MXU utilization;
- y-term: y-major transpose + the same merged form (the swap is a
  sublane shuffle, both minor dims stay tile-aligned);
- z-term: per-128-lane group, one matmul against the BLOCK-DIAGONAL
  ``blockdiag_g(Ktz^T)`` (128, 128) — the g packed RHS in the group
  contract independently, 2x the utilization of the padded (NZ, NZ)
  form (the off-diagonal zero blocks are the remaining waste; the
  z-term is the packed kernel's utilization bound at ~45%).

Applicability: NZ <= 64 (one RHS per 64-lane half) — beyond that the
plain paths are already near the MXU roofline. The batch is padded to a
multiple of g with zero RHS.

Reference analogue: batched small-operator applies in the reference's
batch_size dispatch (src/laplacian.hpp:331-376), restructured so the
batch fills the TPU's lane dimension instead of a grid dimension.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_util import split_bf16 as _split_bf16

_DOT = partial(jnp.dot, preferred_element_type=jnp.float32)
_HI = jax.lax.Precision.HIGHEST


def _dot3(a_split, b_split):
    """bf16x3 matmul (see ops/pallas_kron_blocked._dot3)."""
    a_hi, a_lo = a_split
    b_hi, b_lo = b_split
    return _DOT(a_hi, b_hi) + (_DOT(a_hi, b_lo) + _DOT(a_lo, b_hi))


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _packed_kernel(x_ref, bc_ref, Ktx_ref, Kty_ref, KZbd_ref, sxy_ref,
                   sz_ref, out_ref, *, high, sigma, ngroups):
    NX, NYp, L = x_ref.shape
    xb = x_ref[:]
    bc = bc_ref[:]
    s3 = sxy_ref[:][:, :, None] * sz_ref[:][None, :, :]
    w = jnp.where(bc, 0.0, xb) * s3
    Ktx = Ktx_ref[:]
    Kty = Kty_ref[:]
    KZ = KZbd_ref[:]
    if high:
        w_split = _split_bf16(w)
        wr = tuple(v.reshape(NX, NYp * L) for v in w_split)
        t1 = _dot3(_split_bf16(Ktx), wr).reshape(NX, NYp, L)
        wT = tuple(jnp.swapaxes(v, 0, 1).reshape(NYp, NX * L)
                   for v in w_split)
        t2 = jnp.swapaxes(
            _dot3(_split_bf16(Kty), wT).reshape(NYp, NX, L), 0, 1
        )
        KZ_split = _split_bf16(KZ)
    else:
        t1 = _DOT(Ktx, w.reshape(NX, NYp * L), precision=_HI).reshape(
            NX, NYp, L
        )
        wT = jnp.swapaxes(w, 0, 1).reshape(NYp, NX * L)
        t2 = jnp.swapaxes(
            _DOT(Kty, wT, precision=_HI).reshape(NYp, NX, L), 0, 1
        )
    base = t1 + t2
    if sigma:
        base = base + sigma * w
    # z-term + epilogue per 128-lane group (static, lane-tile-aligned
    # slices; avoids an in-kernel concatenate along lanes).
    for p in range(ngroups):
        sl = slice(128 * p, 128 * (p + 1))
        wp = w[:, :, sl].reshape(NX * NYp, 128)
        if high:
            t3p = _dot3(_split_bf16(wp), KZ_split)
        else:
            t3p = _DOT(wp, KZ, precision=_HI)
        acc = base[:, :, sl] + t3p.reshape(NX, NYp, 128)
        yp = acc * s3[:, :, sl]
        out_ref[:, :, sl] = jnp.where(bc[:, :, sl], xb[:, :, sl], yp)


def _emu_apply(x3, bc3, m, sigma=0.0):
    """jnp twin of `_packed_kernel` (off-TPU default; identical math)."""
    s3 = m["sxy"][:, :, None] * m["szrow"][None, :, :]
    w = jnp.where(bc3, 0.0, x3) * s3
    t1 = jnp.einsum("ax,xyL->ayL", m["Ktx"], w, precision=_HI)
    t2 = jnp.einsum("by,xyL->xbL", m["Kty"], w, precision=_HI)
    NX, NYp, L = x3.shape
    wg = w.reshape(NX, NYp, L // 128, 128)
    t3 = jnp.einsum("xygl,lm->xygm", wg, m["KZbd"],
                    precision=_HI).reshape(NX, NYp, L)
    acc = t1 + t2 + t3
    if sigma:
        acc = acc + sigma * w
    return jnp.where(bc3, x3, acc * s3)


class PackedKronBatch:
    """Lane-packed batched Kronecker operator for small lattices (f32).

    ``__call__`` takes/returns ``(B, ndofs)`` or ``(B, NX, NY, NZ)``;
    `pack` / `apply_packed` / `unpack` expose the packed layout for
    callers that keep the batch packed end-to-end (the serving analogue
    of the 3D-native-lattice rule: pack once per solve, not per apply).
    Same operator contract per RHS as `ops.kron.KronLaplacian` (kappa /
    sigma / mixed faces / Robin all ride the base per-axis factors).
    """

    def __init__(self, mesh, P, kappa=2.0, B=8, precision="highest",
                 sigma=0.0, interpret=False):
        from .kron import KronLaplacian

        if precision not in ("highest", "high"):
            raise ValueError(
                f"precision must be 'highest' or 'high', got {precision!r}"
            )
        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32,
                             sigma=sigma)
        NX, NY, NZ = mesh.lattice_shape(P)
        if NZ > 64:
            raise ValueError(
                f"PackedKronBatch targets small lattices (NZ <= 64, got "
                f"{NZ}); at larger N use ops.kron / kron_blocked — they "
                "are already near the MXU roofline there"
            )
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.shape = (NX, NY, NZ)
        self.precision = precision
        self.sigma = float(sigma)
        self.B = int(B)
        self.Zp = 32 if NZ <= 32 else 64
        g = 128 // self.Zp
        self.Bp = _round_up(max(self.B, g), g)
        self.NYp = _round_up(NY, 8)
        L = self.Bp * self.Zp
        self.L = L
        self.ngroups = L // 128
        self.diag = base.diag
        self.diag_inv = base.diag_inv

        ss = [np.sqrt(np.asarray(m, np.float64)) for m in base.ms]
        Kts = [np.asarray(K, np.float64) / s[:, None] / s[None, :]
               for K, s in zip(base.Ks, ss)]
        sxy = np.zeros((NX, self.NYp))
        sxy[:, :NY] = np.outer(ss[0], ss[1])
        Ktyp = np.zeros((self.NYp, self.NYp))
        Ktyp[:NY, :NY] = Kts[1]
        szp = np.zeros(self.Zp)
        szp[:NZ] = ss[2]
        KtzTp = np.zeros((self.Zp, self.Zp))
        KtzTp[:NZ, :NZ] = Kts[2].T
        KZbd = np.kron(np.eye(g), KtzTp)
        self.mats = dict(
            Ktx=jnp.asarray(Kts[0], jnp.float32),
            Kty=jnp.asarray(Ktyp, jnp.float32),
            KZbd=jnp.asarray(KZbd, jnp.float32),
            sxy=jnp.asarray(sxy, jnp.float32),
            szrow=jnp.asarray(np.tile(szp, self.Bp)[None, :], jnp.float32),
        )
        # bc marker in the packed layout: pad rows/lanes flagged True so
        # the epilogue passes through the (zero) pad inputs unchanged.
        bcp = np.ones((NX, self.NYp, self.Bp, self.Zp), dtype=bool)
        bc3 = np.asarray(base.bc_marker).reshape(NX, NY, NZ)
        bcp[:, :NY, :, :NZ] = bc3[:, :, None, :]
        self.bcp = jnp.asarray(bcp.reshape(NX, self.NYp, L))

        vmem = 4 * NX * self.NYp * L
        self._pcall = pl.pallas_call(
            partial(_packed_kernel, high=precision == "high",
                    sigma=self.sigma, ngroups=self.ngroups),
            out_shape=jax.ShapeDtypeStruct((NX, self.NYp, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(8 * vmem + (8 << 20), 110 << 20)
            ),
            interpret=interpret,
        )
        self._interpret = interpret
        self._apply = jax.jit(self._apply_impl)
        self._packed_roundtrip = jax.jit(
            lambda U: self.unpack(self._apply_impl(self.pack(U)))
        )

    def pack(self, U):
        """``(B, NX, NY, NZ)`` batch -> packed ``(NX, NYp, Bp*Zp)``."""
        NX, NY, NZ = self.shape
        U = jnp.asarray(U, jnp.float32).reshape(-1, NX, NY, NZ)
        Up = jnp.pad(U, ((0, self.Bp - U.shape[0]), (0, 0),
                         (0, self.NYp - NY), (0, self.Zp - NZ)))
        # (Bp, NX, NYp, Zp) -> (NX, NYp, Bp, Zp) -> merge minor
        return jnp.transpose(Up, (1, 2, 0, 3)).reshape(
            NX, self.NYp, self.L
        )

    def unpack(self, P3):
        """Packed ``(NX, NYp, Bp*Zp)`` -> ``(B, NX, NY, NZ)``."""
        NX, NY, NZ = self.shape
        U = P3.reshape(NX, self.NYp, self.Bp, self.Zp)
        return jnp.transpose(U, (2, 0, 1, 3))[: self.B, :, :NY, :NZ]

    def apply_packed(self, P3):
        return self._apply(P3)

    def _apply_impl(self, P3):
        if not self._interpret and jax.default_backend() != "tpu":
            return _emu_apply(P3, self.bcp, self.mats, sigma=self.sigma)
        m = self.mats
        return self._pcall(P3, self.bcp, m["Ktx"], m["Kty"], m["KZbd"],
                           m["sxy"], m["szrow"])

    def __call__(self, U):
        """Batched apply; ``U`` is ``(B, ndofs)`` or ``(B, NX, NY, NZ)``."""
        U = jnp.asarray(U, jnp.float32)
        out = self._packed_roundtrip(U.reshape((-1,) + self.shape))
        return out.reshape(jnp.shape(U))
