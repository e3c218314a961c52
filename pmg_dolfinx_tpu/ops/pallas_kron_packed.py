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

For a SINGLE right-hand side the same idea packs the lattice's own
x-slabs into the lanes (`PackedKronSingle`, r4): measured 24.9 GDOF/s
'highest' at 61^3/p=6 vs 11.8 for the plain apply — see the class
docstring for the slot-coupling treatment of the x-term.

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


class _PackedLayout:
    """Shared lane-packed layout: ``g = 128 // Zp`` RHS per 128-lane
    tile, working shape ``(NX, NYp, Bp*Zp)``. Subclasses add the math.
    """

    def _init_layout(self, mesh, P, B):
        NX, NY, NZ = mesh.lattice_shape(P)
        if NZ > 64:
            raise ValueError(
                f"{type(self).__name__} targets small lattices (NZ <= 64, "
                f"got {NZ}); at larger N use the plain paths — they are "
                "already near the MXU roofline there"
            )
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.shape = (NX, NY, NZ)
        self.B = int(B)
        self.Zp = 32 if NZ <= 32 else 64
        g = 128 // self.Zp
        self.Bp = _round_up(max(self.B, g), g)
        self.NYp = _round_up(NY, 8)
        self.L = self.Bp * self.Zp
        self.ngroups = self.L // 128
        return g

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

    def _packed_bc(self, bc_flat):
        """Full-lattice bc marker -> packed marker with pad slots True
        (the epilogue passes the (zero) pad inputs through unchanged)."""
        NX, NY, NZ = self.shape
        bcp = np.ones((NX, self.NYp, self.Bp, self.Zp), dtype=bool)
        bc3 = np.asarray(bc_flat).reshape(NX, NY, NZ)
        bcp[:, :NY, :, :NZ] = bc3[:, :, None, :]
        return jnp.asarray(bcp.reshape(NX, self.NYp, self.L))


class PackedKronBatch(_PackedLayout):
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
        # Layout validation first: the NZ/B caps fail fast before the
        # base operator assembles factors and uploads device arrays.
        g = self._init_layout(mesh, P, B)
        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32,
                             sigma=sigma)
        NX, NY, NZ = self.shape
        self.precision = precision
        self.sigma = float(sigma)
        L = self.L
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
        self.bcp = self._packed_bc(base.bc_marker)

        vmem = 4 * NX * self.NYp * L
        self._pcall = pl.pallas_call(
            partial(_packed_kernel, high=precision == "high",
                    sigma=self.sigma, ngroups=self.ngroups),
            out_shape=jax.ShapeDtypeStruct((NX, self.NYp, L), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                # ~9 full-lattice VMEM live ranges at B=8/61^3 (x, s32
                # mask, w, t1, t2, base, out + matrices): the b8 kernel
                # measured 71.81 MiB of scoped vmem on v5e — an 8x cap
                # rejected it at compile time. The fixed part is ~34 MiB
                # at B=2 (r4 measured: 33.95M needed vs a 30M limit), so
                # keep a generous constant floor — but cap at 96 MiB:
                # the b8 kernel compiled under a 112 MiB limit measured
                # 15.8 GDOF/s per RHS vs 22.8 under 96 MiB (r4).
                vmem_limit_bytes=min(11 * vmem + (28 << 20), 96 << 20)
            ),
            interpret=interpret,
        )
        self._interpret = interpret
        self._apply = jax.jit(self._apply_impl)
        self._packed_roundtrip = jax.jit(
            lambda U: self.unpack(self._apply_impl(self.pack(U)))
        )

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


def _packed_fdm_kernel(x_ref, bc_ref, Vxt_ref, Vx_ref, Vyt_ref, Vy_ref,
                       VZTbd_ref, VZbd_ref, dinv_ref, out_ref, t_ref, *,
                       ngroups):
    """One fused direct solve on the packed batch (see PackedFDMBatch).

    The six per-axis transforms run in the order xt, yt, then a single
    per-lane-group pass [zt -> eigenvalue division -> z] (z transforms
    commute with x/y, so the diagonal division can sit inside the group
    loop), then y, x and the bc epilogue. ``t_ref`` is a VMEM scratch
    holding the intermediate lattice between the two transform stages.
    All transform matrices are boundary-EMBEDDED (zero rows/cols at
    Dirichlet slots, zero pad region) — bc values and layout padding are
    annihilated in flight, no in-kernel trimming.
    """
    NX, NYp, L = x_ref.shape
    xb = x_ref[:]
    # forward x then y (embedded transposes)
    t = _DOT(Vxt_ref[:], xb.reshape(NX, NYp * L),
             precision=_HI).reshape(NX, NYp, L)
    tT = jnp.swapaxes(t, 0, 1).reshape(NYp, NX * L)
    t = jnp.swapaxes(
        _DOT(Vyt_ref[:], tT, precision=_HI).reshape(NYp, NX, L), 0, 1
    )
    dinv = dinv_ref[:]
    for p in range(ngroups):
        sl = slice(128 * p, 128 * (p + 1))
        tp = t[:, :, sl].reshape(NX * NYp, 128)
        ep = _DOT(tp, VZTbd_ref[:], precision=_HI).reshape(NX, NYp, 128)
        ep = ep * dinv[:, :, sl]
        sp = _DOT(ep.reshape(NX * NYp, 128), VZbd_ref[:], precision=_HI)
        t_ref[:, :, sl] = sp.reshape(NX, NYp, 128)
    # backward y then x
    s = t_ref[:]
    sT = jnp.swapaxes(s, 0, 1).reshape(NYp, NX * L)
    s = jnp.swapaxes(
        _DOT(Vy_ref[:], sT, precision=_HI).reshape(NYp, NX, L), 0, 1
    )
    u = _DOT(Vx_ref[:], s.reshape(NX, NYp * L),
             precision=_HI).reshape(NX, NYp, L)
    out_ref[:] = jnp.where(bc_ref[:], xb, u)


def _emu_fdm(b3, bc3, m):
    """jnp twin of `_packed_fdm_kernel` (off-TPU default; same math)."""
    NX, NYp, L = b3.shape
    t = jnp.einsum("ax,xyL->ayL", m["Vxt"], b3, precision=_HI)
    t = jnp.einsum("by,xyL->xbL", m["Vyt"], t, precision=_HI)
    tg = t.reshape(NX, NYp, L // 128, 128)
    t = jnp.einsum("xygl,lm->xygm", tg, m["VZTbd"],
                   precision=_HI).reshape(NX, NYp, L)
    t = t * m["dinv"]
    tg = t.reshape(NX, NYp, L // 128, 128)
    t = jnp.einsum("xygl,lm->xygm", tg, m["VZbd"],
                   precision=_HI).reshape(NX, NYp, L)
    t = jnp.einsum("by,xyL->xbL", m["Vy"], t, precision=_HI)
    u = jnp.einsum("ax,xyL->ayL", m["Vx"], t, precision=_HI)
    return jnp.where(bc3, b3, u)


def _embed_ends(V, ends):
    """Free-node matrix -> full-size, zero rows/cols at Dirichlet ends
    (same embedding as parallel/fdm_dist._embed_boundary)."""
    n = V.shape[0]
    lo, hi = int(ends[0]), int(ends[1])
    M = np.zeros((n + lo + hi, n + lo + hi), dtype=V.dtype)
    M[lo:lo + n, lo:lo + n] = V
    return M


def _fdm_embedded(mesh, P, kappa, sigma, who):
    """Boundary-embedded per-axis FDM eigen-data: ``(Vs, dinv3)`` with
    zero rows/cols at Dirichlet slots and the eigenvalue-sum inverse
    zeroed off the free set (shared by the packed direct solvers)."""
    from ..fem.assembly import resolve_kappa_axes
    from ..ops.kron import robin_axis_ends
    from ..solvers.fdm import _axis_eig

    faces = getattr(mesh, "dirichlet_faces", ((True, True),) * 3)
    kx, ky, kz = resolve_kappa_axes(mesh, kappa)
    Vs, lams, frees = [], [], []
    for a, (nc_a, h_a, ends, k_a) in enumerate(
            zip(mesh.nc, mesh.h_cells, faces, (kx, ky, kz))):
        V, lam = _axis_eig(nc_a, P, h_a, ends=ends,
                           robin=robin_axis_ends(mesh, a, 1.0 / k_a))
        n = nc_a * P + 1
        lam_e = np.zeros(n)
        free = np.zeros(n, dtype=bool)
        lo = int(ends[0])
        lam_e[lo:lo + lam.size] = lam
        free[lo:lo + lam.size] = True
        Vs.append(_embed_ends(V, ends))
        lams.append(lam_e)
        frees.append(free)

    lx, ly, lz = lams
    d3 = (kx * lx[:, None, None] + ky * ly[None, :, None]
          + kz * lz[None, None, :]) + float(sigma)
    free3 = (frees[0][:, None, None] & frees[1][None, :, None]
             & frees[2][None, None, :])
    if free3.any() and d3[free3].min() <= 1e-14 * max(
            1.0, float(abs(d3[free3]).max())):
        raise ValueError(
            f"{who}: singular operator (no Dirichlet face and "
            "sigma=0 leaves the constant nullspace)"
        )
    dinv3 = np.where(free3, 1.0 / np.where(free3, d3, 1.0), 0.0)
    return Vs, dinv3


class PackedFDMBatch(_PackedLayout):
    """Lane-packed batched FDM DIRECT solve for small lattices (f32).

    The serving-size counterpart of `solvers.fdm.FastDiagonalizationSolver
    .solve_many`: ``g = 128 // Zp`` right-hand sides share each 128-lane
    tile, and ONE Mosaic kernel runs the whole direct solve — six
    embedded eigenvector transforms, the eigenvalue-sum division and the
    bc epilogue — for the entire batch. At serving sizes (NZ <= 64) the
    vmapped `fdm_solve` leaves >2x of the MXU idle in lane padding,
    exactly like the operator apply (see the module docstring).

    Same solver contract per RHS as `FastDiagonalizationSolver`:
    constant/per-axis-diagonal kappa, sigma shift, mixed Dirichlet/
    Neumann faces and Robin ends all ride the per-axis eigenproblems.
    Reference analogue: the coarse direct solves in the PMG stack
    (src/amg.hpp:67-113), here batched across load cases.
    """

    def __init__(self, mesh, P, kappa=2.0, B=8, sigma=0.0,
                 interpret=False):
        from ..fem.mesh import require_axis_aligned

        require_axis_aligned(mesh, "PackedFDMBatch")
        g = self._init_layout(mesh, P, B)
        NX, NY, NZ = self.shape
        Vs, dinv3 = _fdm_embedded(mesh, self.P, kappa, sigma,
                                  "PackedFDMBatch")
        dinvp = np.zeros((NX, self.NYp, self.Bp, self.Zp), np.float32)
        dinvp[:, :NY, :, :NZ] = dinv3[:, :, None, :]

        Vyp = np.zeros((self.NYp, self.NYp))
        Vyp[:NY, :NY] = Vs[1]
        Vzp = np.zeros((self.Zp, self.Zp))
        Vzp[:NZ, :NZ] = Vs[2]
        self.mats = dict(
            Vxt=jnp.asarray(Vs[0].T.copy(), jnp.float32),
            Vx=jnp.asarray(Vs[0], jnp.float32),
            Vyt=jnp.asarray(Vyp.T.copy(), jnp.float32),
            Vy=jnp.asarray(Vyp, jnp.float32),
            VZTbd=jnp.asarray(np.kron(np.eye(g), Vzp), jnp.float32),
            VZbd=jnp.asarray(np.kron(np.eye(g), Vzp.T), jnp.float32),
            dinv=jnp.asarray(dinvp.reshape(NX, self.NYp, self.L)),
        )
        self.bcp = self._packed_bc(mesh.boundary_dof_marker(self.P))

        vmem = 4 * NX * self.NYp * self.L
        self._pcall = pl.pallas_call(
            partial(_packed_fdm_kernel, ngroups=self.ngroups),
            out_shape=jax.ShapeDtypeStruct((NX, self.NYp, self.L),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[
                pltpu.VMEM((NX, self.NYp, self.L), jnp.float32)
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(10 * vmem + (8 << 20), 110 << 20)
            ),
            interpret=interpret,
        )
        self._interpret = interpret
        self._solve = jax.jit(self._solve_impl)
        self._packed_roundtrip = jax.jit(
            lambda U: self.unpack(self._solve_impl(self.pack(U)))
        )

    def solve_packed(self, P3):
        return self._solve(P3)

    def _solve_impl(self, P3):
        if not self._interpret and jax.default_backend() != "tpu":
            return _emu_fdm(P3, self.bcp, self.mats)
        m = self.mats
        return self._pcall(P3, self.bcp, m["Vxt"], m["Vx"], m["Vyt"],
                           m["Vy"], m["VZTbd"], m["VZbd"], m["dinv"])

    def solve(self, U):
        """Batched direct solve; ``U`` is ``(B, ndofs)`` or
        ``(B, NX, NY, NZ)``; per column ``u[bc] = b[bc]`` like every
        solver in the package."""
        U = jnp.asarray(U, jnp.float32)
        out = self._packed_roundtrip(U.reshape((-1,) + self.shape))
        return out.reshape(jnp.shape(U))


# ----------------------------------------------------------------------
# SINGLE-RHS lane packing: the lattice's own x-slabs fill the lanes.
# ----------------------------------------------------------------------

def _packed_single_kernel(x_ref, s3m_ref, XC_ref, Kty_ref, KZbd_ref,
                          out_ref, *, high, sigma, g, Zp, Pband):
    """One fused apply on a SINGLE lane-packed lattice.

    Layout (see `PackedKronSingle`): lane slot ``c`` of each 128-lane
    tile holds x-slab ``x in [c*XS, (c+1)*XS)``, so the working shape is
    ``(XS, NYp, 128)`` and every matmul runs at full lane utilization:

    - y-term: sublane transpose + one merged ``Kty @ (NYp, XS*128)`` dot
      (y does not couple x -> slot-local, the batched kernel's trick);
    - z-term: one ``(XS*NYp, 128) @ blockdiag_g(Ktz^T)`` dot
      (z is slot-local too);
    - x-term: couples the slots — algebraically ``A_0 @ w + sum_c
      (A_c - A_0) @ mask_c(w)`` (per-slot diagonal blocks via lane
      masks) plus adjacent-slab corner corrections: the banded 1D
      stiffness (bandwidth P) reaches only the first/last ``Pband``
      (= 8, sublane-aligned) rows of the neighbour slab, lane-rolled
      into this slot by ``-+Zp`` (`pltpu.roll` — a VPU shuffle, no MXU
      tiles). All of it executes as ONE k-augmented dot against the
      sublane-concatenated input stack (see the in-kernel comment).

    Mosaic hardening (real-TPU lowering, not visible in interpret
    mode): the slab height XS is 8-aligned, corner row counts are the
    full 8-sublane tile, the per-slot matrix stacks arrive as 2-D
    arrays sliced at 8-multiple row offsets (3-D refs with size-1
    leading dims crash the Mosaic compiler), and the corner lane masks
    use a FRESH small iota — slicing the big `slot` iota value also
    crashes it ("limits[i] <= dim(i)", both bisected on v5e).

    HBM-traffic note: at serving sizes this kernel is DMA-bound (the
    whole MXU-HIGHEST work is ~1.3 us while the apply floor is the
    array traffic), so the bc marker and the symmetric scale arrive
    FUSED as one array ``s3m = where(bc, 0, s3)`` — a bool input would
    ship as a separate full-lattice s32 buffer, and ``s3 > 0``
    everywhere off the marked/pad entries makes ``s3m == 0`` an exact
    in-kernel reconstruction of the mask (bit-identical epilogue:
    ``x*bcf + acc*s3m`` equals ``where(bc, x, acc*s3)``).
    """
    XS, NYp, L = x_ref.shape
    xb = x_ref[:]
    s3m = s3m_ref[:]
    w = xb * s3m
    slot = jax.lax.broadcasted_iota(jnp.int32, (XS, NYp, L), 2) // Zp
    # x-term: ONE k-augmented dot. Measured (v5e, 61^3): the same math
    # as g slot-diagonal dots + 2(g-1) corner dots costs ~9 us in
    # per-piece dots (each pays its own 6-pass HIGHEST pipeline) vs
    # ~3 us as a single dot over the sublane-concatenated input stack
    # [w ; mask_c(w) ; rolled corners] against [A0 | dA_c | Cdn | Cup].
    # All pieces are 8-row-aligned, so the concat is a cheap VPU copy.
    pieces = [w.reshape(XS, NYp * L)]
    for c in range(1, g):
        pieces.append(
            jnp.where(slot == c, w, 0.0).reshape(XS, NYp * L))
    # Adjacent-slab corner inputs (banded coupling, bandwidth P):
    # pltpu.roll needs a non-negative shift: -Zp == +(L - Zp) mod L.
    rolled_dn = pltpu.roll(w[0:Pband], L - Zp, axis=2)   # c <- c+1 rows
    rolled_up = pltpu.roll(w[XS - Pband:XS], Zp, axis=2)  # c+1 <- c rows
    # Fresh small iota — SLICING the big `slot` iota value crashes the
    # Mosaic compiler ("limits[i] <= dim(i)", bisected on v5e).
    slot_s = jax.lax.broadcasted_iota(
        jnp.int32, (Pband, NYp, L), 2) // Zp
    for c in range(g - 1):
        pieces.append(jnp.where(slot_s == c, rolled_dn,
                                0.0).reshape(Pband, NYp * L))
    for c in range(g - 1):
        pieces.append(jnp.where(slot_s == c + 1, rolled_up,
                                0.0).reshape(Pband, NYp * L))
    stack = jnp.concatenate(pieces, axis=0)
    if high:
        w_split = _split_bf16(w)
        t1 = _dot3(_split_bf16(XC_ref[:]), _split_bf16(stack))
    else:
        t1 = _DOT(XC_ref[:], stack, precision=_HI)
    t1 = t1.reshape(XS, NYp, L)
    # y-term (slot-local): sublane transpose + merged dot.
    if high:
        wT = tuple(jnp.swapaxes(v, 0, 1).reshape(NYp, XS * L)
                   for v in w_split)
        t2 = jnp.swapaxes(
            _dot3(_split_bf16(Kty_ref[:]), wT).reshape(NYp, XS, L), 0, 1
        )
    else:
        wT = jnp.swapaxes(w, 0, 1).reshape(NYp, XS * L)
        t2 = jnp.swapaxes(
            _DOT(Kty_ref[:], wT, precision=_HI).reshape(NYp, XS, L), 0, 1
        )
    # z-term (slot-local): one block-diagonal dot, L == 128 always.
    wz = w.reshape(XS * NYp, L)
    if high:
        t3 = _dot3(_split_bf16(wz), _split_bf16(KZbd_ref[:]))
    else:
        t3 = _DOT(wz, KZbd_ref[:], precision=_HI)
    acc = t1 + t2 + t3.reshape(XS, NYp, L)
    if sigma:
        acc = acc + sigma * w
    bcf = jnp.where(s3m == 0.0, 1.0, 0.0)
    out_ref[:] = xb * bcf + acc * s3m


def _emu_single(x3, m, *, sigma, g, Zp, Pband):
    """jnp twin of `_packed_single_kernel` (off-TPU default; same math)."""
    XS, NYp, L = x3.shape
    s3m = m["s3m"]
    w = x3 * s3m
    slot = jnp.arange(L)[None, None, :] // Zp
    pieces = [w]
    for c in range(1, g):
        pieces.append(jnp.where(slot == c, w, 0.0))
    rolled_dn = jnp.roll(w[0:Pband], -Zp, axis=2)
    rolled_up = jnp.roll(w[XS - Pband:XS], Zp, axis=2)
    for c in range(g - 1):
        pieces.append(jnp.where(slot == c, rolled_dn, 0.0))
    for c in range(g - 1):
        pieces.append(jnp.where(slot == c + 1, rolled_up, 0.0))
    stack = jnp.concatenate(pieces, axis=0)
    t1 = jnp.einsum("ak,kyL->ayL", m["XC"], stack, precision=_HI)
    t2 = jnp.einsum("by,xyL->xbL", m["Kty"], w, precision=_HI)
    t3 = jnp.einsum("xyl,lm->xym", w, m["KZbd"], precision=_HI)
    acc = t1 + t2 + t3
    if sigma:
        acc = acc + sigma * w
    bcf = jnp.where(s3m == 0.0, 1.0, 0.0)
    return x3 * bcf + acc * s3m


class _SinglePacked:
    """Shared SINGLE-RHS x-slab lane packing: ``g = 128 // Zp`` slabs of
    ``XS = align8(ceil(NX/g))`` x-planes per 128-lane tile, working
    shape ``(XS, NYp, 128)``. Subclasses add the math."""

    def _init_single(self, mesh, P, who):
        NX, NY, NZ = mesh.lattice_shape(P)
        if NZ > 64:
            raise ValueError(
                f"{who} targets small lattices (NZ <= 64, got {NZ}); "
                "at larger N use the plain paths"
            )
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.shape = (NX, NY, NZ)
        self.Zp = 32 if NZ <= 32 else 64
        self.g = g = 128 // self.Zp
        # Slab height 8-ALIGNED (sublane tile): real-TPU Mosaic rejects
        # sub-8 sublane slices that interpret mode accepts.
        self.XS = _round_up(-(-NX // g), 8)
        self.NXp = g * self.XS
        self.NYp = _round_up(NY, 8)
        return g

    def _pack_host(self, full, pad=0.0):
        """Host-side packing of a full (NX.., NY, NZ) array (np)."""
        NX, NY, NZ = self.shape
        a = np.full((self.NXp, self.NYp, self.Zp), pad,
                    dtype=np.asarray(full).dtype)
        a[:np.shape(full)[0], :NY, :NZ] = full
        a = a.reshape(self.g, self.XS, self.NYp, self.Zp)
        return np.transpose(a, (1, 2, 0, 3)).reshape(
            self.XS, self.NYp, 128)

    def pack(self, x3):
        """``(NX, NY, NZ)`` lattice -> packed ``(XS, NYp, 128)``."""
        NX, NY, NZ = self.shape
        x3 = jnp.asarray(x3, jnp.float32).reshape(NX, NY, NZ)
        xp = jnp.pad(x3, ((0, self.NXp - NX), (0, self.NYp - NY),
                          (0, self.Zp - NZ)))
        xp = xp.reshape(self.g, self.XS, self.NYp, self.Zp)
        return jnp.transpose(xp, (1, 2, 0, 3)).reshape(
            self.XS, self.NYp, 128)

    def unpack(self, P3):
        """Packed ``(XS, NYp, 128)`` -> ``(NX, NY, NZ)`` lattice."""
        NX, NY, NZ = self.shape
        U = P3.reshape(self.XS, self.NYp, self.g, self.Zp)
        U = jnp.transpose(U, (2, 0, 1, 3)).reshape(
            self.NXp, self.NYp, self.Zp)
        return U[:NX, :NY, :NZ]


class PackedKronSingle(_SinglePacked):
    """SINGLE-RHS lane-packed Kronecker apply for small lattices (f32).

    Closes the serving-size MXU pad cliff for ONE right-hand side: at
    61^3 / p=6 the plain apply runs (61, 61) dots whose 128-lane minor
    dim is half zeros (11.8 GDOF/s vs 25.9 at 2.05M). Here the lanes are
    filled with the lattice's OWN x-slabs — ``g = 128 // Zp`` slabs of
    ``XS = ceil(NX / g)`` x-planes per 128-lane tile, working layout
    ``(XS, NYp, 128)``, whole lattice in VMEM, one Mosaic kernel. The
    y/z contractions are slot-local (they do not couple x); the banded
    x-contraction splits into per-slot diagonal dots plus P x P
    corner corrections between ADJACENT slabs, lane-rolled into place
    (see `_packed_single_kernel`).

    Same operator contract as `ops.kron.KronLaplacian` (kappa / sigma /
    graded spacing / mixed faces / Robin ride the per-axis factors).
    Applicability: NZ <= 64 and slab height ``XS = align8(ceil(NX/g))
    >= align8(P)`` (the band must not span more than one slab
    boundary). `pack` / `apply_packed` / `unpack` for callers that keep
    the lattice packed across a whole solve; __call__ round-trips one
    vector.
    """

    def __init__(self, mesh, P, kappa=2.0, precision="highest",
                 sigma=0.0, interpret=False):
        from .kron import KronLaplacian

        if precision not in ("highest", "high"):
            raise ValueError(
                f"precision must be 'highest' or 'high', got {precision!r}"
            )
        g = self._init_single(mesh, P, "PackedKronSingle")
        NX, NY, NZ = self.shape
        XS = self.XS
        # Corner blocks carry the full band in 8-aligned row tiles.
        Pb = _round_up(self.P, 8)
        if XS < Pb:
            raise ValueError(
                f"PackedKronSingle needs slab height >= the 8-aligned "
                f"band ({Pb}); got XS={XS} for NX={NX}, g={g} — lattice "
                "too small for this packing"
            )
        self.precision = precision
        self.sigma = float(sigma)

        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32,
                             sigma=sigma)
        self.diag = base.diag
        self.diag_inv = base.diag_inv
        ss = [np.sqrt(np.asarray(m, np.float64)) for m in base.ms]
        Kts = [np.asarray(K, np.float64) / s[:, None] / s[None, :]
               for K, s in zip(base.Ks, ss)]

        Ktxp = np.zeros((self.NXp, self.NXp))
        Ktxp[:NX, :NX] = Kts[0]
        self._Pb = Pb
        A = [Ktxp[c * XS:(c + 1) * XS, c * XS:(c + 1) * XS]
             for c in range(g)]
        # Full column strips (band entries land in the corners, the
        # rest is structurally zero); stacked 2-D for 8-aligned slicing.
        Cdn = np.zeros((max(g - 1, 1) * XS, Pb))
        Cup = np.zeros((max(g - 1, 1) * XS, Pb))
        for c in range(g - 1):
            # slot c rows <- slot c+1 rows [:Pb] (upper band)
            Cdn[c * XS:(c + 1) * XS] = \
                Ktxp[c * XS:(c + 1) * XS,
                     (c + 1) * XS:(c + 1) * XS + Pb]
            # slot c+1 rows <- slot c rows [XS-Pb:] (lower band)
            Cup[c * XS:(c + 1) * XS] = \
                Ktxp[(c + 1) * XS:(c + 2) * XS,
                     (c + 1) * XS - Pb:(c + 1) * XS]
        Ktyp = np.zeros((self.NYp, self.NYp))
        Ktyp[:NY, :NY] = Kts[1]
        KtzTp = np.zeros((self.Zp, self.Zp))
        KtzTp[:NZ, :NZ] = Kts[2].T
        sxp = np.zeros(self.NXp)
        sxp[:NX] = ss[0]
        syp = np.zeros(self.NYp)
        syp[:NY] = ss[1]
        szp = np.zeros(self.Zp)
        szp[:NZ] = ss[2]
        s3 = (sxp.reshape(g, XS)[None, :, :, None]
              * syp[:, None, None, None] * szp[None, None, None, :])
        # (NYp, g, XS, Zp) -> (XS, NYp, g*Zp)
        s3 = np.transpose(s3, (2, 0, 1, 3)).reshape(XS, self.NYp, 128)
        bcp = np.ones((g, XS, self.NYp, self.Zp), dtype=bool)
        bc3 = np.asarray(base.bc_marker).reshape(NX, NY, NZ)
        bcf = np.ones((self.NXp, NY, NZ), dtype=bool)
        bcf[:NX] = bc3
        bcp[:, :, :NY, :NZ] = bcf.reshape(g, XS, NY, NZ)
        self.bcp = jnp.asarray(
            np.transpose(bcp, (1, 2, 0, 3)).reshape(XS, self.NYp, 128))
        # bc and scale ship FUSED (s3m): one f32 array instead of an
        # extra full-lattice s32 mask buffer (see the kernel docstring).
        s3m = np.where(np.asarray(self.bcp), 0.0, s3)
        # The whole x-term as one k-augmented matrix (kernel docstring):
        # columns match the in-kernel input stack [w ; mask_c(w) ;
        # rolled-down corners ; rolled-up corners].
        XC = np.hstack(
            [A[0]]
            + [A[c] - A[0] for c in range(1, g)]
            + [Cdn[c * XS:(c + 1) * XS] for c in range(g - 1)]
            + [Cup[c * XS:(c + 1) * XS] for c in range(g - 1)]
        )
        self.mats = dict(
            XC=jnp.asarray(XC, jnp.float32),
            Kty=jnp.asarray(Ktyp, jnp.float32),
            KZbd=jnp.asarray(np.kron(np.eye(g), KtzTp), jnp.float32),
            s3m=jnp.asarray(s3m, jnp.float32),
        )

        vmem = 4 * XS * self.NYp * 128
        self._pcall = pl.pallas_call(
            partial(_packed_single_kernel, high=precision == "high",
                    sigma=self.sigma, g=g, Zp=self.Zp, Pband=self._Pb),
            out_shape=jax.ShapeDtypeStruct((XS, self.NYp, 128),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(12 * vmem + (8 << 20), 96 << 20)
            ),
            interpret=interpret,
        )
        self._interpret = interpret
        self._apply = jax.jit(self._apply_impl)
        self._roundtrip = jax.jit(
            lambda x: self.unpack(self._apply_impl(self.pack(x)))
        )

    def apply_packed(self, P3):
        return self._apply(P3)

    def _apply_impl(self, P3):
        if not self._interpret and jax.default_backend() != "tpu":
            return _emu_single(P3, self.mats, sigma=self.sigma,
                               g=self.g, Zp=self.Zp, Pband=self._Pb)
        m = self.mats
        return self._pcall(P3, m["s3m"], m["XC"], m["Kty"], m["KZbd"])

    def __call__(self, x):
        """Single apply; ``x`` is ``(ndofs,)`` or ``(NX, NY, NZ)``."""
        x = jnp.asarray(x, jnp.float32)
        out = self._roundtrip(x.reshape(self.shape))
        return out.reshape(jnp.shape(x))


def _packed_fdm_single_kernel(b_ref, bcf_ref, MXt_ref, MX_ref, Vyt_ref,
                              Vy_ref, VZTbd_ref, VZbd_ref, dinv_ref,
                              out_ref, *, g, Zp):
    """One fused FDM direct solve on a SINGLE lane-packed lattice.

    y/z transforms are slot-local exactly as in `_packed_fdm_kernel`
    (sublane-transpose merged dots / block-diagonal lane dots). The x
    transforms couple the slots DENSELY (eigenvector matrices have no
    band structure), so each runs as ``g`` dots of the lane-rotated
    input stack: piece ``j`` is ``w`` rolled by ``j*Zp`` lanes (slot c'
    then holds slab ``(c'+j) mod g``), the stacked matrix row block
    ``M[c']`` carries ``[B(c',c'), B(c',c'+1), ...]`` in rolled column
    order, and slot masks pick each output row block. The bc epilogue
    rides a packed f32 ``bcf`` (1 at Dirichlet/pad entries): the
    embedded transforms annihilate those slots, so ``b*bcf + u``
    reproduces ``where(bc, b, u)`` exactly.
    """
    XS, NYp, L = b_ref.shape
    b = b_ref[:]
    slot = jax.lax.broadcasted_iota(jnp.int32, (XS, NYp, L), 2) // Zp

    def xtrans(w, M_ref):
        pieces = [w.reshape(XS, NYp * L)]
        for j in range(1, g):
            pieces.append(
                pltpu.roll(w, L - j * Zp, axis=2).reshape(XS, NYp * L))
        stack = jnp.concatenate(pieces, axis=0)
        acc = jnp.zeros((XS, NYp, L), jnp.float32)
        for cp in range(g):
            tp = _DOT(M_ref[cp * XS:(cp + 1) * XS, :], stack,
                      precision=_HI).reshape(XS, NYp, L)
            acc = acc + jnp.where(slot == cp, tp, 0.0)
        return acc

    def ytrans(w, V):
        wT = jnp.swapaxes(w, 0, 1).reshape(NYp, XS * L)
        return jnp.swapaxes(
            _DOT(V, wT, precision=_HI).reshape(NYp, XS, L), 0, 1)

    def ztrans(w, Vbd):
        return _DOT(w.reshape(XS * NYp, L), Vbd,
                    precision=_HI).reshape(XS, NYp, L)

    t = xtrans(b, MXt_ref)
    t = ytrans(t, Vyt_ref[:])
    t = ztrans(t, VZTbd_ref[:])
    t = t * dinv_ref[:]
    t = ztrans(t, VZbd_ref[:])
    t = ytrans(t, Vy_ref[:])
    u = xtrans(t, MX_ref)
    out_ref[:] = b * bcf_ref[:] + u


def _emu_fdm_single(b3, m, *, g, Zp):
    """jnp twin of `_packed_fdm_single_kernel` (off-TPU; same math)."""
    XS, NYp, L = b3.shape
    slot = jnp.arange(L)[None, None, :] // Zp

    def xtrans(w, M):
        pieces = [w]
        for j in range(1, g):
            pieces.append(jnp.roll(w, -j * Zp, axis=2))
        stack = jnp.concatenate(pieces, axis=0)
        acc = jnp.zeros_like(w)
        for cp in range(g):
            tp = jnp.einsum("ak,kyL->ayL", M[cp * XS:(cp + 1) * XS],
                            stack, precision=_HI)
            acc = acc + jnp.where(slot == cp, tp, 0.0)
        return acc

    t = xtrans(b3, m["MXt"])
    t = jnp.einsum("by,xyL->xbL", m["Vyt"], t, precision=_HI)
    t = jnp.einsum("xyl,lm->xym", t, m["VZTbd"], precision=_HI)
    t = t * m["dinv"]
    t = jnp.einsum("xyl,lm->xym", t, m["VZbd"], precision=_HI)
    t = jnp.einsum("by,xyL->xbL", m["Vy"], t, precision=_HI)
    u = xtrans(t, m["MX"])
    return b3 * m["bcf"] + u


class PackedFDMSingle(_SinglePacked):
    """SINGLE-RHS lane-packed FDM DIRECT solve for small lattices (f32).

    The one-vector counterpart of `PackedFDMBatch`: the lattice's own
    x-slabs fill the 128-lane tiles and ONE Mosaic kernel runs the
    whole direct solve (six transforms + eigenvalue division + bc
    epilogue). This is the serving-mode implicit time-stepper's inner
    solve for a single trajectory — `heat_fdm_evolve`-class steppers at
    batch 1 would otherwise leave half (NZ <= 64) or three quarters
    (NZ <= 32) of every lane tile idle.

    Same solver contract as `solvers.fdm.FastDiagonalizationSolver`:
    constant / per-axis-diagonal kappa, sigma shift, graded spacing,
    mixed Dirichlet/Neumann faces and Robin ends.
    """

    def __init__(self, mesh, P, kappa=2.0, sigma=0.0, interpret=False):
        from ..fem.mesh import require_axis_aligned

        require_axis_aligned(mesh, "PackedFDMSingle")
        g = self._init_single(mesh, P, "PackedFDMSingle")
        NX, NY, NZ = self.shape
        XS = self.XS
        Vs, dinv3 = _fdm_embedded(mesh, self.P, kappa, sigma,
                                  "PackedFDMSingle")

        def xstack(V):
            """Stacked rolled-column x-transform matrix (g*XS, g*XS)."""
            Vp = np.zeros((self.NXp, self.NXp))
            Vp[:NX, :NX] = V
            M = np.zeros((g * XS, g * XS))
            for cp in range(g):
                for j in range(g):
                    c = (cp + j) % g
                    M[cp * XS:(cp + 1) * XS, j * XS:(j + 1) * XS] = \
                        Vp[cp * XS:(cp + 1) * XS, c * XS:(c + 1) * XS]
            return M

        Vyp = np.zeros((self.NYp, self.NYp))
        Vyp[:NY, :NY] = Vs[1]
        Vzp = np.zeros((self.Zp, self.Zp))
        Vzp[:NZ, :NZ] = Vs[2]
        bc3 = np.asarray(mesh.boundary_dof_marker(self.P)).reshape(
            NX, NY, NZ)
        self.mats = dict(
            MXt=jnp.asarray(xstack(Vs[0].T), jnp.float32),
            MX=jnp.asarray(xstack(Vs[0]), jnp.float32),
            Vyt=jnp.asarray(Vyp.T.copy(), jnp.float32),
            Vy=jnp.asarray(Vyp, jnp.float32),
            VZTbd=jnp.asarray(np.kron(np.eye(g), Vzp), jnp.float32),
            VZbd=jnp.asarray(np.kron(np.eye(g), Vzp.T), jnp.float32),
            dinv=jnp.asarray(self._pack_host(dinv3), jnp.float32),
            bcf=jnp.asarray(self._pack_host(bc3.astype(np.float64),
                                            pad=1.0), jnp.float32),
        )

        vmem = 4 * XS * self.NYp * 128
        self._pcall = pl.pallas_call(
            partial(_packed_fdm_single_kernel, g=g, Zp=self.Zp),
            out_shape=jax.ShapeDtypeStruct((XS, self.NYp, 128),
                                           jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 9,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(12 * vmem + (8 << 20), 96 << 20)
            ),
            interpret=interpret,
        )
        self._interpret = interpret
        self._solve = jax.jit(self._solve_impl)
        self._roundtrip = jax.jit(
            lambda b: self.unpack(self._solve_impl(self.pack(b)))
        )

    def solve_packed(self, P3):
        return self._solve(P3)

    def _solve_impl(self, P3):
        if not self._interpret and jax.default_backend() != "tpu":
            return _emu_fdm_single(P3, self.mats, g=self.g, Zp=self.Zp)
        m = self.mats
        return self._pcall(P3, m["bcf"], m["MXt"], m["MX"], m["Vyt"],
                           m["Vy"], m["VZTbd"], m["VZbd"], m["dinv"])

    def solve(self, b):
        """Direct solve; ``b`` is ``(ndofs,)`` or ``(NX, NY, NZ)``;
        ``u[bc] = b[bc]`` like every solver in the package."""
        b = jnp.asarray(b, jnp.float32)
        out = self._roundtrip(b.reshape(self.shape))
        return out.reshape(jnp.shape(b))
