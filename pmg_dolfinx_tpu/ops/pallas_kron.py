"""Fused Pallas kernel for the Kronecker-sum Laplacian apply.

A single-program Mosaic kernel that keeps the whole (padded) dof lattice
in VMEM and performs all three per-axis contractions + mass scalings +
accumulation without HBM round-trips between stages — the Pallas analogue
of the reference's shared-memory `stiffness_operator` kernel
(src/laplacian.hpp:143-278), restructured for the MXU.

Status / honest measurement: on TPU v5e at p=6 / 2.05M dofs this kernel
runs at 0.103 ms/apply — parity with the XLA kron path (0.095 ms), which
is already at the practical roofline for the 3-axis dependency structure
(every contraction is global along one axis, so blocking cannot reduce
the minimum traffic further, and the `highest`-precision matmul passes
dominate). The XLA path stays the default; this kernel is the foundation
for future fused-smoother kernels (several applies per VMEM residency).

Constraints: the padded lattice (next multiple of (8,128) on the minor
dims) must fit in VMEM alongside the output (~2 x padded size); for
larger problems fall back to `ops.kron`.

Mosaic notes (hard-won):
- values (not refs) cannot be dynamically indexed -> read planes/rows via
  ref indexing only;
- reshapes must keep the minor two dims tile-aligned -> pad to
  (*, 8k, 128m) before entering the kernel;
- `precision=HIGHEST` works inside the kernel (exact-f32 3-pass matmuls).
"""


import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

HI = jax.lax.Precision.HIGHEST


def _round_up(v, m):
    return ((v + m - 1) // m) * m


def _kernel(x_ref, Kx_ref, Ky_ref, Kz_ref, myz_ref, mxz_ref, mxy_ref, y_ref):
    NPx, NPy, NPz = x_ref.shape
    xb = x_ref[:]
    t1 = jnp.dot(
        Kx_ref[:], xb.reshape(NPx, NPy * NPz),
        preferred_element_type=jnp.float32, precision=HI,
    ).reshape(NPx, NPy, NPz) * myz_ref[:][None, :, :]
    t3 = jnp.dot(
        xb.reshape(NPx * NPy, NPz), Kz_ref[:].T,
        preferred_element_type=jnp.float32, precision=HI,
    ).reshape(NPx, NPy, NPz) * mxy_ref[:][:, :, None]
    xT = jnp.swapaxes(xb, 0, 1)
    t2T = jnp.dot(
        Ky_ref[:], xT.reshape(NPy, NPx * NPz),
        preferred_element_type=jnp.float32, precision=HI,
    ).reshape(NPy, NPx, NPz)
    t2 = jnp.swapaxes(t2T, 0, 1) * mxz_ref[:][:, None, :]
    y_ref[:] = t1 + t2 + t3


class PallasKronLaplacian:
    """Drop-in fused-kernel variant of `ops.kron.KronLaplacian` (f32)."""

    def __init__(self, mesh, P, kappa=2.0, interpret=False):
        from .kron import KronLaplacian

        base = KronLaplacian(mesh, P, kappa=kappa, dtype=jnp.float32)
        self.P = int(P)
        self.mesh = mesh
        self.ndofs = mesh.num_dofs(P)
        self.diag = base.diag
        self.diag_inv = base.diag_inv
        NX, NY, NZ = mesh.lattice_shape(P)
        NPx = NX  # leading dim needs no padding
        NPy = _round_up(NY, 8)
        NPz = _round_up(NZ, 128)
        self.shape = (NX, NY, NZ)
        self.padded = (NPx, NPy, NPz)

        def pad2(a, s0, s1):
            out = np.zeros((s0, s1), dtype=np.float32)
            out[: a.shape[0], : a.shape[1]] = np.asarray(a)
            return jnp.asarray(out)

        def pad1(a, s0):
            out = np.zeros(s0, dtype=np.float32)
            out[: a.shape[0]] = np.asarray(a)
            return out

        Kx, Ky, Kz = base.Ks
        mx, my, mz = base.ms
        self.Kxp = pad2(Kx, NPx, NPx)
        self.Kyp = pad2(Ky, NPy, NPy)
        self.Kzp = pad2(Kz, NPz, NPz)
        mxp, myp, mzp = pad1(mx, NPx), pad1(my, NPy), pad1(mz, NPz)
        self.myzp = jnp.asarray(np.outer(myp, mzp), dtype=jnp.float32)
        self.mxzp = jnp.asarray(np.outer(mxp, mzp), dtype=jnp.float32)
        self.mxyp = jnp.asarray(np.outer(mxp, myp), dtype=jnp.float32)
        bc = np.ones(self.padded, dtype=bool)
        bc[:NX, :NY, :NZ] = np.asarray(mesh.boundary_dof_marker(P)).reshape(
            NX, NY, NZ
        )
        self.bcp = jnp.asarray(bc)

        vmem_bytes = 4 * int(np.prod(self.padded)) * 2 + 8 * 1024 * 1024
        self._pcall = pl.pallas_call(
            _kernel,
            out_shape=jax.ShapeDtypeStruct(self.padded, jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=min(_round_up(vmem_bytes, 1 << 20), 100 << 20)
            ),
            interpret=interpret,
        )
        self._apply = jax.jit(self._apply_impl)

    def _apply_impl(self, x):
        NX, NY, NZ = self.shape
        xp = jnp.zeros(self.padded, dtype=jnp.float32)
        xp = xp.at[:NX, :NY, :NZ].set(x.reshape(NX, NY, NZ))
        xb = jnp.where(self.bcp, 0.0, xp)
        y = self._pcall(
            xb, self.Kxp, self.Kyp, self.Kzp, self.myzp, self.mxzp, self.mxyp
        )
        y = jnp.where(self.bcp, xp, y)
        return y[:NX, :NY, :NZ].reshape(-1)

    def __call__(self, x):
        return self._apply(x)
