"""Cell-wise fast-diagonalization (FDM) Schwarz smoother.

The production-size high-p smoother: symmetric additive Schwarz over
per-cell blocks of the operator, each block inverted by separable fast
diagonalization (the classic spectral-element smoother of Lottes &
Fischer, "Hybrid multigrid/Schwarz algorithms for the spectral element
method", here in its non-overlapping multiplicity-weighted form). The
reference has no Schwarz smoothers (point Jacobi only,
src/chebyshev.hpp); measured in the V-cycle at p=(1,3,6):

- isotropic: residual contraction per cycle 0.12 vs 0.41 point Jacobi
  (rel 4.6e-10 vs 1.6e-4 after 10 cycles);
- rotated 100:1 tensor: the stationary divergence at the default
  smoother_iters=2 turns CONTRACTING (3.4e-3 vs rel 4.6 diverging) —
  like the line smoother (solvers/line.py), but with O(ndofs) memory
  instead of O(ndofs * line_length), so it runs at ANY problem size;
- grid-aligned diag(1,1,64): 1.9e-3 vs 6.1e-2 (line remains stronger
  where its blocks fit: 4.7e-8).

TPU-native design — no indexed gather/scatter and no per-cell dense
blocks: the cell expansion/overlap-add are the zero-FLOP
`ops.lattice._expand`/`_fold` reshapes, the per-cell block inverse is
six batched (P+1)x(P+1) matmuls (per-axis eigenvector transforms,
shared across cells at the same axis position) around one pointwise
eigenvalue scale. Data: three (nc_a, P+1, P+1) eigenvector stacks, one
cell-expanded ``1/lambda_sum`` grid (~1.6x a lattice vector), one
multiplicity-weight lattice. Apply cost ~ one lattice operator apply
without the geometry product.

Exactness: for the Kronecker-form operator (axis-aligned boxes,
per-axis/diagonal kappa, incl. the sigma lumped-mass shift) the
separable block IS the exact cell block of the bc-applied assembled
matrix (verified to roundoff in tests/test_schwarz.py). For the general
family (per-cell variable kappa, full tensors, curved hexes) it is the
natural separable approximation: per-cell diagonal-tensor coefficient,
nominal box geometry — measured to keep the V-cycle wins above.

Boundary conditions stay separable because a cell's Dirichlet set is a
per-axis product: each axis builds its eigenbasis on the 1D interior
nodes and embeds identity on the bc node(s), inputs are bc-zeroed, and
the global ``y[bc] = r[bc]`` epilogue restores the identity — the same
invariant as the point-Jacobi ``diag_inv`` and line blocks.

Distributed: the blocks are cell-local and cells never span shards, so
the smoother runs under ANY axis decomposition (unlike the line
smoother, whose line axis must be unsharded). The only communication
is the interface partial-sum exchange after the cell overlap-add —
the same per-axis ppermute pair the operator applies use, passed in as
``exchange=`` (``ops['exchange']`` of the dist/grid cycle-ops dicts).
Trajectory-exact vs single-device on the slab, 2D/3D grids, and the
``dist=True`` h-MG hierarchies (tests/test_schwarz.py).
"""

import numpy as np


def _axis_eigs(nca, P, h, left_bc=True, right_bc=True, robin=(0.0, 0.0)):
    """Per-cell-position generalized eigenpairs of the 1D cell blocks.

    For each cell c along one axis: the (P+1)x(P+1) block of the global
    1D stiffness (which carries neighbour contributions on shared end
    nodes — what makes the local problem well-posed without overlap)
    against the diagonal 1D lumped mass. Nodes on the global domain
    boundary are Dirichlet: the eigenproblem is solved on the interior
    nodes and embedded with identity (eigenvalue 1) on the bc nodes.
    ``robin=(alpha_lo/k, alpha_hi/k)`` folds Robin end-point updates
    into the first/last cell's block (kappa pre-divided — the caller's
    per-cell ``kd * lam`` scaling then restores the kappa-free alpha).

    Returns ``V[(nca, n, n)]`` with ``V^T diag(m) V = I`` blockwise and
    ``lam[(nca, n)]``; the 1D block inverse is ``V diag(1/lam) V^T``.
    """
    from ..ops.kron import axis_stiffness_mass

    n = P + 1
    K1, M1 = axis_stiffness_mass(nca, P, h, robin=robin)
    K1, M1 = np.asarray(K1, np.float64), np.asarray(M1, np.float64)
    V = np.zeros((nca, n, n))
    lam = np.ones((nca, n))
    for c in range(nca):
        sl = slice(c * P, c * P + n)
        S, d = K1[sl, sl], M1[sl]
        bcn = ([0] if (left_bc and c == 0) else []) + (
            [n - 1] if (right_bc and c == nca - 1) else [])
        keep = np.setdiff1d(np.arange(n), bcn)
        L = np.sqrt(d[keep])
        w, W = np.linalg.eigh(S[np.ix_(keep, keep)] / L[:, None] / L[None, :])
        V[c][np.ix_(keep, keep)] = W / L[:, None]  # d-orthonormal columns
        for b in bcn:
            V[c, b, b] = 1.0
        lam[c, keep] = w
    return V, lam


def axis_multiplicity(nca, P):
    """1D dof multiplicity: 2 on interior cell interfaces, 1 elsewhere."""
    m = np.ones(nca * P + 1)
    if nca > 1:
        m[P:-1:P] += 1.0
    return m


def _axis_dense(V, P, left_bc=True, right_bc=True):
    """Dense per-axis forward-transform matrix ``U`` (f64).

    ``U = blockdiag(V_c^T) @ E @ diag(w * (1 - bc))`` of shape
    ``(nca*n, N)``: cell expansion E, the (separable) multiplicity
    weight ``w = 1/sqrt(mult)`` and the per-axis Dirichlet zero-mask
    folded into the per-cell eigenvector transposes. The whole Schwarz
    preconditioner then reads ``M^-1 = U_x^T U_y^T U_z^T [ginv *
    (U_x U_y U_z r)]`` + identity on bc — six dense rectangular axis
    contractions, the same MXU-friendly shape as the FDM direct solver
    (solvers/fdm.py), instead of batched (P+1)x(P+1) matmuls whose
    K=P+1 starves the 128x128 systolic array and whose trailing-dim-n
    intermediates pad to 128 lanes (measured 88.7 ms/cycle at 16.2M,
    ARTIFACTS/smoother16m_r3.md — the dense form is the fix).
    """
    nca, n = V.shape[0], P + 1
    N = nca * P + 1
    s = 1.0 / np.sqrt(axis_multiplicity(nca, P))
    if left_bc:
        s[0] = 0.0
    if right_bc:
        s[-1] = 0.0
    U = np.zeros((nca * n, N))
    for c in range(nca):
        U[c * n:(c + 1) * n, c * P:c * P + n] = (
            V[c].T * s[c * P:c * P + n][None, :])
    return U


def shard_dense_axis(U, P, starts, npl):
    """Per-shard diagonal blocks of a dense axis matrix, row-stacked.

    ``U`` is the global ``(nca*n, N)`` matrix from `_axis_dense`;
    ``starts``/``npl`` the duplicated-plane layout's per-shard node
    starts and local plane count (`SlabPartition`/`GridPartition.
    _axis_starts`). Each shard's block maps its LOCAL nodes (incl. the
    duplicated interface planes) to its LOCAL cells — cells never span
    shards, so the block is an exact slice; stacking along rows makes
    the result evenly shardable with a dim-0 PartitionSpec. Interface
    partials produced by the transposed (fold) contraction are
    reconciled by the layout's partial-sum exchange, exactly like the
    batched form's `_fold`.
    """
    U = np.asarray(U)
    n = U.shape[0] // ((U.shape[1] - 1) // P)
    ncl = (npl - 1) // P
    return np.concatenate(
        [U[(s0 // P) * n:(s0 // P + ncl) * n, s0:s0 + npl]
         for s0 in starts], axis=0)


def build_schwarz_np(mesh, P, kappa, sigma=0.0):
    """Host (NumPy, f64) global Schwarz data for `schwarz_precond_apply`.

    ``kappa`` in any resolvable form; per-cell diagonal coefficients
    come from `resolve_kappa_split` (full tensors keep their diagonal —
    the separable approximation; measured effective even for rotated
    anisotropy). ``sigma`` adds the lumped-mass shift exactly
    (``V^T M V = I`` per axis makes it a pure eigenvalue offset).

    Keys: per-axis eigenvector stacks ``Vx/Vy/Vz`` (cell-indexed on
    their leading axis), the cell-expanded inverse eigenvalue grid
    ``ginv``, the multiplicity weight ``w`` and bc marker ``bc`` (both
    dof-lattice-shaped). The distributed builders slice ``Vx``/``ginv``
    cell-contiguously per shard and re-lay ``w``/``bc`` out with
    duplicated interface planes (`SlabPartition.to_dist` and the grid
    analogue) — all arrays shard cleanly because cells are
    shard-contiguous along every decomposed axis.
    """
    from ..fem.assembly import resolve_kappa_split

    kc, kt, _ = resolve_kappa_split(mesh, kappa)
    ncx, ncy, ncz = mesh.nc
    if kt is not None:
        kd = np.diagonal(kt, axis1=1, axis2=2).reshape(ncx, ncy, ncz, 3)
    else:
        kd = np.broadcast_to(
            np.asarray(kc, np.float64).reshape(ncx, ncy, ncz)[..., None],
            (ncx, ncy, ncz, 3),
        )
    faces = getattr(mesh, "dirichlet_faces", ((True, True),) * 3)
    Vs, lams = [], []
    for a, (nca, ha) in enumerate(zip(mesh.nc, mesh.h_cells)):
        # Robin end updates: fold alpha/kd into the end cells' 1D blocks
        # (the per-cell ``kd * lam`` sum then carries the kappa-free
        # alpha). kd is the PLANE-MEAN kappa of the face-adjacent cells:
        # exact for scalar / per-axis-constant kappa on boxes (the
        # oracle-pinned kron form); the usual separable approximation
        # for variable kappa / curved faces.
        robin = (0.0, 0.0)
        if getattr(mesh, "has_robin", False):
            from ..ops.kron import robin_axis_ends

            ends = robin_axis_ends(mesh, a)
            if ends != (0.0, 0.0):
                k_lo = float(kd[..., a].take(0, axis=a).mean())
                k_hi = float(kd[..., a].take(-1, axis=a).mean())
                robin = (ends[0] / k_lo, ends[1] / k_hi)
        V, lam = _axis_eigs(nca, P, ha, left_bc=faces[a][0],
                            right_bc=faces[a][1], robin=robin)
        Vs.append(V)
        lams.append(lam)
    n = P + 1
    lsum = (
        kd[:, None, :, None, :, None, 0] * lams[0][:, :, None, None, None, None]
        + kd[:, None, :, None, :, None, 1] * lams[1][None, None, :, :, None, None]
        + kd[:, None, :, None, :, None, 2] * lams[2][None, None, None, None, :, :]
        + float(sigma)
    )
    mult = np.einsum(
        "a,b,c->abc",
        axis_multiplicity(ncx, P),
        axis_multiplicity(ncy, P),
        axis_multiplicity(ncz, P),
    )
    # Both forms assume the per-axis SEPARABLE Dirichlet set (the union
    # of whole flagged faces — `mesh.dirichlet_faces`): the dense
    # matrices hard-fold the per-axis end masks and `_axis_eigs` embeds
    # identity at the flagged ends. Fail fast if the mesh's marker ever
    # stops matching that union (a partial-face subclass would silently
    # desync the two forms otherwise).
    bc = np.asarray(mesh.boundary_dof_marker(P)).reshape(mult.shape) > 0.5
    sep = np.zeros(bc.shape, bool)
    for a in range(3):
        sl = [slice(None)] * 3
        for end, flagged in zip((0, -1), faces[a]):
            if flagged:
                sl[a] = end
                sep[tuple(sl)] = True
    if not np.array_equal(bc, sep):
        raise ValueError(
            "schwarz smoother assumes a per-axis separable (whole-face) "
            "Dirichlet marker; got a non-separable boundary_dof_marker"
        )
    return dict(
        Vx=Vs[0],
        Vy=Vs[1],
        Vz=Vs[2],
        Ux=_axis_dense(Vs[0], P, *faces[0]),
        Uy=_axis_dense(Vs[1], P, *faces[1]),
        Uz=_axis_dense(Vs[2], P, *faces[2]),
        ginv=1.0 / lsum.reshape(ncx * n, ncy * n, ncz * n),
        w=1.0 / np.sqrt(mult),
        bc=bc,
    )


# Device-dict keys per apply form. Production builders ship 'dense'
# only: the batched form's w is a full lattice-sized array (~65 MB f32
# per level at 16.2M) that the dense path never reads — dead HBM.
_FORM_KEYS = {
    "dense": ("Ux", "Uy", "Uz", "ginv"),
    "batched": ("Vx", "Vy", "Vz", "ginv", "w"),
    "both": ("Vx", "Vy", "Vz", "Ux", "Uy", "Uz", "ginv", "w"),
}


def build_schwarz(mesh, P, kappa, dtype, sigma=0.0, form="dense"):
    """Device arrays for `schwarz_precond_apply` (dict pytree).

    ``form='dense'`` (production default) ships only the dense-path
    arrays; ``'batched'``/``'both'`` include the reference-form ones
    (parity tests)."""
    import jax.numpy as jnp

    sw = build_schwarz_np(mesh, P, kappa, sigma=sigma)
    return dict(
        {k: jnp.asarray(sw[k], dtype=dtype) for k in _FORM_KEYS[form]},
        bc=jnp.asarray(sw["bc"]),
    )


def schwarz_precond_apply(sw, r, shape, P, precision="highest",
                          exchange=None, form=None):
    """Apply the Schwarz preconditioner ``r -> M^-1 r`` (jit-traceable).

    ``M^-1 = W [sum_cells R_c^T B_c^-1 R_c] W`` with ``W`` the symmetric
    multiplicity weighting and ``B_c^-1`` the separable FDM inverse.
    Two mathematically identical forms (parity-tested to roundoff):

    - ``'dense'`` (default when the ``Ux/Uy/Uz`` matrices are present):
      six dense rectangular axis contractions around the pointwise
      eigenvalue scale — the FDM-solver shape that keeps the MXU full
      (see `_axis_dense`). W, cell expansion and the per-axis bc
      zero-mask are folded into the matrices.
    - ``'batched'``: zero-FLOP cell expansion, batched per-cell V^T/V
      matmuls, overlap-add. Kept as the independent reference
      implementation; on TPU its K=P+1 matmuls and 128-lane-padded
      intermediates are ~an order of magnitude slower at production
      sizes (ARTIFACTS/smoother16m_r3.md).

    ``r`` flat or lattice-shaped; result keeps its shape.

    Distributed (shard_map) use: ``shape`` is the LOCAL lattice shape
    and ``exchange`` the layout's interface partial-sum exchange
    (``ops['exchange']`` of the dist/grid cycle-ops dicts). The cell
    sum then runs exactly as on one device — local cells overlap-add
    locally, the duplicated interface planes hold one cell's partial
    per shard, and the exchange reconciles them before the multiplicity
    weighting (pointwise ``W`` commutes with the plane add; in the
    dense form W rides the matrices, applied per shard to each
    partial — same commutation).
    """
    import jax.numpy as jnp

    from ..ops.lattice import _expand, _fold

    n = P + 1
    NX, NY, NZ = shape
    ncx, ncy, ncz = (NX - 1) // P, (NY - 1) // P, (NZ - 1) // P
    x = r.reshape(shape)
    if form is None:
        form = "dense" if "Ux" in sw else "batched"
    if form not in ("dense", "batched"):
        raise ValueError(f"form must be 'dense' or 'batched', got {form!r}")
    if form == "dense":
        t = jnp.einsum("ax,xyz->ayz", sw["Ux"], x, precision=precision)
        t = jnp.einsum("by,ayz->abz", sw["Uy"], t, precision=precision)
        t = jnp.einsum("cz,abz->abc", sw["Uz"], t, precision=precision)
        t = t * sw["ginv"]
        t = jnp.einsum("cz,abc->abz", sw["Uz"], t, precision=precision)
        t = jnp.einsum("by,abz->ayz", sw["Uy"], t, precision=precision)
        y = jnp.einsum("ax,ayz->xyz", sw["Ux"], t, precision=precision)
        if exchange is not None:
            y = exchange(y)
        y = jnp.where(sw["bc"], x, y)
        return y.reshape(r.shape)
    xb = jnp.where(sw["bc"], jnp.zeros_like(x), x) * sw["w"]
    t = _expand(_expand(_expand(xb, 2, ncz, P), 1, ncy, P), 0, ncx, P)
    # V^T transforms (per-cell-position eigenbases, batched matmuls)
    t = jnp.einsum("cab,caq->cbq", sw["Vx"],
                   t.reshape(ncx, n, -1), precision=precision)
    t = t.reshape(ncx * n, ncy, n, ncz * n)
    t = jnp.einsum("cab,xcaz->xcbz", sw["Vy"], t, precision=precision)
    t = t.reshape(ncx * n, ncy * n, ncz, n)
    t = jnp.einsum("cab,xyca->xycb", sw["Vz"], t, precision=precision)
    t = t.reshape(ncx * n, ncy * n, ncz * n) * sw["ginv"]
    # V transforms back
    t = t.reshape(ncx * n, ncy * n, ncz, n)
    t = jnp.einsum("cab,xycb->xyca", sw["Vz"], t, precision=precision)
    t = t.reshape(ncx * n, ncy, n, ncz * n)
    t = jnp.einsum("cab,xcbz->xcaz", sw["Vy"], t, precision=precision)
    t = t.reshape(ncx, n, -1)
    t = jnp.einsum("cab,cbq->caq", sw["Vx"], t, precision=precision)
    t = t.reshape(ncx * n, ncy * n, ncz * n)
    y = _fold(_fold(_fold(t, 0, ncx, P), 1, ncy, P), 2, ncz, P)
    if exchange is not None:
        y = exchange(y)
    y = y * sw["w"]
    y = jnp.where(sw["bc"], x, y)
    return y.reshape(r.shape)
