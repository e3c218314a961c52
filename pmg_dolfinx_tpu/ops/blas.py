"""BLAS-1 layer on dof vectors (single-device and SPMD variants).

API-parity module for the reference's free-function vector algebra
(src/vector.hpp:327-455: `inner_product`, `squared_norm`, `norm` (l2 and
linf), `axpy`, `scale`, `copy`, `pointwise_mult`, `transform`). In JAX
most of these are one-liners over jnp arrays — they exist as named
functions so solver code reads like the reference and so the distributed
variants (ownership-weighted + psum, replacing the MPI_Allreduce at
vector.hpp:350,384) are drop-in.

All functions are jit-safe pure functions.
"""

import jax
import jax.numpy as jnp


# -- single device ------------------------------------------------------

def inner_product(u, v):
    """Real dot product; shape-agnostic (lattice-shaped vectors reduce
    without a relayout, unlike vdot's ravel on some layouts)."""
    return jnp.sum(u * v)


def squared_norm(u):
    return inner_product(u, u)


def norm(u, kind="l2"):
    if kind == "l2":
        return jnp.sqrt(squared_norm(u))
    if kind == "linf":
        return jnp.max(jnp.abs(u))
    raise ValueError(kind)


def axpy(alpha, x, y):
    """Return ``alpha * x + y``."""
    return alpha * x + y


def scale(alpha, x):
    return alpha * x


def copy(x):
    return jnp.array(x)


def pointwise_mult(u, v):
    return u * v


def transform(f, *arrays):
    """Elementwise map (the thrust::transform analogue)."""
    return f(*arrays)


# -- distributed (inside shard_map over axis `axis`) ---------------------

def dist_inner_product(u, v, weights, axis):
    """Ownership-weighted dot + psum (MPI_Allreduce analogue)."""
    return jax.lax.psum(jnp.sum(u * v * weights), axis)


def dist_norm(u, weights, axis, kind="l2"):
    if kind == "l2":
        return jnp.sqrt(dist_inner_product(u, u, weights, axis))
    if kind == "linf":
        return jax.lax.pmax(jnp.max(jnp.abs(u)), axis)
    raise ValueError(kind)
