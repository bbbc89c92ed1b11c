"""Batched linear (DLT) triangulation.

Camera 1 is the identity [I | 0]; camera 2 is [R | t]; inputs are
normalized camera coordinates. Each point solves a 4x3 least-squares system
— batched over N as one lstsq via normal equations (a (N, 3, 3) solve on
the MXU), no per-point python work.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.jit
def triangulate_points(r: jax.Array, t: jax.Array,
                       x1: jax.Array, x2: jax.Array) -> jax.Array:
    """(3,3), (3,), (N,2), (N,2) -> (N, 3) points in camera-1 frame."""
    p1 = jnp.concatenate([jnp.eye(3), jnp.zeros((3, 1))], 1)  # (3, 4)
    p2 = jnp.concatenate([r, t[:, None]], 1)

    def rows(p, x):
        # x * p[2] - p[0], y * p[2] - p[1] per point: (N, 2, 4)
        return jnp.stack([
            x[:, 0:1] * p[2] - p[0],
            x[:, 1:2] * p[2] - p[1],
        ], axis=1)

    a = jnp.concatenate([rows(p1, x1), rows(p2, x2)], axis=1)  # (N, 4, 4)
    # solve A [X; 1] = 0 in least squares: split A = [B | b]
    b_mat = a[:, :, :3]
    b_vec = -a[:, :, 3]
    # true-f32 normal equations via explicit broadcast-sum (VPU, exact):
    # triangulated depths feed monocular scale propagation; einsum's
    # one-pass-bf16 MXU lowering drifts the whole scale chain, and a
    # HIGHEST request expands to 6-pass programs with pathological compile
    # times inside the vmapped callers
    ata = jnp.sum(b_mat[:, :, :, None] * b_mat[:, :, None, :], axis=1)
    atb = jnp.sum(b_mat * b_vec[:, :, None], axis=1)
    ata = ata + 1e-10 * jnp.eye(3)
    return jnp.linalg.solve(ata, atb[..., None])[..., 0]
