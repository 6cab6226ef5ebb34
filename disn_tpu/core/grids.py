"""Dense SDF query-grid construction.

The reference builds the inference grid with np.meshgrid(z, y, x, indexing='ij')
and concatenates (x, y, z) — i.e. flat order has x fastest, then y, then z
(test/create_sdf.py:243-258), matching the `.dist` value order.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp


def dense_grid_np(sdf_params: np.ndarray, resolution: int) -> np.ndarray:
    """[(res+1)^3, 3] float32 grid points, x fastest."""
    x = np.linspace(sdf_params[0], sdf_params[3], num=resolution, dtype=np.float64)
    y = np.linspace(sdf_params[1], sdf_params[4], num=resolution, dtype=np.float64)
    z = np.linspace(sdf_params[2], sdf_params[5], num=resolution, dtype=np.float64)
    zz, yy, xx = np.meshgrid(z, y, x, indexing="ij")
    pts = np.stack([xx, yy, zz], axis=-1).reshape(-1, 3)
    return pts.astype(np.float32)


def dense_grid(sdf_params: jnp.ndarray, resolution: int) -> jnp.ndarray:
    """Device-side grid: [(res+1)^3, 3], x fastest. sdf_params: [6]."""
    t = jnp.linspace(0.0, 1.0, resolution, dtype=jnp.float32)
    x = sdf_params[0] + t * (sdf_params[3] - sdf_params[0])
    y = sdf_params[1] + t * (sdf_params[4] - sdf_params[1])
    z = sdf_params[2] + t * (sdf_params[5] - sdf_params[2])
    xx = jnp.tile(x, resolution * resolution)
    yy = jnp.tile(jnp.repeat(y, resolution), resolution)
    zz = jnp.repeat(z, resolution * resolution)
    return jnp.stack([xx, yy, zz], axis=-1)


def grid_block(sdf_params: jnp.ndarray, resolution: int, start: jnp.ndarray,
               block: int) -> jnp.ndarray:
    """[block, 3] grid points for flat indices [start, start+block), computed
    on the fly — lets dense inference scan over the 16.8M-point 256^3 grid
    without materializing it in HBM."""
    idx = start + jnp.arange(block, dtype=jnp.int32)
    ix = idx % resolution
    iy = (idx // resolution) % resolution
    iz = idx // (resolution * resolution)
    denom = jnp.float32(resolution - 1)
    fx = ix.astype(jnp.float32) / denom
    fy = iy.astype(jnp.float32) / denom
    fz = iz.astype(jnp.float32) / denom
    x = sdf_params[0] + fx * (sdf_params[3] - sdf_params[0])
    y = sdf_params[1] + fy * (sdf_params[4] - sdf_params[1])
    z = sdf_params[2] + fz * (sdf_params[5] - sdf_params[2])
    return jnp.stack([x, y, z], axis=-1)


def trilinear_sample(values: jnp.ndarray, sdf_params: jnp.ndarray,
                     points: jnp.ndarray) -> jnp.ndarray:
    """Trilinearly interpolate a [R,R,R] (z,y,x-indexed) volume at [N,3]
    (x,y,z) points. Mirrors the scipy RegularGridInterpolator use in
    preprocessing/create_point_sdf_grid.py:20-27."""
    R = values.shape[0]
    span = sdf_params[3:6] - sdf_params[0:3]
    f = (points - sdf_params[0:3]) / span * (R - 1)
    f = jnp.clip(f, 0.0, R - 1.0)
    i0 = jnp.clip(jnp.floor(f).astype(jnp.int32), 0, R - 2)
    w = f - i0.astype(jnp.float32)
    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    wx, wy, wz = w[..., 0], w[..., 1], w[..., 2]

    def at(dz, dy, dx):
        return values[z0 + dz, y0 + dy, x0 + dx]

    c00 = at(0, 0, 0) * (1 - wx) + at(0, 0, 1) * wx
    c01 = at(0, 1, 0) * (1 - wx) + at(0, 1, 1) * wx
    c10 = at(1, 0, 0) * (1 - wx) + at(1, 0, 1) * wx
    c11 = at(1, 1, 0) * (1 - wx) + at(1, 1, 1) * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
