"""Feasibility probe for a BLOCK-MAJOR dense volume ([B^3 blocks][4^3
points], B=65 at 257^3): the fine-value scatter becomes an aligned
64-wide ROW scatter (~18k rows vs ~1.15M per-point rows) and the scan's
bitpack collapses — IF (a) wide aligned row scatters are ~per-row cost
and (b) the 7 shifted-neighbor reads of the record-words build stay
cheap as lane shifts + block-axis concats.

All arms single-sync chained (measurement law): K launches, one jitted
scalar reduce, fetch the scalar; noop RTT subtracted.

Usage: python scripts/probe_blockmajor.py
"""
from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

K = 8


def chain(fn, args, reduce_fn, reps=3):
    import jax
    ts = []
    for r in range(reps):
        outs = []
        t0 = time.perf_counter()
        for i in range(K):
            outs.append(fn(*args))
        s = reduce_fn(outs[-1])
        float(np.asarray(s))
        ts.append((time.perf_counter() - t0) * 1000)
    return min(ts)


def main() -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    B = 65           # block grid (with ghost layer)
    NC = 17888       # production active cells (round-4 count)
    R = 257
    E3 = R ** 3
    BM = B ** 3 * 64

    rng = np.random.RandomState(0)
    cells = np.sort(rng.choice(B ** 3, NC, replace=False).astype(np.int32))
    vals64 = rng.randn(NC, 64).astype(np.float32)
    base_bm = jnp.zeros((BM,), jnp.float32)
    base_std = jnp.zeros((E3,), jnp.float32)
    cells_d = jnp.asarray(cells)
    vals_d = jnp.asarray(vals64)

    # per-point flats for the standard-layout arm (x-minor z-major offsets)
    bz = cells // (B * B)
    by = (cells // B) % B
    bx = cells % B
    l = np.arange(64, dtype=np.int32)
    loff = ((l // 16) * R + ((l // 4) % 4) * R // 1 * 0 + 0)  # placeholder
    loff = (l // 16) * R * R + ((l // 4) % 4) * R + (l % 4)
    basef = (bz * 4 * R + by * 4) * R + bx * 4
    flats = (basef[:, None] + loff[None, :]).reshape(-1)
    flats = np.where(flats < E3, flats, E3 - 1).astype(np.int32)
    flats_d = jnp.asarray(flats)
    valsf_d = jnp.asarray(vals64.reshape(-1))

    @jax.jit
    def scat_std(v0, fl, va):
        return v0.at[fl].set(va, mode="drop")

    @jax.jit
    def scat_rows(v0, cid, va):
        # [NC,64] rows at aligned cid*64 offsets
        return v0.reshape(B ** 3, 64).at[cid].set(va, mode="drop").reshape(-1)

    red = jax.jit(lambda v: jnp.sum(v[::4097]))

    t_std = chain(lambda: scat_std(base_std, flats_d, valsf_d), (),
                  red) if True else 0
    t_row = chain(lambda: scat_rows(base_bm, cells_d, vals_d), (), red)
    noop = chain(lambda: base_bm + 1.0, (), red)
    print(f"noop chain floor: {noop:.1f} ms / {K}")
    print(f"per-point scatter ({NC * 64} rows, std layout): "
          f"{(t_std - noop) / K:.2f} ms/launch")
    print(f"row scatter ({NC} x 64 aligned rows, block-major): "
          f"{(t_row - noop) / K:.2f} ms/launch", flush=True)

    # ---- shifted-read words build: standard vs block-major sketch ----
    vol_std = jnp.asarray(rng.randn(R, R, R).astype(np.float32))
    vol_bm = jnp.asarray(rng.randn(B, B, B, 64).astype(np.float32))

    from disn_tpu.ops import marching as m

    @jax.jit
    def words_std(v):
        return m._dense_words_jit(v, iso=0.0)

    SH = {}
    for ax in range(3):  # 0=x,1=y,2=z (strides 1,4,16 on the l axis)
        s = 4 ** ax if ax < 2 else 16
    # lane-shift helper: out[b, l] = v[b, l + st] masked in-block, plus the
    # cross-boundary term from the +1 block along that axis

    def shift_plus(v, axis):
        # v [B,B,B,64]; axis 0=x(l%4), 1=y((l//4)%4), 2=z(l//16)
        st = (1, 4, 16)[axis]
        li = np.arange(64)
        pos = (li % 4, (li // 4) % 4, li // 16)[axis]
        in_ok = jnp.asarray((pos + 1 < 4))
        inb = jnp.pad(v[..., st:], ((0, 0),) * 3 + ((0, st),))
        bax = (2, 1, 0)[axis]  # block axes are [z,y,x] majors
        nxt = jnp.concatenate(
            [jax.lax.slice_in_dim(v, 1, v.shape[bax], axis=bax),
             jax.lax.slice_in_dim(v, v.shape[bax] - 1, v.shape[bax],
                                  axis=bax)], axis=bax)
        cross = jnp.pad(nxt[..., :64 - 3 * st],
                        ((0, 0),) * 3 + ((3 * st, 0),))
        return jnp.where(in_ok, inb, cross)

    @jax.jit
    def words_bm(v):
        v0 = v
        iso = 0.0
        imask = (v0 < iso).astype(jnp.int32)
        acc = []
        vx = shift_plus(v, 0)
        vy = shift_plus(v, 1)
        vz = shift_plus(v, 2)
        vxy = shift_plus(vx, 1)
        vxz = shift_plus(vx, 2)
        vyz = shift_plus(vy, 2)
        vxyz = shift_plus(vxy, 2)
        k = 1
        for j, vj in enumerate((vx, vy, vxy, vz, vxz, vyz, vxyz)):
            imask = imask | ((vj < iso).astype(jnp.int32) << (j + 1))
            dv = vj - v0
            t = jnp.where(jnp.abs(dv) > 1e-12, (iso - v0) / dv, 0.5)
            acc.append(jnp.round(jnp.clip(t, 0.0, 1.0) * 255.0)
                       .astype(jnp.int32))
        w0 = acc[0] | (acc[1] << 8) | (acc[2] << 16) | (acc[3] << 24)
        w1 = acc[4] | (acc[5] << 8) | (acc[6] << 16) | (imask << 24)
        return w0.reshape(-1), w1.reshape(-1)

    red2 = jax.jit(lambda w: jnp.sum(w[0][::4097] + w[1][::4097]))
    t_ws = chain(lambda: words_std(vol_std), (), red2)
    t_wb = chain(lambda: words_bm(vol_bm), (), red2)
    print(f"words build std (257^3 shifted slices): "
          f"{(t_ws - noop) / K:.2f} ms/launch")
    print(f"words build block-major (lane shifts + block concats): "
          f"{(t_wb - noop) / K:.2f} ms/launch", flush=True)

    # ---- block-major bitpack: change bits -> 2 i32 words per block ----
    ch_bm = jnp.asarray((rng.rand(B ** 3, 64) < 0.1).astype(np.float32))
    wlo = np.zeros((64, 4), np.float32)  # 16-bit groups, f32-exact
    for i in range(64):
        wlo[i, i // 16] = 2.0 ** (i % 16)
    wlo_d = jnp.asarray(wlo)

    @jax.jit
    def pack_bm(ch):
        g = jnp.dot(ch, wlo_d, preferred_element_type=jnp.float32)
        gi = g.astype(jnp.int32)
        return (gi[:, 0] | (gi[:, 1] << 16), gi[:, 2] | (gi[:, 3] << 16))

    t_pb = chain(lambda: pack_bm(ch_bm), (),
                 jax.jit(lambda w: jnp.sum(w[0][::997] + w[1][::997])))
    print(f"bitpack block-major ([B^3,64] @ [64,4] f32 dot): "
          f"{(t_pb - noop) / K:.2f} ms/launch")


if __name__ == "__main__":
    main()
