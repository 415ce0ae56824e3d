#!/usr/bin/env python
"""A/B the grouped query path's expansion stage on chip.

Hypothesis: grouped_counts' masked AND-reduce runs on [..., 32, W=32]
arrays; with W=32 the minor dim fills 32 of 128 lanes, so the VPU does
4x redundant register work.  Variants:

  * arith    — current formulation (ops/lookup.py:grouped_counts);
  * fat      — tiles stored vreg-aligned [8, 128] (4 bloom rows side by
               side per sublane row); AND-reduce over 8 full-width fat
               rows, then fold the 4 lane groups;
  * fatcsa   — fat + the csa popcount tree also runs 128 lanes wide
               (4 k-mers' presence words side by side);
  * mxu      — row selection as a one-hot bf16 batched matmul over the
               bitcast tile bytes (MXU does the selection; VPU only
               ANDs h=3 rows and counts).

All variants compute identical counts (verified on-chip at tiny shapes
before timing).  Timing methodology matches bench.py: chained lax.scan
steps, marginal per-step time, min over repeats.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

from bigsi_tpu.ops.lookup import (
    TILE_ROWS,
    build_grouped_streams,
    csa_counts,
    grouped_counts,
)

REPEATS = 3
CHAIN = 9


def timed(fn, args):
    out = fn(*args)
    np.asarray(out).reshape(-1)[0]
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out).reshape(-1)[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make):
    f1, a1 = make(1)
    fn, an = make(CHAIN)
    return max((timed(fn, an) - timed(f1, a1)) / (CHAIN - 1), 1e-9)


def to_fat(tiles):
    """[T, TILE_ROWS*W] row-major -> fat-interleaved, same shape.

    fat[f, gi*W:(gi+1)*W] = rows[gi*F + f]  with F = TILE_ROWS*W/128
    sublane rows and G = 128/W row groups side by side.
    """
    t, rw = tiles.shape
    w = rw // TILE_ROWS
    g = 128 // w
    f = TILE_ROWS // g
    x = tiles.reshape(t, g, f, w)
    x = jnp.transpose(x, (0, 2, 1, 3))
    return x.reshape(t, rw)


def fat_presence(tiles_fat, utile, gmask, w):
    b, u = utile.shape
    r = gmask.shape[2]
    g = 128 // w
    f = TILE_ROWS // g
    gt = jnp.take(tiles_fat, utile.reshape(-1), axis=0).reshape(b, u, f, g * w)
    lane = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, f, g * w), 4)
    fi = jax.lax.broadcasted_iota(jnp.uint32, (1, 1, 1, f, g * w), 3)
    rowid = (lane // jnp.uint32(w)) * jnp.uint32(f) + fi
    sel = (gmask[:, :, :, None, None] >> rowid) & jnp.uint32(1)
    masked = gt[:, :, None, :, :] | (sel - jnp.uint32(1))
    part = jax.lax.reduce(
        masked, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
    )  # [b, u, r, g*w]
    part = part.reshape(b, u, r, g, w)
    presence = jax.lax.reduce(
        part, jnp.uint32(0xFFFFFFFF), jax.lax.bitwise_and, (3,)
    )  # [b, u, r, w]
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    return rows


def grouped_fat(tiles_fat, utile, gmask, w):
    return csa_counts(fat_presence(tiles_fat, utile, gmask, w), axis=1)


def grouped_fatcsa(tiles_fat, utile, gmask, w):
    rows = fat_presence(tiles_fat, utile, gmask, w)
    b, n, _ = rows.shape
    g = 128 // w
    pad = (-n) % g
    if pad:
        rows = jnp.pad(rows, ((0, 0), (0, pad), (0, 0)))
    wide = rows.reshape(b, (n + pad) // g, g * w)
    counts = csa_counts(wide, axis=1)  # [b, g*w*32]
    return counts.reshape(b, g, w * 32).sum(axis=1)


def grouped_mxu(tiles, utile, gmask, uslot, w):
    b, u = utile.shape
    r, h = uslot.shape[2], uslot.shape[3]
    gt = jnp.take(tiles, utile.reshape(-1), axis=0).reshape(
        b * u, TILE_ROWS, w
    )
    gb = jax.lax.bitcast_convert_type(gt, jnp.uint8).reshape(
        b * u, TILE_ROWS, w * 4
    )
    onehot = (
        uslot.reshape(b * u, r * h)[:, :, None]
        == jax.lax.broadcasted_iota(jnp.int32, (1, 1, TILE_ROWS), 2)
    )
    sel = jax.lax.dot_general(
        onehot.astype(jnp.bfloat16),
        gb.astype(jnp.bfloat16),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )  # [b*u, r*h, w*4] — exact: one-hot picks a single byte value <=255
    by = sel.astype(jnp.uint8).reshape(b, u, r, h, w, 4)
    words = jax.lax.bitcast_convert_type(by, jnp.uint32)  # [b,u,r,h,w]
    presence = words[:, :, :, 0, :]
    for j in range(1, h):
        presence = presence & words[:, :, :, j, :]
    valid = (gmask != 0)[..., None]
    rows = jnp.where(valid, presence, jnp.uint32(0)).reshape(b, u * r, w)
    return csa_counts(rows, axis=1)


def make_inputs(rng, T, B, K, H, RUN, r):
    run_tiles = rng.integers(0, T, size=(B, (K + RUN - 1) // RUN)).astype(
        np.int32
    )
    tidx = np.repeat(run_tiles, RUN, axis=1)[:, :K]
    slots = rng.integers(0, TILE_ROWS, size=(B, K, H)).astype(np.int32)
    sm = np.bitwise_or.reduce(
        np.uint32(1) << slots.astype(np.uint32), axis=2
    )
    utile, gmask, uslot = build_grouped_streams(tidx, sm, r=r, slots=slots)
    return utile, gmask, uslot


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    on_tpu = dev.platform != "cpu"
    M = 25_000_000 if on_tpu else 512_000
    N = 1024
    W = N // 32
    B = 256 if on_tpu else 4
    K = 512 if on_tpu else 32
    H = 3
    RUN = 6
    T = M // TILE_ROWS
    rng = np.random.default_rng(0)

    tiles = jax.jit(
        lambda k: jax.random.bits(k, (T, TILE_ROWS * W), jnp.uint32),
        device=dev,
    )(jax.random.PRNGKey(0))
    tiles_fat = jax.jit(to_fat, device=dev)(tiles)

    # ---- verify all variants agree at tiny shapes ----
    vt = 64
    vu, vg, vs = make_inputs(np.random.default_rng(1), vt, 4, 24, H, RUN, 6)
    small = np.asarray(tiles[:vt])
    ref = np.asarray(
        grouped_counts(jnp.asarray(small), jnp.asarray(vu), jnp.asarray(vg))
    )
    got_fat = np.asarray(
        grouped_fat(
            jnp.asarray(np.asarray(to_fat(jnp.asarray(small)))),
            jnp.asarray(vu),
            jnp.asarray(vg),
            W,
        )
    )
    got_fc = np.asarray(
        grouped_fatcsa(
            jnp.asarray(np.asarray(to_fat(jnp.asarray(small)))),
            jnp.asarray(vu),
            jnp.asarray(vg),
            W,
        )
    )
    got_mx = np.asarray(
        grouped_mxu(
            jnp.asarray(small),
            jnp.asarray(vu),
            jnp.asarray(vg),
            jnp.asarray(vs),
            W,
        )
    )
    assert (ref == got_fat).all(), "fat mismatch"
    assert (ref == got_fc).all(), "fatcsa mismatch"
    assert (ref == got_mx).all(), "mxu mismatch"
    print("verify OK (fat, fatcsa, mxu == grouped)", flush=True)

    # ---- timing at bench config ----
    rows_per_step = B * K * H

    def bench_variant(name, fn, args, T):
        def make(nsteps):
            @jax.jit
            def f(*a):
                def body(carry, _):
                    a2 = ((a[1] + carry) % T,)
                    counts = fn(a[0], a2[0], *a[2:])
                    return (counts[0, 0] & jnp.int32(7)) + 1, ()

                carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
                return carry.reshape(1)

            return f, args

        dt = marginal(make)
        print(
            "%-8s %8.3f ms/step  %8.1f Mrows/s"
            % (name, dt * 1e3, rows_per_step / dt / 1e6),
            flush=True,
        )
        return dt

    u6, g6, s6 = make_inputs(rng, T, B, K, H, RUN, 6)
    u12, g12, s12 = make_inputs(rng, T, B, K, H, RUN, 12)
    du6 = jax.device_put(u6, dev)
    dg6 = jax.device_put(g6, dev)
    ds6 = jax.device_put(s6, dev)
    du12 = jax.device_put(u12, dev)
    dg12 = jax.device_put(g12, dev)

    bench_variant("arith", lambda t, u, g: grouped_counts(t, u, g), (tiles, du6, dg6), T)
    bench_variant(
        "fat", lambda t, u, g: grouped_fat(t, u, g, W), (tiles_fat, du6, dg6), T
    )
    bench_variant(
        "fatcsa",
        lambda t, u, g: grouped_fatcsa(t, u, g, W),
        (tiles_fat, du6, dg6),
        T,
    )
    bench_variant(
        "fatcsa12",
        lambda t, u, g: grouped_fatcsa(t, u, g, W),
        (tiles_fat, du12, dg12),
        T,
    )
    bench_variant(
        "mxu",
        lambda t, u, g, s: grouped_mxu(t, u, g, s, W),
        (tiles, du6, dg6, ds6),
        T,
    )


if __name__ == "__main__":
    main()
