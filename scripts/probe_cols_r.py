#!/usr/bin/env python
"""Chip probe: cols16 step time vs entry-pack r, split factor, window.

The cols gather is issue-bound (~linear in U, scripts/probe_r3.py), so
the question is how far U drops with r = 11/12 (no spills at w=11) and
with a longer minimizer window, and whether more split chains overlap
better.  Run on the real chip; writes findings to stdout.
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bigsi_tpu import native
from bigsi_tpu.hashing.scheme import MINIMIZER_SEED, default_minimizer_s

B, K, KLEN, H, TR16 = 256, 512, 31, 3, 16
M = 25_000_000
T16 = M // TR16
CHAIN = 9
REPEATS = 3

dev = jax.devices()[0]
rng = np.random.default_rng(0)
seqs = np.frombuffer(b"ACGT", dtype=np.uint8)[
    rng.integers(0, 4, size=(B, K + KLEN - 1))
]
kmers = np.ascontiguousarray(
    np.concatenate(
        [np.lib.stride_tricks.sliding_window_view(q, KLEN) for q in seqs]
    )
)
qstart = np.arange(B + 1, dtype=np.int64) * K

cols16 = jax.jit(lambda k: jax.random.bits(k, (T16, 1024), jnp.uint16), device=dev)(
    jax.random.PRNGKey(3)
)


def counts_cols_split(cols, utile, gmask, n_valid, nsplit):
    b, u = utile.shape
    gm = gmask.astype(cols.dtype)
    bounds = [u * i // nsplit for i in range(nsplit + 1)]
    counts = None
    for a, z in zip(bounds[:-1], bounds[1:]):
        if a == z:
            continue
        g = jnp.take(cols, utile[:, a:z].reshape(-1), axis=0).reshape(
            b, z - a, -1
        )
        part = None
        for j in range(gmask.shape[2]):
            gmj = gm[:, a:z, j][:, :, None]
            pj = ((g & gmj) == gmj).astype(jnp.int32)
            part = pj if part is None else part + pj
        s = part.sum(axis=1, dtype=jnp.int32)
        counts = s if counts is None else counts + s
    pad = jnp.int32(u * gmask.shape[2]) - n_valid.astype(jnp.int32)
    return counts - pad[:, None]


def timed(fn, args):
    out = fn(*args)
    np.asarray(out)[0]
    ts = []
    for _ in range(REPEATS):
        t0 = time.perf_counter()
        out = fn(*args)
        np.asarray(out)[0]
        ts.append(time.perf_counter() - t0)
    return min(ts)


def marginal(make):
    t1 = timed(*make(1))
    tn = timed(*make(CHAIN))
    return max((tn - t1) / (CHAIN - 1), 1e-9)


def probe(r, nsplit, window=None, gm_dtype=np.uint32):
    s = KLEN - window + 1 if window else default_minimizer_s(KLEN)
    out = native.prep_minimizer_v2(
        kmers, qstart, s, MINIMIZER_SEED, T16, H, TR16, r
    )
    ut, gm, nv = out
    gm = gm.astype(gm_dtype)
    ut_d = jax.device_put(ut, dev)
    gm_d = jax.device_put(gm, dev)
    nv_d = jax.device_put(nv, dev)

    def make(nsteps):
        @jax.jit
        def f(cols, utile, gmask, n_valid):
            def body(carry, _):
                u2 = (utile + carry) % T16
                counts = counts_cols_split(cols, u2, gmask, n_valid, nsplit)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (cols16, ut_d, gm_d, nv_d)

    dt = marginal(make)
    rows = B * K * H
    print(
        "r=%2d split=%d window=%s gm=%s U=%3d: %.3f ms/step (%.0f Mrows/s)"
        % (
            r, nsplit, window or 11, np.dtype(gm_dtype).name, ut.shape[1],
            dt * 1e3, rows / dt / 1e6,
        ),
        flush=True,
    )
    return dt


if __name__ == "__main__":
    probe(6, 2)   # current production shape (bench r3 baseline)
    probe(12, 2)  # no spills at w=11
    probe(12, 4)
    probe(12, 1)
    probe(12, 2, gm_dtype=np.uint16)
    probe(16, 2)
    probe(12, 2, window=15)
    probe(16, 2, window=15)
    probe(12, 2, window=19)
