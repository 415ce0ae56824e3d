"""On-chip stage attribution for the one-program seq serving step.

Times (chained-marginal methodology, bench.py) each stage of
ops/prep_jax.py at the headline config so optimization goes where the
milliseconds are:

  count      — grouped_counts_cols alone on prebuilt streams (floor)
  hash       — packing + splitmix64 + window min + tile/slot derivation
  dup        — + the [B, NK, NK] distinct-kmer pass
  group      — + run grouping scalars (cumsum/cummax)
  streams    — + utile/gmask one-hot build (full prep)
  full       — prep + count fused (the product program)
  mxu        — full, with the gmask build reformulated as two bf16
               batched matmuls accumulated in f32 (E[b,u,k] x
               smj[b,j,k]) instead of the [B, U*r, NK] one-hot sum

RUN THIS ALONE — concurrent CPU load skews the relay timings
(2026-08-20: bench numbers moved 2-3x under a co-running CPU job).
"""

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bigsi_tpu.hashing.scheme import MINIMIZER_SEED  # noqa: E402
from bigsi_tpu.ops import prep_jax as P  # noqa: E402
from bigsi_tpu.ops.lookup import grouped_counts_cols  # noqa: E402

B, K, KLEN, H, TR = 256, 512, 31, 3, 16
W19, R19 = 19, 20
M = 25_000_000
T16 = M // TR
S19 = KLEN - W19 + 1
U_CAP = 96
N = 1024
CHAIN, REPEATS = 9, 5


def prep_stages(seqs, lens, upto):
    """Re-derivation of prep_streams_device, truncatable per stage."""
    k, s, num_tiles, h, tile_rows, r, u_cap = (
        KLEN, S19, T16, H, TR, R19, U_CAP,
    )
    b, l = seqs.shape
    w = k - s + 1
    nk = l - k + 1
    ns = l - s + 1
    codes = P.byte_codes(seqs)
    ccodes = P.byte_comp_codes(seqs)
    fwd = P._pack_windows(codes, k, nk)
    rc = P._pack_windows_rc(ccodes, k, nk)
    canon = P.u64_min(fwd, rc)
    hv = P.splitmix64_jax(canon)
    sm = None
    for j in range(h):
        sh = 6 * j
        if sh == 0:
            field = hv[1]
        elif sh < 32:
            field = (hv[1] >> sh) | (hv[0] << (32 - sh))
        else:
            field = hv[0] >> (sh - 32)
        bit = P._c(1) << (field & P._c(tile_rows - 1))
        sm = bit if sm is None else sm | bit
    sf = P._pack_windows(codes, s, ns)
    sr = P._pack_windows_rc(ccodes, s, ns)
    canon_s = P.u64_min(sf, sr)
    whash = P.splitmix64_jax(
        (canon_s[0] ^ P._c(0), canon_s[1] ^ P._c(MINIMIZER_SEED))
    )
    mn = P._sliding_min_u64(whash, w)
    tile = P.u64_mod_const(mn, num_tiles).astype(jnp.int32)
    iota = jnp.arange(nk, dtype=jnp.int32)[None, :]
    valid = iota < (lens[:, None] - (k - 1))
    if upto == "hash":
        return tile.sum() + sm.sum()
    if upto in ("dup_sort", "streams_sortdup"):
        # sort-based distinct pass: lexicographic sort of (hi, lo),
        # adjacent-equal flags, scatter back by original index
        big = P._c(0xFFFFFFFF)
        shi = jnp.where(valid, fwd[0], big)
        slo = jnp.where(valid, fwd[1], iota.astype(jnp.uint32))
        o_hi, o_lo, o_idx = jax.lax.sort(
            (shi, slo, jnp.broadcast_to(iota, (b, nk))),
            dimension=1, num_keys=2, is_stable=True,
        )
        d_sorted = jnp.concatenate(
            [
                jnp.zeros((b, 1), bool),
                (o_hi[:, 1:] == o_hi[:, :-1])
                & (o_lo[:, 1:] == o_lo[:, :-1]),
            ],
            axis=1,
        )
        dup = (
            jnp.zeros((b, nk), bool)
            .at[jnp.arange(b)[:, None], o_idx]
            .set(d_sorted)
        ) & valid
    else:
        eq = (fwd[0][:, :, None] == fwd[0][:, None, :]) & (
            fwd[1][:, :, None] == fwd[1][:, None, :]
        )
        earlier = iota[:, :, None] > iota[:, None, :]
        dup = jnp.any(eq & earlier & valid[:, None, :], axis=2) & valid
    if upto == "dup_sort":
        upto = "dup"
    appended = valid & ~dup
    n_valid = appended.sum(axis=1, dtype=jnp.int32)
    sm = jnp.where(appended, sm, P._c(0))
    if upto == "dup":
        return n_valid.sum() + sm.sum()
    prev_tile = jnp.concatenate(
        [jnp.full((b, 1), -1, jnp.int32), tile[:, :-1]], axis=1
    )
    new_run = valid & ((iota == 0) | (tile != prev_tile))
    run_start = jax.lax.cummax(
        jnp.where(new_run, iota, jnp.int32(-1)), axis=1
    )
    pos = iota - run_start
    new_entry = valid & (new_run | (pos % r == 0))
    entry = jnp.cumsum(new_entry.astype(jnp.int32), axis=1) - 1
    slot = pos % r
    if upto == "group":
        return entry.sum() + slot.sum() + n_valid.sum()
    u_iota = jnp.arange(u_cap, dtype=jnp.int32)
    is_open = new_entry[:, None, :] & (
        entry[:, None, :] == u_iota[None, :, None]
    )
    utile = (is_open * tile[:, None, :]).sum(axis=2).astype(jnp.int32)
    if upto == "mxu":
        # E[b, u, k] one-hot over entries (bf16), smj[b, j, k] slot-
        # masked sm split into bytes; two MXU matmuls, f32 accumulate
        ev = (entry[:, None, :] == u_iota[None, :, None]) & valid[:, None, :]
        e_bf = ev.astype(jnp.bfloat16)
        j_iota = jnp.arange(r, dtype=jnp.int32)
        sel = (slot[:, None, :] == j_iota[None, :, None]) & valid[
            :, None, :
        ]
        lo = jnp.where(sel, (sm & P._c(0xFF))[:, None, :], P._c(0))
        hi = jnp.where(sel, (sm >> 8)[:, None, :], P._c(0))
        glo = jnp.einsum(
            "buk,bjk->buj", e_bf, lo.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        ghi = jnp.einsum(
            "buk,bjk->buj", e_bf, hi.astype(jnp.bfloat16),
            preferred_element_type=jnp.float32,
        )
        gmask = (
            glo.astype(jnp.uint32) | (ghi.astype(jnp.uint32) << 8)
        )
        return utile, gmask, n_valid
    if upto in ("gatherg", "streams_gatherg"):
        # gather formulation: entry start positions via compare-sum
        # (valid positions are a prefix, entry is nondecreasing), then
        # ONE take_along_axis of [B, U*r] slots — replaces the
        # [B, U*r, NK] one-hot sum
        estart = jnp.sum(
            valid[:, None, :]
            & (entry[:, None, :] < u_iota[None, :, None]),
            axis=2,
            dtype=jnp.int32,
        )  # [B, U]
        elen = jnp.sum(
            (valid[:, None, :] & (entry[:, None, :] == u_iota[None, :, None])),
            axis=2,
            dtype=jnp.int32,
        )  # [B, U]
        j_iota = jnp.arange(r, dtype=jnp.int32)
        kidx = estart[:, :, None] + j_iota[None, None, :]  # [B, U, r]
        sm_pad = jnp.concatenate(
            [sm, jnp.zeros((b, r), dtype=sm.dtype)], axis=1
        )
        gathered = jnp.take_along_axis(
            sm_pad, kidx.reshape(b, u_cap * r), axis=1
        ).reshape(b, u_cap, r)
        gmask = jnp.where(
            j_iota[None, None, :] < elen[:, :, None], gathered, 0
        ).astype(jnp.uint32)
        return utile, gmask, n_valid
    key = jnp.where(valid, entry * r + slot, jnp.int32(-1))
    x_iota = jnp.arange(u_cap * r, dtype=jnp.int32)
    onehot = key[:, None, :] == x_iota[None, :, None]
    gmask = (
        (onehot * sm.astype(jnp.uint16)[:, None, :])
        .sum(axis=2, dtype=jnp.uint16)
        .astype(jnp.uint32)
    ).reshape(b, u_cap, r)
    if upto in ("streams", "streams_sortdup"):
        return utile, gmask, n_valid
    raise ValueError(upto)


def main():
    rng = np.random.default_rng(0)
    L = K + KLEN - 1
    LB = ((L + 63) // 64) * 64
    seqs = np.full((B, LB), ord("A"), dtype=np.uint8)
    seqs[:, :L] = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=(B, L))
    ]
    lens = np.full(B, L, dtype=np.int32)
    dev = jax.devices()[0]
    seq_d = jax.device_put(seqs, dev)
    lens_d = jax.device_put(lens, dev)
    cols = jax.jit(
        lambda k_: jax.random.bits(k_, (T16, N), jnp.uint16), device=dev
    )(jax.random.PRNGKey(3))

    def timed(fn, args):
        out = fn(*args)
        jax.tree.map(lambda a: np.asarray(a).reshape(-1)[0], out)
        ts = []
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            out = fn(*args)
            jax.tree.map(lambda a: np.asarray(a).reshape(-1)[0], out)
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def marginal(make):
        t1 = timed(*make(1))
        tn = timed(*make(CHAIN))
        return max((tn - t1) / (CHAIN - 1), 1e-9)

    def chained(stage, with_count):
        def make(nsteps):
            @jax.jit
            def f(cols_, sq, ln):
                def body(carry, _):
                    sq2 = jnp.roll(sq, carry, axis=1)
                    out = prep_stages(sq2, ln, stage)
                    if with_count:
                        utile, gmask, n_valid = out
                        counts = grouped_counts_cols(
                            cols_, utile, gmask, n_valid
                        )
                        return (counts[0, 0] & jnp.int32(7)) + 1, ()
                    tot = (
                        out
                        if not isinstance(out, tuple)
                        else out[0].sum() + out[1].sum()
                    )
                    return (tot.astype(jnp.int32) & jnp.int32(7)) + 1, ()

                carry, _ = jax.lax.scan(
                    body, jnp.int32(0), None, length=nsteps
                )
                return carry.reshape(1)

            return f, (cols, seq_d, lens_d)

        return make

    # count floor on prebuilt streams
    from bigsi_tpu import native

    flat = np.ascontiguousarray(seqs[:, :L].reshape(-1))
    sstart = np.arange(B + 1, dtype=np.int64) * L
    ut, gm, nv = native.prep_minimizer_v3_seqs(
        flat, sstart, KLEN, S19, MINIMIZER_SEED, T16, H, TR, R19
    )
    ut_d, gm_d, nv_d = (
        jax.device_put(ut, dev),
        jax.device_put(gm.astype(np.uint32), dev),
        jax.device_put(nv, dev),
    )

    def make_count(nsteps):
        @jax.jit
        def f(cols_, utile, gmask, n_valid):
            def body(carry, _):
                u2 = (utile + carry) % T16
                counts = grouped_counts_cols(cols_, u2, gmask, n_valid)
                return (counts[0, 0] & jnp.int32(7)) + 1, ()

            carry, _ = jax.lax.scan(body, jnp.int32(0), None, length=nsteps)
            return carry.reshape(1)

        return f, (cols, ut_d, gm_d, nv_d)

    print("count-only (native streams): %.3f ms" % (marginal(make_count) * 1e3))
    for stage in ("hash", "dup", "dup_sort", "group", "streams"):
        dt = marginal(chained(stage, with_count=False))
        print("prep upto %-8s: %.3f ms" % (stage, dt * 1e3))
    dt = marginal(chained("gatherg", with_count=False))
    print("prep-gatherg (prep only) : %.3f ms" % (dt * 1e3))
    for stage, label in (
        ("streams", "full"),
        ("streams_gatherg", "full-gatherg"),
    ):
        dt = marginal(chained(stage, with_count=True))
        print("%-13s prep+count: %.3f ms" % (label, dt * 1e3))


if __name__ == "__main__":
    main()
