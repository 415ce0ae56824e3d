"""On-device serving prep (ops/prep_jax.py) vs the native C prep and
the numpy v3 oracle.  Runs on CPU via the conftest JAX_PLATFORMS pin —
the device prep is pure jnp, so CPU execution covers its semantics."""

import numpy as np
import pytest

from bigsi_tpu import native
from bigsi_tpu.hashing.scheme import (
    MINIMIZER_SEED,
    minimizer_tiles,
    slot_hashes_v3,
)
from bigsi_tpu.ops.prep_jax import (
    prep_streams_device,
    splitmix64_jax,
    u64_mod_const,
)

BASES = np.frombuffer(b"ACGT", dtype=np.uint8)


def _rand_seqs(rng, b, l):
    return BASES[rng.integers(0, 4, size=(b, l))]


def test_splitmix64_pair_matches_numpy():
    from bigsi_tpu.hashing.scheme import splitmix64

    rng = np.random.default_rng(0)
    vals = rng.integers(0, 2 ** 64, size=257, dtype=np.uint64)
    want = splitmix64(vals)
    import jax.numpy as jnp

    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray(vals.astype(np.uint32))
    got_hi, got_lo = splitmix64_jax((hi, lo))
    got = (np.asarray(got_hi).astype(np.uint64) << np.uint64(32)) | np.asarray(
        got_lo
    ).astype(np.uint64)
    assert np.array_equal(got, want)


@pytest.mark.parametrize("d", [1, 3, 7, 16, 1562500, (1 << 28) - 1, 1 << 20])
def test_u64_mod_const(d):
    rng = np.random.default_rng(d)
    vals = rng.integers(0, 2 ** 64, size=64, dtype=np.uint64)
    import jax.numpy as jnp

    hi = jnp.asarray((vals >> np.uint64(32)).astype(np.uint32))
    lo = jnp.asarray(vals.astype(np.uint32))
    got = np.asarray(u64_mod_const((hi, lo), d)).astype(np.uint64)
    assert np.array_equal(got, vals % np.uint64(d))


@pytest.mark.skipif(not native.available(), reason="native lib required")
@pytest.mark.parametrize(
    "window,r", [(19, 20), (11, 12), (15, 16)]
)
def test_device_prep_matches_native_seq_prep(window, r):
    """Dup-free random streams: stream tensors must be IDENTICAL."""
    rng = np.random.default_rng(42 + window)
    b, k, h, tr = 8, 31, 3, 16
    kq = 96
    l = kq + k - 1
    s = k - window + 1
    num_tiles = 1_562_500
    seqs = _rand_seqs(rng, b, l)
    lens = np.full(b, l, dtype=np.int32)
    # one short query exercises the valid mask
    lens[3] = k + 17
    seqs[3, lens[3]:] = ord("A")  # padding bytes (any value works)

    flat = np.concatenate([seqs[i, : lens[i]] for i in range(b)])
    sstart = np.zeros(b + 1, dtype=np.int64)
    np.cumsum([int(x) for x in lens], out=sstart[1:])
    want = native.prep_minimizer_v3_seqs(
        flat, sstart, k, s, MINIMIZER_SEED, num_tiles, h, tr, r
    )
    assert want is not None
    wu, wg, wn = want

    utile, gmask, n_valid, ok = prep_streams_device(
        seqs, lens, k=k, s=s, num_tiles=num_tiles, h=h, tile_rows=tr,
        r=r, u_cap=kq, seed=MINIMIZER_SEED,
    )
    utile, gmask, n_valid = map(np.asarray, (utile, gmask, n_valid))
    assert bool(ok)
    assert np.array_equal(n_valid, wn)
    u = wu.shape[1]
    assert np.array_equal(utile[:, :u], wu)
    assert np.array_equal(gmask[:, :u], wg)
    assert (utile[:, u:] == 0).all() and (gmask[:, u:] == 0).all()


def test_device_prep_matches_numpy_oracle_tiles_slots():
    """Cross-check tiles/slot masks against the scheme.py v3 oracle
    (independent of the native lib)."""
    rng = np.random.default_rng(7)
    b, k, h, tr = 4, 31, 3, 16
    kq = 40
    l = kq + k - 1
    window = 19
    s = k - window + 1
    num_tiles = 4096 + 3  # non-power-of-two modulus
    seqs = _rand_seqs(rng, b, l)
    lens = np.full(b, l, dtype=np.int32)

    utile, gmask, n_valid, ok = prep_streams_device(
        seqs, lens, k=k, s=s, num_tiles=num_tiles, h=h, tile_rows=tr,
        r=window + 1, u_cap=kq, seed=MINIMIZER_SEED,
    )
    assert bool(ok)
    # oracle per query: tiles of sliding k-mers + slot masks
    for q in range(b):
        km = np.lib.stride_tricks.sliding_window_view(seqs[q], k)
        km = np.ascontiguousarray(km)
        tiles = minimizer_tiles(km, num_tiles, s, scheme=3)
        slots = slot_hashes_v3(km, h, tr)
        smask = np.bitwise_or.reduce(
            np.uint32(1) << slots.astype(np.uint32), axis=1
        )
        # replay the grouping (no dups in random data at this size)
        assert len(set(map(bytes, km))) == km.shape[0]
        r = window + 1
        exp_ut, exp_gm = [], []
        cur, slot = None, r
        for i in range(km.shape[0]):
            t = int(tiles[i])
            if cur != t or slot == r:
                exp_ut.append(t)
                exp_gm.append([0] * r)
                cur, slot = t, 0
            exp_gm[-1][slot] = int(smask[i])
            slot += 1
        got_u = np.asarray(utile)[q, : len(exp_ut)]
        got_g = np.asarray(gmask)[q, : len(exp_ut)]
        assert got_u.tolist() == exp_ut
        assert got_g.tolist() == exp_gm
        assert int(np.asarray(n_valid)[q]) == km.shape[0]


def test_device_prep_dedup_counts_match_kernel():
    """With duplicate k-mers the device prep keeps dup slots (zeroed
    mask) while the native prep skips them — stream layouts differ but
    kernel COUNTS must agree, and n_valid must count distinct."""
    import jax

    from bigsi_tpu.ops.lookup import grouped_counts_cols

    rng = np.random.default_rng(3)
    b, k, h, tr = 2, 31, 3, 16
    kq = 64
    l = kq + k - 1
    window, r = 19, 20
    s = k - window + 1
    num_tiles = 2048
    seqs = _rand_seqs(rng, b, l)
    # plant a duplicate k-mer inside query 0
    seqs[0, 40 : 40 + k] = seqs[0, 0:k]
    lens = np.full(b, l, dtype=np.int32)

    utile, gmask, n_valid, ok = prep_streams_device(
        seqs, lens, k=k, s=s, num_tiles=num_tiles, h=h, tile_rows=tr,
        r=r, u_cap=kq, seed=MINIMIZER_SEED,
    )
    assert bool(ok)
    n_valid = np.asarray(n_valid)
    assert n_valid[0] < kq  # dup removed from the distinct count

    n = 128
    cols = jax.numpy.asarray(
        rng.integers(0, 1 << 16, size=(num_tiles, n), dtype=np.uint16)
    )
    got = np.asarray(
        grouped_counts_cols(
            cols, jax.numpy.asarray(np.asarray(utile)),
            jax.numpy.asarray(np.asarray(gmask)),
            jax.numpy.asarray(n_valid),
        )
    )
    if native.available():
        flat = np.concatenate([seqs[i] for i in range(b)])
        sstart = np.arange(b + 1, dtype=np.int64) * l
        wu, wg, wn = native.prep_minimizer_v3_seqs(
            flat, sstart, k, s, MINIMIZER_SEED, num_tiles, h, tr, r
        )
        assert np.array_equal(wn, n_valid)
        want = np.asarray(
            grouped_counts_cols(
                cols, jax.numpy.asarray(wu), jax.numpy.asarray(wg),
                jax.numpy.asarray(wn),
            )
        )
        assert np.array_equal(got, want)


def test_device_prep_overflow_flag():
    """u_cap smaller than the entry count must flip ok to False."""
    rng = np.random.default_rng(9)
    seqs = _rand_seqs(rng, 2, 80 + 30)
    lens = np.full(2, 110, dtype=np.int32)
    _, _, _, ok = prep_streams_device(
        seqs, lens, k=31, s=21, num_tiles=1 << 20, h=3, tile_rows=16,
        r=4, u_cap=2, seed=MINIMIZER_SEED,
    )
    assert not bool(ok)


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_k32_polyT_dedup_native_and_device_agree():
    """k=32 all-T k-mer: its packed code is 2^64-1, which wrapped the
    native dedup table's fwd+1 sentinel to the empty marker (round-4
    review finding) — both preps must count ONE distinct k-mer."""
    seq = np.full((1, 40), ord("T"), dtype=np.uint8)
    lens = np.array([40], dtype=np.int32)
    k, s, T, h, tr, r = 32, 13, 1024, 3, 16, 21
    out = native.prep_minimizer_v3_seqs(
        seq.reshape(-1), np.array([0, 40], np.int64), k, s,
        MINIMIZER_SEED, T, h, tr, r,
    )
    assert out is not None and out[2][0] == 1
    utile, gmask, n_valid, ok = prep_streams_device(
        seq, lens, k=k, s=s, num_tiles=T, h=h, tile_rows=tr, r=r,
        u_cap=9, seed=MINIMIZER_SEED,
    )
    assert bool(ok)
    assert int(np.asarray(n_valid)[0]) == 1
    u = out[0].shape[1]
    assert np.array_equal(np.asarray(utile)[:, :u], out[0])
    assert np.array_equal(np.asarray(gmask)[:, :u], out[1])


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_device_prep_randomized_parity_sweep():
    """Randomized sweep over (k, window, r, tile_rows, num_tiles,
    lengths, planted dups): device counts must equal native counts via
    the kernel on every draw (streams may differ only in dup-slot
    placement, which the padding correction erases)."""
    import jax.numpy as jnp

    from bigsi_tpu.ops.lookup import grouped_counts_cols

    rng = np.random.default_rng(77)
    for trial in range(12):
        k = int(rng.integers(15, 33))
        window = int(rng.integers(3, min(k, 22)))
        s = k - window + 1
        tr = int(rng.choice([8, 16]))
        h = int(rng.integers(1, 6))
        r = int(rng.integers(2, window + 3))
        num_tiles = int(rng.integers(3, 5000))
        b = int(rng.integers(1, 6))
        lmax = k + int(rng.integers(4, 70))
        seqs = _rand_seqs(rng, b, lmax)
        lens = rng.integers(k - 2, lmax + 1, size=b).astype(np.int32)
        if rng.random() < 0.5 and lens[0] >= k + 2 * k:
            seqs[0, k : 2 * k] = seqs[0, 0:k]  # planted duplicate
        u_cap = lmax - k + 1
        utile, gmask, n_valid, ok = prep_streams_device(
            seqs, lens, k=k, s=s, num_tiles=num_tiles, h=h,
            tile_rows=tr, r=r, u_cap=u_cap, seed=MINIMIZER_SEED,
        )
        assert bool(ok), (trial, k, window)
        flat = np.concatenate([seqs[i, : max(lens[i], 0)] for i in range(b)])
        sstart = np.zeros(b + 1, dtype=np.int64)
        np.cumsum([max(int(x), 0) for x in lens], out=sstart[1:])
        got_native = native.prep_minimizer_v3_seqs(
            flat, sstart, k, s, MINIMIZER_SEED, num_tiles, h, tr, r
        )
        assert got_native is not None, (trial, k, s)
        wu, wg, wn = got_native
        assert np.array_equal(np.asarray(n_valid), wn), (trial, k, window)
        n = 64
        cols = jnp.asarray(
            rng.integers(
                0, 1 << (tr if tr < 16 else 16), size=(num_tiles, n)
            ).astype(np.uint16 if tr == 16 else np.uint8)
        )
        got = np.asarray(grouped_counts_cols(cols, utile, gmask, n_valid))
        want = np.asarray(
            grouped_counts_cols(
                cols, jnp.asarray(wu), jnp.asarray(wg), jnp.asarray(wn)
            )
        )
        assert np.array_equal(got, want), (trial, k, window, tr, r)


@pytest.mark.skipif(not native.available(), reason="native lib required")
def test_device_prep_long_queries_chunked_parity():
    """Queries past PREP_CHUNK k-mers (the old 1024 hard cap): the
    chunked dup/stream passes must still match the native prep exactly.
    Dup-free streams (native compacts dup slots, the device zeroes them
    in place — identical counts, different raw streams; the dup case is
    covered at count level in test_seq_batch_device)."""
    from bigsi_tpu.index.device_engine import DeviceEngine

    rng = np.random.default_rng(17)
    b, k, h, tr, window, r = 2, 31, 3, 16, 19, 20
    l = 2500  # nk = 2470: spans three PREP_CHUNK=1024 chunks
    s = k - window + 1
    num_tiles = 1_562_500
    seqs = _rand_seqs(rng, b, l)
    lens = np.full(b, l, dtype=np.int32)
    lens[1] = 1800
    seqs[1, lens[1]:] = ord("A")

    flat = np.concatenate([seqs[i, : lens[i]] for i in range(b)])
    sstart = np.zeros(b + 1, dtype=np.int64)
    np.cumsum([int(x) for x in lens], out=sstart[1:])
    want = native.prep_minimizer_v3_seqs(
        flat, sstart, k, s, MINIMIZER_SEED, num_tiles, h, tr, r
    )
    assert want is not None
    wu, wg, wn = want

    nk = l - k + 1
    u_cap = DeviceEngine._seq_u_cap(nk, window)
    utile, gmask, n_valid, ok = prep_streams_device(
        seqs, lens, k=k, s=s, num_tiles=num_tiles, h=h, tile_rows=tr,
        r=r, u_cap=u_cap, seed=MINIMIZER_SEED,
    )
    utile, gmask, n_valid = map(np.asarray, (utile, gmask, n_valid))
    assert bool(ok)
    assert np.array_equal(n_valid, wn)
    u = wu.shape[1]
    assert u <= u_cap
    assert np.array_equal(utile[:, :u], wu)
    assert np.array_equal(gmask[:, :u], wg)
