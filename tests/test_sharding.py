"""Sharded query step on the 8-virtual-device CPU mesh: parity with the
host oracle across dp/kmer/sample parallel axis layouts."""

import numpy as np
import pytest
import jax

from bigsi_tpu.index.host_engine import HostEngine
from bigsi_tpu.matrix.bitmatrix import BitSliceMatrix
from bigsi_tpu.parallel.sharding import (
    MeshEngine,
    factor_devices,
    make_mesh,
    make_sharded_query_step,
    shard_matrix,
)


def test_factor_devices():
    assert factor_devices(1) == (1, 1, 1)
    d, k, s = factor_devices(8)
    assert d * k * s == 8 and s >= d >= k
    assert factor_devices(8)[2] == 8  # all-samples by default scoring
    d, k, s = factor_devices(6)
    assert d * k * s == 6


def random_matrix(rng, m, n):
    blooms = [rng.random(m) < 0.3 for _ in range(n)]
    return BitSliceMatrix.create(blooms, m, n)


@pytest.mark.parametrize("axes", [(1, 1, 8), (2, 1, 4), (2, 2, 2), (8, 1, 1), (1, 8, 1)])
def test_sharded_step_parity(axes):
    assert len(jax.devices()) >= 8, "conftest must provide 8 virtual devices"
    rng = np.random.default_rng(7)
    m, n, h = 500, 1000, 3
    mat = random_matrix(rng, m, n)
    host = HostEngine(mat)
    mesh = make_mesh(8, axes)
    step = make_sharded_query_step(mesh, h)
    words = shard_matrix(mat.words, mesh)

    # B and K divisible by every tested axis size (raw step has no padding;
    # MeshEngine does the padding for ragged shapes)
    B, K = 8, 96
    idx = rng.integers(0, m, size=(B, K, h)).astype(np.int32)
    mask = rng.random((B, K)) < 0.9
    counts, exact = step(words, idx, mask)
    counts, exact = np.asarray(counts), np.asarray(exact)

    for b in range(B):
        valid = idx[b][mask[b]]
        hp = host.and_rows(valid)
        expect_counts = host.counts(hp, n)
        assert np.array_equal(counts[b, :n], expect_counts), "counts axes=%s b=%d" % (
            axes,
            b,
        )
        expect_exact = host.exact_colours(hp)
        bits = np.unpackbits(exact[b].view(np.uint8), bitorder="little")
        assert np.array_equal(np.flatnonzero(bits), expect_exact)


def test_mesh_engine_matches_host_engine():
    rng = np.random.default_rng(3)
    mat = random_matrix(rng, 300, 700)
    host = HostEngine(mat)
    mesh_eng = MeshEngine(mat, mesh=make_mesh(8, (2, 2, 2)), h=3)
    row_idx = rng.integers(0, 300, size=(37, 3)).astype(np.int32)

    hp = host.and_rows(row_idx)
    mp = mesh_eng.and_rows(row_idx)
    assert np.array_equal(mesh_eng.exact_colours(mp), host.exact_colours(hp))
    assert np.array_equal(mesh_eng.counts(mp, 700), host.counts(hp, 700))
    assert np.array_equal(
        mesh_eng.presence_matrix(mp, 700), host.presence_matrix(hp, 700)
    )


def test_mesh_engine_batch():
    rng = np.random.default_rng(4)
    mat = random_matrix(rng, 200, 256)
    host = HostEngine(mat)
    eng = MeshEngine(mat, mesh=make_mesh(8, (4, 1, 2)), h=2)
    queries = [rng.integers(0, 200, size=(k, 2)).astype(np.int32) for k in (5, 31, 64, 7, 100)]
    counts, exact = eng.query_batch(queries)
    assert counts.shape[0] == len(queries)
    for i, q in enumerate(queries):
        hp = host.and_rows(q)
        assert np.array_equal(counts[i, :256], host.counts(hp, 256))


def test_mesh_engine_counts_batch_parity():
    rng = np.random.default_rng(11)
    m, n, h = 500, 900, 3
    mat = random_matrix(rng, m, n)
    host = HostEngine(mat)
    eng = MeshEngine(mat, mesh=make_mesh(8, (2, 2, 2)))
    B, K = 5, 70  # ragged: engine pads to mesh-divisible buckets
    idx = rng.integers(0, m, size=(B, K, h)).astype(np.int32)
    mask = rng.random((B, K)) < 0.85
    got = eng.counts_batch(idx, mask, n)
    want = host.counts_batch(idx, mask, n)
    assert np.array_equal(got, want)


def test_search_batch_on_mesh_engine():
    """engine=mesh end-to-end: search_batch == per-query search."""
    import random

    from bigsi_tpu import BIGSI
    from bigsi_tpu.storage import get_storage

    cfg = {
        "storage-engine": "memory",
        "storage-config": {"filename": "mesh-sb"},
        "k": 9,
        "m": 2048,
        "h": 3,
        "engine": "mesh",
        "mesh": [2, 2, 2],
    }
    get_storage(cfg).delete_all()
    rng = random.Random(13)
    seqs = ["".join(rng.choice("ACGT") for _ in range(50)) for _ in range(3)]
    blooms = [
        BIGSI.bloom(cfg, [s[i : i + 9] for i in range(len(s) - 8)]) for s in seqs
    ]
    bigsi = BIGSI.build(cfg, blooms, ["s0", "s1", "s2"])
    queries = [seqs[0], seqs[1][:30], seqs[2]]
    assert bigsi.search_batch(queries, 0.5) == [
        bigsi.search(q, 0.5) for q in queries
    ]


def test_sharded_grouped_step_matches_blocked():
    """Grouped tile-dedup over a (d, 1, s) mesh == single-device blocked."""
    import jax.numpy as jnp

    from bigsi_tpu.ops.lookup import (
        TILE_ROWS,
        blocked_counts,
        build_grouped_streams,
    )
    from bigsi_tpu.parallel.sharding import make_sharded_grouped_step, shard_tiles

    rng = np.random.default_rng(17)
    T, W, B, K = 19, 8, 4, 30
    tiles = rng.integers(0, 2 ** 32, size=(T, TILE_ROWS * W), dtype=np.uint32)
    tile = rng.integers(0, T, size=(B, K)).astype(np.int32)
    tile[:, 1:9] = tile[:, 0:1]  # minimizer-style runs
    slots = rng.integers(0, TILE_ROWS, size=(B, K, 3)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    smask[rng.random((B, K)) < 0.2] = 0

    utile, gmask = build_grouped_streams(tile, smask)
    mesh = make_mesh(8, (2, 1, 4))
    step = make_sharded_grouped_step(mesh)
    tiles3 = shard_tiles(tiles, mesh)
    got = np.asarray(step(tiles3, utile, gmask))
    want = np.asarray(
        blocked_counts(
            jnp.asarray(tiles), jnp.asarray(tile), jnp.asarray(smask),
            jnp.asarray(smask != 0),
        )
    )
    assert np.array_equal(got, want)


def test_search_batch_on_mesh_engine_minimizer():
    """engine=mesh + minimizer layout routes through the grouped step."""
    import random

    from bigsi_tpu import BIGSI
    from bigsi_tpu.storage import get_storage

    cfg = {
        "storage-engine": "memory",
        "storage-config": {"filename": "mesh-min-sb"},
        "k": 9,
        "m": 2048,
        "h": 3,
        "layout": "minimizer",
        "engine": "mesh",
        "mesh": [2, 1, 4],
    }
    get_storage(cfg).delete_all()
    rng = random.Random(23)
    seqs = ["".join(rng.choice("ACGT") for _ in range(45)) for _ in range(3)]
    blooms = [
        BIGSI.bloom(cfg, [s[i : i + 9] for i in range(len(s) - 8)]) for s in seqs
    ]
    bigsi = BIGSI.build(cfg, blooms, ["s0", "s1", "s2"])
    queries = [seqs[0], seqs[1], seqs[2][:25]]
    assert bigsi.search_batch(queries, 0.5) == [
        bigsi.search(q, 0.5) for q in queries
    ]
    assert bigsi.search_batch(queries, 1.0) == [
        bigsi.search(q, 1.0) for q in queries
    ]


def test_mesh_minimizer_odd_batch_on_k_mesh():
    """Regression: minimizer counts on a (2,2,2) mesh pads the batch to
    the GROUPED mesh's batch axis (d*k=4), not the base mesh's d=2."""
    import random

    from bigsi_tpu import BIGSI
    from bigsi_tpu.storage import get_storage

    cfg = {
        "storage-engine": "memory",
        "storage-config": {"filename": "mesh-min-odd"},
        "k": 9,
        "m": 2048,
        "h": 3,
        "layout": "minimizer",
        "engine": "mesh",
        "mesh": [2, 2, 2],
    }
    get_storage(cfg).delete_all()
    rng = random.Random(29)
    seqs = ["".join(rng.choice("ACGT") for _ in range(40)) for _ in range(3)]
    blooms = [
        BIGSI.bloom(cfg, [s[i : i + 9] for i in range(len(s) - 8)]) for s in seqs
    ]
    bigsi = BIGSI.build(cfg, blooms, ["s0", "s1", "s2"])
    queries = (seqs * 2)[:5]  # 5 queries: not a multiple of d*k
    assert bigsi.search_batch(queries, 0.5) == [
        bigsi.search(q, 0.5) for q in queries
    ]


@pytest.mark.parametrize("axes", [(2, 2, 2), (1, 4, 2), (1, 8, 1)])
def test_rowsharded_grouped_step_matches_blocked(axes):
    """ROW-sharded grouped step (tile axis over ``r``) == single-device
    blocked.  Covers >HBM indexes spanning chips by rows (ROADMAP 3)."""
    import jax.numpy as jnp

    from bigsi_tpu.ops.lookup import blocked_counts, build_grouped_streams
    from bigsi_tpu.parallel.sharding import (
        make_row_mesh,
        make_rowsharded_grouped_step,
        shard_tiles_rows,
    )

    rng = np.random.default_rng(23)
    tr, T, W, B, K = 16, 19, 8, 4, 30  # T not a multiple of r: pad path
    tiles = rng.integers(0, 2 ** 32, size=(T, tr * W), dtype=np.uint32)
    tile = rng.integers(0, T, size=(B, K)).astype(np.int32)
    tile[:, 1:9] = tile[:, 0:1]  # minimizer-style runs
    slots = rng.integers(0, tr, size=(B, K, 3)).astype(np.uint32)
    smask = np.bitwise_or.reduce(np.uint32(1) << slots, axis=2)
    smask[rng.random((B, K)) < 0.2] = 0

    utile, gmask = build_grouped_streams(tile, smask)
    mesh = make_row_mesh(axes)
    step = make_rowsharded_grouped_step(mesh, tr)
    tiles3 = shard_tiles_rows(tiles, mesh, tr)
    got = np.asarray(step(tiles3, utile, gmask))
    want = np.asarray(
        blocked_counts(
            jnp.asarray(tiles), jnp.asarray(tile), jnp.asarray(smask),
            jnp.asarray(smask != 0), tr,
        )
    )
    assert np.array_equal(got, want)


def test_mesh_engine_row_sharded_counts_batch():
    """MeshEngine with row_shards > 1 returns the same counts as the
    host oracle for a minimizer index."""
    from bigsi_tpu.hashing.scheme import row_indices
    from bigsi_tpu.kmers import seq_to_ascii
    from bigsi_tpu.parallel.sharding import MeshEngine, make_mesh

    rng = np.random.default_rng(31)
    m, n, h, tr = 2048, 40, 3, 16
    words = rng.integers(0, 2 ** 32, size=(m, 2), dtype=np.uint32)
    matrix = BitSliceMatrix(words, num_cols=n)
    host = HostEngine(matrix)
    eng = MeshEngine(
        matrix, mesh=make_mesh(8, (2, 1, 2)), layout="minimizer",
        tile_rows=tr, row_shards=2,
    )

    kmers = ["ATCGGATTACA", "TCGGATTACAT", "CGGATTACATG", "GGCCGGCCGGC"]
    mat = np.stack([seq_to_ascii(k) for k in kmers])
    idx = row_indices(mat, h, m, "minimizer", tile_rows=tr)
    B, K = 2, len(kmers)
    row_idx = np.stack([idx, idx[::-1]]).astype(np.int64)
    mask = np.ones((B, K), dtype=bool)
    mask[1, -1] = False

    got = eng.counts_batch(row_idx, mask, n)
    want = np.stack([
        host.counts(host.and_rows(row_idx[b][mask[b]]), n) for b in range(B)
    ])
    assert np.array_equal(got, want)


def test_row_shards_rejects_classic():
    from bigsi_tpu.parallel.sharding import MeshEngine, make_mesh

    words = np.zeros((64, 1), dtype=np.uint32)
    matrix = BitSliceMatrix(words, num_cols=8)
    with pytest.raises(ValueError):
        MeshEngine(matrix, mesh=make_mesh(8, (1, 1, 2)), row_shards=2)


def test_sharded_seq_step_matches_single_device():
    """The multi-chip bytes-to-counts step (on-device prep + sample-
    sharded cols count) == single-device prep + count, and ok reports
    entry-budget overflow."""
    import jax.numpy as jnp

    from bigsi_tpu.hashing.scheme import MINIMIZER_SEED
    from bigsi_tpu.ops.lookup import grouped_counts_cols
    from bigsi_tpu.ops.prep_jax import prep_streams_device
    from bigsi_tpu.parallel.sharding import make_sharded_seq_step, shard_cols

    rng = np.random.default_rng(23)
    k, h, tr, window = 31, 3, 16, 19
    s = k - window + 1
    T, N, B = 512, 128, 4
    L = 96 + k - 1
    seqs = np.frombuffer(b"ACGT", dtype=np.uint8)[
        rng.integers(0, 4, size=(B, L))
    ]
    lens = np.full(B, L, dtype=np.int32)
    lens[1] = k + 9
    cols = rng.integers(0, 1 << 16, size=(T, N), dtype=np.uint16)

    kw = dict(
        k=k, s=s, num_tiles=T, h=h, tile_rows=tr, r=window + 1,
        u_cap=96, seed=MINIMIZER_SEED,
    )
    mesh = make_mesh(8, (2, 1, 4))
    step = make_sharded_seq_step(mesh, **kw)
    cols_sh = shard_cols(cols, mesh)
    counts, n_valid, ok = step(cols_sh, seqs, lens)
    assert np.asarray(ok).all()

    utile, gmask, nv1, ok1 = prep_streams_device(seqs, lens, **kw)
    want = np.asarray(
        grouped_counts_cols(jnp.asarray(cols), utile, gmask, nv1)
    )
    assert np.array_equal(np.asarray(counts)[:, :N], want)
    assert np.array_equal(np.asarray(n_valid), np.asarray(nv1))

    tiny = make_sharded_seq_step(mesh, **{**kw, "u_cap": 2})
    _, _, ok2 = tiny(cols_sh, seqs, lens)
    assert not np.asarray(ok2).all()


def test_search_batch_on_mesh_engine_seq_path(tmp_path, monkeypatch):
    """engine=mesh + minimizer/v3 routes search_batch through the
    bytes-to-counts sharded step, results identical to the host path."""
    from bigsi_tpu import BIGSI
    from bigsi_tpu.kmers import seq_to_kmers

    rng = np.random.default_rng(31)
    genomes = [
        "".join("ACGT"[c] for c in rng.integers(0, 4, 400)) for _ in range(5)
    ]
    cfg = {
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "idx")},
        "k": 31, "m": 1 << 17, "h": 3, "engine": "mesh",
        "mesh": [2, 1, 4],
        "layout": "minimizer", "tile-rows": 16, "minimizer-window": 19,
    }
    blooms = [BIGSI.bloom(cfg, seq_to_kmers(g, 31)) for g in genomes]
    idx = BIGSI.build(cfg, blooms, ["s%d" % i for i in range(5)])
    assert idx.engine.supports_seq_batch()
    calls = {"n": 0}
    orig = idx.engine.counts_batch_seqs

    def spy(*a, **kw):
        calls["n"] += 1
        out = orig(*a, **kw)
        assert out is not None, "device seq path fell back (overflow?)"
        return out

    monkeypatch.setattr(idx.engine, "counts_batch_seqs", spy)
    queries = [g[13:213] for g in genomes] + [
        "".join("ACGT"[c] for c in rng.integers(0, 4, 150))
    ]
    got = idx.search_batch(queries, threshold=0.7)
    assert calls["n"] == 1, "mesh seq path did not engage"
    monkeypatch.setattr(
        idx.engine, "supports_seq_batch", lambda: False, raising=False
    )
    want = idx.search_batch(queries, threshold=0.7)
    assert got == want
    assert {r[0]["sample_name"] for r in got[:5]} == {
        "s%d" % i for i in range(5)
    }
