"""CLI + HTTP flow tests (reference: ``bigsi/tests/cli/test_cli.py``) —
bloom -> build -> search / bulk_search / insert / merge / delete against
the reference's real .ctx fixtures."""

import json
import os
import threading
import urllib.request

import numpy as np
import pytest
import yaml

from bigsi_tpu.__main__ import d_to_csv, main, make_parser, run

REF_DATA = "/root/reference/example-data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixtures not mounted"
)


@pytest.fixture()
def ws(tmp_path):
    """Workspace with a config file pointing at a tmp index dir."""
    config = {
        "k": 31,
        "m": 25000,
        "h": 3,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "index")},
    }
    cfg_path = str(tmp_path / "config.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(config, f)
    return tmp_path, cfg_path


def cli(argv):
    args = make_parser().parse_args(argv)
    return run(args)


def build_two_samples(ws):
    tmp_path, cfg = ws
    b1, b2 = str(tmp_path / "t1.bloom"), str(tmp_path / "t2.bloom")
    cli(["bloom", os.path.join(REF_DATA, "test1.ctx"), b1, "-c", cfg])
    cli(["bloom", os.path.join(REF_DATA, "test2.ctx"), b2, "-c", cfg])
    out = cli(["build", b1, b2, "--samples", "s1", "s2", "-c", cfg])
    assert json.loads(out) == {"result": "success"}
    return b1, b2


def first_query_seq():
    from bigsi_tpu.io.fasta import read_fasta

    return list(read_fasta(os.path.join(REF_DATA, "query.fasta")).values())[0]


def kmer_in_sample(ctx="test1.ctx"):
    """A 31-mer guaranteed present in the given fixture sample."""
    from bigsi_tpu.io.cortex import extract_kmers_from_ctx

    return next(iter(extract_kmers_from_ctx(os.path.join(REF_DATA, ctx), 31)))


def test_bloom_build_search(ws):
    tmp_path, cfg = ws
    build_two_samples(ws)
    seq = kmer_in_sample("test1.ctx")
    d = json.loads(cli(["search", seq, "-c", cfg]))
    assert d["citation"].startswith("http://dx.doi.org")
    assert d["query"] == seq
    names = {r["sample_name"] for r in d["results"]}
    assert "s1" in names
    for r in d["results"]:
        assert r["percent_kmers_found"] == 100.0
    # csv format
    csv_out = cli(["search", seq, "-c", cfg, "--format", "csv"])
    assert "query" in csv_out.splitlines()[0]


def test_inexact_and_scored_search(ws):
    tmp_path, cfg = ws
    build_two_samples(ws)
    # query.fasta sequences share ~1/31 of their k-mers with the samples
    seq = first_query_seq()
    d = json.loads(cli(["search", seq, "-c", cfg, "-t", "0.03"]))
    assert d["results"]
    assert all(r["num_kmers_found"] >= 1 for r in d["results"])
    seq2 = kmer_in_sample("test2.ctx")
    d = json.loads(cli(["search", seq2, "-c", cfg, "-t", "0.5", "--score"]))
    assert d["results"]
    assert "score" in d["results"][0]


def test_bulk_search(ws):
    tmp_path, cfg = ws
    build_two_samples(ws)
    out = json.loads(
        cli(["bulk_search", os.path.join(REF_DATA, "query.fasta"), "-c", cfg])
    )
    assert len(out) == len(
        __import__("bigsi_tpu.io.fasta", fromlist=["read_fasta"]).read_fasta(
            os.path.join(REF_DATA, "query.fasta")
        )
    )
    assert all("citation" in d for d in out)


def test_build_from_tsv(ws):
    tmp_path, cfg = ws
    b1, b2 = str(tmp_path / "t1.bloom"), str(tmp_path / "t2.bloom")
    cli(["bloom", os.path.join(REF_DATA, "test1.ctx"), b1, "-c", cfg])
    cli(["bloom", os.path.join(REF_DATA, "test2.ctx"), b2, "-c", cfg])
    tsv = str(tmp_path / "build.tsv")
    with open(tsv, "w") as f:
        f.write("%s\ts1\n%s\ts2\n" % (b1, b2))
    out = cli(["build", "--from_file", tsv, "-c", cfg])
    assert json.loads(out) == {"result": "success"}
    seq = kmer_in_sample("test1.ctx")
    assert json.loads(cli(["search", seq, "-c", cfg]))["results"]


def test_insert_and_delete(ws):
    tmp_path, cfg = ws
    b1, _ = build_two_samples(ws)
    out = cli(["insert", b1, "s3", "-c", cfg])
    assert json.loads(out) == {"result": "success"}
    # staged: the insert landed in the side shard, not rows.bin
    assert os.path.exists(str(tmp_path / "index" / "side.bin"))
    seq = kmer_in_sample("test1.ctx")
    d = json.loads(cli(["search", seq, "-c", cfg]))
    # test1.ctx and test2.ctx hold identical k-mer sets, so all three
    # columns (s3 = re-inserted s1 bloom) match
    assert {r["sample_name"] for r in d["results"]} == {"s1", "s2", "s3"}
    out = cli(["compact", "-c", cfg])
    assert json.loads(out) == {"result": "compacted 1 staged column(s)."}
    assert not os.path.exists(str(tmp_path / "index" / "side.bin"))
    d = json.loads(cli(["search", seq, "-c", cfg]))
    assert {r["sample_name"] for r in d["results"]} == {"s1", "s2", "s3"}
    cli(["delete", "-c", cfg])
    assert not os.path.exists(str(tmp_path / "index"))


def test_merge_cli(ws, tmp_path):
    _, cfg = ws
    build_two_samples(ws)
    # second index in its own directory
    cfg2_d = {
        "k": 31,
        "m": 25000,
        "h": 3,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "index2")},
    }
    cfg2 = str(tmp_path / "config2.yaml")
    with open(cfg2, "w") as f:
        yaml.safe_dump(cfg2_d, f)
    b3 = str(tmp_path / "t3.bloom")
    cli(["bloom", os.path.join(REF_DATA, "kmers.ctx"), b3, "-c", cfg2])
    cli(["build", b3, "--samples", "s3", "-c", cfg2])
    out = cli(["merge", cfg2, "-c", ws[1]])
    assert "merged" in out
    seq = kmer_in_sample("kmers.ctx")
    d = json.loads(cli(["search", seq, "-c", ws[1]]))
    assert {r["sample_name"] for r in d["results"]} >= {"s3"}


def test_build_chunked_matches_oneshot(ws, tmp_path):
    """Memory-capped chunked build (the reference's broken path,
    fixed here) must produce identical search results."""
    _, cfg = ws
    build_two_samples(ws)
    seq = first_query_seq()
    expect = cli(["search", seq, "-c", cfg, "-t", "0.03"])

    chunk_d = {
        "k": 31,
        "m": 25000,
        "h": 3,
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(tmp_path / "chunked")},
        # one bloom is 25000*9/8 ≈ 28KB; cap to force 2 chunks
        "max_build_mem_bytes": "30KB",
    }
    cfg3 = str(tmp_path / "config3.yaml")
    with open(cfg3, "w") as f:
        yaml.safe_dump(chunk_d, f)
    b1 = str(tmp_path / "t1.bloom")
    b2 = str(tmp_path / "t2.bloom")
    out = cli(["build", b1, b2, "--samples", "s1", "s2", "-c", cfg3])
    assert json.loads(out) == {"result": "success"}
    got = cli(["search", seq, "-c", cfg3, "-t", "0.03"])
    assert json.loads(got)["results"] == json.loads(expect)["results"]


def test_http_server(ws):
    from bigsi_tpu.config import get_config_from_file
    from bigsi_tpu.http.server import make_server

    _, cfg = ws
    build_two_samples(ws)
    server = make_server(get_config_from_file(cfg), host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        seq = kmer_in_sample("test1.ctx")
        url = "http://127.0.0.1:%d/search?seq=%s&threshold=0.5" % (port, seq)
        with urllib.request.urlopen(url) as resp:
            assert resp.headers["Access-Control-Allow-Origin"] == "*"
            d = json.loads(resp.read())
        assert d["citation"].startswith("http://dx.doi.org")
        assert d["results"]
        # bulk_search over the fixture fasta
        url = "http://127.0.0.1:%d/bulk_search?fasta=%s" % (
            port,
            os.path.join(REF_DATA, "query.fasta"),
        )
        with urllib.request.urlopen(url) as resp:
            dd = json.loads(resp.read())
        assert isinstance(dd, list) and dd
        # 404 on unknown route
        try:
            urllib.request.urlopen("http://127.0.0.1:%d/nope" % port)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
        # missing param -> 400
        try:
            urllib.request.urlopen("http://127.0.0.1:%d/search" % port)
            assert False, "expected 400"
        except urllib.error.HTTPError as e:
            assert e.code == 400
    finally:
        server.shutdown()


def test_http_bloom_build_search(ws, tmp_path):
    """HTTP-only flow: POST /bloom -> POST /build -> GET /search
    (reference exposes every verb over HTTP, ``bigsi/__main__.py:103-320``)."""
    from bigsi_tpu.config import get_config_from_file
    from bigsi_tpu.http.server import make_server

    _, cfg = ws
    server = make_server(get_config_from_file(cfg), host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()

    def post(route, payload):
        req = urllib.request.Request(
            "http://127.0.0.1:%d%s" % (port, route),
            data=json.dumps(payload).encode(),
            headers={"Content-Type": "application/json"},
            method="POST",
        )
        with urllib.request.urlopen(req) as resp:
            return json.loads(resp.read())

    try:
        b1 = str(tmp_path / "h1.bloom")
        b2 = str(tmp_path / "h2.bloom")
        assert post(
            "/bloom",
            {"ctx": os.path.join(REF_DATA, "test1.ctx"), "outfile": b1},
        ) == {"result": "success"}
        assert post(
            "/bloom",
            {"ctx": os.path.join(REF_DATA, "test2.ctx"), "outfile": b2},
        ) == {"result": "success"}
        assert post(
            "/build", {"bloomfilters": [b1, b2], "samples": ["s1", "s2"]}
        ) == {"result": "success"}
        seq = kmer_in_sample("test1.ctx")
        url = "http://127.0.0.1:%d/search?seq=%s" % (port, seq)
        with urllib.request.urlopen(url) as resp:
            d = json.loads(resp.read())
        assert {r["sample_name"] for r in d["results"]} == {"s1", "s2"}
        # comma-separated form-encoded variant also accepted
        with urllib.request.urlopen("http://127.0.0.1:%d/" % port) as resp:
            routes = json.loads(resp.read())["routes"]
        assert "/build" in routes and "/bloom" in routes
    finally:
        server.shutdown()


def test_mesh_engine_yaml_config(ws, tmp_path):
    """A YAML config with engine: mesh must load (round-1 bug: mesh was
    missing from KNOWN_ENGINES so every real user config was rejected)
    and serve identical search results."""
    _, cfg = ws
    build_two_samples(ws)
    expect = json.loads(cli(["search", first_query_seq(), "-c", cfg, "-t", "0.03"]))

    mesh_d = {
        "k": 31,
        "m": 25000,
        "h": 3,
        "engine": "mesh",
        "mesh": [1, 1, 2],
        "storage-engine": "bigsi-tpu",
        "storage-config": {"filename": str(ws[0] / "index")},
    }
    cfgm = str(tmp_path / "mesh.yaml")
    with open(cfgm, "w") as f:
        yaml.safe_dump(mesh_d, f)
    got = json.loads(cli(["search", first_query_seq(), "-c", cfgm, "-t", "0.03"]))
    assert got["results"] == expect["results"]


def test_config_validation_errors(tmp_path):
    from bigsi_tpu.config import validate_config

    base = {"k": 31, "m": 1000, "h": 3}
    with pytest.raises(ValueError, match="engine"):
        validate_config({**base, "engine": "gpu"})
    validate_config({**base, "engine": "mesh"})  # fixed: mesh is known
    with pytest.raises(ValueError, match="layout"):
        validate_config({**base, "layout": "minimiser"})
    with pytest.raises(ValueError, match="mesh"):
        validate_config({**base, "mesh": [3, 3, 3, 3]})
    with pytest.raises(ValueError, match="mesh"):
        validate_config({**base, "mesh": "2x4"})
    validate_config({**base, "mesh": [2, 1, 4]})


def test_d_to_csv():
    d = {
        "query": "ACGT",
        "results": [
            {"percent_kmers_found": 100.0, "num_kmers": 1, "num_kmers_found": 1, "sample_name": "s1"}
        ],
    }
    out = d_to_csv(d)
    lines = out.strip().split("\r\n")
    assert lines[0].startswith('"query"')
    assert "s1" in lines[1]
