"""Cortex ``.ctp`` links reader + link-guided traversal.

Format and traversal semantics per the reference's LinksFile /
GraphTraverser (``bigsi/utils/cortex.py:267-443``); fixtures are
synthesized here (the reference ships no ``.ctp`` test data).
"""

import gzip
import json

import pytest

from bigsi_tpu.io.cortex_links import (
    LinkPath,
    LinksReader,
    adjacent_kmers,
    load_links,
    reverse_complement,
    traverse,
)

V3_HEADER = {
    "file_format": "ctp",
    "format_version": 3,
    "graph": {
        "kmer_size": 5,
        "num_colours": 1,
        "num_kmers_in_graph": 12,
        "colours": [{"colour": 0, "sample": "s1"}],
    },
    "paths": {"num_kmers_with_paths": 1},
}


def _write_ctp(path, header, blocks):
    with gzip.open(path, "wt") as f:
        f.write(json.dumps(header, indent=1) + "\n")
        f.write("# comment line\n\n")
        for kmer, paths in blocks:
            f.write("%s %d\n" % (kmer, len(paths)))
            for p in paths:
                f.write(
                    "%s %d %d %s %s\n"
                    % (
                        p.direction,
                        p.num_kmers,
                        len(p.junctions),
                        ",".join(str(c) for c in p.counts),
                        p.junctions,
                    )
                )


def test_reads_v3_header_and_records(tmp_path):
    ctp = str(tmp_path / "x.ctp")
    _write_ctp(
        ctp,
        V3_HEADER,
        [("ACGTA", [LinkPath("F", 7, [3], "GA"), LinkPath("R", 4, [1], "T")])],
    )
    header, links = load_links(ctp)
    assert header.kmer_size == 5
    assert header.format_version == 3
    assert header.num_kmers_with_paths == 1
    (paths,) = (links["ACGTA"],)
    assert [p.direction for p in paths] == ["F", "R"]
    assert paths[0].junctions == "GA"
    assert paths[0].counts == [3]


def test_reads_v2_header(tmp_path):
    header2 = {
        "fileFormat": "ctp",
        "formatVersion": 2,
        "ncols": 1,
        "kmer_size": 5,
        "num_kmers_in_graph": 9,
        "num_kmers_with_paths": 1,
        "num_paths": 1,
        "colours": [],
        "commands": [],
    }
    ctp = str(tmp_path / "v2.ctp")
    _write_ctp(ctp, header2, [("ACGTA", [LinkPath("F", 3, [1], "C")])])
    reader = LinksReader(ctp)
    assert reader.header.format_version == 2
    assert reader.header.kmer_size == 5
    kmer, paths = next(iter(reader))
    assert kmer == "ACGTA" and paths[0].junctions == "C"


def test_rejects_bad_junction_count(tmp_path):
    ctp = str(tmp_path / "bad.ctp")
    with gzip.open(ctp, "wt") as f:
        f.write(json.dumps(V3_HEADER) + "\n")
        f.write("ACGTA 1\nF 7 3 1 GA\n")  # says 3 junctions, gives 2
    with pytest.raises(ValueError):
        dict(LinksReader(ctp))


def _graph_from_seqs(seqs, k):
    """Canonical kmer -> (fwd_bases, rev_bases) edges, built from the
    consecutive k-mers of each sequence (one colour)."""
    graph = {}

    def edge(kmer, nxt):
        canon = min(kmer, reverse_complement(kmer))
        fwd, rev = graph.setdefault(canon, (set(), set()))
        if canon == kmer:
            fwd.add(nxt[-1])
        else:
            # the canonical form walks the other strand: an outgoing
            # edge of `kmer` is an incoming (rev) edge of canon
            rev.add(reverse_complement(nxt[-1]))

    def redge(kmer, prev):
        canon = min(kmer, reverse_complement(kmer))
        fwd, rev = graph.setdefault(canon, (set(), set()))
        if canon == kmer:
            rev.add(prev[0])
        else:
            fwd.add(reverse_complement(prev[0]))

    for s in seqs:
        kmers = [s[i : i + k] for i in range(len(s) - k + 1)]
        for a, b in zip(kmers[:-1], kmers[1:]):
            edge(a, b)
            redge(b, a)
    for canon in list(graph):
        fwd, rev = graph[canon]
        graph[canon] = (sorted(fwd), sorted(rev))
    return graph


def _assert_collision_free(seqs, k):
    """Guard the fixtures: no two k-mers (across both strands) may share
    a canonical form, or the graph gains spurious branches/cycles."""
    seen = {}
    for s in seqs:
        for i in range(len(s) - k + 1):
            km = s[i : i + k]
            canon = min(km, reverse_complement(km))
            assert seen.setdefault(canon, km) == km, (km, seen[canon])


def test_traverse_linear_contig():
    seq = "AAATCAGGACTTGCC"
    _assert_collision_free([seq], 5)
    graph = _graph_from_seqs([seq], 5)
    assert traverse(graph, {}, seq[:5]) == seq


def test_traverse_uses_links_at_junction():
    # two sequences share a prefix then branch: plain edges cannot pick
    # a side; the link's junction base disambiguates
    common = "AAATCAGGACT"
    a = common + "TGCCG"
    b = common + "CCTAC"
    _assert_collision_free([a, b[len(common) - 4 :]], 5)
    graph = _graph_from_seqs([a, b], 5)
    seed = a[:5]
    # without links, traversal stops at the branch
    stopped = traverse(graph, {}, seed)
    assert len(stopped) < len(a)
    # the first divergent base after `common` is a[len(common)] = "G"
    start = min(seed, reverse_complement(seed))
    links = {start: [LinkPath("F", len(a) - 4, [1], a[len(common)])]}
    assert traverse(graph, links, seed) == a
    links_b = {start: [LinkPath("F", len(b) - 4, [1], b[len(common)])]}
    assert traverse(graph, links_b, seed) == b


def test_traverse_partial_graph_terminates():
    # regression (round-3 advisor): an edge leading to a k-mer absent
    # from the caller's graph dict must END the contig, not KeyError
    seq = "AAATCAGGACTTGCC"
    graph = _graph_from_seqs([seq], 5)
    last = min(seq[-5:], reverse_complement(seq[-5:]))
    del graph[last]
    out = traverse(graph, {}, seq[:5])
    assert out == seq  # the final base still lands, then the walk stops


def test_traverse_skips_zero_junction_links():
    # regression (round-3 advisor): an nj=0 link (empty junction string)
    # must not be admitted to the live set — live[0][1][0] would IndexError
    common = "AAATCAGGACT"
    a = common + "TGCCG"
    b = common + "CCTAC"
    graph = _graph_from_seqs([a, b], 5)
    seed = a[:5]
    start = min(seed, reverse_complement(seed))
    links = {start: [LinkPath("F", 3, [1], "")]}
    stopped = traverse(graph, links, seed)
    assert len(stopped) < len(a)  # behaves like no-links at the branch


def test_adjacent_kmers_orientations():
    assert adjacent_kmers("ACGTA", (["C"], []), 0) == ["CGTAC"]
    assert adjacent_kmers("ACGTA", ([], ["T"]), 1) == ["TACGT"]
