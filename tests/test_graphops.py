"""Integer fixed-point PageRank over the host edge list."""

import pytest
from pyspark.sql import functions as F

from dce_spark.functions.graphops import RANK_UNIT, host_pagerank

pytestmark = pytest.mark.spark


def _edges(spark, rows):
    return spark.createDataFrame(
        rows, ["src_host", "dst_host", "n_links"]
    )


def test_pagerank_authority_concentrates(spark):
    # star: everyone links to hub; hub links to one spoke
    rows = [(f"s{i}.net", "hub.net", 1) for i in range(5)]
    rows.append(("hub.net", "s0.net", 1))
    out = {r.host: r.rank_micro
           for r in host_pagerank(_edges(spark, rows)).collect()}
    assert len(out) == 6
    # the hub outranks every spoke; the linked spoke outranks the rest
    assert out["hub.net"] > out["s0.net"] > out["s1.net"]
    # teleport floor: nothing ranks below (1 - d)
    assert all(r >= RANK_UNIT - 850_000 for r in out.values())


def test_pagerank_internal_edges_dropped_and_dangling(spark):
    rows = [
        ("a.net", "a.net", 100),   # self nav storm: ignored
        ("a.net", "b.net", 1),
        ("b.net", "c.net", 1),     # c is dangling (no out-edges)
    ]
    out = {r.host: r.rank_micro
           for r in host_pagerank(_edges(spark, rows)).collect()}
    # a receives nothing (only the teleport base)
    assert out["a.net"] == RANK_UNIT - 850_000
    assert out["c.net"] > out["b.net"] > 0


def test_pagerank_partitioning_independent(spark):
    rows = [(f"h{i}.org", f"h{(i * 7) % 23}.org", 1 + i % 3)
            for i in range(23)]
    e = _edges(spark, rows)
    r1 = {r.host: r.rank_micro
          for r in host_pagerank(e.repartition(1)).collect()}
    r13 = {r.host: r.rank_micro
           for r in host_pagerank(e.repartition(13)).collect()}
    # integer arithmetic: bit-identical under any partitioning
    assert r1 == r13


def _replica(rows, damping, iterations, eps=0, redistribute=False,
             cap=100):
    """Arbitrary-precision integer replica of host_pagerank's exact
    formula (Python // == SQL div on the nonnegative operands used).
    Returns (ranks, iterations_run)."""
    hosts = sorted({r[0] for r in rows} | {r[1] for r in rows})
    ext = [(s, d, w) for s, d, w in rows if s != d]
    od: dict[str, int] = {}
    for s, _, w in ext:
        od[s] = od.get(s, 0) + w
    r = {h: RANK_UNIT for h in hosts}
    base = RANK_UNIT - damping
    n, it = len(hosts), 0
    while True:
        it += 1
        share = 0
        if redistribute:
            share = sum(r[h] for h in hosts if h not in od) // n
        inc = {h: 0 for h in hosts}
        for s, d, w in ext:
            inc[d] += (r[s] * w) // od[s]
        new = {h: base + (damping * (inc[h] + share)) // RANK_UNIT
               for h in hosts}
        delta = max(abs(new[h] - r[h]) for h in hosts)
        r = new
        if iterations is None:
            if delta <= eps or it >= cap:
                return r, it
        elif it >= iterations:
            return r, it


_CONV_ROWS = [(f"s{i}.net", "hub.net", 1) for i in range(4)] + [
    ("hub.net", "s0.net", 2), ("s0.net", "s1.net", 1)]


def test_pagerank_convergence_mode(spark):
    # damping 0.5 => integer fixed point within ~20 iterations
    exp, k = _replica(_CONV_ROWS, 500_000, None, eps=0)
    assert 2 < k < 40  # genuinely iterative, bounded for test speed
    out = {r.host: r.rank_micro for r in host_pagerank(
        _edges(spark, _CONV_ROWS), iterations=None,
        damping_micro=500_000, epsilon_micro=0).collect()}
    assert out == exp
    # past the fixed point, extra unrolled iterations are no-ops: the
    # converged result equals the fixed-iteration run at higher count
    fixed = {r.host: r.rank_micro for r in host_pagerank(
        _edges(spark, _CONV_ROWS), iterations=k + 3,
        damping_micro=500_000).collect()}
    assert out == fixed


def test_pagerank_dangling_redistribution(spark):
    rows = [("a.net", "b.net", 1), ("b.net", "c.net", 1),
            ("c.net", "sink.net", 3)]  # sink.net dangles
    exp, _ = _replica(rows, 850_000, 3, redistribute=True)
    out = {r.host: r.rank_micro for r in host_pagerank(
        _edges(spark, rows), redistribute_dangling=True).collect()}
    assert out == exp
    # redistribution strictly raises the source-less node a.net above
    # its bare teleport floor
    plain = {r.host: r.rank_micro for r in host_pagerank(
        _edges(spark, rows)).collect()}
    assert plain["a.net"] == RANK_UNIT - 850_000
    assert out["a.net"] > plain["a.net"]


def test_pagerank_total_over_all_internal_hosts(spark):
    # a host whose only edges are internal must still appear with the
    # teleport-base rank, and so must a normal pair
    rows = [
        ("island.net", "island.net", 50),   # all-internal host
        ("a.net", "b.net", 1),
    ]
    out = {r.host: r.rank_micro
           for r in host_pagerank(_edges(spark, rows)).collect()}
    assert set(out) == {"island.net", "a.net", "b.net"}
    assert out["island.net"] == RANK_UNIT - 850_000
