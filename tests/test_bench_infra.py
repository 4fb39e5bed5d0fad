"""Query pools, histograms (L7 infrastructure)."""

import pytest

from wiser_tpu.bench.histogram import Histogram, format_latency_table
from wiser_tpu.bench.query_pool import (
    QueryLogReader,
    QueryProducer,
    QueryProducerNoLoop,
    parse_query_line,
    write_query_log,
)
from wiser_tpu.types import SearchQuery


class TestQueryParsing:
    def test_and_query(self):
        q = parse_query_line("hello world\n")
        assert q.terms == ["hello", "world"] and not q.is_phrase

    def test_phrase_query(self):
        # quoted line = phrase (query_pool.h:308-311)
        q = parse_query_line('"new york"')
        assert q.terms == ["new", "york"] and q.is_phrase

    def test_blank(self):
        assert parse_query_line("   \n") is None

    def test_log_roundtrip(self, tmp_path):
        queries = [
            SearchQuery(["a"]),
            SearchQuery(["b", "c"]),
            SearchQuery(["d", "e"], is_phrase=True),
        ]
        p = str(tmp_path / "log.txt")
        write_query_log(p, queries)
        back = QueryLogReader(p).read_all()
        assert [(q.terms, q.is_phrase) for q in back] == \
               [(q.terms, q.is_phrase) for q in queries]


class TestProducers:
    def test_looping_producer(self):
        qs = [SearchQuery([f"t{i}"]) for i in range(5)]
        prod = QueryProducer(qs, n_threads=2)
        seen = [prod.next_query(0).terms[0] for _ in range(6)]
        assert len(seen) == 6  # loops forever
        assert set(seen) <= {"t0", "t2", "t4"}  # round-robin partitioning

    def test_noloop_exhausts(self):
        qs = [SearchQuery([f"t{i}"]) for i in range(3)]
        prod = QueryProducerNoLoop(qs)
        got = [prod.next_query() for _ in range(5)]
        assert [g.terms[0] if g else None for g in got] == \
               ["t0", "t1", "t2", None, None]
        assert prod.is_empty()


class TestHistogram:
    def test_percentiles(self):
        h = Histogram()
        for v in range(1, 1001):
            h.add(v * 1000.0)  # 1ms..1s in us-scale ns
        assert h.count == 1000
        assert h.percentile(0) == 1000.0
        assert h.percentile(100) == 1000000.0
        p50 = h.percentile(50)
        assert 450_000 < p50 < 550_000  # ~1% bucket error

    def test_merge(self):
        a, b = Histogram(), Histogram()
        for v in range(100):
            a.add(1000.0)
            b.add(100000.0)
        m = Histogram.merged([a, b])
        assert m.count == 200
        assert m.min == 1000.0 and m.max == 100000.0

    def test_table_format(self):
        h = Histogram()
        h.add(5000.0)
        out = format_latency_table(h)
        assert "p50" in out and "p99" in out
