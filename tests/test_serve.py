"""gRPC serving tests: real server + client in-process on localhost
(reference pattern: [grpc]-tagged tests, tests_9.cc)."""

import time

import grpc
import pytest

from wiser_tpu.data.synth import synth_docinfos
from wiser_tpu.engine.device import TpuEngine
from wiser_tpu.index.builder import build_index
from wiser_tpu.serve import wiser_pb2 as pb
from wiser_tpu.serve.protocol import WiserEngineStub
from wiser_tpu.serve.server import create_server
from wiser_tpu.types import SearchQuery

PORT = 50911


@pytest.fixture(scope="module")
def served_engine():
    docs = synth_docinfos(n_docs=200, vocab_size=60, mean_len=25, seed=2)
    packed, oracle = build_index(docs)
    engine = TpuEngine(packed, doc_bodies=oracle.doc_bodies)
    server, executor = create_server(engine, PORT, n_threads=4, max_wait_ms=1.0)
    server.start()
    time.sleep(0.2)
    yield oracle, engine
    executor.stop()
    server.stop(grace=1)


@pytest.fixture(scope="module")
def stub(served_engine):
    channel = grpc.insecure_channel(f"localhost:{PORT}")
    return WiserEngineStub(channel)


class TestUnary:
    def test_echo(self, stub):
        assert stub.Echo(pb.EchoData(message="ping")).message == "ping"

    def test_search_matches_local(self, served_engine, stub):
        oracle, _ = served_engine
        reply = stub.UnarySearch(pb.SearchRequest(terms=["t0"], n_results=10))
        local = oracle.search(SearchQuery(["t0"], n_results=10))
        assert [(e.doc_id, e.doc_score) for e in reply.entries] == \
               [(e.doc_id, e.doc_score) for e in local.entries]

    def test_missing_term(self, stub):
        reply = stub.UnarySearch(pb.SearchRequest(terms=["zzz"], n_results=10))
        assert len(reply.entries) == 0

    def test_snippets_over_wire(self, stub):
        reply = stub.UnarySearch(pb.SearchRequest(
            terms=["t0"], n_results=3, return_snippets=True,
            n_snippet_passages=3))
        assert len(reply.entries) > 0
        assert any("<b>" in e.snippet for e in reply.entries)

    def test_add_document_readonly(self, stub):
        reply = stub.AddDocument(pb.AddDocumentRequest(body="x", tokens="x"))
        assert not reply.ok  # packed engine is immutable, like Vacuum


class TestBatchSearch:
    def test_batched_transport_matches_local(self, served_engine, stub):
        """N queries per wire message (SearchRequestBatch); replies come
        back per-batch in order and match the local engine."""
        oracle, _ = served_engine

        def gen():
            b = pb.SearchRequestBatch()
            for terms in (["t0"], ["t1", "t2"], ["zzz"], ["t3"]):
                b.requests.append(pb.SearchRequest(terms=terms, n_results=5))
            yield b
            b2 = pb.SearchRequestBatch()
            b2.requests.append(pb.SearchRequest(terms=["t2"], n_results=3))
            yield b2

        batches = list(stub.BatchSearch(gen()))
        assert [len(b.replies) for b in batches] == [4, 1]
        for terms, reply in zip((["t0"], ["t1", "t2"], ["zzz"], ["t3"]),
                                batches[0].replies):
            local = oracle.search(SearchQuery(list(terms), n_results=5))
            assert [(e.doc_id, e.doc_score) for e in reply.entries] == \
                   [(e.doc_id, e.doc_score) for e in local.entries], terms


class TestStreaming:
    def test_streaming_roundtrips(self, served_engine, stub):
        oracle, _ = served_engine

        def gen():
            for terms in (["t0"], ["t1", "t2"], ["t3"]):
                yield pb.SearchRequest(terms=terms, n_results=5)

        replies = list(stub.StreamingSearch(gen()))
        assert len(replies) == 3
        local = oracle.search(SearchQuery(["t0"], n_results=5))
        assert [(e.doc_id, e.doc_score) for e in replies[0].entries] == \
               [(e.doc_id, e.doc_score) for e in local.entries]


class TestBatchingExecutor:
    def test_concurrent_requests_batched(self, served_engine):
        import threading
        from wiser_tpu.serve.server import BatchingExecutor

        _, engine = served_engine
        ex = BatchingExecutor(engine, max_batch=64, max_wait_ms=5.0)
        results = {}

        def worker(i, term):
            results[i] = ex.search(SearchQuery([term], n_results=5))

        threads = [threading.Thread(target=worker, args=(i, f"t{i % 5}"))
                   for i in range(32)]
        for t in threads:
            t.start()
        for t in threads:
            t.join(timeout=30)
        ex.stop()
        assert len(results) == 32
        assert all(r.size() >= 0 for r in results.values())
        # same term -> same results regardless of batch assignment
        a = [(e.doc_id, e.doc_score) for e in results[0].entries]
        b = [(e.doc_id, e.doc_score) for e in results[5].entries]
        assert a == b
