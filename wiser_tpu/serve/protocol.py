"""gRPC wiring for the WiserEngine service.

grpc_tools isn't available in this image, so the service handlers and
client stubs are registered by hand against the protoc-generated message
classes (wiser_pb2) — functionally equivalent to *_pb2_grpc.py output.

reference: protos/qq.proto + grpc_server_impl.h / grpc_client_impl.h.
"""

from __future__ import annotations

import grpc

from wiser_tpu.serve import wiser_pb2 as pb

SERVICE = "wiser.WiserEngine"


def add_service(server: grpc.Server, servicer) -> None:
    """servicer must implement StreamingSearch / UnarySearch /
    AddDocument / Echo with grpc method signatures."""
    handlers = {
        "StreamingSearch": grpc.stream_stream_rpc_method_handler(
            servicer.StreamingSearch,
            request_deserializer=pb.SearchRequest.FromString,
            response_serializer=pb.SearchReply.SerializeToString,
        ),
        "BatchSearch": grpc.stream_stream_rpc_method_handler(
            servicer.BatchSearch,
            request_deserializer=pb.SearchRequestBatch.FromString,
            response_serializer=pb.SearchReplyBatch.SerializeToString,
        ),
        "UnarySearch": grpc.unary_unary_rpc_method_handler(
            servicer.UnarySearch,
            request_deserializer=pb.SearchRequest.FromString,
            response_serializer=pb.SearchReply.SerializeToString,
        ),
        "AddDocument": grpc.unary_unary_rpc_method_handler(
            servicer.AddDocument,
            request_deserializer=pb.AddDocumentRequest.FromString,
            response_serializer=pb.StatusReply.SerializeToString,
        ),
        "Echo": grpc.unary_unary_rpc_method_handler(
            servicer.Echo,
            request_deserializer=pb.EchoData.FromString,
            response_serializer=pb.EchoData.SerializeToString,
        ),
    }
    server.add_generic_rpc_handlers(
        (grpc.method_handlers_generic_handler(SERVICE, handlers),)
    )


class WiserEngineStub:
    """Client stub (the *_pb2_grpc.WiserEngineStub equivalent)."""

    def __init__(self, channel: grpc.Channel):
        self.StreamingSearch = channel.stream_stream(
            f"/{SERVICE}/StreamingSearch",
            request_serializer=pb.SearchRequest.SerializeToString,
            response_deserializer=pb.SearchReply.FromString,
        )
        self.BatchSearch = channel.stream_stream(
            f"/{SERVICE}/BatchSearch",
            request_serializer=pb.SearchRequestBatch.SerializeToString,
            response_deserializer=pb.SearchReplyBatch.FromString,
        )
        self.UnarySearch = channel.unary_unary(
            f"/{SERVICE}/UnarySearch",
            request_serializer=pb.SearchRequest.SerializeToString,
            response_deserializer=pb.SearchReply.FromString,
        )
        self.AddDocument = channel.unary_unary(
            f"/{SERVICE}/AddDocument",
            request_serializer=pb.AddDocumentRequest.SerializeToString,
            response_deserializer=pb.StatusReply.FromString,
        )
        self.Echo = channel.unary_unary(
            f"/{SERVICE}/Echo",
            request_serializer=pb.EchoData.SerializeToString,
            response_deserializer=pb.EchoData.FromString,
        )


def query_from_request(req: pb.SearchRequest):
    from wiser_tpu.types import SearchQuery

    return SearchQuery(
        terms=list(req.terms),
        n_results=req.n_results or 5,
        return_snippets=req.return_snippets,
        n_snippet_passages=req.n_snippet_passages or 3,
        is_phrase=req.is_phrase,
    )


def reply_from_result(result) -> pb.SearchReply:
    reply = pb.SearchReply()
    for e in result.entries:
        reply.entries.add(doc_id=e.doc_id, snippet=e.snippet, doc_score=e.doc_score)
    return reply
