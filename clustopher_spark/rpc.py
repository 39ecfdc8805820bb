"""gRPC-shaped RPC surface (reference S9: proto/cluster_service.proto:7-16,
runner/runner.go:206-342).

Two layers:

* :class:`ClusterRpc` — a transport-agnostic dispatcher exposing the five
  reference RPCs (``ListClusters / LoadCluster / CreateCluster /
  GetClusters / GetMetadata``) under their fully-qualified gRPC method
  names, with request/response dicts shaped exactly like the proto
  messages (``ClusterInfo``, ``ClusterFeature``, ``GetMetadataResponse``
  — field names and nesting mirror proto/cluster_service.proto:18-113).
  This layer is the parity surface, and is fully testable here.

* :func:`serve_grpc` — a thin binding that registers the dispatcher on a
  real ``grpc.Server`` via ``GenericRpcHandler`` with JSON
  (de)serialization. grpcio is not installed in this runtime, so the
  binding is import-guarded and exercised only in production; swapping the
  JSON codec for protoc-generated message classes is a two-line change in
  ``_codec`` (the method table and handler signatures already match
  unary-unary protobuf semantics).

The dict-shaped messages intentionally use proto field names (snake_case,
``metrics`` maps, oneof-style ``MetadataValue``) so a protobuf codec can be
dropped in without touching handler logic.
"""

from __future__ import annotations

import json
from collections.abc import Callable

from clustopher_spark.serving import ClusterService

SERVICE_NAME = "cluster.ClusterService"


def _cluster_info(meta: dict) -> dict:
    """catalog meta.json -> proto ClusterInfo (cluster_service.proto:20-25)."""
    return {
        "id": meta.get("dataset_id", ""),
        "num_points": int(meta.get("num_points", 0)),
        "timestamp": str(meta.get("created_at", "")),
        "file_size": int(meta.get("file_size_bytes", 0)),
    }


class ClusterRpc:
    """Transport-agnostic dispatcher for the reference's ClusterService."""

    def __init__(self, service: ClusterService):
        self.service = service
        self._methods: dict[str, Callable[[dict], dict]] = {
            "ListClusters": self.list_clusters,
            "LoadCluster": self.load_cluster,
            "CreateCluster": self.create_cluster,
            "GetClusters": self.get_clusters,
            "GetMetadata": self.get_metadata,
        }

    # --- dispatch ---------------------------------------------------------

    def method_names(self) -> list[str]:
        return [f"/{SERVICE_NAME}/{m}" for m in self._methods]

    def dispatch(self, method: str, request: dict) -> dict:
        """``/cluster.ClusterService/GetClusters``-style full method name +
        request dict -> response dict. KeyError for unknown methods."""
        name = method.rsplit("/", 1)[-1]
        if name not in self._methods:
            raise KeyError(f"unimplemented method: {method}")
        return self._methods[name](request or {})

    # --- the five reference RPCs -----------------------------------------

    def list_clusters(self, request: dict) -> dict:
        """proto ListClusters -> ListClustersResponse{clusters: [ClusterInfo]}."""
        return {"clusters": [_cluster_info(m) for m in self.service.list_clusters()]}

    def load_cluster(self, request: dict) -> dict:
        """proto LoadCluster: pull the dataset into the serving cache (the
        reference's explicit load step, runner/runner.go:157-203) and
        return its ClusterInfo."""
        dataset_id = request["cluster_id"]
        self.service.cache.get(dataset_id, self.service._load)
        return {"cluster": _cluster_info(self.service.catalog.info(dataset_id))}

    def create_cluster(self, request: dict) -> dict:
        out = self.service.create_cluster(int(request.get("num_points", 10000)))
        info = self.service.catalog.info(out["dataset_id"])
        return {"cluster": _cluster_info(info)}

    def get_clusters(self, request: dict) -> dict:
        """proto GetClusters -> GetClustersResponse{features:
        [ClusterFeature{x, y, count, id, metrics, is_cluster}]}.

        The proto's Bounds is in projected tile space in the reference
        worker; the service API (like the REST facade) takes geographic
        bounds — x/y in the response are lng/lat, matching what the
        reference frontend ultimately renders."""
        b = request.get("bounds", {})
        rows = self.service.get_clusters(
            request["cluster_id"],
            int(request.get("zoom", 0)),
            float(b.get("min_x", -180.0)),
            float(b.get("min_y", -85.0)),
            float(b.get("max_x", 180.0)),
            float(b.get("max_y", 85.0)),
        )
        return {
            "features": [
                {
                    "x": r["lng"],
                    "y": r["lat"],
                    "count": r["count"],
                    "id": r["id"],
                    "metrics": r["metrics"],
                    "is_cluster": r["is_cluster"],
                }
                for r in rows
            ]
        }

    def get_metadata(self, request: dict) -> dict:
        """proto GetMetadata -> GetMetadataResponse. Unlike the reference's
        REST hop (which drops metadata), distributions ride along as
        oneof-style MetadataValue{distribution} entries
        (cluster_service.proto:96-113)."""
        b = request.get("bounds", {})
        md = self.service.get_metadata(
            request["cluster_id"],
            int(request.get("zoom", 0)),
            float(b.get("min_x", -180.0)),
            float(b.get("min_y", -85.0)),
            float(b.get("max_x", 180.0)),
            float(b.get("max_y", 85.0)),
        )
        return {
            "total_points": md["total_points"],
            "num_clusters": md["num_clusters"],
            "num_single_points": md["num_single_points"],
            "metrics_summary": {
                k: {"min": v["min"], "max": v["max"], "average": v["average"]}
                for k, v in md["metrics"].items()
            },
            "metadata_summary": {
                k: {"distribution": {"values": v}}
                for k, v in md["distributions"].items()
            },
        }


def serve_grpc(service: ClusterService, port: int = 50051):
    """Bind :class:`ClusterRpc` to a real gRPC server (production path;
    grpcio is not available in this test runtime — the dispatcher above is
    the tested surface).

    Uses ``GenericRpcHandler`` + JSON codec, so no protoc codegen is
    required; to speak binary protobuf instead, generate message classes
    from proto/cluster_service.proto and replace ``_codec``'s json.dumps/
    loads with ``SerializeToString`` / ``FromString``.
    """
    try:
        import grpc
    except ImportError as exc:  # pragma: no cover - grpcio absent in CI
        raise ImportError(
            "grpcio is not installed; install grpcio to serve the gRPC "
            "transport, or use clustopher_spark.serving.serve (HTTP)."
        ) from exc

    rpc = ClusterRpc(service)

    def _codec(behavior):
        return grpc.unary_unary_rpc_method_handler(
            lambda req, ctx: behavior(req),
            request_deserializer=lambda b: json.loads(b or b"{}"),
            response_serializer=lambda d: json.dumps(d).encode(),
        )

    class Handler(grpc.GenericRpcHandler):  # pragma: no cover - needs grpcio
        def service(self, handler_call_details):
            name = handler_call_details.method
            if name.rsplit("/", 1)[-1] in rpc._methods:
                return _codec(lambda req, n=name: rpc.dispatch(n, req))
            return None

    from concurrent import futures

    server = grpc.server(futures.ThreadPoolExecutor(max_workers=8))
    server.add_generic_rpc_handlers((Handler(),))
    server.add_insecure_port(f"127.0.0.1:{port}")
    server.start()
    return server
