"""gRPC front door — the reference's cross-process serving boundary.

The reference talks to its Triton sidecars over gRPC
(``face_detection_trt_server/triton_utils.py:16-17``). Round 1 shipped HTTP
only because protobuf *codegen* (grpcio-tools) is absent from this image —
but the grpc runtime itself is present, and generic method handlers with
identity byte serializers need no generated stubs. Payloads are JPEG bytes
in, JSON bytes out, with call parameters in gRPC metadata — the same
surface as serving/http_server.py, over HTTP/2 gRPC framing.

Service: ``fdrt.FaceService``
  /fdrt.FaceService/Health  ()        -> {"ready": true}
  /fdrt.FaceService/Detect  (jpeg)    -> {"num_faces", "bboxes", "confs"}
        metadata: det-thres, bbox-area-thres (optional floats)
  /fdrt.FaceService/DetectEmbedClassify (jpeg)
        -> {"bboxes", "confs", "embeddings", "labels"}

Client helper ``grpc_detect`` mirrors the reference's
``TritonServerInferenceSession`` call pattern without the Docker lifecycle.
"""
from __future__ import annotations

import json
from concurrent import futures
from typing import Optional, Tuple

import numpy as np

from .service import FaceService, ServiceConfig

_IDENT = lambda b: b  # noqa: E731  — identity (de)serializers: raw bytes


def _decode_image(payload: bytes):
    import cv2

    arr = np.frombuffer(payload, np.uint8)
    return cv2.imdecode(arr, cv2.IMREAD_COLOR) if len(arr) else None


def _thresholds(context) -> Tuple[Optional[float], Optional[float]]:
    md = {k: v for k, v in context.invocation_metadata()}
    dt = md.get("det-thres")
    at = md.get("bbox-area-thres")
    return (float(dt) if dt is not None else None,
            float(at) if at is not None else None)


def make_grpc_server(service: FaceService, host: str = "0.0.0.0",
                     port: int = 8081, max_workers: int = 8):
    """Build (not start) a grpc.Server bound to ``service``."""
    import grpc

    def health(request: bytes, context) -> bytes:
        return json.dumps({"ready": True}).encode()

    def detect(request: bytes, context) -> bytes:
        img = _decode_image(request)
        if img is None:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                          "request body is not a decodable image")
        dt, at = _thresholds(context)
        faces, bboxes, confs = service.detect_faces(img, dt, at)
        return json.dumps({
            "num_faces": int(faces.shape[0]),
            "bboxes": np.asarray(bboxes).tolist(),
            "confs": np.asarray(confs).reshape(-1).tolist(),
        }).encode()

    def detect_embed_classify(request: bytes, context) -> bytes:
        img = _decode_image(request)
        if img is None:
            context.abort(grpc.StatusCode.INVALID_ARGUMENT,
                          "request body is not a decodable image")
        out = service.detect_embed_classify(img)
        return json.dumps({
            "bboxes": np.asarray(out["bboxes"]).tolist(),
            "confs": np.asarray(out["confs"]).reshape(-1).tolist(),
            "embeddings": np.asarray(out["embeddings"]).tolist(),
            "labels": list(out["labels"]),
        }).encode()

    handlers = {
        "Health": grpc.unary_unary_rpc_method_handler(
            health, request_deserializer=_IDENT, response_serializer=_IDENT),
        "Detect": grpc.unary_unary_rpc_method_handler(
            detect, request_deserializer=_IDENT, response_serializer=_IDENT),
        "DetectEmbedClassify": grpc.unary_unary_rpc_method_handler(
            detect_embed_classify, request_deserializer=_IDENT,
            response_serializer=_IDENT),
    }
    server = grpc.server(futures.ThreadPoolExecutor(max_workers=max_workers))
    server.add_generic_rpc_handlers((
        grpc.method_handlers_generic_handler("fdrt.FaceService", handlers),
    ))
    server.add_insecure_port(f"{host}:{port}")
    return server


def serve_grpc(cfg: ServiceConfig = None, host: str = "0.0.0.0",
               port: int = 8081, block: bool = True,
               dynamic_batching: int = 0, warmup_shapes=((576, 1024),)):
    """Start the gRPC service (compiles before accepting traffic, like the
    Triton readiness ping the reference polls 100 times — plus a fused-
    program warmup at the production resolution, the Triton model_warmup
    equivalent, so the first real request doesn't pay the XLA compile)."""
    service = FaceService(cfg or ServiceConfig())
    service.ready()
    if warmup_shapes:
        service.warmup(shapes=warmup_shapes)
    if dynamic_batching:
        service.enable_dynamic_batching(max_batch=dynamic_batching)
    server = make_grpc_server(service, host, port)
    server.start()
    if block:
        server.wait_for_termination()
    return server


# ---- client side (the reference's TritonServerInferenceSession slot) ----


def grpc_call(addr: str, method: str, payload: bytes = b"",
              metadata=None) -> bytes:
    import grpc

    with grpc.insecure_channel(addr) as channel:
        fn = channel.unary_unary(f"/fdrt.FaceService/{method}",
                                 request_serializer=_IDENT,
                                 response_deserializer=_IDENT)
        return fn(payload, metadata=metadata)


def grpc_detect(addr: str, jpeg_bytes: bytes,
                det_thres: float = None, bbox_area_thres: float = None):
    """JPEG bytes -> dict with num_faces/bboxes/confs."""
    md = []
    if det_thres is not None:
        md.append(("det-thres", str(det_thres)))
    if bbox_area_thres is not None:
        md.append(("bbox-area-thres", str(bbox_area_thres)))
    return json.loads(grpc_call(addr, "Detect", jpeg_bytes, md or None))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--detector", default="yolov5s")
    ap.add_argument("--rect", action="store_true",
                    help="rect letterbox inference (yolov5 families)")
    ap.add_argument("--dynamic-batch", type=int, default=0)
    ap.add_argument("--ckpt", default=None,
                    help="detector weights (orbax dir / .pt / .caffemodel "
                         "/ .pb / .xml)")
    ap.add_argument("--embed-ckpt", default=None)
    ap.add_argument("--ag-ckpt", default=None)
    args = ap.parse_args()
    serve_grpc(ServiceConfig(detector=args.detector, rect=args.rect,
                             ckpt=args.ckpt, embed_ckpt=args.embed_ckpt,
                             ag_ckpt=args.ag_ckpt),
               port=args.port,
               dynamic_batching=args.dynamic_batch)
