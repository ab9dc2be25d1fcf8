"""HTTP front door for FaceService — the thin cross-process shim.

The reference's serving boundary is gRPC to Dockerized Triton
(``triton_utils.py:13-36``); here the ensemble is in-process (service.py) and
this stdlib HTTP server only exists for callers in other processes/languages.

Protocol (JSON + base64 or raw JPEG bytes):
    GET  /health               -> {"ready": true}
    GET  /stats                -> request/dispatch counters, cache sizes
    POST /detect   (image/jpeg body, query det_thres/bbox_area_thres)
        -> {"bboxes": [[x1,y1,x2,y2],...], "confs": [...]}
    POST /ensemble (image/jpeg body)
        -> {"bboxes", "confs", "embeddings", "labels"}

Run: python -m face_detection_and_recognition_tpu.serving.http_server
"""
from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

import cv2
import numpy as np

from .service import FaceService, ServiceConfig


def make_handler(service: FaceService):
    class Handler(BaseHTTPRequestHandler):
        def _send(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # quiet
            pass

        def do_GET(self):
            path = urlparse(self.path).path
            if path == "/health":
                self._send(200, {"ready": True})
            elif path == "/stats":
                # observability (Triton exposes /metrics; ours is JSON):
                # dynamic-batching coalescing rate + engine cache size
                b = service._batcher
                self._send(200, {
                    "dynamic_batching": b is not None,
                    "requests": getattr(b, "requests", 0),
                    "dispatches": getattr(b, "dispatches", 0),
                    "compiled_pipelines": len(service.engine._pipeline_cache),
                    "detector": service.cfg.detector,
                })
            else:
                self._send(404, {"error": "not found"})

        def _read_image(self):
            length = int(self.headers.get("Content-Length", 0))
            arr = np.frombuffer(self.rfile.read(length), np.uint8)
            if arr.size == 0:  # cv2.imdecode RAISES on an empty buffer
                return None
            return cv2.imdecode(arr, cv2.IMREAD_COLOR)

        def do_POST(self):
            # a malformed request must come back as a JSON 400, not a
            # dropped connection (the gRPC twin maps these to
            # INVALID_ARGUMENT) — keep the whole request path guarded
            try:
                url = urlparse(self.path)
                q = parse_qs(url.query)
                img = self._read_image()
                if img is None:
                    self._send(400, {"error": "cannot decode image"})
                    return
                if url.path == "/detect":
                    dt = (float(q["det_thres"][0])
                          if "det_thres" in q else None)
                    at = (float(q["bbox_area_thres"][0])
                          if "bbox_area_thres" in q else None)
                elif url.path != "/ensemble":
                    self._send(404, {"error": "not found"})
                    return
            except (ValueError, KeyError, IndexError) as e:
                self._send(400, {"error": f"bad request: {e}"})
                return
            if url.path == "/detect":
                faces, bboxes, confs = service.detect_faces(img, dt, at)
                self._send(200, {
                    "bboxes": bboxes.tolist(),
                    "confs": confs.ravel().tolist(),
                    "num_faces": int(faces.shape[0]),
                })
            else:
                out = service.detect_embed_classify(img)
                self._send(200, {
                    "bboxes": out["bboxes"].tolist(),
                    "confs": out["confs"].ravel().tolist(),
                    "embeddings": out["embeddings"].tolist(),
                    "labels": out["labels"],
                })

    return Handler


def serve(cfg: ServiceConfig = None, host: str = "0.0.0.0", port: int = 8081,
          block: bool = True, dynamic_batching: int = 0,
          warmup_shapes=((576, 1024),)):
    service = FaceService(cfg or ServiceConfig())
    service.ready()
    # pre-compile the FUSED program at the production resolution(s) — the
    # readiness probe alone compiles a 64x64 plain-detect program a real
    # /detect request never hits, so without this the first request pays
    # the full XLA compile
    if warmup_shapes:
        service.warmup(shapes=warmup_shapes)
    if dynamic_batching:
        # concurrent HTTP requests of one resolution share fused dispatches
        service.enable_dynamic_batching(max_batch=dynamic_batching)
    httpd = ThreadingHTTPServer((host, port), make_handler(service))
    if block:
        httpd.serve_forever()
        return httpd
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    return httpd


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--port", type=int, default=8081)
    ap.add_argument("--detector", default="yolov5s")
    ap.add_argument("--rect", action="store_true",
                    help="rect letterbox inference (yolov5 families)")
    ap.add_argument("--dynamic-batch", type=int, default=0,
                    help="coalesce concurrent requests into batches of N")
    ap.add_argument("--ckpt", default=None,
                    help="detector weights (orbax dir / .pt / .caffemodel "
                         "/ .pb / .xml)")
    ap.add_argument("--embed-ckpt", default=None)
    ap.add_argument("--ag-ckpt", default=None)
    args = ap.parse_args()
    serve(ServiceConfig(detector=args.detector, rect=args.rect,
                        ckpt=args.ckpt, embed_ckpt=args.embed_ckpt,
                        ag_ckpt=args.ag_ckpt),
          port=args.port,
          dynamic_batching=args.dynamic_batch)
