"""In-process face service — the Triton-ensemble equivalent.

The reference serves four Docker-launched Triton servers (SURVEY.md §2.4):
an ensemble graph (ONNX yolov5s + python-backend postprocess returning
112x112 face crops, ``face_detection_trt_server``), a facenet embedder
(160x160 prewhitened -> 128-d), and age/gender heads — all wired over gRPC
with a 100-retry readiness ping.

On TPU the whole ensemble collapses into XLA program composition: detector
backbone -> decode/NMS -> batched crop -> embedder runs as fused jitted
programs on HBM in ONE process; the container/gRPC/scheduler machinery
disappears. ``FaceService`` exposes the same logical API surface, including
the ensemble's exact I/O contract (faces [-1, 3, 112, 112] normalized to
(-1, 1) CHW, bboxes, confs, and the [[0, 0, 0, 0]] no-face sentinel,
``face_detection_trt_server/inference.py:94-98``). A thin HTTP front door
(serving/http_server.py) survives for cross-process callers.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import numpy as np

from ..core.engine import EngineConfig, FaceEngine

NO_FACE_SENTINEL = np.array([[0, 0, 0, 0]], np.float32)


@dataclasses.dataclass
class ServiceConfig:
    detector: str = "yolov5s"
    det_thres: float = 0.70
    bbox_area_thres: float = 0.10
    max_det: int = 32
    face_size: Tuple[int, int] = (112, 112)
    with_embedder: bool = True
    with_age_gender: bool = True
    # device mesh for data-parallel serving: None = single device, or a
    # jax.sharding.Mesh with a "data" axis — batched ensemble dispatches
    # shard the frame batch over it (multi-chip serving, SURVEY §2.7)
    mesh: object = None
    # rect letterbox inference (yolov5 families): same detections, ~1.5x
    # detector throughput on 16:9 frames (BENCHMARKS.md)
    rect: bool = False
    # weight artifacts loaded at construction (any format engine.load_*
    # accepts: orbax dir, .pt/.pth, .caffemodel, .pb, .xml, SavedModel/.h5).
    # None = random init — fine for shape/perf testing, NOT for serving
    # (the reference's Triton servers always load real model files)
    ckpt: Optional[str] = None
    embed_ckpt: Optional[str] = None
    ag_ckpt: Optional[str] = None


class FaceService:
    """Single-process serving facade over a FaceEngine."""

    def __init__(self, cfg: ServiceConfig = ServiceConfig()):
        self.cfg = cfg
        self.mesh = cfg.mesh
        self.engine = FaceEngine(
            EngineConfig(
                detector=cfg.detector,
                det_thres=cfg.det_thres,
                bbox_area_thres=cfg.bbox_area_thres,
                max_det=cfg.max_det,
                embedder="mobile_facenet" if cfg.with_embedder else None,
                with_age_gender=cfg.with_age_gender,
                rect=cfg.rect,
            )
        )
        if cfg.ckpt:
            self.engine.load_weights(cfg.ckpt)
        if cfg.embed_ckpt:
            self.engine.load_embed_weights(cfg.embed_ckpt)
        if cfg.ag_ckpt:
            self.engine.load_age_gender_weights(cfg.ag_ckpt)

    def _ensemble(self, imgs, *args, **kw):
        """Route every batched ensemble dispatch through the mesh when
        configured, padding the frame batch up to a data-axis multiple
        (XLA requires the sharded axis to divide evenly) and slicing the
        padding back off every result field."""
        if self.mesh is None:
            return self.engine.detect_embed_classify_batch(imgs, *args, **kw)
        n = int(self.mesh.shape["data"])
        b = len(imgs)
        pad = (-b) % n
        if pad:
            imgs = np.concatenate(
                [imgs, np.zeros((pad,) + imgs.shape[1:], imgs.dtype)])
        res = self.engine.detect_embed_classify_batch(
            imgs, *args, mesh=self.mesh, **kw)
        if not pad:
            return res
        import dataclasses as dc

        import jax

        def unpad(x):
            return jax.tree_util.tree_map(lambda a: a[:b], x)

        return dc.replace(
            res, det=unpad(res.det), crops=unpad(res.crops),
            embeddings=None if res.embeddings is None else unpad(res.embeddings),
            age_probs=None if res.age_probs is None else unpad(res.age_probs),
            gender_probs=None if res.gender_probs is None
            else unpad(res.gender_probs))

    def ready(self) -> bool:
        """Readiness probe (replaces the Triton 100-retry ping): runs a tiny
        detection to force compilation."""
        dummy = np.zeros((64, 64, 3), np.uint8)
        self.engine.detect_image(dummy)
        return True

    def warmup(self, shapes=((576, 1024),), batches=(1,)) -> None:
        """Pre-compile the fused program for the resolutions production
        traffic will send (Triton model_warmup equivalent) so the first real
        request never pays a 20-40s XLA compile."""
        for h, w in shapes:
            for b in batches:
                img = np.zeros((b, h, w, 3), np.uint8)
                if self.engine.spec.input_size == (-1, -1):
                    self.engine.detect_batch(img)
                else:
                    self._ensemble(
                        img, crop_size=self.cfg.face_size,
                        want_embed=False, want_ag=False)

    # ---- dynamic batching (Triton config.pbtxt dynamic_batching) ----

    def enable_dynamic_batching(self, max_batch: int = 8,
                                max_delay_ms: float = 4.0,
                                preferred_batch_sizes=None):
        """Coalesce concurrent detect_faces calls into shared fused-ensemble
        dispatches (grouped by image shape + thresholds). Returns the
        batcher for observability (dispatch/request counters).
        ``preferred_batch_sizes`` are the compiled padding buckets
        (Triton's preferred_batch_size; default powers of two)."""
        from .batcher import DynamicBatcher

        def run_batch(imgs, key):
            _, dt, at = key
            res = self._ensemble(
                imgs, dt, at, crop_size=self.cfg.face_size,
                want_embed=False, want_ag=False)
            # fetch the tiny validity mask FIRST: the crops tensor is the
            # expensive transfer ([B, max_det, 112, 112, 3] f32 — tens of MB
            # at batch 8), and frames without faces never need it. Fetch
            # crop rows only for images that HAVE faces, in one transfer.
            valid = np.asarray(res.det.valid)
            has = valid.any(axis=1)
            if not has.any():
                return [self._contract_tuple(valid[i], None, None)
                        for i in range(len(imgs))]
            posts = res.det.to_numpy()          # once, not once per index
            import jax

            fetched = jax.device_get([res.crops[i]
                                      for i in np.nonzero(has)[0]])
            crops = dict(zip(np.nonzero(has)[0].tolist(), fetched))
            return [self._contract_tuple(valid[i], crops.get(i), posts[i])
                    for i in range(len(imgs))]

        self._batcher = DynamicBatcher(
            run_batch, max_batch=max_batch, max_delay_ms=max_delay_ms,
            preferred_batch_sizes=preferred_batch_sizes)
        return self._batcher

    _batcher = None

    def _contract_tuple(self, valid_mask, crops_hwc, post):
        """ONE home for the ensemble I/O contract (faces CHW (-1, 1),
        bboxes, confs — or the no-face sentinel): the unbatched, dynamic-
        batching, and staged paths all emit through here so the contract
        cannot silently diverge between them."""
        m = np.asarray(valid_mask)
        if not m.any():
            return (np.zeros((0, 3, *self.cfg.face_size), np.float32),
                    NO_FACE_SENTINEL.copy(), np.zeros((0, 1), np.float32))
        faces = (np.asarray(crops_hwc)[m] - 127.5) / 127.5
        return (faces.transpose(0, 3, 1, 2).astype(np.float32),
                np.asarray(post.boxes, np.float32),
                np.asarray(post.bbox_confs, np.float32)[:, None])

    def _faces_out(self, res, i: int):
        """Slice image ``i`` of a fused EnsembleResult into the ensemble
        contract tuple (faces CHW (-1,1), bboxes, confs / sentinel).

        Fetches the validity mask FIRST: the no-face case (most frames)
        returns the sentinel after one tiny transfer instead of paying the
        full Detections fetch + a crops-tensor device slice."""
        m = np.asarray(res.det.valid[i])
        if not m.any():
            return self._contract_tuple(m, None, None)
        return self._contract_tuple(m, res.crops[i], res.det.to_numpy()[i])

    # ---- ensemble contract (face_detection_trt_server) ----

    def detect_faces(
        self,
        image_bgr: np.ndarray,
        det_thres: Optional[float] = None,
        bbox_area_thres: Optional[float] = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """image -> (faces [N, 3, 112, 112] in (-1, 1) CHW, bboxes [N, 4],
        confs [N, 1]); no faces -> (empty, [[0, 0, 0, 0]], empty) like the
        reference sentinel."""
        if self.engine.spec.input_size == (-1, -1):
            # native-resolution cascade (mtcnn): staged detect + crop
            return self._faces_staged(image_bgr, det_thres, bbox_area_thres)
        if self._batcher is not None:
            # concurrent callers share one fused dispatch (Triton
            # dynamic_batching semantics)
            return self._batcher.submit(image_bgr,
                                        key=(det_thres, bbox_area_thres))
        # thresholds are traced arguments of the fused program: per-call
        # overrides (the ensemble contract) cost no recompile and are
        # thread-safe under ThreadingHTTPServer
        res = self._ensemble(
            image_bgr[None], det_thres, bbox_area_thres,
            crop_size=self.cfg.face_size,
            want_embed=False, want_ag=False,   # Detect returns crops only
        )
        return self._faces_out(res, 0)

    def _faces_staged(self, image_bgr, det_thres=None, bbox_area_thres=None):
        """Staged ensemble-contract path for detectors the fused program
        cannot trace (native-resolution cascades)."""
        import jax.numpy as jnp

        from ..ops.crop import crop_and_resize

        post = self.engine.detect_image(image_bgr, det_thres, bbox_area_thres)
        n = len(post.boxes)
        if not n:
            return self._contract_tuple(np.zeros(1, bool), None, None)
        crops = crop_and_resize(jnp.asarray(image_bgr),
                                jnp.asarray(post.boxes, jnp.float32),
                                self.cfg.face_size)
        return self._contract_tuple(np.ones(n, bool), crops, post)

    # ---- facenet server contract ----

    def embed(self, faces_bgr: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] BGR face crops -> [N, D] embeddings in ONE batched
        program (the facenet server prewhitens 160x160 input; our embedder
        takes 112x112 with (-1, 1) norm — same logical slot)."""
        if faces_bgr.shape[0] == 0:
            return np.zeros((0, 512), np.float32)
        return self.engine.embed_crops(np.asarray(faces_bgr))

    # ---- age/gender server contract ----

    def age_gender(self, faces_bgr: np.ndarray):
        """[N, H, W, 3] BGR crops -> (age_probs [N, 8], gender_probs [N, 2])
        in one batched program (replaces two separate Triton servers)."""
        return self.engine.classify_crops_age_gender(np.asarray(faces_bgr))

    def detect_embed_classify(self, image_bgr: np.ndarray):
        """The full ensemble in one call: detections + embeddings + age/gender
        labels — ONE fused XLA dispatch where Triton needed three containers
        and two gRPC hops, with no host round-trip or uint8 re-quantization
        between the stages."""
        if self.engine.spec.input_size == (-1, -1):  # staged (mtcnn)
            faces_chw, bboxes, confs = self._faces_staged(image_bgr)
            if faces_chw.shape[0] == 0:
                return {"bboxes": bboxes, "confs": confs,
                        "embeddings": np.zeros((0, 512), np.float32),
                        "labels": []}
            faces = (faces_chw.transpose(0, 2, 3, 1) * 127.5) + 127.5
            out = {"bboxes": bboxes, "confs": confs,
                   "embeddings": self.embed(faces)
                   if self.engine._embed is not None
                   else np.zeros((len(bboxes), 512), np.float32)}
            if self.engine._classify_ag is not None:
                from ..models.age_gender import labels_from_probs

                a, g = self.age_gender(faces)
                out["labels"] = list(labels_from_probs(a, g))
            else:
                out["labels"] = []
            return out
        res = self._ensemble(image_bgr[None])
        m = np.asarray(res.det.valid[0])
        if not m.any():
            return {"bboxes": NO_FACE_SENTINEL.copy(),
                    "confs": np.zeros((0, 1), np.float32),
                    "embeddings": np.zeros(
                        (0, self.engine.embed_spec.dim
                         if self.engine.embed_spec else 512), np.float32),
                    "labels": []}
        post = res.det.to_numpy()[0]
        out = {"bboxes": np.asarray(post.boxes, np.float32),
               "confs": np.asarray(post.bbox_confs, np.float32)[:, None]}
        out["embeddings"] = (np.asarray(res.embeddings[0])[m]
                             if res.embeddings is not None
                             else np.zeros((int(m.sum()), 512), np.float32))
        if res.age_probs is not None:
            from ..models.age_gender import labels_from_probs

            out["labels"] = list(labels_from_probs(
                np.asarray(res.age_probs[0])[m],
                np.asarray(res.gender_probs[0])[m]))
        else:
            out["labels"] = []
        return out
