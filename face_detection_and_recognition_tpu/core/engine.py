"""FaceEngine: the single engine replacing the reference's per-backend glue.

Composes preprocess -> detector -> postprocess -> crop -> embed/age-gender as
jitted programs over batched NHWC tensors. This is the TPU equivalent of the
reference's L5/L6 layers (``modules/models/base.py`` +
``modules/utils/inference.py``) and of the Triton ensemble graph
(``modules/face_detection_trt_server``): the whole detector->crop->embedder
chain lives in one XLA program on HBM instead of a gRPC-wired container
pipeline.

Per-resolution compilation: preprocessing depends on the input image shape,
so each unique source resolution traces once and is cached (a video stream
costs exactly one compile).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import registry
from ..models.age_gender import labels_from_probs, make_age_gender
from ..ops import preprocess as P
from ..ops.crop import crop_and_resize, pad_boxes
from .detections import Detections, PostProcessedDetection, postprocess_detections


@dataclasses.dataclass
class EngineConfig:
    detector: str = "yolov5s"
    det_thres: float = 0.70
    bbox_area_thres: float = 0.12
    max_det: int = 64
    embedder: Optional[str] = None          # "mobile_facenet" | None
    with_age_gender: bool = False
    dtype: Any = jnp.float32
    seed: int = 0
    detector_overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)


class FaceEngine:
    """One engine, any registered detector, optional embedder / age+gender."""

    def __init__(self, cfg: EngineConfig):
        self.cfg = cfg
        self.spec = registry.get(cfg.detector)
        # an input_size override must also retarget the preprocess recipe
        ov_size = cfg.detector_overrides.get("input_size")
        if ov_size and self.spec.input_size != (-1, -1):
            ov_size = tuple(ov_size)
            self.spec = dataclasses.replace(
                self.spec, input_size=ov_size,
                preprocess=dataclasses.replace(self.spec.preprocess,
                                               size=ov_size),
            )
        rng = jax.random.PRNGKey(cfg.seed)
        self.net, self.variables, self._detect = self.spec.build(
            rng=rng, dtype=cfg.dtype, **cfg.detector_overrides
        )
        self._pipeline_cache: Dict[Tuple[int, int, int], Any] = {}

        self.embed_net = self.embed_vars = self._embed = None
        self.embed_spec = None
        if cfg.embedder is not None:
            from ..models.embedders import get_embedder

            self.embed_spec = get_embedder(cfg.embedder)
            self.embed_net, self.embed_vars, self._embed = self.embed_spec.build(
                rng=jax.random.fold_in(rng, 1), dtype=cfg.dtype
            )

        self.ag_vars = self._classify_ag = None
        if cfg.with_age_gender:
            _, self.ag_vars, self._classify_ag = make_age_gender(
                rng=jax.random.fold_in(rng, 2), dtype=cfg.dtype
            )

    # ---------------- detection ----------------

    @property
    def input_size(self) -> Tuple[int, int]:
        return self.spec.input_size

    def _pipeline_for(self, shape: Tuple[int, int, int]):
        """Fused preprocess+detect+postprocess for one source resolution."""
        if shape in self._pipeline_cache:
            return self._pipeline_cache[shape]
        h, w = shape[:2]
        native = self.spec.input_size == (-1, -1)
        in_size = (w, h) if native else self.spec.input_size
        spec_pre = self.spec.preprocess
        max_det = self.cfg.max_det

        # thresholds are TRACED arguments: per-call overrides (the Triton
        # ensemble contract) cost zero recompiles and are thread-safe
        @jax.jit
        def run(variables, imgs, det_thres, area_thres):
            if native:
                x = imgs  # cascade handles its own preprocessing
            else:
                x = P.apply_preprocess_batch(imgs, spec_pre)
            dets, valid = self._detect(variables, x)
            dets = dets[:, :max_det]
            valid = valid[:, :max_det]
            return postprocess_detections(
                dets, valid, (w, h), in_size, det_thres, area_thres
            )

        self._pipeline_cache[shape] = run
        return run

    def detect_batch(
        self, imgs: np.ndarray, det_thres: float = None,
        bbox_area_thres: float = None,
    ) -> Detections:
        """imgs: [B, H, W, 3] BGR uint8 (same resolution). Returns Detections
        with boxes/landmarks in original pixels. Optional per-call thresholds
        override the engine config without recompilation."""
        run = self._pipeline_for(tuple(imgs.shape[1:]))
        dt = self.cfg.det_thres if det_thres is None else det_thres
        at = self.cfg.bbox_area_thres if bbox_area_thres is None else bbox_area_thres
        return run(self.variables, imgs, jnp.float32(dt), jnp.float32(at))

    def detect_batch_sharded(self, imgs: np.ndarray, mesh) -> Detections:
        """Multi-chip data-parallel detection: the frame batch is sharded
        over the mesh 'data' axis, variables replicated; XLA partitions the
        whole preprocess+detect+postprocess program (SURVEY §2.7 item 1)."""
        from ..parallel.sharding import batch_sharding, replicate_to_mesh

        run = self._pipeline_for(tuple(imgs.shape[1:]))
        variables = replicate_to_mesh(self.variables, mesh)
        imgs = jax.device_put(np.asarray(imgs), batch_sharding(mesh, 4))
        return run(variables, imgs, jnp.float32(self.cfg.det_thres),
                   jnp.float32(self.cfg.bbox_area_thres))

    def detect_image(
        self, img: np.ndarray, det_thres: float = None,
        bbox_area_thres: float = None,
    ) -> PostProcessedDetection:
        """Single cv2 BGR image -> per-image ragged result (the reference's
        inference_img postprocessing contract)."""
        return self.detect_batch(
            img[None], det_thres, bbox_area_thres
        ).to_numpy()[0]

    def detect_raw(self, img: np.ndarray) -> np.ndarray:
        """Reference ``Model.__call__`` contract: [N, 4+L+1] normalized to
        model input size, threshold-unfiltered (conf in last column)."""
        native = self.spec.input_size == (-1, -1)
        if native:
            x = img[None]
        else:
            x = P.apply_preprocess_batch(img[None], self.spec.preprocess)
        dets, valid = self._detect(self.variables, x)
        d, v = np.asarray(dets[0]), np.asarray(valid[0])
        return d[v]

    # ---------------- cropping + embedding ----------------

    def embed_faces(
        self, img: np.ndarray, boxes: np.ndarray,
        offsets: Tuple[float, float, float, float] = None,
    ) -> np.ndarray:
        """Crop faces (optionally offset like the reference's extraction
        crops) and produce [N, D] L2-normalized embeddings."""
        if self._embed is None:
            raise RuntimeError("engine built without an embedder")
        spec = self.embed_spec
        if len(boxes) == 0:
            return np.zeros((0, spec.dim), np.float32)
        h, w = img.shape[:2]
        b = jnp.asarray(boxes, jnp.float32)
        if offsets is not None:
            b = pad_boxes(b, offsets, img_wh=(w, h))
        ew, eh = spec.input_size
        crops = crop_and_resize(jnp.asarray(img), b, (eh, ew))
        from ..models.embedders import preprocess_crops

        return np.asarray(self._embed(self.embed_vars,
                                      preprocess_crops(spec, crops)))

    def detect_and_embed(self, img: np.ndarray):
        """Full ensemble on one image: detections + embeddings."""
        post = self.detect_image(img)
        dim = self.embed_spec.dim if self.embed_spec else 512
        emb = self.embed_faces(img, post.boxes) if len(post.boxes) else (
            np.zeros((0, dim), np.float32)
        )
        return post, emb

    # ---------------- age / gender cascade ----------------

    def detect_age_gender(self, img: np.ndarray):
        """Two-stage cascade equivalent of OpenCVFaceDetAgeGenderModel
        (``modules/opencv2_dnn/model.py:106-159``): detect, crop with +-5px
        padding, classify all faces in ONE batched pass, and attach
        'Gender:conf,(age):conf' labels."""
        if self._classify_ag is None:
            raise RuntimeError("engine built without age/gender heads")
        post = self.detect_image(img)
        if len(post.boxes) == 0:
            post.bbox_labels = []
            return post
        h, w = img.shape[:2]
        b = pad_boxes(jnp.asarray(post.boxes, jnp.float32), (-5, -5, 5, 5),
                      img_wh=(w, h))
        crops = crop_and_resize(jnp.asarray(img), b, (227, 227))
        crops = crops - jnp.asarray(P.AGE_GENDER.mean, jnp.float32)
        a, g = self._classify_ag(self.ag_vars[0], self.ag_vars[1], crops)
        post.bbox_labels = list(labels_from_probs(a, g))
        return post
