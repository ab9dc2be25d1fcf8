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
import os
from functools import partial
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models import registry
from ..models.age_gender import labels_from_probs, make_age_gender
from ..ops import preprocess as P
from ..ops.crop import crop_and_resize, pad_boxes
from ..ops.platform import on_tpu as _on_tpu
from .detections import Detections, PostProcessedDetection, postprocess_detections


@dataclasses.dataclass
class EnsembleResult:
    """Output of the fused detect->crop->embed->classify program.

    All arrays are fixed-shape [B, K, ...] aligned with ``det.valid`` — the
    device-side equivalent of the Triton ensemble's ragged outputs
    (``modules/face_detection_trt_server/models/ensemble_yolov5_face/
    config.pbtxt``). ``crops`` are raw-pixel f32 BGR face crops (invalid rows
    zeroed); ``embeddings``/``age_probs``/``gender_probs`` are None when the
    engine was built without that stage.
    """

    det: Detections
    crops: Any                       # [B, K, ch, cw, 3] f32 raw pixels
    embeddings: Optional[Any] = None  # [B, K, D]
    age_probs: Optional[Any] = None   # [B, K, 8]
    gender_probs: Optional[Any] = None  # [B, K, 2]


@dataclasses.dataclass
class EngineConfig:
    detector: str = "yolov5s"
    det_thres: float = 0.70
    bbox_area_thres: float = 0.12
    max_det: int = 64
    embedder: Optional[str] = None          # "mobile_facenet" | None
    with_age_gender: bool = False
    # rect letterbox inference (fully-convolutional detectors only): each
    # source resolution compiles at the smallest stride-multiple canvas its
    # letterbox fits in, instead of the square input_size — identical
    # resized interior, less constant padding through the HBM-bound
    # backbone (576x1024 -> 384x640 = 40% fewer pixel bytes)
    rect: bool = False
    dtype: Any = jnp.float32
    seed: int = 0
    detector_overrides: Dict[str, Any] = dataclasses.field(default_factory=dict)


def ensure_compile_cache() -> None:
    """Enable jax's persistent compilation cache for every engine consumer
    (CLIs, pipelines, serving). Tests/bench set their own dir; without this
    a cold CLI process re-compiles the full pipeline (XLA + Mosaic warmup
    cost 30-300s on the axon tunnel). Honors JAX_COMPILATION_CACHE_DIR."""
    import os

    import jax

    try:
        if jax.config.jax_compilation_cache_dir:
            return
        default = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(os.path.expanduser("~"), ".cache", "fdrt_jax"),
        )
        os.makedirs(default, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", default)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a failure
        pass


class FaceEngine:
    """One engine, any registered detector, optional embedder / age+gender."""

    def __init__(self, cfg: EngineConfig):
        ensure_compile_cache()
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
        self._pipeline_cache: Dict[Any, Any] = {}  # LRU, insertion-ordered
        # key -> frozenset of weight groups ("det"/"embed"/"ag") the entry
        # closes over; entries that take variables as call arguments carry
        # an empty set and survive rebinds
        self._baked_groups: Dict[Any, frozenset] = {}
        # PER-GROUP monotonic stamps bumped on each group's rebind; baked
        # cache keys carry the version(s) of only the group(s) they close
        # over, so a stale compiled program can never be served even if an
        # invalidation path is missed (advisor r2 finding #1) — and
        # rebinding embed/ag weights leaves baked DETECT pipelines
        # reachable instead of forcing a multi-minute recompile
        # (advisor r4 finding #1)
        self._weights_versions = {"det": 0, "embed": 0, "ag": 0}
        self._scalar_cache: Dict[float, Any] = {}
        import threading

        self._compile_lock = threading.RLock()
        self.net, self.variables, self._detect = self.spec.build(
            rng=rng, dtype=cfg.dtype, **cfg.detector_overrides
        )
        in_dims = getattr(self.net, "input_dims", None)
        if in_dims and len(in_dims) == 4:
            # graph-executor nets (openvino-ir) carry their own input size;
            # retarget the preprocess recipe to the file's Parameter shape
            size = (int(in_dims[3]), int(in_dims[2]))  # NCHW -> (w, h)
            if size != self.spec.input_size:
                self.spec = dataclasses.replace(
                    self.spec, input_size=size,
                    preprocess=dataclasses.replace(self.spec.preprocess,
                                                   size=size))

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

    # compiled pipelines CLOSE OVER the weight trees (passing the ~300-leaf
    # pytree per dispatch costs ~2 ms through a tunneled TPU), so any
    # assignment to them must invalidate the cache — property setters make
    # `engine.variables = ...` (the eval_wider pattern) safe, not just
    # load_weights().
    #
    # CONTRACT: weights update by REBIND ONLY. The trees returned by these
    # properties are FROZEN views (utils/frozen.py): in-place mutation
    # (engine.variables["params"][k] = new_leaf) RAISES TypeError instead of
    # silently serving stale compiled constants. Mutators must write
    # `engine.variables = new_tree` (cheap: the dict swap just clears the
    # pipeline cache and bumps the weights version).
    @property
    def variables(self):
        """Detector weights (read-only view). REBIND-ONLY contract:
        compiled pipelines bake the pytree into their closures, so the only
        way to change weights is assignment through this setter (or
        ``load_weights``) — which invalidates the baked programs and bumps
        the "det" weights version. In-place mutation of the returned tree
        raises
        ``TypeError``; copy with ``utils.frozen.thaw`` first."""
        return self._variables

    @variables.setter
    def variables(self, v):
        from ..utils.frozen import freeze

        self._variables = freeze(v)
        self._invalidate_baked("det")

    @property
    def embed_vars(self):
        """Embedder weights (read-only view) — same rebind-only contract as
        :attr:`variables`."""
        return self._embed_vars

    @embed_vars.setter
    def embed_vars(self, v):
        from ..utils.frozen import freeze

        self._embed_vars = freeze(v)
        self._invalidate_baked("embed")

    @property
    def ag_vars(self):
        """Age/gender ``(age_vars, gen_vars)`` (read-only view) — same
        rebind-only contract as :attr:`variables`."""
        return self._ag_vars

    @ag_vars.setter
    def ag_vars(self, v):
        from ..utils.frozen import freeze

        self._ag_vars = freeze(v)
        self._invalidate_baked("ag")

    def _invalidate_baked(self, group: str) -> None:
        """Drop only the compiled programs that close over the rebound
        weight group — with-vars pipelines, detect_raw, and sharded
        ensembles take variables as call arguments and survive (e.g. the
        golden-ag train loop rebinds ag_vars per eval; its detect pipeline
        must not re-pay a multi-minute axon compile each time). Also bumps
        THIS group's version so baked keys stamped with it before this
        rebind can never hit again (belt-and-braces against missed
        invalidation) — and pops exactly those now-unreachable entries so
        stale programs don't occupy LRU slots. Other groups' versions (and
        their baked programs) are untouched."""
        self._weights_versions[group] += 1
        for key in [k for k, g in self._baked_groups.items() if group in g]:
            self._pipeline_cache.pop(key, None)
            self._baked_groups.pop(key, None)

    # ---------------- weights ----------------

    def load_weights(self, path: str) -> None:
        """Load real detector weights from ANY reference format, dispatched
        by extension (the per-format importers live in utils/weights.py and
        utils/model_formats.py):

          .pt/.pth          torch state dict (yolov5-face zoo, blazeface)
          .caffemodel       Caffe NetParameter (ssd-resnet10 class)
          .pb               frozen TF GraphDef (mtcnn cascade)
          .xml              OpenVINO IR (sibling .bin; OV SSD class)
          anything else     orbax checkpoint of our own variables tree

        Invalidates compiled pipelines so the next call re-traces with the
        loaded constants."""
        from ..utils import weights as W

        ext = os.path.splitext(path)[1].lower()
        name = self.spec.name
        if ext in (".pt", ".pth"):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=False)
            for key in ("state_dict", "model"):
                if isinstance(sd, dict) and key in sd:
                    sd = sd[key]
            if hasattr(sd, "state_dict"):  # pickled torch Module
                sd = sd.state_dict()
            sd = {k.removeprefix("module."): v for k, v in sd.items()}
            if name.startswith("yolov5"):
                variables = W.convert_yolov5_face(sd, arch=name)
            elif name.startswith("blazeface"):
                variables = W.convert_blazeface(
                    sd, back_model=name.endswith("back"))
            else:
                raise ValueError(f"no torch importer for detector '{name}'")
        elif ext == ".caffemodel":
            from ..utils import model_formats as MF

            if hasattr(self.net, "pour_blobs"):  # caffe deploy-graph nets
                from ..utils.caffe_graph import read_caffemodel_graph

                variables = self.net.pour_blobs(read_caffemodel_graph(path))
            else:
                layers = MF.read_caffemodel(path)
                variables = W.structural_import(
                    W.caffe_layers_to_arrays(layers), self.variables,
                    module_order=self._execution_order())
        elif ext == ".pb":
            from ..utils import model_formats as MF

            if name == "mtcnn":
                variables = W.convert_mtcnn_graphdef(
                    MF.read_tf_graphdef(path), self.variables)
            elif hasattr(self.net, "pour_blobs"):
                # the TF-GraphDef flavor of the OpenCV face SSD
                # (opencv_face_detector_uint8.pb — the reference's
                # OpenCVFaceDetModel loads BOTH this and the .caffemodel,
                # modules/opencv2_dnn/model.py:21,30-32): dequantize +
                # pour into the res10 deploy graph
                variables = W.convert_res10_graphdef(
                    MF.read_tf_graphdef(path), self.net)
            elif name.startswith("ssd-"):
                # flax SSD twins take the same dequantized array stream
                # through the shape-checked structural pour
                consts = W.dequantize_graphdef_consts(
                    MF.read_tf_graphdef(path))
                # TF kernels are HWIO — already the flax layout the
                # structural importer expects. Filter to FLOAT ndim>=1
                # tensors first: a transform-optimized GraphDef also
                # carries non-weight consts (reshape shape vectors,
                # priorbox tables as int32) whose element count could
                # happen to match a 1-D bias slot and pour silently as
                # garbage (advisor r4 finding #2)
                arrays = [np.asarray(c.value, np.float32) for c in consts
                          if np.issubdtype(np.asarray(c.value).dtype,
                                           np.floating)
                          and np.asarray(c.value).ndim >= 1]
                variables = W.structural_import(
                    arrays, self.variables,
                    module_order=self._execution_order())
            else:
                raise ValueError(f"no GraphDef importer for '{name}'")
        elif ext == ".xml":
            from ..models.ov_graph import OVGraphNet

            if isinstance(self.net, OVGraphNet) or name == "openvino-ir":
                # the IR *is* the net: rebuild the executor from the new
                # file (topology + weights both come from the artifact)
                import jax as _jax

                from ..models.ov_graph import make_ov_detect
                from ..utils.ir_graph import parse_ir_graph

                net = OVGraphNet(parse_ir_graph(
                    path, os.path.splitext(path)[0] + ".bin"))
                self.net = net
                self._detect = _jax.jit(make_ov_detect(net))
                variables = net.init_variables()
                # the EXECUTOR changed, not just the weights: every cached
                # program (including with_vars/raw entries that survive a
                # plain rebind) was traced over the old graph and would
                # crash or silently run the old topology
                self._pipeline_cache.clear()
                self._baked_groups.clear()
            else:
                from ..utils import model_formats as MF

                consts = MF.read_openvino_ir(
                    path, os.path.splitext(path)[0] + ".bin")
                arrays = [W.c2f_conv(c.value) if c.value.ndim == 4
                          else c.value for c in consts
                          if np.issubdtype(c.value.dtype, np.floating)]
                variables = W.structural_import(
                    arrays, self.variables,
                    module_order=self._execution_order())
        else:
            from ..utils.checkpoint import load_variables

            variables = load_variables(path)
        self.variables = variables  # setter invalidates det-baked programs

    def save_weights(self, path: str) -> None:
        """Save the detector variables as an orbax checkpoint (reloadable
        with load_weights / --ckpt on any backend)."""
        from ..utils.checkpoint import save_variables

        save_variables(path, self.variables)

    def load_embed_weights(self, path: str) -> None:
        """Load real EMBEDDER weights, dispatched by artifact kind:

          <dir with saved_model.pb>   keras FaceNet SavedModel — the
                                      similar-face filter's model
                                      (filter_faces_using_reference.py:131);
                                      variables read vendor-free from the
                                      TensorBundle (utils/tensor_bundle.py)
          *.h5                        keras FaceNet HDF5 (h5py layout)
          *.pt / *.pth                mobile_facenet torch state dict
          anything else               orbax checkpoint of embed_vars
        """
        if self.embed_spec is None:
            raise ValueError("engine built without an embedder")
        from ..utils import weights as W

        name = self.embed_spec.name
        ext = os.path.splitext(path)[1].lower()
        if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "saved_model.pb")):
            from ..utils.tensor_bundle import read_tensor_bundle

            named = read_tensor_bundle(
                os.path.join(path, "variables", "variables"))
            stream = W.keras_bundle_stream(named)
            variables = W.convert_facenet_keras(
                stream, self.embed_net, self.embed_vars)
        elif ext == ".h5":
            stream = W.read_keras_h5_stream(path)
            variables = W.convert_facenet_keras(
                stream, self.embed_net, self.embed_vars)
        elif ext in (".pt", ".pth"):
            import torch

            sd = torch.load(path, map_location="cpu", weights_only=False)
            if hasattr(sd, "state_dict"):
                sd = sd.state_dict()
            if name != "mobile_facenet":
                raise ValueError(f"no torch importer for embedder '{name}'")
            variables = W.convert_mobile_facenet(sd)
        else:
            from ..utils.checkpoint import load_variables

            variables = load_variables(path)
        self.embed_vars = variables

    def load_age_gender_weights(self, path: str = None,
                                age_caffemodel: str = None,
                                gender_caffemodel: str = None) -> None:
        """Load the age/gender cascade heads.

        ``path``: an orbax checkpoint dir holding {"age": vars, "gender":
        vars} (the in-environment trained golden_ag checkpoint). Or pass the
        reference's two ``.caffemodel`` files (age_net.caffemodel /
        gender_net.caffemodel, ``modules/opencv2_dnn/model.py:49-83``)."""
        if self._classify_ag is None:
            raise ValueError("engine built without age/gender heads "
                             "(with_age_gender=True)")
        if path is not None:
            from ..utils.checkpoint import load_variables

            tree = load_variables(path)
            self.ag_vars = (tree["age"], tree["gender"])
            return
        from ..utils import model_formats as MF
        from ..utils import weights as W

        age = W.convert_caffenet_head(MF.read_caffemodel(age_caffemodel),
                                      num_classes=8)
        gen = W.convert_caffenet_head(MF.read_caffemodel(gender_caffemodel),
                                      num_classes=2)
        self.ag_vars = (age, gen)

    def _execution_order(self):
        """Leaf-module call order of the detector net (for structural weight
        streams); None for native cascades / unavailable nets."""
        if self.net is None or self.spec.input_size == (-1, -1):
            return None
        from ..utils.weights import execution_module_order

        iw, ih = self.spec.input_size
        try:
            return execution_module_order(self.net, self.variables,
                                          (1, ih, iw, 3))
        except Exception:
            return None

    # ---------------- detection ----------------

    @property
    def input_size(self) -> Tuple[int, int]:
        return self.spec.input_size

    def _pipeline_for(self, shape: Tuple[int, int, int],
                      with_vars: bool = False):
        """Fused preprocess+detect+postprocess for one source resolution.

        with_vars=False closes over ``self.variables`` (cleared from the
        cache by ``load_weights``): flattening the ~300-leaf params pytree
        on every dispatch costs ~2 ms/call through a tunneled TPU. The
        sharded path passes mesh-replicated variables explicitly.

        Thread-safe and bounded: concurrent first requests (the
        ThreadingHTTPServer pattern) serialize compilation behind a lock,
        and an adversarial client cycling novel resolutions evicts LRU
        entries instead of growing compile state without limit."""
        # baked (with_vars=False) entries key on the DET weights version: a
        # program compiled against rebound-away weights can never be
        # served, while embed/ag rebinds leave these keys reachable
        key = (shape, with_vars,
               None if with_vars else self._weights_versions["det"])
        hit = self._pipeline_cache.get(key)
        if hit is not None:
            with self._compile_lock:  # LRU touch
                if key in self._pipeline_cache:
                    self._pipeline_cache[key] = self._pipeline_cache.pop(key)
            return hit
        with self._compile_lock:
            if key in self._pipeline_cache:  # raced another compiler
                return self._pipeline_cache[key]
            return self._compile_pipeline(key)

    _PIPELINE_CACHE_MAX = 32  # distinct (resolution, with_vars) programs

    def _cache_put(self, key, run, baked=()):
        """Insert a compiled program with LRU eviction — EVERY compiled-
        program cache entry (detect, raw, ensemble, crop programs) goes
        through here so novel-resolution callers of any API are bounded.
        ``baked`` names the weight groups the program closes over (see
        _invalidate_baked). Dict ops are GIL-atomic but next(iter)/pop is
        NOT one op: two threads evicting concurrently can pick the same
        victim, so pop with a default (the compile lock only guards
        compilation, not every caller)."""
        while len(self._pipeline_cache) >= self._PIPELINE_CACHE_MAX:
            try:
                evicted = next(iter(self._pipeline_cache))
            except StopIteration:  # raced another evictor to empty
                break
            self._pipeline_cache.pop(evicted, None)
            self._baked_groups.pop(evicted, None)
        self._pipeline_cache[key] = run
        if baked:
            self._baked_groups[key] = frozenset(baked)
        return run

    def _compile_pipeline(self, key):
        shape, with_vars = key[0], key[1]
        h, w = shape[:2]
        native = self.spec.input_size == (-1, -1)
        in_size = (w, h) if native else self.spec.input_size
        spec_pre = self.spec.preprocess
        if self.cfg.rect and self.spec.rect_stride and not native:
            from ..ops.geometry import rect_letterbox_size

            in_size = rect_letterbox_size((h, w), self.spec.input_size,
                                          self.spec.rect_stride)
            spec_pre = dataclasses.replace(spec_pre, size=in_size)
        pre_dtype = self.cfg.dtype  # bf16 preprocess for bf16 backbones
        max_det = self.cfg.max_det

        # thresholds are TRACED arguments: per-call overrides (the Triton
        # ensemble contract) cost zero recompiles and are thread-safe
        def body(variables, imgs, det_thres, area_thres):
            if native:
                x = imgs  # cascade handles its own preprocessing
            else:
                x = P.apply_preprocess_batch(imgs, spec_pre, pre_dtype)
            dets, valid = self._detect(variables, x)
            dets = dets[:, :max_det]
            valid = valid[:, :max_det]
            return postprocess_detections(
                dets, valid, (w, h), in_size, det_thres, area_thres
            )

        if with_vars:
            run = jax.jit(body)
        else:
            captured = self.variables
            run = jax.jit(partial(body, captured))

        return self._cache_put(key, run,
                               baked=() if with_vars else ("det",))

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
        return run(imgs, self._scalar(dt), self._scalar(at))

    def detect_batch_sharded(self, imgs: np.ndarray, mesh) -> Detections:
        """Multi-chip data-parallel detection: the frame batch is sharded
        over the mesh 'data' axis, variables replicated; XLA partitions the
        whole preprocess+detect+postprocess program (SURVEY §2.7 item 1)."""
        from ..parallel.sharding import (batch_sharding, put_global,
                                         replicate_to_mesh)

        run = self._pipeline_for(tuple(imgs.shape[1:]), with_vars=True)
        variables = replicate_to_mesh(self.variables, mesh)
        imgs = put_global(np.asarray(imgs), batch_sharding(mesh, 4))
        return run(variables, imgs, self._scalar(self.cfg.det_thres),
                   self._scalar(self.cfg.bbox_area_thres))

    def _scalar(self, v: float):
        """Threshold scalars as CACHED device arrays: a fresh jnp.float32()
        per call is a blocking host->device transfer (several ms through a
        tunneled TPU) that would book against every detect step."""
        key = float(v)
        val = self._scalar_cache.get(key)
        if val is None:
            if len(self._scalar_cache) >= 256:  # per-request thresholds:
                self._scalar_cache.clear()      # bound the device arrays
            val = jnp.float32(key)
            self._scalar_cache[key] = val
        # return the LOCAL value: a concurrent thread hitting the 256 bound
        # can clear the dict between our insert and a dict re-read
        return val

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
        key = ("raw",) + tuple(img.shape)
        run = self._pipeline_cache.get(key)
        if run is None:
            with self._compile_lock:  # one thread traces per resolution
                run = self._pipeline_cache.get(key)
                if run is None:
                    spec_pre = self.spec.preprocess
                    pre_dtype = self.cfg.dtype

                    # preprocess traced+compiled WITH the detector (once
                    # per source resolution), not per-op dispatch per call
                    @jax.jit
                    def run(variables, imgs):
                        x = (imgs if native else P.apply_preprocess_batch(
                            imgs, spec_pre, pre_dtype))
                        return self._detect(variables, x)

                    if native:  # cascades drive their own staging
                        run = self._detect
                    self._cache_put(key, run)
        dets, valid = run(self.variables, img[None])
        d, v = jax.device_get((dets[0], valid[0]))  # one transfer, one RTT
        return np.asarray(d)[np.asarray(v)]

    # ---------------- fused ensemble ----------------

    @staticmethod
    def _masked_chunked_net(fn, xs, valid, chunk: int = 128):
        """Apply ``fn`` ([C, ...] -> pytree of [C, ...] rows) over
        validity-sorted chunks of ``xs`` [N, ...], SKIPPING all-invalid
        chunks at runtime.

        The fused ensemble's per-frame face slots are padded to max_det
        (the Triton contract), so a 32-frame x 32-slot dispatch runs 1024
        crops through the embed + age/gender nets although typical frames
        hold 0-3 faces — >10x dead compute in the two heaviest stages.
        Sorting slots by validity makes "chunk has work" == "its first
        slot is valid"; a lax.cond inside a lax.scan then executes the
        net only for chunks with work (the net is traced ONCE — per-chunk
        cond call sites would duplicate its HLO). Invalid rows return
        zeros (the ensemble's documented contract for embeddings, now
        shared by age/gender). Valid rows always run the real net, so
        results are exact."""
        n = xs.shape[0]
        nc = -(-n // chunk)
        pad = nc * chunk - n
        order = jnp.argsort(~valid)          # stable: valid slots first
        inv = jnp.argsort(order)
        # the scan carries only INDEX chunks; pixels are gathered inside the
        # live branch of the cond, so skipped chunks never touch them. (The
        # first formulation pre-sorted the full pixel tensor and scanned
        # over it: for the ensemble's [1024, 227, 227, 3] age/gender crops
        # that was ~630 MB of argsort-take plus the scan's double-buffer
        # copies — ~25 ms/step of pure data movement dwarfing the ~4 ms the
        # skipped nets actually cost. Traffic now scales with LIVE chunks.)
        order_p = (jnp.concatenate([order, jnp.zeros((pad,), order.dtype)])
                   if pad else order)
        vs = jnp.take(valid, order_p)
        if pad:  # padded entries duplicate slot 0; never let them head a
            # chunk's liveness test (they sit at the tail, but be explicit)
            vs = vs.at[n:].set(False)
        order_c = order_p.reshape(nc, chunk)
        head_valid = vs.reshape(nc, chunk)[:, 0]
        out_sd = jax.eval_shape(fn, jax.ShapeDtypeStruct(
            (chunk,) + xs.shape[1:], xs.dtype))

        def step(carry, oc_hv):
            oc, hv = oc_hv
            out = jax.lax.cond(
                hv,
                lambda idx: fn(jnp.take(xs, idx, axis=0)),
                lambda _idx: jax.tree_util.tree_map(
                    lambda s: jnp.zeros(s.shape, s.dtype), out_sd),
                oc)
            return carry, out

        _, outs = jax.lax.scan(step, 0, (order_c, head_valid))
        mask = valid

        def unsort(o):
            flat = o.reshape(nc * chunk, *o.shape[2:])[:n]
            flat = jnp.take(flat, inv, axis=0)
            shape = mask.shape + (1,) * (flat.ndim - 1)
            return jnp.where(mask.reshape(shape), flat, 0)

        return jax.tree_util.tree_map(unsort, outs)

    def _ensemble_for(self, shape: Tuple[int, int, int], crop_hw: Tuple[int, int],
                      embed_offsets: Optional[Tuple[float, ...]] = None,
                      want_embed: bool = True, want_ag: bool = True,
                      sharded: bool = False):
        """ONE jitted XLA program: preprocess -> detect -> postprocess ->
        masked batched crop -> embed -> age/gender classify. No host
        boundary, no per-face loop, no uint8 re-quantization between stages
        — the TPU collapse of the Triton ensemble graph
        (``models/yolov5_face_postprocess/1/model.py:32-114`` +
        ``ensemble_yolov5_face/config.pbtxt``)."""
        key = ("ens", shape, crop_hw, embed_offsets, want_embed, want_ag,
               sharded, None if sharded else (self._weights_versions["det"],
                                              self._weights_versions["embed"],
                                              self._weights_versions["ag"]))
        hit = self._pipeline_cache.get(key)
        if hit is not None:
            return hit
        # serialize check-then-compile like _pipeline_for: concurrent first
        # requests (ThreadingHTTPServer) must not each pay the multi-minute
        # XLA compile of the full ensemble (RLock: safe under _pipeline_for
        # nesting)
        with self._compile_lock:
            hit = self._pipeline_cache.get(key)
            if hit is not None:
                return hit
            return self._build_ensemble(key, shape, crop_hw, embed_offsets,
                                        want_embed, want_ag, sharded)

    def _build_ensemble(self, key, shape, crop_hw, embed_offsets,
                        want_embed, want_ag, sharded):
        if self.spec.input_size == (-1, -1):
            raise NotImplementedError(
                "fused ensemble requires a jittable fixed-size detector "
                f"(got native-resolution '{self.spec.name}')"
            )
        h, w = shape[:2]
        in_size = self.spec.input_size
        spec_pre = self.spec.preprocess
        if self.cfg.rect and self.spec.rect_stride:
            from ..ops.geometry import rect_letterbox_size

            in_size = rect_letterbox_size((h, w), self.spec.input_size,
                                          self.spec.rect_stride)
            spec_pre = dataclasses.replace(spec_pre, size=in_size)
        pre_dtype = self.cfg.dtype
        max_det = self.cfg.max_det
        embed_spec = self.embed_spec
        do_embed = want_embed and self._embed is not None
        do_ag = want_ag and self._classify_ag is not None
        ag_mean = jnp.asarray(P.AGE_GENDER.mean, jnp.float32)

        from ..models.embedders import preprocess_crops

        def body(det_vars, embed_vars, ag_vars, imgs, det_thres, area_thres):
            x = P.apply_preprocess_batch(imgs, spec_pre, pre_dtype)
            dets, valid = self._detect(det_vars, x)
            post = postprocess_detections(
                dets[:, :max_det], valid[:, :max_det], (w, h), in_size,
                det_thres, area_thres,
            )
            imgs_f = imgs.astype(jnp.float32)
            bsz, k = post.boxes.shape[:2]

            # TPU: the fused Pallas crop kernel (image VMEM-resident across
            # all K crops). Its MXU-bf16-pass accuracy (~0.4% of pixel
            # range) feeds normalize+conv stages — the same numeric regime
            # as the reference's fp16 TensorRT ensemble. Mesh-sharded
            # programs keep the XLA GEMM form: GSPMD cannot partition a
            # pallas_call.
            crop_m = ("pallas" if not sharded
                      and _on_tpu() else "auto")

            def crop_block(boxes, out_hw, vl):
                out = jax.vmap(
                    lambda im, bx, v: crop_and_resize(im, bx, out_hw, v,
                                                      method=crop_m)
                )(imgs_f, boxes, vl)
                # pixel-range clamp: exact bilinear is convex (cannot leave
                # [0, 255]), but the pallas kernel's MXU bf16 pass can round
                # a 255-neighborhood sample to 256.0 — which the serving
                # contract's (x-127.5)/127.5 maps past 1.0 and a user's
                # astype(uint8) wraps to 0. Free: fuses into the crop output.
                return jnp.clip(out, 0.0, 255.0)

            # extraction-style crop offsets ((-6, -1, +4, +5) in the
            # reference, extract_faces_from_dataset.py:290-291) apply to the
            # crops fed onward, never to the reported boxes
            crop_boxes = (pad_boxes(post.boxes, embed_offsets, img_wh=(w, h))
                          if embed_offsets is not None else post.boxes)

            if do_embed:
                ew, eh = embed_spec.input_size

                def fn_embed(xc):
                    return self._embed(embed_vars,
                                       preprocess_crops(embed_spec, xc))
            if do_ag:
                # the cascade's +-5px crop padding
                # (modules/opencv2_dnn/model.py:148-152)
                ag_boxes = pad_boxes(post.boxes, (-5, -5, 5, 5),
                                     img_wh=(w, h))

                def fn_ag(xc):
                    return self._classify_ag(ag_vars[0], ag_vars[1],
                                             xc.astype(jnp.float32) - ag_mean)

            emb = age = gender = None
            if not sharded:
                # COLUMN-BLOCK slot skipping (round-5 VERDICT #5): NMS
                # emits survivors front-compacted per frame, so the padded
                # face slots (Triton contract: max_det per frame) are live
                # only in the first ceil(faces/kc) slot columns on real
                # video. A lax.scan over kc-wide column blocks gates EVERY
                # slot-sized tensor — the crop kernels, the crop writes,
                # AND the embed/age-gender nets — behind one lax.cond per
                # block, so crop compute and data movement scale with
                # FACES, not with b*max_det (the round-4 roofline's
                # 16.2 ms of glue cropped all 1024 slots and then sorted/
                # gathered them). Exact for any validity pattern: a block
                # is skipped only when every slot in it is invalid.
                kc = min(4, k)
                nb = -(-k // kc)
                kp = nb * kc - k

                def padk(x):
                    if kp == 0:
                        return x
                    return jnp.concatenate(
                        [x, jnp.zeros((bsz, kp) + x.shape[2:], x.dtype)], 1)

                cb = padk(crop_boxes)
                vv = padk(post.valid)
                ab = padk(ag_boxes) if do_ag else None
                block_live = vv.reshape(bsz, nb, kc).any(axis=(0, 2))

                def live_fn(j):
                    bx = jax.lax.dynamic_slice_in_dim(cb, j * kc, kc, 1)
                    vl = jax.lax.dynamic_slice_in_dim(vv, j * kc, kc, 1)
                    crops_j = crop_block(bx, crop_hw, vl)
                    out = [crops_j]
                    if do_embed:
                        ecr = (crops_j if (eh, ew) == crop_hw
                               else crop_block(bx, (eh, ew), vl))
                        e = fn_embed(ecr.reshape(bsz * kc, eh, ew, 3))
                        e = jnp.where(vl.reshape(-1)[:, None], e, 0.0)
                        out.append(e.reshape(bsz, kc, -1))
                    if do_ag:
                        abx = jax.lax.dynamic_slice_in_dim(ab, j * kc, kc, 1)
                        # the 227^2 crops are the ensemble's largest tensor
                        # and exist only to feed the classifier: stored at
                        # the ENGINE dtype (bf16 in production), upcast in
                        # fn_ag — the reference's fp16 TRT numeric regime
                        agc = crop_block(abx, (227, 227), vl).astype(
                            pre_dtype).reshape(bsz * kc, 227, 227, 3)
                        a, g = fn_ag(agc)
                        vf = vl.reshape(-1)[:, None]
                        out.append(jnp.where(vf, a, 0.0).reshape(bsz, kc, -1))
                        out.append(jnp.where(vf, g, 0.0).reshape(bsz, kc, -1))
                    return tuple(out)

                out_sd = jax.eval_shape(live_fn, jnp.int32(0))

                def blk(carry, j_live):
                    j, live = j_live
                    return carry, jax.lax.cond(
                        live, live_fn,
                        lambda _j: jax.tree_util.tree_map(
                            lambda s: jnp.zeros(s.shape, s.dtype), out_sd),
                        j)

                _, outs = jax.lax.scan(
                    blk, 0, (jnp.arange(nb, dtype=jnp.int32), block_live))

                def unblk(o):  # [nb, bsz, kc, ...] -> [bsz, k, ...]
                    o = jnp.swapaxes(o, 0, 1).reshape(
                        (bsz, nb * kc) + o.shape[3:])
                    return o[:, :k]

                outs = [unblk(o) for o in outs]
                crops, rest = outs[0], outs[1:]
                if do_embed:
                    emb, rest = rest[0], rest[1:]
                if do_ag:
                    age, gender = rest
            else:
                # sharded programs keep the dense form: GSPMD cannot gate
                # per-shard work behind a global liveness scalar without
                # collectives, and crops partition cleanly on the batch axis
                crops = crop_block(crop_boxes, crop_hw, post.valid)
                valid_flat = post.valid.reshape(bsz * k)
                if do_embed:
                    ecrops = (crops if (eh, ew) == crop_hw
                              else crop_block(crop_boxes, (eh, ew),
                                              post.valid))
                    emb = jnp.where(
                        valid_flat[:, None],
                        fn_embed(ecrops.reshape(bsz * k, eh, ew, 3)), 0.0)
                    emb = emb.reshape(bsz, k, -1)
                if do_ag:
                    agc = crop_block(ag_boxes, (227, 227),
                                     post.valid).astype(
                        pre_dtype).reshape(bsz * k, 227, 227, 3)
                    a, g = fn_ag(agc)
                    age = jnp.where(valid_flat[:, None], a,
                                    0.0).reshape(bsz, k, -1)
                    gender = jnp.where(valid_flat[:, None], g,
                                       0.0).reshape(bsz, k, -1)
            return post, crops, emb, age, gender

        if sharded:
            run = jax.jit(body)
        else:
            # close over the engine's variables (load_weights clears the
            # cache): per-call pytree flattening costs ~2 ms on a tunnel
            run = jax.jit(partial(body, self.variables, self.embed_vars,
                                  self.ag_vars))

        return self._cache_put(
            key, run, baked=() if sharded else ("det", "embed", "ag"))

    def detect_embed_classify_batch(
        self,
        imgs: np.ndarray,
        det_thres: float = None,
        bbox_area_thres: float = None,
        crop_size: Tuple[int, int] = None,
        embed_offsets: Tuple[float, ...] = None,
        mesh=None,
        want_embed: bool = True,
        want_ag: bool = True,
    ) -> EnsembleResult:
        """Full ensemble on a [B, H, W, 3] BGR batch in one XLA dispatch.

        crop_size: (height, width) of the returned raw face crops; defaults
        to the embedder's input size (or 112x112 with no embedder, the
        Triton ensemble face shape).
        embed_offsets: optional per-corner crop offsets applied before
        cropping/embedding (the extraction pipelines' (-6, -1, +4, +5)).
        mesh: optional jax Mesh — the batch axis is sharded over its 'data'
        axis with replicated params and XLA partitions the whole fused
        program (batch must divide the data-axis size).
        want_embed/want_ag: compile the program WITHOUT those stages (a
        crops-only serving Detect skips 32 embeds + age/gender per frame)."""
        if crop_size is None:
            if self.embed_spec is not None:
                ew, eh = self.embed_spec.input_size
                crop_size = (eh, ew)
            else:
                crop_size = (112, 112)
        run = self._ensemble_for(tuple(imgs.shape[1:]), tuple(crop_size),
                                 None if embed_offsets is None
                                 else tuple(embed_offsets),
                                 want_embed, want_ag,
                                 sharded=mesh is not None)
        dt = self.cfg.det_thres if det_thres is None else det_thres
        at = self.cfg.bbox_area_thres if bbox_area_thres is None else bbox_area_thres
        if mesh is not None:
            from ..parallel.sharding import batch_sharding, replicate_to_mesh

            det_vars, embed_vars, ag_vars = replicate_to_mesh(
                (self.variables, self.embed_vars, self.ag_vars), mesh)
            from ..parallel.sharding import put_global

            imgs = put_global(np.asarray(imgs), batch_sharding(mesh, 4))
            post, crops, emb, age, gender = run(
                det_vars, embed_vars, ag_vars,
                imgs, self._scalar(dt), self._scalar(at),
            )
        else:  # variables closure-captured by the compiled program
            post, crops, emb, age, gender = run(
                imgs, self._scalar(dt), self._scalar(at),
            )
        return EnsembleResult(det=post, crops=crops, embeddings=emb,
                              age_probs=age, gender_probs=gender)

    # ---------------- batched crop programs (serving contracts) ----------------

    def embed_crops(self, faces: np.ndarray) -> np.ndarray:
        """[N, H, W, 3] BGR face crops (any same size) -> [N, D] embeddings
        in ONE batched program: resize + normalize + embed fused (replaces
        the facenet Triton server, ``facenet_trt_server/inference.py:72-85``)."""
        if self._embed is None:
            raise RuntimeError("engine built without an embedder")
        if faces.shape[0] == 0:
            return np.zeros((0, self.embed_spec.dim), np.float32)
        key = ("embed_crops",) + tuple(faces.shape[1:])
        run = self._pipeline_cache.get(key)
        if run is None:
            with self._compile_lock:  # one thread traces per crop size
                run = self._pipeline_cache.get(key)
                if run is None:
                    spec = self.embed_spec
                    ew, eh = spec.input_size
                    from ..models.embedders import preprocess_crops
                    from ..ops.geometry import resize_bilinear

                    @jax.jit
                    def run(variables, crops):
                        x = crops.astype(jnp.float32)
                        if x.shape[1:3] != (eh, ew):
                            x = jax.vmap(
                                lambda im: resize_bilinear(im, (eh, ew)))(x)
                        return self._embed(variables,
                                           preprocess_crops(spec, x))

                    self._cache_put(key, run)
        return np.asarray(run(self.embed_vars, jnp.asarray(faces)))

    def classify_crops_age_gender(self, faces: np.ndarray):
        """[N, H, W, 3] BGR face crops -> (age_probs [N, 8], gender_probs
        [N, 2]) in ONE batched program (replaces the two separate Triton
        age/gender servers)."""
        if self._classify_ag is None:
            raise RuntimeError("engine built without age/gender heads")
        if faces.shape[0] == 0:
            return np.zeros((0, 8), np.float32), np.zeros((0, 2), np.float32)
        key = ("ag_crops",) + tuple(faces.shape[1:])
        run = self._pipeline_cache.get(key)
        if run is None:
            with self._compile_lock:  # one thread traces per crop size
                run = self._pipeline_cache.get(key)
                if run is None:

                    @jax.jit
                    def run(ag_vars, crops):
                        x = jax.vmap(
                            lambda im: P.apply_preprocess(im, P.AGE_GENDER)
                        )(crops)
                        return self._classify_ag(ag_vars[0], ag_vars[1], x)

                    self._cache_put(key, run)
        a, g = jax.device_get(run(self.ag_vars, jnp.asarray(faces)))
        return np.asarray(a), np.asarray(g)

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
