"""Similar-face filtering: reference-set thresholding as batched matmuls.

TPU-native rebuild of ``similar_face_filtering/filter_faces_using_reference.py``:
  * per class, a mean reference embedding + threshold = max L2 distance of
    the (<=32) reference images from that mean (``:71-100``);
  * every unfiltered image is kept if ||f - mean|| <= thres (``:183-197``).

The reference loops classes and batches of 32 through keras model.predict;
here ALL classes are handled by one [N, D] x [D, M] distance matmul on the
MXU, sharded over the mesh "model" axis when M is large
(parallel.sharding.shard_reference_matrix). File copying stays host-side.
"""
from __future__ import annotations

import dataclasses
import glob
import os
import shutil
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np

MAX_N_REF_IMGS = 32  # reference cap (:82)


@dataclasses.dataclass
class ClassReference:
    name: str
    mean_vec: np.ndarray  # [D]
    threshold: float


def ref_mean_and_threshold(ref_embeddings: np.ndarray) -> Tuple[np.ndarray, float]:
    """Mean vector + max-distance threshold from reference embeddings
    (``get_ref_mean_vec_and_thres_from_imgs``, ``:71-100``)."""
    ref = np.asarray(ref_embeddings[:MAX_N_REF_IMGS], np.float32)
    mean = ref.mean(axis=0)
    dists = np.linalg.norm(ref - mean, axis=1)
    return mean, float(dists.max())


@jax.jit
def distance_matrix(embeddings: jnp.ndarray, means: jnp.ndarray) -> jnp.ndarray:
    """[N, D] x [M, D] -> [N, M] L2 distances, one MXU matmul:
    ||a-b||^2 = ||a||^2 + ||b||^2 - 2ab."""
    a2 = jnp.sum(embeddings**2, axis=1, keepdims=True)
    b2 = jnp.sum(means**2, axis=1)
    d2 = a2 + b2 - 2.0 * embeddings @ means.T
    return jnp.sqrt(jnp.maximum(d2, 0.0))


def filter_embeddings(
    embeddings: np.ndarray,
    references: Sequence[ClassReference],
    class_ids: Optional[np.ndarray] = None,
) -> np.ndarray:
    """Keep mask: embedding i is 'clean' for its class (or for any class when
    class_ids is None) if within that class's threshold."""
    means = np.stack([r.mean_vec for r in references])
    thres = np.asarray([r.threshold for r in references], np.float32)
    d = np.asarray(distance_matrix(jnp.asarray(embeddings), jnp.asarray(means)))
    within = d <= thres[None, :]
    if class_ids is None:
        return within.any(axis=1)
    return within[np.arange(len(embeddings)), class_ids]


def topk_similar(
    embeddings: np.ndarray, gallery: np.ndarray, k: int = 5,
    use_pallas: bool = False, mesh=None,
) -> Tuple[np.ndarray, np.ndarray]:
    """Cosine top-k against a gallery.

    use_pallas=True streams the gallery through the VMEM-resident Pallas
    kernel (ops/pallas_kernels.topk_gallery_pallas) so the full [N, M]
    similarity matrix never hits HBM — the production path for very large
    galleries. Default is one XLA matmul + lax.top_k.

    mesh: a jax.sharding.Mesh with a "model" axis routes the search through
    the DISTRIBUTED path (parallel.sharding.topk_gallery_sharded): gallery
    rows sharded across chips, per-shard top-k, and a k-way merge that
    exchanges only [N, k'] candidate lists over ICI — never the [N, M]
    score matrix. Composes with use_pallas (each shard streams its rows
    through the VMEM kernel).
    """

    def normalize(a):
        return a / np.linalg.norm(a, axis=1, keepdims=True).clip(1e-12)

    e = normalize(np.asarray(embeddings, np.float32))
    g = normalize(np.asarray(gallery, np.float32))
    if mesh is not None:
        from ..parallel.sharding import topk_gallery_sharded

        scores, idx = topk_gallery_sharded(e, g, mesh, k=k,
                                           use_pallas=use_pallas)
        return np.asarray(scores), np.asarray(idx)
    if use_pallas:
        from ..ops.pallas_kernels import topk_gallery_pallas

        scores, idx = topk_gallery_pallas(jnp.asarray(e), jnp.asarray(g), k=k,
                                          block_m=512)
        return np.asarray(scores), np.asarray(idx)

    @jax.jit
    def run(e, g):
        return jax.lax.top_k(e @ g.T, k)

    scores, idx = run(jnp.asarray(e), jnp.asarray(g))
    return np.asarray(scores), np.asarray(idx)


class SimilarFaceFilter:
    """Directory-level driver matching the reference job layout:

        data_dir/class_x/*.jpg        (unfiltered images)
        ref_dir/class_x/*.jpg         (reference images, <=32 used)
        target_dir/class_x/{clean,unclean}/

    ``embed_fn(paths) -> [N, D]`` abstracts the embedder (any engine)."""

    def __init__(self, embed_fn: Callable[[List[str]], np.ndarray],
                 batch_size: int = 32):
        self.embed_fn = embed_fn
        self.batch_size = batch_size

    def build_references(self, ref_dir: str) -> Dict[str, ClassReference]:
        refs = {}
        for cls_path in sorted(glob.glob(os.path.join(ref_dir, "*"))):
            if not os.path.isdir(cls_path):
                continue
            imgs = sorted(
                p for p in glob.glob(os.path.join(cls_path, "*"))
                if os.path.isfile(p)
            )[:MAX_N_REF_IMGS]
            if not imgs:
                continue
            emb = self.embed_fn(imgs)
            mean, thr = ref_mean_and_threshold(emb)
            refs[os.path.basename(cls_path)] = ClassReference(
                os.path.basename(cls_path), mean, thr
            )
        return refs

    def filter_class_dir(
        self, data_dir: str, target_dir: str, ref: ClassReference, cls: str
    ) -> Tuple[int, int]:
        clean_dir = os.path.join(target_dir, cls, "clean")
        unclean_dir = os.path.join(target_dir, cls, "unclean")
        os.makedirs(clean_dir, exist_ok=True)
        os.makedirs(unclean_dir, exist_ok=True)
        paths = sorted(
            p for p in glob.glob(os.path.join(data_dir, cls, "*"))
            if os.path.isfile(p)
        )
        n_clean = 0
        for i in range(0, len(paths), self.batch_size):
            chunk = paths[i : i + self.batch_size]
            emb = self.embed_fn(chunk)
            keep = filter_embeddings(
                emb, [ref], class_ids=np.zeros(len(chunk), int)
            )
            for p, k in zip(chunk, keep):
                shutil.copy(p, clean_dir if k else unclean_dir)
                n_clean += bool(k)
        return n_clean, len(paths)

    def run(self, data_dir: str, ref_dir: str, target_dir: str) -> Dict[str, Tuple[int, int]]:
        refs = self.build_references(ref_dir)
        out = {}
        for cls, ref in refs.items():
            if os.path.isdir(os.path.join(data_dir, cls)):
                out[cls] = self.filter_class_dir(data_dir, target_dir, ref, cls)
        return out
