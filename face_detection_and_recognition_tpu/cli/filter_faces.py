"""CLI: similar-face filtering against per-class reference images.

Equivalent of ``similar_face_filtering/filter_faces_using_reference.py``:
builds a mean embedding + max-distance threshold per class from reference
images and routes unfiltered images into clean/unclean.

    python -m face_detection_and_recognition_tpu.cli.filter_faces \
        -d data/ -r refs/ -t out/ --embedder facenet
"""
from __future__ import annotations

import argparse

import cv2
import numpy as np


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-d", "--data_dir", required=True)
    ap.add_argument("-r", "--ref_dir", required=True)
    ap.add_argument("-t", "--target_dir", required=True)
    ap.add_argument("--embedder", default="facenet",
                    help="embedder registry name (reference uses 128-d facenet)")
    ap.add_argument("-m", "--savedmodel_path", default=None,
                    help="real facenet weights: a keras SavedModel dir "
                         "(the reference's models/facenet/facenet_keras_p38,"
                         " filter_faces_using_reference.py:131), a .h5, or "
                         "an orbax checkpoint")
    ap.add_argument("--batch", type=int, default=32)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from ..models.embedders import get_embedder, preprocess_crops
    from ..ops.geometry import resize_bilinear
    from ..pipelines.similarity import SimilarFaceFilter

    spec = get_embedder(args.embedder)
    net, variables, embed = spec.build()
    if args.savedmodel_path:
        import os

        from ..utils import weights as W

        path = args.savedmodel_path
        if os.path.isdir(path) and os.path.exists(
                os.path.join(path, "saved_model.pb")):
            from ..utils.tensor_bundle import read_tensor_bundle

            named = read_tensor_bundle(
                os.path.join(path, "variables", "variables"))
            variables = W.convert_facenet_keras(
                W.keras_bundle_stream(named), net, variables)
        elif path.endswith(".h5"):
            variables = W.convert_facenet_keras(
                W.read_keras_h5_stream(path), net, variables)
        else:
            from ..utils.checkpoint import load_variables

            variables = load_variables(path)
    ew, eh = spec.input_size

    @jax.jit
    def embed_batch(variables, imgs):
        # resize + normalize + embed fused: one dispatch per path batch
        x = jax.vmap(lambda im: resize_bilinear(im, (eh, ew)))(
            imgs.astype(jnp.float32))
        return embed(variables, preprocess_crops(spec, x))

    def embed_paths(paths):
        imgs = []
        for p in paths:
            img = cv2.imread(p)
            imgs.append(img if img is not None
                        else np.zeros_like(imgs[0]) if imgs
                        else np.zeros((eh, ew, 3), np.uint8))
        if len({i.shape for i in imgs}) > 1:  # mixed sizes: host resize once
            imgs = [cv2.resize(i, (ew, eh)) for i in imgs]
        return np.asarray(embed_batch(variables, jnp.stack(imgs)))

    job = SimilarFaceFilter(embed_paths, batch_size=args.batch)
    res = job.run(args.data_dir, args.ref_dir, args.target_dir)
    for cls, (clean, total) in sorted(res.items()):
        print(f"{cls}: {clean}/{total} clean")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
