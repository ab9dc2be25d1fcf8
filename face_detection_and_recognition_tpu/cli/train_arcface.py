"""CLI: train the MobileFaceNet embedder with ArcFace on a face-crop tree.

Dataset layout: ``data_dir/identity_x/*.jpg`` (one dir per identity, crops
of any size; resized to 112x112). DP over the mesh data axis, TP over the
ArcFace class kernel when more than one device is present.

    python -m face_detection_and_recognition_tpu.cli.train_arcface \
        -i identities/ --steps 1000 --batch 64 --out ckpt/mobileface
"""
from __future__ import annotations

import argparse
import glob
import os
import random
import time

import cv2
import jax
import numpy as np


def iter_crop_batches(data_dir: str, batch: int, epochs: int, seed: int = 0):
    classes = sorted(
        d for d in glob.glob(os.path.join(data_dir, "*")) if os.path.isdir(d)
    )
    samples = []
    for label, cls in enumerate(classes):
        for p in sorted(glob.glob(os.path.join(cls, "*"))):
            if os.path.splitext(p)[1].lower() in (".jpg", ".jpeg", ".png"):
                samples.append((p, label))
    rng = random.Random(seed)
    for _ in range(epochs):
        rng.shuffle(samples)
        xs, ys = [], []
        for p, label in samples:
            img = cv2.imread(p)
            if img is None:
                continue
            img = cv2.resize(img, (112, 112))
            xs.append((img.astype(np.float32) - 127.5) / 127.5)
            ys.append(label)
            if len(xs) == batch:
                yield np.stack(xs), np.asarray(ys), len(classes)
                xs, ys = [], []


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("-i", "--data_dir", required=True)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--steps", type=int, default=1000)
    ap.add_argument("--epochs", type=int, default=100)
    ap.add_argument("--lr", type=float, default=0.1)
    ap.add_argument("--embedding-size", type=int, default=512)
    ap.add_argument("--out", default=None)
    ap.add_argument("--log-every", type=int, default=20)
    ap.add_argument("--mesh", action="store_true",
                    help="shard over all devices (DP batch + TP classes)")
    args = ap.parse_args(argv)

    from ..train.arcface import (ArcFaceTrainConfig, create_train_state,
                                 make_train_step, sharded_train_step)
    from ..utils.logging_utils import setup_job_logger

    logger = setup_job_logger("train_arcface")
    # peek class count
    it = iter_crop_batches(args.data_dir, args.batch, args.epochs)
    first = next(it, None)
    if first is None:
        logger.error("no training samples under %s", args.data_dir)
        return 2
    _, _, num_classes = first
    cfg = ArcFaceTrainConfig(num_classes=num_classes,
                             embedding_size=args.embedding_size, lr=args.lr)
    state = create_train_state(cfg, jax.random.PRNGKey(0))

    if args.mesh and len(jax.devices()) > 1:
        from ..parallel.mesh import make_mesh
        from ..parallel.sharding import batch_sharding

        n = len(jax.devices())
        model_axis = 2 if n % 2 == 0 else 1
        mesh = make_mesh(("data", "model"), (n // model_axis, model_axis))
        step, (p, bs, opt) = sharded_train_step(state, mesh)

        def place(images, labels):
            return (jax.device_put(images, batch_sharding(mesh, 4)),
                    jax.device_put(labels, batch_sharding(mesh, 1)))
    else:
        step = jax.jit(make_train_step(state))
        p, bs, opt = state["params"], state["batch_stats"], state["opt_state"]

        def place(images, labels):
            return images, labels

    t0 = time.time()
    i = 0
    import itertools

    for images, labels, _ in itertools.chain([first], it):
        if i >= args.steps:
            break
        images, labels = place(images, labels)
        p, bs, opt, loss = step(p, bs, opt, images, labels)
        if i % args.log_every == 0:
            logger.info("step %d loss %.4f %.1f img/s", i, float(loss),
                        args.batch * (i + 1) / (time.time() - t0))
        i += 1
    if args.out:
        from ..utils.checkpoint import save_variables

        save_variables(args.out, {"params": p["net"], "batch_stats": bs,
                                  "arcface_kernel": p["arcface_kernel"]})
        logger.info("saved %s", args.out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
