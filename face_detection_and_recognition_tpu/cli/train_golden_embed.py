"""Train the ArcFace embedder to its first REAL recognition result.

``python -m face_detection_and_recognition_tpu.cli.train_golden_embed`` runs
the in-environment recognition accuracy loop (train/golden_embed.py): the
three golden faces become three identities, MobileFaceNet + ArcFace train on
augmented crop sets, and the gate demands the similar-face filter's own math
(per-class mean + max-ref-distance threshold,
``similar_face_filtering/filter_faces_using_reference.py:71-100``) route
held-out probes perfectly — then checkpoint -> fresh
``engine.load_embed_weights`` -> regate through the serving embed path.

Exit code 0 only when the reloaded checkpoint passes the gate.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="checkpoint output dir")
    ap.add_argument("--batch", type=int, default=48)
    ap.add_argument("--steps", type=int, default=600)
    ap.add_argument("--eval-every", type=int, default=50)
    ap.add_argument("--train-per-id", type=int, default=96)
    ap.add_argument("--lr", type=float, default=0.01)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--embedder", default="mobile_facenet",
                    choices=("mobile_facenet", "facenet", "facenet-512",
                             "reid-mnv2"),
                    help="facenet = the InceptionResNetV1 128-d slot; "
                    "facenet-512 = the OV facenet_20180408 512-d slot")
    ap.add_argument("--aug-scale", type=float, default=1.6)
    ap.add_argument("--center-gain", type=float, default=0.02)
    ap.add_argument("--identities", type=int, default=3,
                    help=">3 trains on the N-identity synthetic population "
                         "(fixed identity transforms over the donors) and "
                         "additionally gates on rank-1 retrieval + N-class "
                         "filter math (train/golden_embed.py "
                         "evaluate_retrieval)")
    args = ap.parse_args(argv)

    from ..train.golden_embed import train_golden_embedder

    r = train_golden_embedder(
        args.out, batch_size=args.batch, max_steps=args.steps,
        eval_every=args.eval_every, n_train_per_id=args.train_per_id,
        lr=args.lr, seed=args.seed, embedder=args.embedder,
        aug_scale=args.aug_scale, center_gain=args.center_gain,
        n_identities=args.identities)
    print(f"golden-embed gate: ok={r['ok']} reload_ok={r.get('reload_ok')} "
          f"same={r['same_acc']:.2f} cross={r['cross_acc']:.2f} "
          f"margin={r['margin']:.3f} steps={r.get('steps')}")
    if "reload_retrieval" in r:
        rr = r["reload_retrieval"]
        print(f"retrieval@{rr['n_identities']}: rank1={rr['rank1']:.3f} "
              f"same={rr['same_acc']:.3f} cross={rr['cross_acc']:.3f} "
              f"margins min/med/max={rr['margin_min']:.3f}/"
              f"{rr['margin_median']:.3f}/{rr['margin_max']:.3f}")
    return 0 if (r["ok"] and r.get("reload_ok")) else 1


if __name__ == "__main__":
    sys.exit(main())
