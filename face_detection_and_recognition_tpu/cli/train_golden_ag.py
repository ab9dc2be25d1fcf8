"""Train the age/gender cascade heads to the reference's pinned golden
labels (train/golden_ag.py): trained detector -> crop -> classify ->
"Male:…,(38-43):…" strings matching tests/image_tests/
test_opencv_age_gender.py:47-48, then checkpoint -> reload -> regate.

Exit code 0 only when the reloaded checkpoint passes the cascade gate.
"""
from __future__ import annotations

import argparse
import sys


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True, help="checkpoint output dir")
    ap.add_argument("--detector-ckpt", required=True,
                    help="trained golden detector checkpoint (make accuracy)")
    ap.add_argument("--detector", default="yolov5n")
    ap.add_argument("--steps", type=int, default=3000)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--eval-every", type=int, default=250)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from ..train.golden_ag import train_golden_ag

    r = train_golden_ag(
        args.out, args.detector_ckpt, detector=args.detector,
        batch_size=args.batch, max_steps=args.steps,
        eval_every=args.eval_every, lr=args.lr, seed=args.seed)
    print(f"golden-ag gate: ok={r['ok']} reload_ok={r.get('reload_ok')} "
          f"steps={r.get('steps')} labels={r.get('labels')}")
    return 0 if (r["ok"] and r.get("reload_ok")) else 1


if __name__ == "__main__":
    sys.exit(main())
