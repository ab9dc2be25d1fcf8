"""Train the MTCNN P/R/O-Net cascade to the golden gate
(train/golden_mtcnn.py). Exit 0 only when the reloaded checkpoint passes."""
from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", required=True)
    ap.add_argument("--images", type=int, default=256)
    ap.add_argument("--crops", type=int, default=8192)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--steps", type=int, default=4000)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--work-dir", default=None)
    args = ap.parse_args(argv)

    from ..train.golden_mtcnn import train_golden_mtcnn

    work = args.work_dir or tempfile.mkdtemp(prefix="golden_mtcnn_")
    r = train_golden_mtcnn(
        args.out, work, n_images=args.images, n_crops=args.crops,
        batch_size=args.batch, max_steps=args.steps, lr=args.lr,
        seed=args.seed)
    print(f"golden-mtcnn gate: ok={r['ok']} reload_ok={r.get('reload_ok')} "
          f"ious={['%.3f' % i for i in r['ious']]}")
    return 0 if (r["ok"] and r.get("reload_ok")) else 1


if __name__ == "__main__":
    sys.exit(main())
