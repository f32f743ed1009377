"""Prediction CLI (the reference predict_*.py equivalents): renders masks /
depth+error colormaps / box overlays for test-split images into Predictions/."""

import argparse
import os

from ssl4gie_tpu.cli.args import add_common, to_train_config
from ssl4gie_tpu.cli.evaluate import load_eval_state, make_test_source
from ssl4gie_tpu.core.config import Task


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    p.add_argument("--ckpt-dir", type=str, default="Trained models",
                   dest="ckpt_dir")
    p.add_argument("--idx", type=str, default=None,
                   help="comma-separated test indices (default: all)")
    p.add_argument("--out-dir", type=str, default=None, dest="out_dir")
    args = p.parse_args()
    args.epochs = 1
    cfg = to_train_config(args)
    cfg.ckpt_dir = args.ckpt_dir

    model, params, batch_stats, _ = load_eval_state(cfg)
    src = make_test_source(cfg)
    indices = [int(i) for i in args.idx.split(",")] if args.idx else None
    out_dir = args.out_dir or os.path.join("Predictions", cfg.data.dataset or
                                           "synthetic")

    from ssl4gie_tpu.tasks import predict as P
    if cfg.task == Task.SEGMENTATION:
        written = P.predict_segmentation(cfg, model, params, batch_stats, src,
                                         out_dir, indices)
    elif cfg.task == Task.DEPTH:
        written = P.predict_depth(cfg, model, params, batch_stats, src, out_dir,
                                  indices)
    elif cfg.task == Task.DETECTION:
        written = P.predict_detection(cfg, model, params, batch_stats, src,
                                      out_dir, indices)
    else:
        raise NotImplementedError(f"predict for {cfg.task} "
                                  "(classification has no predict script in the "
                                  "reference either, README.md:172)")
    print(f"wrote {len(written)} files to {out_dir}")


if __name__ == "__main__":
    main()
