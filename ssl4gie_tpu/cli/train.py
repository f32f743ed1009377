"""Finetune training CLI.

Usage (same grammar as the reference's train_*.py, plus --task):
  python -m ssl4gie_tpu.cli.train --task segmentation --architecture vit_b \
      --pretraining Hyperkvasir --ss-framework mae --checkpoint ckpt.pth \
      --dataset Kvasir --data-root /path/Kvasir-SEG
"""

import argparse

from ssl4gie_tpu.cli.args import add_common, add_train, to_train_config


def main():
    p = argparse.ArgumentParser(description=__doc__)
    add_common(p)
    add_train(p)
    args = p.parse_args()
    cfg = to_train_config(args)

    from ssl4gie_tpu.core.mesh import maybe_init_distributed
    maybe_init_distributed()

    from ssl4gie_tpu.tasks import build_trainer
    trainer = build_trainer(cfg)
    trainer.logger.write_args(vars(args))
    from ssl4gie_tpu.core.preempt import REQUEUE_EXIT_CODE, Preempted
    try:
        best = trainer.fit()
    except Preempted:
        # state saved; the supervisor relaunches this exact command and
        # auto-resume continues (core/preempt.py)
        raise SystemExit(REQUEUE_EXIT_CODE)
    print(f"best val performance: {best}")


if __name__ == "__main__":
    main()
