"""CLI flag-grammar parity with the reference (parse-only, no jax compute).

The reference defines `--learning-rate-scheduler` as a bare store_true flag
(`Classification/train_classification.py:405`); a reference user's exact
command line must parse here unchanged (docs/MIGRATION.md contract).
"""

import argparse

from ssl4gie_tpu.cli.args import add_common, add_train, to_train_config


def parse(argv):
    p = argparse.ArgumentParser()
    add_common(p)
    add_train(p)
    return p.parse_args(argv)


REFERENCE_CMD = [
    "--task", "segmentation", "--architecture", "vit_b",
    "--pretraining", "Hyperkvasir", "--ss-framework", "mae",
    "--checkpoint", "ckpt", "--dataset", "Kvasir", "--data-root", "/data",
    "--learning-rate-scheduler", "--batch-size", "48",
]


def test_reference_command_line_parses_verbatim():
    cfg = to_train_config(parse(REFERENCE_CMD))
    assert cfg.optim.use_plateau_scheduler is True     # bare flag = on
    assert cfg.data.batch_size == 48                   # not swallowed as value


def test_scheduler_defaults_off_like_reference():
    cfg = to_train_config(parse(["--task", "segmentation",
                                 "--dataset", "Kvasir", "--data-root", "/d"]))
    assert cfg.optim.use_plateau_scheduler is False    # store_true default


def test_scheduler_explicit_value_still_accepted():
    base = ["--task", "segmentation", "--dataset", "Kvasir", "--data-root", "/d"]
    on = to_train_config(parse(base + ["--lrs", "true"]))
    off = to_train_config(parse(base + ["--lrs", "false"]))
    assert on.optim.use_plateau_scheduler is True
    assert off.optim.use_plateau_scheduler is False


def test_tensor_parallel_flag_plumbs_to_runtime():
    cfg = to_train_config(parse(["--task", "classification",
                                 "--dataset", "synthetic", "--data-root", "/d",
                                 "--tensor-parallel", "2"]))
    assert cfg.runtime.tensor_parallel == 2
    cfg = to_train_config(parse(["--task", "classification",
                                 "--dataset", "synthetic", "--data-root", "/d"]))
    assert cfg.runtime.tensor_parallel == 1
