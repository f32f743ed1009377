"""CLI smoke tests: train -> eval -> predict on synthetic data via subprocess."""

import os
import subprocess
import sys
import tempfile

import pytest

ENV = dict(os.environ, JAX_PLATFORMS="cpu",
           XLA_FLAGS="--xla_force_host_platform_device_count=8")
REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(args, cwd):
    # jax.config is reset per subprocess; sitecustomize re-pins axon, so the CLIs
    # are exercised the way a CPU-only user would run them
    code = ("import jax; jax.config.update('jax_platforms', 'cpu');"
            f"import sys; sys.argv = {args!r};"
            f"import runpy; runpy.run_module('{args[0]}', run_name='__main__')")
    r = subprocess.run([sys.executable, "-c", code], cwd=cwd, env=ENV,
                       capture_output=True, text=True, timeout=1200)
    assert r.returncode == 0, r.stdout + "\n" + r.stderr
    return r.stdout


@pytest.mark.slow
def test_train_eval_predict_cycle():
    with tempfile.TemporaryDirectory() as tmp:
        common = ["--task", "segmentation", "--architecture", "resnet50",
                  "--synthetic", "--batch-size", "8", "--compute-dtype", "float32",
                  "--ckpt-dir", os.path.join(tmp, "ckpt")]
        out = run(["ssl4gie_tpu.cli.train"] + common + ["--epochs", "1"], REPO)
        assert "best val performance" in out
        out = run(["ssl4gie_tpu.cli.evaluate"] + common +
                  ["--results-root", tmp], REPO)
        assert "Dice:" in out
        assert os.path.exists(os.path.join(tmp, "eval_results.txt"))
        out = run(["ssl4gie_tpu.cli.predict"] + common +
                  ["--idx", "0,1", "--out-dir", os.path.join(tmp, "preds")], REPO)
        assert "wrote 2 files" in out
