"""Production pretrain-loop wall-clock bench (VERDICT r2 weak #3 criterion).

Runs the REAL `run_pretraining` path — threaded synthetic loader, superbatch
chunker, scan_steps-per-dispatch jit, resume saves — and reports wall ms/step
for the post-compile epoch. Compare against the device-only numbers from
bench_{mae,moco}_pretrain.py: with scan_steps>=8 the two should be within a
few ms (the per-python-call relay dispatch overhead no longer multiplies by
steps).

Usage: python benchmarks/bench_pretrain_loop.py [mae|mocov3] [batch] [scan_steps]
"""
import json
import sys
import tempfile

from ssl4gie_tpu.core.config import (Architecture, DataConfig, PretrainConfig,
                                     RuntimeConfig, SSLFramework)
from ssl4gie_tpu.ssl.pretrain import run_pretraining

fw = sys.argv[1] if len(sys.argv) > 1 else "mae"
B = int(sys.argv[2]) if len(sys.argv) > 2 else (256 if fw == "mae" else 128)
K = int(sys.argv[3]) if len(sys.argv) > 3 else 8
STEPS = 3 * K          # no tail chunk; epoch 2 is pure steady-state

with tempfile.TemporaryDirectory() as tmp:
    cfg = PretrainConfig(
        framework=SSLFramework(fw), architecture=Architecture.VIT_B,
        epochs=2, warmup_epochs=1, batch_size=B,
        data=DataConfig(synthetic=True, synthetic_size=B * (STEPS + 1),
                        num_workers=8),
        runtime=RuntimeConfig(log_every=STEPS, scan_steps=K),
        ckpt_dir=tmp)
    run_pretraining(cfg, steps_per_epoch_override=STEPS)

    # per-epoch meter: the last log line of epoch 2 is post-compile wall rate
    last = None
    with open(f"{tmp}/pretrain_{fw}_vit_b.jsonl") as f:
        for line in f:
            rec = json.loads(line)
            if rec.get("epoch") == 2 and "step_time_ms" in rec:
                last = rec
    assert last is not None, "no epoch-2 rate logged"
    print(f"{fw} production loop: {last['step_time_ms']:.1f} ms/step wall "
          f"@ B={B} scan_steps={K}  ({last['images_per_sec']:.0f} img/s)")
