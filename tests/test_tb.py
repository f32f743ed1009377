"""core.tb: the dependency-free TensorBoard scalar writer must produce valid
TFRecord/Event files (reference parity: `main_pretrain.py:237-239`,
`main_moco.py:233` SummaryWriter scalars)."""

import struct

import numpy as np

from ssl4gie_tpu.core.tb import SummaryWriter, _crc32c, _masked_crc, read_scalars


def test_crc32c_known_vectors():
    # RFC 3720 / crc32c reference vectors
    assert _crc32c(b"") == 0
    assert _crc32c(b"123456789") == 0xE3069283
    assert _crc32c(b"\x00" * 32) == 0x8A9136AA


def test_scalar_roundtrip(tmp_path):
    w = SummaryWriter(str(tmp_path))
    w.add_scalar("loss", 0.5, 1)
    w.add_scalar("loss", 0.25, 2)
    w.add_scalar("lr", 1e-3, 2)
    w.close()
    scalars = read_scalars(w.path)
    assert scalars == [(1, "loss", 0.5), (2, "loss", 0.25),
                       (2, "lr", np.float32(1e-3))]


def test_record_framing_crc(tmp_path):
    """Every record's length and data CRCs verify (TensorBoard's reader skips
    records with bad CRCs, so this is the actual load-ability check)."""
    w = SummaryWriter(str(tmp_path))
    for i in range(5):
        w.add_scalar("x", float(i), i)
    w.close()
    with open(w.path, "rb") as f:
        n_records = 0
        while True:
            header = f.read(8)
            if len(header) < 8:
                break
            assert struct.unpack("<I", f.read(4))[0] == _masked_crc(header)
            (ln,) = struct.unpack("<Q", header)
            rec = f.read(ln)
            assert struct.unpack("<I", f.read(4))[0] == _masked_crc(rec)
            n_records += 1
    assert n_records == 6                       # file_version header + 5


def test_metrics_logger_tb_sink(tmp_path):
    from ssl4gie_tpu.core.logger import MetricsLogger
    import glob
    import os
    lg = MetricsLogger(str(tmp_path), "run", to_stdout=False, tb=True)
    lg.log({"epoch": 1, "loss": 0.75, "note": "text-ignored"})
    lg.log({"epoch": 2, "loss": 0.5})
    (path,) = glob.glob(os.path.join(str(tmp_path), "tb", "run", "events.*"))
    scalars = read_scalars(path)
    assert (1, "loss", 0.75) in scalars and (2, "loss", 0.5) in scalars
    assert not any(tag == "note" for _, tag, _ in scalars)


def test_throughput_eta_and_peak_memory():
    """ETA field of the rates meter + None-safe peak-HBM probe (the reference
    MetricLogger's `eta:`/max-mem meters, `Models/mae/util/misc.py:140-167`)."""
    import time

    from ssl4gie_tpu.core.logger import Throughput, peak_memory_mb

    m = Throughput()
    time.sleep(0.05)
    m.update(8, steps=2)
    r = m.rates(remaining_steps=10)
    assert r["eta_s"] == np.round(10 * r["step_time_ms"] / 1000.0, 1)
    assert "eta_s" not in m.rates()

    mem = peak_memory_mb()          # CPU backend: None; TPU: positive float
    assert mem is None or mem > 0
