"""Golden parity tests: our jnp losses/metrics vs the reference torch implementations
(imported read-only from /root/reference), on random inputs."""

import sys

import numpy as np
import pytest

from tests.conftest import REFERENCE, requires_reference

jnp = pytest.importorskip("jax.numpy")
torch = pytest.importorskip("torch")

from ssl4gie_tpu.metrics import classification as C
from ssl4gie_tpu.metrics import depth as D
from ssl4gie_tpu.metrics import segmentation as S


def _ref_module(path, name):
    import importlib.util
    uniq = f"ref_{path.replace('/', '_')}_{name}"
    spec = importlib.util.spec_from_file_location(uniq, f"{REFERENCE}/{path}/{name}.py")
    mod = importlib.util.module_from_spec(spec)
    sys.modules[uniq] = mod
    spec.loader.exec_module(mod)
    return mod


@requires_reference
def test_soft_dice_and_seg_metrics_match_reference():
    losses = _ref_module("Binary_segmentation/Metrics", "losses")
    perf = _ref_module("Binary_segmentation/Metrics", "performance")
    rng = np.random.default_rng(0)
    logits = rng.normal(size=(4, 1, 32, 32)).astype(np.float32)
    targets = (rng.uniform(size=(4, 1, 32, 32)) > 0.5).astype(np.float32)
    tl, tt = torch.tensor(logits), torch.tensor(targets)

    ref = float(losses.SoftDiceLoss()(tl, tt))
    ours = float(S.soft_dice_loss(jnp.asarray(logits), jnp.asarray(targets)))
    assert abs(ref - ours) < 1e-5

    for ref_cls, ours_fn in [(perf.DiceScore, S.dice_score), (perf.IoU, S.iou_score),
                             (perf.Precision, S.precision_score),
                             (perf.Recall, S.recall_score)]:
        r = float(ref_cls()(tl, tt))
        o = float(ours_fn(jnp.asarray(logits), jnp.asarray(targets)))
        assert abs(r - o) < 1e-5, ref_cls.__name__


@requires_reference
def test_classification_metrics_match_reference():
    perf = _ref_module("Classification/Metrics", "performance")
    rng = np.random.default_rng(1)
    n_class = 7
    preds = rng.integers(0, n_class, size=500)
    targets = rng.integers(0, n_class, size=500)
    tp, tt = torch.tensor(preds), torch.tensor(targets)
    for ref_cls, ours_fn in [(perf.meanF1Score, C.mean_f1),
                             (perf.meanPrecision, C.mean_precision),
                             (perf.meanRecall, C.mean_recall)]:
        r = float(ref_cls(n_class)(tp, tt))
        o = float(ours_fn(jnp.asarray(preds), jnp.asarray(targets), n_class))
        assert abs(r - o) < 1e-5, ref_cls.__name__


@requires_reference
@pytest.mark.parametrize("alpha", [0.0, 0.1])
def test_ssi_loss_matches_reference(alpha):
    losses = _ref_module("Depth_estimation/Metrics", "losses")
    rng = np.random.default_rng(2)
    pred = rng.uniform(size=(3, 1, 64, 64)).astype(np.float32)
    target = rng.uniform(size=(3, 1, 64, 64)).astype(np.float32)
    target[target < 0.3] = 0.0  # invalid pixels

    ref_loss = losses.ScaleAndShiftInvariantLoss(alpha=alpha)
    r = float(ref_loss(torch.tensor(pred), torch.tensor(target)))
    o = float(D.ssi_loss(jnp.asarray(pred[:, 0]), jnp.asarray(target[:, 0]),
                         alpha=alpha))
    assert abs(r - o) < 2e-5


@requires_reference
def test_scale_and_shift_matches_reference():
    losses = _ref_module("Depth_estimation/Metrics", "losses")
    rng = np.random.default_rng(3)
    pred = rng.uniform(size=(2, 16, 16)).astype(np.float32)
    target = rng.uniform(size=(2, 16, 16)).astype(np.float32)
    mask = (target > 0.4).astype(np.float32)
    r0, r1 = losses.compute_scale_and_shift(torch.tensor(pred), torch.tensor(target),
                                            torch.tensor(mask))
    o0, o1 = D.compute_scale_and_shift(jnp.asarray(pred), jnp.asarray(target),
                                       jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(o0), r0.numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o1), r1.numpy(), rtol=1e-4, atol=1e-5)


def test_weighted_cross_entropy_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(16, 5)).astype(np.float32)
    labels = rng.integers(0, 5, size=16)
    w = rng.uniform(0.5, 2.0, size=5).astype(np.float32)
    r = float(torch.nn.functional.cross_entropy(
        torch.tensor(logits), torch.tensor(labels), weight=torch.tensor(w)))
    o = float(C.weighted_cross_entropy(jnp.asarray(logits), jnp.asarray(labels),
                                       jnp.asarray(w)))
    assert abs(r - o) < 1e-5
