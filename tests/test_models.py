"""Model shape/parameter-count tests (SURVEY §4 plan (a)).

Golden counts come from the reference's torch models: timm ViT-B/16 backbone
85,798,656 params; torchvision ResNet50 backbone (fc removed) 23,508,032.
"""

import jax
import jax.numpy as jnp
import pytest

from ssl4gie_tpu.models.deeplabv3plus import DeepLabV3Plus
from ssl4gie_tpu.models.factory import ViTDenseModel
from ssl4gie_tpu.models.resnet import ResNetClassifier, ResNetDepthModel
from ssl4gie_tpu.models.vit import ViTBackbone, ViTClassifier


def n_params(tree):
    return sum(p.size for p in jax.tree_util.tree_leaves(tree))


@pytest.fixture(scope="module")
def rng():
    return jax.random.PRNGKey(0)


@pytest.fixture(scope="module")
def x224():
    return jnp.zeros((2, 224, 224, 3), jnp.float32)


def test_vit_b_param_count(rng, x224):
    m = ViTClassifier(num_classes=6)
    v = m.init(rng, x224)
    head = 768 * 6 + 6
    assert n_params(v["params"]) - head == 85_798_656  # timm vit_base_patch16_224


def test_vit_pooled_modes(rng, x224):
    for out_token in ("cls", "spatial"):
        m = ViTBackbone(mode="pooled", out_token=out_token)
        v = m.init(rng, x224)
        out = m.apply(v, x224)
        assert out.shape == (2, 768)


def test_vit_dense_taps(rng, x224):
    m = ViTBackbone(mode="dense")
    v = m.init(rng, x224)
    taps = m.apply(v, x224)
    assert len(taps) == 4 and all(t.shape == (2, 197, 768) for t in taps)


def test_vit_det_feature_map(rng):
    x = jnp.zeros((1, 256, 256, 3), jnp.float32)  # small det-mode grid (16x16)
    m = ViTBackbone(img_size=256, mode="det")
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == (1, 16, 16, 768)


def test_resnet50_param_count(rng, x224):
    m = ResNetClassifier(num_classes=6)
    v = m.init(rng, x224)
    head = 2048 * 6 + 6
    assert n_params(v["params"]) - head == 23_508_032  # torchvision resnet50 sans fc


def test_resnet_depth_output(rng):
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    m = ResNetDepthModel()
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == (1, 224, 224, 1)
    assert float(out.min()) >= 0.0 and float(out.max()) <= 1.0  # sigmoid head


def test_vit_dense_seg_and_depth_output(rng):
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    for dense in ("seg", "depth"):
        m = ViTDenseModel(num_classes=1, dense=dense)
        v = m.init(rng, x)
        out = m.apply(v, x, rngs={"dropout": jax.random.PRNGKey(1)})
        assert out.shape == (1, 224, 224, 1), dense


def test_deeplabv3plus_output(rng):
    x = jnp.zeros((1, 224, 224, 3), jnp.float32)
    m = DeepLabV3Plus(num_classes=1)
    v = m.init(rng, x)
    out = m.apply(v, x)
    assert out.shape == (1, 224, 224, 1)


def test_batchnorm_updates_stats(rng):
    x = jax.random.normal(rng, (4, 64, 64, 3))
    m = ResNetClassifier(num_classes=3)
    v = m.init(rng, x)
    _, mut = m.apply(v, x, train=True, mutable=["batch_stats"])
    changed = jax.tree_util.tree_map(
        lambda a, b: bool(abs(a - b).sum() > 0),
        v["batch_stats"], mut["batch_stats"])
    assert any(jax.tree_util.tree_leaves(changed))
