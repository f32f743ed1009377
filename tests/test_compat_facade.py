"""The reference-API compatibility facade (ssl4gie_tpu.utils) builds working models
with the reference's factory signatures."""

import jax.numpy as jnp
import numpy as np
import pytest

import ssl4gie_tpu.utils as compat


@pytest.mark.slow
def test_mae_backbone_facade():
    model, params, batch_stats = compat.get_MAE_backbone(
        None, head=True, num_classes=5, frozen=False, dense=None, det=False)
    out = model.apply({"params": params}, jnp.zeros((1, 224, 224, 3)))
    assert out.shape == (1, 5)


@pytest.mark.slow
def test_resnet_facade_dense_depth():
    model, params, batch_stats = compat.get_BarlowTwins_backbone(
        None, head=False, num_classes=1, frozen=False, dense="depth")
    out = model.apply({"params": params, "batch_stats": batch_stats},
                      jnp.zeros((1, 224, 224, 3)))
    assert out.shape == (1, 224, 224, 1)
