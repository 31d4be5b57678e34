"""Classification-loss library and scalar metrics vs torch goldens
(reference: stereo/modeling/common/loss.py, stereo/evaluation/metric.py)."""

import numpy as np
import jax.numpy as jnp
import torch
import torch.nn.functional as F

from openstereo_tpu.models.losses import (
    bce, bce_with_logits, cross_entropy, kl_div)
from openstereo_tpu.evaluation.metrics import (
    epe_metric_scalar, d1_metric_scalar, threshold_metric_scalar)


def test_bce_matches_torch():
    rng = np.random.RandomState(0)
    logits = rng.randn(4, 3).astype(np.float32)
    probs = 1.0 / (1.0 + np.exp(-logits))
    targets = rng.rand(4, 3).astype(np.float32)
    exp = torch.nn.BCELoss()(torch.tensor(probs), torch.tensor(targets)).item()
    np.testing.assert_allclose(float(bce(jnp.asarray(probs), jnp.asarray(targets))),
                               exp, rtol=1e-5)
    np.testing.assert_allclose(
        float(bce_with_logits(jnp.asarray(logits), jnp.asarray(targets))),
        torch.nn.BCEWithLogitsLoss()(torch.tensor(logits),
                                     torch.tensor(targets)).item(), rtol=1e-5)


def test_cross_entropy_matches_torch():
    rng = np.random.RandomState(1)
    logits = rng.randn(3, 5, 4, 4).astype(np.float32)
    hard = rng.randint(0, 5, size=(3, 4, 4)).astype(np.int64)
    exp = F.cross_entropy(torch.tensor(logits), torch.tensor(hard)).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(hard)))
    np.testing.assert_allclose(got, exp, rtol=1e-5)
    # soft targets (distribution over the class axis)
    soft = torch.tensor(rng.randn(3, 5, 4, 4).astype(np.float32)).softmax(1)
    exp = F.cross_entropy(torch.tensor(logits), soft).item()
    got = float(cross_entropy(jnp.asarray(logits), jnp.asarray(soft.numpy())))
    np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_kl_div_matches_torch():
    rng = np.random.RandomState(2)
    pred = torch.tensor(rng.randn(3, 5, 4, 4).astype(np.float32))
    log_pred = F.log_softmax(pred, dim=1)
    targets = torch.tensor(rng.randn(3, 5, 4, 4).astype(np.float32)).softmax(1)
    for reduction in ("mean", "batchmean"):
        exp = F.kl_div(log_pred, targets, reduction=reduction).item()
        got = float(kl_div(jnp.asarray(log_pred.numpy()),
                           jnp.asarray(targets.numpy()), reduction=reduction))
        np.testing.assert_allclose(got, exp, rtol=1e-5)


def test_scalar_metrics():
    rng = np.random.RandomState(3)
    gt = rng.rand(2, 8, 8).astype(np.float32) * 100
    pred = gt + rng.randn(2, 8, 8).astype(np.float32) * 4
    mask = (gt > 0) & (gt < 96)
    err = np.abs(pred - gt)[mask]
    np.testing.assert_allclose(
        float(epe_metric_scalar(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))),
        err.mean(), rtol=1e-5)
    exp_d1 = ((err > 3) & (err > 0.05 * np.abs(gt)[mask])).mean() * 100
    np.testing.assert_allclose(
        float(d1_metric_scalar(jnp.asarray(pred), jnp.asarray(gt), jnp.asarray(mask))),
        exp_d1, rtol=1e-5)
    np.testing.assert_allclose(
        float(threshold_metric_scalar(jnp.asarray(pred), jnp.asarray(gt),
                                      jnp.asarray(mask), 2.0)),
        (err > 2.0).mean() * 100, rtol=1e-5)
    # empty mask guard
    zero = jnp.zeros((1, 4, 4))
    assert float(epe_metric_scalar(zero, zero, zero.astype(bool))) == 0.0
