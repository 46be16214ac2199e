"""Relative-RMSE stress loss (reference `losses.py:394-456`): the
objective for wide-range stress labels (VERDICT r3 item 3), and the
has_stress masking fix — an unlabeled frame must not contribute a
|pred|/eps blow-up to the relative loss."""
import jax.numpy as jnp
import numpy as np

from tensoralloy_tpu.nn.losses import (LossOptions, rrmse_loss,
                                       stress_loss)


def test_rrmse_matches_hand_formula():
    rng = np.random.RandomState(0)
    lbl = jnp.asarray(rng.normal(0, 2.0, (6, 6)))
    prd = jnp.asarray(rng.normal(0, 2.0, (6, 6)))
    loss, mae = rrmse_loss(lbl, prd)
    upper = np.linalg.norm(np.asarray(lbl - prd), axis=1)
    lower = np.linalg.norm(np.asarray(lbl), axis=1)
    np.testing.assert_allclose(float(loss), np.mean(upper / lower),
                               rtol=1e-6)
    np.testing.assert_allclose(float(mae),
                               np.mean(np.abs(np.asarray(lbl - prd))),
                               rtol=1e-6)


def test_rrmse_scale_invariance():
    """The relative loss must weight a 60 GPa frame and a 0.6 GPa frame
    equally for the same RELATIVE error — the whole point vs rmse."""
    lbl = jnp.asarray([[60.0, 0, 0, 0, 0, 0], [0.6, 0, 0, 0, 0, 0]])
    prd = lbl * 1.05                      # 5% relative error on both
    loss, _ = rrmse_loss(lbl, prd)
    np.testing.assert_allclose(float(loss), 0.05, rtol=1e-5)


def test_rrmse_sample_weight_masks_unlabeled_frames():
    rng = np.random.RandomState(1)
    lbl = jnp.asarray(rng.normal(0, 2.0, (4, 6)))
    prd = jnp.asarray(rng.normal(0, 2.0, (4, 6)))
    base, base_mae = rrmse_loss(lbl, prd)
    # append a frame with NO labels (zeros) and a large prediction —
    # exactly what has_stress=0 frames look like in a mixed batch
    lbl2 = jnp.concatenate([lbl, jnp.zeros((1, 6))])
    prd2 = jnp.concatenate([prd, jnp.full((1, 6), 50.0)])
    w = jnp.asarray([1.0, 1.0, 1.0, 1.0, 0.0])
    masked, masked_mae = rrmse_loss(lbl2, prd2, sample_weight=w)
    np.testing.assert_allclose(float(masked), float(base), rtol=1e-10)
    np.testing.assert_allclose(float(masked_mae), float(base_mae),
                               rtol=1e-10)
    # without the mask the garbage frame dominates by ~50/1e-12
    poisoned, _ = rrmse_loss(lbl2, prd2)
    assert float(poisoned) > 1e6


def test_stress_loss_rrmse_threads_weight():
    rng = np.random.RandomState(2)
    lbl = jnp.asarray(rng.normal(0, 1.0, (3, 6)))
    prd = jnp.asarray(rng.normal(0, 1.0, (3, 6)))
    lbl2 = jnp.concatenate([lbl, jnp.zeros((1, 6))])
    prd2 = jnp.concatenate([prd, jnp.ones((1, 6))])
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    opts = LossOptions(method="rrmse")
    l_masked, _ = stress_loss(lbl2, prd2, opts, sample_weight=w)
    l_base, _ = stress_loss(lbl, prd, opts)
    np.testing.assert_allclose(float(l_masked), float(l_base),
                               rtol=1e-10)
