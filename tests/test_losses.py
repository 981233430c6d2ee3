"""Golden tests for survival losses.

Two layers of checking:
  1. hand-computed numpy goldens for every loss,
  2. guarded numerical parity against the reference torch implementations
     (skipped if /root/reference is not mounted).
"""
import numpy as np
import pytest
import jax.numpy as jnp

from vlsa_tpu.losses import (
    surv_mle,
    surv_ifmle,
    surv_ple,
    recon_loss,
    rank_loss,
    mse_loss,
    cdf_loss,
    convert_survival_label,
    surv_emd,
    surv_t2i,
    sup_con_loss,
)

from conftest import reference_available, add_reference_to_path

RNG = np.random.default_rng(0)


def _rand_batch(B=6, K=4):
    logits = RNG.normal(size=(B, K)).astype(np.float32)
    probs = np.exp(logits) / np.exp(logits).sum(-1, keepdims=True)
    t = RNG.integers(0, K, size=B).astype(np.int32)
    e = RNG.integers(0, 2, size=B).astype(np.float32)
    return logits, probs, t, e


def test_surv_ifmle_hand():
    probs = np.array([[0.1, 0.2, 0.3, 0.4], [0.25, 0.25, 0.25, 0.25]], np.float32)
    t = np.array([1, 2])
    e = np.array([1.0, 0.0])
    # row0 uncensored at bin 1: -log(0.2)
    # row1 censored at bin 2:  -log(1 - (0.25+0.25+0.25)) = -log(0.25)
    expect = np.mean([-np.log(0.2), -np.log(0.25)])
    got = float(surv_ifmle(jnp.array(probs), jnp.array(t), jnp.array(e)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_surv_mle_hand():
    h = np.array([[0.2, 0.5, 0.5]], np.float32)
    # uncensored at t=1: S = [0.8, 0.4, 0.2], S_padded=[1, .8, .4, .2]
    # loss = -(log S_padded[1] + log h[1]) = -(log .8 + log .5)
    got = float(surv_mle(jnp.array(h), jnp.array([1]), jnp.array([1.0])))
    np.testing.assert_allclose(got, -(np.log(0.8) + np.log(0.5)), rtol=1e-4)
    # censored at t=1: loss = -log S_padded[2] = -log .4
    got_c = float(surv_mle(jnp.array(h), jnp.array([1]), jnp.array([0.0])))
    np.testing.assert_allclose(got_c, -np.log(0.4), rtol=1e-4)


def test_surv_ple_hand():
    y = np.array([0.5, -0.2, 1.0], np.float32)
    t = np.array([3.0, 1.0, 2.0], np.float32)
    e = np.array([1.0, 0.0, 1.0], np.float32)
    exp = np.exp(y)
    # risk sets: for i: {j: t_j >= t_i}
    losses = []
    for i in range(3):
        risk = exp[t >= t[i]].sum()
        losses.append((y[i] - np.log(risk)) * e[i])
    expect = -np.mean(losses)
    got = float(surv_ple(jnp.array(y), jnp.array(t), jnp.array(e)))
    np.testing.assert_allclose(got, expect, rtol=1e-5)


def test_convert_survival_label():
    t = np.array([1, 0, 2])
    e = np.array([1, 0, 0])
    got = np.asarray(convert_survival_label(jnp.array(t), jnp.array(e), 4))
    expect = np.array([[0, 1, 0, 0], [1, 1, 1, 1], [0, 0, 1, 1]])
    np.testing.assert_array_equal(got, expect)


def test_cdf_loss_hand():
    p = np.array([[0.5, 0.5, 0.0]], np.float32)
    q = np.array([[0.0, 0.5, 0.5]], np.float32)
    # CDFs: [.5, 1, 1] vs [0, .5, 1] -> |diff| sums to 1.0
    got = float(cdf_loss(jnp.array(p), jnp.array(q), p=1, normalize_dist=False)[0])
    np.testing.assert_allclose(got, 1.0, rtol=1e-5)
    got2 = float(cdf_loss(jnp.array(p), jnp.array(q), p=2, normalize_dist=False, ret_raw=True)[0])
    np.testing.assert_allclose(got2, 0.5, rtol=1e-5)


def test_masked_batch_matches_unpadded():
    """Padding rows with sample_mask=0 must not change any loss value."""
    logits, probs, t, e = _rand_batch(B=5, K=6)
    pad_probs = np.concatenate([probs, np.full((3, 6), 1 / 6, np.float32)], 0)
    pad_logits = np.concatenate([logits, np.zeros((3, 6), np.float32)], 0)
    pad_t = np.concatenate([t, np.zeros(3, np.int32)])
    pad_e = np.concatenate([e, np.ones(3, np.float32)])
    mask = np.array([1] * 5 + [0] * 3, np.float32)

    for fn, arr, parr in [
        (surv_ifmle, probs, pad_probs),
        (surv_mle, probs, pad_probs),
    ]:
        a = float(fn(jnp.array(arr), jnp.array(t), jnp.array(e)))
        b = float(fn(jnp.array(parr), jnp.array(pad_t), jnp.array(pad_e), sample_mask=jnp.array(mask)))
        np.testing.assert_allclose(a, b, rtol=1e-5)

    a = float(surv_emd(jnp.array(probs), jnp.array(t), jnp.array(e), 10.0))
    b = float(surv_emd(jnp.array(pad_probs), jnp.array(pad_t), jnp.array(pad_e), 10.0,
                       sample_mask=jnp.array(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-5)

    a = float(surv_t2i(jnp.array(logits), jnp.array(t), jnp.array(e), 10.0))
    b = float(surv_t2i(jnp.array(pad_logits), jnp.array(pad_t), jnp.array(pad_e), 10.0,
                       sample_mask=jnp.array(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-4)

    a = float(surv_ple(jnp.array(logits[:, 0]), jnp.array(t.astype(np.float32)), jnp.array(e)))
    b = float(surv_ple(jnp.array(pad_logits[:, 0]), jnp.array(pad_t.astype(np.float32)),
                       jnp.array(pad_e), sample_mask=jnp.array(mask)))
    np.testing.assert_allclose(a, b, rtol=1e-5)


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
class TestReferenceParity:
    """Numerical parity vs the reference torch losses (behavioural goldens)."""

    @classmethod
    def setup_class(cls):
        add_reference_to_path()
        import torch  # noqa
        cls.torch = torch

    def _torch(self, x):
        return self.torch.tensor(np.asarray(x))

    def test_ifmle(self):
        from loss.loss_surv import SurvIFMLE
        _, probs, t, e = _rand_batch(8, 5)
        ref = SurvIFMLE()(self._torch(probs), self._torch(t).long(), self._torch(e)).item()
        got = float(surv_ifmle(jnp.array(probs), jnp.array(t), jnp.array(e)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_mle(self):
        from loss.loss_surv import SurvMLE
        _, probs, t, e = _rand_batch(8, 5)
        h = probs * 0.9  # pretend hazards
        ref = SurvMLE(alpha=0.3)(self._torch(h), self._torch(t).long(), self._torch(e)).item()
        got = float(surv_mle(jnp.array(h), jnp.array(t), jnp.array(e), alpha=0.3))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_ple(self):
        from loss.loss_surv import SurvPLE
        y = RNG.normal(size=8).astype(np.float32)
        t = RNG.uniform(1, 50, size=8).astype(np.float32)
        e = RNG.integers(0, 2, size=8).astype(np.float32)
        e[0] = 1.0
        ref = SurvPLE()(self._torch(y), self._torch(t), self._torch(e)).item()
        got = float(surv_ple(jnp.array(y), jnp.array(t), jnp.array(e)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_emd(self):
        from loss.loss_surv_ext import SurvEMD
        _, probs, t, e = _rand_batch(8, 5)
        for p in (1, 2):
            ref = SurvEMD(p=p)(
                self._torch(probs), self._torch(t).long(), self._torch(e), 13.7
            ).item()
            got = float(surv_emd(jnp.array(probs), jnp.array(t), jnp.array(e), 13.7, p=p))
            np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_t2i(self):
        from loss.loss_surv_ext import SurvT2I
        logits, _, t, e = _rand_batch(8, 5)
        for kind in ("CL", "KL"):
            ref = SurvT2I(loss=kind)(
                self._torch(logits), self._torch(t).long(), self._torch(e), 13.7
            )
            ref = ref.item() if hasattr(ref, "item") else float(ref)
            got = float(surv_t2i(jnp.array(logits), jnp.array(t), jnp.array(e), 13.7, loss=kind))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)

    def test_rank_recon_mse(self):
        from loss.loss_surv import rank_loss as ref_rank, recon_loss as ref_recon, MSE_loss as ref_mse
        y = RNG.normal(size=8).astype(np.float32)
        t = RNG.uniform(1, 50, size=8).astype(np.float32)
        e = RNG.integers(0, 2, size=8).astype(np.float32)
        e[2] = 1.0
        for add_weight in (False, True):
            ref = ref_rank(self._torch(y), self._torch(t), self._torch(e), add_weight=add_weight).item()
            got = float(rank_loss(jnp.array(y), jnp.array(t), jnp.array(e), add_weight=add_weight))
            np.testing.assert_allclose(got, ref, rtol=1e-4, atol=1e-6)
        ref = ref_recon(self._torch(y), self._torch(t), self._torch(e), alpha=0.2).item()
        got = float(recon_loss(jnp.array(y), jnp.array(t), jnp.array(e), alpha=0.2))
        np.testing.assert_allclose(got, ref, rtol=1e-5)
        ref = ref_mse(self._torch(y), self._torch(t), self._torch(e), include_censored=True).item()
        got = float(mse_loss(jnp.array(y), jnp.array(t), jnp.array(e), include_censored=True))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_supcon(self):
        from loss.loss_surv_ext import SupConLoss
        logits = RNG.normal(size=(3, 7)).astype(np.float32)
        targets = (RNG.random(size=(3, 7)) > 0.5).astype(np.float32)
        targets[:, 0] = 1.0  # ensure nonzero positives
        ref = SupConLoss(self._torch(logits), self._torch(targets)).item()
        got = float(sup_con_loss(jnp.array(logits), jnp.array(targets)))
        np.testing.assert_allclose(got, ref, rtol=1e-5)

    def test_convert_label(self):
        from loss.loss_surv_ext import convert_survival_label as ref_convert
        t = RNG.integers(0, 5, size=10)
        e = RNG.integers(0, 2, size=10)
        ref = ref_convert(self._torch(t).long(), self._torch(e).long(), 5).numpy()
        got = np.asarray(convert_survival_label(jnp.array(t), jnp.array(e), 5))
        np.testing.assert_array_equal(got, ref)
