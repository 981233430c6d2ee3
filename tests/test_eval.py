"""Eval-stack tests: hand goldens + guarded parity vs the reference's vendored
SurvivalEVAL / sksurv-derived code on random cohorts."""
import numpy as np
import pytest

from vlsa_tpu.eval import (
    KaplanMeier,
    KaplanMeierArea,
    predict_mean_survival_time,
    predict_median_survival_time,
    predict_prob_from_curve,
    concordance,
    concordance_index,
    SurvivalEvaluator,
    BreslowEstimator,
)
from vlsa_tpu.eval.d_calibration import d_calibration
from vlsa_tpu.eval.mean_error import mean_error

from conftest import reference_available, add_reference_to_path

RNG = np.random.default_rng(7)


def _random_cohort(n, seed=0):
    rng = np.random.default_rng(seed)
    t = rng.uniform(1, 100, size=n).round(2)
    e = rng.integers(0, 2, size=n).astype(float)
    e[:2] = 1.0  # ensure events
    e[2] = 0.0  # ensure censoring
    return t, e


def _random_curves(n, k, seed=0):
    rng = np.random.default_rng(seed)
    inc = rng.dirichlet(np.ones(k), size=n)
    surv = 1 - np.cumsum(inc, axis=1)
    surv[surv < 0] = 0
    return surv


def test_km_hand():
    # classic KM example: times 1,2,3 all events, n=3
    km = KaplanMeier(np.array([1.0, 2.0, 3.0]), np.array([1, 1, 1]))
    np.testing.assert_allclose(km.survival_probabilities, [2 / 3, 1 / 3, 0.0])
    np.testing.assert_allclose(km.predict(np.array([0.5, 1.5, 10.0])), [1.0, 2 / 3, 0.0])


def test_mean_survival_time_linear():
    # curve 1.0 at t=0... linear extension: S = [0.5] at t=10 -> extended to 0 at t=20
    times = np.array([10.0])
    curve = np.array([0.5])
    # spline is constant 0.5 (single knot); slope=(1-0.5)/(0-10)=-0.05, zero at t=20
    # head integral [0,10] = 5.0 ; tail = (20-10) + (-0.05)*(400-100)/2 = 10 - 7.5 = 2.5
    got = predict_mean_survival_time(curve, times)
    np.testing.assert_allclose(got, 7.5)


def test_concordance_index_hand():
    # two samples, both events: earlier event must have higher risk
    y = np.array([[1.0, 1.0], [2.0, 1.0]])
    # incidence: sample0 dies early (bin0), sample1 late
    pred = np.array([[0.9, 0.1], [0.1, 0.9]])
    ci = concordance_index(y, pred, type_pred="incidence")
    assert ci == 1.0
    ci_flip = concordance_index(y, pred[::-1], type_pred="incidence")
    assert ci_flip == 0.0


@pytest.mark.skipif(not reference_available(), reason="reference repo not mounted")
class TestReferenceParity:
    @classmethod
    def setup_class(cls):
        add_reference_to_path()

    def test_km_predict_and_best_guess(self):
        from eval.SurvivalEVAL.Evaluations.util import KaplanMeierArea as RefKMA
        t, e = _random_cohort(60, seed=3)
        ref = RefKMA(t, e.astype(bool))
        got = KaplanMeierArea(t, e.astype(bool))
        np.testing.assert_allclose(got.survival_probabilities, ref.survival_probabilities)
        q = RNG.uniform(0, 120, size=30)
        np.testing.assert_allclose(got.predict(q), ref.predict(q))
        censor_times = t[e == 0]
        np.testing.assert_allclose(got.best_guess(censor_times), ref.best_guess(censor_times))
        np.testing.assert_allclose(got.km_linear_zero, ref.km_linear_zero)

    def test_curve_readouts(self):
        from eval.SurvivalEVAL.Evaluations.util import (
            predict_mean_survival_time as ref_mean,
            predict_median_survival_time as ref_median,
            predict_prob_from_curve as ref_prob,
        )
        times = np.sort(RNG.uniform(1, 80, size=6))
        surv = _random_curves(4, 6, seed=5)
        for i in range(4):
            np.testing.assert_allclose(
                predict_mean_survival_time(surv[i], times), ref_mean(surv[i], times), rtol=1e-6)
            np.testing.assert_allclose(
                predict_median_survival_time(surv[i], times), ref_median(surv[i], times), rtol=1e-8)
            for tt in (0.5, 40.0, 100.0):
                np.testing.assert_allclose(
                    predict_prob_from_curve(surv[i], times, tt), ref_prob(surv[i], times, tt),
                    rtol=1e-8)

    def test_full_evaluator(self):
        from eval.SurvivalEVAL import SurvivalEvaluator as RefEval
        k = 8
        times = np.sort(RNG.uniform(1, 90, size=k))
        test_t, test_e = _random_cohort(40, seed=11)
        train_t, train_e = _random_cohort(120, seed=12)
        surv = _random_curves(40, k, seed=13)

        ref = RefEval(surv, times, test_t, test_e, train_t, train_e, predict_time_method="Mean")
        got = SurvivalEvaluator(surv, times, test_t, test_e, train_t, train_e,
                                predict_time_method="Mean")
        np.testing.assert_allclose(got.predicted_event_times, ref.predicted_event_times, rtol=1e-6)

        ref_ci = ref.concordance(ties="All")[0]
        got_ci = got.concordance(ties="All")[0]
        np.testing.assert_allclose(got_ci, ref_ci, rtol=1e-10)

        ref_ibs = ref.integrated_brier_score(num_points=None, IPCW_weighted=True)
        got_ibs = got.integrated_brier_score(num_points=None, IPCW_weighted=True)
        np.testing.assert_allclose(got_ibs, ref_ibs, rtol=1e-8)

        ref_mae = ref.mae(method="Hinge")
        got_mae = got.mae(method="Hinge")
        np.testing.assert_allclose(got_mae, ref_mae, rtol=1e-8)

        ref_p, ref_bins = ref.d_calibration()
        got_p, got_bins = got.d_calibration()
        np.testing.assert_allclose(got_bins, ref_bins, rtol=1e-8)
        np.testing.assert_allclose(got_p, ref_p, rtol=1e-8)

    def test_mae_variants(self):
        from eval.SurvivalEVAL.Evaluations.MeanError import mean_error as ref_me
        test_t, test_e = _random_cohort(30, seed=21)
        train_t, train_e = _random_cohort(90, seed=22)
        pred = RNG.uniform(1, 110, size=30)
        for method in ("Uncensored", "Hinge", "Margin", "IPCW-v1", "IPCW-v2", "Pseudo_obs"):
            ref = ref_me(pred.copy(), test_t.copy(), test_e.copy(), train_t.copy(),
                         train_e.copy(), "absolute", method, True, False, True)
            got = mean_error(pred.copy(), test_t.copy(), test_e.copy(), train_t.copy(),
                             train_e.copy(), "absolute", method, True, False, True)
            np.testing.assert_allclose(got, ref, rtol=1e-8, err_msg=method)

    def test_cindex2_sksurv(self):
        from eval.cindex import concordance_index as ref_ci
        t, e = _random_cohort(50, seed=31)
        y = np.stack([t, e], axis=1)
        pred = _random_curves(50, 6, seed=32)
        # reconstruct "incidence" from survival curves
        inc = np.concatenate([1 - pred[:, :1], pred[:, :-1] - pred[:, 1:]], axis=1)
        for tp in ("incidence", "hazard"):
            kws = {"type_pred": tp} if tp == "incidence" else {}
            ref = ref_ci(y.copy(), inc.copy(), **kws)
            got = concordance_index(y, inc, **kws)
            np.testing.assert_allclose(got, ref, rtol=1e-12)

    def test_breslow(self):
        from eval.utils_coxph import BreslowEstimator as RefBreslow
        t, e = _random_cohort(50, seed=41)
        lp = RNG.normal(size=50)
        ref = RefBreslow().fit(lp, e.astype(bool), t)
        got = BreslowEstimator().fit(lp, e.astype(bool), t)
        np.testing.assert_allclose(got.unique_times_, ref.unique_times_)
        np.testing.assert_allclose(got.baseline_survival_.y, ref.baseline_survival_.y, rtol=1e-10)
        x_ref, s_ref = ref.get_survival_function(lp[:5], ret_ndarray=True)
        x_got, s_got = got.get_survival_function(lp[:5], ret_ndarray=True)
        np.testing.assert_allclose(s_got, s_ref, rtol=1e-10)


def test_auc_one_km_calibration():
    """New SurvivalEVAL-surface metrics (ref eval/SurvivalEVAL: AUC,
    OneCalibration, KMCalibration behaviours)."""
    from vlsa_tpu.eval.survival_evaluator import SurvivalEvaluator
    from vlsa_tpu.eval.km import KaplanMeier

    rng = np.random.default_rng(0)
    N, K = 120, 10
    grid = np.linspace(0, 60, K)
    t = rng.uniform(1, 55, N)
    e = rng.integers(0, 2, N).astype(float)

    # perfect discrimination -> AUC 1
    risk = np.argsort(np.argsort(-t)).astype(float) / N
    curves = np.clip(1 - risk[:, None] * np.linspace(0, 1, K)[None, :], 0, 1)
    ev = SurvivalEvaluator(curves, grid, t, np.ones(N), t, np.ones(N))
    assert ev.auc() == 1.0

    # anti-discrimination (risk inverted) -> AUC 0
    anti = np.clip(1 - (1 - risk)[:, None] * np.linspace(0, 1, K)[None, :], 0, 1)
    ev_bad = SurvivalEvaluator(anti, grid, t, np.ones(N), t, np.ones(N))
    assert ev_bad.auc() < 0.1

    # KM-matched cohort curve -> km_calibration == 0
    km = KaplanMeier(t, e)
    kmc = km.predict(grid)
    ev2 = SurvivalEvaluator(np.tile(kmc, (N, 1)), grid, t, e, t, e)
    assert ev2.km_calibration() < 1e-10

    # one_calibration returns a p-value in [0,1] and decile groups
    p, obs, exp = ev2.one_calibration(num_bins=5)
    assert 0.0 <= p <= 1.0 and len(obs) == 5 and len(exp) == 5


def test_optim_novograd_builds():
    import jax.numpy as jnp
    from vlsa_tpu.optim import create_optimizer
    params = {"w": jnp.ones((4, 4)), "b": jnp.zeros(4)}
    tx = create_optimizer("novograd", 1e-3, 1e-5, params)
    st = tx.init(params)
    u, _ = tx.update({"w": jnp.ones((4, 4)) * .1, "b": jnp.ones(4) * .1}, st, params)
    assert u["w"].shape == (4, 4)


def test_margin_concordance():
    """Margin pair-method (ref Concordance.py:127-149): exact vs the vendored
    reference when all pair weights are 1 (uncensored), and within 2e-3 under
    censoring (the reference misindexes its order-space weight vector with
    original-space indices, Concordance.py:211-212; we implement the intended
    product-weight semantics)."""
    import sys
    from conftest import reference_available, add_reference_to_path
    from vlsa_tpu.eval.concordance import concordance

    rng = np.random.default_rng(1)
    N = 50
    t = rng.uniform(1, 50, N)
    pred = rng.uniform(1, 50, N)
    tr_t = rng.uniform(1, 50, 200)
    tr_e = rng.integers(0, 2, 200).astype(bool)

    ours_unc = concordance(pred, t, np.ones(N, bool), tr_t, tr_e,
                           pair_method="Margin", ties="All")
    e = rng.integers(0, 2, N).astype(bool)
    ours_cen = concordance(pred, t, e, tr_t, tr_e,
                           pair_method="Margin", ties="All")
    assert 0.0 <= ours_cen[0] <= 1.0
    # predicting the de-censored ordering itself scores far above chance
    good = concordance(t, t, e, tr_t, tr_e, pair_method="Margin", ties="All")
    assert good[0] > 0.85

    if reference_available():
        add_reference_to_path()
        sys.path.insert(0, "/root/reference/eval")
        try:
            from SurvivalEVAL.Evaluations.Concordance import concordance as ref_conc
        finally:
            sys.path.remove("/root/reference/eval")
        ref_unc = ref_conc(pred.copy(), t.copy(), np.ones(N, bool), tr_t.copy(),
                           tr_e.copy(), pair_method="Margin", ties="All")
        assert abs(ours_unc[0] - ref_unc[0]) < 1e-12
        # no censored comparison vs the reference: its order-space weight
        # vector is misindexed with original-space indices
        # (Concordance.py:211-212), which diverges arbitrarily once the
        # best-guess sort is not the identity
