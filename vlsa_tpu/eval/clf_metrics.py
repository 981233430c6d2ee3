"""Classification evaluators: binary + multi-class AUC/ACC/F1/ECE/MCE.

Behavioural port of ref eval/evaluator_clf.py:12-237 using sklearn on host.
"""
from __future__ import annotations

import numpy as np
from sklearn import metrics as skm
from sklearn.calibration import calibration_curve


def _to_np(x):
    if hasattr(x, "detach"):
        x = x.detach().cpu().numpy()
    return np.squeeze(np.asarray(x))


class BinClfEvaluator:
    def __init__(self, pos_label=1, **kws):
        self.pos_label = pos_label
        self.valid_functions = {
            "auc": self._auc,
            "loss": self._loss,
            "acc": self._acc,
            "acc_best": self._acc_best,
            "acc@mid": self._acc_mid_threshold,
            "recall": self._recall,
            "precision": self._precision,
            "f1_score": self._f1_score,
            "ece": self._ece,
            "mce": self._mce,
        }
        self.valid_metrics = list(self.valid_functions.keys())

    def _pre_compute(self, data):
        self.y = _to_np(data["y"])
        y_hat_full = _to_np(data["y_hat"])
        assert y_hat_full.ndim > 1 and y_hat_full.shape[-1] == 2, "Invalid prediction input."
        assert ((y_hat_full >= 0) & (y_hat_full <= 1)).all(), "Predictions must be probabilities."
        self.y_hat = y_hat_full[:, -1]
        self.fpr, self.tpr, self.thresholds = skm.roc_curve(
            self.y, self.y_hat, pos_label=self.pos_label, drop_intermediate=False)
        loss = (self.fpr - self.tpr)
        idx = np.argmin(loss, axis=0)
        self.threshold_optimal = self.thresholds[idx]
        self.cali_y, self.cali_yhat = calibration_curve(self.y, self.y_hat, n_bins=10)

    def _loss(self):
        p = np.clip(self.y_hat, 1e-7, 1 - 1e-7)
        return float(-np.mean(self.y * np.log(p) + (1 - self.y) * np.log(1 - p)))

    def _auc(self):
        return skm.auc(self.fpr, self.tpr)

    def _acc(self, threshold=None):
        threshold = self.threshold_optimal if threshold is None else threshold
        pred = (self.y_hat > threshold).astype(int)
        return float(np.sum(pred == self.y) / self.y.shape[0])

    def _recall(self, threshold=None):
        threshold = self.threshold_optimal if threshold is None else threshold
        pred = (self.y_hat > threshold).astype(int)
        return float(np.sum(pred[self.y == 1]) / np.sum(self.y))

    def _precision(self, threshold=None):
        threshold = self.threshold_optimal if threshold is None else threshold
        pred = (self.y_hat > threshold).astype(int)
        return float(np.sum(self.y[pred == 1]) / np.maximum(np.sum(pred), 1))

    def _f1_score(self, threshold=None):
        rec, pre = self._recall(threshold), self._precision(threshold)
        return 2 * rec * pre / max(rec + pre, 1e-12)

    def _acc_best(self):
        return max(self._acc(th) for th in self.thresholds)

    def _acc_mid_threshold(self):
        return self._acc(0.5)

    def _ece(self):
        return float(np.abs(self.cali_y - self.cali_yhat).mean())

    def _mce(self):
        return float(np.abs(self.cali_y - self.cali_yhat).max())

    def compute(self, data, metrics, **kws):
        self._pre_compute(data)
        return {m: self.valid_functions[m]() for m in metrics}


class MultiClfEvaluator:
    def __init__(self, **kws):
        self.valid_functions = {
            "auc": self._auc,
            "loss": self._loss,
            "acc": self._acc,
            "macro_f1_score": lambda: self._f1("macro"),
            "micro_f1_score": lambda: self._f1("micro"),
        }
        self.valid_metrics = list(self.valid_functions.keys())

    def _pre_compute(self, data):
        self.y = _to_np(data["y"]).astype(int)
        self.y_hat = _to_np(data["y_hat"])
        self.pred_cls = np.argmax(self.y_hat, axis=-1)

    def _loss(self):
        p = np.clip(self.y_hat[np.arange(len(self.y)), self.y], 1e-7, 1.0)
        return float(-np.mean(np.log(p)))

    def _auc(self):
        try:
            return skm.roc_auc_score(self.y, self.y_hat, multi_class="ovr")
        except ValueError:
            return float("nan")

    def _acc(self):
        return float(np.mean(self.pred_cls == self.y))

    def _f1(self, average):
        return skm.f1_score(self.y, self.pred_cls, average=average)

    def compute(self, data, metrics, **kws):
        self._pre_compute(data)
        return {m: self.valid_functions[m]() for m in metrics}
