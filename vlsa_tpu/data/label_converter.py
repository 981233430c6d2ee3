"""Patient-level survival label table and discrete time-bin conversion.

Behavioural port of the reference label pipeline (ref:
dataset/label_converter.py): uniform-interval or quantile binning inferred
from the *training* split, default bin count ceil(sqrt(#events)), first bin
[0, a1) and last bin [a_last, +inf), plus KM best-guess de-censoring used by
the few-shot sampler.  Host-side (pandas/numpy) — labels feed jitted steps as
plain arrays.
"""
from __future__ import annotations

import math
from typing import Dict, List, Optional

import numpy as np
import pandas as pd

from ..eval.km import KaplanMeierArea

EPS = 1e-5


def get_best_guess_from_training_data(train_t, train_e, method="KM"):
    """Best-guess (de-censored) event times for a cohort via the KM margin
    method (ref: eval/SurvivalEVAL/Evaluations/MeanError.py:347-390)."""
    train_e = train_e.astype(bool)
    km_model = KaplanMeierArea(train_t, train_e)
    km_linear_zero = km_model.km_linear_zero
    if np.isinf(km_linear_zero):
        km_linear_zero = max(km_model.survival_times)
    best = train_t.copy().astype(float)
    censor_times = train_t[~train_e]
    if censor_times.size:
        bg = km_model.best_guess(censor_times.astype(float))
        bg[censor_times > km_linear_zero] = censor_times[censor_times > km_linear_zero]
        best[~train_e] = bg
    return best


def calculate_discrete_time_bins(
    patient_data: pd.DataFrame,
    column_t: str = "t",
    column_e: str = "e",
    num_bins: Optional[int] = None,
    use_quantiles: bool = False,
    max_time: Optional[float] = None,
) -> np.ndarray:
    """Compute bin edges; ref dataset/label_converter.py:38-59."""
    df_events = patient_data[patient_data[column_e] == 1]
    event_times = df_events[column_t]
    if num_bins is None:
        num_bins = math.ceil(math.sqrt(len(event_times)))
    if use_quantiles:
        _, qbins = pd.qcut(event_times, q=num_bins, retbins=True, labels=False)
        qbins = np.asarray(qbins, dtype=float)
    else:
        qbins = np.linspace(0, event_times.max(), num_bins + 1)
    if max_time is None:
        max_time = patient_data[column_t].max()
    qbins[0] = 0
    qbins[-1] = max_time + 1e-5
    return qbins


def _cut(values: pd.Series, bins: np.ndarray) -> np.ndarray:
    """pd.cut with right=False, include_lowest semantics -> integer bin ids."""
    labels = pd.cut(values, bins=bins, labels=False, right=False, include_lowest=True)
    return labels.values


def to_patient_data(df: pd.DataFrame, at_column: str = "patient_id") -> pd.DataFrame:
    """First row per patient (ref dataset/label_converter.py:61-64)."""
    df_gps = df.groupby(at_column).groups
    df_idx = [i[0] for i in df_gps.values()]
    return df.loc[df_idx, :]


def get_index_by_values(df, values, at_column="patient_id", select_element="first"):
    """Row indices for given patient ids (ref dataset/label_converter.py:66-85)."""
    assert select_element in ["first", "last", "all"]
    ret = []
    for v in values:
        sel = df[df[at_column] == v].index
        if len(sel) > 0:
            if select_element == "first":
                ret.append(sel[0])
            elif select_element == "last":
                ret.append(sel[-1])
            else:
                ret.extend(list(sel))
    return ret


class MetaSurvData:
    """Patient-level survival label table (ref dataset/label_converter.py:88-254)."""

    def __init__(self, path_label, column_t="t", column_e="e", verbose=True, **kws):
        self.path_label = path_label
        self.column_t = column_t
        self.column_e = column_e
        self.column_label = None
        self.label_format = None
        self.time_bins: Optional[np.ndarray] = None

        if isinstance(path_label, pd.DataFrame):
            self.full_data = path_label.copy()
            self.full_data["patient_id"] = self.full_data["patient_id"].astype(str)
        else:
            self.full_data = pd.read_csv(
                path_label, dtype={"patient_id": str, "pathology_id": str}
            )
        self.pat_data = to_patient_data(self.full_data, at_column="patient_id")

        self.data_split: Optional[Dict[str, List[str]]] = kws.get("data_split")
        if self.data_split is not None:
            assert isinstance(self.data_split, dict)

        self.min_t = self.pat_data[column_t].min()
        self.max_t = self.pat_data[column_t].max()
        if verbose:
            print("[time-to-event converter] at patient level")
            print(f"\tmin/avg/median/max time = {self.min_t}/{self.pat_data[column_t].mean():.2f}/"
                  f"{self.pat_data[column_t].median()}/{self.max_t}")
            print(f"\tratio of event = {self.pat_data[column_e].sum() / len(self.pat_data)}")

    def get_patient_data(self, pids=None, split=None, ret_columns=None):
        if pids is None and split is not None:
            assert split in self.data_split, f"split ({split}) not in data_split."
            pids = self.data_split[split]
        if ret_columns is None:
            ret_columns = list(self.pat_data.columns)
        if pids is not None:
            idxs = get_index_by_values(self.pat_data, pids, select_element="first")
            return self.pat_data.loc[idxs, ret_columns]
        return self.pat_data.loc[:, ret_columns]

    @property
    def num_bins(self):
        return None if self.time_bins is None else len(self.time_bins) - 1

    @property
    def time_coordinates(self):
        return None if self.time_bins is None else self.time_bins[:-1]

    def generate_continuous_label(self, new_column_t="y_t", new_column_e="y_e", normalize=False):
        """ref dataset/label_converter.py:150-171."""
        self.column_label = [new_column_t, new_column_e]
        self.pat_data.loc[:, new_column_e] = self.pat_data.loc[:, self.column_e]
        if normalize:
            if self.data_split is not None:
                idxs = get_index_by_values(self.pat_data, self.data_split["train"])
                max_time = self.pat_data.loc[idxs, self.column_t].max()
            else:
                max_time = self.max_t
            self.pat_data.loc[:, new_column_t] = self.pat_data.loc[:, self.column_t].apply(
                lambda x: min(1.0, x / max_time)
            )
            self.label_format = "continuous_ratio"
        else:
            self.pat_data.loc[:, new_column_t] = self.pat_data.loc[:, self.column_t]
            self.label_format = "continuous_time"
        return self.pat_data

    def generate_discrete_label(self, num_bins=None, new_column_t="y_t", new_column_e="y_e",
                                use_quantiles=True, summary=False):
        """Discretise times (bins inferred from the train split if available);
        ref dataset/label_converter.py:173-218."""
        self.column_label = [new_column_t, new_column_e]
        self.pat_data.loc[:, new_column_e] = self.pat_data.loc[:, self.column_e]
        self.label_format = "discrete_quantile" if use_quantiles else "discrete_uniform"

        if self.data_split is not None:
            idxs = get_index_by_values(self.pat_data, self.data_split["train"])
            cur_pat_data = self.pat_data.loc[idxs, :]
        else:
            cur_pat_data = self.pat_data

        qbins = calculate_discrete_time_bins(
            cur_pat_data, column_t=self.column_t, column_e=self.column_e,
            num_bins=num_bins, use_quantiles=use_quantiles, max_time=self.max_t,
        )
        discrete = _cut(self.pat_data[self.column_t], qbins)
        self.pat_data.loc[:, new_column_t] = discrete.astype(int)
        self.time_bins = np.asarray(qbins, dtype=float)
        print(f"[time-to-event converter] time_bins: {self.time_bins}.")
        return self.pat_data

    def collect_info_by_pids(self, pids, column_label=None):
        """pid -> slide ids + labels (ref dataset/label_converter.py:239-254)."""
        if column_label is None:
            column_label = self.column_label
        sel_pids, pid2sids, pid2label = [], {}, {}
        for pid in pids:
            sel_idxs = self.full_data[self.full_data["patient_id"] == pid].index
            if len(sel_idxs) > 0:
                sel_pids.append(pid)
                pid2sids[pid] = list(self.full_data.loc[sel_idxs, "pathology_id"])
                pat_idx = self.pat_data[self.pat_data["patient_id"] == pid].index[0]
                pid2label[pid] = list(self.pat_data.loc[pat_idx, column_label])
            else:
                print(f"[time-to-event converter] Warning: patient {pid} not found.")
        return sel_pids, pid2sids, pid2label


def calculate_uncensored_time_bins(patient_ids, meta_data: MetaSurvData,
                                   ret_continuous_time: bool = False):
    """KM best-guess de-censored discrete bins for the few-shot sampler
    (ref dataset/label_converter.py:9-36)."""
    actual = meta_data.get_patient_data(patient_ids, ret_columns=["t", "e"]).copy()
    actual["uncensored_t"] = get_best_guess_from_training_data(
        actual.t.values, actual.e.values, method="KM"
    )
    if meta_data.label_format is not None and "discrete" in meta_data.label_format:
        time_bins = meta_data.time_bins
    else:
        time_bins = calculate_discrete_time_bins(
            actual, column_t="t", column_e="e",
            num_bins=None, use_quantiles=False, max_time=meta_data.max_t,
        )
    actual["uncensored_t"] = actual["uncensored_t"].clip(time_bins[0] + EPS, time_bins[-1] - EPS)
    bins = _cut(actual["uncensored_t"], np.asarray(time_bins)).astype(int)
    if ret_continuous_time:
        return bins, actual.uncensored_t.values
    return bins
