"""Mean absolute/squared error for predicted survival times under censoring.

Behavioural port of ref eval/SurvivalEVAL/Evaluations/MeanError.py:125-344.
The runner reports MAE with method="Hinge" and KM confidence weights.
"""
from __future__ import annotations

from typing import Optional

import numpy as np

from .km import KaplanMeierArea


def mean_error(
    predicted_times: np.ndarray,
    event_times: np.ndarray,
    event_indicators: np.ndarray,
    train_event_times: Optional[np.ndarray] = None,
    train_event_indicators: Optional[np.ndarray] = None,
    error_type: str = "absolute",
    method: str = "Hinge",
    weighted: bool = True,
    log_scale: bool = False,
    reduction: bool = True,
) -> float:
    predicted_times = np.asarray(predicted_times, dtype=float)
    event_times = np.asarray(event_times, dtype=float)
    event_indicators = np.asarray(event_indicators).astype(bool)
    n_test = event_times.size
    if train_event_indicators is not None:
        train_event_indicators = np.asarray(train_event_indicators).astype(bool)

    if method in ("Margin", "IPCW-v1", "IPCW-v2", "Pseudo_obs", "Pseudo_obs_pop"):
        if train_event_times is None or train_event_indicators is None:
            raise ValueError(f"If method is '{method}', training set values must be included.")
        km_model = KaplanMeierArea(train_event_times, train_event_indicators)
        km_linear_zero = km_model.km_linear_zero
        if np.isinf(km_linear_zero):
            km_linear_zero = max(km_model.survival_times)
        censor_times = event_times[~event_indicators]
        weights = np.ones(n_test)
        if weighted:
            weights[~event_indicators] = 1 - km_model.predict(censor_times)

    error_func = np.abs if error_type == "absolute" else np.square
    if error_type not in ("absolute", "squared"):
        raise TypeError("Please enter one of 'absolute' or 'squared'.")

    if method == "Uncensored":
        if log_scale:
            errors = np.log(event_times[event_indicators]) - np.log(predicted_times[event_indicators])
        else:
            errors = event_times[event_indicators] - predicted_times[event_indicators]
        return error_func(errors) if not reduction else float(error_func(errors).mean())

    if method == "Hinge":
        # early predictions only; censored errors clamped at 0 (ref lines 207-225)
        weights = np.ones(predicted_times.size)
        if weighted:
            if train_event_times is None or train_event_indicators is None:
                raise ValueError("'weighted' Hinge requires training set values.")
            km_model = KaplanMeierArea(train_event_times, train_event_indicators)
            censor_times = event_times[~event_indicators]
            weights[~event_indicators] = 1 - km_model.predict(censor_times)
        if log_scale:
            errors = np.log(event_times) - np.log(predicted_times)
        else:
            errors = event_times - predicted_times
        errors[~event_indicators] = np.maximum(errors[~event_indicators], 0)
        if not reduction:
            return error_func(errors)
        return float(np.average(error_func(errors), weights=weights))

    if method == "Margin":
        best_guesses = km_model.best_guess(censor_times)
        best_guesses[censor_times > km_linear_zero] = censor_times[censor_times > km_linear_zero]
        errors = np.empty(predicted_times.size)
        if log_scale:
            errors[event_indicators] = (np.log(event_times[event_indicators])
                                        - np.log(predicted_times[event_indicators]))
            errors[~event_indicators] = np.log(best_guesses) - np.log(predicted_times[~event_indicators])
        else:
            errors[event_indicators] = event_times[event_indicators] - predicted_times[event_indicators]
            errors[~event_indicators] = best_guesses - predicted_times[~event_indicators]
        if not reduction:
            return error_func(errors)
        return float(np.average(error_func(errors), weights=weights))

    if method == "IPCW-v1":
        # surrogate = mean train event time after each censor time (ref lines 243-265)
        best_guesses = np.empty(n_test)
        train_events = train_event_times[train_event_indicators == 1]
        for i in range(n_test):
            if event_indicators[i]:
                best_guesses[i] = event_times[i]
            else:
                after = train_events[train_events > event_times[i]]
                best_guesses[i] = np.mean(after) if after.size else np.nan
        nan_idx = np.argwhere(np.isnan(best_guesses))
        predicted_times = np.delete(predicted_times, nan_idx)
        best_guesses = np.delete(best_guesses, nan_idx)
        weights = np.delete(weights, nan_idx)
        if log_scale:
            errors = np.log(best_guesses) - np.log(predicted_times)
        else:
            errors = best_guesses - predicted_times
        if not reduction:
            return error_func(errors)
        return float(np.average(error_func(errors), weights=weights))

    if method == "IPCW-v2":
        ipc_model = KaplanMeierArea(train_event_times, 1 - train_event_indicators)
        ipc_pred = ipc_model.predict(event_times)
        ipc_pred[ipc_pred == 0] = np.inf
        if log_scale:
            errors = np.log(event_times) - np.log(predicted_times)
        else:
            errors = event_times - predicted_times
        errors = errors * event_indicators / ipc_pred
        if not reduction:
            return error_func(errors)
        return float(error_func(errors).mean())

    if method == "Pseudo_obs":
        # population-mean surrogate for censored subjects (ref lines 325-341)
        sub_expect_time = km_model.mean
        best_guesses = event_times.copy().astype(float)
        best_guesses[~event_indicators] = sub_expect_time
        if log_scale:
            errors = np.log(best_guesses) - np.log(predicted_times)
        else:
            errors = best_guesses - predicted_times
        if not reduction:
            return error_func(errors)
        return float(np.average(error_func(errors), weights=weights))

    raise ValueError(f"Unknown method '{method}'.")
