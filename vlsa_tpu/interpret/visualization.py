"""Interpretation plots: SHAP bars, incidence/survival curves, ordinality
heatmap of rank embeddings, attention maps.

Behavioural port of ref utils/visualization.py:24-305 (matplotlib, host).
The OpenSlide WSI-overlay heatmap (ref lines 181-241) requires openslide +
raw WSIs and is gated behind an import check.
"""
from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def _plt():
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    return plt


def plot_shap_bars(shap_values: np.ndarray, prior_names: Optional[Sequence[str]] = None,
                   save_path: Optional[str] = None, title: str = "Prognostic-prior SHAP"):
    """Signed horizontal bar plot of per-prior Shapley importances
    (ref utils/visualization.py:24-113)."""
    plt = _plt()
    shap_values = np.asarray(shap_values)
    P = len(shap_values)
    names = prior_names if prior_names is not None else [f"prior {i}" for i in range(P)]
    order = np.argsort(np.abs(shap_values))
    fig, ax = plt.subplots(figsize=(7, 0.4 * P + 1.5))
    colors = ["#d62728" if v > 0 else "#1f77b4" for v in shap_values[order]]
    ax.barh(np.arange(P), shap_values[order], color=colors)
    ax.set_yticks(np.arange(P))
    ax.set_yticklabels([names[i] for i in order], fontsize=8)
    ax.axvline(0, color="k", lw=0.8)
    ax.set_xlabel("SHAP value (risk contribution)")
    ax.set_title(title)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_incidence_survival(probs: np.ndarray, time_coordinates=None,
                            save_path: Optional[str] = None):
    """Incidence function + derived survival curve (ref visualization.py:119-155)."""
    plt = _plt()
    probs = np.asarray(probs).reshape(-1)
    K = len(probs)
    xs = np.asarray(time_coordinates) if time_coordinates is not None else np.arange(K)
    survival = 1.0 - np.cumsum(probs)
    fig, (ax1, ax2) = plt.subplots(1, 2, figsize=(9, 3.2))
    ax1.bar(np.arange(K), probs, color="#1f77b4")
    ax1.set_title("Incidence function")
    ax1.set_xlabel("time bin")
    ax2.step(xs, survival, where="post", color="#d62728")
    ax2.set_ylim(0, 1)
    ax2.set_title("Survival function")
    ax2.set_xlabel("time")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_ordinality_heatmap(rank_embeddings: np.ndarray,
                            save_path: Optional[str] = None):
    """Cosine-similarity heatmap of rank embeddings + span accuracy
    (ref visualization.py:247-305): for an ordinal embedding the similarity
    should decay monotonically with rank distance."""
    plt = _plt()
    E = np.asarray(rank_embeddings)
    if E.ndim == 3:
        E = E.reshape(E.shape[0], -1)
    En = E / np.linalg.norm(E, axis=-1, keepdims=True)
    sim = En @ En.T
    K = sim.shape[0]
    # span accuracy: fraction of (i, j, k) with |i-j| < |i-k| where sim order agrees
    correct = total = 0
    for i in range(K):
        for j in range(K):
            for k in range(K):
                if abs(i - j) < abs(i - k):
                    total += 1
                    correct += sim[i, j] > sim[i, k]
    span_acc = correct / max(total, 1)
    fig, ax = plt.subplots(figsize=(4.5, 4))
    im = ax.imshow(sim, cmap="viridis")
    ax.set_title(f"Rank-embedding similarity (span acc {span_acc:.3f})")
    fig.colorbar(im, ax=ax)
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig, span_acc


def plot_attention_histogram(attention: np.ndarray, save_path: Optional[str] = None):
    """Per-prior attention distribution over patches (ref visualization.py:311-359;
    spatial overlays need coords + openslide)."""
    plt = _plt()
    A = np.asarray(attention)  # [P, N]
    fig, ax = plt.subplots(figsize=(6, 3))
    for p in range(A.shape[0]):
        ax.hist(A[p], bins=50, histtype="step", alpha=0.6, label=f"prior {p}")
    ax.set_yscale("log")
    ax.set_xlabel("attention weight")
    fig.tight_layout()
    if save_path:
        fig.savefig(save_path, dpi=150)
    return fig


def plot_wsi_heatmap(*args, **kwargs):  # pragma: no cover
    """Categorical patch heatmap over the WSI thumbnail (ref
    visualization.py:181-241). Needs openslide + raw slides."""
    try:
        import openslide  # noqa: F401
    except ImportError as exc:
        raise RuntimeError("plot_wsi_heatmap requires openslide and raw WSI "
                           "files, which are not available here") from exc
    raise NotImplementedError
