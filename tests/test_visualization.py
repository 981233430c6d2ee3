"""Visualization smoke tests (headless matplotlib)."""
import numpy as np

from vlsa_tpu.interpret.visualization import (
    plot_attention_histogram,
    plot_incidence_survival,
    plot_ordinality_heatmap,
    plot_shap_bars,
)

RNG = np.random.default_rng(0)


def test_plots_render(tmp_path):
    shap = RNG.normal(size=8)
    fig = plot_shap_bars(shap, save_path=str(tmp_path / "shap.png"))
    assert (tmp_path / "shap.png").exists()

    probs = np.abs(RNG.normal(size=6))
    probs = probs / probs.sum()
    plot_incidence_survival(probs, save_path=str(tmp_path / "inc.png"))
    assert (tmp_path / "inc.png").exists()

    A = np.abs(RNG.normal(size=(4, 100)))
    plot_attention_histogram(A, save_path=str(tmp_path / "attn.png"))
    assert (tmp_path / "attn.png").exists()


def test_ordinality_span_accuracy_perfect_ordering():
    # embeddings on a line: similarity decays monotonically with rank distance
    K, D = 6, 8
    base = RNG.normal(size=D)
    direction = RNG.normal(size=D) * 0.05
    E = np.stack([base + i * direction for i in range(K)])
    _, span_acc = plot_ordinality_heatmap(E)
    assert span_acc > 0.95
