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


def test_wsi_and_attention_heatmaps(tmp_path):
    """Coordinate-grid spatial maps (ref utils/visualization.py:181-241 +
    311-359): categorical patch heatmap and per-prior attention heatmaps
    render from coords alone (no slide reader)."""
    from vlsa_tpu.interpret.visualization import (
        get_default_cmap, plot_attention_heatmap, plot_wsi_heatmap)

    rng = np.random.default_rng(0)
    N, P = 200, 3
    side = 20
    grid = np.stack(np.meshgrid(np.arange(side), np.arange(side)), -1).reshape(-1, 2)
    coords = grid[:N] * 256
    labels = rng.integers(0, 5, size=N)
    fig, img = plot_wsi_heatmap(coords, labels, patch_size=256, downsample=32,
                                save_path=str(tmp_path / "wsi.png"))
    assert img.ndim == 3 and img.shape[2] == 3
    assert (tmp_path / "wsi.png").exists()
    # painted pixels differ from the blank canvas
    assert (img != 255).any()

    # same palette as the reference (first entry #696969)
    cmap = get_default_cmap(4)
    assert cmap[0] == (0x69, 0x69, 0x69)

    A = rng.random((P, N))
    A /= A.sum(1, keepdims=True)
    fig2, heats = plot_attention_heatmap(
        A, coords, patch_size=256, downsample=32,
        save_path=str(tmp_path / "attn.png"))
    assert len(heats) == P and heats[0].ndim == 3
    assert (tmp_path / "attn.png").exists()

    # background blending path
    bg = np.full((side * 8, side * 8, 3), 200, np.uint8)
    _, img_bg = plot_wsi_heatmap(coords, labels, patch_size=256, downsample=32,
                                 background=bg)
    assert (img_bg != img).any()
