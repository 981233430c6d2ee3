"""Host-side training-control semantics: EarlyStopping (behavioural port of
ref utils/func.py:324-377) and ReduceLROnPlateau (torch semantics as wired
at ref runner/base_handler.py:188-201,418-427)."""
import numpy as np
import pytest

from vlsa_tpu.optim.schedulers import EarlyStopping, ReduceLROnPlateau


def test_early_stopping_reference_semantics():
    es = EarlyStopping(warmup=2, patience=2, start_epoch=0)
    # warmup epochs are ignored entirely
    es(0, 1.0)
    es(1, 0.1)
    assert es.best_score is None and not es.save_ckpt() and not es.stop()
    # first post-warmup call sets the best and asks to save
    es(2, 0.5)
    assert es.best_score == -0.5 and es.save_ckpt() and not es.stop()
    # no improvement (needs > 1e-6 gain): counter runs up to patience
    es(3, 0.5)
    assert not es.save_ckpt() and not es.stop() and es.counter == 1
    es(4, 0.6)
    assert es.stop()  # counter == patience == 2, epoch > start_epoch
    # improvement resets the counter and saves
    es2 = EarlyStopping(warmup=0, patience=3)
    es2(0, 1.0)
    es2(1, 2.0)
    assert es2.counter == 1
    es2(2, 0.9)
    assert es2.counter == 0 and es2.save_ckpt() and es2.val_loss_min == 0.9


def test_early_stopping_start_epoch_gate():
    es = EarlyStopping(warmup=0, patience=1, start_epoch=5)
    es(0, 1.0)
    for epoch in range(1, 5):
        es(epoch, 2.0)  # counter >= patience but epoch <= start_epoch
        assert not es.stop()
    es(6, 2.0)
    assert es.stop()


def test_reduce_lr_on_plateau_matches_torch():
    torch = pytest.importorskip("torch")
    init_lr, factor, patience = 0.02, 0.5, 2
    p = torch.nn.Parameter(torch.zeros(1))
    opt = torch.optim.SGD([p], lr=init_lr)
    ref = torch.optim.lr_scheduler.ReduceLROnPlateau(
        opt, mode="min", factor=factor, patience=patience)
    ours = ReduceLROnPlateau(init_lr, factor=factor, patience=patience,
                             verbose=False)
    rng = np.random.default_rng(3)
    metrics = list(rng.uniform(0.5, 1.5, size=40))
    metrics[5] = 0.1  # a clear improvement mid-sequence
    for m in metrics:
        ref.step(m)
        lr_ours = ours.step(m)
        assert np.isclose(lr_ours, opt.param_groups[0]["lr"]), \
            (m, lr_ours, opt.param_groups[0]["lr"])
    assert lr_ours < init_lr  # the plateau sequence actually reduced it
