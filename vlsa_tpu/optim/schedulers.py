"""Host-side training control: early stopping + reduce-on-plateau LR.

Behavioural ports of ref utils/func.py:324-377 (EarlyStopping with
warmup/patience/best-ckpt signal) and torch ReduceLROnPlateau as wired at
ref runner/base_handler.py:188-201,418-427.
"""
from __future__ import annotations

import numpy as np


class EarlyStopping:
    def __init__(self, warmup=5, patience=15, start_epoch=0, verbose=False):
        self.warmup = warmup
        self.patience = patience
        self.start_epoch = start_epoch
        self.verbose = verbose
        self.counter = 0
        self.best_score = None
        self.early_stop = False
        self.save_checkpoint = False
        self.val_loss_min = np.inf

    def __call__(self, epoch, val_loss):
        self.save_checkpoint = False
        score = -val_loss
        if epoch < self.warmup:
            pass
        elif self.best_score is None:
            self.best_score = score
            self._update(val_loss)
        elif score - 1e-6 < self.best_score:
            self.counter += 1
            print(f"[early-stopping] counter: {self.counter} out of {self.patience}")
            if self.counter >= self.patience and epoch > self.start_epoch:
                self.early_stop = True
        else:
            self.best_score = score
            self._update(val_loss)
            self.counter = 0

    def stop(self, **kws):
        return self.early_stop

    def save_ckpt(self, **kws):
        return self.save_checkpoint

    def _update(self, val_loss):
        if self.verbose:
            print(f"[early-stopping] validation loss decreased "
                  f"({self.val_loss_min:.6f} --> {val_loss:.6f}). Saving model ...")
        self.val_loss_min = val_loss
        self.save_checkpoint = True


class ReduceLROnPlateau:
    """Host-side mirror of torch.optim.lr_scheduler.ReduceLROnPlateau
    (mode='min'); exposes the current LR factor to write into the
    inject_hyperparams optimizer state."""

    def __init__(self, init_lr: float, factor: float = 0.5, patience: int = 10,
                 threshold: float = 1e-4, min_lr: float = 0.0, verbose: bool = True):
        self.lr = init_lr
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.min_lr = min_lr
        self.verbose = verbose
        self.best = np.inf
        self.num_bad_epochs = 0

    def step(self, metric: float) -> float:
        if metric is None:
            return self.lr
        if metric < self.best * (1.0 - self.threshold):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1
        if self.num_bad_epochs > self.patience:
            new_lr = max(self.lr * self.factor, self.min_lr)
            if new_lr < self.lr and self.verbose:
                print(f"[lr-scheduler] reducing lr {self.lr:.2e} -> {new_lr:.2e}")
            self.lr = new_lr
            self.num_bad_epochs = 0
        return self.lr
