"""LR controllers, torch-semantics.

- ReduceLROnPlateau (reference: train_rtpose_light3d_kdh3d.py:318-319 —
  mode='min', factor=0.8, patience=5, threshold=1e-4, threshold_mode='rel',
  cooldown=3, min_lr=0).
- StepLR (reference: train_a2j_mpaug_new.py:444 —
  lr_scheduler.StepLR(optimizer, step_size=10, gamma=0.2)).
"""

from __future__ import annotations


class StepLR:
    """Epoch-counting decay: lr = lr0 * gamma^(epoch // step_size).

    Exposes the same `.step(metric) -> lr` interface as ReduceLROnPlateau
    (the metric is ignored); `.best` mirrors the plateau scheduler so the
    Trainer's checkpoint metadata stays uniform."""

    def __init__(self, lr: float, step_size: int = 10, gamma: float = 0.2):
        self.lr0 = lr
        self.lr = lr
        self.step_size = step_size
        self.gamma = gamma
        self.epoch = 0
        self.best = None

    def step(self, metric: float) -> float:
        if self.best is None or metric < self.best:
            self.best = metric
        self.epoch += 1
        self.lr = self.lr0 * self.gamma ** (self.epoch // self.step_size)
        return self.lr


class ReduceLROnPlateau:
    def __init__(self, lr: float, mode: str = "min", factor: float = 0.8,
                 patience: int = 5, threshold: float = 1e-4,
                 threshold_mode: str = "rel", cooldown: int = 3, min_lr: float = 0.0):
        assert mode in ("min", "max") and threshold_mode in ("rel", "abs")
        self.lr = lr
        self.mode = mode
        self.factor = factor
        self.patience = patience
        self.threshold = threshold
        self.threshold_mode = threshold_mode
        self.cooldown = cooldown
        self.min_lr = min_lr
        self.best = None
        self.num_bad_epochs = 0
        self.cooldown_counter = 0

    def _is_better(self, current, best):
        if self.mode == "min":
            if self.threshold_mode == "rel":
                return current < best * (1.0 - self.threshold)
            return current < best - self.threshold
        if self.threshold_mode == "rel":
            return current > best * (1.0 + self.threshold)
        return current > best + self.threshold

    def step(self, metric: float) -> float:
        """Record an epoch metric; returns the (possibly reduced) lr."""
        if self.best is None or self._is_better(metric, self.best):
            self.best = metric
            self.num_bad_epochs = 0
        else:
            self.num_bad_epochs += 1

        if self.cooldown_counter > 0:
            self.cooldown_counter -= 1
            self.num_bad_epochs = 0

        if self.num_bad_epochs > self.patience:
            self.lr = max(self.lr * self.factor, self.min_lr)
            self.cooldown_counter = self.cooldown
            self.num_bad_epochs = 0
        return self.lr
