"""ReduceLROnPlateau controller, torch-semantics.

Reference: train_rtpose_light3d_kdh3d.py:318-319 —
ReduceLROnPlateau(mode='min', factor=0.8, patience=5, threshold=1e-4,
threshold_mode='rel', cooldown=3, min_lr=0).
"""

from __future__ import annotations


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
