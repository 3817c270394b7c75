"""Training callbacks (parity with reference model_interface.py:196-236)."""

from __future__ import annotations


class CallbackHandler:
    """Epoch/batch callbacks. ``epoch_callback`` returning False stops
    training (reference model_interface.py:203-222)."""

    def epoch_callback(self, epoch: int, epoch_loss: float) -> bool:
        return True

    def batch_callback(self, batch: int, batch_loss: float) -> None:
        pass
