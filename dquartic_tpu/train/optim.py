"""Optimizer and learning-rate schedule.

Matches the reference training runtime: AdamW with torch defaults
(betas 0.9/0.999, eps 1e-8, decoupled weight decay 0.01 —
/root/reference/dquartic/model/model_interface.py:1002-1011), global
gradient-norm clipping at 10.0 (model_interface.py:1121), and the linear
warmup -> cosine decay schedule stepped **per epoch**
(model_interface.py:64-194, 400).

The optax chain is built without a learning-rate transform; the jitted
train step scales updates by a dynamically passed ``lr`` scalar so the
epoch-based schedule never triggers recompilation.
"""

from __future__ import annotations

import dataclasses
import math

import optax


@dataclasses.dataclass(frozen=True)
class WarmupCosineSchedule:
    """Linear warmup then cosine decay, evaluated per epoch.

    ``__call__(epoch)`` reproduces the reference lambda
    (model_interface.py:122-155): epochs < warmup give
    ``(epoch+1)/warmup``; afterwards
    ``max(1e-10, 0.5*(1+cos(pi*2*cycles*progress)))``.

    Use :meth:`clamped` to apply the reference's warmup clamp
    (``warmup = epochs // 2`` when warmup > epochs,
    model_interface.py:1044-1045).
    """

    base_lr: float
    num_warmup_steps: int
    num_training_steps: int
    num_cycles: float = 0.5

    def scale(self, epoch: int) -> float:
        if epoch < self.num_warmup_steps:
            return float(epoch + 1) / float(max(1, self.num_warmup_steps))
        progress = float(epoch - self.num_warmup_steps) / float(
            max(1, self.num_training_steps - self.num_warmup_steps)
        )
        return max(1e-10, 0.5 * (1.0 + math.cos(math.pi * self.num_cycles * 2.0 * progress)))

    def __call__(self, epoch: int) -> float:
        return self.base_lr * self.scale(epoch)

    @classmethod
    def clamped(
        cls, base_lr: float, warmup_epochs: int, num_epochs: int, num_cycles: float = 0.5
    ) -> "WarmupCosineSchedule":
        if warmup_epochs > num_epochs:
            warmup_epochs = num_epochs // 2
        return cls(base_lr, warmup_epochs, num_epochs, num_cycles)


def make_optimizer(
    clip_norm: float = 10.0,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-8,
    weight_decay: float = 0.01,
    kind: str = "adamw",
) -> optax.GradientTransformation:
    """Gradient transform: clip -> adam moments -> decoupled weight decay.

    The returned updates are in **ascent** orientation; the train step
    multiplies by ``-lr``.

    ``kind="factored"`` swaps the Adam moments for a factored second
    moment (Adafactor-style ``scale_by_factored_rms``): optimizer state
    shrinks from 2x f32 params to ~row+column statistics — the
    single-chip recipe for the canonical 1.2B UNet1d, whose f32 Adam
    moments alone (9.6 GB) overflow a 16 GB chip (BENCH_NOTES.md). No
    first moment and no weight decay, matching the benched shipping
    training config.
    """
    if kind == "factored":
        return optax.chain(
            optax.clip_by_global_norm(clip_norm),
            optax.scale_by_factored_rms(),
        )
    if kind != "adamw":
        raise ValueError(f"Unknown optimizer kind: {kind!r} (adamw|factored)")
    return optax.chain(
        optax.clip_by_global_norm(clip_norm),
        optax.scale_by_adam(b1=b1, b2=b2, eps=eps),
        optax.add_decayed_weights(weight_decay),
    )
