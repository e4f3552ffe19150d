"""Learning-rate schedules.

Parity target: reference rvc/train/train.py:787-822,894-913 — an optional
per-epoch linear warmup ((epoch+1)/warmup_duration) followed by per-epoch
exponential decay with gamma=0.999875 (config.train.lr_decay). The reference
steps schedulers once per epoch; here the schedule is a pure function of the
global step, converted via steps_per_epoch, so it lives inside the jitted
train step with zero host traffic.
"""

from __future__ import annotations


def make_epoch_lr_schedule(
    base_lr: float,
    steps_per_epoch: int,
    warmup_epochs: int = 0,
    gamma: float = 0.999875,
):
    """Returns an optax-style schedule fn: step -> lr.

    multiplier(e) = (e+1)/warmup for e < warmup_epochs (linear per-epoch ramp),
    then gamma^(e+1-warmup) for the decay phase, matching the reference's
    warmup-then-ExponentialLR stepping order.
    """
    spe = max(1, int(steps_per_epoch))

    def schedule(step):
        import jax.numpy as jnp

        epoch = jnp.asarray(step) // spe  # 0-based epoch index
        if warmup_epochs > 0:
            warm = jnp.minimum((epoch + 1) / warmup_epochs, 1.0)
            decay_epochs = jnp.maximum(epoch + 1 - warmup_epochs, 0)
        else:
            warm = 1.0
            decay_epochs = epoch
        return base_lr * warm * (gamma ** decay_epochs.astype(jnp.float32))

    return schedule
