"""LR schedule tests (parity: reference warmup + ExponentialLR stepping,
train.py:787-822,894-913)."""

import numpy as np
import pytest

from rvc_tpu.train.schedules import make_epoch_lr_schedule


def test_warmup_ramp():
    s = make_epoch_lr_schedule(1e-4, steps_per_epoch=10, warmup_epochs=4)
    # epoch 0 (steps 0-9): lr = base * 1/4
    assert float(s(0)) == pytest.approx(2.5e-5)
    assert float(s(9)) == pytest.approx(2.5e-5)
    # epoch 1: 2/4
    assert float(s(10)) == pytest.approx(5e-5)
    # epoch 3: 4/4
    assert float(s(30)) == pytest.approx(1e-4)


def test_decay_after_warmup():
    gamma = 0.999875
    s = make_epoch_lr_schedule(1e-4, 10, warmup_epochs=2, gamma=gamma)
    # first epoch after warmup decays once
    assert float(s(20)) == pytest.approx(1e-4 * gamma, rel=1e-6)
    assert float(s(50)) == pytest.approx(1e-4 * gamma**4, rel=1e-6)


def test_no_warmup_decays_from_start():
    gamma = 0.995
    s = make_epoch_lr_schedule(1e-4, 5, warmup_epochs=0, gamma=gamma)
    assert float(s(0)) == pytest.approx(1e-4)
    assert float(s(5)) == pytest.approx(1e-4 * gamma, rel=1e-6)
    assert float(s(52)) == pytest.approx(1e-4 * gamma**10, rel=1e-6)
