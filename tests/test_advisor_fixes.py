"""Regression tests for the round-2 self-review findings.

Each test pins a defect found by the post-round code review: PESQ crashing
on non-64-multiple lengths, the preset surface dropping filter_radius, the
UI stop path needing a cross-thread flag, orbax dirs escaping
save_only_latest, and the strided-fold cap breaking for strides that don't
divide 512.
"""

import os
import threading

import numpy as np
import pytest


def test_pesq_wb_arbitrary_length():
    """pesq_wb must handle lengths that are not multiples of 64
    (real validation clips almost never are)."""
    from rvc_tpu.utils.pesq_np import pesq_wb

    rng = np.random.default_rng(0)
    for n in (16123, 16001, 4801):
        ref = rng.standard_normal(n).astype(np.float32) * 0.1
        deg = ref + 0.01 * rng.standard_normal(n).astype(np.float32)
        score = pesq_wb(ref, deg)
        assert np.isfinite(score) and 1.0 <= score <= 4.7


def test_preset_roundtrip_keeps_filter_radius(tmp_path):
    from rvc_tpu.utils.presets import load_preset, save_preset

    save_preset("t", {"pitch": 2, "filter_radius": 7, "junk": 1},
                preset_dir=str(tmp_path))
    pr = load_preset("t", preset_dir=str(tmp_path))
    assert pr["filter_radius"] == 7
    assert "junk" not in pr


def test_request_stop_sets_and_reset_clears_flag():
    """request_stop works from any thread; fit() deliberately never clears
    the flag (a stop during the minutes-long init/compile must land), so
    launchers call reset_stop() before spawning a new run."""
    from rvc_tpu.train import trainer as T

    T.reset_stop()
    th = threading.Thread(target=T.request_stop)
    th.start()
    th.join()
    assert T._STOP_EVENT.is_set()
    T.reset_stop()
    assert not T._STOP_EVENT.is_set()


def _train_tab_handlers():
    """Build the real train tab through the FakeGradio shim and return the
    wired (do_train, do_stop) click handlers."""
    from test_ui_builders import I18N, make_gr

    from rvc_tpu.ui import tabs

    gr = make_gr()
    tabs.train_tab(gr, I18N)
    clicks = [(fn, ins) for c in gr.components
              for (fn, ins, _outs) in getattr(c, "events", [])]
    do_stop = next(fn for fn, ins in clicks
                   if fn.__name__ == "do_stop")
    do_train = next(fn for fn, ins in clicks
                    if fn.__name__ == "do_train")
    return do_train, do_stop


def test_ui_stop_without_training_run():
    """Driving the REAL Stop handler with no run in flight must report that
    and leave the stop flag untouched (no SIGINT, no stale flag)."""
    from rvc_tpu.train import trainer as T
    from rvc_tpu.ui import tabs

    _do_train, do_stop = _train_tab_handlers()
    tabs._TRAIN_THREAD["thread"] = None
    T.reset_stop()
    msg = do_stop()
    assert "No training run" in msg
    assert not T._STOP_EVENT.is_set()


def test_ui_stop_during_startup_survives(monkeypatch):
    """A stop clicked while the run is still compiling (thread alive, fit
    not yet polling) must persist: fit never clears the flag, and the
    handler sets it whenever the thread is alive."""
    import time

    from rvc_tpu.train import trainer as T
    from rvc_tpu.ui import tabs

    _do_train, do_stop = _train_tab_handlers()
    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.start()  # stands in for the cli_main/Trainer-init thread
    tabs._TRAIN_THREAD["thread"] = t
    T.reset_stop()
    try:
        msg = do_stop()
        assert "Stop requested" in msg
        # the flag must still be set for fit()'s first epoch-boundary check
        assert T._STOP_EVENT.is_set()
    finally:
        release.set()
        t.join(timeout=5)
        tabs._TRAIN_THREAD["thread"] = None
        T.reset_stop()


def test_orbax_prune_keeps_only_latest(tmp_path):
    from rvc_tpu.train.trainer import _prune_orbax_dirs

    for n in (10, 20, 30):
        os.makedirs(tmp_path / f"orbax_{n}")
    (tmp_path / "orbax_notanum").mkdir()
    _prune_orbax_dirs(str(tmp_path), keep_epoch=30)
    left = sorted(p.name for p in tmp_path.iterdir())
    assert left == ["orbax_30", "orbax_notanum"]


@pytest.mark.slow
def test_folded_conv_stride_not_dividing_512():
    """ci=co=1 with stride 5: the auto-fold cap must stay a multiple of the
    stride (previously min(..., 512) tripped the fold % s assert)."""
    import jax
    import jax.numpy as jnp

    from rvc_tpu.ops.folded_conv import folded_conv1d_strided

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((1, 600, 1)), jnp.float32)
    k = jnp.asarray(rng.standard_normal((15, 1, 1)), jnp.float32)
    y = folded_conv1d_strided(x, k, stride=5, padding=7)
    ref = jax.lax.conv_general_dilated(
        x.transpose(0, 2, 1), k.transpose(2, 1, 0), (5,), [(7, 7)]
    ).transpose(0, 2, 1)
    assert y.shape == ref.shape
    np.testing.assert_allclose(np.asarray(y), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_read_midi_notes_mid_track_tempo_change(tmp_path):
    """Notes after a tempo meta event must be timed by accumulating seconds
    across tempo regions, not by applying the final tempo to absolute ticks
    (advisor r2: f0_midi.py read_midi_notes)."""
    from rvc_tpu.predictors.f0_midi import read_midi_notes

    def vlq(n):
        out = [n & 0x7F]
        n >>= 7
        while n:
            out.insert(0, 0x80 | (n & 0x7F))
            n >>= 7
        return bytes(out)

    division = 480  # ticks/beat
    ev = b""
    # tempo 120 BPM (500000 us/beat); note A4 on t0 .. off 480 (= 0.5 s)
    ev += vlq(0) + b"\xff\x51\x03" + (500000).to_bytes(3, "big")
    ev += vlq(0) + b"\x90\x45\x64"
    ev += vlq(480) + b"\x80\x45\x00"
    # tempo 60 BPM; note on 480 .. off 960 (1 beat = 1.0 s now)
    ev += vlq(0) + b"\xff\x51\x03" + (1000000).to_bytes(3, "big")
    ev += vlq(0) + b"\x90\x47\x64"
    ev += vlq(480) + b"\x80\x47\x00"
    ev += vlq(0) + b"\xff\x2f\x00"  # end of track
    data = (b"MThd" + (6).to_bytes(4, "big") + (0).to_bytes(2, "big")
            + (1).to_bytes(2, "big") + division.to_bytes(2, "big")
            + b"MTrk" + len(ev).to_bytes(4, "big") + ev)
    p = tmp_path / "t.mid"
    p.write_bytes(data)

    notes = read_midi_notes(str(p))
    assert len(notes) == 2
    (s0, e0, p0), (s1, e1, p1) = notes
    assert (p0, p1) == (0x45, 0x47)
    np.testing.assert_allclose([s0, e0], [0.0, 0.5], atol=1e-9)
    np.testing.assert_allclose([s1, e1], [0.5, 1.5], atol=1e-9)
