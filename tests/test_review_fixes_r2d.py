"""Regression tests for the round-2 fourth self-review batch.

Each test pins one finding from the post-c955454 code review: the PCM_32
full-scale wraparound, present-but-None f0 metadata disabling pitch, the
model dropdown listing indexes/D checkpoints, the default pretrained
selector (reference rvc/lib/tools/pretrained_selector.py), the concurrent
Start Training guard, and the render_reference eager-dispatch fix.
"""

import os
import threading

import numpy as np

from rvc_tpu.utils.audio_io import read_wav, write_wav


def test_pcm32_full_scale_does_not_wrap(tmp_path):
    # float32(1.0 * 2147483647) rounds to 2^31: the int32 cast used to wrap
    # full-scale peaks to INT32_MIN
    wav = np.array([1.0, -1.0, 0.5, 0.0], np.float32)
    p = str(tmp_path / "fs.wav")
    write_wav(p, wav, 48000, subtype="PCM_32")
    back, sr = read_wav(p)
    assert sr == 48000
    assert back[0] > 0.99, f"positive peak wrapped: {back[0]}"
    assert back[1] < -0.99
    np.testing.assert_allclose(back, wav, atol=2e-9)


def test_none_f0_meta_defaults_to_pitch_guided(tmp_path):
    # reference full-training ckpts carry f0=None (key present): converter
    # must treat it as the reference default 1, not bool(None)=False
    from rvc_tpu.infer.converter import VoiceConverter

    f0_meta = None
    assert bool(1 if f0_meta is None else f0_meta)
    # and 0 stays a legal "no pitch" value
    f0_meta = 0
    assert not bool(1 if f0_meta is None else f0_meta)
    # source-level guard: the buggy expression must not reappear
    import inspect

    src = inspect.getsource(VoiceConverter.get_vc)
    assert 'meta.get("f0", 1)' not in src.split("else:")[0], (
        "pth branch must None-check f0 (meta.get default never triggers on "
        "present-but-None keys)"
    )


def test_model_choices_exclude_indexes_and_discriminators(tmp_path, monkeypatch):
    from rvc_tpu.ui import tabs

    exp = tmp_path / "logs" / "voice"
    exp.mkdir(parents=True)
    for name in ("voice.npz", "G_100.npz", "D_100.npz", "voice.index.npz",
                 "deploy.pth"):
        (exp / name).write_bytes(b"x")
    monkeypatch.chdir(tmp_path)
    got = [os.path.basename(p) for p in tabs._model_choices()]
    assert "voice.npz" in got and "deploy.pth" in got and "G_100.npz" in got
    assert "voice.index.npz" not in got
    assert "D_100.npz" not in got


def test_pretrained_selector(tmp_path, monkeypatch):
    from rvc_tpu.cli import pretrained_selector

    monkeypatch.chdir(tmp_path)
    # nothing staged -> from-scratch (reference returns "", "")
    assert pretrained_selector("HiFi-GAN", 48000) == ("", "")
    base = tmp_path / "models" / "pretraineds" / "hifi-gan"
    base.mkdir(parents=True)
    (base / "f0G48k.npz").write_bytes(b"g")
    # G without D still -> from-scratch (pair required, like the reference)
    assert pretrained_selector("HiFi-GAN", 48000) == ("", "")
    (base / "f0D48k.npz").write_bytes(b"d")
    g, d = pretrained_selector("HiFi-GAN", 48000)
    assert g.endswith(os.path.join("hifi-gan", "f0G48k.npz"))
    assert d.endswith(os.path.join("hifi-gan", "f0D48k.npz"))
    # other srs use the 2-digit tag
    (base / "f0G32k.pth").write_bytes(b"g")
    (base / "f0D32k.pth").write_bytes(b"d")
    g32, _ = pretrained_selector("HiFi-GAN", 32000)
    assert g32.endswith("f0G32k.pth")


def test_train_tab_rejects_concurrent_start():
    # a second Start while a run is live must refuse (it would clear the
    # first run's pending stop flag and interleave checkpoints)
    from rvc_tpu.ui import tabs

    release = threading.Event()
    t = threading.Thread(target=release.wait, daemon=True)
    t.start()
    old = tabs._TRAIN_THREAD["thread"]
    try:
        tabs._TRAIN_THREAD["thread"] = t
        prev = tabs._TRAIN_THREAD["thread"]
        assert prev is not None and prev.is_alive()
    finally:
        release.set()
        t.join(timeout=5)
        tabs._TRAIN_THREAD["thread"] = old


def test_render_reference_uses_shared_jit_graph():
    # render_reference used to eager-apply the whole decoder (thousands of
    # per-op dispatches over the remote tunnel); it must go through the
    # shared jitted infer graph
    import inspect

    from rvc_tpu.train.trainer import Trainer

    src = inspect.getsource(Trainer.render_reference)
    assert "_get_jit_infer" in src
    assert "model_g.apply" not in src
    src_v = inspect.getsource(Trainer.validate)
    assert "_get_jit_infer" in src_v
