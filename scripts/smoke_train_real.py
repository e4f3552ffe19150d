"""Full trainer smoke on hardware: synthetic tone dataset -> a few epochs of
the real 48k model -> assert the mel loss moves. Exercises the entire
training stack (dataset, bucketing, prefetch, fused step, checkpointing,
validation, deployable export) end to end on the attached chip."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

try:
    jax.config.update("jax_compilation_cache_dir", os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_bench_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import numpy as np

from rvc_tpu.configs import get_config
from rvc_tpu.train.trainer import Trainer, TrainerArgs
from rvc_tpu.utils.audio_io import write_wav

SR = 48000


def make_dataset(exp_dir: str, n: int = 16, n_frames: int = 220) -> None:
    os.makedirs(exp_dir, exist_ok=True)
    rng = np.random.default_rng(0)
    hop = 480
    rows = []
    for i in range(n):
        f0_hz = 110.0 * (2.0 ** (rng.uniform(0, 2)))
        t = np.arange(n_frames * hop) / SR
        # harmonic-ish tone with vibrato + noise floor
        vib = 1.0 + 0.01 * np.sin(2 * np.pi * 5.0 * t)
        wav = 0.0
        for h in range(1, 5):
            wav = wav + (0.3 / h) * np.sin(2 * np.pi * f0_hz * h * vib * t)
        wav = (wav + rng.normal(size=len(t)) * 0.01).astype(np.float32)
        wp = os.path.join(exp_dir, f"0_{i}.wav")
        write_wav(wp, wav, SR, subtype="FLOAT")
        feats = rng.normal(size=(n_frames // 2, 768)).astype(np.float32)
        f0f = np.full(n_frames, f0_hz, np.float32)
        from rvc_tpu.train.extract import coarse_f0_train

        f0c = coarse_f0_train(f0f.astype(np.float64))
        fp = os.path.join(exp_dir, f"f{i}.npy")
        cp = os.path.join(exp_dir, f"c{i}.npy")
        vp = os.path.join(exp_dir, f"v{i}.npy")
        np.save(fp, feats)
        np.save(cp, f0c)
        np.save(vp, f0f)
        rows.append(f"{wp}|{fp}|{cp}|{vp}|0")
    with open(os.path.join(exp_dir, "filelist.txt"), "w") as f:
        f.write("\n".join(rows) + "\n")


def main(epochs: int = 6) -> None:
    exp = "/tmp/rvc_tpu_smoke_train"
    import shutil

    shutil.rmtree(exp, ignore_errors=True)
    make_dataset(exp)

    cfg = get_config(48000)
    args = TrainerArgs(exp_dir=exp, total_epochs=epochs, save_every_epoch=epochs,
                       batch_size=4)
    trainer = Trainer(cfg, args)
    t0 = time.time()
    trainer.fit()
    print(f"trained {epochs} epochs in {time.time()-t0:.1f}s")

    mels = []
    with open(os.path.join(exp, "metrics.jsonl")) as f:
        for line in f:
            rec = json.loads(line)
            if "epoch/avg/loss_mel" in rec:
                mels.append(rec["epoch/avg/loss_mel"])
    print("epoch mel losses:", [round(m, 2) for m in mels])
    assert len(mels) >= 3
    assert mels[-1] < mels[0], "mel loss did not decrease"
    assert os.path.exists(os.path.join(exp, f"G_{epochs}.npz"))
    deploy = [p for p in os.listdir(exp) if p.endswith(f"_{epochs}e.npz")]
    assert deploy
    print("TRAIN SMOKE OK")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 6)
