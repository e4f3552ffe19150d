"""Feature extraction: F0 contours + content embeddings + filelist.

Parity target: rvc/train/extract/extract.py + preparing_files.py — over
`sliced_audios_16k/`: (1) per-file F0 -> `f0/<name>.wav.npy` (coarse 256-bin
mel quantization, extract.py:77-87) + `f0_voiced/<name>.wav.npy` (float);
(2) HuBERT last_hidden_state -> `extracted/<name>.npy`, NaN-guarded;
then config.json + filelist with `include_mutes` silent rows per speaker.

TPU-first: instead of one GPU process per device round-robining files
(extract.py:141-153), files are padded into length buckets and batched
through ONE jitted embedder/f0 graph — the chip sees large batches, the host
just shuttles wavs. Mute rows are synthesized on the fly from a zero
waveform (replacing the downloaded logs/mute fixtures)."""

from __future__ import annotations

import json
import os
from typing import Dict, List, Optional

import numpy as np

from ..utils.audio_io import load_audio

SR16K = 16000
HOP = 160
F0_BIN = 256
F0_MIN, F0_MAX = 50.0, 1100.0


def coarse_f0_train(f0: np.ndarray) -> np.ndarray:
    """256-bin mel-scale quantization (extract.py:77-87; differs from the
    inference-time 255-bin variant in infer/pipeline.py)."""
    mel_min = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
    mel_max = 1127.0 * np.log(1.0 + F0_MAX / 700.0)
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    quant = (f0_mel - mel_min) * (F0_BIN - 2) / (mel_max - mel_min) + 1
    return np.rint(np.clip(quant, 1, F0_BIN - 1)).astype(np.int64)


def _bucket(n: int, step: int = SR16K) -> int:
    return max(step, ((n + step - 1) // step) * step)


class FeatureExtractor:
    """Batched on-device F0 + embedding extraction."""

    def __init__(
        self,
        f0_method: str = "rmvpe",
        rmvpe_ckpt: Optional[str] = None,
        embedder_ckpt: Optional[str] = None,
        batch_size: int = 8,
        embedder_model: str = "contentvec",
        hop_length: int = HOP,
    ):
        import jax

        self.batch_size = batch_size
        self.f0_method = f0_method
        self.hop_length = int(hop_length)
        self._rmvpe = None
        self._predict_f0 = None
        if f0_method == "rmvpe":
            from ..predictors.f0_extractor import DEFAULT_CKPTS
            from ..predictors.rmvpe import RMVPE

            # default to the staged checkpoint: the UI calls run_extraction
            # without a path, and random-init RMVPE would silently ruin the
            # whole dataset's f0
            rmvpe_ckpt = rmvpe_ckpt or DEFAULT_CKPTS["rmvpe"]
            if rmvpe_ckpt and os.path.exists(rmvpe_ckpt):
                self._rmvpe = RMVPE.from_torch_checkpoint(rmvpe_ckpt)
            else:
                print(
                    "WARNING: no RMVPE checkpoint found (expected "
                    f"{rmvpe_ckpt or 'models/predictors/rmvpe.pt'}); "
                    "using RANDOM weights — extracted f0 will be garbage. "
                    "Run `prerequisites` or pass --rmvpe_ckpt.")
                self._rmvpe = RMVPE()
        elif f0_method in ("fcpe", "crepe", "crepe-tiny"):
            # the CLI/UI extract contract offers these too (cli.py:172);
            # per-file predictors, each jitted per length bucket internally
            from ..predictors.f0_extractor import build_predictors

            self._predict_f0 = build_predictors((f0_method,))[f0_method]
        from ..embedders import load_embedder, resolve_embedder_path

        if embedder_ckpt is None:
            embedder_ckpt = resolve_embedder_path(embedder_model)
        self.embedder, self.embedder_params = load_embedder(embedder_ckpt)
        self._jit_embed = jax.jit(
            lambda p, a: self.embedder.apply({"params": p}, a)
        )

    def compute_f0(self, audio: np.ndarray) -> np.ndarray:
        return self.compute_f0_batch([audio])[0]

    def compute_f0_batch(self, wavs: List[np.ndarray]) -> List[np.ndarray]:
        """Device-batched f0: RMVPE runs `batch_size` files per jitted call
        (RMVPE.infer_batch pads each group to a shared length bucket)."""
        outs: List[np.ndarray] = []
        if self.f0_method == "rmvpe" and self._rmvpe is not None:
            for i in range(0, len(wavs), self.batch_size):
                outs.extend(self._rmvpe.infer_batch(wavs[i : i + self.batch_size]))
        elif self._predict_f0 is not None:
            if (self.f0_method.startswith("crepe")
                    and self.hop_length != HOP):
                # crepe honors the CLI --hop_length; interpolate the contour
                # back to the 10 ms training grid (shared helper with
                # infer/pipeline.get_f0)
                from ..predictors.f0_extractor import interp_f0_to_grid

                outs = [
                    interp_f0_to_grid(
                        np.asarray(self._predict_f0(
                            w, hop_length=self.hop_length)),
                        len(w) // HOP + 1)
                    for w in wavs
                ]
            else:
                outs = [np.asarray(self._predict_f0(w)) for w in wavs]
        elif self.f0_method in ("yin", "pm"):
            from ..predictors.dsp_f0 import yin_f0_np

            outs = [yin_f0_np(w) for w in wavs]
        else:
            raise ValueError(f"unsupported f0 method {self.f0_method!r}")
        result = []
        for w, f0 in zip(wavs, outs):
            n_frames = len(w) // HOP + 1
            if len(f0) < n_frames:
                f0 = np.pad(f0, (0, n_frames - len(f0)))
            result.append(f0[:n_frames].astype(np.float64))
        return result

    def compute_embeddings_batch(self, wavs: List[np.ndarray]) -> List[np.ndarray]:
        """Pad a list of 16k wavs to a common bucket, run one jitted forward,
        slice per-file frame counts."""
        import jax.numpy as jnp

        out: List[np.ndarray] = []
        for i in range(0, len(wavs), self.batch_size):
            chunk = wavs[i : i + self.batch_size]
            t_pad = _bucket(max(len(w) for w in chunk))
            batch = np.zeros((len(chunk), t_pad), np.float32)
            for j, w in enumerate(chunk):
                batch[j, : len(w)] = w
            feats = np.asarray(
                self._jit_embed(self.embedder_params, jnp.asarray(batch))
            )
            for j, w in enumerate(chunk):
                n = max(1, (len(w) - 400) // 320 + 1)
                e = feats[j, :n]
                if not np.isfinite(e).all():  # NaN guard (extract.py:174-177)
                    e = np.nan_to_num(e)
                out.append(e.astype(np.float32))
        return out


def run_extraction(
    exp_dir: str,
    f0_method: str = "rmvpe",
    rmvpe_ckpt: Optional[str] = None,
    embedder_ckpt: Optional[str] = None,
    include_mutes: int = 2,
    sample_rate: int = 48000,
    batch_size: int = 8,
    embedder_model: str = "contentvec",
    hop_length: int = HOP,
    cpu_cores: Optional[int] = None,
) -> None:
    """Run both phases + write config.json and filelist.txt.

    `cpu_cores` parallelizes the host-side audio decode (the reference
    spreads files over a process pool, extract.py:141-153; here the device
    batches the compute, so threads cover only the wav decode)."""
    wav16_dir = os.path.join(exp_dir, "sliced_audios_16k")
    f0_dir = os.path.join(exp_dir, "f0")
    f0v_dir = os.path.join(exp_dir, "f0_voiced")
    emb_dir = os.path.join(exp_dir, "extracted")
    for d in (f0_dir, f0v_dir, emb_dir):
        os.makedirs(d, exist_ok=True)

    names = sorted(
        fn[:-4] for fn in os.listdir(wav16_dir) if fn.endswith(".wav")
    )
    fx = FeatureExtractor(f0_method, rmvpe_ckpt, embedder_ckpt, batch_size,
                          embedder_model=embedder_model,
                          hop_length=hop_length)

    # Stream in bounded chunks: decoding the whole dataset up front would
    # hold every float32 wav (plus all results) in host RAM at once — a
    # 24-hour set is ~5.5 GB before the first np.save. Chunked load/extract/
    # save bounds memory with no throughput loss (device batching is per
    # batch_size slice either way).
    chunk_files = max(1, batch_size) * 8
    pool = None
    if cpu_cores and cpu_cores > 1:
        from concurrent.futures import ThreadPoolExecutor

        pool = ThreadPoolExecutor(max_workers=cpu_cores)

    def _decode(chunk: List[str]) -> List[np.ndarray]:
        paths = [os.path.join(wav16_dir, f"{n}.wav") for n in chunk]
        if pool is not None:
            return list(pool.map(lambda p: load_audio(p, SR16K), paths))
        return [load_audio(p, SR16K) for p in paths]

    for c0 in range(0, len(names), chunk_files):
        chunk = names[c0 : c0 + chunk_files]
        wavs = _decode(chunk)
        for n, f0 in zip(chunk, fx.compute_f0_batch(wavs)):
            np.save(os.path.join(f0v_dir, f"{n}.wav.npy"), f0,
                    allow_pickle=False)
            np.save(
                os.path.join(f0_dir, f"{n}.wav.npy"), coarse_f0_train(f0),
                allow_pickle=False,
            )
        for n, emb in zip(chunk, fx.compute_embeddings_batch(wavs)):
            np.save(os.path.join(emb_dir, f"{n}.npy"), emb,
                    allow_pickle=False)
    if pool is not None:
        pool.shutdown()

    generate_config(exp_dir, sample_rate)
    generate_filelist(exp_dir, include_mutes=include_mutes, extractor=fx)


def generate_config(exp_dir: str, sample_rate: int) -> None:
    """Persist the experiment hyperparams (preparing_files.py:11-16)."""
    from ..configs import get_config

    path = os.path.join(exp_dir, "config.json")
    if not os.path.exists(path):
        with open(path, "w") as f:
            f.write(get_config(sample_rate).to_json())


def _make_mute_rows(exp_dir: str, extractor: "FeatureExtractor") -> Dict[str, str]:
    """Synthesize the silent filler example (reference ships precomputed
    logs/mute* fixtures, preparing_files.py:50-63; we derive them)."""
    mute_dir = os.path.join(exp_dir, "mute")
    os.makedirs(os.path.join(mute_dir, "sliced_audios"), exist_ok=True)
    for sub in ("f0", "f0_voiced", "extracted"):
        os.makedirs(os.path.join(mute_dir, sub), exist_ok=True)
    from ..utils.audio_io import write_wav

    dur = 3.0
    wav16 = np.zeros(int(SR16K * dur), np.float32)
    wav_path = os.path.join(mute_dir, "sliced_audios", "mute.wav")
    # dataset-rate silent wav: rate read from config.json
    with open(os.path.join(exp_dir, "config.json")) as f:
        sr = json.load(f)["data"]["sample_rate"]
    write_wav(wav_path, np.zeros(int(sr * dur), np.float32), sr, subtype="FLOAT")

    n_frames = len(wav16) // HOP + 1
    f0 = np.zeros(n_frames, np.float64)
    f0_path = os.path.join(mute_dir, "f0_voiced", "mute.wav.npy")
    f0c_path = os.path.join(mute_dir, "f0", "mute.wav.npy")
    np.save(f0_path, f0, allow_pickle=False)
    np.save(f0c_path, coarse_f0_train(f0), allow_pickle=False)

    emb = extractor.compute_embeddings_batch([wav16])[0]
    emb_path = os.path.join(mute_dir, "extracted", "mute.npy")
    np.save(emb_path, emb, allow_pickle=False)
    return {
        "wav": wav_path, "feats": emb_path, "f0c": f0c_path, "f0f": f0_path
    }


def generate_filelist(
    exp_dir: str,
    include_mutes: int = 2,
    extractor: Optional["FeatureExtractor"] = None,
) -> str:
    """Intersect artifact sets and write `wav|feats|f0c|f0f|sid` rows
    (preparing_files.py:18-80); adds include_mutes silent rows per speaker."""
    gt_dir = os.path.join(exp_dir, "sliced_audios")
    emb_dir = os.path.join(exp_dir, "extracted")
    f0_dir = os.path.join(exp_dir, "f0")
    f0v_dir = os.path.join(exp_dir, "f0_voiced")

    def stems(d, strip):
        return {f[: -len(strip)] for f in os.listdir(d) if f.endswith(strip)}

    names = (
        stems(gt_dir, ".wav") & stems(emb_dir, ".npy")
        & stems(f0_dir, ".wav.npy") & stems(f0v_dir, ".wav.npy")
    )
    rows, sids = [], []
    for n in sorted(names):
        sid = n.split("_")[0]
        if sid not in sids:
            sids.append(sid)
        rows.append(
            f"{os.path.join(gt_dir, n)}.wav|{os.path.join(emb_dir, n)}.npy|"
            f"{os.path.join(f0_dir, n)}.wav.npy|{os.path.join(f0v_dir, n)}.wav.npy|{sid}"
        )

    if include_mutes > 0 and extractor is not None and sids:
        mute = _make_mute_rows(exp_dir, extractor)
        for sid in sids * include_mutes:
            rows.append(
                f"{mute['wav']}|{mute['feats']}|{mute['f0c']}|{mute['f0f']}|{sid}"
            )

    info_path = os.path.join(exp_dir, "model_info.json")
    info = {}
    if os.path.exists(info_path):
        with open(info_path) as f:
            info = json.load(f)
    info["speakers_id"] = len(sids)
    with open(info_path, "w") as f:
        json.dump(info, f, indent=4)

    rng = np.random.default_rng(1234)
    rng.shuffle(rows)
    out = os.path.join(exp_dir, "filelist.txt")
    with open(out, "w") as f:
        f.write("\n".join(rows) + "\n")
    return out
