"""VoiceConverter: the user-facing conversion orchestrator.

Parity target: rvc/infer/infer.py:41-493 — loads a checkpoint (ours .npz or
reference .pth via conversion), caches the content embedder, optional
split-audio chunking, denoise, post-FX chain, format export, batch mode.
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Optional

import jax
import numpy as np

from ..configs import get_config
from ..embedders import load_embedder
from ..models.synthesizer import Synthesizer
from ..ops.retrieval import FeatureIndex
from ..utils.audio_io import load_audio, resample, save_audio
from ..utils.checkpoints import (
    derive_synth_arch,
    load_checkpoint,
    load_rvc_pth,
)
from ..utils.split_audio import merge_audio, process_audio
from .pipeline import Pipeline, PipelineConfig
from .postprocess import apply_post_process


from ..predictors.f0_extractor import DEFAULT_CKPTS as _DEFAULT_PREDICTOR_CKPTS


class VoiceConverter:
    # single source of truth for staged predictor checkpoints
    PREDICTOR_CKPTS = dict(_DEFAULT_PREDICTOR_CKPTS)

    def __init__(self, precision: Optional[str] = None):
        """precision: "bf16" (default, mirrors the reference's fp16-first
        inference config) or "fp32"; when None, the UI settings file
        (logs/ui_config.json, settings tab) is honored."""
        if precision is None:
            precision = "bf16"
            try:
                import json

                with open(os.path.join("logs", "ui_config.json")) as f:
                    precision = json.load(f).get("precision", "bf16")
            except Exception:
                pass
        self.precision = precision
        self.pipeline: Optional[Pipeline] = None
        self.loaded_model: Optional[str] = None
        self.last_embedder: Optional[str] = None
        self.embedder = None
        self.embedder_params = None
        self.tgt_sr: Optional[int] = None
        self.use_f0 = True
        self._predictors: Dict[str, Any] = {}
        self._index_cache: Dict[str, Any] = {}

    def get_predictors(self, f0_method: str) -> Dict[str, Any]:
        """Instantiate (and cache) the f0 predictors a method needs; local
        checkpoints under models/predictors/ are converted on load, random
        init otherwise (reference auto-downloads, pipeline.py:207,355-366)."""
        from ..predictors.f0_extractor import build_predictors, parse_f0_methods

        methods = parse_f0_methods(f0_method)

        missing = [m for m in methods if m not in self._predictors and m != "yin"]
        if missing:
            self._predictors.update(build_predictors(
                tuple(dict.fromkeys(missing)),
                rmvpe_ckpt=self.PREDICTOR_CKPTS.get("rmvpe"),
                fcpe_ckpt=self.PREDICTOR_CKPTS.get("fcpe"),
                crepe_ckpt=self.PREDICTOR_CKPTS.get("crepe"),
            ))
        return self._predictors

    # -- model management ----------------------------------------------------

    def load_embedder_model(self, embedder_model: str = "contentvec",
                            embedder_model_custom: Optional[str] = None,
                            final_proj_dim: Optional[int] = None) -> None:
        # cache under the custom path only when it actually resolves —
        # caching a fallback under the custom key would pin the wrong
        # embedder even after the user creates the file
        custom_ok = bool(embedder_model_custom
                         and os.path.exists(embedder_model_custom))
        key = ((embedder_model_custom if custom_ok else embedder_model),
               final_proj_dim)
        if key == self.last_embedder and self.embedder is not None:
            return
        from ..embedders import HubertConfig, load_embedder_by_name

        self.embedder, self.embedder_params = load_embedder_by_name(
            embedder_model, embedder_model_custom,
            cfg=HubertConfig(final_proj_dim=final_proj_dim),
        )
        self.last_embedder = key

    def get_vc(self, model_path: str, embedder_model: str = "contentvec",
               embedder_model_custom: Optional[str] = None) -> None:
        emb_key = embedder_model_custom or embedder_model
        if (
            self.loaded_model == model_path
            and self.pipeline is not None
            and emb_key == self.last_embedder
        ):
            return
        from ..utils.blender_gui import normalize_sr

        if model_path.endswith(".pth"):
            params, meta = load_rvc_pth(model_path)
            self.tgt_sr = int(normalize_sr(meta.get("sr")) or 48000)
            vocoder = meta.get("vocoder") or "HiFi-GAN"
            # full-training ckpts carry f0=None (key present): default to 1
            # only when absent/None — 0 is a legal "no pitch" value
            f0_meta = meta.get("f0")
            self.use_f0 = bool(1 if f0_meta is None else f0_meta)
            spk = int(meta.get("speakers_id") or 109)
        else:
            params, meta = load_checkpoint(model_path)
            params = params.get("model", params)
            # .npz meta may come from trainer saves ('sample_rate') or a
            # blended/converted .pth round trip ('sr', possibly '48k');
            # 'f0' may be absent or present-but-None — same policy as .pth
            sr_meta = normalize_sr(meta.get("sample_rate", meta.get("sr")))
            self.tgt_sr = int(sr_meta) if sr_meta else 48000
            vocoder = meta.get("vocoder") or "HiFi-GAN"
            f0_meta = meta.get("f0")
            self.use_f0 = bool(1 if f0_meta is None else f0_meta)
            emb = params.get("emb_g", {}).get("embedding")
            spk = int(emb.shape[0]) if emb is not None else 109
        # v1 checkpoints feed 256-dim (final_proj) features to enc_p; the
        # loaded weights are authoritative (version metadata is often absent)
        try:
            feat_dim = int(np.asarray(
                params["enc_p"]["emb_phone"]["kernel"]).shape[0])
        except Exception:
            feat_dim = 768
        # rebuild to the checkpoint's recorded architecture (reference:
        # Synthesizer(*cpt["config"]), infer.py:469-483) — the sr preset
        # only supplies whatever the config list/weights don't pin down
        arch, flow_layers = derive_synth_arch(params, meta)
        spk = arch.pop("spk_embed_dim", spk)
        cfg = get_config(self.tgt_sr, vocoder=vocoder, use_f0=self.use_f0,
                         spk_embed_dim=spk, text_enc_hidden_dim=feat_dim,
                         **arch)
        model = Synthesizer.from_config(cfg)
        if flow_layers is not None and flow_layers != model.flow_layers:
            import dataclasses as _dc

            model = _dc.replace(model, flow_layers=flow_layers)
        self.load_embedder_model(
            embedder_model, embedder_model_custom,
            final_proj_dim=feat_dim if feat_dim != 768 else None,
        )
        self.pipeline = Pipeline(
            self.tgt_sr, model, params, self.embedder, self.embedder_params,
            PipelineConfig.from_device(), upsample_factor=cfg.upsample_factor,
            precision=self.precision,
        )
        self.loaded_model = model_path

    @staticmethod
    def resolve_index_path(index_path: str) -> str:
        """Accept a model log directory as well as an index file: pick the
        single *index* artifact inside (the reference UI's index auto-match,
        tabs/inference get_indexes). Returns '' when nothing is found."""
        if not index_path or not os.path.isdir(index_path):
            return index_path
        hits = sorted(
            f for f in os.listdir(index_path)
            if "index" in f.lower() and not f.startswith(".")
            and os.path.isfile(os.path.join(index_path, f))
        )
        return os.path.join(index_path, hits[0]) if hits else ""

    def _load_index(self, index_path: str):
        """Load the retrieval index ONCE and keep it resident on the device:
        re-uploading hundreds of MB of vectors per conversion dominates
        latency on remote-attached accelerators."""
        cached = self._index_cache.get(index_path)
        if cached is None:
            import jax.numpy as jnp

            cached = jnp.asarray(
                FeatureIndex.load(index_path).vectors, jnp.float32
            )
            self._index_cache = {index_path: cached}
        return cached

    # -- conversion ----------------------------------------------------------

    def convert_audio(
        self,
        audio_input_path: str,
        audio_output_path: str,
        model_path: str,
        index_path: str = "",
        pitch: int = 0,
        f0_method: str = "yin",
        filter_radius: float = 3,
        hop_length: int = 160,
        index_rate: float = 0.0,
        volume_envelope: float = 1.0,
        protect: float = 0.5,
        split_audio: bool = False,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        clean_audio: bool = False,
        clean_strength: float = 0.7,
        export_format: str = "WAV",
        f0_file: Optional[str] = None,
        sid: int = 0,
        embedder_model: str = "contentvec",
        embedder_model_custom: Optional[str] = None,
        formant_shifting: bool = False,
        formant_qfrency: float = 1.0,
        formant_timbre: float = 1.0,
        post_process: bool = False,
        **post_fx,
    ) -> str:
        start = time.time()
        # decode the input FIRST: an unreadable/empty file must fail fast,
        # not after a minutes-long model load/compile
        audio16 = load_audio(audio_input_path, 16000)
        if audio16.size == 0:
            raise ValueError(f"empty audio file: {audio_input_path}")
        self.get_vc(model_path, embedder_model, embedder_model_custom)

        peak = np.abs(audio16).max() / 0.95
        if peak > 1.0:
            audio16 = audio16 / peak
        if formant_shifting:
            from .formant import formant_shift

            audio16 = formant_shift(audio16, 16000, formant_qfrency, formant_timbre)

        inp_f0 = None
        if f0_file and os.path.exists(f0_file):
            rows = [ln.split(",") for ln in open(f0_file).read().strip().split("\n")]
            inp_f0 = np.asarray([[float(v) for v in r] for r in rows], np.float32)

        index_vectors = None
        index_path = self.resolve_index_path(index_path)
        if index_path and os.path.exists(index_path) and index_rate > 0:
            index_vectors = self._load_index(index_path)

        kwargs: Dict[str, Any] = dict(
            sid=sid, pitch_shift=pitch, f0_method=f0_method,
            index_vectors=index_vectors, index_rate=index_rate,
            pitch_guidance=self.use_f0, volume_envelope=volume_envelope,
            protect=protect, f0_autotune=f0_autotune,
            f0_autotune_strength=f0_autotune_strength, inp_f0=inp_f0,
            predictors=self.get_predictors(f0_method) if self.use_f0 else None,
            filter_radius=filter_radius, hop_length=int(hop_length),
        )

        if split_audio:
            segments, intervals = process_audio(audio16, 16000)
            # independent slicer segments ride the fused stream when the
            # single-segment path applies (dispatch-ahead instead of one
            # synchronous round trip per segment); sample-identical to the
            # serial loop (pipeline_many docstring)
            converted = self.pipeline.pipeline_many(segments, **kwargs)
            audio_out = merge_audio(segments, converted, intervals, 16000, self.tgt_sr)
        else:
            audio_out = self.pipeline.pipeline(audio16, **kwargs)

        if clean_audio:
            from ..train.preprocess import spectral_gate

            audio_out = spectral_gate(audio_out, self.tgt_sr, clean_strength)
        if post_process:
            audio_out = apply_post_process(audio_out, self.tgt_sr, **post_fx)

        save_audio(audio_output_path, audio_out, self.tgt_sr)
        out_path = self._export(audio_output_path, export_format)
        print(f"converted {audio_input_path} in {time.time()-start:.2f}s -> {out_path}")
        return out_path

    def convert_audio_batch(
        self,
        audio_input_paths: str,
        audio_output_path: str,
        batch_pack: bool = True,
        device_batch: int = 8,
        **kwargs,
    ) -> None:
        """Folder batch mode (infer.py:350-414 loops serially; here short
        files PACK into device batches of `device_batch` through one jitted
        graph — long files fall back to the windowed serial path)."""
        exts = (".wav", ".mp3", ".flac", ".ogg", ".m4a")
        files = [
            os.path.join(audio_input_paths, f)
            for f in sorted(os.listdir(audio_input_paths))
            if f.lower().endswith(exts)
        ]
        os.makedirs(audio_output_path, exist_ok=True)

        def out_path(f):
            base = os.path.splitext(os.path.basename(f))[0]
            return os.path.join(audio_output_path, f"{base}_output.wav")

        todo = [f for f in files if not os.path.exists(out_path(f))]
        # Options the packed device-batch path cannot reproduce exactly fall
        # back to the serial path for ALL files so one run never converts
        # files under different settings depending on their length.
        serial_only = bool(kwargs.get("split_audio")) or bool(kwargs.get("f0_file"))
        if not batch_pack or serial_only:
            for f in todo:
                try:
                    self.convert_audio(f, out_path(f), **kwargs)
                except Exception as e:
                    # one corrupt/empty file must not abort the whole batch
                    print(f"skipping {f}: {e}")
            return

        model_path = kwargs.get("model_path")
        self.get_vc(model_path, kwargs.get("embedder_model", "contentvec"),
                    kwargs.get("embedder_model_custom"))
        pipe = self.pipeline
        short, long_files = [], []
        max_len = pipe.t_max
        formant_shifting = bool(kwargs.get("formant_shifting"))
        for f in todo:
            try:
                audio = load_audio(f, 16000)
                if audio.size == 0:
                    raise ValueError("empty audio file")
            except Exception as e:
                print(f"skipping {f}: {e}")
                continue
            peak = np.abs(audio).max() / 0.95
            if peak > 1.0:
                audio = audio / peak
            if formant_shifting:
                from .formant import formant_shift

                audio = formant_shift(
                    audio, 16000,
                    kwargs.get("formant_qfrency", 1.0),
                    kwargs.get("formant_timbre", 1.0),
                )
            (short if len(audio) + 2 * pipe.t_pad <= max_len else long_files).append(
                (f, audio)
            )

        import jax as _jax

        # multi-chip host: shard each device batch's rows over a dp mesh
        # (every file independent — N chips serve N files per program) and
        # size groups to keep every chip busy
        n_dev = len(_jax.devices())
        if n_dev > 1:
            pipe.enable_batch_sharding()
            device_batch = max(device_batch, n_dev)

        rng = _jax.random.PRNGKey(0)
        index_vectors = None
        index_path = self.resolve_index_path(kwargs.get("index_path", ""))
        index_rate = kwargs.get("index_rate", 0.0)
        if index_path and os.path.exists(index_path) and index_rate > 0:
            index_vectors = self._load_index(index_path)

        f0_method = kwargs.get("f0_method", "yin")
        filter_radius = kwargs.get("filter_radius", 3)
        hop_length = int(kwargs.get("hop_length", 160))
        pitch_shift = kwargs.get("pitch", 0)
        sid = kwargs.get("sid", 0)
        protect = kwargs.get("protect", 0.5)
        volume_envelope = kwargs.get("volume_envelope", 1.0)
        f0_autotune = bool(kwargs.get("f0_autotune", False))
        f0_autotune_strength = kwargs.get("f0_autotune_strength", 1.0)
        clean_audio = bool(kwargs.get("clean_audio", False))
        clean_strength = kwargs.get("clean_strength", 0.7)
        post_process = bool(kwargs.get("post_process", False))
        export_format = kwargs.get("export_format", "WAV")

        # group short files; one device batch per group
        for i in range(0, len(short), device_batch):
            group = short[i : i + device_batch]
            segs, pitches, pitchfs, sids, names = [], [], [], [], []
            for f, audio in group:
                audio_hp = pipe._highpass(audio)
                audio_pad = np.pad(
                    audio_hp, (pipe.t_pad, pipe.t_pad), mode="reflect"
                )
                p_len = audio_pad.shape[0] // 160
                if self.use_f0:
                    pc, pf = pipe.get_f0(
                        audio_pad, p_len, pitch_shift, f0_method,
                        self.get_predictors(f0_method),
                        f0_autotune=f0_autotune,
                        f0_autotune_strength=f0_autotune_strength,
                        filter_radius=filter_radius,
                        hop_length=hop_length,
                    )
                else:
                    pc = pf = None
                segs.append(audio_pad)
                pitches.append(pc)
                pitchfs.append(pf)
                sids.append(sid)
                # keep the HIGH-PASSED audio for change_rms: the single-file
                # path computes the RMS envelope post-highpass
                # (pipeline.py pipeline()), and batch mode must match it
                names.append((f, audio_hp))
            rng, sub = _jax.random.split(rng)
            outs = pipe.convert_segments_batch(
                segs, pitches, pitchfs, sids, index_vectors, index_rate,
                protect, sub,
            )
            for (f, audio), seg_out in zip(names, outs):
                trimmed = seg_out[pipe.t_pad_tgt : -pipe.t_pad_tgt]
                if volume_envelope != 1.0:
                    from .pipeline import change_rms

                    trimmed = change_rms(
                        audio, 16000, trimmed, self.tgt_sr, volume_envelope
                    )
                peak = (np.abs(trimmed).max() / 0.99) if trimmed.size else 0.0
                if peak > 1.0:
                    trimmed = trimmed / peak
                if clean_audio:
                    from ..train.preprocess import spectral_gate

                    trimmed = spectral_gate(trimmed, self.tgt_sr, clean_strength)
                if post_process:
                    trimmed = apply_post_process(trimmed, self.tgt_sr, **kwargs)
                save_audio(out_path(f), trimmed.astype(np.float32), self.tgt_sr)
                final = self._export(out_path(f), export_format)
                print(f"batch-converted {f} -> {final}")

        for f, _ in long_files:
            try:
                self.convert_audio(f, out_path(f), **kwargs)
            except Exception as e:
                print(f"skipping {f}: {e}")

    @staticmethod
    def _export(path: str, export_format: str) -> str:
        """WAV + FLAC native (native/flac_codec.cpp); other formats via
        ffmpeg when present (reference uses ffmpeg/pydub, infer.py:95-127)."""
        if export_format.upper() == "WAV":
            return path
        import shutil
        import subprocess

        if export_format.upper() == "FLAC":
            from ..utils.audio_io import read_audio
            from ..utils.native import flac_write

            out = os.path.splitext(path)[0] + ".flac"
            data, sr = read_audio(path)
            if flac_write(out, data, sr):
                return out
        if shutil.which("ffmpeg") is None:
            print(f"ffmpeg unavailable; keeping WAV for requested {export_format}")
            return path
        out = os.path.splitext(path)[0] + "." + export_format.lower()
        subprocess.run(
            ["ffmpeg", "-y", "-loglevel", "error", "-i", path, out], check=True
        )
        return out
