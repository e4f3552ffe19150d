"""The voice-conversion inference pipeline.

Parity target: rvc/infer/pipeline.py (Pipeline): 48 Hz high-pass, long-audio
windowing at quietest points (t_center/t_query/t_max), F0 estimation with
autotune + external-f0 splice + coarse 255-bin mel quantization, per-segment
conversion (HuBERT feats -> retrieval blend -> x2 upsample -> protect blend ->
net_g.infer), RMS envelope mixing, peak normalization.

TPU-first design:
  - the per-segment conversion is ONE jitted graph (HuBERT + retrieval +
    synthesizer; no faiss CPU round-trip, no per-segment host transfers);
  - segments are padded to a small set of canonical lengths (bucket shapes)
    so XLA compiles a handful of programs, then real lengths are masked
    through the model and sliced off on the host;
  - host code does only cheap DSP (butterworth filtfilt, cut-point search,
    RMS envelopes) with scipy/numpy.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Dict, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from scipy import signal as sps

from ..ops.retrieval import retrieve_blend

# 54 chromatic reference frequencies G1..C6 (reference pipeline.py:160-204).
AUTOTUNE_REF_FREQS = np.array([
    49.00, 51.91, 55.00, 58.27, 61.74, 65.41, 69.30, 73.42, 77.78, 82.41,
    87.31, 92.50, 98.00, 103.83, 110.00, 116.54, 123.47, 130.81, 138.59,
    146.83, 155.56, 164.81, 174.61, 185.00, 196.00, 207.65, 220.00, 233.08,
    246.94, 261.63, 277.18, 293.66, 311.13, 329.63, 349.23, 369.99, 392.00,
    415.30, 440.00, 466.16, 493.88, 523.25, 554.37, 587.33, 622.25, 659.25,
    698.46, 739.99, 783.99, 830.61, 880.00, 932.33, 987.77, 1046.50,
], dtype=np.float32)

F0_MIN, F0_MAX = 50.0, 1100.0
SAMPLE_RATE = 16000
WINDOW = 160


def autotune_f0(f0: np.ndarray, strength: float = 1.0) -> np.ndarray:
    """Snap each f0 value toward the nearest chromatic reference
    (pipeline.py:88-114), vectorized."""
    idx = np.abs(f0[:, None] - AUTOTUNE_REF_FREQS[None, :]).argmin(axis=1)
    closest = AUTOTUNE_REF_FREQS[idx]
    return f0 + (closest - f0) * strength


def coarse_f0(f0: np.ndarray) -> np.ndarray:
    """Quantize f0 to 255 mel-scale bins + 1 (pipeline.py:402-408)."""
    f0_mel_min = 1127.0 * np.log(1.0 + F0_MIN / 700.0)
    f0_mel_max = 1127.0 * np.log(1.0 + F0_MAX / 700.0)
    f0_mel = 1127.0 * np.log(1.0 + f0 / 700.0)
    scaled = (f0_mel - f0_mel_min) * 254.0 / (f0_mel_max - f0_mel_min) + 1.0
    f0_mel = np.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = np.clip(f0_mel, 1.0, 255.0)
    return np.rint(f0_mel).astype(np.int32)


def _frame_rms(x: np.ndarray, frame_length: int, hop_length: int) -> np.ndarray:
    """librosa.feature.rms equivalent (centered, zero-padded)."""
    pad = frame_length // 2
    y = np.pad(x.astype(np.float32), (pad, pad))
    n = 1 + (len(y) - frame_length) // hop_length
    idx = np.arange(frame_length)[None, :] + hop_length * np.arange(n)[:, None]
    return np.sqrt(np.mean(y[idx] ** 2, axis=1))


def _linear_resize_np(x: np.ndarray, size: int) -> np.ndarray:
    """torch F.interpolate(mode="linear", align_corners=False) on 1D."""
    n = len(x)
    if n == size:
        return x.astype(np.float32)
    pos = (np.arange(size, dtype=np.float64) + 0.5) * n / size - 0.5
    pos = np.clip(pos, 0, n - 1)
    lo = np.floor(pos).astype(int)
    hi = np.minimum(lo + 1, n - 1)
    frac = pos - lo
    return (x[lo] * (1 - frac) + x[hi] * frac).astype(np.float32)


def change_rms(
    source: np.ndarray, source_rate: int,
    target: np.ndarray, target_rate: int, rate: float,
) -> np.ndarray:
    """Blend target's RMS envelope toward the source's
    (AudioProcessor.change_rms, pipeline.py:38-85)."""
    rms1 = _frame_rms(source, source_rate // 2 * 2, source_rate // 2)
    rms2 = _frame_rms(target, target_rate // 2 * 2, target_rate // 2)
    rms1 = _linear_resize_np(rms1, len(target))
    rms2 = np.maximum(_linear_resize_np(rms2, len(target)), 1e-6)
    return (target * (rms1 ** (1 - rate)) * (rms2 ** (rate - 1))).astype(np.float32)


@dataclasses.dataclass(frozen=True)
class PipelineConfig:
    """Windowing parameters by the reference's VRAM tiers
    (rvc/configs/config.py:107-123); defaults = the >=6GB tier."""

    x_pad: int = 3
    x_query: int = 10
    x_center: int = 60
    x_max: int = 65

    @classmethod
    def from_device(cls) -> "PipelineConfig":
        """Pick the tier from accelerator memory (the reference probes CUDA
        VRAM; here HBM via device.memory_stats). <=5 GB gets the reference's
        low-memory windows (1/6/38/41)."""
        gb = 16.0
        try:
            d = jax.devices()[0]
            stats = d.memory_stats() or {}
            limit = stats.get("bytes_limit") or stats.get("bytes_reservable_limit")
            if limit:
                gb = limit / (1 << 30)
        except Exception:
            pass
        if gb <= 5:
            return cls(x_pad=1, x_query=6, x_center=38, x_max=41)
        return cls()


class Pipeline:
    """Host orchestrator around one jitted conversion graph."""

    def __init__(
        self,
        tgt_sr: int,
        synthesizer,
        synth_params: Dict[str, Any],
        embedder,
        embedder_params: Dict[str, Any],
        cfg: PipelineConfig = PipelineConfig(),
        upsample_factor: Optional[int] = None,
        precision: str = "fp32",
    ):
        """precision: "bf16" runs the conversion graph with bf16 weights and
        activations (the reference defaults to fp16 inference on GPU,
        rvc/configs/config.py) and returns int16 audio from the device —
        output quantization 3e-5, below the PCM16 export precision; "fp32"
        keeps everything float (used by parity/golden tests)."""
        self.tgt_sr = tgt_sr
        self.cfg = cfg
        self.precision = precision
        if precision == "bf16":
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                t,
            )
            synth_params = cast(synth_params)
            embedder_params = cast(embedder_params)
        self.t_pad = SAMPLE_RATE * cfg.x_pad
        self.t_pad_tgt = tgt_sr * cfg.x_pad
        self.t_pad2 = self.t_pad * 2
        self.t_query = SAMPLE_RATE * cfg.x_query
        self.t_center = SAMPLE_RATE * cfg.x_center
        self.t_max = SAMPLE_RATE * cfg.x_max
        self.synthesizer = synthesizer
        self.synth_params = synth_params
        self.embedder = embedder
        self.embedder_params = embedder_params
        # frames per second of latent = 100 (window=160 @ 16k)
        self.upp = upsample_factor or (tgt_sr // 100)

        def _convert_core(
            synth_params,
            emb_params,
            audio16k,      # [B, T16] padded
            pitch,         # [B, P] int32 (padded)
            pitchf,        # [B, P] f32
            p_len,         # [B] actual latent frames
            sid,           # [B]
            index_vectors, # [N, 768] or None
            index_rate,    # []
            protect,       # []
            rng,
            use_pitch: bool = True,
        ):
            if self.precision == "bf16":
                audio16k = audio16k.astype(jnp.bfloat16)
            feats = self.embedder.apply({"params": emb_params}, audio16k)
            feats = feats.astype(jnp.float32)  # retrieval distances in f32
            # feats0 is the PRE-retrieval copy: the protect blend restores it
            # on unvoiced frames (reference clones before index search,
            # pipeline.py:455-481).
            feats0 = feats
            if index_vectors is not None:
                b, tt, dd = feats.shape
                blended = retrieve_blend(
                    feats.reshape(b * tt, dd), index_vectors, index_rate
                )
                feats = blended.reshape(b, tt, dd)
            # x2 nearest upsample 50Hz -> 100Hz (pipeline.py:463-465 F.interpolate)
            feats = jnp.repeat(feats, 2, axis=1)
            feats0 = jnp.repeat(feats0, 2, axis=1)
            t = min(feats.shape[1], pitch.shape[1]) if use_pitch else feats.shape[1]
            feats = feats[:, :t]
            feats0 = feats0[:, :t]
            if use_pitch:
                pitch = pitch[:, :t]
                pitchf = pitchf[:, :t]
                # protect blend, applied only when protect < 0.5 like the
                # reference's `if protect < 0.5` gate (pipeline.py:469-481);
                # protect is traced, so the gate is a select on the blended
                # result rather than python control flow.
                pitchff = jnp.where(pitchf > 0, 1.0, protect)
                blended = (
                    feats * pitchff[..., None] + feats0 * (1.0 - pitchff[..., None])
                )
                feats = jnp.where(protect < 0.5, blended, feats)
            lengths = jnp.minimum(p_len, t)
            audio, _ = self.synthesizer.apply(
                {"params": synth_params},
                feats,
                lengths,
                pitch if use_pitch else None,
                pitchf if use_pitch else None,
                sid,
                method=type(self.synthesizer).infer,
                rngs={"noise": rng},
            )
            audio = audio[..., 0]  # [B, T_out]
            if self.precision == "bf16":
                # tanh-bounded output: int16 halves the device->host transfer
                # with quantization well under the PCM16 export floor
                return jnp.clip(
                    audio.astype(jnp.float32) * 32767.0, -32768, 32767
                ).astype(jnp.int16)
            return audio

        self._convert = partial(jax.jit, static_argnames=("use_pitch",))(
            _convert_core
        )
        self._convert_core = _convert_core
        # fused f0+conversion graph, built lazily when a device f0 predictor
        # is attached (set_rmvpe)
        self._rmvpe = None
        self._convert_fused = None
        # optional dp mesh for the batched paths (enable_batch_sharding)
        self._mesh = None
        self._repl_cache: Dict[str, Any] = {}

    # -- fused f0 + conversion (one device round trip) -----------------------

    def set_rmvpe(self, rmvpe) -> None:
        """Attach an RMVPE predictor so f0 estimation + quantization +
        conversion run as ONE jitted program. On remote-attached
        accelerators each synchronous device call costs a full network
        round trip (~tens of ms); the unfused path pays it twice per
        segment, the fused path once."""
        from ..predictors.rmvpe import decode_salience, rmvpe_mel

        self._rmvpe = rmvpe
        # bf16 serving: the DeepUnet's 3x3 conv stack is the single largest
        # non-Pallas slice of the fused conversion (9.2 ms/conv f32, traced);
        # bf16 halves its HBM traffic. The reference runs RMVPE at fp16 on
        # GPU (RMVPE.py is_half), so reduced-precision salience is parity
        # behavior; decode stays f32 (hidden is upcast before
        # decode_salience below).
        if self.precision == "bf16":
            cast = lambda t: jax.tree.map(
                lambda a: a.astype(jnp.bfloat16)
                if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating)
                else a,
                t,
            )
            self._rmvpe_params = cast(rmvpe.params)
            self._rmvpe_stats = cast(rmvpe.batch_stats)
        else:
            self._rmvpe_params = rmvpe.params
            self._rmvpe_stats = rmvpe.batch_stats

        @partial(jax.jit, static_argnames=(
            "use_autotune", "filter_radius", "f0_frames"))
        def _convert_fused(
            synth_params, emb_params, rmvpe_params, rmvpe_stats,
            audio16k,           # [B, T16] padded
            p_len,              # [B]
            sid,                # [B]
            index_vectors, index_rate, protect,
            pitch_shift,        # [] semitones (traced)
            autotune_strength,  # []
            rng,
            use_autotune: bool = False,
            filter_radius: int = 3,
            f0_frames: int = 0,
        ):
            # int16 uploads (bf16 serving path): dequantize on device. The
            # 3e-5 quantization step is the PCM16 floor the audio came from.
            if jnp.issubdtype(audio16k.dtype, jnp.integer):
                audio16k = audio16k.astype(jnp.float32) / 32767.0
            # RMVPE salience -> f0 (predictors/rmvpe.py numerics)
            mel = rmvpe_mel(audio16k)[:, :f0_frames]
            pad = (-f0_frames) % 32
            mel = jnp.pad(mel, ((0, 0), (0, pad), (0, 0)), mode="reflect")
            if self.precision == "bf16":
                mel = mel.astype(jnp.bfloat16)
            hidden = rmvpe.model.apply(
                {"params": rmvpe_params, "batch_stats": rmvpe_stats}, mel
            ).astype(jnp.float32)
            f0 = jax.vmap(decode_salience)(hidden[:, :f0_frames])

            # median filter (scipy.medfilt semantics: zero-padded edges)
            if filter_radius >= 3:
                r = filter_radius if filter_radius % 2 == 1 else filter_radius + 1
                padded = jnp.pad(f0, ((0, 0), (r // 2, r // 2)))
                windows = jnp.stack(
                    [padded[:, i : i + f0.shape[1]] for i in range(r)], axis=-1
                )
                f0 = jnp.sort(windows, axis=-1)[..., r // 2]

            if use_autotune:
                freqs = jnp.asarray(AUTOTUNE_REF_FREQS)
                idx = jnp.argmin(jnp.abs(f0[..., None] - freqs[None, None]),
                                 axis=-1)
                f0 = f0 + (freqs[idx] - f0) * autotune_strength

            f0 = f0 * (2.0 ** (pitch_shift / 12.0))

            # coarse 255-bin quantization (coarse_f0, jnp form)
            f0_mel_min = 1127.0 * jnp.log(1.0 + F0_MIN / 700.0)
            f0_mel_max = 1127.0 * jnp.log(1.0 + F0_MAX / 700.0)
            f0_mel = 1127.0 * jnp.log(1.0 + f0 / 700.0)
            scaled = (f0_mel - f0_mel_min) * 254.0 / (f0_mel_max - f0_mel_min) + 1.0
            f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
            coarse = jnp.rint(jnp.clip(f0_mel, 1.0, 255.0)).astype(jnp.int32)

            frames = audio16k.shape[1] // WINDOW
            pitch = coarse[:, :frames]
            pitchf = f0[:, :frames].astype(jnp.float32)
            return self._convert_core(
                synth_params, emb_params, audio16k, pitch, pitchf,
                p_len, sid, index_vectors, index_rate, protect, rng,
                use_pitch=True,
            )

        self._convert_fused = _convert_fused

    def _quantize_in(self, arr):
        """int16 upload for the bf16 serving path: halves host->device bytes;
        the 3e-5 step matches the PCM16 source floor (fp32 paths unchanged
        for parity/golden exactness)."""
        import numpy as _np

        if self.precision == "bf16":
            return _np.clip(arr * 32767.0, -32768, 32767).astype(_np.int16)
        return arr

    # -- multi-chip batch serving ---------------------------------------------

    def enable_batch_sharding(self, mesh=None) -> None:
        """Shard the batch axis of the batched conversion paths
        (convert_segments_batch / voice_conversion_fused_many) over a device
        mesh — pure data parallelism: every file's conversion is independent,
        so N chips serve N files per program with no collectives on the hot
        path (weights replicate once; the reference's batch mode loops files
        serially on one GPU, infer.py:350-414). No-op with fewer than 2
        devices. Default mesh: one 'dp' axis over jax.devices()."""
        if mesh is None:
            devs = jax.devices()
            if len(devs) < 2:
                return
            from jax.sharding import Mesh

            mesh = Mesh(np.asarray(devs), ("dp",))
        self._mesh = mesh
        self._repl_cache = {}

    def _replicated(self, name: str, tree):
        """Weights/index replicated over the mesh, uploaded once per mesh.
        Cached by name + leading-leaf identity so a swapped index or model
        re-replicates rather than serving stale data."""
        leaves = jax.tree.leaves(tree)
        key_id = id(leaves[0]) if leaves else None
        hit = self._repl_cache.get(name)
        if hit is None or hit[0] != key_id:
            from jax.sharding import NamedSharding, PartitionSpec

            hit = (key_id, jax.device_put(
                tree, NamedSharding(self._mesh, PartitionSpec())))
            self._repl_cache[name] = hit
        return hit[1]

    def _shard_rows(self, arr):
        """Host array -> device array split on axis 0 over the 'dp' mesh."""
        from jax.sharding import NamedSharding, PartitionSpec

        spec = PartitionSpec("dp", *([None] * (arr.ndim - 1)))
        return jax.device_put(arr, NamedSharding(self._mesh, spec))

    def _batch_rows(self, n: int) -> int:
        """Pad a batch size up to a mesh multiple (rows replicate input 0
        and are sliced away after) so axis 0 divides evenly."""
        if self._mesh is None:
            return n
        nd = self._mesh.size
        return -(-n // nd) * nd

    def voice_conversion_fused(
        self,
        audio_seg: np.ndarray,
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
        pitch_shift: int = 0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        filter_radius: int = 3,
    ) -> np.ndarray:
        """One-round-trip conversion: f0 (RMVPE) + quantize + convert in a
        single jitted call. Semantically equal to get_f0 + voice_conversion
        for the rmvpe method without an external f0 file."""
        t_real = audio_seg.shape[0]
        t_pad = self._bucket_len(t_real)
        p_len = self._p_len(t_real, t_pad)
        audio_in = np.zeros(t_pad, np.float32)
        audio_in[:t_real] = audio_seg
        audio_out = self._convert_fused(
            self.synth_params,
            self.embedder_params,
            self._rmvpe_params,
            self._rmvpe_stats,
            jnp.asarray(self._quantize_in(audio_in)[None]),
            jnp.asarray([p_len], jnp.int32),
            jnp.asarray([sid], jnp.int32),
            index_vectors,
            jnp.asarray(index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32),
            jnp.asarray(pitch_shift, jnp.float32),
            jnp.asarray(f0_autotune_strength, jnp.float32),
            rng,
            use_autotune=bool(f0_autotune),
            filter_radius=int(filter_radius),
            f0_frames=t_pad // WINDOW + 1,
        )
        out = self._to_host(audio_out)[0]
        return out[: p_len * self.upp]

    def voice_conversion_fused_many(
        self,
        audio_segs: List[np.ndarray],
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
        pitch_shift: int = 0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        filter_radius: int = 3,
    ) -> List[np.ndarray]:
        """Serving-throughput path: convert B whole files in ONE fused
        device program (one upload, one compute, one download). The fused
        graph is batch-first throughout, so multi-file packing costs no
        extra code on the device side; padding to the common bucket is the
        only waste. This is how a TPU server should run bulk conversion —
        per-call host<->device latency is amortized B ways and the MXU sees
        B-fold larger matmuls. With enable_batch_sharding, the batch axis
        splits over the dp mesh: N chips convert N rows each program."""
        b = len(audio_segs)
        audio_out, p_lens = self._dispatch_fused_batch(
            audio_segs, sid, index_vectors, index_rate, protect, rng,
            pitch_shift, f0_autotune, f0_autotune_strength, filter_radius,
        )
        out = self._to_host(audio_out)
        return [out[i, : int(p_lens[i]) * self.upp] for i in range(b)]

    def _dispatch_fused_batch(
        self, audio_segs, sid, index_vectors, index_rate, protect, rng,
        pitch_shift, f0_autotune, f0_autotune_strength, filter_radius,
    ):
        """Pack B segments into one [B_pad, T_pad] row batch and dispatch the
        fused conversion program (asynchronously — no fetch). Returns the
        device result and the host-side p_lens row vector."""
        b = len(audio_segs)
        b_pad = self._batch_rows(b)
        t_reals = [s.shape[0] for s in audio_segs]
        t_pad = self._bucket_len(max(t_reals))
        batch = np.zeros((b_pad, t_pad), np.float32)
        for i in range(b_pad):
            s = audio_segs[i if i < b else 0]
            batch[i, : s.shape[0]] = s
        p_lens = np.asarray(
            [self._p_len(t_reals[i if i < b else 0], t_pad)
             for i in range(b_pad)], np.int32)
        sids = np.full((b_pad,), sid, np.int32)
        if self._mesh is not None:
            args = (
                self._replicated("synth", self.synth_params),
                self._replicated("emb", self.embedder_params),
                self._replicated("rmvpe_p", self._rmvpe_params),
                self._replicated("rmvpe_s", self._rmvpe_stats),
                self._shard_rows(self._quantize_in(batch)),
                self._shard_rows(p_lens),
                self._shard_rows(sids),
                None if index_vectors is None
                else self._replicated("index", index_vectors),
            )
        else:
            args = (
                self.synth_params, self.embedder_params,
                self._rmvpe_params, self._rmvpe_stats,
                jnp.asarray(self._quantize_in(batch)),
                jnp.asarray(p_lens), jnp.asarray(sids), index_vectors,
            )
        audio_out = self._convert_fused(
            *args,
            jnp.asarray(index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32),
            jnp.asarray(pitch_shift, jnp.float32),
            jnp.asarray(f0_autotune_strength, jnp.float32),
            rng,
            use_autotune=bool(f0_autotune),
            filter_radius=int(filter_radius),
            f0_frames=t_pad // WINDOW + 1,
        )
        return audio_out, p_lens

    def voice_conversion_fused_batch_stream(
        self,
        audio_segs: List[np.ndarray],
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
        pitch_shift: int = 0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        filter_radius: int = 3,
        batch: int = 4,
        depth: int = 2,
        prep=None,
    ) -> List[np.ndarray]:
        """Multi-chip serving: group files into batches of `batch` rows, run
        each group as ONE fused program, and keep `depth` group programs in
        flight (dispatch-ahead, async D2H — the stream mechanics of
        voice_conversion_fused_stream on top of the row packing of
        voice_conversion_fused_many). With enable_batch_sharding the rows of
        every launch split over the dp mesh: N chips convert N files per
        program, so a mesh serves batch x stream throughput.

        On ONE chip prefer voice_conversion_fused_stream: the 48k decoder's
        long-T stages already saturate the chip at B=1, so row batching
        does not beat the overlapped single-file stream there (measured on
        v5e: 141/294/449 ms per fused call at B=1/2/4 — a ~20% per-call
        win at B=4, but the single-file stream's overlap already exceeds
        it; docs/PERFORMANCE.md "Batched serving"). A full group's outputs
        are bit-identical to voice_conversion_fused_many(group_g,
        rng=split(rng, G)[g]); a partial LAST group is padded to `batch`
        rows first (row-0 replicas, sliced away on return), so its outputs
        match fused_many applied to the padded group — batch-shaped noise
        sampling means they can differ at the last ulp from an unpadded
        b_real-row call.

        Under a mesh pick `batch` as a multiple of the mesh size —
        _batch_rows pads every launch up to one anyway. The result fetch
        runs on a drain thread (same rationale as
        voice_conversion_fused_stream: a blocking fetch in the dispatch
        loop serializes the link round trip with uploads)."""
        from concurrent.futures import ThreadPoolExecutor

        groups = [audio_segs[i : i + batch]
                  for i in range(0, len(audio_segs), batch)]
        subs = list(jax.random.split(rng, max(len(groups), 1)))

        def _fetch(audio_out, p_lens, b_real):
            out = self._to_host(audio_out)
            return [out[i, : int(p_lens[i]) * self.upp] for i in range(b_real)]

        futures = []
        max_inflight = max(int(depth), 2) + 2
        async_d2h = True
        with ThreadPoolExecutor(max_workers=1) as pool:
            for g, group in enumerate(groups):
                if prep is not None:
                    group = [prep(s) for s in group]
                b_real = len(group)
                if b_real < batch:  # pad to the compiled row count
                    group = group + [group[0]] * (batch - b_real)
                audio_out, p_lens = self._dispatch_fused_batch(
                    group, sid, index_vectors, index_rate, protect, subs[g],
                    pitch_shift, f0_autotune, f0_autotune_strength,
                    filter_radius,
                )
                if async_d2h:
                    try:
                        audio_out.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        async_d2h = False  # drain thread still overlaps
                futures.append(pool.submit(_fetch, audio_out, p_lens, b_real))
                if g >= max_inflight:
                    futures[g - max_inflight].result()
            return [o for f in futures for o in f.result()]

    def voice_conversion_fused_stream(
        self,
        audio_segs: List[np.ndarray],
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
        pitch_shift: int = 0,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        filter_radius: int = 3,
        depth: int = 2,
        prep=None,
        rngs: Optional[List[jax.Array]] = None,
        sync_drain: bool = False,
    ) -> List[np.ndarray]:
        """Sustained-stream conversion: keep up to `depth` fused programs in
        flight and fetch results in order. JAX dispatch is asynchronous, so
        the host uploads request i+1 and downloads result i-1 while the
        device computes request i — per-item wall time approaches
        max(compute, transfer) instead of their sum. This is the shape of a
        low-latency streaming server; results are bit-identical to
        voice_conversion_fused per segment when the caller derives segment
        rngs the same way (segment i uses jax.random.split(rng,
        len(audio_segs))[i], or pass explicit per-segment `rngs`).

        prep: optional host-DSP callable applied to each raw segment inside
        the dispatch loop, so preprocessing of item i+1 overlaps device
        compute of item i (pass e.g. high-pass + reflect padding).

        The result fetch runs on a drain THREAD: over a remote-attached
        device the blocking np.asarray pays a full round trip plus the
        output transfer (~48 ms for a 10 s int16 result on a 33 MB/s
        tunnel), and paying that serially in the dispatch loop caps the
        stream at fetch+upload time regardless of device speed (r4's 148x
        plateau — the link had degraded 20x vs the round-2 measurement,
        docs/PERFORMANCE.md 'Tunnel stall windows'). With the fetch in a
        worker thread, the host upload of item i+1 and the result download
        of item i-1 ride the full-duplex link concurrently while the device
        computes item i; per-item wall time approaches
        max(compute, bytes/bandwidth). sync_drain=True restores the r3/r4
        in-loop blocking fetch — kept for the on-chip A/B
        (scripts/probe_stream_drain.py) so drain-mode regressions are
        measurable in one session rather than across tunnel weather."""
        from concurrent.futures import ThreadPoolExecutor

        # Hoist loop-invariant device constants: on a remote-attached
        # accelerator every jnp.asarray is its own host->device message, so
        # re-uploading the six unchanged scalars per item adds tunnel chatter
        # to the steady state. One upload before the loop; one batched rng
        # split instead of a per-item split dispatch.
        sid_d = jnp.asarray([sid], jnp.int32)
        index_rate_d = jnp.asarray(index_rate, jnp.float32)
        protect_d = jnp.asarray(protect, jnp.float32)
        pitch_shift_d = jnp.asarray(pitch_shift, jnp.float32)
        strength_d = jnp.asarray(f0_autotune_strength, jnp.float32)
        subs = rngs if rngs is not None else list(
            jax.random.split(rng, len(audio_segs)))

        futures = []
        pending: List[Tuple[jax.Array, int]] = []
        outs: List[np.ndarray] = []
        # depth bounds the number of UNFETCHED results in flight (device
        # buffers + queued transfers); fetch keeps pace with compute, so the
        # cap only binds when the link stalls.
        max_inflight = max(int(depth), 2) + 2
        async_d2h = True  # feature-detected on the first item
        pool = None if sync_drain else ThreadPoolExecutor(max_workers=1)
        try:
            for i, seg in enumerate(audio_segs):
                if prep is not None:
                    seg = prep(seg)
                t_real = seg.shape[0]
                t_pad = self._bucket_len(t_real)
                p_len = self._p_len(t_real, t_pad)
                audio_in = np.zeros(t_pad, np.float32)
                audio_in[:t_real] = seg
                audio_out = self._convert_fused(
                    self.synth_params,
                    self.embedder_params,
                    self._rmvpe_params,
                    self._rmvpe_stats,
                    jnp.asarray(self._quantize_in(audio_in)[None]),
                    jnp.asarray([p_len], jnp.int32),
                    sid_d,
                    index_vectors,
                    index_rate_d,
                    protect_d,
                    pitch_shift_d,
                    strength_d,
                    subs[i],
                    use_autotune=bool(f0_autotune),
                    filter_radius=int(filter_radius),
                    f0_frames=t_pad // WINDOW + 1,
                )
                # Enqueue the device->host copy at dispatch time: the
                # transfer starts the moment the program finishes on-device.
                if async_d2h:
                    try:
                        audio_out.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        async_d2h = False  # drain thread still overlaps
                if sync_drain:  # r3/r4 behavior: blocking fetch in-loop
                    pending.append((audio_out, p_len))
                    if len(pending) > depth:
                        a, pl = pending.pop(0)
                        outs.append(self._to_host(a)[0][: pl * self.upp])
                else:
                    futures.append(pool.submit(
                        lambda a, pl: self._to_host(a)[0][: pl * self.upp],
                        audio_out, p_len))
                    if i >= max_inflight:
                        futures[i - max_inflight].result()
            if sync_drain:
                while pending:
                    a, pl = pending.pop(0)
                    outs.append(self._to_host(a)[0][: pl * self.upp])
                return outs
            return [f.result() for f in futures]
        finally:
            if pool is not None:
                pool.shutdown(wait=True)

    # -- host-side helpers ---------------------------------------------------

    @staticmethod
    def _to_host(audio_out) -> np.ndarray:
        out = np.asarray(audio_out)
        if out.dtype == np.int16:
            out = out.astype(np.float32) / 32767.0
        return out

    def _highpass(self, audio: np.ndarray) -> np.ndarray:
        bh, ah = sps.butter(5, 48, btype="high", fs=SAMPLE_RATE)
        return sps.filtfilt(bh, ah, audio).astype(np.float32)

    def _find_cut_points(self, audio: np.ndarray) -> List[int]:
        """Quietest-sample search every t_center within +-t_query windows
        (pipeline.py:565-577)."""
        if audio.shape[0] <= self.t_max:
            return []
        audio_pad = np.pad(audio, (WINDOW // 2, WINDOW // 2), mode="reflect")
        audio_sum = np.zeros_like(audio)
        for i in range(WINDOW):
            audio_sum += audio_pad[i : i - WINDOW]
        opt_ts = []
        for t in range(self.t_center, audio.shape[0], self.t_center):
            win = np.abs(audio_sum[t - self.t_query : t + self.t_query])
            opt_ts.append(t - self.t_query + int(np.argmin(win)))
        return opt_ts

    def _bucket_len(self, t: int) -> int:
        """Pad a 16k segment length up to a canonical multiple of 1 s so jit
        compiles at most ~70 shapes over the full operating range (persistent
        cache makes each a one-time cost). Finer buckets waste at most ~1 s
        of synthesis per conversion (the old 2 s steps wasted up to 12% of
        device compute on typical lengths)."""
        step = SAMPLE_RATE
        # ceiling, NOT floor(t/step)+1: exact multiples (whole-second TTS
        # output, trimmed clips) must not pay a full extra second of
        # embedder+synthesizer compute
        return ((t + step - 1) // step) * step

    def _p_len(self, t_real: int, t_pad: int) -> int:
        """Latent frames available for a real length inside its bucket:
        min(t_real // WINDOW, 2 * hubert_frames(t_pad)). The reference
        truncates identically when the interpolated feats come up short
        (rvc/infer/pipeline.py:467, p_len = min(len // window, feats));
        without the min, lengths with t_real % 16000 in [15840, 16000)
        claim one more frame than the embedder emits from the bucket
        (2*((L-400)//320+1) = 100k-2 < 100k-1) and the output tail would
        carry 10 ms of masked zeros."""
        emb_frames = 2 * ((t_pad - 400) // 320 + 1)
        return min(t_real // WINDOW, emb_frames)

    def get_f0(
        self,
        audio_pad: np.ndarray,
        p_len: int,
        pitch_shift: int,
        f0_method: str = "yin",
        predictors: Optional[Dict[str, Any]] = None,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        inp_f0: Optional[np.ndarray] = None,
        filter_radius: float = 3,
        hop_length: int = 160,
    ) -> Tuple[np.ndarray, np.ndarray]:
        """F0 dispatch + autotune + shift + external splice + quantization
        (pipeline.py:322-410). predictors maps method name -> callable.

        filter_radius semantics: fractional values (<1) are the FCPE decoder
        confidence threshold (the reference couples them, pipeline.py:370);
        odd integers >=3 median-filter the contour, per the documented CLI
        contract (core.py:669). The reference forwards the integer default
        straight into the FCPE threshold, which zeroes every frame
        (torchfcpe latent max <= 1) — a bug we do not reproduce."""
        predictors = predictors or {}
        from ..predictors.f0_extractor import parse_f0_methods

        methods = parse_f0_methods(f0_method)
        stack = []
        for m in methods:
            if m in predictors:
                if m == "fcpe":
                    try:
                        f0 = np.asarray(predictors[m](
                            audio_pad, p_len=p_len, filter_radius=filter_radius
                        ))
                    except TypeError:
                        f0 = np.asarray(predictors[m](audio_pad))
                elif m.startswith("crepe"):
                    # crepe honors the CLI hop_length; the contour is then
                    # interpolated back to the 10 ms grid like the
                    # reference (pipeline.py:242-259)
                    try:
                        f0 = np.asarray(predictors[m](
                            audio_pad, hop_length=int(hop_length)))
                    except TypeError:
                        f0 = np.asarray(predictors[m](audio_pad))
                    if int(hop_length) != WINDOW:
                        from ..predictors.f0_extractor import interp_f0_to_grid

                        f0 = interp_f0_to_grid(f0, p_len)
                else:
                    f0 = np.asarray(predictors[m](audio_pad))
            elif m == "yin":
                from ..predictors.dsp_f0 import yin_f0_np

                f0 = yin_f0_np(audio_pad)
            else:
                raise ValueError(f"f0 method {m!r} unavailable (no predictor loaded)")
            stack.append(f0[:p_len] if len(f0) >= p_len else np.pad(f0, (0, p_len - len(f0))))
        f0 = stack[0] if len(stack) == 1 else np.nanmedian(np.stack(stack), axis=0)

        radius = int(filter_radius) if filter_radius is not None else 0
        if radius >= 3:
            f0 = sps.medfilt(f0, radius if radius % 2 == 1 else radius + 1)

        if f0_autotune:
            f0 = autotune_f0(f0, f0_autotune_strength)
        f0 = f0 * (2.0 ** (pitch_shift / 12.0))

        if inp_f0 is not None:
            # splice an external f0 contour over the pad offset
            # (pipeline.py:584-607: rows [time_sec, f0_hz] at 10ms)
            tf0 = SAMPLE_RATE // WINDOW
            delta_t = int(np.round((inp_f0[:, 0].max() - inp_f0[:, 0].min()) * tf0 + 1))
            replace = np.interp(
                np.arange(delta_t), inp_f0[:, 0] * 100, inp_f0[:, 1]
            )
            off = self.cfg.x_pad * tf0
            n = min(len(replace), len(f0) - off)
            f0[off : off + n] = replace[:n]

        return coarse_f0(f0), f0.astype(np.float32)

    def voice_conversion(
        self,
        audio_seg: np.ndarray,
        pitch: Optional[np.ndarray],
        pitchf: Optional[np.ndarray],
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
    ) -> np.ndarray:
        """Convert one 16k segment -> tgt_sr audio (pipeline.py:412-494)."""
        t_real = audio_seg.shape[0]
        t_pad = self._bucket_len(t_real)
        p_len = self._p_len(t_real, t_pad)
        audio_in = np.zeros(t_pad, np.float32)
        audio_in[:t_real] = audio_seg

        use_pitch = pitch is not None
        frames_pad = t_pad // WINDOW
        if use_pitch:
            pit = np.ones(frames_pad, np.int32)
            pif = np.zeros(frames_pad, np.float32)
            n = min(p_len, len(pitch))
            pit[:n] = pitch[:n]
            pif[:n] = pitchf[:n]
            pitch_in = jnp.asarray(pit[None])
            pitchf_in = jnp.asarray(pif[None])
        else:
            pitch_in = jnp.zeros((1, frames_pad), jnp.int32)
            pitchf_in = jnp.zeros((1, frames_pad), jnp.float32)

        audio_out = self._convert(
            self.synth_params,
            self.embedder_params,
            jnp.asarray(audio_in[None]),
            pitch_in,
            pitchf_in,
            jnp.asarray([p_len], jnp.int32),
            jnp.asarray([sid], jnp.int32),
            index_vectors,
            jnp.asarray(index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32),
            rng,
            use_pitch=use_pitch,
        )
        out = self._to_host(audio_out)[0]
        return out[: p_len * self.upp]

    def convert_segments_batch(
        self,
        segments: List[np.ndarray],
        pitches: List[Optional[np.ndarray]],
        pitchfs: List[Optional[np.ndarray]],
        sids: List[int],
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rng: jax.Array,
    ) -> List[np.ndarray]:
        """Convert several 16k segments in ONE device batch (no reference
        equivalent — batch mode there loops convert_audio serially,
        infer.py:350-414). All segments pad to a common bucket; per-segment
        true lengths mask through the model. With enable_batch_sharding the
        batch axis splits over the dp mesh."""
        use_pitch = pitches[0] is not None
        t_pad = self._bucket_len(max(len(s) for s in segments))
        frames_pad = t_pad // WINDOW
        b = len(segments)
        b_pad = self._batch_rows(b)
        audio_in = np.zeros((b_pad, t_pad), np.float32)
        pit = np.ones((b_pad, frames_pad), np.int32)
        pif = np.zeros((b_pad, frames_pad), np.float32)
        p_lens = np.zeros((b_pad,), np.int32)
        sids_arr = np.zeros((b_pad,), np.int32)
        for i in range(b_pad):
            j = i if i < b else 0  # pad rows replicate row 0, sliced off below
            seg = segments[j]
            audio_in[i, : len(seg)] = seg
            p_lens[i] = self._p_len(len(seg), t_pad)
            sids_arr[i] = sids[j]
            if use_pitch:
                n = min(p_lens[i], len(pitches[j]))
                pit[i, :n] = pitches[j][:n]
                pif[i, :n] = pitchfs[j][:n]
        if self._mesh is not None:
            args = (
                self._replicated("synth", self.synth_params),
                self._replicated("emb", self.embedder_params),
                self._shard_rows(audio_in),
                self._shard_rows(pit),
                self._shard_rows(pif),
                self._shard_rows(p_lens),
                self._shard_rows(sids_arr),
                None if index_vectors is None
                else self._replicated("index", index_vectors),
            )
        else:
            args = (
                self.synth_params, self.embedder_params,
                jnp.asarray(audio_in), jnp.asarray(pit), jnp.asarray(pif),
                jnp.asarray(p_lens), jnp.asarray(sids_arr), index_vectors,
            )
        out = self._to_host(self._convert(
            *args,
            jnp.asarray(index_rate, jnp.float32),
            jnp.asarray(protect, jnp.float32),
            rng,
            use_pitch=use_pitch,
        ))
        return [out[i, : int(p_lens[i]) * self.upp] for i in range(b)]

    def voice_conversion_stream(
        self,
        segments: List[np.ndarray],
        pitches: List[Optional[np.ndarray]],
        pitchfs: List[Optional[np.ndarray]],
        sid: int,
        index_vectors: Optional[jax.Array],
        index_rate: float,
        protect: float,
        rngs: List[jax.Array],
        depth: int = 2,
    ) -> List[np.ndarray]:
        """Pipelined long-audio conversion: dispatch the pitch-carrying
        `_convert` graph for up to `depth` segments ahead while earlier
        results download asynchronously. Outputs are bit-identical to
        calling voice_conversion per segment with the same rngs — the
        graph and its inputs are unchanged; only the host dispatch order
        differs. This is the windowed >t_max path's fused win (VERDICT r2
        missing #5): the reference converts windows serially with a
        synchronous fetch each (rvc/infer/pipeline.py:565-680). Fetches run
        on a drain thread (see voice_conversion_fused_stream)."""
        from concurrent.futures import ThreadPoolExecutor

        sid_d = jnp.asarray([sid], jnp.int32)
        index_rate_d = jnp.asarray(index_rate, jnp.float32)
        protect_d = jnp.asarray(protect, jnp.float32)

        futures = []
        max_inflight = max(int(depth), 2) + 2
        async_d2h = True
        with ThreadPoolExecutor(max_workers=1) as pool:
            for i, (seg, pitch, pitchf, sub) in enumerate(
                    zip(segments, pitches, pitchfs, rngs)):
                t_real = seg.shape[0]
                t_pad = self._bucket_len(t_real)
                p_len = self._p_len(t_real, t_pad)
                audio_in = np.zeros(t_pad, np.float32)
                audio_in[:t_real] = seg
                use_pitch = pitch is not None
                frames_pad = t_pad // WINDOW
                if use_pitch:
                    pit = np.ones(frames_pad, np.int32)
                    pif = np.zeros(frames_pad, np.float32)
                    n = min(p_len, len(pitch))
                    pit[:n] = pitch[:n]
                    pif[:n] = pitchf[:n]
                else:
                    pit = np.zeros(frames_pad, np.int32)
                    pif = np.zeros(frames_pad, np.float32)
                audio_out = self._convert(
                    self.synth_params,
                    self.embedder_params,
                    jnp.asarray(audio_in[None]),
                    jnp.asarray(pit[None]),
                    jnp.asarray(pif[None]),
                    jnp.asarray([p_len], jnp.int32),
                    sid_d,
                    index_vectors,
                    index_rate_d,
                    protect_d,
                    sub,
                    use_pitch=use_pitch,
                )
                if async_d2h:
                    try:  # start the D2H copy when the program finishes
                        audio_out.copy_to_host_async()
                    except (AttributeError, NotImplementedError):
                        async_d2h = False  # drain thread still overlaps
                futures.append(pool.submit(
                    lambda a, pl: self._to_host(a)[0][: pl * self.upp],
                    audio_out, p_len))
                if i >= max_inflight:
                    futures[i - max_inflight].result()
            return [f.result() for f in futures]

    def pipeline(
        self,
        audio: np.ndarray,
        sid: int = 0,
        pitch_shift: int = 0,
        f0_method: str = "yin",
        index_vectors: Optional[np.ndarray] = None,
        index_rate: float = 0.0,
        pitch_guidance: bool = True,
        volume_envelope: float = 1.0,
        protect: float = 0.5,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        inp_f0: Optional[np.ndarray] = None,
        predictors: Optional[Dict[str, Any]] = None,
        rng: Optional[jax.Array] = None,
        filter_radius: float = 3,
        hop_length: int = 160,
    ) -> np.ndarray:
        """Full conversion of a 16 kHz waveform -> tgt_sr waveform
        (pipeline.py:509-694)."""
        rng = rng if rng is not None else jax.random.PRNGKey(0)
        index_arr = (
            jnp.asarray(index_vectors, jnp.float32)
            if index_vectors is not None and index_rate > 0
            else None
        )

        audio = self._highpass(audio)
        opt_ts = self._find_cut_points(audio)
        audio_pad = np.pad(audio, (self.t_pad, self.t_pad), mode="reflect")
        p_len = audio_pad.shape[0] // WINDOW

        # single-segment rmvpe conversions take the fused one-round-trip
        # graph (f0 + quantize + convert in one device call); the windowed
        # long-audio path and external f0 files keep the global-f0 path.
        if (pitch_guidance and not opt_ts and inp_f0 is None
                and f0_method == "rmvpe" and self._rmvpe is None
                and predictors is not None
                and hasattr(predictors.get("rmvpe"), "__self__")):
            self.set_rmvpe(predictors["rmvpe"].__self__)
        if (pitch_guidance and not opt_ts and inp_f0 is None
                and f0_method == "rmvpe" and self._rmvpe is not None):
            rng, sub = jax.random.split(rng)
            seg_out = self.voice_conversion_fused(
                audio_pad, sid, index_arr, index_rate, protect, sub,
                pitch_shift=pitch_shift, f0_autotune=f0_autotune,
                f0_autotune_strength=f0_autotune_strength,
                filter_radius=int(filter_radius or 0),
            )
            audio_opt = seg_out[self.t_pad_tgt : -self.t_pad_tgt]
            if volume_envelope != 1.0:
                audio_opt = change_rms(
                    audio, SAMPLE_RATE, audio_opt, self.tgt_sr, volume_envelope
                )
            peak = np.abs(audio_opt).max() / 0.99
            if peak > 1.0:
                audio_opt = audio_opt / peak
            return audio_opt.astype(np.float32)

        pitch = pitchf = None
        if pitch_guidance:
            pitch, pitchf = self.get_f0(
                audio_pad, p_len, pitch_shift, f0_method, predictors,
                f0_autotune, f0_autotune_strength, inp_f0, filter_radius,
                hop_length=hop_length,
            )

        # collect the windowed segments + their global-f0 slices, then stream
        # them through the pipelined dispatcher (depth-2 in flight, async
        # D2H) — bit-identical per segment to the old serial loop
        segments: List[np.ndarray] = []
        seg_pitches: List[Optional[np.ndarray]] = []
        seg_pitchfs: List[Optional[np.ndarray]] = []
        subs: List[jax.Array] = []
        s = 0
        t = None
        for t_raw in opt_ts:
            t = t_raw // WINDOW * WINDOW
            segments.append(audio_pad[s : t + self.t_pad2 + WINDOW])
            pslice = slice(s // WINDOW, (t + self.t_pad2) // WINDOW)
            seg_pitches.append(pitch[pslice] if pitch is not None else None)
            seg_pitchfs.append(pitchf[pslice] if pitchf is not None else None)
            rng, sub = jax.random.split(rng)
            subs.append(sub)
            s = t
        segments.append(audio_pad[t:] if t is not None else audio_pad)
        seg_pitches.append(
            pitch[t // WINDOW :] if (pitch is not None and t is not None)
            else pitch
        )
        seg_pitchfs.append(
            pitchf[t // WINDOW :] if (pitchf is not None and t is not None)
            else pitchf
        )
        rng, sub = jax.random.split(rng)
        subs.append(sub)

        seg_outs = self.voice_conversion_stream(
            segments, seg_pitches, seg_pitchfs, sid, index_arr, index_rate,
            protect, subs,
        )
        audio_opt = np.concatenate(
            [o[self.t_pad_tgt : -self.t_pad_tgt] for o in seg_outs]
        )
        if volume_envelope != 1.0:
            audio_opt = change_rms(
                audio, SAMPLE_RATE, audio_opt, self.tgt_sr, volume_envelope
            )
        peak = np.abs(audio_opt).max() / 0.99
        if peak > 1.0:
            audio_opt = audio_opt / peak
        return audio_opt.astype(np.float32)

    def pipeline_many(
        self,
        audios: List[np.ndarray],
        sid: int = 0,
        pitch_shift: int = 0,
        f0_method: str = "yin",
        index_vectors: Optional[np.ndarray] = None,
        index_rate: float = 0.0,
        pitch_guidance: bool = True,
        volume_envelope: float = 1.0,
        protect: float = 0.5,
        f0_autotune: bool = False,
        f0_autotune_strength: float = 1.0,
        inp_f0: Optional[np.ndarray] = None,
        predictors: Optional[Dict[str, Any]] = None,
        rng: Optional[jax.Array] = None,
        filter_radius: float = 3,
        hop_length: int = 160,
    ) -> List[np.ndarray]:
        """Convert several INDEPENDENT clips with dispatch-ahead.

        Sample-identical to `[self.pipeline(a, ...) for a in audios]` — the
        contract of split_audio mode, where slicer segments are converted
        independently (reference infer.py:202-238) — but when every clip
        fits the fused single-segment path (rmvpe, no external f0, length
        <= t_max) the conversions ride voice_conversion_fused_stream: the
        host high-passes/pads clip i+1 and downloads clip i-1 while the
        device converts clip i, instead of one synchronous round trip per
        slicer segment."""
        kwargs = dict(
            sid=sid, pitch_shift=pitch_shift, f0_method=f0_method,
            index_vectors=index_vectors, index_rate=index_rate,
            pitch_guidance=pitch_guidance, volume_envelope=volume_envelope,
            protect=protect, f0_autotune=f0_autotune,
            f0_autotune_strength=f0_autotune_strength, inp_f0=inp_f0,
            predictors=predictors, rng=rng, filter_radius=filter_radius,
            hop_length=hop_length,
        )
        fast = (
            pitch_guidance and inp_f0 is None and f0_method == "rmvpe"
            and all(a.shape[0] <= self.t_max for a in audios)
        )
        if (fast and self._rmvpe is None and predictors is not None
                and hasattr(predictors.get("rmvpe"), "__self__")):
            self.set_rmvpe(predictors["rmvpe"].__self__)
        if not (fast and self._rmvpe is not None):
            return [self.pipeline(a, **kwargs) for a in audios]

        index_arr = (
            jnp.asarray(index_vectors, jnp.float32)
            if index_vectors is not None and index_rate > 0
            else None
        )
        # every serial pipeline() call starts from the same rng, so every
        # clip uses the SAME sub-key — reproduce that for bit-equality
        base_rng = rng if rng is not None else jax.random.PRNGKey(0)
        _, sub = jax.random.split(base_rng)

        hp: List[np.ndarray] = []  # prep runs in dispatch order

        def prep(seg):
            h = self._highpass(seg)
            hp.append(h)
            return np.pad(h, (self.t_pad, self.t_pad), mode="reflect")

        raw = self.voice_conversion_fused_stream(
            audios, sid, index_arr, index_rate, protect, base_rng,
            pitch_shift=pitch_shift, f0_autotune=f0_autotune,
            f0_autotune_strength=f0_autotune_strength,
            filter_radius=int(filter_radius or 0),
            prep=prep, rngs=[sub] * len(audios),
        )
        outs: List[np.ndarray] = []
        for seg_out, h in zip(raw, hp):
            audio_opt = seg_out[self.t_pad_tgt : -self.t_pad_tgt]
            if volume_envelope != 1.0:
                audio_opt = change_rms(
                    h, SAMPLE_RATE, audio_opt, self.tgt_sr, volume_envelope
                )
            peak = np.abs(audio_opt).max() / 0.99
            if peak > 1.0:
                audio_opt = audio_opt / peak
            outs.append(audio_opt.astype(np.float32))
        return outs

