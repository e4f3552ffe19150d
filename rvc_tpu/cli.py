"""CLI facade: the reference's 13-subcommand surface, TPU-native.

Parity target: core.py:649-2269 argparse contract — subcommands
{infer, batch_infer, tts, preprocess, extract, train, index,
model_information, model_blender, tensorboard, download, prerequisites,
audio_analyzer} with the same flag names/defaults (post-FX knobs included).

Differences by design: no subprocess forking — every pipeline runs
in-process on the jax runtime (the reference forks python per stage,
core.py:450,489,578); checkpoints are .npz (reference .pth accepted
read-only); downloads are stubs in zero-egress environments.
"""

from __future__ import annotations

import argparse
import os
import sys


def _bool(v) -> bool:
    if isinstance(v, bool):
        return v
    return str(v).lower() in ("true", "1", "yes")


def pretrained_selector(vocoder: str, sample_rate: int) -> tuple[str, str]:
    """Default pretrained G/D for a vocoder+sr, if staged locally.

    Mirrors reference rvc/lib/tools/pretrained_selector.py: looks under
    models/pretraineds/<vocoder-lower>/f0{G,D}{sr/1000}k.* — native .npz
    preferred, reference .pth accepted — and returns ("", "") when the
    pair is absent (training then starts from scratch, like the reference).
    """
    sr_tag = str(sample_rate)[:2]
    # per-vocoder dir first, then the flat layout the prerequisites
    # instructions describe (utils/downloads.py)
    for base in (os.path.join("models", "pretraineds", vocoder.lower()),
                 os.path.join("models", "pretraineds")):
        for ext in (".npz", ".pth"):
            path_g = os.path.join(base, f"f0G{sr_tag}k{ext}")
            path_d = os.path.join(base, f"f0D{sr_tag}k{ext}")
            if os.path.exists(path_g) and os.path.exists(path_d):
                return path_g, path_d
    return "", ""


def cleanup_previous_run(exp_dir: str) -> int:
    """Fresh-start request: drop prior-attempt training state (reference
    train.py:377-403 removes G_/D_ ckpts, index, events). Dataset artifacts
    (filelist, config, features, wavs) are kept. Returns removal count."""
    removed = 0
    if not os.path.isdir(exp_dir):
        return 0
    for fn in os.listdir(exp_dir):
        if (fn.startswith(("G_", "D_", "orbax_", "reference_e"))
                or fn.endswith((".index.npz", ".index"))
                or fn in ("metrics.jsonl", "heartbeat.json",
                          "train_error.log")
                or fn.startswith("events.out.tfevents")):
            path = os.path.join(exp_dir, fn)
            try:
                if os.path.isdir(path):
                    import shutil

                    shutil.rmtree(path)
                else:
                    os.remove(path)
                removed += 1
            except OSError as e:
                print(f"cleanup: could not remove {path} ({e})")
    print(f"cleanup: removed {removed} previous-attempt artifact(s)")
    return removed


def _add_post_fx_args(p: argparse.ArgumentParser) -> None:
    for flag in ("post_process", "reverb", "pitch_shift", "limiter", "gain",
                 "distortion", "chorus", "bitcrush", "clipping", "compressor",
                 "delay"):
        p.add_argument(f"--{flag}", type=_bool, default=False)
    for flag, default in (
        ("reverb_room_size", 0.5), ("reverb_damping", 0.5),
        ("reverb_wet_gain", 0.33), ("reverb_dry_gain", 0.4),
        ("reverb_width", 1.0), ("reverb_freeze_mode", 0.0),
        ("pitch_shift_semitones", 0.0), ("limiter_threshold", -6.0),
        ("limiter_release_time", 0.01), ("gain_db", 0.0),
        ("distortion_gain", 25.0), ("chorus_rate", 1.0),
        ("chorus_depth", 0.25), ("chorus_center_delay", 7.0),
        ("chorus_feedback", 0.0), ("chorus_mix", 0.5),
        ("clipping_threshold", -6.0), ("compressor_threshold", 0.0),
        ("compressor_ratio", 1.0), ("compressor_attack", 1.0),
        ("compressor_release", 100.0), ("delay_seconds", 0.5),
        ("delay_feedback", 0.0), ("delay_mix", 0.5),
    ):
        p.add_argument(f"--{flag}", type=float, default=default)
    p.add_argument("--bitcrush_bit_depth", type=int, default=8)


def _add_infer_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--pitch", type=int, default=0)
    p.add_argument("--filter_radius", type=int, default=3)
    p.add_argument("--index_rate", type=float, default=0.3)
    p.add_argument("--volume_envelope", type=float, default=1.0)
    p.add_argument("--protect", type=float, default=0.33)
    p.add_argument("--hop_length", type=int, default=128)
    # reference menu (core.py:714-723) + TPU-native yin extras
    p.add_argument("--f0_method", type=str, default="rmvpe",
                   choices=["crepe", "crepe-tiny", "rmvpe", "fcpe", "yin",
                            "hybrid[crepe+rmvpe]", "hybrid[crepe+fcpe]",
                            "hybrid[rmvpe+fcpe]", "hybrid[crepe+rmvpe+fcpe]",
                            "hybrid[rmvpe+yin]"])
    p.add_argument("--pth_path", type=str, required=True)
    p.add_argument("--index_path", type=str, default="")
    p.add_argument("--split_audio", type=_bool, default=False)
    p.add_argument("--f0_autotune", type=_bool, default=False)
    p.add_argument("--f0_autotune_strength", type=float, default=1.0)
    p.add_argument("--clean_audio", type=_bool, default=False)
    p.add_argument("--clean_strength", type=float, default=0.7)
    p.add_argument("--export_format", type=str, default="WAV",
                   choices=["WAV", "MP3", "FLAC", "OGG", "M4A"])
    p.add_argument("--f0_file", type=str, default=None)
    p.add_argument("--embedder_model", type=str, default="contentvec",
                   choices=["contentvec", "spin", "chinese-hubert-base",
                            "japanese-hubert-base", "korean-hubert-base",
                            "custom"])
    p.add_argument("--embedder_model_custom", type=str, default=None)
    p.add_argument("--sid", type=int, default=0)
    p.add_argument("--formant_shifting", type=_bool, default=False)
    p.add_argument("--formant_qfrency", type=float, default=1.0)
    p.add_argument("--formant_timbre", type=float, default=1.0)
    # inference numerics: bf16 mirrors the reference's fp16-first config
    # (rvc/configs/config.py); fp32 for numerically exact runs
    p.add_argument("--precision", type=str, default="bf16",
                   choices=["bf16", "fp32"])
    _add_post_fx_args(p)


def _collect_infer_kwargs(args) -> dict:
    keys = (
        "pitch filter_radius hop_length index_rate volume_envelope protect "
        "f0_method "
        "split_audio f0_autotune f0_autotune_strength clean_audio "
        "clean_strength export_format f0_file sid embedder_model "
        "embedder_model_custom formant_shifting formant_qfrency "
        "formant_timbre post_process reverb pitch_shift limiter gain "
        "distortion chorus bitcrush clipping compressor delay "
        "reverb_room_size reverb_damping reverb_wet_gain reverb_dry_gain "
        "reverb_width reverb_freeze_mode pitch_shift_semitones "
        "limiter_threshold limiter_release_time gain_db distortion_gain "
        "chorus_rate chorus_depth chorus_center_delay chorus_feedback "
        "chorus_mix bitcrush_bit_depth clipping_threshold "
        "compressor_threshold compressor_ratio compressor_attack "
        "compressor_release delay_seconds delay_feedback delay_mix"
    ).split()
    kw = {k: getattr(args, k) for k in keys if hasattr(args, k)}
    kw["model_path"] = args.pth_path
    kw["index_path"] = args.index_path
    return kw


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(
        prog="rvc_tpu", description="TPU-native retrieval-based voice conversion"
    )
    sub = parser.add_subparsers(dest="mode", required=True)

    p = sub.add_parser("infer", help="Run single-file inference")
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--output_path", type=str, required=True)
    _add_infer_args(p)

    p = sub.add_parser("batch_infer", help="Run folder batch inference")
    p.add_argument("--input_folder", type=str, required=True)
    p.add_argument("--output_folder", type=str, required=True)
    _add_infer_args(p)

    p = sub.add_parser("tts", help="Text-to-speech then voice conversion")
    p.add_argument("--tts_text", type=str, default=None,
                   help="text to speak (or use --input_path)")
    p.add_argument("--tts_voice", type=str, required=True)
    p.add_argument("--tts_rate", type=int, default=0)
    p.add_argument("--input_path", "--tts_file", dest="input_path",
                   type=str, default=None,
                   help="optional text file instead of --tts_text "
                        "(reference name: --tts_file)")
    p.add_argument("--output_tts_path", type=str, required=True)
    p.add_argument("--output_rvc_path", type=str, required=True)
    _add_infer_args(p)

    p = sub.add_parser("preprocess", help="Preprocess a dataset")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--dataset_path", type=str, required=True)
    p.add_argument("--sample_rate", type=int, required=True,
                   choices=[32000, 40000, 48000])
    p.add_argument("--cpu_cores", type=int, default=None)
    p.add_argument("--cut_preprocess", type=str, default="Automatic",
                   choices=["Skip", "Simple", "Automatic"])
    p.add_argument("--process_effects", type=_bool, default=True)
    p.add_argument("--noise_reduction", type=_bool, default=False)
    p.add_argument("--noise_reduction_strength", type=float, default=0.7)
    p.add_argument("--chunk_len", type=float, default=3.0)
    p.add_argument("--overlap_len", type=float, default=0.3)

    p = sub.add_parser("extract", help="Extract F0 + content features")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--f0_method", type=str, default="rmvpe",
                   choices=["crepe", "crepe-tiny", "rmvpe", "fcpe", "yin"])
    p.add_argument("--hop_length", type=int, default=128)
    p.add_argument("--sample_rate", type=int, required=True)
    p.add_argument("--embedder_model", type=str, default="contentvec",
                   choices=["contentvec", "spin", "chinese-hubert-base",
                            "japanese-hubert-base", "korean-hubert-base",
                            "custom"])
    p.add_argument("--embedder_model_custom", type=str, default=None)
    p.add_argument("--include_mutes", type=int, default=2)
    p.add_argument("--rmvpe_ckpt", type=str,
                   default=os.path.join("models", "predictors", "rmvpe.pt"))
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--cpu_cores", type=int, default=None,
                   help="host threads for audio decode during extraction")
    p.add_argument("--gpu", type=str, default="",
                   help="device index to extract on (reference flag name; "
                        "first index selects among jax.devices())")

    p = sub.add_parser("train", help="Train a model")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--sample_rate", type=int, required=True,
                   choices=[32000, 40000, 48000])
    p.add_argument("--vocoder", type=str, default="HiFi-GAN",
                   choices=["HiFi-GAN", "MRF HiFi-GAN", "RefineGAN"])
    p.add_argument("--total_epoch", type=int, default=200)
    p.add_argument("--batch_size", type=int, default=8)
    p.add_argument("--save_every_epoch", type=int, default=10)
    p.add_argument("--save_only_latest", type=_bool, default=False)
    p.add_argument("--pretrained", type=_bool, default=True)
    p.add_argument("--g_pretrained_path", type=str, default="")
    p.add_argument("--d_pretrained_path", type=str, default="")
    p.add_argument("--optimizer", type=str, default="AdamW",
                   choices=["AdamW", "RAdam", "Ranger21"])
    p.add_argument("--use_warmup", type=_bool, default=False)
    p.add_argument("--warmup_duration", type=int, default=5)
    p.add_argument("--use_multiscale_mel_loss", type=_bool, default=True)
    p.add_argument("--double_d_update", type=_bool, default=False)
    p.add_argument("--use_balancer", type=_bool, default=False)
    p.add_argument("--use_wgan_gp_loss", type=_bool, default=False)
    p.add_argument("--bf16_run", type=_bool, default=True)
    p.add_argument("--checkpointing", type=_bool, default=False)
    p.add_argument("--use_orbax", type=_bool, default=False,
                   help="multi-host sharded checkpoints via orbax")
    p.add_argument("--discriminators", type=str, default="mpd",
                   help="comma list: mpd,mpd_v1,mrd,msstft,mssbcqt,msd,"
                        "fregan_mpd,mmsd")
    p.add_argument("--index_algorithm", type=str, default="Auto")
    p.add_argument("--cleanup", type=_bool, default=False,
                   help="remove previous-attempt checkpoints/index/metrics "
                        "before training (reference train.py:377-403)")
    p.add_argument("--cache_data_in_gpu", type=_bool, default=False,
                   help="keep the padded dataset resident on the device "
                        "(reference flag name; here it caches in TPU HBM — "
                        "steady-state steps then upload zero batch bytes)")
    p.add_argument("--use_checkpointing", dest="checkpointing", type=_bool,
                   default=argparse.SUPPRESS,
                   help="alias of --checkpointing (reference flag name)")
    p.add_argument("--custom_pretrained", type=_bool, default=False,
                   help="use --g_pretrained_path/--d_pretrained_path instead "
                        "of the staged defaults (reference core.py:530-539)")
    p.add_argument("--use_custom_lr", type=_bool, default=False)
    p.add_argument("--custom_lr_g", type=float, default=None)
    p.add_argument("--custom_lr_d", type=float, default=None)
    p.add_argument("--save_every_weights", type=_bool, default=True,
                   help="export the deployable weights file on every save "
                        "epoch (final epoch always exports)")
    p.add_argument("--gpu", type=str, default="",
                   help="dash-separated device indices to train on "
                        "(reference flag name; selects among jax.devices())")
    p.add_argument("--use_tf32", type=_bool, default=False,
                   help="CUDA TensorFloat-32 toggle — accepted for CLI "
                        "compatibility; no effect on TPU (MXU uses bf16)")
    p.add_argument("--use_benchmark", type=_bool, default=True,
                   help="cudnn.benchmark toggle — accepted for CLI "
                        "compatibility; XLA autotunes unconditionally")
    p.add_argument("--use_deterministic", type=_bool, default=False,
                   help="reference cudnn.deterministic; JAX/XLA kernels are "
                        "deterministic by default, so this is always on")

    p = sub.add_parser("index", help="Build the retrieval index")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--index_algorithm", type=str, default="Auto",
                   choices=["Auto", "Faiss", "KMeans"])
    p.add_argument("--export_faiss", action="store_true",
                   help="also write a faiss-binary IndexIVFFlat "
                        "(added_IVF{n}_Flat_..._v2.index) so the model can "
                        "be used from a reference install")

    p = sub.add_parser("model_information", help="Print model metadata")
    p.add_argument("--pth_path", type=str, required=True)

    p = sub.add_parser("model_blender", help="Blend two models")
    p.add_argument("--model_name", type=str, required=True)
    p.add_argument("--pth_path_1", type=str, required=True)
    p.add_argument("--pth_path_2", type=str, required=True)
    p.add_argument("--ratio", type=float, default=0.5)

    p = sub.add_parser("tensorboard", help="Launch metric dashboard")
    p.add_argument("--logdir", type=str, default="logs")
    p.add_argument("--port", type=int, default=9000)

    p = sub.add_parser("download", help="Download a model from a link")
    p.add_argument("--model_link", type=str, required=True)

    p = sub.add_parser("prerequisites",
                       help="Fetch predictor/pretrain assets")
    p.add_argument("--models", type=_bool, default=True,
                   help="stage predictor/embedder models")
    p.add_argument("--pretraineds_hifigan", type=_bool, default=True,
                   help="stage the default HiFi-GAN pretrains")
    p.add_argument("--exe", type=_bool, default=True,
                   help="reference: fetch ffmpeg.exe; here: build the "
                        "native audio engine")
    p.add_argument("--prime_cache", default="",
                   help="pre-compile the fused serving graphs for these "
                        "file lengths in seconds (e.g. '1-10,30') so a "
                        "cold infer skips the multi-minute XLA compile")

    p = sub.add_parser("audio_analyzer", help="Analyze an audio file")
    p.add_argument("--input_path", type=str, required=True)
    p.add_argument("--save_plot_path", type=str, default=None)

    return parser


def _enable_compile_cache() -> None:
    """Persistent XLA compile cache: repeat invocations of the same pipeline
    skip the (minutes-long for the full model) compiles."""
    try:
        import jax

        cache_dir = os.environ.get(
            "RVC_TPU_COMPILE_CACHE",
            os.path.join(os.path.expanduser("~"), ".cache", "rvc_tpu", "xla"),
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # persist even sub-second programs: a cold serving start dispatches
        # ~190 tiny helper compiles whose round trips to the remote compile
        # service cost ~160 s in aggregate (docs/PERFORMANCE.md "small-jit
        # compile flood"); caching them cut bench warmup 180 s -> 36 s
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    if args.mode in ("infer", "batch_infer", "tts", "extract", "train",
                     "index", "prerequisites"):
        _enable_compile_cache()

    if args.mode == "infer":
        from .infer.converter import VoiceConverter

        VoiceConverter(precision=args.precision).convert_audio(
            audio_input_path=args.input_path,
            audio_output_path=args.output_path,
            **_collect_infer_kwargs(args),
        )

    elif args.mode == "batch_infer":
        from .infer.converter import VoiceConverter

        VoiceConverter(precision=args.precision).convert_audio_batch(
            audio_input_paths=args.input_folder,
            audio_output_path=args.output_folder,
            **_collect_infer_kwargs(args),
        )

    elif args.mode == "tts":
        from .utils.tts import run_tts

        text = args.tts_text
        if args.input_path and os.path.exists(args.input_path):
            text = open(args.input_path, encoding="utf-8").read()
        if not text:
            raise SystemExit("tts: provide --tts_text or --input_path")
        run_tts(text, args.tts_voice, args.tts_rate, args.output_tts_path)
        from .infer.converter import VoiceConverter

        VoiceConverter(precision=args.precision).convert_audio(
            audio_input_path=args.output_tts_path,
            audio_output_path=args.output_rvc_path,
            **_collect_infer_kwargs(args),
        )

    elif args.mode == "preprocess":
        from .train.preprocess import preprocess_training_set

        exp_dir = os.path.join("logs", args.model_name)
        hours = preprocess_training_set(
            args.dataset_path, args.sample_rate, exp_dir,
            cut_preprocess=args.cut_preprocess,
            process_effects=args.process_effects,
            noise_reduction=args.noise_reduction,
            reduction_strength=args.noise_reduction_strength,
            chunk_len=args.chunk_len, overlap_len=args.overlap_len,
            num_workers=args.cpu_cores,
        )
        print(f"preprocessed {hours:.2f} h into {exp_dir}")

    elif args.mode == "extract":
        from .train.extract import run_extraction

        exp_dir = os.path.join("logs", args.model_name)
        import contextlib

        ctx = contextlib.nullcontext()
        if args.gpu:
            import jax

            idx = int(args.gpu.split("-")[0])
            ctx = jax.default_device(jax.devices()[idx])
        with ctx:
            run_extraction(
                exp_dir, f0_method=args.f0_method,
                rmvpe_ckpt=args.rmvpe_ckpt if os.path.exists(args.rmvpe_ckpt) else None,
                embedder_ckpt=args.embedder_model_custom,
                include_mutes=args.include_mutes, sample_rate=args.sample_rate,
                batch_size=args.batch_size, embedder_model=args.embedder_model,
                hop_length=args.hop_length, cpu_cores=args.cpu_cores,
            )
        print(f"extraction complete for {exp_dir}")

    elif args.mode == "train":
        import dataclasses

        from .configs import get_config
        from .train.trainer import Trainer, TrainerArgs

        if getattr(args, "cleanup", False):
            cleanup_previous_run(os.path.join("logs", args.model_name))

        cfg = get_config(args.sample_rate, vocoder=args.vocoder)
        cfg = dataclasses.replace(
            cfg,
            train=dataclasses.replace(
                cfg.train,
                batch_size=args.batch_size,
                optimizer=args.optimizer.lower(),
                use_multiscale_mel=args.use_multiscale_mel_loss,
                double_d_update=args.double_d_update,
                use_balancer=args.use_balancer,
                use_wgan=args.use_wgan_gp_loss,
                bf16_run=args.bf16_run,
                use_checkpointing=args.checkpointing,
                warmup_epochs=args.warmup_duration if args.use_warmup else 0,
            ),
        )
        exp_dir = os.path.join("logs", args.model_name)
        pretrain_g = args.g_pretrained_path
        pretrain_d = args.d_pretrained_path
        if args.pretrained and args.custom_pretrained and not (
                pretrain_g and pretrain_d):
            # reference core.py:535-538 errors the same way
            raise SystemExit(
                "custom_pretrained requires --g_pretrained_path and "
                "--d_pretrained_path")
        if args.pretrained and not args.custom_pretrained and not (
                pretrain_g or pretrain_d):
            # no custom paths: auto-select the staged default pretrains for
            # this vocoder+sr (reference rvc/lib/tools/pretrained_selector.py)
            pretrain_g, pretrain_d = pretrained_selector(
                args.vocoder, args.sample_rate)
        if args.use_custom_lr and (args.custom_lr_g is None
                                   or args.custom_lr_d is None):
            # reference train.py:23-31 exits on missing custom LR values
            raise SystemExit(
                "use_custom_lr requires --custom_lr_g and --custom_lr_d")
        if args.use_tf32:
            print("use_tf32 is CUDA-specific; no effect on TPU (MXU is bf16)")
        if not args.use_benchmark:
            print("use_benchmark is CUDA-specific; XLA autotunes regardless")
        if args.use_deterministic:
            print("deterministic execution is the JAX/XLA default; enabled")
        device_indices = None
        if args.gpu:
            device_indices = tuple(
                int(i) for i in args.gpu.split("-") if i != "")
        targs = TrainerArgs(
            exp_dir=exp_dir,
            discriminators=args.discriminators,
            use_orbax=args.use_orbax,
            cache_data=args.cache_data_in_gpu,
            total_epochs=args.total_epoch,
            save_every_epoch=args.save_every_epoch,
            save_only_latest=args.save_only_latest,
            save_every_weights=args.save_every_weights,
            lr_g=args.custom_lr_g if args.use_custom_lr else None,
            lr_d=args.custom_lr_d if args.use_custom_lr else None,
            device_indices=device_indices,
            pretrain_g=pretrain_g if args.pretrained else "",
            pretrain_d=pretrain_d if args.pretrained else "",
        )
        Trainer(cfg, targs).fit()
        from .train.index_builder import build_index

        try:
            print("index:", build_index(
                exp_dir, algorithm=args.index_algorithm))
        except FileNotFoundError:
            pass

    elif args.mode == "index":
        from .train.index_builder import build_index

        print(build_index(os.path.join("logs", args.model_name),
                          algorithm=args.index_algorithm,
                          export_faiss=args.export_faiss))

    elif args.mode == "model_information":
        from .utils.model_tools import model_information

        model_information(args.pth_path)

    elif args.mode == "model_blender":
        from .utils.model_tools import model_blender

        print(model_blender(args.model_name, args.pth_path_1, args.pth_path_2,
                            args.ratio))

    elif args.mode == "tensorboard":
        try:
            from tensorboard import program

            tb = program.TensorBoard()
            tb.configure(argv=[None, "--logdir", args.logdir,
                               "--port", str(args.port)])
            url = tb.launch()
            print(f"TensorBoard at {url}")
            import time

            while True:
                time.sleep(60)
        except ImportError:
            print("tensorboard not installed; metrics are in "
                  f"{args.logdir}/*/metrics.jsonl")

    elif args.mode == "download":
        from .utils.downloads import model_download_pipeline

        model_download_pipeline(args.model_link)

    elif args.mode == "prerequisites":
        from .utils.downloads import prerequisites_download_pipeline

        prerequisites_download_pipeline(
            pretraineds_hifigan=args.pretraineds_hifigan,
            models=args.models, exe=args.exe)
        if args.prime_cache:
            from .utils.prime_cache import (
                parse_seconds_spec, prime_serving_cache,
            )

            prime_serving_cache(parse_seconds_spec(args.prime_cache))

    elif args.mode == "audio_analyzer":
        from .utils.analyzer import analyze_audio

        analyze_audio(args.input_path, args.save_plot_path)

    return 0


if __name__ == "__main__":
    sys.exit(main())
