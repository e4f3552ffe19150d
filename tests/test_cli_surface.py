"""CLI surface contract: all 13 subcommands parse with reference-compatible
flags (core.py:649-2269 parity)."""

import pytest

from rvc_tpu.cli import build_parser

P = build_parser()


def test_all_13_subcommands_exist():
    subs = P._subparsers._group_actions[0].choices
    expected = {
        "infer", "batch_infer", "tts", "preprocess", "extract", "train",
        "index", "model_information", "model_blender", "tensorboard",
        "download", "prerequisites", "audio_analyzer",
    }
    assert expected <= set(subs)


def test_infer_full_flag_surface():
    args = P.parse_args([
        "infer", "--input_path", "a.wav", "--output_path", "b.wav",
        "--pth_path", "m.npz", "--pitch", "-12", "--index_rate", "0.75",
        "--protect", "0.2", "--f0_method", "rmvpe", "--f0_autotune", "true",
        "--clean_audio", "true", "--export_format", "FLAC",
        "--formant_shifting", "true", "--formant_timbre", "1.1",
        "--post_process", "true", "--reverb", "true",
        "--reverb_room_size", "0.7", "--compressor", "true",
        "--compressor_ratio", "4.0", "--bitcrush_bit_depth", "12",
    ])
    assert args.pitch == -12 and args.reverb and args.bitcrush_bit_depth == 12


def test_train_flags():
    args = P.parse_args([
        "train", "--model_name", "m", "--sample_rate", "40000",
        "--vocoder", "RefineGAN", "--optimizer", "Ranger21",
        "--use_warmup", "true", "--warmup_duration", "10",
        "--double_d_update", "true", "--use_balancer", "true",
        "--checkpointing", "true", "--discriminators", "mpd,mrd",
        "--save_only_latest", "true",
    ])
    assert args.vocoder == "RefineGAN" and args.discriminators == "mpd,mrd"


def test_tts_flags():
    args = P.parse_args([
        "tts", "--tts_text", "hello", "--tts_voice", "en-US-AriaNeural",
        "--tts_rate", "-10", "--output_tts_path", "t.wav",
        "--output_rvc_path", "o.wav", "--pth_path", "m.npz",
    ])
    assert args.tts_rate == -10


def test_train_reference_flag_aliases():
    """Round-2 parity: custom LR / device / save_every_weights / CUDA-knob
    acceptance (reference core.py:530-640, train.py:23-31)."""
    args = P.parse_args([
        "train", "--model_name", "m", "--sample_rate", "48000",
        "--use_custom_lr", "true", "--custom_lr_g", "1e-4",
        "--custom_lr_d", "2e-4", "--gpu", "0-1",
        "--save_every_weights", "false", "--custom_pretrained", "true",
        "--use_tf32", "false", "--use_benchmark", "true",
        "--use_deterministic", "true", "--use_checkpointing", "true",
    ])
    assert args.custom_lr_g == 1e-4 and args.custom_lr_d == 2e-4
    assert args.gpu == "0-1" and not args.save_every_weights
    assert args.checkpointing is True  # --use_checkpointing alias


def test_extract_and_prerequisites_flags():
    args = P.parse_args([
        "extract", "--model_name", "m", "--sample_rate", "40000",
        "--cpu_cores", "4", "--gpu", "0",
    ])
    assert args.cpu_cores == 4 and args.gpu == "0"
    args = P.parse_args([
        "prerequisites", "--models", "true",
        "--pretraineds_hifigan", "false", "--exe", "false",
    ])
    assert args.models and not args.pretraineds_hifigan and not args.exe


def test_tts_file_alias():
    args = P.parse_args([
        "tts", "--tts_voice", "v", "--tts_file", "in.txt",
        "--output_tts_path", "t.wav", "--output_rvc_path", "o.wav",
        "--pth_path", "m.npz",
    ])
    assert args.input_path == "in.txt"


def test_invalid_choices_rejected():
    with pytest.raises(SystemExit):
        P.parse_args(["train", "--model_name", "m", "--sample_rate", "44100"])
    with pytest.raises(SystemExit):
        P.parse_args(["infer", "--input_path", "a", "--output_path", "b",
                      "--pth_path", "m", "--f0_method", "nope"])


def test_prerequisites_prime_cache_flag():
    from rvc_tpu.cli import build_parser
    from rvc_tpu.utils.prime_cache import parse_seconds_spec

    args = build_parser().parse_args(
        ["prerequisites", "--prime_cache", "1-3,8"])
    assert args.prime_cache == "1-3,8"
    assert parse_seconds_spec(args.prime_cache) == [1, 2, 3, 8]
    assert parse_seconds_spec("5") == [5]
    assert parse_seconds_spec(" 2-2 , 2 ") == [2]
    assert parse_seconds_spec("") == []
