"""UI tab builders.

Parity target: tabs/inference/inference.py:356 (single+batch infer with the
full effect-knob surface and preset import/export), tabs/train/train.py:297
(preprocess/extract/train/index buttons), tabs/tts/tts.py, voice_blender,
download, utilities (analyzer + f0 extractor), settings
(theme/lang/precision/restart). Each builder takes (gr, i18n) so the gradio
import stays confined to app.build_app.
"""

from __future__ import annotations

import glob
import json
import os


def _model_choices():
    return sorted(
        glob.glob(os.path.join("logs", "**", "*.npz"), recursive=True)
        + glob.glob(os.path.join("logs", "**", "*.pth"), recursive=True)
    )


def _index_choices():
    return sorted(glob.glob(os.path.join("logs", "**", "*.index.npz"),
                            recursive=True))


def inference_tab(gr, i18n):
    from ..infer.converter import VoiceConverter

    vc = VoiceConverter()

    with gr.Row():
        model = gr.Dropdown(label=i18n("Voice Model"), choices=_model_choices())
        index = gr.Dropdown(label=i18n("Index File"), choices=_index_choices())
        refresh = gr.Button(i18n("Refresh"))

    with gr.Tab(i18n("Single")):
        audio_in = gr.Audio(label=i18n("Upload Audio"), type="filepath")
        from ..utils.presets import list_presets, load_preset

        with gr.Row():
            preset = gr.Dropdown(label=i18n("Preset"), choices=list_presets())
            apply_preset = gr.Button(i18n("Apply Preset"))
        with gr.Accordion(i18n("Advanced Settings"), open=False):
            pitch = gr.Slider(-24, 24, 0, step=1, label=i18n("Pitch"))
            index_rate = gr.Slider(0, 1, 0.3, label=i18n("Search Feature Ratio"))
            protect = gr.Slider(0, 0.5, 0.33, label=i18n("Protect Voiceless Consonants"))
            volume_env = gr.Slider(0, 1, 1.0, label=i18n("Volume Envelope"))
            f0_method = gr.Radio(
                ["rmvpe", "fcpe", "crepe", "crepe-tiny", "yin"],
                value="rmvpe", label=i18n("Pitch extraction algorithm"),
            )
            autotune = gr.Checkbox(False, label=i18n("Autotune"))
            clean = gr.Checkbox(False, label=i18n("Clean Audio"))
            clean_strength = gr.Slider(0, 1, 0.7, label=i18n("Clean Strength"))
            split = gr.Checkbox(False, label=i18n("Split Audio"))
        def do_apply_preset(name):
            if not name:
                return [gr.update()] * 6
            pr = load_preset(name)
            return [
                gr.update(value=pr.get("pitch", 0)),
                gr.update(value=pr.get("index_rate", 0.3)),
                gr.update(value=pr.get("protect", 0.33)),
                gr.update(value=pr.get("volume_envelope", 1.0)),
                gr.update(value=pr.get("f0_method", "rmvpe")),
                gr.update(value=pr.get("clean_audio", False)),
            ]

        apply_preset.click(
            do_apply_preset, [preset],
            [pitch, index_rate, protect, volume_env, f0_method, clean],
        )

        convert_btn = gr.Button(i18n("Convert"))
        audio_out = gr.Audio(label=i18n("Export Audio"))

        def do_convert(path, mdl, idx, p, ir, prot, ve, f0m, at, cl, cs, sp):
            out = os.path.join("logs", "ui_output.wav")
            vc.convert_audio(
                audio_input_path=path, audio_output_path=out, model_path=mdl,
                index_path=idx or "", pitch=int(p), index_rate=ir,
                protect=prot, volume_envelope=ve, f0_method=f0m,
                f0_autotune=at, clean_audio=cl, clean_strength=cs,
                split_audio=sp,
            )
            return out

        convert_btn.click(
            do_convert,
            [audio_in, model, index, pitch, index_rate, protect, volume_env,
             f0_method, autotune, clean, clean_strength, split],
            [audio_out],
        )

    with gr.Tab(i18n("Batch")):
        in_folder = gr.Textbox(label=i18n("Input Folder"))
        out_folder = gr.Textbox(label=i18n("Output Folder"))
        batch_btn = gr.Button(i18n("Convert"))
        status = gr.Textbox(label=i18n("Output Information"))

        def do_batch(inf, outf, mdl, idx):
            vc.convert_audio_batch(
                audio_input_paths=inf, audio_output_path=outf,
                model_path=mdl, index_path=idx or "",
            )
            return f"batch complete -> {outf}"

        batch_btn.click(do_batch, [in_folder, out_folder, model, index], [status])

    refresh.click(
        lambda: (gr.update(choices=_model_choices()),
                 gr.update(choices=_index_choices())),
        [], [model, index],
    )


def train_tab(gr, i18n):
    model_name = gr.Textbox(label=i18n("Model Name"), value="my-voice")
    sample_rate = gr.Radio([32000, 40000, 48000], value=48000,
                           label=i18n("Sample Rate"))
    vocoder = gr.Radio(["HiFi-GAN", "MRF HiFi-GAN", "RefineGAN"],
                       value="HiFi-GAN", label=i18n("Vocoder"))

    with gr.Accordion(i18n("Preprocess")):
        dataset = gr.Textbox(label=i18n("Dataset Path"))
        cut_mode = gr.Radio(["Skip", "Simple", "Automatic"], value="Automatic",
                            label=i18n("Audio cutting"))
        pre_btn = gr.Button(i18n("Preprocess Dataset"))
        pre_out = gr.Textbox(label=i18n("Output Information"))

        def do_pre(name, ds, sr, cm):
            from ..train.preprocess import preprocess_training_set

            hours = preprocess_training_set(
                ds, int(sr), os.path.join("logs", name), cut_preprocess=cm
            )
            return f"preprocessed {hours:.2f} h"

        pre_btn.click(do_pre, [model_name, dataset, sample_rate, cut_mode], [pre_out])

    with gr.Accordion(i18n("Extract")):
        f0_method = gr.Radio(["rmvpe", "fcpe", "crepe", "yin"], value="rmvpe",
                             label=i18n("Pitch extraction algorithm"))
        ext_btn = gr.Button(i18n("Extract Features"))
        ext_out = gr.Textbox(label=i18n("Output Information"))

        def do_ext(name, sr, f0m):
            from ..train.extract import run_extraction

            run_extraction(os.path.join("logs", name), f0_method=f0m,
                           sample_rate=int(sr))
            return "extraction complete"

        ext_btn.click(do_ext, [model_name, sample_rate, f0_method], [ext_out])

    with gr.Accordion(i18n("Train")):
        epochs = gr.Slider(1, 1000, 200, step=1, label=i18n("Total Epoch"))
        batch = gr.Slider(1, 64, 8, step=1, label=i18n("Batch Size"))
        save_every = gr.Slider(1, 100, 10, step=1, label=i18n("Save Every Epoch"))
        train_btn = gr.Button(i18n("Start Training"))
        idx_btn = gr.Button(i18n("Generate Index"))
        train_out = gr.Textbox(label=i18n("Output Information"))

        def do_train(name, sr, voc, ep, bs, se):
            from ..cli import main as cli_main

            cli_main([
                "train", "--model_name", name, "--sample_rate", str(int(sr)),
                "--vocoder", voc, "--total_epoch", str(int(ep)),
                "--batch_size", str(int(bs)), "--save_every_epoch", str(int(se)),
            ])
            return "training finished"

        def do_index(name):
            from ..train.index_builder import build_index

            return build_index(os.path.join("logs", name))

        train_btn.click(do_train,
                        [model_name, sample_rate, vocoder, epochs, batch,
                         save_every], [train_out])
        idx_btn.click(do_index, [model_name], [train_out])


def tts_tab(gr, i18n):
    text = gr.Textbox(label=i18n("Text to Synthesize"), lines=3)
    voice = gr.Textbox(label=i18n("TTS Voices"), value="en-US-AriaNeural")
    rate = gr.Slider(-100, 100, 0, step=1, label=i18n("TTS Speed"))
    model = gr.Dropdown(label=i18n("Voice Model"), choices=_model_choices())
    btn = gr.Button(i18n("Convert"))
    out = gr.Audio(label=i18n("Export Audio"))

    def do_tts(t, v, r, mdl):
        from ..utils.tts import run_tts
        from ..infer.converter import VoiceConverter

        tts_path = os.path.join("logs", "tts_raw.wav")
        out_path = os.path.join("logs", "tts_output.wav")
        run_tts(t, v, int(r), tts_path)
        VoiceConverter().convert_audio(
            audio_input_path=tts_path, audio_output_path=out_path,
            model_path=mdl,
        )
        return out_path

    btn.click(do_tts, [text, voice, rate, model], [out])


def voice_blender_tab(gr, i18n):
    name = gr.Textbox(label=i18n("Model Name"), value="blend")
    a = gr.Dropdown(label=i18n("Drag and drop your model here"),
                    choices=_model_choices())
    b = gr.Dropdown(label=i18n("You can also use a custom path"),
                    choices=_model_choices())
    ratio = gr.Slider(0, 1, 0.5, label=i18n("Blend Ratio"))
    btn = gr.Button(i18n("Fusion"))
    out = gr.Textbox(label=i18n("Output Information"))

    def do_blend(n, pa, pb, r):
        from ..utils.model_tools import model_blender

        return model_blender(n, pa, pb, r)

    btn.click(do_blend, [name, a, b, ratio], [out])


def download_tab(gr, i18n):
    link = gr.Textbox(label=i18n("Model Link"))
    btn = gr.Button(i18n("Download Model"))
    out = gr.Textbox(label=i18n("Output Information"))

    def do_download(l):
        from ..utils.downloads import model_download_pipeline

        try:
            return model_download_pipeline(l)
        except RuntimeError as e:
            return str(e)

    btn.click(do_download, [link], [out])


def utilities_tab(gr, i18n):
    with gr.Accordion(i18n("Audio Analyzer")):
        audio = gr.Audio(label=i18n("Upload Audio"), type="filepath")
        btn = gr.Button(i18n("Get information about the audio"))
        info = gr.JSON(label=i18n("Output Information"))
        plot = gr.Image(label=i18n("Plot"))

        def do_analyze(path):
            from ..utils.analyzer import analyze_audio

            stats, plot_path = analyze_audio(
                path, save_plot_path=os.path.join("logs", "analysis.png")
            )
            return stats, plot_path

        btn.click(do_analyze, [audio], [info, plot])

    with gr.Accordion(i18n("F0 Curve")):
        audio2 = gr.Audio(label=i18n("Upload Audio"), type="filepath")
        method = gr.Radio(["rmvpe", "fcpe", "yin"], value="rmvpe",
                          label=i18n("Pitch extraction algorithm"))
        btn2 = gr.Button(i18n("Extract F0 Curve"))
        plot2 = gr.Image(label=i18n("Plot"))

        def do_f0(path, m):
            from ..predictors.f0_extractor import F0Extractor

            ex = F0Extractor(path, method=m)
            return ex.plot_f0(save_path=os.path.join("logs", "f0.png"))

        btn2.click(do_f0, [audio2, method], [plot2])


def settings_tab(gr, i18n):
    from .i18n import I18nAuto

    lang = gr.Dropdown(
        label=i18n("Language"),
        choices=["auto"] + I18nAuto().available_languages(),
        value="auto",
    )
    precision = gr.Radio(["bf16", "fp32"], value="bf16", label=i18n("Precision"))
    author = gr.Textbox(label=i18n("Model Author"))
    out = gr.Textbox(label=i18n("Output Information"))
    save = gr.Button(i18n("Save Settings"))

    def do_save(l, p, a):
        cfg_path = os.path.join("logs", "ui_config.json")
        os.makedirs("logs", exist_ok=True)
        with open(cfg_path, "w") as f:
            json.dump({"language": l, "precision": p, "author": a}, f, indent=2)
        return f"saved to {cfg_path} (restart the UI to apply the language)"

    save.click(do_save, [lang, precision, author], [out])
