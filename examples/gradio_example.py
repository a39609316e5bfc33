"""Gradio web UI for auralis-tpu (parity with the reference's
examples/gradio_example.py): text or e-book input, reference-voice upload,
audio-enhancement toggles, sampling controls, and generation log.

Requires the optional `gradio` package (not shipped in the TPU image):
    pip install gradio ebooklib beautifulsoup4
"""
from __future__ import annotations

import time
import uuid
from pathlib import Path

try:
    import gradio as gr
except ImportError as e:  # pragma: no cover - optional dependency
    raise SystemExit(
        "This example needs the optional 'gradio' package: pip install gradio"
    ) from e

from auralis_tpu import TTS, TTSRequest, AudioPreprocessingConfig, setup_logger

logger = setup_logger(__file__)

MODEL_PATH = "./checkpoints/xttsv2"  # dual-safetensors layout
GPT_MODEL = "./checkpoints/xtts2-gpt"

tts = TTS(scheduler_max_concurrency=4).from_pretrained(
    MODEL_PATH, gpt_model=GPT_MODEL
)
logger.info("Loaded model from %s", MODEL_PATH)

TMP = Path("/tmp/auralis_tpu_gradio")
TMP.mkdir(parents=True, exist_ok=True)

LANGUAGES = ["auto", "en", "es", "fr", "de", "it", "pt", "pl", "tr", "ru",
             "nl", "cs", "ar", "zh-cn", "hu", "ko", "ja", "hi"]


def extract_epub_text(path: str) -> str:
    """Pull plain text out of an .epub (same flow as the reference UI)."""
    try:
        from ebooklib import ITEM_DOCUMENT, epub
        from bs4 import BeautifulSoup
    except ImportError as e:
        raise gr.Error("epub input needs: pip install ebooklib beautifulsoup4") from e
    book = epub.read_epub(path)
    parts = []
    for item in book.get_items_of_type(ITEM_DOCUMENT):
        soup = BeautifulSoup(item.get_content(), "html.parser")
        parts.append(soup.get_text(separator=" ", strip=True))
    return "\n".join(p for p in parts if p)


def generate(
    text, file_input, speaker_audio, language,
    enhance, temperature, top_p, top_k, repetition_penalty, speed,
):
    if file_input is not None:
        p = Path(file_input)
        text = extract_epub_text(str(p)) if p.suffix == ".epub" else p.read_text()
    if not text or not text.strip():
        raise gr.Error("Provide text, a .txt file, or an .epub")
    if speaker_audio is None:
        raise gr.Error("Upload or record a reference voice")

    request = TTSRequest(
        text=text,
        speaker_files=[speaker_audio],
        language=language,
        temperature=temperature,
        top_p=top_p,
        top_k=int(top_k),
        repetition_penalty=repetition_penalty,
        audio_config=AudioPreprocessingConfig(
            normalize=enhance, trim_silence=enhance, enhance_speech=enhance
        ),
    )
    t0 = time.time()
    output = tts.generate_speech(request)
    if speed != 1.0:
        output = output.change_speed(speed)
    took = time.time() - t0
    out_path = TMP / f"{uuid.uuid4().hex}.wav"
    output.save(out_path)
    info = (
        f"{len(output.array) / output.sample_rate:.1f}s of audio in {took:.1f}s "
        f"(RTF {took / max(len(output.array) / output.sample_rate, 1e-9):.3f})"
    )
    return str(out_path), info


with gr.Blocks(title="auralis-tpu — voice-cloning TTS") as demo:
    gr.Markdown("# auralis-tpu\nTPU-native XTTSv2 voice cloning")
    with gr.Row():
        with gr.Column():
            text = gr.Textbox(label="Text", lines=6, placeholder="Type text…")
            file_input = gr.File(
                label="…or upload .txt / .epub", file_types=[".txt", ".epub"]
            )
            speaker = gr.Audio(
                label="Reference voice (3-30 s)", type="filepath",
                sources=["upload", "microphone"],
            )
            language = gr.Dropdown(LANGUAGES, value="auto", label="Language")
            enhance = gr.Checkbox(label="Enhance reference audio", value=False)
            with gr.Accordion("Sampling", open=False):
                temperature = gr.Slider(0.1, 1.5, 0.75, label="Temperature")
                top_p = gr.Slider(0.1, 1.0, 0.85, label="Top-p")
                top_k = gr.Slider(1, 100, 50, step=1, label="Top-k")
                repetition_penalty = gr.Slider(1.0, 10.0, 5.0, label="Repetition penalty")
                speed = gr.Slider(0.5, 2.0, 1.0, label="Playback speed")
            button = gr.Button("Generate", variant="primary")
        with gr.Column():
            audio_out = gr.Audio(label="Generated speech")
            info_out = gr.Textbox(label="Generation info", interactive=False)
    button.click(
        generate,
        [text, file_input, speaker, language, enhance,
         temperature, top_p, top_k, repetition_penalty, speed],
        [audio_out, info_out],
    )

if __name__ == "__main__":
    demo.launch()
