"""Clone your voice into another language (parity with the reference's
examples/translate_yourself.py): feed Japanese text plus a recording of your
own voice, get the Japanese speech spoken in your voice.

The multilingual frontend transliterates Japanese to romaji and prefixes the
[ja] language token; the speaker conditioning carries your voice.
"""
from auralis_tpu import TTS, TTSRequest

# point at a local dual-safetensors checkpoint directory (see
# auralis_tpu.entrypoints.convert_checkpoint for Coqui .pth conversion)
tts = TTS(scheduler_max_concurrency=12).from_pretrained(
    "./checkpoints/xttsv2", gpt_model="./checkpoints/xtts2-gpt"
)

request = TTSRequest(
    text="愛しい彼女へ "
         "あなたの笑顔は私の人生を照らす光です。"
         "毎日あなたと過ごせることが私の幸せです。"
         "あなたは私の心の中で一番大切な人です。"
         "いつも一緒にいてくれて、"
         "ありがとう。"
         "愛を込めて",
    speaker_files=["your_voice.wav"],
    language="ja",  # or "auto" to detect from the text
)

output = tts.generate_speech(request)

output.save("translated_me.wav")
output.play()  # needs the optional `sounddevice` package
