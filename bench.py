"""Benchmark: real-time factor of the full-size XTTSv2 pipeline on one chip.

Runs the complete public path (TTS facade -> scheduler -> conditioning ->
continuous-batched decode -> vocoder) with the production architecture
(30L/1024d GPT, full HiFi-GAN) and random weights (no checkpoint ships with
this environment; compute cost is weight-value-independent).

Workload: BASELINE config 4 style — a batch of text chunks at
scheduler_max_concurrency=8. Metric: RTF = wall_time / seconds_of_audio.
Reference headline: RTF ~= 0.02 on an RTX 3090 (README.md:11).
`vs_baseline` = baseline_rtf / our_rtf (>1 means faster than the reference).

Prints exactly one JSON line.
"""
from __future__ import annotations

import asyncio
import json
import sys
import time

import numpy as np


BASELINE_RTF = 0.02
CONCURRENCY = 8
N_CHUNKS = 16  # text chunks in flight across requests


def build_engine():
    import jax
    import jax.numpy as jnp

    from auralis_tpu.models.xttsv2.config import XTTSConfig
    from auralis_tpu.models.xttsv2.engine import XTTSv2Engine
    from tokenizers import Tokenizer, models, trainers

    from auralis_tpu.frontend.tokenizer import TTSTokenizer

    tok = Tokenizer(models.BPE(unk_token="[UNK]"))
    trainer = trainers.BpeTrainer(
        vocab_size=3000,
        special_tokens=["[PAD]", "[UNK]", "[START]", "[STOP]", "[SPACE]", "[en]"],
    )
    words = ["the", "quick", "brown", "fox", "jumps", "over", "lazy", "dog",
             "voice", "cloning", "speech", "synthesis", "tensor", "processing"]
    corpus = ["[SPACE]".join(words), "abcdefghijklmnopqrstuvwxyz.,!?'0123456789"]
    tok.train_from_iterator(corpus, trainer)
    tokenizer = TTSTokenizer(tok)

    cfg = XTTSConfig()  # production architecture
    engine = XTTSv2Engine.random_init(
        config=cfg,
        tokenizer=tokenizer,
        dtype=jnp.bfloat16,
        max_concurrency=CONCURRENCY,
        decode_slots=32,  # ~4 GiB KV; chunk-level parallelism beyond requests
        steps_per_sync=32,
    )
    return engine, cfg


def main() -> None:
    from auralis_tpu import TTS, TTSRequest
    from auralis_tpu.common import audio_io

    engine, cfg = build_engine()
    tts = TTS(scheduler_max_concurrency=CONCURRENCY).with_engine(engine)

    # synthetic speaker reference (6 s, covers one conditioning chunk)
    sr = 22050
    t = np.arange(sr * 6) / sr
    speaker = (0.5 * np.sin(2 * np.pi * 210 * t) * (0.8 + 0.2 * np.sin(2 * np.pi * 3 * t))).astype(
        np.float32
    )
    audio_io.write_wav("/tmp/bench_speaker.wav", speaker, sr)

    sentence = (
        "the quick brown fox jumps over the lazy dog while voice cloning "
        "speech synthesis runs on tensor processing hardware. "
    )
    chunk_text = (sentence * 3)[:240]  # one ~240-char chunk each
    texts = [chunk_text] * N_CHUNKS

    def make_requests():
        return [
            TTSRequest(
                text=txt, speaker_files=["/tmp/bench_speaker.wav"], language="en",
                temperature=0.75, top_p=0.85, top_k=50, repetition_penalty=5.0,
            )
            for txt in texts
        ]

    async def run_batch(requests):
        outs = await asyncio.gather(*(tts.generate_speech_async(r) for r in requests))
        return outs

    # warmup: compile every program (prefill bucket, decode, vocoder buckets,
    # conditioning, speaker encoder)
    tts.loop.run_until_complete(run_batch(make_requests()[:2]))

    t0 = time.time()
    outs = tts.loop.run_until_complete(run_batch(make_requests()))
    wall = time.time() - t0

    audio_seconds = sum(len(o.array) for o in outs) / 24000.0
    rtf = wall / max(audio_seconds, 1e-9)
    tts.loop.run_until_complete(tts.shutdown())

    print(
        json.dumps(
            {
                "metric": "full-pipeline RTF (wall / generated-audio-seconds), "
                f"{N_CHUNKS} chunks @ concurrency {CONCURRENCY}, 30L GPT + HiFi-GAN",
                "value": round(rtf, 5),
                "unit": "x realtime",
                "vs_baseline": round(BASELINE_RTF / rtf, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
