"""Basic usage: sync, async and streaming generation.

Mirrors the reference examples' patterns on the TPU-native API. Point
--model at a directory with the dual-safetensors layout (see
auralis_tpu.entrypoints.convert_checkpoint for producing one).
"""
import argparse
import asyncio

from auralis_tpu import TTS, TTSRequest


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--model", required=True)
    parser.add_argument("--speaker", required=True, help="reference voice wav")
    parser.add_argument("--out", default="output.wav")
    args = parser.parse_args()

    tts = TTS(scheduler_max_concurrency=4).from_pretrained(args.model)

    # --- synchronous
    request = TTSRequest(
        text="Hello! This is the TPU-native Auralis rebuild speaking.",
        speaker_files=[args.speaker],
    )
    output = tts.generate_speech(request)
    output.save(args.out)
    print(f"wrote {args.out}: {output.get_info()}")

    # --- synchronous streaming
    stream_req = TTSRequest(
        text="Streaming yields audio chunk by chunk, in text order. "
        "Each sentence arrives as soon as it is vocoded.",
        speaker_files=[args.speaker],
        stream=True,
    )
    for i, chunk in enumerate(tts.generate_speech(stream_req)):
        print(f"chunk {i}: {len(chunk.array)} samples")

    # --- async with several requests in flight
    async def run_async():
        reqs = [
            TTSRequest(text=f"Parallel request number {i}.", speaker_files=[args.speaker])
            for i in range(3)
        ]
        outs = await asyncio.gather(*(tts.generate_speech_async(r) for r in reqs))
        for i, o in enumerate(outs):
            o.save(f"async_{i}.wav")
        await tts.shutdown()

    tts.loop.run_until_complete(run_async())


if __name__ == "__main__":
    main()
