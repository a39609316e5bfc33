"""Client for the OpenAI-compatible server: speech synthesis + voice chat
(reference example: examples/use_openai_server.py).

Start the server first:
    python -m auralis_tpu.entrypoints.oai_server --model <dir> --port 8000
"""
import argparse
import asyncio
import base64
import json
from pathlib import Path

import aiohttp


async def speech(base_url: str, speaker: str, text: str, out: str) -> None:
    voice = base64.b64encode(Path(speaker).read_bytes()).decode()
    async with aiohttp.ClientSession() as session:
        async with session.post(
            f"{base_url}/v1/audio/speech",
            json={
                "input": text,
                "model": "xttsv2",
                "voice": [voice],
                "response_format": "wav",
            },
        ) as resp:
            resp.raise_for_status()
            Path(out).write_bytes(await resp.read())
    print(f"wrote {out}")


async def voice_chat(base_url: str, speaker: str, llm_url: str, prompt: str) -> None:
    voice = base64.b64encode(Path(speaker).read_bytes()).decode()
    audio_chunks = 0
    async with aiohttp.ClientSession() as session:
        async with session.post(
            f"{base_url}/v1/chat/completions",
            json={
                "model": "any-llm",
                "messages": [{"role": "user", "content": prompt}],
                "speaker_files": [voice],
                "openai_api_url": llm_url,
                "vocalize_at_every_n_words": 40,
            },
        ) as resp:
            async for raw in resp.content:
                line = raw.decode().strip()
                if not line.startswith("data:"):
                    continue
                data = line[5:].strip()
                if data == "[DONE]":
                    break
                event = json.loads(data)
                if event.get("object") == "audio.chunk":
                    audio_chunks += 1
                    Path(f"chat_audio_{audio_chunks}.wav").write_bytes(
                        base64.b64decode(event["data"])
                    )
                else:
                    delta = event.get("choices", [{}])[0].get("delta", {}).get("content")
                    if delta:
                        print(delta, end="", flush=True)
    print(f"\n{audio_chunks} audio chunks written")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--url", default="http://127.0.0.1:8000")
    ap.add_argument("--speaker", required=True)
    ap.add_argument("--text", default="Hello from the auralis TPU server!")
    ap.add_argument("--llm-url", default=None, help="upstream OpenAI-compatible LLM")
    ap.add_argument("--out", default="server_out.wav")
    args = ap.parse_args()

    asyncio.run(speech(args.url, args.speaker, args.text, args.out))
    if args.llm_url:
        asyncio.run(voice_chat(args.url, args.speaker, args.llm_url, args.text))
