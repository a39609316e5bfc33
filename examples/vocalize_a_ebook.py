"""Vocalize an entire e-book (epub or plain text) with streamed, ordered
output — the full-novel workload behind the headline RTF number
(reference example: examples/vocalize_a_ebook.py; BASELINE config 4).

The epub reader here is first-party (an .epub is a zip of xhtml documents;
no ebooklib in this environment).
"""
import argparse
import html.parser
import time
import zipfile
from pathlib import Path

from auralis_tpu import TTS, TTSRequest
from auralis_tpu.common.output import TTSOutput


class _TextExtractor(html.parser.HTMLParser):
    SKIP = {"script", "style", "head", "title"}

    def __init__(self):
        super().__init__()
        self._skip_depth = 0
        self.parts: list[str] = []

    def handle_starttag(self, tag, attrs):
        if tag in self.SKIP:
            self._skip_depth += 1
        elif tag in ("p", "br", "div", "h1", "h2", "h3", "li"):
            self.parts.append("\n")

    def handle_endtag(self, tag):
        if tag in self.SKIP and self._skip_depth:
            self._skip_depth -= 1

    def handle_data(self, data):
        if not self._skip_depth:
            self.parts.append(data)


def read_book(path: str) -> str:
    path = Path(path)
    if path.suffix.lower() == ".epub":
        texts = []
        with zipfile.ZipFile(path) as zf:
            docs = sorted(
                n for n in zf.namelist() if n.lower().endswith((".xhtml", ".html", ".htm"))
            )
            for name in docs:
                parser = _TextExtractor()
                parser.feed(zf.read(name).decode("utf-8", errors="ignore"))
                texts.append("".join(parser.parts))
        return "\n".join(texts)
    return path.read_text(errors="ignore")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--speaker", required=True)
    ap.add_argument("--book", required=True, help=".epub or .txt")
    ap.add_argument("--out", default="audiobook.wav")
    ap.add_argument("--concurrency", type=int, default=8)
    args = ap.parse_args()

    text = read_book(args.book)
    print(f"book: {len(text)} characters")

    tts = TTS(scheduler_max_concurrency=args.concurrency).from_pretrained(args.model)
    request = TTSRequest(text=text, speaker_files=[args.speaker], stream=True)

    chunks, t0 = [], time.time()
    for i, chunk in enumerate(tts.generate_speech(request)):
        chunks.append(chunk)
        done_s = sum(len(c.array) for c in chunks) / 24000.0
        wall = time.time() - t0
        print(f"chunk {i:4d} | {done_s:8.1f}s audio | RTF {wall / max(done_s, 1e-9):.4f}")

    TTSOutput.combine_outputs(chunks).save(args.out)
    print(f"wrote {args.out} ({sum(len(c.array) for c in chunks) / 24000.0:.1f}s)")


if __name__ == "__main__":
    main()
