"""Frontend robustness fuzz: arbitrary unicode must never crash the text
pipeline (cleaners -> sentence splitting -> tokenization).

The reference's cleaners assume reasonably well-formed text and its server
passes user input straight through (oai_server.py:65-93) — a production
endpoint sees emoji, RTL scripts, unpaired surrogate-free oddities, control
characters, huge numbers and mixed-language strings. Deterministic seeds
keep the corpus reproducible; the contract is crash-freedom plus basic
output sanity (strings out, token ids within vocab)."""
import random
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_tokenizer

from auralis_tpu.frontend.cleaners import multilingual_cleaners

LANGS = ["en", "es", "de", "fr", "it", "pt", "pl", "nl", "cs", "ru",
         "tr", "hu", "ar", "hi", "zh-cn", "ja", "ko"]

# code-point pools chosen to stress distinct cleaner paths
POOLS = [
    (0x20, 0x7E),        # ASCII incl. digits/punct (number/currency paths)
    (0xA0, 0x2AF),       # Latin-1 + extensions (diacritics)
    (0x400, 0x4FF),      # Cyrillic
    (0x600, 0x6FF),      # Arabic (RTL)
    (0x900, 0x97F),      # Devanagari
    (0x3040, 0x30FF),    # kana
    (0x4E00, 0x51FF),    # CJK ideographs (pinyin/kanji table paths)
    (0xAC00, 0xACFF),    # Hangul syllables
    (0x1F300, 0x1F64F),  # emoji
    (0x0, 0x1F),         # C0 control characters
]


def _rand_text(rng: random.Random, n: int) -> str:
    out = []
    for _ in range(n):
        lo, hi = rng.choice(POOLS)
        out.append(chr(rng.randint(lo, hi)))
        if rng.random() < 0.2:
            out.append(" ")
        if rng.random() < 0.05:
            out.append(rng.choice([".", "!", "?", ",", "$1,234.56", "3°", "42%"]))
    return "".join(out)


@pytest.mark.parametrize("seed", range(8))
def test_cleaners_survive_arbitrary_unicode(seed):
    rng = random.Random(seed)
    for lang in LANGS:
        text = _rand_text(rng, rng.randint(1, 400))
        cleaned = multilingual_cleaners(text, lang)
        assert isinstance(cleaned, str)


@pytest.mark.parametrize("seed", range(4))
def test_tokenizer_pipeline_survives_arbitrary_unicode(seed):
    tok = build_tiny_tokenizer()
    rng = random.Random(100 + seed)
    for lang in ("en", "ja", "zh-cn", "ar"):
        text = _rand_text(rng, rng.randint(1, 300))
        chunks = tok.split_text(text, lang=lang)
        assert isinstance(chunks, list)
        for c in chunks:
            ids = tok.encode(c, lang=lang)
            assert all(0 <= i < tok.vocab_size for i in ids)


def test_edge_inputs():
    tok = build_tiny_tokenizer()
    for text in ("", " ", "\n\t\r", ".", "……", "​‎‏", "🎤" * 50,
                 "9" * 300, "a" * 5000):
        for lang in ("en", "ja"):
            cleaned = multilingual_cleaners(text, lang)
            assert isinstance(cleaned, str)
            chunks = tok.split_text(text, lang=lang)
            assert isinstance(chunks, list)
