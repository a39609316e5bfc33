"""Language-identification accuracy over an in-repo corpus.

The reference uses the trained `langid` classifier
(common/definitions/requests.py:96-113); our first-party scorer
(frontend/langid.py) must be validated, not assumed: a wrong language
picks the wrong cleaners AND the wrong per-language char limits
(tokenizer.py:22-32), so misdetection audibly corrupts output.

The corpus (langid_corpus.py) holds 22 first-party snippets per language
across all 17 supported languages, mixing short phrases (the hard case:
few stopwords) and full sentences. Current measured accuracy: 374/374.
Thresholds leave slack of 2 misses per language so future profile tuning
doesn't require corpus edits, while still catching real regressions.
"""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent))
from langid_corpus import CORPUS

from auralis_tpu.frontend.langid import detect_language

_NON_LATIN = {"ru", "ar", "hi", "zh-cn", "ja", "ko"}


def test_corpus_covers_all_supported_languages():
    from typing import get_args

    from auralis_tpu.common.requests import SupportedLanguages

    supported = set(get_args(SupportedLanguages)) - {"auto", ""}
    assert set(CORPUS) == supported, set(CORPUS) ^ supported
    for lang, snippets in CORPUS.items():
        assert len(snippets) >= 20, f"{lang}: only {len(snippets)} snippets"


@pytest.mark.parametrize("lang", sorted(CORPUS))
def test_language_detection_accuracy(lang):
    snippets = CORPUS[lang]
    hits = sum(1 for s in snippets if detect_language(s) == lang)
    floor = len(snippets) if lang in _NON_LATIN else len(snippets) - 2
    misses = [(s, detect_language(s)) for s in snippets if detect_language(s) != lang]
    assert hits >= floor, f"{lang}: {hits}/{len(snippets)}; misses: {misses}"


def test_overall_accuracy_floor():
    total = ok = 0
    for lang, snippets in CORPUS.items():
        total += len(snippets)
        ok += sum(1 for s in snippets if detect_language(s) == lang)
    assert ok / total >= 0.97, f"{ok}/{total}"


def test_script_detection_is_exact_even_on_single_words():
    # non-Latin scripts identify from minimal input (reference langid
    # handles these trivially; ours must too)
    for text, want in [
        ("привет", "ru"), ("مرحبا", "ar"), ("नमस्ते", "hi"),
        ("你好", "zh-cn"), ("こんにちは", "ja"), ("안녕하세요", "ko"),
        ("日本語のテキスト", "ja"),  # han + kana = ja, not zh
    ]:
        assert detect_language(text) == want, (text, detect_language(text))
