"""Full supported-language matrix: every language the reference accepts
(xttsv2_config.py:290-301, 17 languages) must clean, chunk, tokenize with the
right [lang] prefix, and survive number expansion — one sweep test per stage
so a regression names the language that broke."""
import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
from helpers import build_tiny_tokenizer

from typing import get_args

from auralis_tpu.common.requests import SupportedLanguages, TTSRequest
from auralis_tpu.frontend.cleaners import multilingual_cleaners
from auralis_tpu.frontend.sentence import split_text_into_chunks

SAMPLES = {
    "en": "Dr. Smith bought 3 apples for $5 on March 2nd, 1999.",
    "es": "El Sr. García compró 3 manzanas por 5 euros en 1999.",
    "fr": "M. Dupont a acheté 3 pommes pour 5 euros en 1999.",
    "de": "Dr. Müller kaufte 3 Äpfel für 5 Euro im Jahr 1999.",
    "it": "Il Sig. Rossi ha comprato 3 mele per 5 euro nel 1999.",
    "pt": "O Sr. Silva comprou 3 maçãs por 5 euros em 1999.",
    "pl": "Pan Kowalski kupił 3 jabłka za 5 złotych w 1999 roku.",
    "tr": "Bay Yılmaz 1999'da 3 elma aldı.",
    "ru": "Доктор Иванов купил 3 яблока в 1999 году.",
    "nl": "Dhr. Jansen kocht 3 appels voor 5 euro in 1999.",
    "cs": "Pan Novák koupil 3 jablka za 5 korun v roce 1999.",
    "ar": "اشترى الدكتور أحمد 3 تفاحات في عام 1999.",
    "zh-cn": "王先生在1999年买了3个苹果。",
    "hu": "Kovács úr 3 almát vett 1999-ben.",
    "ko": "김 선생님은 1999년에 사과 3개를 샀습니다.",
    "ja": "田中さんは1999年にりんごを3つ買いました。",
    "hi": "डॉक्टर शर्मा ने 1999 में 3 सेब खरीदे।",
}


def test_sample_covers_every_supported_language():
    supported = set(get_args(SupportedLanguages)) - {"auto", ""}
    assert set(SAMPLES) == supported, set(SAMPLES) ^ supported


@pytest.mark.parametrize("lang", sorted(SAMPLES))
def test_cleaners_produce_text(lang):
    out = multilingual_cleaners(SAMPLES[lang], lang)
    assert isinstance(out, str) and out.strip(), f"{lang}: empty after cleaning"
    # digits must be expanded (or transliterated away) for cleaned languages
    assert "1999" not in out or lang in ("ko",), f"{lang}: {out!r}"
    if lang == "hi":
        # Hindi verbalizes through the first-party Indian-system cardinals
        # (3 -> तीन; 1999 -> एक हज़ार नौ सौ निन्यानवे)
        assert "तीन" in out and "एक हज़ार नौ सौ निन्यानवे" in out, out
    if lang == "zh-cn":
        # the full "zh-cn" code must hit the hanzi TextNorm, not the English
        # num2words branch (regression: base-code stripping in cleaners)
        assert "一九九九" in out, f"zh-cn digits read in English: {out!r}"


def test_hindi_grouping_ordinals_decimals():
    """Hindi number conventions: comma grouping (both Western 1,000 and
    Indian-system 1,00,000) reads as a cardinal, NOT as a European decimal;
    dot is the decimal mark; ordinal suffixes reach the irregular table
    (1ला -> पहला) and regular ordinals keep the source suffix's gender
    (21वीं stays feminine)."""
    from auralis_tpu.frontend.cleaners import expand_numbers

    cases = [
        ("उसने 1,000 रुपये दिए", "उसने एक हज़ार रुपये दिए"),
        ("जनसंख्या 1,00,000 है", "जनसंख्या एक लाख है"),
        ("मूल्य 12,34,567 था", "मूल्य बारह लाख चौंतीस हज़ार पाँच सौ सड़सठ था"),
        # Western 3-grouping >= 1M: the Indian rule must NOT partially match
        # ('1,234' would otherwise become a bogus decimal '1234,567')
        ("मूल्य 1,234,567 था", "मूल्य बारह लाख चौंतीस हज़ार पाँच सौ सड़सठ था"),
        ("कुल 12,345,678 हुए", "कुल एक करोड़ तेईस लाख पैंतालीस हज़ार छह सौ अठहत्तर हुए"),
        ("पाई 3.14 है", "पाई तीन दशमलव एक चार है"),
        ("वह 1ला था", "वह पहला था"),
        ("वह 2रा था", "वह दूसरा था"),
        ("वह 6ठा था", "वह छठा था"),
        ("7वां दिन", "सातवाँ दिन"),
        ("21वीं सदी", "इक्कीसवीं सदी"),
    ]
    for src, want in cases:
        assert expand_numbers(src, "hi") == want, (src, expand_numbers(src, "hi"))


@pytest.mark.parametrize("lang", sorted(SAMPLES))
def test_chunking_and_tokenization(lang):
    tok = build_tiny_tokenizer()
    chunks = tok.encode_with_split(SAMPLES[lang], lang)
    assert chunks and all(len(c) > 0 for c in chunks), f"{lang}: no tokens"
    # the [lang] prefix token must lead every chunk (reference
    # tokenizer.py:905-918); zh-cn uses the [zh-cn] token
    prefix_id = tok.tokenizer.token_to_id(f"[{lang}]")
    assert prefix_id is not None, f"[{lang}] missing from tokenizer"
    for c in chunks:
        assert c[0] == prefix_id, f"{lang}: chunk does not start with [{lang}]"


@pytest.mark.parametrize("lang", sorted(SAMPLES))
def test_request_accepts_language(lang, tmp_path):
    from helpers import sine_wav

    wav = sine_wav(tmp_path / f"{lang}.wav")
    req = TTSRequest(text=SAMPLES[lang], speaker_files=[wav], language=lang)
    assert req.language == lang


def test_long_text_chunk_limits_per_language():
    """Per-language char limits bound every chunk (reference
    tokenizer.py:784-789: en 250 ... ja 71)."""
    tok = build_tiny_tokenizer()
    for lang, limit in (("en", 250), ("ja", 71), ("zh-cn", 82), ("ko", 95),
                        ("hi", 180)):
        text = SAMPLES[lang] * 30
        pieces = split_text_into_chunks(text, max_length=tok.char_limits.get(lang, 250))
        assert pieces
        assert all(len(p) <= tok.char_limits.get(lang, 250) + 30 for p in pieces), lang
