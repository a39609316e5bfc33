"""First-party zh/ja transliteration tables (frontend/data/): golden
sentence transliterations and the guarantee that no raw han/kanji glyph
survives preprocessing to reach the BPE (reference behavior: pypinyin /
cutlet transliteration, tokenizer.py:727-735 — the XTTS BPE was never
trained on raw CJK ideographs)."""
import re

import pytest

from auralis_tpu.frontend.cleaners import japanese_cleaners, preprocess_text
from auralis_tpu.frontend.transliterate import (
    chinese_to_pinyin,
    ja_kanji_to_kana,
)

HAN = re.compile(r"[㐀-䶿一-鿿]")
KANA = re.compile(r"[぀-ヿ]")


# golden zh transliterations (TONE3, matching pypinyin conventions)
ZH_GOLDEN = [
    ("你好，世界！", "ni3hao3，shi4jie4！"),
    ("我想去北京看长城。", "wo3xiang3qu4bei3jing1kan4chang2cheng2。"),
    ("他在银行工作。", "ta1zai4yin2hang2gong1zuo4。"),
    ("音乐是他的爱好。", "yin1yue4shi4ta1de5ai4hao4。"),
    ("现在是下午三点半。", "xian4zai4shi4xia4wu3san1dian3ban4。"),
    ("这个东西很便宜。", "zhe4ge4dong1xi5hen3pian2yi5。"),
    ("孩子们慢慢长大了。", "hai2zi5men5man4man4zhang3da4le5。"),
]


@pytest.mark.parametrize("src,expected", ZH_GOLDEN)
def test_zh_golden(src, expected):
    assert chinese_to_pinyin(src) == expected


# golden ja readings through the full cleaner (kanji->kana->romaji)
JA_GOLDEN = [
    ("今日はいい天気ですね。", "kyouhaiitenkidesune。"),
    ("明日東京に行きます。", "ashitatoukyouniikimasu。"),
    ("私は日本語を勉強しています。", "watashihanihongoobenkyoushiteimasu。"),
    ("新しい本を読んだ。", "atarashiihonoyonda。"),
    ("彼は毎日働いています。", "karehamainichihataraiteimasu。"),
]


@pytest.mark.parametrize("src,expected", JA_GOLDEN)
def test_ja_golden(src, expected):
    assert japanese_cleaners(src) == expected


def test_ja_kanji_to_kana_leaves_no_kanji():
    out = ja_kanji_to_kana("東京で新聞を読む学生が電車に乗った。")
    assert not HAN.search(out), out
    assert KANA.search(out)


ZH_SENTENCES = [
    "王先生在1999年买了3个苹果。",
    "经济发展与环境保护需要平衡。",
    "科学技术是第一生产力。",
    "互联网改变了人们的交流方式。",
    "请问洗手间在哪里？",
]

JA_SENTENCES = [
    "田中さんは1999年にりんごを3つ買いました。",
    "駅の近くの図書館で音楽の雑誌を借りた。",
    "家族と一緒に晩ご飯を食べました。",
    "飛行機で大阪から北海道へ行く。",
]


@pytest.mark.parametrize("text", ZH_SENTENCES)
def test_no_raw_han_reaches_bpe_zh(text):
    out = preprocess_text(text, "zh-cn")
    assert not HAN.search(out), out
    # the output is pronounceable pinyin, not emptiness
    assert re.search(r"[a-z]+[1-5]", out), out


@pytest.mark.parametrize("text", JA_SENTENCES)
def test_no_raw_kanji_or_kana_reaches_bpe_ja(text):
    out = preprocess_text(text, "ja")
    assert not HAN.search(out), out
    assert not KANA.search(out), out
    assert re.search(r"[a-z]{3,}", out), out


def test_unknown_hanzi_becomes_space_not_passthrough():
    # 龘 (U+9F98) is far outside the embedded table
    out = chinese_to_pinyin("你好龘")
    assert "龘" not in out
    assert out.startswith("ni3hao3")


def test_phrase_overrides_beat_char_defaults():
    # 长 defaults to chang2; in 长大 it must read zhang3
    assert chinese_to_pinyin("长大") == "zhang3da4"
    assert chinese_to_pinyin("长度") == "chang2du4"
    # 行 defaults to xing2; in 银行 it must read hang2
    assert "hang2" in chinese_to_pinyin("银行")
    assert "xing2" in chinese_to_pinyin("行动")


def test_kanji_char_fallback_prefers_standalone_reading():
    # base-table precedence (setdefault) keeps the most-common STANDALONE
    # reading for chars both tables carry: 相 -> そう (not the 首相 on-yomi
    # しょう), 革 -> かわ; compounds still read via WORD_READINGS (首相 ->
    # しゅしょう)
    from auralis_tpu.frontend.data.kanji import CHAR_READINGS, WORD_READINGS

    assert CHAR_READINGS["相"] == "そう"
    assert CHAR_READINGS["革"] == "かわ"
    assert WORD_READINGS["首相"] == "しゅしょう"
