"""First-party language identification for the 17 supported languages.

Replaces the reference's `langid` dependency (reference:
common/definitions/requests.py:96-113). Two stages:

1. Script detection — CJK / kana / hangul / cyrillic / arabic / devanagari
   uniquely identify zh-cn, ja, ko, ru, ar, hi.
2. Latin-script languages are scored with stopword/diacritic evidence
   (function words are the highest-signal, lowest-memory discriminator).

Returns ISO codes used by the model config ("zh-cn" for Chinese).
"""
from __future__ import annotations

import re
from functools import lru_cache

# High-frequency function words / markers per Latin-script language.
_STOPWORDS: dict[str, set[str]] = {
    "en": {"the", "and", "of", "to", "in", "is", "it", "you", "that", "was", "for",
           "are", "with", "his", "they", "this", "have", "from", "not", "she", "he",
           "will", "would", "there", "their", "what", "about", "which"},
    "es": {"el", "la", "de", "que", "y", "en", "un", "una", "es", "se", "no", "por",
           "con", "para", "los", "las", "del", "su", "al", "lo", "como", "más",
           "pero", "sus", "le", "ya", "o", "este", "sí", "porque", "esta", "entre"},
    "fr": {"le", "la", "de", "et", "les", "des", "est", "un", "une", "du", "que",
           "qui", "dans", "pour", "pas", "sur", "vous", "avec", "son", "ne", "se",
           "ce", "il", "elle", "au", "plus", "par", "mais", "nous", "je", "tout"},
    "de": {"der", "die", "und", "das", "ist", "in", "den", "von", "zu", "mit",
           "sich", "des", "auf", "für", "nicht", "ein", "eine", "als", "auch", "es",
           "an", "werden", "aus", "er", "hat", "dass", "sie", "nach", "wird", "bei"},
    "it": {"il", "di", "che", "la", "è", "e", "un", "una", "per", "in", "non", "sono",
           "con", "si", "del", "le", "gli", "della", "ma", "come", "più", "anche",
           "lo", "questo", "ha", "hanno", "nel", "alla", "essere", "questa"},
    "pt": {"o", "a", "de", "que", "e", "do", "da", "em", "um", "para", "é", "com",
           "não", "uma", "os", "no", "se", "na", "por", "mais", "as", "dos", "como",
           "mas", "foi", "ao", "ele", "das", "tem", "à", "seu", "sua", "ou", "são"},
    "pl": {"w", "i", "na", "z", "do", "to", "że", "się", "nie", "jest", "jak", "po",
           "co", "tak", "za", "od", "ale", "czy", "był", "ma", "przez", "być", "dla",
           "go", "tego", "tym", "już", "tylko", "może", "bardzo", "kiedy"},
    "nl": {"de", "het", "een", "van", "en", "in", "is", "dat", "op", "te", "zijn",
           "met", "voor", "niet", "aan", "er", "ook", "als", "maar", "om", "dan",
           "zou", "wat", "bij", "nog", "naar", "heeft", "hij", "worden", "deze"},
    "tr": {"bir", "ve", "bu", "da", "de", "için", "ile", "mi", "ne", "o", "çok",
           "daha", "gibi", "ama", "ben", "var", "kadar", "sonra", "her", "olarak",
           "en", "diye", "değil", "olan", "iki", "yok", "bana", "beni", "sen"},
    "cs": {"a", "se", "na", "je", "v", "že", "s", "do", "to", "si", "k", "ale",
           "jako", "za", "po", "jsem", "by", "co", "nebo", "tak", "už", "při",
           "před", "být", "jeho", "své", "který", "která", "jsou", "byl", "bylo"},
    "hu": {"a", "az", "és", "hogy", "nem", "is", "egy", "volt", "meg", "csak", "de",
           "ha", "már", "mint", "el", "még", "van", "aki", "ki", "te", "azt", "ezt",
           "vagy", "amely", "lesz", "nagy", "ő", "mert", "minden", "olyan"},
}

_DIACRITIC_HINTS: dict[str, str] = {
    "es": "ñ¿¡",
    "fr": "àâçèéêëîïôùûœ",
    "de": "äöüß",
    "pt": "ãõçáâê",
    "it": "àèéìòù",
    "pl": "ąćęłńóśźż",
    "cs": "čďěňřšťůž",
    "hu": "őű",
    "tr": "ğışİ",
    "nl": "ij",
}

_word_re = re.compile(r"[^\W\d_]+", re.UNICODE)


def _script_counts(text: str) -> dict[str, int]:
    counts = {"han": 0, "kana": 0, "hangul": 0, "cyrillic": 0, "arabic": 0,
              "devanagari": 0, "latin": 0}
    for ch in text:
        o = ord(ch)
        if 0x4E00 <= o <= 0x9FFF or 0x3400 <= o <= 0x4DBF:
            counts["han"] += 1
        elif 0x3040 <= o <= 0x30FF or 0x31F0 <= o <= 0x31FF:
            counts["kana"] += 1
        elif 0xAC00 <= o <= 0xD7AF or 0x1100 <= o <= 0x11FF:
            counts["hangul"] += 1
        elif 0x0400 <= o <= 0x04FF:
            counts["cyrillic"] += 1
        elif 0x0600 <= o <= 0x06FF or 0x0750 <= o <= 0x077F:
            counts["arabic"] += 1
        elif 0x0900 <= o <= 0x097F:
            counts["devanagari"] += 1
        elif (0x41 <= o <= 0x7A) or (0xC0 <= o <= 0x24F):
            counts["latin"] += 1
    return counts


@lru_cache(maxsize=1024)
def detect_language(text: str) -> str:
    """Best-effort language code for `text`; defaults to 'en'."""
    sample = text[:2000]
    sc = _script_counts(sample)
    non_latin = {k: v for k, v in sc.items() if k != "latin" and v > 0}
    if non_latin:
        top = max(non_latin, key=non_latin.get)
        if non_latin[top] >= max(3, sc["latin"] // 4):
            if top == "kana":
                return "ja"
            if top == "han":
                # Han with any kana at all is Japanese
                return "ja" if sc["kana"] > 0 else "zh-cn"
            if top == "hangul":
                return "ko"
            if top == "cyrillic":
                return "ru"
            if top == "arabic":
                return "ar"
            if top == "devanagari":
                return "hi"

    words = [w.lower() for w in _word_re.findall(sample)]
    if not words:
        return "en"
    scores: dict[str, float] = {}
    wordset = words  # keep duplicates — frequency is evidence
    for lang, stop in _STOPWORDS.items():
        hits = sum(1 for w in wordset if w in stop)
        score = hits / len(wordset)
        for ch in _DIACRITIC_HINTS.get(lang, ""):
            if ch in sample:
                score += 0.05
        scores[lang] = score
    best = max(scores, key=scores.get)
    return best if scores[best] > 0 else "en"


# Reference-compatible helper name (requests.py:96 `get_language`)
def get_language(text: str) -> str:
    return detect_language(text)
