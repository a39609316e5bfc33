"""Chinese numeral normalization: digits -> spoken hanzi.

Capability parity with the reference's zh_num2words TextNorm (reference:
components/tts/layers/xtts/zh_num2words.py) for the cases TTS text actually
hits: integers, decimals, percentages, fractions, ranges, phone-like digit
strings and years. Implemented fresh and compactly.
"""
from __future__ import annotations

import re

_DIGITS = "零一二三四五六七八九"
_UNITS = ["", "十", "百", "千"]
_GROUPS = ["", "万", "亿", "万亿"]


def _four_digits(n: int) -> str:
    """0-9999 -> hanzi with correct 零 insertion."""
    if n == 0:
        return ""
    out = []
    need_zero = False
    for i in range(3, -1, -1):
        d = (n // 10**i) % 10
        if d == 0:
            if out:
                need_zero = True
            continue
        if need_zero:
            out.append("零")
            need_zero = False
        if d == 1 and i == 1 and not out:
            out.append("十")  # 10-19: 十X not 一十X
        else:
            out.append(_DIGITS[d] + _UNITS[i])
    return "".join(out)


def int_to_hanzi(n: int) -> str:
    if n < 0:
        return "负" + int_to_hanzi(-n)
    if n == 0:
        return "零"
    groups = []
    while n > 0:
        n, g = divmod(n, 10000)
        groups.append(g)
    out = []
    for i in range(len(groups) - 1, -1, -1):
        g = groups[i]
        if g == 0:
            continue
        piece = _four_digits(g) + _GROUPS[i]
        # a group below 1000 after a higher group needs a leading 零
        if out and g < 1000:
            piece = "零" + piece
        out.append(piece)
    return "".join(out)


def digits_to_hanzi(s: str) -> str:
    """Digit-by-digit reading (phone numbers, years); 1 read as 幺 is a
    telephony convention we skip — TTS prefers 一."""
    return "".join(_DIGITS[int(c)] if c.isdigit() else c for c in s)


def decimal_to_hanzi(s: str) -> str:
    if "." in s:
        int_part, frac = s.split(".", 1)
        return int_to_hanzi(int(int_part or 0)) + "点" + digits_to_hanzi(frac)
    return int_to_hanzi(int(s))


_PERCENT_RE = re.compile(r"(\d+(?:\.\d+)?)\s*%")
_FRACTION_RE = re.compile(r"(\d+)\s*/\s*(\d+)")
_RANGE_RE = re.compile(r"(\d+(?:\.\d+)?)\s*[-~—]\s*(\d+(?:\.\d+)?)")
_YEAR_RE = re.compile(r"(\d{4})\s*年")
_PHONE_RE = re.compile(r"\d{7,}")
_NUMBER_RE = re.compile(r"\d+(?:,\d{3})*(?:\.\d+)?")


class TextNorm:
    """Callable normalizer: replaces every numeric pattern in the text with
    its spoken hanzi form (same call signature as the reference class)."""

    def __call__(self, text: str) -> str:
        text = _YEAR_RE.sub(lambda m: digits_to_hanzi(m.group(1)) + "年", text)
        text = _PERCENT_RE.sub(lambda m: "百分之" + decimal_to_hanzi(m.group(1)), text)
        text = _FRACTION_RE.sub(
            lambda m: int_to_hanzi(int(m.group(2))) + "分之" + int_to_hanzi(int(m.group(1))), text
        )
        text = _RANGE_RE.sub(
            lambda m: decimal_to_hanzi(m.group(1)) + "到" + decimal_to_hanzi(m.group(2)), text
        )
        text = _PHONE_RE.sub(lambda m: digits_to_hanzi(m.group(0)), text)
        text = _NUMBER_RE.sub(lambda m: decimal_to_hanzi(m.group(0).replace(",", "")), text)
        return text
