"""Number-verbalization tests (spot values chosen from well-known grammar)."""
import pytest

from auralis_tpu.frontend import numwords as nw


@pytest.mark.parametrize(
    "n,lang,expected",
    [
        (0, "en", "zero"),
        (21, "en", "twenty-one"),
        (105, "en", "one hundred and five"),
        (1005, "en", "one thousand and five"),
        (1105, "en", "one thousand, one hundred and five"),
        (1000000, "en", "one million"),
        (-7, "en", "minus seven"),
        (21, "es", "veintiuno"),
        (31, "es", "treinta y uno"),
        (100, "es", "cien"),
        (101, "es", "ciento uno"),
        (500, "es", "quinientos"),
        (1000, "es", "mil"),
        (2000, "es", "dos mil"),
        (1000000, "es", "un millón"),
        (71, "fr", "soixante et onze"),
        (80, "fr", "quatre-vingts"),
        (81, "fr", "quatre-vingt-un"),
        (91, "fr", "quatre-vingt-onze"),
        (100, "fr", "cent"),
        (200, "fr", "deux cents"),
        (201, "fr", "deux cent un"),
        (1000, "fr", "mille"),
        (21, "de", "einundzwanzig"),
        (101, "de", "einhunderteins"),
        (1000, "de", "eintausend"),
        (2021, "de", "zweitausendeinundzwanzig"),
        (21, "it", "ventuno"),
        (23, "it", "ventitré"),
        (28, "it", "ventotto"),
        (100, "it", "cento"),
        (1000, "it", "mille"),
        (2000, "it", "duemila"),
        (21, "pt", "vinte e um"),
        (100, "pt", "cem"),
        (101, "pt", "cento e um"),
        (1000, "pt", "mil"),
        (21, "nl", "eenentwintig"),
        (33, "nl", "drieëndertig"),
        (100, "nl", "honderd"),
        (21, "tr", "yirmi bir"),
        (100, "tr", "yüz"),
        (200, "tr", "iki yüz"),
        (1000, "tr", "bin"),
        (21, "hu", "huszonegy"),
        (100, "hu", "száz"),
        (21, "ru", "двадцать один"),
        (1000, "ru", "одна тысяча"),
        (2000, "ru", "две тысячи"),
        (5000, "ru", "пять тысяч"),
        (100, "pl", "sto"),
        (2000, "pl", "dwa tysiące"),
        (5000, "pl", "pięć tysięcy"),
        (200, "cs", "dvě stě"),
        (21, "ko", "이십일"),
        (100, "ko", "백"),
        (10000, "ko", "일만"),
    ],
)
def test_cardinal(n, lang, expected):
    assert nw.cardinal(n, lang) == expected


@pytest.mark.parametrize(
    "n,lang,expected",
    [
        (1, "en", "first"),
        (2, "en", "second"),
        (3, "en", "third"),
        (12, "en", "twelfth"),
        (20, "en", "twentieth"),
        (21, "en", "twenty-first"),
        (100, "en", "one hundredth"),
        (1, "fr", "premier"),
        (2, "fr", "deuxième"),
        (4, "fr", "quatrième"),
        (5, "fr", "cinquième"),
        (9, "fr", "neuvième"),
        (1, "de", "erste"),
        (3, "de", "dritte"),
        (4, "de", "vierte"),
        (20, "de", "zwanzigste"),
        (1, "es", "primero"),
        (3, "es", "tercero"),
        (1, "it", "primo"),
        (11, "it", "undicesimo"),
    ],
)
def test_ordinal(n, lang, expected):
    assert nw.ordinal(n, lang) == expected


def test_decimal():
    assert nw.decimal(3.14, "en") == "three point one four"
    assert nw.decimal(3.14, "es") == "tres coma uno cuatro"
    assert nw.decimal(2.5, "de") == "zwei Komma fünf"


def test_currency():
    assert nw.currency(3.14, "USD", "en") == "three dollars, fourteen cents"
    assert nw.currency(1.0, "USD", "en") == "one dollar"
    assert nw.currency(2.5, "EUR", "es") == "dos euros con cincuenta céntimos"
    assert nw.currency(5.0, "GBP", "en") == "five pounds"


def test_fallback_digits():
    # Arabic falls back to digit-by-digit reading
    assert nw.cardinal(12, "ar") == "واحد اثنان"
    # unknown language falls back to English
    assert nw.cardinal(12, "xx") == "twelve"
