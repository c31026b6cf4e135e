"""Tokenizer unit tests (mirroring the spirit of `token.rs:509-771`)."""

import pytest

from osm_renderer_tpu.core.color import Color
from osm_renderer_tpu.mapcss import MapcssError
from osm_renderer_tpu.mapcss.token import TokKind, Tokenizer


def toks(text):
    return [t.token for t in Tokenizer(text)]


def kinds(text):
    return [t.kind for t in toks_with(text)]


def toks_with(text):
    return toks(text)


def test_basic_rule_tokens():
    ts = toks('way|z12-14[highway=primary] { width: 2.5; color: #abc; }')
    assert ts[0].kind == TokKind.IDENTIFIER and ts[0].value == "way"
    assert ts[1].kind == TokKind.ZOOM_RANGE and ts[1].value == (12, 14)
    assert ts[2].kind == TokKind.LEFT_BRACKET
    assert [t.value for t in ts if t.kind == TokKind.NUMBER] == [2.5]
    colors = [t.value for t in ts if t.kind == TokKind.COLOR]
    assert colors == [Color(0xAA, 0xBB, 0xCC)]


def test_zoom_range_forms():
    assert toks("|z12")[0].value == (12, 12)
    assert toks("|z12-")[0].value == (12, None)
    assert toks("|z-14")[0].value == (None, 14)
    assert toks("|z3-18")[0].value == (3, 18)


def test_numbers():
    vals = [t.value for t in toks("1 2.5 -3 +4 .5 -0.25")]
    assert vals == [1.0, 2.5, -3.0, 4.0, 0.5, -0.25]


def test_identifiers_with_specials():
    ts = toks("highway_link addr:housenumber x-y a.b c/d *")
    # ':' splits into identifier + colon + identifier
    assert ts[0].value == "highway_link"
    assert ts[1].value == "addr"
    assert ts[2].kind == TokKind.COLON
    assert ts[3].value == "housenumber"
    assert ts[4].value == "x-y"
    assert ts[5].value == "a.b"
    assert ts[6].value == "c/d"
    assert ts[7].value == "*"


def test_comments_and_strings():
    ts = toks('a // line comment\n /* block\n comment */ "str" b')
    assert [t.value for t in ts] == ["a", "str", "b"]


def test_color_refs_and_import():
    ts = toks('@water: #012345; @import("file.mapcss");')
    assert ts[0].kind == TokKind.COLOR_REF and ts[0].value == "water"
    assert ts[2].kind == TokKind.COLOR and ts[2].value == Color(0x01, 0x23, 0x45)
    imp = [t for t in ts if t.kind == TokKind.IMPORT]
    assert imp and imp[0].value == "file.mapcss"


@pytest.mark.parametrize(
    "bad",
    [
        '"unterminated',
        "/* unterminated block",
        "#12",        # invalid hex color length
        "|zz",        # malformed zoom range
        "|z",         # zoom range without levels
        "1.",         # no digit after dot
        "- ",         # dangling minus
        "@ x",        # bad at-directive
        "^",          # unexpected symbol
    ],
)
def test_lexer_errors(bad):
    with pytest.raises(MapcssError):
        toks(bad)


def test_comparison_operators():
    ks = [t.kind for t in toks("= != < <= > >= =~ :: : ; , ? !")]
    assert ks == [
        TokKind.EQUAL, TokKind.NOT_EQUAL, TokKind.LESS, TokKind.LESS_OR_EQUAL,
        TokKind.GREATER, TokKind.GREATER_OR_EQUAL, TokKind.REGEX_MATCH,
        TokKind.DOUBLE_COLON, TokKind.COLON, TokKind.SEMI_COLON, TokKind.COMMA,
        TokKind.QUESTION_MARK, TokKind.BANG,
    ]
