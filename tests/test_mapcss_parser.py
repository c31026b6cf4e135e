"""MapCSS parser golden tests against the reference's canonical AST dump
(mirrors `tests/test_mapcss_parser.rs`).

The fixtures (`mapnik.mapcss`, `mapnik.parsed.canonical`,
`osmosnimki-minimal.mapcss`) are vendored verbatim under
tests/fixtures/mapcss so these goldens always run."""

import os

from osm_renderer_tpu.mapcss.parser import format_rules, parse_file, parse_string

MAPNIK_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "fixtures", "mapcss")
CANONICAL = os.path.join(MAPNIK_DIR, "mapnik.parsed.canonical")


def _canonical_text() -> str:
    with open(CANONICAL, "r", encoding="utf-8") as f:
        return f.read().replace("\r\n", "\n")


def test_mapnik_parse_golden():
    rules = parse_file(MAPNIK_DIR, "mapnik.mapcss")
    assert format_rules(rules) == _canonical_text()


def test_parsing_is_idempotent():
    rules = parse_file(MAPNIK_DIR, "mapnik.parsed.canonical")
    assert format_rules(rules) == _canonical_text()


def test_osmosnimki_parses():
    rules = parse_file(MAPNIK_DIR, "osmosnimki-minimal.mapcss")
    assert len(rules) > 100
    # Re-parsing our own dump must be stable.
    dumped = format_rules(rules)
    assert format_rules(parse_string(dumped)) == dumped


def test_simple_rule():
    rules = parse_string(
        'way|z12-14[highway=primary][bridge?]::casing { width: 2.5; color: #abc; dashes: 3,2; }'
    )
    assert len(rules) == 1
    out = format_rules(rules)
    assert out == (
        "way|z12-14[highway=primary][bridge?]::casing {\n"
        "width: 2.5;\n"
        "color: #aabbcc;\n"
        "dashes: 3,2;\n"
        "}"
    )


def test_eval_width_delta():
    rules = parse_string('way { casing-width: eval(prop("width")+1.5); }')
    assert str(rules[0].properties[0].value) == 'eval(prop("width")) + 1.5'


def test_color_defs_and_import(tmp_path):
    (tmp_path / "imported.mapcss").write_text("@water: #0000ff;\nnode { color: @water; }\n")
    (tmp_path / "main.mapcss").write_text('@import("imported.mapcss");\nway { color: @water; }\n')
    rules = parse_file(str(tmp_path), "main.mapcss")
    assert format_rules(rules).count("#0000ff") == 2
