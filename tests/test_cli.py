"""CLI entry points: importer atomic write, PBF gate, config validation."""

import os

import pytest

from osm_renderer_tpu.cli.importer_main import main as importer_main
from tests.fixtures import MINI_OSM


def test_importer_cli(tmp_path):
    osm = tmp_path / "mini.osm"
    osm.write_text(MINI_OSM)
    out = tmp_path / "mini.bin"
    assert importer_main([str(osm), str(out)]) == 0
    assert out.exists()
    assert not (tmp_path / "mini.tmp").exists()

    from osm_renderer_tpu.geodata.reader import GeodataReader

    reader = GeodataReader.load(str(out))
    assert len(reader.nodes) == 14


def test_importer_cli_bad_usage(capsys):
    assert importer_main([]) == 1


def test_importer_cleanup_on_failure(tmp_path):
    bad = tmp_path / "broken.osm"
    bad.write_text("<osm><node id='1' lat='x'")  # malformed
    out = tmp_path / "broken.bin"
    assert importer_main([str(bad), str(out)]) == 1
    assert not out.exists()
    assert not (tmp_path / "broken.tmp").exists()


def test_unsupported_extension(tmp_path):
    f = tmp_path / "input.gpx"
    f.write_text("x")
    assert importer_main([str(f), str(tmp_path / "o.bin")]) == 1


def test_canvas_default_black():
    """Without a canvas rule, the default canvas is opaque black
    (tile_pixels.rs DEFAULT_PIXEL_COLOR)."""
    import numpy as np

    from osm_renderer_tpu.draw.oracle import OracleTile

    t = OracleTile(1)
    t.reset(None)
    t.blend_unfinished(False)
    t.blend_unfinished(True)
    assert (t.to_rgb() == 0).all()


def test_renderer_config_validation(tmp_path, capsys):
    from osm_renderer_tpu.cli.renderer_main import main as renderer_main

    assert renderer_main([]) == 1

    missing = tmp_path / "missing.conf"
    missing_path = str(missing)
    assert renderer_main([missing_path]) == 1

    bad_type = tmp_path / "bad.conf"
    bad_type.write_text(
        "[http]\naddress = 127.0.0.1:1\n[geodata]\nfile = x.bin\n"
        "[style]\nfile = s.mapcss\ntype = wrong\n"
    )
    assert renderer_main([str(bad_type)]) == 1

    import pytest as _pytest

    no_addr = tmp_path / "noaddr.conf"
    no_addr.write_text("[geodata]\nfile = x.bin\n[style]\nfile = s\ntype = josm\n")
    with _pytest.raises(SystemExit):
        renderer_main([str(no_addr)])
    assert "address" in capsys.readouterr().err
