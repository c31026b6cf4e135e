"""Shared test fixtures: a tiny in-memory OSM scene around Vaduz."""

import os

from osm_renderer_tpu.geodata.importer import import_osm
from osm_renderer_tpu.geodata.reader import GeodataReader

MINI_OSM = """<?xml version='1.0' encoding='UTF-8'?>
<osm version="0.6">
  <node id="1" lat="47.1410" lon="9.5210"><tag k="amenity" v="cafe"/><tag k="name" v="K"/></node>
  <node id="2" lat="47.1412" lon="9.5212"/>
  <node id="3" lat="47.1414" lon="9.5210"/>
  <node id="4" lat="47.1412" lon="9.5208"/>
  <node id="5" lat="47.1420" lon="9.5220"/>
  <node id="6" lat="47.1425" lon="9.5230"/>
  <node id="10" lat="47.1400" lon="9.5200"/>
  <node id="11" lat="47.1400" lon="9.5240"/>
  <node id="12" lat="47.1430" lon="9.5240"/>
  <node id="13" lat="47.1430" lon="9.5200"/>
  <node id="20" lat="47.1410" lon="9.5215"/>
  <node id="21" lat="47.1410" lon="9.5225"/>
  <node id="22" lat="47.1418" lon="9.5225"/>
  <node id="23" lat="47.1418" lon="9.5215"/>
  <way id="100"><nd ref="1"/><nd ref="2"/><nd ref="3"/><nd ref="4"/><nd ref="1"/>
    <tag k="building" v="yes"/></way>
  <way id="101"><nd ref="5"/><nd ref="6"/>
    <tag k="highway" v="residential"/><tag k="name" v="Main St"/><tag k="layer" v="1"/></way>
  <way id="102"><nd ref="10"/><nd ref="11"/><nd ref="12"/><nd ref="13"/><nd ref="10"/></way>
  <way id="103"><nd ref="20"/><nd ref="21"/><nd ref="22"/><nd ref="23"/><nd ref="20"/></way>
  <relation id="200">
    <member type="way" ref="102" role="outer"/>
    <member type="way" ref="103" role="inner"/>
    <tag k="type" v="multipolygon"/><tag k="natural" v="water"/>
  </relation>
</osm>
"""


def build_mini_reader(tmp_path) -> GeodataReader:
    osm_path = os.path.join(str(tmp_path), "mini.osm")
    with open(osm_path, "w") as f:
        f.write(MINI_OSM)
    bin_path = os.path.join(str(tmp_path), "mini.bin")
    import_osm(osm_path, bin_path)
    return GeodataReader.load(bin_path)
