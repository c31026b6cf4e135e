"""Binary geodata serializer.

Writes the same little-endian flat format as the reference
(`src/geodata/saver.rs` / `reader.rs:301-336`):

    [u32 node_count]  node records   (u64 id, f64 lat, f64 lon, intref tags)
    [u32 way_count]   way records    (u64 id, intref node_ids, intref tags)
    [u32 poly_count]  polygon records(intref node_ids)
    [u32 mp_count]    mp records     (u64 id, intref polygon_ids, intref tags)
    [u32 tile_count]  tile records   (u32 x, u32 y, intref nodes, ways, mps)
    [u32 int_count]   u32 int pool
    string pool bytes (deduplicated, referenced as (offset, len) int pairs)

An `intref` is (u32 offset, u32 length) into the shared int pool.
Tags are stored as 4 ints per kv: key offset/len + value offset/len into
the string pool, sorted by UTF-8 byte order.  The tile index maps every
entity to all MAX_ZOOM tiles in its bounding box and is sorted by (x, y).
"""

from __future__ import annotations

import struct
from array import array
from typing import BinaryIO, Dict, List, Tuple

import numpy as np

from osm_renderer_tpu.core.tile import coords_arrays_to_max_zoom_tiles

_U32_LIMIT = 2**32


def _to_u32_safe(num: int) -> int:
    if num >= _U32_LIMIT or num < 0:
        raise ValueError(f"{num} doesn't fit into u32")
    return num


class _BufferedData:
    def __init__(self):
        self.all_ints = array("I")
        self.string_to_offset: Dict[bytes, int] = {}
        self.all_strings = bytearray()

    def add_string(self, s: str) -> Tuple[int, int]:
        b = s.encode("utf-8")
        offset = self.string_to_offset.get(b)
        if offset is None:
            offset = len(self.all_strings)
            self.string_to_offset[b] = offset
            self.all_strings.extend(b)
        return offset, len(b)

    def save(self, writer: BinaryIO) -> None:
        writer.write(struct.pack("<I", _to_u32_safe(len(self.all_ints))))
        writer.write(self.all_ints.tobytes())
        writer.write(bytes(self.all_strings))


def _save_refs(writer: BinaryIO, refs, data: _BufferedData) -> None:
    offset = len(data.all_ints)
    for r in refs:
        data.all_ints.append(_to_u32_safe(r))
    writer.write(struct.pack("<II", _to_u32_safe(offset), len(data.all_ints) - offset))


def _save_tags(writer: BinaryIO, tags: Dict[str, str], data: _BufferedData) -> None:
    kv_refs: List[int] = []
    for k, v in sorted(tags.items(), key=lambda kv: kv[0].encode("utf-8")):
        k_off, k_len = data.add_string(k)
        v_off, v_len = data.add_string(v)
        kv_refs.extend((k_off, k_len, v_off, v_len))
    _save_refs(writer, kv_refs, data)


def save_to_internal_format(writer: BinaryIO, storages) -> None:
    data = _BufferedData()

    nodes = storages.node_storage.entities
    writer.write(struct.pack("<I", _to_u32_safe(len(nodes))))
    for node in nodes:
        writer.write(struct.pack("<Qdd", node.global_id, node.lat, node.lon))
        _save_tags(writer, node.tags, data)

    ways = storages.way_storage.entities
    writer.write(struct.pack("<I", _to_u32_safe(len(ways))))
    for way in ways:
        writer.write(struct.pack("<Q", way.global_id))
        _save_refs(writer, way.node_ids, data)
        _save_tags(writer, way.tags, data)

    polygons = storages.polygon_storage
    writer.write(struct.pack("<I", _to_u32_safe(len(polygons))))
    for polygon in polygons:
        _save_refs(writer, polygon, data)

    multipolygons = storages.multipolygon_storage.entities
    writer.write(struct.pack("<I", _to_u32_safe(len(multipolygons))))
    for mp in multipolygons:
        writer.write(struct.pack("<Q", mp.global_id))
        _save_refs(writer, mp.polygon_ids, data)
        _save_tags(writer, mp.tags, data)

    tile_refs = _get_tile_references(storages)
    writer.write(struct.pack("<I", _to_u32_safe(len(tile_refs))))
    for (x, y) in sorted(tile_refs.keys()):
        node_ids, way_ids, mp_ids = tile_refs[(x, y)]
        writer.write(struct.pack("<II", x, y))
        _save_refs(writer, sorted(node_ids), data)
        _save_refs(writer, sorted(way_ids), data)
        _save_refs(writer, sorted(mp_ids), data)

    data.save(writer)


def _get_tile_references(storages):
    """tile (x, y) -> (node id set, way id set, multipolygon id set).

    Entity-to-tile assignment matches `saver.rs:167-226`: a node goes to
    its MAX_ZOOM tile; ways/multipolygons go to every tile in the
    bounding box of their nodes' tiles.
    """
    nodes = storages.node_storage.entities
    lat = np.array([n.lat for n in nodes], dtype=np.float64)
    lon = np.array([n.lon for n in nodes], dtype=np.float64)
    if len(nodes):
        ntx, nty = coords_arrays_to_max_zoom_tiles(lat, lon)
        ntx = ntx.astype(np.int64)
        nty = nty.astype(np.int64)
    else:
        ntx = nty = np.zeros(0, dtype=np.int64)

    refs: Dict[Tuple[int, int], Tuple[set, set, set]] = {}

    def tile_ref(x: int, y: int):
        key = (int(x), int(y))
        entry = refs.get(key)
        if entry is None:
            entry = (set(), set(), set())
            refs[key] = entry
        return entry

    for i in range(len(nodes)):
        tile_ref(ntx[i], nty[i])[0].add(i)

    def insert_bbox(node_ids: List[int], slot: int, entity_id: int) -> None:
        if not node_ids:
            return
        ids = np.asarray(node_ids, dtype=np.int64)
        txs, tys = ntx[ids], nty[ids]
        for x in range(int(txs.min()), int(txs.max()) + 1):
            for y in range(int(tys.min()), int(tys.max()) + 1):
                tile_ref(x, y)[slot].add(entity_id)

    for i, way in enumerate(storages.way_storage.entities):
        insert_bbox(way.node_ids, 1, i)

    polygons = storages.polygon_storage
    for i, mp in enumerate(storages.multipolygon_storage.entities):
        all_ids = [nid for pid in mp.polygon_ids for nid in polygons[pid]]
        insert_bbox(all_ids, 2, i)

    return refs
