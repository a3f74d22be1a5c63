"""writers.gltf analog (operators/gltf.py).

Byte-level layout checks against GltfWriter.cpp:157-280 — header,
5000-byte space-padded JSON chunk, BIN\\0 chunk tag, per-view
uint32-index/float32-vertex buffers — plus the two reference quirks
(baseColorFactor {r,b,g,a}; multi-view accessors emitted but only the
first pair referenced) and the distributed per-tile writer manifest."""

from __future__ import annotations

import json
import struct

import numpy as np
import pytest
from pyspark.sql import functions as F

from pdal_spark.operators import gltf


V1 = np.array([[0.0, 0.0, 0.0], [1.0, 0.0, 0.0], [0.0, 1.0, 2.5]])
T1 = np.array([[0, 1, 2]])


def _chunks(blob: bytes):
    assert blob[:4] == b"glTF"
    version, total = struct.unpack_from("<II", blob, 4)
    jlen = struct.unpack_from("<I", blob, 12)[0]
    assert blob[16:20] == b"JSON"
    js = blob[20:20 + jlen]
    off = 20 + jlen
    blen = struct.unpack_from("<I", blob, off)[0]
    assert blob[off + 4:off + 8] == b"BIN\x00"
    bin_data = blob[off + 8:off + 8 + blen]
    return version, total, jlen, js, blen, bin_data


def test_glb_layout_golden():
    blob = gltf.glb_bytes([(V1, T1)], red=0.25, green=0.5, blue=0.75)
    version, total, jlen, js, blen, bin_data = _chunks(blob)
    assert version == 2
    assert jlen == 5000
    assert total == len(blob) == gltf.GLB_OVERHEAD + blen
    # JSON is space-padded to exactly 5000 bytes
    doc = json.loads(js.decode("ascii"))
    assert js.rstrip(b" ") == json.dumps(
        doc, sort_keys=True, separators=(",", ":")).encode("ascii")
    # bin: 1 face * 3 uint32 + 3 verts * 3 float32
    assert blen == 12 + 36
    assert struct.unpack("<3I", bin_data[:12]) == (0, 1, 2)
    assert struct.unpack("<9f", bin_data[12:]) == pytest.approx(
        (0, 0, 0, 1, 0, 0, 0, 1, 2.5))
    # JSON content vs GltfWriter.cpp:167-256
    assert doc["asset"]["version"] == "2.0"
    assert doc["buffers"] == [{"byteLength": 48}]
    assert doc["bufferViews"][0] == {
        "buffer": 0, "byteOffset": 0, "byteLength": 12, "target": 34963}
    assert doc["bufferViews"][1] == {
        "buffer": 0, "byteOffset": 12, "byteLength": 36, "target": 34962}
    acc = doc["accessors"]
    assert acc[0] == {"bufferView": 0, "componentType": 5125,
                      "type": "SCALAR", "count": 3}
    assert acc[1]["min"] == [0.0, 0.0, 0.0]
    assert acc[1]["max"] == [1.0, 1.0, 2.5]
    assert doc["nodes"][0]["matrix"] == [1, 0, 0, 0, 0, 0, -1, 0,
                                         0, 1, 0, 0, 0, 0, 0, 1]
    # reference quirk: {r, b, g, a} order (GltfWriter.cpp:254)
    m = doc["materials"][0]["pbrMetallicRoughness"]
    assert m["baseColorFactor"] == [0.25, 0.75, 0.5, 1.0]
    assert doc["meshes"][0]["primitives"][0] == {
        "attributes": {"POSITION": 1}, "indices": 0, "material": 0}


def test_glb_multi_view_quirk():
    blob = gltf.glb_bytes([(V1, T1), (V1 + 10.0, T1)])
    *_, js, blen, bin_data = _chunks(blob)
    doc = json.loads(js.decode(("ascii")))
    # both views emitted ...
    assert len(doc["bufferViews"]) == 4 and len(doc["accessors"]) == 4
    assert doc["bufferViews"][2]["byteOffset"] == 48
    assert blen == 96
    # ... but the primitive still references only accessors 0/1
    assert doc["meshes"] == [{"primitives": [
        {"attributes": {"POSITION": 1}, "indices": 0, "material": 0}]}]


def test_glb_bounds_are_float32_cast():
    v = np.array([[0.1, 0.0, 0.0]] * 3)
    doc = json.loads(_chunks(gltf.glb_bytes([(v, T1)]))[3])
    assert doc["accessors"][1]["min"][0] == float(np.float32(0.1))


def test_write_gltf_roundtrip(spark, tmp_path):
    pts = spark.createDataFrame(
        [(i, float(V1[i, 0]), float(V1[i, 1]), float(V1[i, 2]))
         for i in range(3)], "page_id long, x double, y double, z double")
    faces = spark.createDataFrame([(0, 1, 2)], "a long, b long, c long")
    out = str(tmp_path / "m.glb")
    n = gltf.write_gltf(pts, faces, out, id_col="page_id")
    blob = open(out, "rb").read()
    assert len(blob) == n == gltf.GLB_OVERHEAD + 48
    # id -> local index remap: ids are 0,1,2 so identity here
    assert struct.unpack_from("<3I", _chunks(blob)[5]) == (0, 1, 2)


def test_write_gltf_remaps_sparse_ids(spark, tmp_path):
    pts = spark.createDataFrame(
        [(100, 0.0, 0.0, 0.0), (7, 1.0, 0.0, 0.0), (55, 0.0, 1.0, 0.0)],
        "page_id long, x double, y double, z double")
    faces = spark.createDataFrame([(7, 55, 100)], "a long, b long, c long")
    out = str(tmp_path / "m.glb")
    gltf.write_gltf(pts, faces, out)
    bin_data = _chunks(open(out, "rb").read())[5]
    # vertices sorted by id (7, 55, 100) -> face indices (0, 1, 2)
    assert struct.unpack_from("<3I", bin_data) == (0, 1, 2)
    vx = struct.unpack_from("<9f", bin_data, 12)
    assert vx[0] == 1.0 and vx[3 + 1] == 1.0 and vx[6] == 0.0


def test_write_gltf_tiles_manifest(spark, tmp_path):
    rows = [(i % 3, i, float(i), float(i * 2), 0.5) for i in range(20)]
    pts = spark.createDataFrame(
        rows, "tile_id long, page_id long, x double, y double, z double")
    faces = gltf.soup_faces(pts)
    man = gltf.write_gltf_tiles(pts, faces, str(tmp_path / "tiles"))
    got = {r.tile: r for r in man.collect()}
    # tiles 0/1 have 7 points -> 2 faces; tile 2 has 6 -> 2 faces
    assert set(got) == {0, 1, 2}
    for t, r in got.items():
        n_pts = 7 if t < 2 else 6
        assert r.n_vertices == n_pts and r.n_faces == n_pts // 3
        blob = open(r.path, "rb").read()
        assert len(blob) == r.byte_length == (
            gltf.GLB_OVERHEAD + 12 * n_pts + 12 * (n_pts // 3))
        _chunks(blob)  # parses


def test_missing_face_id_raises(spark, tmp_path):
    pts = spark.createDataFrame(
        [(0, 0.0, 0.0, 0.0), (1, 1.0, 0.0, 0.0), (2, 0.0, 1.0, 0.0)],
        "page_id long, x double, y double, z double")
    faces = spark.createDataFrame([(0, 1, 9)], "a long, b long, c long")
    with pytest.raises(gltf.GltfError):
        gltf.write_gltf(pts, faces, str(tmp_path / "bad.glb"))
