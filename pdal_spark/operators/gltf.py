"""writers.gltf analog: triangular mesh -> binary glTF (.glb).

Reference: /root/reference/io/GltfWriter.cpp (284 LoC, self-contained).
Byte layout replicated exactly (GltfWriter.cpp:49-52, 157-280):

  12-byte header   b"glTF", uint32 version=2, uint32 total file size
  JSON chunk       uint32 length (always 5000), b"JSON", JSON document
                   space-padded to exactly 5000 bytes
                   (JsonChunkDataSize, GltfWriter.cpp:50, 258-263)
  BIN chunk        uint32 binSize, b"BIN\\0" (out.put("BIN", 4) writes
                   the NUL, GltfWriter.cpp:275-279)
  bin data         per view: triangle indices as uint32 LE (a, b, c per
                   face), then vertices as float32 LE (x, y, z)
                   (GltfWriter.cpp:118-141)

The JSON document is nlohmann::json dump(): compact separators and keys
in alphabetical order (std::map) — Python's
``json.dumps(sort_keys=True, separators=(",", ":"))`` is byte-identical
for this document. Two reference quirks are preserved deliberately:

  * ``baseColorFactor`` is ordered {red, BLUE, GREEN, alpha}
    (GltfWriter.cpp:254 — the reference swaps g and b);
  * with multiple views, every view's bufferViews/accessors are
    emitted but the single mesh primitive only ever references
    accessors 0 and 1 — the first view (GltfWriter.cpp:222-229).

Spark-first shape: a .glb is a single uint32-bounded (< 4 GiB,
GltfWriter.cpp:127-129) artifact, so the SCALE UNIT is one GLB per
tile/view — the FlexWriter-'#' shape. ``write_gltf_tiles`` cogroups the
point and face tables on the tile key and each task encodes + writes
its own GLB, returning a small manifest DataFrame (no driver collect).
``glb_bytes``/``write_gltf`` is the single-file parity mode, bounded
like the reference.
"""

from __future__ import annotations

import json
import os
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_HEADER = 12
_JSON_CHUNK = 5000
_CHUNK_HEADER = 8
# fixed overhead of every .glb: header + 2 chunk headers + padded JSON
GLB_OVERHEAD = _HEADER + 2 * _CHUNK_HEADER + _JSON_CHUNK  # 5028


class GltfError(RuntimeError):
    pass


def glb_bytes(
    views: list[tuple[np.ndarray, np.ndarray]],
    metallic: float = 0.0,
    roughness: float = 0.0,
    red: float = 0.0,
    green: float = 0.0,
    blue: float = 0.0,
    alpha: float = 1.0,
    double_sided: bool = False,
) -> bytes:
    """Encode views [(vertices (n,3), faces (m,3) local indices)] as a
    .glb byte string with the reference's exact layout."""
    if not views:
        raise GltfError("no views with a mesh to write")

    bin_parts: list[bytes] = []
    buffer_views: list[dict] = []
    accessors: list[dict] = []
    bin_size = 0
    for verts, faces in views:
        V = np.ascontiguousarray(np.asarray(verts, dtype=np.float64)
                                 .astype(np.float32))
        T = np.ascontiguousarray(np.asarray(faces, dtype=np.uint32))
        if V.ndim != 2 or V.shape[1] != 3 or T.ndim != 2 or T.shape[1] != 3:
            raise GltfError("views must be (n,3) vertices and (m,3) faces")
        idx_bytes = T.astype("<u4").tobytes()
        vtx_bytes = V.astype("<f4").tobytes()
        buffer_views.append({
            "buffer": 0, "byteOffset": bin_size,
            "byteLength": len(idx_bytes), "target": 34963,
        })
        accessors.append({
            "bufferView": len(buffer_views) - 1, "componentType": 5125,
            "type": "SCALAR", "count": int(T.size),
        })
        buffer_views.append({
            "buffer": 0, "byteOffset": bin_size + len(idx_bytes),
            "byteLength": len(vtx_bytes), "target": 34962,
        })
        # bounds grown from the float32-cast values (getFieldAs<float>)
        lo = V.min(axis=0) if len(V) else np.zeros(3, np.float32)
        hi = V.max(axis=0) if len(V) else np.zeros(3, np.float32)
        accessors.append({
            "bufferView": len(buffer_views) - 1, "componentType": 5126,
            "type": "VEC3", "count": int(len(V)),
            "min": [float(lo[0]), float(lo[1]), float(lo[2])],
            "max": [float(hi[0]), float(hi[1]), float(hi[2])],
        })
        bin_parts.append(idx_bytes)
        bin_parts.append(vtx_bytes)
        bin_size += len(idx_bytes) + len(vtx_bytes)

    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": bin_size}],
        "bufferViews": buffer_views,
        "accessors": accessors,
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 1}, "indices": 0, "material": 0}
        ]}],
        "scene": 0,
        "nodes": [{"mesh": 0,
                   "matrix": [1, 0, 0, 0, 0, 0, -1, 0,
                              0, 1, 0, 0, 0, 0, 0, 1]}],
        "scenes": [{"nodes": [0]}],
        # reference quirk: baseColorFactor is {r, b, g, a}
        "materials": [{
            "pbrMetallicRoughness": {
                "metallicFactor": metallic,
                "roughnessFactor": roughness,
                "baseColorFactor": [red, blue, green, alpha],
            },
            "name": "Color",
            "doubleSided": double_sided,
        }],
    }
    js = json.dumps(doc, sort_keys=True, separators=(",", ":"))
    if len(js) > _JSON_CHUNK:
        raise GltfError("JSON header too large")
    js = js + " " * (_JSON_CHUNK - len(js))

    total = GLB_OVERHEAD + bin_size
    if total > 0xFFFFFFFF:
        raise GltfError("Data too large for file.")
    out = [
        b"glTF", struct.pack("<II", 2, total),
        struct.pack("<I", _JSON_CHUNK), b"JSON", js.encode("ascii"),
        struct.pack("<I", bin_size), b"BIN\x00",
    ]
    out.extend(bin_parts)
    return b"".join(out)


def _local_faces(pdf_pts: pd.DataFrame, pdf_faces: pd.DataFrame,
                 id_col: str) -> tuple[np.ndarray, np.ndarray]:
    """Vertices ordered by point id; faces remapped from global point
    ids to PointView-local positional indices (the reference's mesh
    triangles index into the view, GltfWriter.cpp:131-133)."""
    pdf_pts = pdf_pts.sort_values(id_col).reset_index(drop=True)
    ids = pdf_pts[id_col].to_numpy(np.int64)
    V = pdf_pts[["x", "y", "z"]].to_numpy(np.float64)
    T_ids = pdf_faces[["a", "b", "c"]].to_numpy(np.int64)
    pos = np.searchsorted(ids, T_ids)
    if pos.size and ((pos >= len(ids)).any()
                     or (ids[np.minimum(pos, len(ids) - 1)] != T_ids).any()):
        raise GltfError("face references a point id not in this view")
    return V, pos


def write_gltf(
    pts: DataFrame,
    faces: DataFrame,
    filename: str,
    id_col: str = "page_id",
    max_bytes: int = 0xFFFFFFFF,
    **material,
) -> int:
    """Single-file parity mode: one GLB from (points, faces) DataFrames.

    Collects to the driver — legitimate here because the format itself
    is uint32-bounded (< 4 GiB); refuses beyond max_bytes up front.
    Returns the byte size written."""
    p = pts.select(F.col(id_col), F.col("x").cast("double"),
                   F.col("y").cast("double"),
                   F.col("z").cast("double")).toPandas()
    f = faces.select("a", "b", "c").toPandas()
    est = GLB_OVERHEAD + 12 * len(p) + 12 * len(f)
    if est > max_bytes:
        raise GltfError(f"estimated {est} bytes exceeds cap {max_bytes}")
    blob = glb_bytes([_local_faces(p, f, id_col)], **material)
    with open(filename, "wb") as fh:
        fh.write(blob)
    return len(blob)


def write_gltf_tiles(
    pts: DataFrame,
    faces: DataFrame,
    out_dir: str,
    tile_col: str = "tile_id",
    id_col: str = "page_id",
    **material,
) -> DataFrame:
    """The 100 TB shape: one GLB per tile, encoded and written inside
    each cogrouped task (no driver collect), FlexWriter-'#' style.

    `pts` needs (tile_col, id_col, x, y, z); `faces` needs
    (tile_col, a, b, c) with every referenced id present in the tile's
    point set (delaunay tiled mode + splitter satisfy this). Tiles with
    no faces are skipped, like the reference skips meshless views
    (GltfWriter.cpp:109-114). Returns the manifest DataFrame
    (tile, n_vertices, n_faces, byte_length, path)."""

    def encode(key, pdf_pts: pd.DataFrame, pdf_faces: pd.DataFrame):
        if not len(pdf_faces) or not len(pdf_pts):
            return pd.DataFrame(
                {"tile": pd.Series([], dtype="int64"),
                 "n_vertices": pd.Series([], dtype="int64"),
                 "n_faces": pd.Series([], dtype="int64"),
                 "byte_length": pd.Series([], dtype="int64"),
                 "path": pd.Series([], dtype="object")})
        V, T = _local_faces(pdf_pts, pdf_faces, id_col)
        blob = glb_bytes([(V, T)], **material)
        path = os.path.join(out_dir, f"tile_{int(key[0])}.glb")
        with open(path, "wb") as fh:
            fh.write(blob)
        return pd.DataFrame({
            "tile": [int(key[0])], "n_vertices": [len(V)],
            "n_faces": [len(T)], "byte_length": [len(blob)],
            "path": [path],
        })

    os.makedirs(out_dir, exist_ok=True)
    p = pts.select(F.col(tile_col).cast("long").alias(tile_col),
                   F.col(id_col).cast("long").alias(id_col),
                   F.col("x").cast("double"), F.col("y").cast("double"),
                   F.col("z").cast("double"))
    f = faces.select(F.col(tile_col).cast("long").alias(tile_col),
                     F.col("a").cast("long"), F.col("b").cast("long"),
                     F.col("c").cast("long"))
    return (
        p.groupBy(tile_col)
        .cogroup(f.groupBy(tile_col))
        .applyInPandas(encode, schema=(
            "tile long, n_vertices long, n_faces long, "
            "byte_length long, path string"))
    )


def soup_faces(
    pts: DataFrame,
    tile_col: str = "tile_id",
    id_col: str = "page_id",
) -> DataFrame:
    """Triangle-soup faces: consecutive id-ordered triples within each
    tile (trailing partial group dropped — a face needs 3 points).
    SQL-expressible companion for oracle-checking the GLB manifest;
    pure window-per-tile, no global state."""
    w = F.row_number().over(
        __import__("pyspark.sql.window", fromlist=["Window"])
        .Window.partitionBy(tile_col).orderBy(F.col(id_col).asc())
    ) - 1
    r = pts.select(F.col(tile_col), F.col(id_col)).withColumn("_r", w)
    g = r.withColumn("_t", (F.col("_r") / 3).cast("long")).withColumn(
        "_s", F.col("_r") % 3)
    tri = (
        g.groupBy(tile_col, "_t")
        .agg(F.count("*").alias("_n"),
             F.min(F.when(F.col("_s") == 0, F.col(id_col))).alias("a"),
             F.min(F.when(F.col("_s") == 1, F.col(id_col))).alias("b"),
             F.min(F.when(F.col("_s") == 2, F.col(id_col))).alias("c"))
        .filter(F.col("_n") == 3)
        .select(tile_col, "a", "b", "c")
    )
    return tri
