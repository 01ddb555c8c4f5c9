"""Deterministic synthetic fixtures reproducing the reference's test inputs.

The reference tests against tiny bundled rasters + GeoPackages
(``/root/reference/src/geowombat/data/__init__.py:21-78``); the full-size
rasters are absent from the snapshot, so this module regenerates everything
from first principles on the exact same grid (FIXTURES.md), pinning the
reference's committed golden values (``tests/test_extract.py:20-31,75-119``)
into the synthetic field.

The corpus follows the north-rule input shape: one row per located
interleaved document ``(doc_id, spans:array<struct<kind,text,media_ref,
offset>>, x, y)`` plus grid keys and band values. Span sequences must
survive every join byte-identically (verified via ``span_hash``).

Generation is vectorized numpy/pyarrow end-to-end so the same code builds
the 66k-cell pytest fixture and the ≥10⁷-row bench corpus.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from .grid import GridSpec, L8_GRID, rowcol_to_center_coords, zorder_encode

__all__ = [
    "AOI_POINTS",
    "AOI_POLYGONS",
    "PINNED_POINT_VALUES",
    "field_value",
    "build_corpus",
    "corpus_windows_for_tests",
    "span_hash_py",
]

# ---------------------------------------------------------------------------
# AOIs — exact values parsed from the reference GeoPackages
# (LC08_L1TP_224078_20200518_20200518_01_RT_{points,polygons}.gpkg,
#  EPSG:32621; parsed via sqlite3+WKB, see FIXTURES.md §4-5)
# ---------------------------------------------------------------------------

# id = LabelEncoder().fit_transform(name): crop=0, developed=1, tree=2, water=3
# (/root/reference/tests/test_extract.py:16-18)
AOI_POINTS = [
    {"fid": 1, "id": 3, "x": 741522.3135253836, "y": -2811204.6978834537, "name": "water"},
    {"fid": 2, "id": 0, "x": 736140.8446115642, "y": -2806478.3643156644, "name": "crop"},
    {"fid": 3, "id": 2, "x": 745919.5081998907, "y": -2805168.5794462743, "name": "tree"},
    {"fid": 4, "id": 1, "x": 739056.7353348704, "y": -2811710.6619904996, "name": "developed"},
    {"fid": 5, "id": 3, "x": 737802.1832944794, "y": -2818016.412445897, "name": "water"},
    {"fid": 6, "id": 2, "x": 759209.44307309, "y": -2828566.230256578, "name": "tree"},
]

AOI_POLYGONS = [
    {
        "fid": 1,
        "name": "water",
        "rings": [[
            737544.502430237, -2795232.7717836937,
            737544.502430237, -2795632.5053249793,
            737544.502430237, -2795632.5053249793,
            738061.8046601362, -2795632.5053249793,
            738014.7771846908, -2795256.2855214165,
            737544.502430237, -2795232.7717836937,
        ]],
    },
    {
        "fid": 2,
        "name": "crop",
        "rings": [[
            742517.6579585861, -2798160.232130169,
            743046.7170573466, -2798606.9931469,
            743164.2857459601, -2798371.855769673,
            742623.4697783382, -2797936.8516218034,
            742517.6579585861, -2798160.232130169,
        ]],
    },
    {
        "fid": 3,
        "name": "tree",
        "rings": [[
            742435.3598765567, -2801875.402690354,
            742458.8736142793, -2802322.163707085,
            742893.8777621491, -2802322.163707085,
            742846.8502867038, -2801898.9164280766,
            742435.3598765567, -2801875.402690354,
        ]],
    },
    {
        "fid": 4,
        "name": "developed",
        "rings": [[
            738903.666823403, -2811573.845053134,
            738926.585870113, -2811848.8736136532,
            739187.8630026066, -2811835.1221856275,
            739160.3601465547, -2811564.67743445,
            738903.666823403, -2811573.845053134,
        ]],
    },
]


def polygon_bbox(rings: list[list[float]]) -> tuple[float, float, float, float]:
    xs = np.concatenate([np.asarray(r)[0::2] for r in rings])
    ys = np.concatenate([np.asarray(r)[1::2] for r in rings])
    return float(xs.min()), float(ys.min()), float(xs.max()), float(ys.max())


# ---------------------------------------------------------------------------
# Pinned golden field values
# ---------------------------------------------------------------------------

# Point-extract goldens: (row, col) → (blue, green, red)
# (/root/reference/tests/test_extract.py:20-31; cells derived via
#  coords_to_rowcol on the L8_GRID — see tests/test_grid.py)
PINNED_POINT_VALUES = {
    (1140, 797): (7966.0, 7326.0, 6254.0),
    (982, 618): (8030.0, 7490.0, 8080.0),
    (939, 944): (7561.0, 6874.0, 6106.0),
    (1157, 715): (8302.0, 8202.0, 8111.0),
    (1367, 673): (8277.0, 7982.0, 7341.0),
    (1719, 1387): (7398.0, 6711.0, 6007.0),
}

# Polygon-extract goldens (blue only): first 10 water-polygon samples land in
# raster row 608, cols 665..674 (/root/reference/tests/test_extract.py:75-84)
PINNED_POLY_BLUE = {
    (608, 665 + k): v
    for k, v in enumerate(
        [7994.0, 8017.0, 8008.0, 8008.0, 8018.0, 8007.0, 7991.0, 7993.0, 7981.0, 7991.0]
    )
}


def field_value(band: int, row: np.ndarray, col: np.ndarray) -> np.ndarray:
    """The deterministic synthetic field (FIXTURES.md §3).

    ``v(b,row,col) = ((row*131 + col*7 + b*997) % 9000) + 1000``; integer
    arithmetic so Spark/DuckDB/numpy agree exactly. Nodata stripes (value 0)
    on row<10 & col<10 mirror ``/root/reference/tests/test_nodata.py:19-21``.
    """
    row = np.asarray(row, dtype=np.int64)
    col = np.asarray(col, dtype=np.int64)
    v = ((row * 131 + col * 7 + band * 997) % 9000 + 1000).astype(np.float64)
    v[(row < 10) & (col < 10)] = 0.0
    return v


def _apply_pins(row: np.ndarray, col: np.ndarray, bands: dict[str, np.ndarray]) -> None:
    keyed = row * 1_000_000 + col
    for (r, c), (b, g, rd) in PINNED_POINT_VALUES.items():
        m = keyed == (r * 1_000_000 + c)
        bands["band_blue"][m] = b
        bands["band_green"][m] = g
        bands["band_red"][m] = rd
    for (r, c), b in PINNED_POLY_BLUE.items():
        m = keyed == (r * 1_000_000 + c)
        bands["band_blue"][m] = b


# ---------------------------------------------------------------------------
# Span generation (vectorized through pyarrow ListArray)
# ---------------------------------------------------------------------------

SPAN_KINDS = np.array(["text", "image", "audio"])


def _build_spans(seq: np.ndarray) -> pa.ListArray:
    """1-4 interleaved spans per doc, deterministic from the doc sequence.

    kind cycles text/image/audio from (seq+i) % 3; text payload ``s{seq}-{i}``
    for text spans; ``media_ref = m://{seq}/{i}`` for media spans; offset is
    the span index (cumulative order). All built columnar — no per-row Python.
    """
    n_spans = (1 + (seq % 4)).astype(np.int32)
    offsets = np.zeros(len(seq) + 1, dtype=np.int32)
    np.cumsum(n_spans, out=offsets[1:])
    total = int(offsets[-1])
    doc_idx = np.repeat(np.arange(len(seq)), n_spans)
    span_i = np.arange(total, dtype=np.int64) - offsets[:-1].astype(np.int64)[doc_idx]
    seq_rep = seq[doc_idx]
    kind = SPAN_KINDS[(seq_rep + span_i) % 3]
    seq_s = seq_rep.astype("U12")
    i_s = span_i.astype("U2")
    is_text = kind == "text"
    text = np.where(is_text, np.char.add(np.char.add(np.char.add("s", seq_s), "-"), i_s), "")
    media = np.where(
        ~is_text,
        np.char.add(np.char.add(np.char.add("m://", seq_s), "/"), i_s),
        "",
    )
    struct = pa.StructArray.from_arrays(
        [
            pa.array(kind, type=pa.string()),
            pa.array(text, type=pa.string()),
            pa.array(media, type=pa.string()),
            pa.array(span_i.astype(np.int32), type=pa.int32()),
        ],
        names=["kind", "text", "media_ref", "offset"],
    )
    return pa.ListArray.from_arrays(pa.array(offsets), struct)


def span_hash_py(spans) -> str:
    """Canonical hash of one document's span sequence.

    Used both at fixture build time and (re)computed after joins/resume to
    assert the north-rule invariant: span sequence (kind, text, media_ref,
    order) survives byte-identically.
    """
    h = hashlib.sha1()
    for s in spans:
        if isinstance(s, dict):
            k, t, m, o = s["kind"], s["text"], s["media_ref"], s["offset"]
        else:  # pyspark Row / tuple
            k, t, m, o = s[0], s[1], s[2], s[3]
        h.update(f"{k}\x1f{t}\x1f{m}\x1f{o}\x1e".encode())
    return h.hexdigest()


# ---------------------------------------------------------------------------
# Corpus builder
# ---------------------------------------------------------------------------


def corpus_windows_for_tests() -> list[tuple[int, int, int, int]]:
    """(row0, row1, col0, col1) half-open windows that cover every AOI plus a
    dense block for clip/subset/mosaic/sample tests — keeps the pytest
    fixture at ~70k rows while preserving full-grid coordinates."""
    wins = [(0, 256, 0, 256)]  # dense block incl. nodata stripe
    for p in AOI_POINTS:
        r, c = _point_cell(p)
        wins.append((r - 2, r + 3, c - 2, c + 3))
    for poly in AOI_POLYGONS:
        minx, miny, maxx, maxy = polygon_bbox(poly["rings"])
        c0 = int((minx - L8_GRID.left) / L8_GRID.cellx) - 2
        c1 = int((maxx - L8_GRID.left) / L8_GRID.cellx) + 3
        r0 = int((L8_GRID.top - maxy) / L8_GRID.celly) - 2
        r1 = int((L8_GRID.top - miny) / L8_GRID.celly) + 3
        wins.append((r0, r1, c0, c1))
    return wins


def _point_cell(p: dict) -> tuple[int, int]:
    c = int((p["x"] - L8_GRID.left) / L8_GRID.cellx)
    r = int((L8_GRID.top - p["y"]) / L8_GRID.celly)
    return r, c


def build_corpus(
    grid: GridSpec = L8_GRID,
    windows: list[tuple[int, int, int, int]] | None = None,
    times: tuple[str, ...] = ("t1",),
    with_spans: bool = True,
    with_span_hash: bool = False,
    value_offset_per_time: int = 0,
) -> pa.Table:
    """Build the documents corpus as a pyarrow Table.

    One row per (time, cell). ``windows=None`` materializes the full grid
    (used by bench); a window list materializes only those cells (pytest).
    ``value_offset_per_time`` adds ``i*offset`` to band values of times[i]
    so mosaic/temporal goldens differ per layer.
    """
    if windows is None:
        windows = [(0, grid.nrows, 0, grid.ncols)]
    rows_l, cols_l = [], []
    for r0, r1, c0, c1 in windows:
        r0, c0 = max(r0, 0), max(c0, 0)
        r1, c1 = min(r1, grid.nrows), min(c1, grid.ncols)
        rr, cc = np.meshgrid(
            np.arange(r0, r1, dtype=np.int64),
            np.arange(c0, c1, dtype=np.int64),
            indexing="ij",
        )
        rows_l.append(rr.ravel())
        cols_l.append(cc.ravel())
    row = np.concatenate(rows_l)
    col = np.concatenate(cols_l)
    # dedupe overlapping windows on the row-major cell index
    seq_all = row * grid.ncols + col
    _, uniq_idx = np.unique(seq_all, return_index=True)
    row, col = row[uniq_idx], col[uniq_idx]
    seq = row * grid.ncols + col

    x, y = rowcol_to_center_coords(grid, row, col)
    cell_id = zorder_encode(row, col)
    tile_id = grid.tile_id(row, col)
    doc_id = np.char.add("d", np.char.zfill(seq.astype("U12"), 12))

    bands = {
        "band_blue": field_value(0, row, col),
        "band_green": field_value(1, row, col),
        "band_red": field_value(2, row, col),
    }
    _apply_pins(row, col, bands)

    spans = _build_spans(seq) if with_spans else None
    span_hash = None
    if with_spans and with_span_hash:
        spans_py = spans.to_pylist()
        span_hash = [span_hash_py(s) for s in spans_py]

    tables = []
    for i, t in enumerate(times):
        cols_dict = {
            "doc_id": pa.array(doc_id, type=pa.string()),
            "t": pa.array(np.full(len(seq), t), type=pa.string()),
            "row": pa.array(row, type=pa.int64()),
            "col": pa.array(col, type=pa.int64()),
            "x": pa.array(x, type=pa.float64()),
            "y": pa.array(y, type=pa.float64()),
            "cell_id": pa.array(cell_id, type=pa.int64()),
            "tile_id": pa.array(tile_id, type=pa.int64()),
        }
        for b, v in bands.items():
            vv = v.copy()
            if i and value_offset_per_time:
                vv = np.where(vv == 0.0, 0.0, vv + i * value_offset_per_time)
            cols_dict[b] = pa.array(vv, type=pa.float64())
        if spans is not None:
            cols_dict["spans"] = spans
        if span_hash is not None:
            cols_dict["span_hash"] = pa.array(span_hash, type=pa.string())
        tables.append(pa.table(cols_dict))
    return pa.concat_tables(tables)
