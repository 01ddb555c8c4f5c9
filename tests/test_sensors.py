"""Sensor band-name LUT, gw.open dispatch (wildcard/list/sensor), VRT view."""

import json
import os

import pytest
from pyspark.sql import functions as F

import geowombat_spark.api as gw
from geowombat_spark.config import config
from geowombat_spark.grid import GridSpec
from geowombat_spark.sensors import SENSOR_BANDS, band_columns, rename_bands


def _generic(spark, n=8):
    cols = {f"band_{i + 1}": (F.col("id") * (i + 2)).cast("double") for i in range(n)}
    return spark.range(10).select(F.col("id").alias("doc_id"), *[
        v.alias(k) for k, v in cols.items()
    ])


def test_rename_bands_l8(spark):
    df = rename_bands(_generic(spark, 8), sensor="l8")
    assert band_columns(df) == [f"band_{b}" for b in SENSOR_BANDS["l8"]]
    # values ride along positionally: band_1 -> band_coastal
    a = _generic(spark, 8).select("band_1").collect()
    b = df.select("band_coastal").collect()
    assert [r[0] for r in a] == [r[0] for r in b]


def test_rename_bands_explicit_wins_over_sensor(spark):
    df = rename_bands(
        _generic(spark, 3), sensor="l8", band_names=("b", "g", "r")
    )
    assert band_columns(df) == ["band_b", "band_g", "band_r"]


def test_rename_bands_unknown_sensor_warns_and_noops(spark):
    src = _generic(spark, 3)
    with pytest.warns(UserWarning, match="not currently supported"):
        df = rename_bands(src, sensor="not_a_sensor")
    assert df.columns == src.columns


def test_rename_bands_count_mismatch_warns_and_noops(spark):
    src = _generic(spark, 3)
    with pytest.warns(UserWarning, match="do not match"):
        df = rename_bands(src, sensor="l8")
    assert df.columns == src.columns


def test_open_single_with_sensor(spark, corpus_dir, docs):
    # corpus has 3 band columns (blue, green, red order) -> 'bgr' fits
    out = gw.open(spark, corpus_dir + "/t1", sensor="bgr")
    assert band_columns(out) == ["band_blue", "band_green", "band_red"]
    # config(sensor=...) wins when no kwarg given (reference precedence)
    with config(sensor="rgb"):
        out2 = gw.open(spark, corpus_dir + "/t1")
    assert band_columns(out2) == ["band_red", "band_green", "band_blue"]


def test_open_wildcard_and_list_stack(spark, corpus_dir, docs):
    # the corpus_dir holds one time dir 't1'; the wildcard resolves to it
    out = gw.open(spark, corpus_dir + "/t*")
    assert out.count() == docs.count()
    # a two-element list concat-stacks along time
    stacked = gw.open(
        spark,
        [corpus_dir + "/t1", corpus_dir + "/t1"],
        time_names=["a", "b"],
        nodata=0.0,
    )
    assert stacked.select("t").distinct().count() == 2


def test_parse_wildcard_no_match_raises():
    with pytest.raises(NameError):
        gw.parse_wildcard("/nonexistent/prefix*")


def test_vrt_roundtrip(spark, corpus_dir, docs, tmp_path):
    from geowombat_spark.fixtures import L8_GRID

    vrt_file = str(tmp_path / "view.vrt")
    # identity VRT: open_vrt == bare scan of the selected bands
    desc = gw.to_vrt(
        corpus_dir + "/t1", vrt_file, L8_GRID, bands=("band_blue",)
    )
    assert desc["resampling"] == "nearest"
    # default format is GDAL VRT XML (reference io.py:516-528 shape)
    from xml.etree.ElementTree import fromstring

    root = fromstring(open(vrt_file).read())
    assert root.tag == "VRTDataset"
    assert root.find("VRTRasterBand/SimpleSource/SourceFilename").text == (
        corpus_dir + "/t1"
    )
    view = gw.open_vrt(spark, vrt_file)
    assert view.count() == docs.count()
    assert "band_blue" in view.columns

    # the json descriptor format round-trips identically
    vrt_json = str(tmp_path / "view.json.vrt")
    gw.to_vrt(
        corpus_dir + "/t1", vrt_json, L8_GRID, bands=("band_blue",),
        fmt="json",
    )
    assert json.load(open(vrt_json))["source"] == corpus_dir + "/t1"
    assert gw.open_vrt(spark, vrt_json).count() == docs.count()

    # existing file without overwrite: warn + no write
    with pytest.warns(UserWarning, match="already exists"):
        assert gw.to_vrt(corpus_dir + "/t1", vrt_file, L8_GRID) is None

    # warped VRT: 2x downsample by average replays lazily
    g = L8_GRID
    dst = GridSpec(
        left=g.left, top=g.top, cellx=g.cellx * 2, celly=g.celly * 2,
        nrows=g.nrows // 2, ncols=g.ncols // 2,
        tile_rows=g.tile_rows, tile_cols=g.tile_cols, crs=g.crs,
        nodata=g.nodata,
    )
    vrt2 = str(tmp_path / "warp.vrt")
    gw.to_vrt(
        corpus_dir + "/t1", vrt2, g, dst_grid=dst,
        bands=("band_blue",), resampling="average", overwrite=True,
    )
    warped = gw.open_vrt(spark, vrt2)
    # full-lattice warp semantics (df65f79, matching GDAL warp /
    # ref backends/rasterio_.py:866-1049): the replay emits EVERY
    # destination-lattice cell; cells with no source contribution carry
    # NULL bands rather than being dropped.
    n = warped.count()
    assert n == dst.nrows * dst.ncols
    import pyspark.sql.functions as F

    covered = warped.filter(F.col("band_blue").isNotNull()).count()
    # the 2x downsample of a fully-covered source covers every dst cell
    assert 0 < covered <= n
    # uncovered cells (if any) are NULL-band, never missing rows
    assert warped.filter(F.col("band_blue").isNull()).count() == n - covered


def test_gw_load_stack_rescale_nodata(spark, corpus_dir, docs):
    """gw.load: time-stacked open + nodata nulling + in->out range rescale
    with clipping (core/api.py:697-830 semantics)."""
    out = gw.load(
        spark,
        [corpus_dir + "/t1", corpus_dir + "/t1"],
        time_names=["2020-01-01", "2020-02-01"],
        nodata=0.0,
        in_range=(0.0, 200.0),
        out_range=(0.0, 1.0),
    )
    assert out.select("t").distinct().count() == 2
    import pyspark.sql.functions as F

    stats = out.agg(
        F.min("band_blue").alias("lo"), F.max("band_blue").alias("hi")
    ).collect()[0]
    assert stats["lo"] is not None and stats["lo"] >= 0.0
    assert stats["hi"] <= 1.0
    # nodata (0.0) became NULL before scaling: no exact-zero raw zeros remain
    src = gw.open(spark, corpus_dir + "/t1")
    n_zeros = src.filter(F.col("band_blue") == 0.0).count()
    if n_zeros:
        n_null = out.filter(F.col("band_blue").isNull()).count()
        assert n_null > 0


def test_vrt_xml_gdal_shape_and_foreign_fallback(spark, corpus_dir, docs, tmp_path):
    """The XML emitter writes the standard GDAL VRT elements (SRS,
    GeoTransform, VRTRasterBand, Src/DstRect, ComplexSource+NODATA when
    nodata is set), and open_vrt replays the SAME plan from the XML as
    from the JSON descriptor — including a 'foreign' VRT stripped of the
    GEOWOMBAT_SPARK metadata payload (structural-element fallback)."""
    from xml.etree.ElementTree import fromstring, tostring

    from geowombat_spark.fixtures import L8_GRID

    xmlf = str(tmp_path / "x.vrt")
    jsonf = str(tmp_path / "x.json.vrt")
    for f, fmt in ((xmlf, "xml"), (jsonf, "json")):
        gw.to_vrt(
            corpus_dir + "/t1", f, L8_GRID,
            bands=("band_blue", "band_green"), nodata=0.0, fmt=fmt,
        )
    root = fromstring(open(xmlf).read())
    assert root.get("rasterXSize") == str(L8_GRID.ncols)
    assert root.findtext("SRS").strip() == L8_GRID.crs
    gt = [float(v) for v in root.findtext("GeoTransform").split(",")]
    assert gt == [L8_GRID.left, L8_GRID.cellx, 0.0,
                  L8_GRID.top, 0.0, -L8_GRID.celly]
    bands = root.findall("VRTRasterBand")
    assert [b.get("band") for b in bands] == ["1", "2"]
    src = bands[0].find("ComplexSource")  # nodata -> ComplexSource+NODATA
    assert src.findtext("NODATA") == "0"
    assert src.find("SrcRect").get("xSize") == str(L8_GRID.ncols)

    want = sorted(
        tuple(r) for r in gw.open_vrt(spark, jsonf)
        .select("row", "col", "band_blue").collect()
    )
    got_xml = sorted(
        tuple(r) for r in gw.open_vrt(spark, xmlf)
        .select("row", "col", "band_blue").collect()
    )
    assert got_xml == want

    # foreign VRT: strip our metadata payload -> structural fallback
    for md in root.findall("Metadata"):
        root.remove(md)
    foreign = str(tmp_path / "foreign.vrt")
    open(foreign, "w").write(tostring(root, encoding="unicode"))
    view = gw.open_vrt(spark, foreign)
    got_foreign = sorted(
        tuple(r) for r in view.select("row", "col", "band_blue").collect()
    )
    assert got_foreign == want
    # band names survive via <Description>
    assert "band_green" in view.columns

    # a foreign VRT with no <SRS> must fail loudly, not fabricate a CRS
    srs = root.find("SRS")
    if srs is not None:
        root.remove(srs)
    nosrs = str(tmp_path / "nosrs.vrt")
    open(nosrs, "w").write(tostring(root, encoding="unicode"))
    with pytest.raises(ValueError, match="no <SRS>"):
        gw.open_vrt(spark, nosrs)


def test_foreign_vrt_conflicting_band_nodata_raises():
    """A foreign VRT whose bands declare DIFFERENT NoDataValues must fail
    loudly — the replay descriptor carries one nodata, and last-band-wins
    would mask the wrong pixels in every other band."""
    import pytest

    from geowombat_spark.sources.vrt import _parse_vrt_xml

    xml = """<VRTDataset rasterXSize="4" rasterYSize="4">
    <SRS>EPSG:32621</SRS><GeoTransform>0,1,0,0,0,-1</GeoTransform>
    <VRTRasterBand><Description>b1</Description><NoDataValue>0</NoDataValue>
    <SimpleSource><SourceFilename>x.parquet</SourceFilename></SimpleSource>
    </VRTRasterBand>
    <VRTRasterBand><Description>b2</Description>
    <NoDataValue>-9999</NoDataValue></VRTRasterBand>
    </VRTDataset>"""
    with pytest.raises(ValueError, match="conflicting per-band"):
        _parse_vrt_xml(xml)
    # equal per-band values are fine (one shared nodata)
    ok = xml.replace("-9999", "0")
    assert _parse_vrt_xml(ok)["nodata"] == 0.0
