"""``to_vrt`` / ``open_vrt`` — a persisted *virtual* (lazy) warped view.

Reference ``gw.to_vrt`` (``/root/reference/src/geowombat/core/io.py:455-559``)
writes a GDAL VRT: a small file describing a source raster, a target grid,
a band selection, a resampling method, and a nodata value — no pixels are
materialized; opening the VRT replays the warp lazily.

The Spark analogue keeps exactly those semantics: ``to_vrt`` writes a JSON
descriptor next to nothing but itself; ``open_vrt`` rebuilds the *logical
plan* — scan → band selection → (optional) grid re-key via
``transform_grid`` — and returns the lazy DataFrame. Nothing is computed
until an action runs, and Catalyst pushes any downstream filter/pruning
into the descriptor's source scan, which is the whole point of a VRT at
100 TB: the view costs nothing to create and optimizes like the query it
feeds.
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession

from ..grid import GridSpec

VRT_VERSION = 1


def _vrt_xml(desc: dict) -> str:
    """Serialize the descriptor as GDAL VRT XML (the public format at
    gdal.org/drivers/raster/vrt.html — the same on-disk shape the
    reference produces via ``rio_shutil.copy(WarpedVRT, ..., driver=
    'VRT')`` at ``io.py:516-528``): ``<VRTDataset>`` with the target
    grid's size/SRS/GeoTransform and one ``<VRTRasterBand>`` per band
    whose source references the corpus path with Src/Dst rects and the
    resampling algorithm. The full logical-plan payload also rides in a
    ``<Metadata domain="GEOWOMBAT_SPARK">`` block so :func:`open_vrt`
    replays the exact plan from the XML alone; a plain GDAL reader sees
    only standard elements."""
    from xml.etree.ElementTree import Element, SubElement, indent, tostring

    src = GridSpec(**desc["src_grid"])
    dst = GridSpec(**desc["dst_grid"])
    root = Element(
        "VRTDataset",
        rasterXSize=str(dst.ncols),
        rasterYSize=str(dst.nrows),
    )
    SubElement(root, "SRS", dataAxisToSRSAxisMapping="1,2").text = dst.crs
    SubElement(root, "GeoTransform").text = (
        f"{dst.left:.16g}, {dst.cellx:.16g}, 0.0, "
        f"{dst.top:.16g}, 0.0, {-dst.celly:.16g}"
    )
    md = SubElement(root, "Metadata", domain="GEOWOMBAT_SPARK")
    SubElement(md, "MDI", key="descriptor").text = json.dumps(desc)
    nodata = desc.get("nodata")
    for i, b in enumerate(desc["bands"], start=1):
        band = SubElement(
            root, "VRTRasterBand", dataType="Float64", band=str(i)
        )
        SubElement(band, "Description").text = b
        if nodata is not None:
            SubElement(band, "NoDataValue").text = f"{float(nodata):.16g}"
        # ComplexSource carries <NODATA> (masked warp); SimpleSource is
        # the plain case — mirrors what WarpedVRT emits
        tag = "SimpleSource" if nodata is None else "ComplexSource"
        s = SubElement(band, tag, resampling=desc["resampling"])
        SubElement(s, "SourceFilename", relativeToVRT="0").text = desc[
            "source"
        ]
        SubElement(s, "SourceBand").text = str(i)
        SubElement(
            s,
            "SrcRect",
            xOff="0",
            yOff="0",
            xSize=str(src.ncols),
            ySize=str(src.nrows),
        )
        SubElement(
            s,
            "DstRect",
            xOff="0",
            yOff="0",
            xSize=str(dst.ncols),
            ySize=str(dst.nrows),
        )
        if nodata is not None:
            SubElement(s, "NODATA").text = f"{float(nodata):.16g}"
    indent(root)
    return tostring(root, encoding="unicode") + "\n"


def to_vrt(
    source: str,
    filename: str,
    src_grid: GridSpec,
    dst_grid: GridSpec | None = None,
    bands: tuple[str, ...] = ("band_blue",),
    resampling: str = "nearest",
    nodata: float | None = None,
    overwrite: bool = False,
    fmt: str = "xml",
) -> dict | None:
    """Write a VRT for ``source`` (a tiled-parquet corpus path).

    Mirrors ``io.py:455-505``: existing file + ``overwrite=False`` warns and
    returns without writing; default resampling is nearest. ``fmt='xml'``
    (default) writes GDAL VRT XML, the reference's on-disk format;
    ``fmt='json'`` writes the bare JSON descriptor. :func:`open_vrt`
    sniffs and replays either.
    """
    if fmt not in ("xml", "json"):
        raise ValueError(f"fmt must be 'xml' or 'json', got {fmt!r}")
    if os.path.exists(filename):
        if overwrite:
            os.unlink(filename)
        else:
            warnings.warn(
                f"The VRT file {filename} already exists.", stacklevel=2
            )
            return None
    desc = {
        "vrt_version": VRT_VERSION,
        "source": source,
        "bands": list(bands),
        "src_grid": src_grid.as_dict(),
        "dst_grid": (dst_grid or src_grid).as_dict(),
        "resampling": resampling,
        "nodata": nodata,
    }
    with open(filename, "w") as fh:
        if fmt == "xml":
            fh.write(_vrt_xml(desc))
        else:
            json.dump(desc, fh, indent=2)
    return desc


def _parse_vrt_xml(text: str) -> dict:
    """Descriptor from GDAL VRT XML. Prefers the embedded GEOWOMBAT_SPARK
    metadata payload (exact replay); falls back to reconstructing from the
    standard structural elements for a VRT produced by other tools over a
    parquet corpus (bands from <Description>/band order, grids from
    GeoTransform + raster size + source rects, nodata from
    <NoDataValue>)."""
    from xml.etree.ElementTree import fromstring

    root = fromstring(text)
    if root.tag != "VRTDataset":
        raise ValueError("not a VRT dataset")
    mdi = root.find("Metadata[@domain='GEOWOMBAT_SPARK']/MDI[@key='descriptor']")
    if mdi is not None and mdi.text:
        return json.loads(mdi.text)
    gt = [float(v) for v in root.findtext("GeoTransform", "").split(",")]
    ncols = int(root.get("rasterXSize"))
    nrows = int(root.get("rasterYSize"))
    # SRS is optional in the GDAL VRT schema, but fabricating a CRS for a
    # foreign VRT would silently stamp wrong georeferencing on every
    # downstream warp/extract/area op — fail loudly instead.
    crs = (root.findtext("SRS") or "").strip()
    if not crs:
        raise ValueError(
            "foreign VRT has no <SRS> element; cannot infer a CRS — add an "
            "<SRS> (e.g. EPSG:32621) or regenerate the VRT with to_vrt()"
        )
    bands, source, resampling, nodata = [], None, "nearest", None
    src_ncols, src_nrows = ncols, nrows
    for i, band in enumerate(root.findall("VRTRasterBand"), start=1):
        bands.append(band.findtext("Description") or f"band_{i}")
        nd = band.findtext("NoDataValue")
        if nd is not None:
            # the descriptor carries ONE nodata for all bands — letting
            # the last band's value silently win would mask the wrong
            # pixels in every other band, so conflicting per-band values
            # fail as loudly as a missing SRS does above
            if nodata is not None and float(nd) != nodata:
                raise ValueError(
                    "foreign VRT declares conflicting per-band "
                    f"NoDataValue ({nodata} vs {float(nd)}); the replay "
                    "descriptor supports a single nodata — harmonize the "
                    "bands or regenerate with to_vrt()"
                )
            nodata = float(nd)
        s = band.find("SimpleSource")
        if s is None:
            s = band.find("ComplexSource")
        if s is not None:
            source = s.findtext("SourceFilename") or source
            resampling = s.get("resampling", resampling)
            rect = s.find("SrcRect")
            if rect is not None:
                src_ncols = int(rect.get("xSize"))
                src_nrows = int(rect.get("ySize"))
    if source is None:
        raise ValueError("VRT has no band sources")
    dst = dict(
        left=gt[0], top=gt[3], cellx=gt[1], celly=-gt[5],
        nrows=nrows, ncols=ncols, crs=crs,
        **({"nodata": nodata} if nodata is not None else {}),
    )
    # without the metadata payload the source grid shares the dst affine
    # scaled to the source rect — exact for the identity / pure-resample
    # cases a foreign VRT can express over a parquet corpus
    srcg = dict(
        dst,
        nrows=src_nrows,
        ncols=src_ncols,
        cellx=gt[1] * ncols / src_ncols,
        celly=-gt[5] * nrows / src_nrows,
    )
    return {
        "vrt_version": VRT_VERSION,
        "source": source,
        "bands": bands,
        "src_grid": srcg,
        "dst_grid": dst,
        "resampling": resampling,
        "nodata": nodata,
    }


def open_vrt(spark: SparkSession, filename: str) -> DataFrame:
    """Open a VRT descriptor as a lazy DataFrame (the warp replays in the
    plan; identical grids short-circuit to the bare scan — the reference's
    no-op VRT fast path, ``backends/rasterio_.py:981-1004``)."""
    from ..functions.nodata import set_nodata
    from ..operators.transform import transform_grid

    with open(filename) as fh:
        text = fh.read()
    if text.lstrip().startswith("<"):
        desc = _parse_vrt_xml(text)
    else:
        desc = json.loads(text)
    if desc.get("vrt_version") != VRT_VERSION:
        raise ValueError(f"unsupported VRT version in {filename}")
    from .tables import load_documents

    # load_documents handles the single-parquet-file source (basePath must
    # be a directory) as well as the tile-partitioned layout
    df = load_documents(spark, desc["source"])
    src = GridSpec(**desc["src_grid"])
    dst = GridSpec(**desc["dst_grid"])
    bands = tuple(desc["bands"])
    out = transform_grid(
        spark, df, src, dst, bands=bands, resampling=desc["resampling"]
    )
    if desc.get("nodata") is not None:
        out = set_nodata(out, bands, src_nodata=desc["nodata"])
    return out
