"""Transverse Mercator CRS layer + prepare_points AOI normalization.

Anchors: exact central-meridian/equator identities and the published WGS84
meridian-arc length at 45° (4984944.378 m × k0 = 4982950.400) — independent
of this implementation. Round-trips must close to machine precision.
Reference semantics: ``conversion.py:338-436`` (prepare_points),
``conversion.py:61-123`` (lonlat_to_xy).
"""

import numpy as np
import pandas as pd
import pytest

from geowombat_spark import crs
from geowombat_spark.grid import GridSpec
from geowombat_spark.operators import extract as ex


def test_anchor_points():
    e, n = crs.lonlat_to_utm(np.array([3.0]), np.array([0.0]), zone=31)
    assert abs(e[0] - 500000.0) < 1e-6 and abs(n[0]) < 1e-6
    e, n = crs.lonlat_to_utm(np.array([9.0]), np.array([45.0]), zone=32)
    assert abs(e[0] - 500000.0) < 1e-6
    assert abs(n[0] - 4982950.400) < 0.01  # meridian arc * k0 (published)


def test_round_trip_cloud():
    rng = np.random.default_rng(7)
    lon = 3.0 + rng.uniform(-2.9, 2.9, 500)
    lat = rng.uniform(-84, 84, 500)
    E, N = crs.lonlat_to_utm(lon, lat, 31)
    lon2, lat2 = crs.utm_to_lonlat(E, N, 31)
    assert np.abs(lon2 - lon).max() < 1e-9
    assert np.abs(lat2 - lat).max() < 1e-9


def test_south_hemisphere_false_northing():
    E, N = crs.lonlat_to_utm(np.array([-57.0]), np.array([-25.2]), 21, south=True)
    assert 0 < N[0] < 10000000.0  # false northing applied
    lon, lat = crs.utm_to_lonlat(E, N, 21, south=True)
    assert abs(lon[0] + 57.0) < 1e-9 and abs(lat[0] + 25.2) < 1e-9


def test_parse_utm_epsg():
    assert crs.parse_utm_epsg(32621) == (21, False)
    assert crs.parse_utm_epsg(32721) == (21, True)
    with pytest.raises(ValueError):
        crs.parse_utm_epsg(4326)


GRID = GridSpec(
    left=400000.0, top=7300000.0, cellx=30.0, celly=30.0, nrows=1000,
    ncols=1000, tile_rows=500, tile_cols=500, crs="EPSG:32721", nodata=0.0,
)


def test_prepare_points_reproject_matches_manual():
    lon = np.array([-57.5, -57.6, -57.7])
    lat = np.array([-24.5, -24.45, -24.6])
    aoi = pd.DataFrame({"id": [1, 2, 3], "x": lon, "y": lat})
    prepped = ex.prepare_points(aoi, GRID, aoi_epsg=4326)
    ex_x, ex_y = crs.lonlat_to_utm(lon, lat, 21, south=True)
    inb = (
        (ex_x >= GRID.left) & (ex_x < GRID.right)
        & (ex_y <= GRID.top) & (ex_y > GRID.bottom)
    )
    assert len(prepped) == inb.sum()
    np.testing.assert_allclose(prepped["x"].values, ex_x[inb])
    np.testing.assert_allclose(prepped["y"].values, ex_y[inb])


def test_prepare_points_bounds_and_mask():
    aoi = pd.DataFrame(
        {
            "id": [1, 2, 3, 4],
            "x": [400100.0, 400200.0, 99.0, 415000.0],  # 3rd out of bounds
            "y": [7299900.0, 7299800.0, 7299900.0, 7299000.0],
        }
    )
    prepped = ex.prepare_points(aoi, GRID)
    assert list(prepped["id"]) == [1, 2, 4]
    # mask: square around the first two points only
    mask = [[400050.0, 7299950.0, 400250.0, 7299950.0,
             400250.0, 7299750.0, 400050.0, 7299750.0]]
    masked = ex.prepare_points(aoi, GRID, mask_rings=mask)
    assert list(masked["id"]) == [1, 2]


def test_prepare_points_adds_id():
    aoi = pd.DataFrame({"x": [400100.0], "y": [7299900.0]})
    prepped = ex.prepare_points(aoi, GRID)
    assert "id" in prepped.columns
