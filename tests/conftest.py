import shutil
import tempfile

import pandas as pd
import pytest

from geowombat_spark.fixtures import (
    AOI_POINTS,
    AOI_POLYGONS,
    build_corpus,
    corpus_windows_for_tests,
)
from geowombat_spark.sources.tables import corpus_df, get_spark


@pytest.fixture(scope="session")
def spark():
    s = get_spark(app="gw-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_dir():
    d = tempfile.mkdtemp(prefix="gw_corpus_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


@pytest.fixture(scope="session")
def docs(spark, corpus_dir):
    """Single-time corpus over the test windows, tile-partitioned on disk."""
    table = build_corpus(windows=corpus_windows_for_tests(), with_span_hash=True)
    return corpus_df(spark, table, corpus_dir + "/t1")


@pytest.fixture(scope="session")
def aoi_points_pdf():
    return pd.DataFrame(AOI_POINTS)[["id", "x", "y"]]


@pytest.fixture(scope="session")
def aoi_polygons_pdf():
    return pd.DataFrame(
        [{"fid": p["fid"], "name": p["name"], "rings": p["rings"]} for p in AOI_POLYGONS]
    )
