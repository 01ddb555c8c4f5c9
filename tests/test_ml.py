"""Distributed classification tests (reference ``ml/classifiers.py:296-600``)."""

import numpy as np
import pandas as pd
import pytest

from geowombat_spark import ml
from geowombat_spark.grid import GridSpec, zorder_encode

MG = GridSpec(
    left=0.0, top=320.0, cellx=10.0, celly=10.0,
    nrows=32, ncols=32, tile_rows=32, tile_cols=32,
)


def _ml_pdf():
    """Two linearly separable spectral classes split by column half, plus a
    little deterministic jitter."""
    rr, cc = np.meshgrid(np.arange(32), np.arange(32), indexing="ij")
    rr, cc = rr.ravel(), cc.ravel()
    left = (cc < 16).astype(np.float64)
    jit = ((rr * 31 + cc * 17) % 7).astype(np.float64)
    return pd.DataFrame(
        {
            "row": rr,
            "col": cc,
            "cell_id": zorder_encode(rr, cc),
            "band_blue": 40.0 + 100.0 * left + jit,
            "band_green": 60.0 + 80.0 * left + jit,
            "band_red": 150.0 - 90.0 * left + jit,
            "truth": 2.0 - left,  # class 1 left half, class 2 right half
        }
    )


def _label_polys():
    """Two training rectangles, one inside each class region, carrying the
    class value in 'cls'."""
    return pd.DataFrame(
        [
            {"fid": 1, "cls": 1.0,
             "rings": [[20.0, 300.0, 140.0, 300.0, 140.0, 180.0, 20.0, 180.0, 20.0, 300.0]]},
            {"fid": 2, "cls": 2.0,
             "rings": [[180.0, 140.0, 300.0, 140.0, 300.0, 20.0, 180.0, 20.0, 180.0, 140.0]]},
        ]
    )


@pytest.fixture(scope="module")
def ml_docs(spark):
    return spark.createDataFrame(_ml_pdf()).repartition(4)


def test_fit_predict_supervised(spark, ml_docs):
    from pyspark.ml.classification import LogisticRegression

    out = ml.fit_predict(
        spark, ml_docs, MG, LogisticRegression(maxIter=30),
        labels=_label_polys(), col="cls",
    ).select("row", "col", "truth", "pred").toPandas()
    acc = (out["pred"] == out["truth"]).mean()
    assert acc >= 0.95, acc
    assert len(out) == 32 * 32


def test_fit_returns_reusable_model(spark, ml_docs):
    from pyspark.ml.classification import RandomForestClassifier

    model = ml.fit(
        spark, ml_docs, MG,
        RandomForestClassifier(numTrees=10, seed=7),
        labels=_label_polys(), col="cls",
    )
    out = ml.predict(ml_docs, model).toPandas()
    assert set(out["pred"].unique()) <= {1.0, 2.0}
    assert "features" not in out.columns


def test_unsupervised_kmeans_skips_labels(spark, ml_docs):
    from pyspark.ml.clustering import KMeans

    out = ml.fit_predict(
        spark, ml_docs, MG, KMeans(k=2, seed=3)
    ).toPandas()
    assert set(out["pred"].unique()) == {0, 1}
    # clusters should align with the two spectral classes (up to label swap)
    a = (out["pred"] == (out["truth"] - 1)).mean()
    assert max(a, 1 - a) >= 0.95


def test_supervised_without_labels_raises(spark, ml_docs):
    from pyspark.ml.classification import LogisticRegression

    with pytest.raises(ValueError):
        ml.fit(spark, ml_docs, MG, LogisticRegression())


def test_binary_burn_default_value(spark, ml_docs):
    """col=None burns a binary raster (reference default): every labeled
    cell trains with class 1."""
    from pyspark.ml.classification import LogisticRegression

    model = ml.fit(
        spark, ml_docs, MG, LogisticRegression(maxIter=5),
        labels=_label_polys(),
    )
    out = ml.predict(ml_docs, model).toPandas()
    assert set(out["pred"].unique()) == {1.0}
