"""Distributed asset fetch (sources/fetch.py; reference
GeoDownloads.download_gcp shape, util/web.py:341-520) — resume, verify,
quarantine, wildcard search, offline scheme gate."""

import hashlib
import os
import tempfile

import pytest
from pyspark.sql import functions as F

from geowombat_spark.sources.fetch import (
    fetch_assets,
    fetch_report,
    search_assets,
)


@pytest.fixture(scope="module")
def remote_dir():
    d = tempfile.mkdtemp(prefix="gw_remote_")
    payloads = {}
    for i in range(6):
        name = f"scene_{i}_B{i % 3 + 1}.bin"
        data = bytes([i]) * (100 + i)
        with open(os.path.join(d, name), "wb") as f:
            f.write(data)
        payloads[name] = data
    return d, payloads


def _manifest(spark, remote_dir, names, payloads, with_sha=True):
    rows = []
    for n in names:
        rows.append(
            (
                n,
                "file://" + os.path.join(remote_dir, n),
                len(payloads[n]),
                hashlib.sha256(payloads[n]).hexdigest() if with_sha else None,
            )
        )
    return spark.createDataFrame(
        rows, "asset_id string, uri string, size long, sha256 string"
    )


def test_fetch_verify_resume_quarantine(spark, remote_dir):
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    names = sorted(payloads)
    m = _manifest(spark, d, names, payloads)

    st = {r["asset_id"]: r for r in fetch_assets(m, out).collect()}
    assert all(r["status"] == "fetched" for r in st.values())
    for n in names:  # bytes are byte-identical to the source
        assert open(os.path.join(out, n), "rb").read() == payloads[n]

    # rerun: everything resume-skips (exists + verifies)
    st2 = {r["asset_id"]: r for r in fetch_assets(m, out).collect()}
    assert all(r["status"] == "skipped" for r in st2.values())

    # corrupt one local copy -> re-fetched (fails verify, re-copied)
    with open(os.path.join(out, names[0]), "wb") as f:
        f.write(b"garbage")
    st3 = {r["asset_id"]: r for r in fetch_assets(m, out).collect()}
    assert st3[names[0]]["status"] == "fetched"
    assert open(os.path.join(out, names[0]), "rb").read() == payloads[names[0]]

    # manifest checksum that no source can satisfy -> quarantined,
    # nothing published at the destination path
    bad = m.withColumn(
        "sha256",
        F.when(F.col("asset_id") == names[1], F.lit("0" * 64)).otherwise(
            F.col("sha256")
        ),
    )
    os.remove(os.path.join(out, names[1]))
    st4 = {r["asset_id"]: r for r in fetch_assets(bad, out).collect()}
    assert st4[names[1]]["status"] == "corrupt"
    assert not os.path.exists(os.path.join(out, names[1]))
    assert os.path.exists(os.path.join(out, names[1] + ".corrupt"))

    # missing source reported, not raised (fresh asset_id so the
    # resume-skip can't fire first)
    ghost = spark.createDataFrame(
        [("ghost.bin", "file://" + os.path.join(d, "nope.bin"), None, None)],
        "asset_id string, uri string, size long, sha256 string",
    )
    assert fetch_assets(ghost, out).collect()[0]["status"] == "missing"

    rep = fetch_report(fetch_assets(m, out)).collect()[0]
    assert rep["n_assets"] == 6 and rep["n_corrupt"] == 0


def test_search_assets_wildcards(spark, remote_dir):
    d, payloads = remote_dir
    m = _manifest(spark, d, sorted(payloads), payloads)
    # download_gcp's search_wildcards semantics: '*' + wild on basename
    got = {
        r["asset_id"]
        for r in search_assets(m, ["B1.bin"]).collect()
    }
    assert got == {n for n in payloads if n.endswith("B1.bin")}
    both = {
        r["asset_id"]
        for r in search_assets(m, ["B1.bin", "B2.bin"]).collect()
    }
    assert both == {
        n for n in payloads if n.endswith(("B1.bin", "B2.bin"))
    }
    # '?' maps to single-char match
    q = {r["asset_id"] for r in search_assets(m, ["scene_?_B1.bin"]).collect()}
    assert q == got


def test_fetch_rejects_network_schemes(spark, remote_dir):
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    m = spark.createDataFrame(
        [("a", "https://example.invalid/x.bin", None, None)],
        "asset_id string, uri string, size long, sha256 string",
    )
    # rejected at PLAN time (driver-side probe), before any copy stage:
    # fetch_assets itself raises — no .collect() needed
    with pytest.raises(NotImplementedError, match="scheme 'https' is not supported"):
        fetch_assets(m, out)
    # single-slash scheme URIs (urlparse still sees a scheme) must hit
    # the SAME plan-time gate, not degrade to per-row status='error'
    m2 = spark.createDataFrame(
        [("a", "hdfs:/tmp/x.bin", None, None)],
        "asset_id string, uri string, size long, sha256 string",
    )
    with pytest.raises(NotImplementedError, match="scheme 'hdfs' is not supported"):
        fetch_assets(m2, out)


def test_duplicate_asset_ids_publish_one_verified_copy(spark, remote_dir):
    """Duplicate asset_id rows (or a speculative retry) write through
    UNIQUE temp files: the destination only ever holds one writer's
    complete verified copy, never an interleaved blend, and no stale
    .inprogress files survive."""
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    name = sorted(payloads)[0]
    m = _manifest(spark, d, [name] * 4, payloads).repartition(4)
    st = fetch_assets(m, out, resume=False).collect()
    assert len(st) == 4
    assert {r["status"] for r in st} <= {"fetched", "skipped"}
    assert open(os.path.join(out, name), "rb").read() == payloads[name]
    leftovers = [f for f in os.listdir(out) if ".inprogress" in f]
    assert leftovers == []


def test_stale_dest_quarantined_even_when_refetch_fails(spark, remote_dir):
    """A published file that fails the CURRENT manifest checksum must not
    stay at the published path when the re-fetch cannot replace it — the
    stale copy is quarantined first (contract: the published path only
    ever holds bytes that verified against the current manifest)."""
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    name = sorted(payloads)[0]
    # publish a stale file at dest, point the manifest at an ABSENT source
    with open(os.path.join(out, name), "wb") as f:
        f.write(b"stale bytes")
    m = spark.createDataFrame(
        [(name, "file://" + os.path.join(d, "gone.bin"), len(payloads[name]),
          hashlib.sha256(payloads[name]).hexdigest())],
        "asset_id string, uri string, size long, sha256 string",
    )
    st = fetch_assets(m, out).collect()[0]
    assert st["status"] == "missing"
    assert not os.path.exists(os.path.join(out, name))
    assert os.path.exists(os.path.join(out, name + ".corrupt"))


def test_bad_asset_id_is_error_not_escape(spark, remote_dir):
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    name = sorted(payloads)[0]
    m = spark.createDataFrame(
        [("../evil.bin", "file://" + os.path.join(d, name), None, None),
         ("sub/dir.bin", "file://" + os.path.join(d, name), None, None)],
        "asset_id string, uri string, size long, sha256 string",
    )
    st = {r["asset_id"]: r for r in fetch_assets(m, out).collect()}
    assert all(r["status"] == "error" for r in st.values()), st
    assert not os.path.exists(os.path.join(out, "..", "evil.bin"))
    rep = fetch_report(fetch_assets(m, out)).collect()[0]
    assert rep["n_error"] == 2 and rep["n_ok"] == 0


def test_search_assets_character_classes(spark, remote_dir):
    d, payloads = remote_dir
    m = _manifest(spark, d, sorted(payloads), payloads)
    got = {r["asset_id"] for r in search_assets(m, ["B[12].bin"]).collect()}
    assert got == {n for n in payloads if n.endswith(("B1.bin", "B2.bin"))}
    neg = {r["asset_id"] for r in search_assets(m, ["B[!1].bin"]).collect()}
    assert neg == {n for n in payloads if not n.endswith("B1.bin")}


def test_minimal_manifest_without_size_or_sha(spark, remote_dir):
    """size/sha256 are documented optional: a two-column manifest must
    fetch (vacuous verification), not KeyError in the worker — the NULL
    fallback literals need explicit aliases."""
    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    name = sorted(payloads)[0]
    m = spark.createDataFrame(
        [(name, "file://" + os.path.join(d, name))],
        "asset_id string, uri string",
    )
    st = fetch_assets(m, out).collect()
    assert len(st) == 1 and st[0]["status"] == "fetched", st
    assert open(os.path.join(out, name), "rb").read() == payloads[name]


def test_orphan_temp_sweep(spark, remote_dir):
    """Hard-killed attempts leave unique .inprogress.* temps nothing
    overwrites; the driver-side sweep reclaims ones past the age floor
    and leaves fresh ones (a possible live concurrent writer) alone."""
    import time as _time

    d, payloads = remote_dir
    out = tempfile.mkdtemp(prefix="gw_fetched_")
    name = sorted(payloads)[0]
    old_tmp = os.path.join(out, f"{name}.inprogress.1.{'a' * 32}")
    new_tmp = os.path.join(out, f"{name}.inprogress.2.{'b' * 32}")
    # legacy fixed-name partial from a build before per-attempt temps:
    # nothing ever reuses or overwrites it, so the sweep must match the
    # bare '.inprogress' suffix too or it leaks forever
    legacy_tmp = os.path.join(out, f"{name}.inprogress")
    for p in (old_tmp, new_tmp, legacy_tmp):
        with open(p, "wb") as f:
            f.write(b"partial")
    _time_old = _time.time() - 7200
    os.utime(old_tmp, (_time_old, _time_old))
    os.utime(legacy_tmp, (_time_old, _time_old))
    m = spark.createDataFrame(
        [(name, "file://" + os.path.join(d, name))],
        "asset_id string, uri string",
    )
    assert fetch_assets(m, out).collect()[0]["status"] == "fetched"
    assert not os.path.exists(old_tmp), "stale orphan survived the sweep"
    assert not os.path.exists(legacy_tmp), "legacy fixed-name orphan leaked"
    assert os.path.exists(new_tmp), "fresh temp was wrongly reclaimed"
    st = fetch_assets(m, out, sweep_temp_age_s=0).collect()
    assert st[0]["status"] == "skipped"
    assert not os.path.exists(new_tmp), "age=0 must reclaim everything"

    # a PUBLISHED asset whose own id merely contains '.inprogress.' is
    # not a temp: the sweep must match the exact generated pattern
    # ('.inprogress.<pid>.<32-hex>'), never a bare substring
    lookalike = os.path.join(out, "report.inprogress.2024.bin")
    with open(lookalike, "wb") as f:
        f.write(b"published asset")
    os.utime(lookalike, (_time_old, _time_old))
    fetch_assets(m, out, sweep_temp_age_s=0).collect()
    assert os.path.exists(lookalike), (
        "published asset with '.inprogress.' in its name was reclaimed"
    )
