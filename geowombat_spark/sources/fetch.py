"""Distributed asset fetch: the reference's download-manager surface,
offline.

Reference parity: ``GeoDownloads.download_gcp``
(``src/geowombat/util/web.py:341-520``) lists remote keys, filters them by
wildcard, downloads in parallel with ``n_jobs``, skips files that already
exist locally, and returns per-file status records. This module
re-expresses that shape Spark-first over a *manifest DataFrame* — the
asset list IS a table, the parallel download IS a ``mapInPandas`` stage
over manifest partitions, and the status records come back as a DataFrame
(so a 10M-asset ingest is just another distributed job: the driver never
touches asset bytes).

Offline contract: only ``file://`` (and bare-path) URIs are fetched —
this sandbox has no network, and silently shipping an HTTP client that
was never exercised would be worse than an honest gate. Network schemes
raise ``NotImplementedError`` at plan time with the scheme named —
``fetch_assets`` probes the manifest driver-side (a short-circuiting
``limit(1)`` scan) BEFORE the copy stage launches, so a mixed manifest
never fails mid-stage with assets already published; a row that still
reaches an executor with a bad scheme degrades to ``status='error'``.
The verify/resume/quarantine semantics below are scheme-independent: a
future network fetcher only swaps the byte-copy callable.

Semantics (each asserted in ``tests/test_fetch.py``):

- **resume**: an asset whose destination exists AND verifies (size and,
  when the manifest carries one, sha256) is skipped — rerunning a killed
  ingest re-copies only what is missing or wrong, the same
  output-exists resume the tiled sink uses.
- **verify + quarantine**: a fetched (or pre-existing) asset that fails
  its manifest checksum is moved aside to ``<dest>.corrupt`` and reported
  with ``status='corrupt'`` — never left in place as a plausible-looking
  good file.
- **atomic publish**: bytes land in a per-attempt unique temp
  (``<dest>.inprogress.<pid>.<uuid>``) and rename into place only after
  the post-copy verify, so readers (and the resume check) can never
  observe a half-copied asset, and concurrent/speculative attempts can
  never interleave writes into one temp file. Abandoned temps (either
  naming generation) are swept by age at the start of each run.
"""

from __future__ import annotations

import fnmatch
import hashlib
import os
import re
import shutil
import time
from urllib.parse import urlparse
from uuid import uuid4

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

FETCH_SCHEMA = (
    "asset_id string, dest string, status string, bytes long, error string"
)

_ALLOWED_SCHEMES = ("", "file")

# exact per-attempt temp shape ('<dest>.inprogress.<pid>.<uuid4 hex>') —
# the sweep must match ONLY names this module generated; a published asset
# whose own id merely contains '.inprogress.' must never be reclaimed
_TEMP_NAME_RE = re.compile(r"\.inprogress\.\d+\.[0-9a-f]{32}$")


def _local_path(uri: str) -> str:
    p = urlparse(uri)
    if p.scheme not in _ALLOWED_SCHEMES:
        raise NotImplementedError(
            f"fetch_assets: scheme {p.scheme!r} is not supported in this "
            "offline build — only file:// (or bare-path) sources; see the "
            "module docstring"
        )
    return p.path if p.scheme == "file" else uri


def _sha256(path: str) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as f:
        for chunk in iter(lambda: f.read(1 << 20), b""):
            h.update(chunk)
    return h.hexdigest()


def _verifies(dest: str, size, sha) -> bool:
    if not os.path.exists(dest):
        return False
    if size is not None and os.path.getsize(dest) != int(size):
        return False
    if sha is not None and _sha256(dest) != sha:
        return False
    return True


def search_assets(manifest: DataFrame, wildcards: list[str]) -> DataFrame:
    """Filter a manifest by filename wildcards — the
    ``search_wildcards`` semantics of ``download_gcp``
    (``web.py:404-410``: ``fnmatch.filter(list, '*' + wild)``), expressed
    as a pushdown-friendly Column predicate. Plain ``*``/``?`` wildcards
    translate to ``LIKE`` (so Catalyst can prune at the manifest scan);
    a wildcard using fnmatch character classes (``[seq]``/``[!seq]``)
    falls back to ``rlike`` over ``fnmatch.translate`` — full fnmatch
    semantics either way."""
    base = F.element_at(F.split(F.col("uri"), "/"), -1)
    conds = None
    for w in wildcards:
        if "[" in w:
            c = base.rlike(fnmatch.translate("*" + w))
        else:
            like = (
                "%"
                + w.replace("\\", "\\\\").replace("%", "\\%")
                .replace("_", "\\_").replace("*", "%").replace("?", "_")
            )
            c = base.like(like)
        conds = c if conds is None else (conds | c)
    return manifest.filter(conds) if conds is not None else manifest


def fetch_assets(
    manifest: DataFrame,
    outdir: str,
    resume: bool = True,
    n_partitions: int | None = None,
    sweep_temp_age_s: float = 3600.0,
) -> DataFrame:
    """Fetch every manifest row's asset into ``outdir``; return a status
    frame (``asset_id, dest, status, bytes, error``).

    ``manifest`` columns: ``asset_id`` (string, becomes the local file
    name — must be a bare name, no path separators), ``uri`` (source),
    optional ``size`` (long) and ``sha256`` (string) for verification.
    ``status`` per row: ``fetched`` | ``skipped`` (resume hit) |
    ``corrupt`` (quarantined) | ``missing`` (source absent) | ``error``
    (LOCAL failure — disk full, permissions, bad asset_id; the source is
    not implicated and any partial temp file is cleaned up).

    A pre-existing destination that fails its manifest checksum is
    quarantined to ``<dest>.corrupt`` BEFORE the re-fetch is attempted,
    so a stale or tampered file can never stay published when the fresh
    copy also fails — the published path only ever holds bytes that
    verified against the current manifest.

    Statuses are rerun-sensitive by design: a retried task (or a second
    run) reports already-published assets as ``skipped`` rather than
    ``fetched`` — the bytes on disk are identical either way, so durable
    assertions should pin ``n_fetched + n_skipped`` (``fetch_report``'s
    ``n_ok``), not the split.

    One ``mapInPandas`` stage over manifest partitions — each task copies
    its slice of assets; with ``n_partitions`` (default: leave the
    manifest's partitioning) a 10M-asset manifest fans out across the
    cluster and the driver only ever sees the tiny status rows.

    Unsupported URI schemes are rejected HERE, driver-side, before any
    executor copies a byte (a pushdown-friendly ``limit(1)`` probe over
    the manifest — it short-circuits at the first offending row), so a
    mixed manifest can never fail mid-stage with half the assets already
    published. On an all-clean manifest the probe evaluates the
    column-pruned ``uri`` projection end-to-end once before the copy
    stage does — if the manifest is the product of expensive lineage
    (joins/filters), ``persist()`` it before calling, or the upstream
    plan runs twice. Duplicate ``asset_id`` rows are allowed: each task writes
    through its own unique temp file and publishes atomically, so the
    destination only ever holds ONE writer's complete verified copy
    (last publish wins) — never an interleaved blend. Dedupe the manifest
    upstream when duplicate ids carry *different* bytes, since the
    surviving copy is then order-dependent.

    **Orphan temp reclamation**: per-attempt unique temp names mean a
    hard-killed task (OOM, speculative cancel) can leave a partial
    ``<dest>.inprogress.<pid>.<uuid>`` behind that no retry ever reuses —
    unlike a fixed temp name, nothing overwrites it. Each run therefore
    sweeps, driver-side before the copy stage, temp files older than
    ``sweep_temp_age_s`` (default 1 h). The age floor keeps the sweep safe
    against a concurrent fetch job actively writing into the same outdir:
    a LIVE writer's temp is minutes old and survives; only genuinely
    abandoned partials accumulate past the floor. Pass ``0`` to reclaim
    everything (single-job-per-outdir deployments)."""
    os.makedirs(outdir, exist_ok=True)
    now = time.time()
    for e in os.scandir(outdir):
        # both the per-attempt names (exact pattern match — an asset
        # whose id merely CONTAINS '.inprogress.' is not a temp) and the
        # legacy fixed name ('<dest>.inprogress') from builds before the
        # unique-temp change: the old partials are never reused or
        # overwritten by the new naming, so without this they would leak
        # forever. (An asset id literally ENDING in '.inprogress' is
        # indistinguishable from a legacy partial and is still swept.)
        if e.is_file() and (
            _TEMP_NAME_RE.search(e.name) or e.name.endswith(".inprogress")
        ):
            try:
                if now - e.stat().st_mtime >= sweep_temp_age_s:
                    os.unlink(e.path)
            except OSError:
                pass  # raced with a concurrent publisher — its problem
    cols = {f.name for f in manifest.schema.fields}
    if not {"asset_id", "uri"} <= cols:
        raise ValueError("manifest must carry asset_id and uri columns")
    bad = (
        manifest.select(
            # match urlparse's scheme rule (used by _local_path on the
            # executor): anything before the FIRST ':' counts, slashes or
            # not — 'hdfs:/tmp/x' must fail here, not degrade per-row
            F.regexp_extract(
                F.col("uri").cast("string"), r"^([A-Za-z][A-Za-z0-9+.-]*):", 1
            ).alias("_scheme")
        )
        .filter(~F.lower(F.col("_scheme")).isin(*_ALLOWED_SCHEMES))
        .limit(1)
        .collect()
    )
    if bad:
        raise NotImplementedError(
            f"fetch_assets: scheme {bad[0]['_scheme'].lower()!r} is not "
            "supported in this offline build — only file:// (or bare-path) "
            "sources; see the module docstring"
        )
    sel = [
        F.col("asset_id").cast("string").alias("asset_id"),
        F.col("uri").cast("string").alias("uri"),
    ]
    # explicit aliases: the NULL-literal fallbacks otherwise surface as
    # 'CAST(NULL AS BIGINT)' column names and the kernel's pdf["size"]
    # lookup KeyErrors — the documented optional-columns case
    sel.append(
        (
            F.col("size").cast("long")
            if "size" in cols
            else F.lit(None).cast("long")
        ).alias("size")
    )
    sel.append(
        (
            F.col("sha256").cast("string")
            if "sha256" in cols
            else F.lit(None).cast("string")
        ).alias("sha256")
    )
    m = manifest.select(*sel)
    if n_partitions:
        m = m.repartition(n_partitions)

    def _fetch(it):
        for pdf in it:
            out = []
            for asset_id, uri, size, sha in zip(
                pdf["asset_id"], pdf["uri"], pdf["size"], pdf["sha256"]
            ):
                size = None if pd.isna(size) else int(size)
                sha = None if sha is None or pd.isna(sha) else str(sha)
                aid = str(asset_id)
                rec = dict(
                    asset_id=aid,
                    dest=os.path.join(outdir, aid),
                    status="fetched",
                    bytes=0,
                    error=None,
                )
                # asset_id is a file NAME, never a path: a separator or
                # '..' would write outside outdir (or fail and blame the
                # source) — reject in-row, don't raise the whole task
                if os.path.basename(aid) != aid or aid in ("", ".", ".."):
                    rec.update(
                        status="error",
                        error="asset_id must be a bare file name",
                    )
                    out.append(rec)
                    continue
                dest = rec["dest"]
                # unique per task attempt: duplicate asset_id rows or a
                # speculative/retried task must never interleave writes
                # into a shared temp file — each writer publishes its own
                # complete verified copy via one atomic os.replace
                tmp = f"{dest}.inprogress.{os.getpid()}.{uuid4().hex}"
                try:
                    try:
                        src = _local_path(str(uri))
                    except NotImplementedError as e:
                        # defense-in-depth: the driver-side probe rejects
                        # these at plan time; a row that still slips
                        # through degrades to a status row instead of
                        # killing the task mid-stage
                        rec.update(status="error", error=str(e)[:200])
                        out.append(rec)
                        continue
                    if os.path.exists(dest) and not _verifies(
                        dest, size, sha
                    ):
                        # quarantine the stale/tampered published copy
                        # FIRST: if the re-fetch below also fails, the
                        # published path must not keep serving bytes that
                        # fail the current manifest
                        shutil.move(dest, dest + ".corrupt")
                    elif resume and os.path.exists(dest):
                        rec.update(
                            status="skipped", bytes=os.path.getsize(dest)
                        )
                        out.append(rec)
                        continue
                    if not os.path.exists(src):
                        rec.update(status="missing", error="source not found")
                        out.append(rec)
                        continue
                    shutil.copyfile(src, tmp)
                    if not _verifies(tmp, size, sha):
                        # quarantine, never publish a bad asset
                        shutil.move(tmp, dest + ".corrupt")
                        rec.update(
                            status="corrupt",
                            error="size/sha256 mismatch vs manifest",
                        )
                        out.append(rec)
                        continue
                    os.replace(tmp, dest)  # atomic publish
                    rec.update(bytes=os.path.getsize(dest))
                except OSError as e:
                    # a LOCAL failure (disk full, permissions): the source
                    # is not implicated — distinct status, temp cleaned up
                    try:
                        if os.path.exists(tmp):
                            os.remove(tmp)
                    except OSError:
                        pass
                    rec.update(status="error", error=str(e)[:200])
                out.append(rec)
            yield pd.DataFrame(
                out,
                columns=["asset_id", "dest", "status", "bytes", "error"],
            )

    return m.mapInPandas(_fetch, FETCH_SCHEMA)


def fetch_report(status: DataFrame) -> DataFrame:
    """One-row rollup of a fetch status frame (counts + bytes moved).

    ``n_ok = n_fetched + n_skipped`` is the rerun-stable count: a Spark
    task retry or a second action on the same frame flips fetched →
    skipped for already-published assets (the bytes are identical), so
    durable assertions should pin ``n_ok``, not the split."""
    return status.agg(
        F.count(F.lit(1)).alias("n_assets"),
        F.sum(
            F.col("status").isin("fetched", "skipped").cast("long")
        ).alias("n_ok"),
        F.sum((F.col("status") == "fetched").cast("long")).alias("n_fetched"),
        F.sum((F.col("status") == "skipped").cast("long")).alias("n_skipped"),
        F.sum((F.col("status") == "corrupt").cast("long")).alias("n_corrupt"),
        F.sum((F.col("status") == "missing").cast("long")).alias("n_missing"),
        F.sum((F.col("status") == "error").cast("long")).alias("n_error"),
        F.sum(F.col("bytes")).alias("bytes_total"),
    )
