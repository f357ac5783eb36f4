"""WARC ingestion — Common-Crawl-style WARC files -> the input_hint pages
table (url, warc_ts, html, text, lang).

The north-rule input is an Iceberg table of Common-Crawl-style pages; the
upstream data for such a table ships as WARC (ISO 28500) files, so this is
the ingest seam a reference user needs to feed the engine from real crawl
archives. Stdlib-only parse (no warcio in the container), exercised against
deterministic synthetic WARCs built by build_warc_bytes below.

Scale shape: `spark.read.format("binaryFile")` gives one task per file —
Common Crawl publishes ~1 GB .warc.gz segments in the hundreds of thousands
per snapshot, so file-level parallelism saturates any executor count without
a splittable decoder (100 TB / 1 GB = 100k tasks). Records stream out of
mapInPandas in bounded Arrow batches; gzip input decodes MEMBER-AT-A-TIME
(Common Crawl gzips one record per member), so peak per-task memory is the
compressed file plus one in-flight record — never the whole decompressed
archive.
"""

from __future__ import annotations

import gzip
import io
import zlib
from datetime import datetime, timezone
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"


def _parse_headers(block: bytes) -> dict[str, str]:
    headers: dict[str, str] = {}
    for line in block.split(_CRLF):
        if b":" in line:
            k, v = line.split(b":", 1)
            headers[k.strip().decode("latin-1").lower()] = v.strip().decode("latin-1")
    return headers


def _record_from(headers: dict[str, str], payload: bytes) -> dict | None:
    """One framed WARC record -> response dict, or None for non-response /
    URI-less records. Tolerates a missing HTTP message (body = payload)."""
    if headers.get("warc-type") != "response":
        return None
    url = headers.get("warc-target-uri")
    if not url:
        return None
    ts_raw = headers.get("warc-date", "")
    try:
        ts = datetime.fromisoformat(ts_raw.replace("Z", "+00:00")).astimezone(
            timezone.utc
        ).replace(tzinfo=None)
    except ValueError:
        ts = None
    status: int | None = None
    content_type = ""
    body = payload
    if payload[:5] == b"HTTP/":  # payload is an HTTP response message
        http_end = payload.find(_CRLF + _CRLF)
        if http_end >= 0:
            status_line, _, rest = payload[:http_end].partition(_CRLF)
            parts = status_line.split()
            if len(parts) >= 2 and parts[1].isdigit():
                status = int(parts[1])
            content_type = _parse_headers(rest).get("content-type", "")
            body = payload[http_end + 4 :]
    return {
        "url": url,
        "warc_ts": ts,
        "http_status": status,
        "content_type": content_type,
        "body": body,
    }


def _drain(buf: bytes) -> tuple[list[dict], bytes, bool]:
    """Parse every COMPLETE record at the head of buf. Returns (records,
    remainder, stop): stop=True on a malformed head (non-WARC prefix or
    unframed record) — the caller halts rather than resyncing
    heuristically. An incomplete trailing record stays in the remainder."""
    out: list[dict] = []
    pos = 0
    n = len(buf)
    while True:
        while buf.startswith(_CRLF, pos):
            pos += 2
        if pos >= n:
            return out, b"", False
        if not buf.startswith(b"WARC/", pos):
            if buf[pos:] == b"\r":  # chunk split inside a separator CRLF: wait
                return out, buf[pos:], False
            if n - pos < 5 and b"WARC/"[: n - pos].startswith(buf[pos:]):
                return out, buf[pos:], False  # possible split prefix: wait
            return out, buf[pos:], True
        hdr_end = buf.find(_CRLF + _CRLF, pos)
        if hdr_end < 0:
            return out, buf[pos:], False  # incomplete headers: wait
        headers = _parse_headers(buf[pos:hdr_end])
        try:
            length = int(headers.get("content-length", ""))
        except ValueError:
            length = -1
        if length < 0:
            return out, buf[pos:], True  # unframed/negative: cannot advance
        end = hdr_end + 4 + length
        if end > n:
            return out, buf[pos:], False  # incomplete payload: wait
        rec = _record_from(headers, buf[hdr_end + 4 : end])
        if rec is not None:
            out.append(rec)
        pos = end


def iter_warc_records(data: bytes) -> Iterator[dict]:
    """Stream response records out of one WARC file's bytes. Gzip input
    decodes member-at-a-time (zlib wbits=31 + unused_data), so at most the
    compressed bytes plus one record's decompressed bytes are resident —
    the Common Crawl per-record-member layout never materializes the whole
    decompressed archive."""
    if data[:2] == b"\x1f\x8b":

        def chunks() -> Iterator[bytes]:
            # Member-walking decompressor fed BOUNDED compressed slices: no
            # per-member tail copies (a 1 GB archive of 100k per-record
            # members would otherwise memcpy O(members x filesize)), and a
            # corrupt member / trailing garbage ends the stream AFTER the
            # good members' output — matching the plain path's
            # malformed-tail stop semantics. (GzipFile.read would raise on
            # the corrupt member before returning the same call's good
            # bytes.)
            chunk_sz = 1 << 20
            d = zlib.decompressobj(31)
            pos = 0
            pending = b""
            while True:
                if not pending:
                    if pos >= len(data):
                        return  # truncated final member: drained already
                    pending = data[pos : pos + chunk_sz]
                    pos += chunk_sz
                try:
                    out = d.decompress(pending)
                except zlib.error:
                    return  # corrupt member: tolerant stop
                if out:
                    yield out
                if d.eof:  # member done; unused_data starts the next one
                    pending = d.unused_data
                    d = zlib.decompressobj(31)
                else:
                    pending = b""

        source = chunks()
    else:
        source = iter((data,))

    buf = b""
    for chunk in source:
        buf += chunk
        recs, buf, stop = _drain(buf)
        yield from recs
        if stop:
            return


def parse_warc_bytes(data: bytes) -> list[dict]:
    """Parse one WARC file's bytes into response records:
    [{url, warc_ts (datetime), http_status (int|None), content_type,
    body (bytes)}]. Non-response records (request/metadata/warcinfo) are
    skipped; a malformed tail stops the parse cleanly."""
    return list(iter_warc_records(data))


_RECORD_SCHEMA = (
    "url string, warc_ts timestamp, http_status int, "
    "content_type string, html binary"
)
# binaryFile's fixed schema — streaming sources cannot infer it
_BINARYFILE_SCHEMA = (
    "path string, modificationTime timestamp, length long, content binary"
)


def parse_warc_files(files: DataFrame) -> DataFrame:
    """binaryFile rows (`content` BINARY = one whole .warc/.warc.gz) ->
    framed records. Shared by the batch reader and the streaming ingest
    (which dedups on the raw binaryFile `path` column BEFORE parsing, so
    already-ingested archives are never gunzipped); bodies never pass
    through the driver."""
    batch_rows = 256  # bounded Arrow batches: the stream never materializes

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        def flush(recs: list[dict]) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "url": [r["url"] for r in recs],
                    "warc_ts": [r["warc_ts"] for r in recs],
                    "http_status": [r["http_status"] for r in recs],
                    "content_type": [r["content_type"] for r in recs],
                    "html": [r["body"] for r in recs],
                }
            )

        for pdf in batches:
            for blob in pdf["content"]:
                pending: list[dict] = []
                for rec in iter_warc_records(bytes(blob)):
                    pending.append(rec)
                    if len(pending) >= batch_rows:
                        yield flush(pending)
                        pending = []
                if pending:
                    yield flush(pending)

    return files.select("content").mapInPandas(gen, schema=_RECORD_SCHEMA)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files at `path` (glob ok; .warc or .warc.gz) -> DataFrame
    (url STRING, warc_ts TIMESTAMP, http_status INT, content_type STRING,
    html BINARY). One task per file (binaryFile source)."""
    return parse_warc_files(spark.read.format("binaryFile").load(path))


def warc_to_pages(warc_df: DataFrame) -> DataFrame:
    """200-status records -> the input_hint pages schema
    (url, warc_ts, html, text, lang): text via the engine's own
    extract_text_py kernel (the byte-identical-text invariant holds by
    construction), lang via the JVM lang_id heuristic."""
    from ..functions.html import extract_text_udf
    from ..functions.text import lang_id

    with_text = (
        warc_df.where(F.col("http_status") == 200)
        .select("url", "warc_ts", "html")
        .withColumn("text", extract_text_udf("html"))
    )
    return with_text.withColumn("lang", lang_id(F.col("text")))


def stream_warc_ingest(
    spark: SparkSession,
    warc_dir: str,
    state_root: str,
    max_files_per_trigger: int = 1,
) -> int:
    """Continuous Common-Crawl-style ingestion: .warc/.warc.gz files landing
    in `warc_dir` drain as a Structured Streaming file stream
    (Trigger.AvailableNow; one parse task per file within each batch). Each
    micro-batch (a) projects its 200-status records to the input_hint pages
    schema with the engine's own text kernel and APPENDS them to the store's
    `pages` table (an arrival ledger — re-captures of a url append new
    rows), and (b) MERGEs the incremental index state per document, guarded
    by a per-doc warc_ts watermark table (`doc_ts`): a doc's terms are
    replaced only by a capture with warc_ts >= the watermark, so a
    BACKFILLED older archive (the normal Common Crawl segment-backfill case)
    can never regress the index — including past a capture that tokenized to
    zero words, whose watermark survives in doc_ts even though it has no
    term rows. After any batch the index equals a batch rebuild over each
    url's freshest ingested capture — O(batch) merge work per micro-batch.

    Exactly-once is FILE-granular: every commit records its archives'
    paths in a `warc_files` ledger, and already-recorded paths are skipped —
    robust both to foreachBatch's at-least-once replay AND to a deleted /
    non-traveling stream checkpoint (batch ids restarting at 0 cannot cause
    silent skips or double-appends; the path ledger, not the batch id, is
    authoritative). Returns micro-batches COMMITTED this call."""
    from ..streaming.indexing import (
        STATS_TABLE,
        doc_term_stats,
        drain_stream,
        merge_doc_stats,
    )
    from .tables import SnapshotStore

    store = SnapshotStore(spark, state_root)
    committed = [0]

    def _ingest(batch: DataFrame, batch_id: int) -> None:
        from pyspark.sql import Window

        # `batch` is the RAW binaryFile rows — the path check runs on the
        # path column alone, so already-ingested archives are never parsed
        # (and the listing job never gunzips anything). File-granular
        # exactly-once: drop archives some earlier commit already ingested
        # (replay, or re-drain after checkpoint loss). The dedup is a
        # distributed semi-join of the TINY batch-path set against the
        # ledger — the ever-growing ledger is never collected to the driver.
        batch_paths = {r.path for r in batch.select("path").distinct().collect()}
        ledger = store.read("warc_files")
        if ledger is not None and batch_paths:
            paths_probe = spark.createDataFrame(
                [(p,) for p in sorted(batch_paths)], "path string"
            )
            dup = paths_probe.join(ledger, "path", "left_semi").collect()
            batch_paths -= {r.path for r in dup}
        if not batch_paths:
            return
        fresh = batch.filter(F.col("path").isin(*batch_paths))

        # the append job and the stats replace both consume this lineage —
        # uncached, each would re-gunzip + re-parse + re-extract the archives
        pages = warc_to_pages(parse_warc_files(fresh)).cache()
        # one indexed version per url per batch: a single archive can carry
        # several captures of the same url — take the latest warc_ts
        # (md5(html) breaks exact-ts ties deterministically)
        w_url = Window.partitionBy("url").orderBy(
            F.desc("warc_ts"), F.md5("html")
        )
        latest = (
            pages.withColumn("_rn", F.row_number().over(w_url))
            .filter(F.col("_rn") == 1)
            .drop("_rn")
            .cache()
        )
        cand = latest.select(
            F.col("url").alias("doc_id"), F.col("warc_ts").alias("_new_ts")
        )
        doc_ts = store.read("doc_ts")
        state = store.read(STATS_TABLE)
        if state is not None and "warc_ts" in state.columns:
            # heal a pre-doc_ts state layout (watermarks used to ride inside
            # the stats rows): split them out once, then drop the column so
            # the schema matches run_incremental_index's
            if doc_ts is None:
                doc_ts = state.groupBy("doc_id").agg(F.max("warc_ts").alias("warc_ts"))
            state = state.drop("warc_ts")
        if doc_ts is None:
            winners = cand
        else:
            # watermark lookup prunes to the batch's docs BEFORE aggregating:
            # no corpus-wide shuffle per micro-batch
            old_ts = (
                doc_ts.join(F.broadcast(cand.select("doc_id")), "doc_id", "left_semi")
                .groupBy("doc_id")
                .agg(F.max("warc_ts").alias("_old_ts"))
            )
            winners = (
                cand.join(old_ts, "doc_id", "left")
                .filter(
                    F.col("_old_ts").isNull()
                    | (F.col("_new_ts") >= F.col("_old_ts"))
                )
                .select("doc_id", "_new_ts")
            )
        winner_ids = winners.select("doc_id")
        delta = doc_term_stats(latest, doc_col="url").join(
            F.broadcast(winner_ids), "doc_id", "left_semi"
        )
        merged = merge_doc_stats(state, delta, changed_docs=winner_ids)
        new_watermarks = winners.select(
            "doc_id", F.col("_new_ts").alias("warc_ts")
        )
        new_doc_ts = (
            new_watermarks
            if doc_ts is None
            else doc_ts.join(
                F.broadcast(winner_ids), "doc_id", "left_anti"
            ).unionByName(new_watermarks)
        )
        store.commit_round(
            store.current_round() + 1,
            appends={"pages": pages},
            replaces={STATS_TABLE: merged, "doc_ts": new_doc_ts},
            # the few-row path ledger writes driver-side (pyarrow, no Spark
            # job per tiny table — the metrics/lineage path)
            small_appends={
                "warc_files": pd.DataFrame({"path": sorted(batch_paths)})
            },
        )
        # the ledger accumulates one small dir per batch: fold it every 64
        # commits so the per-batch semi-join scans a handful of files, not
        # O(batches) of them
        if store.current_round() % 64 == 0:
            store.compact("warc_files")
        pages.unpersist()
        latest.unpersist()
        committed[0] += 1

    files = (
        spark.readStream.format("binaryFile")
        .schema(_BINARYFILE_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .load(warc_dir)
    )
    drain_stream(files, _ingest, f"{state_root}/_warc_stream_checkpoint")
    return committed[0]


def write_warc(
    pages: DataFrame,
    out_dir: str,
    compress: bool = True,
    default_status: int = 200,
    default_content_type: str = "text/html",
    default_ts: datetime = datetime(1970, 1, 1),
) -> DataFrame:
    """Distributed WARC export — the write side of read_warc: every partition
    of `pages` (url, warc_ts, html[, http_status, content_type]) streams its
    rows as framed response records into ONE .warc(.gz) shard under
    `out_dir`, gzipped per record member exactly like Common Crawl (so the
    member-at-a-time reader round-trips it). Returns the manifest
    (file, n_records, n_bytes) — one row per shard; the returned DataFrame
    is lazy, so trigger it (collect/write) to perform the export.

    Records are framed by the same builder the parser is tested against
    (build_warc_bytes), so export -> read_warc -> warc_to_pages reproduces
    url/warc_ts/html byte-for-byte. NULLs read_warc legitimately produces
    round-trip too: NULL warc_ts exports as default_ts (epoch), NULL
    http_status/content_type as the defaults, NULL html as an empty body.
    Shard size = partition size: control it with repartition() upstream (the
    CC convention is ~1 GB shards).

    Idempotent writes: shard names are DETERMINISTIC per partition and each
    task writes an attempt-scoped temp file promoted with an atomic
    os.replace — a retried/speculated attempt or a re-evaluated manifest
    DataFrame overwrites the same shard instead of accumulating uuid-named
    duplicates (the per-file analogue of SnapshotStore's two-phase commit).
    Point out_dir at a FRESH directory per export: like any file sink,
    stale shards from a previous differently-partitioned export are not
    swept. Paths are task-local filesystem writes (the sandbox analogue of
    a shared FS/object-store sink; nothing passes through the driver)."""
    import os

    from pyspark import TaskContext

    has_status = "http_status" in pages.columns
    has_ctype = "content_type" in pages.columns
    cols = ["url", "warc_ts", "html"]
    if has_status:
        cols.append("http_status")
    if has_ctype:
        cols.append("content_type")
    ext = ".warc.gz" if compress else ".warc"

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ctx = TaskContext.get()
        pid = ctx.partitionId()
        os.makedirs(out_dir, exist_ok=True)
        path = os.path.join(out_dir, f"part-{pid:05d}{ext}")
        tmp = f"{path}.attempt-{ctx.taskAttemptId()}.inprogress"
        n_records = 0
        n_bytes = 0
        try:
            with open(tmp, "wb") as fh:
                for pdf in batches:
                    recs = []
                    for row in pdf.itertuples(index=False):
                        ts = (
                            default_ts
                            if pd.isna(row.warc_ts)
                            else row.warc_ts.to_pydatetime()
                        )
                        status = (
                            int(row.http_status)
                            if has_status and not pd.isna(row.http_status)
                            else default_status
                        )
                        ctype = (
                            row.content_type
                            if has_ctype and isinstance(row.content_type, str)
                            else default_content_type
                        )
                        body = b"" if row.html is None else bytes(row.html)
                        recs.append((row.url, ts, status, ctype, body))
                    blob = build_warc_bytes(recs, compress=compress)
                    fh.write(blob)
                    n_records += len(recs)
                    n_bytes += len(blob)
        except BaseException:
            if os.path.exists(tmp):
                os.remove(tmp)  # never leave a partial shard behind
            raise
        if n_records == 0:
            os.remove(tmp)  # no empty shards
            yield pd.DataFrame({"file": [], "n_records": [], "n_bytes": []})
        else:
            os.replace(tmp, path)  # atomic promote (last attempt wins)
            yield pd.DataFrame(
                {"file": [path], "n_records": [n_records], "n_bytes": [n_bytes]}
            )

    return pages.select(*cols).mapInPandas(
        gen, schema="file string, n_records long, n_bytes long"
    )


# -- synthetic WARC builder (tests + corpus export) --------------------------


def build_warc_bytes(
    records: list[tuple[str, datetime, int, str, bytes]], compress: bool = False
) -> bytes:
    """Deterministic WARC/1.0 bytes from (url, ts, status, content_type,
    body) tuples — each as a response record framed exactly like the parser
    expects from real archives. compress=True gzips per record and
    concatenates members (the Common Crawl layout)."""
    members: list[bytes] = []
    for url, ts, status, ctype, body in records:
        http = (
            f"HTTP/1.1 {status} X\r\nContent-Type: {ctype}\r\n"
            f"Content-Length: {len(body)}\r\n\r\n"
        ).encode() + body
        warc_hdr = (
            "WARC/1.0\r\n"
            "WARC-Type: response\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {ts.strftime('%Y-%m-%dT%H:%M:%S')}"
            f"{f'.{ts.microsecond:06d}' if ts.microsecond else ''}Z\r\n"
            f"Content-Length: {len(http)}\r\n"
            "Content-Type: application/http; msgtype=response\r\n\r\n"
        ).encode()
        rec = warc_hdr + http + _CRLF + _CRLF
        if compress:
            buf = io.BytesIO()
            with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
                gz.write(rec)
            members.append(buf.getvalue())
        else:
            members.append(rec)
    return b"".join(members)
