"""CDX(J) capture indexes: generate from parsed captures, parse back,
and answer capture queries from the INDEX alone.

Common Crawl (and every wayback-style archive) ships a CDXJ index
beside the WARC files: one line per capture, ``<urlkey> <timestamp>
<json>`` where ``urlkey`` is the SURT form of the URL
(Sort-friendly URI Reordering Transform: reversed host labels, so one
domain's captures sort together) and the json carries url / status /
mime / digest / filename / offset / length. The index is how real
consumers FIND captures — latest-capture lookups, per-domain slices,
dedup by digest — without touching a byte of WARC payload.

Spark-first: generation and parsing are pure Column expressions
(split, to_json/get_json_object, regexp) — the index plane never
leaves the JVM. Index files are plain text: `spark.read.text` scans
them splittably at any scale (unlike the non-splittable .warc.gz
payloads — which is exactly why archives ship indexes).

SURT subset (documented, mirrored by the oracle): lowercase the whole
key, reverse the host labels joined with commas, ')' separator, then
path+query with the fragment dropped and pre-query trailing slashes
stripped; no query-parameter sorting or session-id stripping (the
full Java SURT canon does both; they are policy, not format).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from scicat_ingestor_spark.operators import warc


def surt_key(col: Column | str) -> Column:
    """SURT urlkey of a URL — 'https://www.Example.org/A/b?q=1' ->
    'org,example,www)/a/b?q=1' (the documented subset above)."""
    c = F.col(col) if isinstance(col, str) else col
    host = warc.url_host(c)
    rev = F.array_join(F.reverse(F.split(host, r"\.")), ",")
    pq = F.lower(warc.url_path_query(c))
    pre = F.regexp_extract(pq, r"^([^?]*)", 1)
    qry = F.regexp_extract(pq, r"(\?.*)$", 1)
    pq = F.concat(F.regexp_replace(pre, r"/+$", ""), qry)
    return F.concat(rev, F.lit(")"), pq)


def cdx_timestamp(date_col: Column | str) -> Column:
    """WARC-Date ISO-8601 -> the 14-digit CDX timestamp."""
    c = F.col(date_col) if isinstance(date_col, str) else date_col
    return F.regexp_replace(c, r"[-T:Z]", "")


def cdxj_lines(rows: DataFrame, filename: str = "capture.warc.gz") -> DataFrame:
    """Index parsed captures: one CDXJ line per response/revisit row
    (the record types an index serves). Pure JVM — surt/timestamp/
    to_json are Column expressions; ``filename`` stands in for the
    source file name when the scan didn't carry one.

    Digest semantics (r11, per r10 ADVICE): when the capture carried a
    ``WARC-Payload-Digest`` header it is indexed VERBATIM — that is the
    payload-equivalence key real archives use, and it is the only form
    under which a revisit row (no body of its own) can dedup against
    the identical response it re-observed. Rows without the header
    fall back to md5 of the DECODED text, which is a TEXT-hash only:
    it cannot match a revisit (null text) to its sibling response, so
    dedup-by-digest over header-less captures is best-effort."""
    idx = rows.filter(
        F.col("warc_type").isin("response", "revisit")
        & F.col("url").isNotNull()
    )
    if "error" in rows.columns:
        idx = idx.filter(F.col("error").isNull())
    text_md5 = F.md5(F.coalesce(F.col("text"), F.lit("")))
    digest = (
        F.coalesce(F.col("payload_digest"), text_md5)
        if "payload_digest" in rows.columns
        else text_md5
    )
    payload = F.to_json(
        F.struct(
            F.col("url").alias("url"),
            F.col("http_status").cast("string").alias("status"),
            F.substring_index(F.col("content_type"), ";", 1).alias(
                "mime"
            ),
            digest.alias("digest"),
            F.lit(filename).alias("filename"),
        )
    )
    return idx.select(
        F.concat_ws(
            " ",
            surt_key("url"),
            cdx_timestamp("warc_date"),
            payload,
        ).alias("line")
    )


def cdx_parse(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse CDXJ lines back to columns — the CONSUMER side: split off
    the two space-delimited tokens (the json itself may contain
    spaces, so split with a limit), then get_json_object the rest."""
    c = F.col(line_col)
    parts = F.split(c, " ", 3)
    js = F.element_at(parts, 3)
    return lines.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("timestamp"),
        F.get_json_object(js, "$.url").alias("url"),
        F.get_json_object(js, "$.status").cast("int").alias(
            "http_status"
        ),
        F.get_json_object(js, "$.mime").alias("mime"),
        F.get_json_object(js, "$.digest").alias("digest"),
        F.get_json_object(js, "$.filename").alias("filename"),
    )


def cdx_latest(parsed: DataFrame) -> DataFrame:
    """Latest capture per urlkey FROM THE INDEX ALONE — the lookup
    every wayback/CC consumer runs before touching any payload byte.
    One window shuffle on the urlkey (14-digit timestamps order
    lexicographically); emits the newest row + the capture count."""
    from pyspark.sql import Window

    w = Window.partitionBy("urlkey").orderBy(
        F.col("timestamp").desc(), F.col("digest").desc()
    )
    return (
        parsed.select(
            "*",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1))
            .over(Window.partitionBy("urlkey"))
            .cast("int")
            .alias("n_captures"),
        )
        .filter(F.col("rn") == 1)
        .drop("rn")
    )
