"""DuckDB oracle SQL for each named query in queries.py.

Conventions shared with the Spark side so value hashes match:
- money aggregates: CAST to DECIMAL(18,s) before SUM, ROUND(.,2), CAST
  to DOUBLE;
- averages: exact DECIMAL sum cast to DOUBLE, divided by the BIGINT
  count (IEEE division of identical operands is bit-stable);
- md5() is the shared portable hash;
- timestamps compared as formatted strings (parquet ns vs us).
"""

from __future__ import annotations

import hashlib
import os


def _sig_sql(col: str, bits: int = 4, dim: int = 64) -> str:
    """Random-hyperplane signature in DuckDB SQL with the SAME constants
    the Spark plan folds in (operators.similarity.hyperplane_weights)."""
    from scicat_ingestor_spark.operators.similarity import hyperplane_weights

    parts = []
    for b in range(bits):
        arr = "[" + ",".join(repr(x) for x in hyperplane_weights(b, dim)) + "]"
        parts.append(
            f"(CASE WHEN list_dot_product({col}, {arr}) >= 0 THEN '1' ELSE '0' END)"
        )
    return "||".join(parts)


def _ivf_cell_sql(col: str, cells: int = 8, dim: int = 64) -> str:
    """IVF cell assignment in DuckDB SQL with the SAME centroid constants
    the Spark plan folds in (operators.similarity.centroid_weights):
    1-based argmax of dot(vec, centroid), ties to the lowest index."""
    from scicat_ingestor_spark.operators.similarity import centroid_weights

    dots = ",".join(
        "list_dot_product(%s, [%s])"
        % (col, ",".join(repr(x) for x in centroid_weights(c, dim)))
        for c in range(cells)
    )
    return f"CAST(list_position([{dots}], list_max([{dots}])) AS INT)"


def _ivf_dots_sql(col: str, cells: int = 8, dim: int = 64) -> str:
    """The per-cell dot-product list as DuckDB SQL, same constants as
    the Spark plan (operators.similarity.centroid_weights)."""
    from scicat_ingestor_spark.operators.similarity import centroid_weights

    dots = ",".join(
        "list_dot_product(%s, [%s])"
        % (col, ",".join(repr(x) for x in centroid_weights(c, dim)))
        for c in range(cells)
    )
    return f"[{dots}]"


def _file_stats_oracle(sf_dir: str = "/root/testdata/sf0.01") -> str:
    """Ground truth for s8_s9_file_stats computed independently of the
    Spark path: driver-side os.stat + one-shot (non-streaming) blake2b.
    The driver's t2 gate runs at sf0.01 (BASELINE.md §B)."""
    tables = (
        "region nation customer supplier part orders lineitem events documents embeddings"
    ).split()
    rows = []
    for t in tables:
        p = f"{sf_dir}/{t}.parquet"
        size = os.path.getsize(p)
        digest = hashlib.blake2b(open(p, "rb").read()).hexdigest()
        rows.append(f"('{p}', {size}, '{digest}', true)")
    rows.append(
        f"('{sf_dir}/does_not_exist.parquet', CAST(NULL AS BIGINT), CAST(NULL AS VARCHAR), false)"
    )
    values = ",\n  ".join(rows)
    return (
        f"SELECT * FROM (VALUES\n  {values}\n) t(path, \"size\", checksum, \"exists\")"
    )

_STOP_EN = "'the','and','of','to','is'"
_STOP_DE = "'der','die','und','ist','das'"
_STOP_FR = "'le','la','et','est','les'"
_STOP_ES = "'el','la','que','y','es'"
_STOP_ALL = ",".join([_STOP_EN, _STOP_DE, _STOP_FR, _STOP_ES])

def _simhash_bits_sql(bits: int) -> str:
    """Per-bit majority CASEs, same bit derivation as
    operators.dedup.simhash_bits: bit i<32 = the 0x8 bit of md5 nibble
    i, bit i>=32 = the 0x4 bit of nibble i-32."""
    hi = "'8','9','a','b','c','d','e','f'"
    b4 = "'4','5','6','7','c','d','e','f'"
    return ",\n  ".join(
        "CASE WHEN 2*sum(CASE WHEN substr(hx,{p},1) IN ({c}) "
        "THEN 1 ELSE 0 END) > count(*) THEN '1' ELSE '0' END AS b{i}".format(
            p=i % 32 + 1, c=(hi if i < 32 else b4), i=i
        )
        for i in range(bits)
    )


def _simhash_concat_sql(bits: int) -> str:
    return "||".join(f"b{i}" for i in range(bits))


_SIMHASH_BITS = _simhash_bits_sql(16)
_SIMHASH_CONCAT = _simhash_concat_sql(16)
_SIMHASH_BITS64 = _simhash_bits_sql(64)
_SIMHASH_CONCAT64 = _simhash_concat_sql(64)

_MINHASH_COLS = ",\n   ".join(
    f"min(substr(md5(s) || md5('x'||s), {8 * i + 1}, 8)) AS mh{i}" for i in range(8)
)
_MINHASH_BANDS = "\n  UNION ALL ".join(
    f"SELECT doc_id, {b} AS band, mh{2*b}||'|'||mh{2*b+1} AS sig FROM mh"
    for b in range(4)
)

_MINHASH_PAIR_CTES = f"""w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
sh AS (SELECT doc_id,
  list_distinct(list_transform(range(1, greatest(len(toks)-1, 1)+1),
    i -> concat_ws(' ', toks[i], toks[i+1]))) AS shingles FROM w),
ex AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
mh AS (SELECT doc_id,
   {_MINHASH_COLS}
   FROM ex GROUP BY doc_id),
bk AS (
  {_MINHASH_BANDS}
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
)"""

ORACLES: dict[str, str] = {
    "s2_message_type_filter": """
SELECT event_id AS offset, substr(event_type || '####', 1, 4) AS message_type
FROM events WHERE substr(event_type || '####', 1, 4) = 'purc'
""",
    "s3_wrdn_flatbuffer": """
SELECT 'job-' || event_id AS job_id,
  '/data/f' || event_id || '.nxs' AS file_name,
  event_type = 'error' AS error_encountered
FROM events
""",
    "s3_wrdn_deserialize": """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k,
       'job-' || event_id AS job_id
FROM events
""",
    "s4_error_filter": """
SELECT event_id, event_type FROM events WHERE NOT (event_type = 'error')
""",
    "p6_schema_selection": """
WITH f AS (SELECT doc_id, '/data/'||source||'/doc_'||doc_id||'.nxs' AS filename FROM documents)
SELECT doc_id,
  CASE WHEN filename LIKE '%src1%' THEN 'coda'
       WHEN filename LIKE '/data/src2%' THEN 'ymir'
       ELSE 'fallback' END AS schema_id
FROM f
""",
    "p11_default_coalesce": """
SELECT event_id,
  coalesce(CASE WHEN CAST(json_extract_string(props,'$.k') AS BIGINT) % 3 != 0
    THEN 'grp-' || CAST(json_extract_string(props,'$.k') AS BIGINT) END, 'ess') AS owner_group
FROM events
""",
    "p12_pid_policy": """
SELECT event_id,
  CASE WHEN event_id % 2 != 0 THEN md5('job-' || event_id) END AS pid
FROM events
""",
    "v2_template_render": """
SELECT doc_id, 'doc '||doc_id||' from '||source AS dataset_name FROM documents
""",
    "v6_cast_library": """
SELECT event_id,
  CAST(json_extract_string(props,'$.k') AS BIGINT) AS k_int,
  CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR) AS value_str,
  strftime(ts::TIMESTAMP, '%Y-%m-%dT%H:%M:%S') || 'Z' AS ts_iso
FROM events
""",
    "f_scalar_string_ops": """
WITH d AS (SELECT doc_id, text, lang, source,
  '/data/'||source||'/doc_'||doc_id||'.txt' AS path FROM documents)
SELECT doc_id,
  split_part(path, '/', -1) AS fname,
  regexp_replace(path, '/[^/]*$', '') AS dname,
  regexp_replace(regexp_replace(path, '/[^/]*$', ''), '/[^/]*$', '') AS dname2,
  upper(lang) AS lang_up,
  replace(source, 'src', 'origin') AS origin,
  array_to_string(regexp_split_to_array(lower(text), '\\s+')[1:3], ', ') AS first_words
FROM d
""",
    "j1_enrichment_join": """
SELECT n_name,
  count(*) AS n_orders,
  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_price
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""",
    "j2_ci_first_lookup": """
WITH dim AS (SELECT 'Instr-'||(s_suppkey % 5) AS name, s_suppkey AS id FROM supplier),
firsts AS (
  SELECT lower(name) AS ln, id FROM (
    SELECT name, id, row_number() OVER (PARTITION BY lower(name) ORDER BY id) AS rn FROM dim
  ) WHERE rn = 1),
facts AS (SELECT event_id, 'INSTR-'||(user_id % 5) AS instrument_name FROM events)
SELECT f.event_id, fi.id AS instrument_id
FROM facts f LEFT JOIN firsts fi ON lower(f.instrument_name) = fi.ln
""",
    "j3_sample_lookup_collect": """
SELECT c_custkey,
  coalesce(string_agg(o_orderkey, ',' ORDER BY o_orderkey), '') AS order_ids
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
""",
    "s11_sample_query": """
WITH req AS (
  SELECT DISTINCT source, lang FROM documents WHERE doc_id % 97 = 0
)
SELECT d.source, d.lang,
  string_agg(d.doc_id, ',' ORDER BY d.doc_id) AS sample_ids
FROM documents d JOIN req USING (source, lang)
GROUP BY d.source, d.lang
""",
    "j6_sample_upsert": """
SELECT c_custkey AS key, c_name AS description FROM customer
UNION ALL
SELECT o_orderkey, 'sample-'||o_orderkey FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_orderkey)
""",
    "a3_datablock_size": """
WITH block AS (
  SELECT l_orderkey,
    CASE WHEN l_tax > 0.01 THEN CAST(l_extendedprice AS DECIMAL(18,2)) END AS size
  FROM lineitem WHERE l_linenumber <= 3
)
SELECT l_orderkey,
  CAST(round(sum(size), 2) AS DOUBLE) AS block_size,
  count(size) AS n_sized_files
FROM block GROUP BY l_orderkey
""",
    "f11_sum_unit": """
SELECT l_orderkey, l_linenumber,
  round(CAST(l_quantity AS DOUBLE) + l_discount + l_tax, 6) AS total,
  'kg' AS unit
FROM lineitem
""",
    "j4_anti_exists_pid": """
SELECT o_orderkey, o_orderstatus FROM orders o
WHERE NOT EXISTS (SELECT 1 FROM lineitem l WHERE l.l_orderkey = o.o_orderkey)
""",
    "j5_anti_by_metadata": """
WITH ev AS (SELECT event_id, 'src'||json_extract_string(props,'$.k') AS meta_key FROM events)
SELECT event_id, meta_key FROM ev
WHERE NOT EXISTS (SELECT 1 FROM documents d WHERE d.source = ev.meta_key)
""",
    "j7_id_list_merge": """
WITH u AS (
  SELECT DISTINCT o_custkey, o_orderkey FROM orders WHERE o_orderstatus = 'O'
  UNION
  SELECT DISTINCT o_custkey, o_orderkey FROM orders WHERE o_totalprice > 150000
)
SELECT o_custkey, string_agg(o_orderkey, ',' ORDER BY o_orderkey) AS ids
FROM u GROUP BY o_custkey
""",
    "a1_a2_dataset_size": """
SELECT l_orderkey,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_size,
  count(*) AS n_files
FROM lineitem GROUP BY l_orderkey
""",
    "a4_commonpath": """
WITH p AS (SELECT l_returnflag, '/data/'||l_returnflag||'/'||l_linestatus||'/'||l_orderkey AS path FROM lineitem),
mm AS (SELECT l_returnflag, string_split(min(path), '/') AS sa, string_split(max(path), '/') AS sb
       FROM p GROUP BY l_returnflag),
c AS (SELECT l_returnflag, sa,
        least(len(sa), len(sb)) AS n,
        list_position(list_transform(sa[1:least(len(sa), len(sb))],
                                     (x, i) -> x IS DISTINCT FROM sb[i]), true) AS mis
      FROM mm)
SELECT l_returnflag,
  array_to_string(sa[1:(CASE WHEN mis IS NOT NULL AND mis > 0 THEN mis - 1 ELSE n END)], '/') AS common_path
FROM c
""",
    "a5_unit_consensus": """
SELECT user_id,
  CASE WHEN count(DISTINCT event_type) = 1 THEN min(event_type) ELSE '' END AS unit,
  count(*) AS n
FROM events GROUP BY user_id
""",
    "a7_extractors": """
SELECT event_type,
  max(value) AS max_value,
  min(value) AS min_value,
  round(CAST(sum(CAST(value AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS mean_value,
  count(*) AS n
FROM events GROUP BY event_type
""",
    "o3_latest_dataset": """
SELECT event_id, strftime(ts::TIMESTAMP, '%Y-%m-%d %H:%M:%S.%f') AS ts_iso
FROM events ORDER BY ts::TIMESTAMP DESC, event_id DESC LIMIT 1
""",
    "t8_hourly_rollup": """
SELECT strftime(date_trunc('hour', ts::TIMESTAMP), '%Y-%m-%d %H:%M:%S') AS hour,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM events GROUP BY 1
""",
    "t8_sessionize": """
WITH ev AS (
  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) % 50 AS k,
         ts::TIMESTAMP AS ts, value
  FROM events
),
flagged AS (
  SELECT k, ts, value,
    CASE WHEN ts - lag(ts) OVER (PARTITION BY k ORDER BY ts)
              >= INTERVAL 30 MINUTE
         OR lag(ts) OVER (PARTITION BY k ORDER BY ts) IS NULL
         THEN 1 ELSE 0 END AS new_session
  FROM ev
),
sessions AS (
  SELECT k, ts, value,
    sum(new_session) OVER (
      PARTITION BY k ORDER BY ts ROWS UNBOUNDED PRECEDING
    ) AS sid
  FROM flagged
)
SELECT k,
  strftime(min(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
  count(*) AS n_events,
  CAST(round(sum(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS total_value
FROM sessions GROUP BY k, sid
""",
    "q1_pricing_summary": """
SELECT l_returnflag, l_linestatus,
  CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_base_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS sum_disc_price,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST((1 - l_discount) * (1 + l_tax) AS DECIMAL(18,6))), 2) AS DOUBLE) AS sum_charge,
  round(CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_qty,
  round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / count(*), 6) AS avg_price,
  round(CAST(sum(CAST(l_discount AS DECIMAL(18,4))) AS DOUBLE) / count(*), 6) AS avg_disc,
  count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""",
    "q3_top_revenue": """
SELECT l_orderkey,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue,
  strftime(min(o_orderdate)::TIMESTAMP, '%Y-%m-%d') AS o_orderdate
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
  AND l_shipdate > TIMESTAMP '1995-03-15 00:00:00'
GROUP BY l_orderkey
ORDER BY revenue DESC, l_orderkey ASC
LIMIT 10
""",
    "q5_local_supplier_volume": """
SELECT n_name,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation ON s_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
GROUP BY n_name
ORDER BY revenue DESC, n_name ASC
""",
    "dedup_exact": """
SELECT md5(text) AS content_hash, min(doc_id) AS keep_id, count(*) AS n_copies
FROM documents GROUP BY md5(text)
""",
    "dedup_minhash_lsh": f"""
WITH {_MINHASH_PAIR_CTES}
SELECT id_a, id_b FROM pairs
""",
    "dedup_clusters": f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT reach.id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
)
SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
""",
    "dedup_lsh_jaccard_verified": f"""
WITH {_MINHASH_PAIR_CTES},
shv AS (SELECT doc_id,
    list_distinct(list_transform(
      range(1, greatest(len(regexp_split_to_array(lower(text), '\\s+'))-1, 1)+1),
      i -> array_to_string(regexp_split_to_array(lower(text), '\\s+')[i:i+1], ' ')
    )) AS s
  FROM documents)
SELECT p.id_a, p.id_b,
  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM pairs p JOIN shv a ON p.id_a = a.doc_id JOIN shv b ON p.id_b = b.doc_id
WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.5
""",
    "dedup_incremental": f"""
WITH {_MINHASH_PAIR_CTES},
base AS (SELECT DISTINCT band, sig FROM bk WHERE doc_id % 5 <> 0),
inc AS (SELECT doc_id, band, sig FROM bk WHERE doc_id % 5 = 0),
hit_base AS (
  SELECT DISTINCT i.doc_id FROM inc i
  JOIN base b ON i.band = b.band AND i.sig = b.sig
),
bucket_min AS (SELECT band, sig, min(doc_id) AS min_id FROM inc GROUP BY band, sig),
hit_inc AS (
  SELECT DISTINCT i.doc_id FROM inc i
  JOIN bucket_min m ON i.band = m.band AND i.sig = m.sig AND i.doc_id > m.min_id
)
SELECT d.doc_id, d.lang, d.source FROM documents d
WHERE d.doc_id % 5 = 0
  AND NOT EXISTS (SELECT 1 FROM hit_base h WHERE h.doc_id = d.doc_id)
  AND NOT EXISTS (SELECT 1 FROM hit_inc h WHERE h.doc_id = d.doc_id)
""",
    "dedup_survivors": f"""
WITH RECURSIVE {_MINHASH_PAIR_CTES},
edges AS (SELECT id_a AS src, id_b AS dst FROM pairs UNION SELECT id_b, id_a FROM pairs),
nodes AS (SELECT DISTINCT src AS id FROM edges),
reach AS (
  SELECT id, id AS r FROM nodes
  UNION
  SELECT reach.id, e.dst AS r FROM reach JOIN edges e ON reach.r = e.src
),
cl AS (SELECT id, min(r) AS cluster_id FROM reach GROUP BY id)
SELECT doc_id, lang, source FROM documents d
WHERE NOT EXISTS (
  SELECT 1 FROM cl WHERE cl.id = d.doc_id AND cl.id <> cl.cluster_id
)
""",
    "chunk_documents": """
SELECT doc_id, s AS chunk_start,
  substr(text, s + 1, 200) AS chunk,
  length(substr(text, s + 1, 200)) AS chunk_len
FROM documents,
  unnest(generate_series(0, greatest(length(text) - 1, 0), 150)) AS t(s)
""",
    "source_quota_sample": """
WITH r AS (SELECT doc_id, source, lang,
  row_number() OVER (PARTITION BY source
    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
  FROM documents)
SELECT doc_id, source, lang FROM r WHERE rn <= 20
""",
    "dedup_simhash": f"""
WITH w AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS word
           FROM documents),
h AS (SELECT doc_id, md5(word) AS hx FROM w),
bits AS (SELECT doc_id,
  {_SIMHASH_BITS}
  FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIMHASH_CONCAT} AS simhash FROM bits)
SELECT simhash, count(*) AS n_docs, min(doc_id) AS keep_id
FROM sig GROUP BY simhash HAVING count(*) > 1
""",
    "dedup_simhash_hamming": f"""
WITH w AS (SELECT doc_id, unnest(list_distinct(regexp_split_to_array(lower(text), '\\s+'))) AS word
           FROM documents),
h AS (SELECT doc_id, md5(word) AS hx FROM w),
bits AS (SELECT doc_id,
  {_SIMHASH_BITS64}
  FROM h GROUP BY doc_id),
sig AS (SELECT doc_id, {_SIMHASH_CONCAT64} AS simhash FROM bits),
-- banded candidates: agree exactly on >=1 of the 4 16-bit bands
-- (pigeonhole => full recall at hamming <= 3), then exact verify
p AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        hamming(a.simhash, b.simhash) AS hamming
      FROM sig a JOIN sig b ON a.doc_id < b.doc_id
      WHERE substr(a.simhash, 1, 16) = substr(b.simhash, 1, 16)
         OR substr(a.simhash, 17, 16) = substr(b.simhash, 17, 16)
         OR substr(a.simhash, 33, 16) = substr(b.simhash, 33, 16)
         OR substr(a.simhash, 49, 16) = substr(b.simhash, 49, 16))
SELECT id_a, id_b, CAST(hamming AS BIGINT) AS hamming FROM p WHERE hamming <= 3
""",
    "dedup_duplicate_spans": """
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\\s+') AS toks
           FROM documents),
sp AS (SELECT doc_id,
  unnest(list_transform(range(1, greatest(len(toks)-7, 1)+1),
    i -> md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3],
                            toks[i+4], toks[i+5], toks[i+6], toks[i+7])))) AS h
  FROM w),
df AS (SELECT h, count(DISTINCT doc_id) AS ndocs FROM sp GROUP BY h)
SELECT sp.doc_id,
  count(*) AS n_spans,
  CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_spans,
  round(CAST(sum(CASE WHEN df.ndocs > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        / count(*), 6) AS dup_frac
FROM sp JOIN df USING (h)
GROUP BY sp.doc_id
""",
    # independent algorithm: NO frequency order, NO prefix/positional
    # pruning — plain shared-shingle blocking (lossless: J > 0 forces a
    # shared 4-gram) + exact verify. Brute-force all-pairs was verified
    # equivalent at sf0.001/0.01 but needs ~25 min in DuckDB at sf0.1
    # (12.5M list_intersect pairs), too slow for the round gate.
    "dedup_jaccard_ssjoin": """
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
           FROM documents),
s2 AS (SELECT doc_id,
  list_distinct(list_transform(range(1, greatest(len(toks)-3, 1)+1),
    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3]))) AS s FROM w),
exp AS (SELECT doc_id, unnest(s) AS g FROM s2),
cd AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
       FROM exp a JOIN exp b ON a.g = b.g AND a.doc_id < b.doc_id)
SELECT cd.id_a, cd.id_b,
  round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
FROM cd JOIN s2 a ON cd.id_a = a.doc_id JOIN s2 b ON cd.id_b = b.doc_id
WHERE round(CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
    / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) >= 0.5
""",
    "dedup_recall_report": f"""
WITH {_MINHASH_PAIR_CTES},
sax AS (SELECT doc_id AS s_id, unnest(shingles) AS g FROM sh
        WHERE doc_id % 7 = 0),
cax AS (SELECT doc_id AS other_id, unnest(shingles) AS g FROM sh),
cand AS (SELECT DISTINCT s_id, other_id FROM sax JOIN cax USING (g)
         WHERE s_id <> other_id),
exact AS (
  SELECT c.s_id, c.other_id,
    round(CAST(len(list_intersect(a.shingles, b.shingles)) AS DOUBLE)
      / (len(a.shingles) + len(b.shingles)
         - len(list_intersect(a.shingles, b.shingles))), 6) AS j
  FROM cand c JOIN sh a ON c.s_id = a.doc_id JOIN sh b ON c.other_id = b.doc_id
),
op AS (SELECT DISTINCT s_id, other_id FROM (
         SELECT id_a AS s_id, id_b AS other_id FROM pairs
         UNION ALL SELECT id_b, id_a FROM pairs)
       WHERE s_id % 7 = 0),
mk AS (SELECT e.j, CASE WHEN op.s_id IS NOT NULL THEN 1 ELSE 0 END AS hit
       FROM exact e LEFT JOIN op USING (s_id, other_id) WHERE e.j >= 0.5),
th AS (SELECT unnest([0.5::DOUBLE, 0.7::DOUBLE, 0.9::DOUBLE]) AS threshold)
SELECT threshold,
  count(*) AS n_exact,
  CAST(sum(hit) AS BIGINT) AS n_found,
  round(CAST(sum(hit) AS DOUBLE) / count(*), 6) AS recall
FROM mk JOIN th ON mk.j >= th.threshold
GROUP BY threshold
""",
    "dedup_ngram_jaccard": """
WITH p AS (SELECT doc_id, lang,
  list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS sh FROM documents)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
  round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) AS jaccard
FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
WHERE round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
        / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6) >= 0.5
""",
    # the block-guard ROUTE path (r7): same census threshold in SQL —
    # small blocks exact all-pairs, oversized blocks through the md5
    # MinHash banding (1-gram shingles, 8 hashes / 4 bands) + exact
    # verify; disjoint by block so a plain UNION ALL is exact
    "dedup_ngram_jaccard_routed": f"""
WITH p AS (SELECT doc_id, lang,
  list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS sh
  FROM documents),
cnt AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
cold AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
      AS jaccard
  FROM p a JOIN p b ON a.lang = b.lang AND a.doc_id < b.doc_id
  JOIN cnt c ON c.lang = a.lang AND c.n <= 100
),
hot AS (SELECT p.* FROM p JOIN cnt c ON c.lang = p.lang AND c.n > 100),
ex AS (SELECT doc_id, unnest(sh) AS s FROM hot),
mh AS (SELECT doc_id,
   {_MINHASH_COLS}
   FROM ex GROUP BY doc_id),
bk AS (
  {_MINHASH_BANDS}
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bk a JOIN bk b
    ON a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id
),
routed AS (
  SELECT c.id_a, c.id_b,
    round(CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE)
      / (len(a.sh) + len(b.sh) - len(list_intersect(a.sh, b.sh))), 6)
      AS jaccard
  FROM cand c JOIN hot a ON c.id_a = a.doc_id
              JOIN hot b ON c.id_b = b.doc_id
  WHERE a.lang = b.lang
)
SELECT id_a, id_b, jaccard FROM cold WHERE jaccard >= 0.5
UNION ALL
SELECT id_a, id_b, jaccard FROM routed WHERE jaccard >= 0.5
""",
    "ann_cosine_topk": """
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 3),
s AS (SELECT q.query_id, v.vec_id,
        list_dot_product(v.e, q.qe)
          / (sqrt(list_dot_product(v.e, v.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM v CROSS JOIN q),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM s)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
""",
    "text_langid": f"""
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
s AS (SELECT doc_id,
  len(list_filter(toks, x -> x IN ({_STOP_EN}))) AS s_en,
  len(list_filter(toks, x -> x IN ({_STOP_DE}))) AS s_de,
  len(list_filter(toks, x -> x IN ({_STOP_FR}))) AS s_fr,
  len(list_filter(toks, x -> x IN ({_STOP_ES}))) AS s_es
 FROM w)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_de, s_fr, s_es) = 0 THEN 'unk'
       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       WHEN s_es = greatest(s_en, s_de, s_fr, s_es) THEN 'es'
       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       ELSE 'de' END AS predicted_lang
FROM s
""",
    "text_quality": f"""
WITH w AS (SELECT doc_id, text, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
f AS (SELECT doc_id, text, toks,
  len(toks) AS n_words,
  len(regexp_extract_all(text, '[^\\w\\s]')) AS n_punct,
  length(text) AS n_chars,
  len(list_filter(toks, x -> x IN ({_STOP_ALL}))) AS n_stop,
  list_sum(list_transform(toks, x -> length(x))) AS sum_len
 FROM w)
SELECT doc_id, n_words,
  round(CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END, 6) AS punct_ratio,
  round(CASE WHEN n_words > 0 THEN CAST(n_stop AS DOUBLE) / n_words ELSE 0.0 END, 6) AS stopword_ratio,
  round(CASE WHEN n_words > 0 THEN CAST(sum_len AS DOUBLE) / n_words ELSE 0.0 END, 6) AS avg_word_len,
  (n_words >= 5
   AND (CAST(sum_len AS DOUBLE) / n_words) >= 2.0
   AND (CAST(sum_len AS DOUBLE) / n_words) <= 12.0
   AND (CASE WHEN n_chars > 0 THEN CAST(n_punct AS DOUBLE) / n_chars ELSE 0.0 END) <= 0.3) AS keep
FROM f
""",
    "text_token_counts": """
SELECT doc_id,
  len(regexp_split_to_array(trim(text), '\\s+')) AS ws_tokens,
  len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS bpe_tokens
FROM documents
""",
    "text_fingerprint": """
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents)
SELECT doc_id,
  list_aggregate(list_transform(range(1, greatest(len(toks)-3, 1)+1),
    i -> md5(array_to_string(toks[i:i+3], ' '))), 'min') AS fingerprint
FROM w
""",
    "text_quantile_filter": """
WITH q AS (
  SELECT lang, quantile_cont(n_chars, 0.1) AS p10 FROM documents GROUP BY lang
)
SELECT doc_id, d.lang, n_chars
FROM documents d JOIN q USING (lang)
WHERE n_chars < p10
""",
    "text_rollup_stats": """
SELECT coalesce(source, '<all>') AS source,
  coalesce(lang, '<all>') AS lang,
  count(*) AS n_docs,
  CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY ROLLUP (source, lang)
""",
    "events_pivot_daily": """
SELECT strftime(date_trunc('day', ts::TIMESTAMP), '%Y-%m-%d') AS day,
  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS view
FROM events GROUP BY 1
""",
    "events_user_running": """
SELECT event_id, user_id,
  row_number() OVER w AS rn,
  CAST(round(sum(CAST(value AS DECIMAL(18,2))) OVER (
      PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id
      ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
    AS moving_value_3,
  epoch_ms(ts::TIMESTAMP) - epoch_ms(lag(ts::TIMESTAMP) OVER w) AS gap_ms
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP, event_id)
""",
    "events_funnel": """
WITH e1 AS (SELECT user_id, ts::TIMESTAMP AS ts, event_type FROM events),
w1 AS (SELECT *, min(CASE WHEN event_type = 'view' THEN ts END)
         OVER (PARTITION BY user_id) AS t_view FROM e1),
w2 AS (SELECT *, min(CASE WHEN event_type = 'click' AND t_view IS NOT NULL
                      AND ts >= t_view THEN ts END)
         OVER (PARTITION BY user_id) AS t_click FROM w1),
w3 AS (SELECT *, min(CASE WHEN event_type = 'purchase' AND t_click IS NOT NULL
                      AND ts >= t_click THEN ts END)
         OVER (PARTITION BY user_id) AS t_purchase FROM w2),
pu AS (SELECT user_id, min(t_view) AS t_view, min(t_click) AS t_click,
         min(t_purchase) AS t_purchase
       FROM w3 GROUP BY user_id)
SELECT count(*) AS n_users,
  CAST(sum(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS viewed,
  CAST(sum(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS clicked_after_view,
  CAST(sum(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
    AS purchased_after_click
FROM pu
""",
    "supplier_pareto": """
WITH r AS (
  SELECT l_suppkey AS suppkey,
    sum(CAST(l_extendedprice AS DECIMAL(18,2))
        * CAST(1 - l_discount AS DECIMAL(18,4))) AS rev
  FROM lineitem GROUP BY l_suppkey
),
t AS (SELECT sum(rev) AS total FROM r),
c AS (SELECT suppkey, rev,
        sum(rev) OVER (ORDER BY rev DESC, suppkey
                       ROWS UNBOUNDED PRECEDING) AS cum
      FROM r)
SELECT suppkey,
  CAST(round(rev, 2) AS DOUBLE) AS revenue,
  CAST(round(cum, 2) AS DOUBLE) AS cum_revenue,
  ((cum - rev) * 5 < total * 4) AS in_top80
FROM c, t
""",
    "source_drift_psi": """
WITH g AS (
  SELECT source, least(n_chars // 100, 9) AS bin,
         (doc_id % 5 = 0) AS is_a
  FROM documents
),
cnt AS (
  SELECT source, bin,
    CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
    CAST(sum(CASE WHEN is_a THEN 0 ELSE 1 END) AS BIGINT) AS cb
  FROM g GROUP BY source, bin
),
bins AS (
  SELECT source, b.bin FROM (SELECT DISTINCT source FROM documents)
  CROSS JOIN (SELECT unnest(generate_series(0, 9)) AS bin) b
),
fl AS (
  SELECT bins.source, bins.bin,
    coalesce(cnt.ca, 0) AS ca, coalesce(cnt.cb, 0) AS cb
  FROM bins LEFT JOIN cnt ON bins.source = cnt.source AND bins.bin = cnt.bin
),
tt AS (SELECT source, sum(ca) AS ta, sum(cb) AS tb FROM fl GROUP BY source)
SELECT fl.source,
  CAST(max(ta) AS BIGINT) AS n_prev,
  CAST(max(tb) AS BIGINT) AS n_curr,
  round(sum(
    (CAST(ca + 1 AS DOUBLE) / (ta + 10) - CAST(cb + 1 AS DOUBLE) / (tb + 10))
    * ln((CAST(ca + 1 AS DOUBLE) / (ta + 10))
         / (CAST(cb + 1 AS DOUBLE) / (tb + 10)))
  ), 6) AS psi
FROM fl JOIN tt ON fl.source = tt.source
GROUP BY fl.source
""",
    "corpus_shuffle": """
WITH r AS (
  SELECT doc_id,
    row_number() OVER (ORDER BY md5('r6:' || doc_id::VARCHAR), doc_id)
      AS shuffle_rank
  FROM documents
)
SELECT doc_id, shuffle_rank,
  CAST((shuffle_rank - 1) % 16 AS INT) AS shard_id
FROM r
""",
    "shard_by_token_budget": """
WITH b AS (
  SELECT doc_id,
    CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
    md5('r6:' || doc_id::VARCHAR) AS k
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
    CAST(sum(n_tokens) OVER (ORDER BY k, doc_id ROWS UNBOUNDED PRECEDING)
         AS BIGINT) AS cum_tokens
  FROM b
)
SELECT doc_id, n_tokens, cum_tokens,
  CAST((cum_tokens - n_tokens) // 4096 AS INT) AS shard_id
FROM c
""",
    "text_groupsets_stats": """
SELECT coalesce(source, '<all>') AS source,
  coalesce(lang, '<all>') AS lang,
  count(*) AS n_docs,
  CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY GROUPING SETS ((source, lang), (source), ())
""",
    "text_cube_stats": """
SELECT coalesce(source, '<all>') AS source,
  coalesce(lang, '<all>') AS lang,
  count(*) AS n_docs,
  CAST(sum(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY CUBE (source, lang)
""",
    "sample_stratified": """
SELECT doc_id, lang, source FROM documents
WHERE (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 1, 1)) - 1) * 16
      + (strpos('0123456789abcdef', substr(md5(doc_id::VARCHAR), 2, 1)) - 1)
      < CASE WHEN lang = 'en' THEN 64 ELSE 16 END
""",
    "text_corpus_stats": """
SELECT source,
  count(*) AS n_docs,
  count(DISTINCT lang) AS n_langs,
  CAST(sum(len(regexp_split_to_array(trim(text), '\\s+'))) AS BIGINT) AS total_tokens,
  round(CAST(sum(length(text)) AS DOUBLE) / count(*), 6) AS avg_chars
FROM documents GROUP BY source
""",
    "text_top_terms": """
WITH t AS (
  SELECT unnest(string_split(lower(text), ' ')) AS term FROM documents
)
SELECT term, count(*) AS n FROM t WHERE term <> ''
GROUP BY term ORDER BY n DESC, term ASC LIMIT 20
""",
    "asof_last_click": """
WITH c AS (SELECT user_id, ts, max(value) AS click_value
  FROM events WHERE event_type = 'click' GROUP BY user_id, ts),
p AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase')
SELECT p.event_id, p.user_id, p.ts,
  c.click_value AS last_click_value, c.ts AS last_click_ts
FROM p ASOF LEFT JOIN c ON p.user_id = c.user_id AND p.ts >= c.ts
""",
    "range_join_click_purchase": """
WITH c AS (SELECT event_id AS click_id, user_id, ts AS click_ts
  FROM events WHERE event_type = 'click'),
p AS (SELECT event_id AS purchase_id, user_id, ts AS purchase_ts
  FROM events WHERE event_type = 'purchase')
SELECT purchase_id, click_id, p.user_id, purchase_ts, click_ts
FROM p JOIN c ON p.user_id = c.user_id
  AND c.click_ts <= p.purchase_ts
  AND c.click_ts > p.purchase_ts - INTERVAL 1 HOUR
""",
    "retention_cohorts": """
WITH wk AS (SELECT DISTINCT user_id, date_trunc('week', ts) AS week FROM events),
coh AS (SELECT user_id, week,
    min(week) OVER (PARTITION BY user_id) AS cohort FROM wk)
SELECT strftime(cohort, '%Y-%m-%d') AS cohort,
  strftime(week, '%Y-%m-%d') AS week, n_users, week_offset
FROM (
  SELECT cohort, week, count(*) AS n_users,
    CAST(floor((epoch(week) - epoch(cohort)) / 604800) AS BIGINT) AS week_offset
  FROM coh GROUP BY cohort, week)
""",
    "source_mix_rebalance": """
WITH w AS (SELECT doc_id, source,
    len(regexp_split_to_array(trim(text), '\\s+')) AS t,
    md5(doc_id::VARCHAR) AS h
  FROM documents),
hx AS (SELECT *, ((strpos('0123456789abcdef', substr(h,1,1))-1)*4096
    + (strpos('0123456789abcdef', substr(h,2,1))-1)*256
    + (strpos('0123456789abcdef', substr(h,3,1))-1)*16
    + (strpos('0123456789abcdef', substr(h,4,1))-1)) / 65536.0 AS gate
  FROM w),
tot AS (SELECT source, CAST(sum(t) AS BIGINT) AS actual_tokens FROM w GROUP BY source),
ns AS (SELECT count(*) AS n FROM tot),
wt AS (SELECT source, actual_tokens,
    least(1.0, 100000.0 / n / actual_tokens) AS keep_prob FROM tot, ns),
s AS (SELECT hx.source, count(*) AS n_docs, CAST(sum(t) AS BIGINT) AS sampled_tokens
  FROM hx JOIN wt USING (source) WHERE gate < keep_prob GROUP BY hx.source)
SELECT wt.source, actual_tokens, round(keep_prob, 6) AS keep_prob,
  CAST(coalesce(n_docs, 0) AS BIGINT) AS n_docs,
  CAST(coalesce(sampled_tokens, 0) AS BIGINT) AS sampled_tokens
FROM wt LEFT JOIN s ON wt.source = s.source
""",
    "text_unigram_logprob": """
WITH t AS (
  SELECT doc_id, unnest(regexp_split_to_array(lower(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term FROM t WHERE term <> ''),
v AS (SELECT term, count(*) AS n FROM tf GROUP BY term),
tot AS (SELECT sum(n) AS total FROM v),
lp AS (SELECT term, -ln(CAST(n AS DOUBLE) / total) AS neg_logp FROM v, tot)
SELECT doc_id, round(avg(neg_logp), 6) AS mean_neg_logp,
  count(*) AS n_tokens
FROM tf JOIN lp USING (term) GROUP BY doc_id
""",
    "corpus_prep_e2e": """
WITH w AS (SELECT doc_id, text, source,
    regexp_split_to_array(lower(text), '\\s+') AS toks,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM documents),
kept AS (SELECT * FROM w WHERE doc_id % 97 <> 0 AND n_tokens >= 25),
g AS (SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(toks)-3, 1)+1),
        i -> array_to_string(toks[i:i+3], ' '))) AS grams FROM w),
e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
cg AS (SELECT g.doc_id, unnest(g.grams) AS gram FROM g JOIN kept k USING (doc_id)),
contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN e USING (gram)),
clean AS (SELECT * FROM kept WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
surv AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM clean),
o AS (SELECT source, doc_id, n_tokens,
    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
  FROM surv WHERE rn = 1)
SELECT source, CAST(floor(start_off / 512.0) AS BIGINT) AS bin_id,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM o GROUP BY source, bin_id
""",
    "text_decontaminate": """
WITH w AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM documents),
g AS (SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(toks)-3, 1)+1),
        i -> array_to_string(toks[i:i+3], ' '))) AS grams FROM w),
e AS (SELECT DISTINCT unnest(grams) AS gram FROM g WHERE doc_id % 97 = 0),
c AS (SELECT doc_id, unnest(grams) AS gram FROM g WHERE doc_id % 97 <> 0)
SELECT c.doc_id, count(*) AS n_hits
FROM c JOIN e USING (gram) GROUP BY c.doc_id
""",
    "pack_sequences": """
WITH t AS (SELECT source, doc_id,
    len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens FROM documents),
o AS (SELECT source, doc_id, n_tokens,
    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
  FROM t)
SELECT source, CAST(floor(start_off / 512.0) AS BIGINT) AS bin_id,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM o GROUP BY source, bin_id
""",
    "multimodal_decode": """
WITH h AS (SELECT doc_id, text, md5(text) AS hx FROM documents)
SELECT doc_id AS media_id, 'fake' AS kind,
  CAST((strpos('0123456789abcdef', substr(hx,1,1)) - 1) * 16
       + strpos('0123456789abcdef', substr(hx,2,1)) AS INTEGER) AS width,
  CAST((strpos('0123456789abcdef', substr(hx,3,1)) - 1) * 16
       + strpos('0123456789abcdef', substr(hx,4,1)) AS INTEGER) AS height,
  hx AS feature_hash,
  octet_length(encode(text)) AS n_bytes
FROM h
""",
    # the engine decodes REAL bytes (png/jpeg/gif headers built from the
    # deterministic id -> dims rule); the oracle recomputes the rule in
    # SQL — a header-parse bug in any decoder breaks the value hash
    "multimodal_decode_real": """
SELECT doc_id AS media_id,
  CASE CAST(doc_id % 4 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
       WHEN 2 THEN 'gif' ELSE 'wav' END AS kind,
  CAST((doc_id % 16) + 1 AS INTEGER) AS width,
  CAST(CASE WHEN doc_id % 4 = 3 THEN 0
       ELSE ((doc_id // 16) % 16) + 1 END AS INTEGER) AS height
FROM documents
""",
    # REAL pixel decode (r7): the engine parses the BMP pixel array;
    # the oracle recomputes per-channel means and the position-weighted
    # checksum from the closed-form pixel rule (x*7 + y*13 + c*29) % 256
    # via generate_series — no bytes involved, pure math twin
    "multimodal_pixels_real": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((x.g*7 + y.g*13) % 256 AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST((x.g*7 + y.g*13 + 29) % 256 AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST((x.g*7 + y.g*13 + 58) % 256 AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * ((x.g*7 + y.g*13) % 256)) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # REAL PNG pixel decode (r8): raw byte (row y, in-row index i) is
    # (i*37 + y*101) % 256 with i = 3x + c, channels R,G,B, rows
    # top-down; the engine must invert the per-row filters (y % 5 ->
    # None/Sub/Up/Average/Paeth) to recover these values — the oracle
    # recomputes the statistics closed-form (filters are exactly
    # invertible, so they never appear here). pos_checksum is over the
    # BLUE channel (c=2 -> 3x*37 + 74), image row order.
    "multimodal_pixels_png_real": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((111*x.g + 74 + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST((111*x.g + 37 + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST((111*x.g + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * ((111*x.g + 74 + 101*y.g) % 256)) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # PNG color-type coverage (r8): gray (bpp 1) / RGB (bpp 3) / RGBA
    # (bpp 4) by doc_id % 3; raw byte (row y, index i) is still
    # (i*37 + y*101) % 256 with i = bpp*x + c. Gray reports its single
    # channel in all three slots; RGBA excludes alpha; checksum is over
    # the blue channel (gray: the gray channel).
    "multimodal_pixels_png_variants": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (37*x.g + 101*y.g) % 256
    WHEN 1 THEN (111*x.g + 74 + 101*y.g) % 256
    ELSE (148*x.g + 74 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (37*x.g + 101*y.g) % 256
    WHEN 1 THEN (111*x.g + 37 + 101*y.g) % 256
    ELSE (148*x.g + 37 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (37*x.g + 101*y.g) % 256
    WHEN 1 THEN (111*x.g + 101*y.g) % 256
    ELSE (148*x.g + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * (CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (37*x.g + 101*y.g) % 256
    WHEN 1 THEN (111*x.g + 74 + 101*y.g) % 256
    ELSE (148*x.g + 74 + 101*y.g) % 256 END)) AS BIGINT) AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # PNG palette + gray-alpha coverage (r8 third pass): doc_id % 3
    # cycles PLTE-8 / PLTE-4 / gray+alpha-8. Palette pixel channel at
    # (x, y) is the PLTE closed form at index i = (x*11 + y*17) % 16 —
    # identical for both palette depths (the engine-side bit-unpack
    # paths differ, the content doesn't). Gray+alpha: gray byte is
    # sample 2x of the depth-8 byte rule -> (74x + 101y) % 256.
    "multimodal_pixels_png_palette": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (7*((x.g*11 + y.g*17) % 16) + 3) % 256
    ELSE (74*x.g + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (5*((x.g*11 + y.g*17) % 16) + 2) % 256
    ELSE (74*x.g + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (3*((x.g*11 + y.g*17) % 16) + 1) % 256
    ELSE (74*x.g + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * (CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (7*((x.g*11 + y.g*17) % 16) + 3) % 256
    ELSE (74*x.g + 101*y.g) % 256 END)) AS BIGINT) AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # PNG 16-bit coverage (r8 third pass): doc_id % 3 cycles 16-bit
    # gray / RGB / RGBA. The big-endian byte pair of channel c at
    # (x, y) follows the byte rule at byte indexes 2*(channels*x+c)
    # and +1, so the sample is hi*256 + lo with
    # hi = (2*channels*37*x + 74*c + 101*y) % 256 and lo = hi-rule+37.
    "multimodal_pixels_png16": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN ((74*x.g + 101*y.g) % 256)*256
              + (74*x.g + 37 + 101*y.g) % 256
    WHEN 1 THEN ((222*x.g + 148 + 101*y.g) % 256)*256
              + (222*x.g + 185 + 101*y.g) % 256
    ELSE ((296*x.g + 148 + 101*y.g) % 256)*256
       + (296*x.g + 185 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN ((74*x.g + 101*y.g) % 256)*256
              + (74*x.g + 37 + 101*y.g) % 256
    WHEN 1 THEN ((222*x.g + 74 + 101*y.g) % 256)*256
              + (222*x.g + 111 + 101*y.g) % 256
    ELSE ((296*x.g + 74 + 101*y.g) % 256)*256
       + (296*x.g + 111 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN ((74*x.g + 101*y.g) % 256)*256
              + (74*x.g + 37 + 101*y.g) % 256
    WHEN 1 THEN ((222*x.g + 101*y.g) % 256)*256
              + (222*x.g + 37 + 101*y.g) % 256
    ELSE ((296*x.g + 101*y.g) % 256)*256
       + (296*x.g + 37 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * (CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN ((74*x.g + 101*y.g) % 256)*256
              + (74*x.g + 37 + 101*y.g) % 256
    WHEN 1 THEN ((222*x.g + 148 + 101*y.g) % 256)*256
              + (222*x.g + 185 + 101*y.g) % 256
    ELSE ((296*x.g + 148 + 101*y.g) % 256)*256
       + (296*x.g + 185 + 101*y.g) % 256 END)) AS BIGINT) AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # Adam7-interlaced PNG (r8 third pass): the stored bytes are the
    # seven interlace passes, but the FINAL image is the SAME closed
    # form as multimodal_pixels_png_real — the oracle is byte-for-byte
    # that query's oracle, so a pass-grid/scatter bug diverges here
    # while the row-major query stays green.
    "multimodal_pixels_png_adam7": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((111*x.g + 74 + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST((111*x.g + 37 + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST((111*x.g + 101*y.g) % 256 AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * ((111*x.g + 74 + 101*y.g) % 256)) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # REAL MP4 demux (r8 fourth pass): every field is a closed form of
    # doc_id — video (id%9)+3 samples x (id%5)+2 bytes @ delta 40,
    # audio (id%13)+4 x (id%3)+1 @ delta 23, dims ((id%16)+1)*16 x
    # ((id%9)+1)*16, timescales 1000, audio data starts after the
    # video bytes in mdat. Two rows per document (one per track).
    "multimodal_mp4_demux": """
SELECT doc_id AS media_id,
  CAST(1 AS INTEGER) AS track_id, 'vide' AS handler, 'avc1' AS codec,
  CAST(((doc_id % 16) + 1) * 16 AS INTEGER) AS width,
  CAST(((doc_id % 9) + 1) * 16 AS INTEGER) AS height,
  CAST(1000 AS INTEGER) AS timescale,
  CAST(((doc_id % 9) + 3) * 40 AS BIGINT) AS duration,
  CAST((doc_id % 9) + 3 AS INTEGER) AS n_samples,
  CAST(((doc_id % 9) + 3) * ((doc_id % 5) + 2) AS BIGINT) AS sample_bytes,
  CAST(0 AS BIGINT) AS mdat_offset,
  CAST(1000 AS INTEGER) AS movie_timescale,
  CAST(greatest(((doc_id % 9) + 3) * 40, ((doc_id % 13) + 4) * 23)
       AS BIGINT) AS movie_duration
FROM documents
UNION ALL
SELECT doc_id AS media_id,
  CAST(2 AS INTEGER) AS track_id, 'soun' AS handler, 'mp4a' AS codec,
  CAST(0 AS INTEGER) AS width, CAST(0 AS INTEGER) AS height,
  CAST(1000 AS INTEGER) AS timescale,
  CAST(((doc_id % 13) + 4) * 23 AS BIGINT) AS duration,
  CAST((doc_id % 13) + 4 AS INTEGER) AS n_samples,
  CAST(((doc_id % 13) + 4) * ((doc_id % 3) + 1) AS BIGINT) AS sample_bytes,
  CAST(((doc_id % 9) + 3) * ((doc_id % 5) + 2) AS BIGINT) AS mdat_offset,
  CAST(1000 AS INTEGER) AS movie_timescale,
  CAST(greatest(((doc_id % 9) + 3) * 40, ((doc_id % 13) + 4) * 23)
       AS BIGINT) AS movie_duration
FROM documents
""",
    # REAL container-level frame sampling (r8 fourth pass): every 2nd
    # video sample; video sample k occupies mdat bytes
    # [k*vs, (k+1)*vs) with vs = (id%5)+2, and mdat byte j is
    # (j*13 + 5) % 256 — checksum recomputed byte-by-byte.
    "multimodal_mp4_frame_sample": """
SELECT d.doc_id AS media_id,
  CAST(k.g AS INTEGER) AS frame_idx,
  CAST(k.g * d.vs AS BIGINT) AS mdat_offset,
  CAST(d.vs AS INTEGER) AS frame_bytes,
  CAST(sum(((k.g * d.vs + t.g) * 13 + 5) % 256) AS BIGINT) AS checksum
FROM (SELECT doc_id, (doc_id % 9) + 3 AS vn, (doc_id % 5) + 2 AS vs
      FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.vn - 1)) AS g) k,
  LATERAL (SELECT unnest(generate_series(0, d.vs - 1)) AS g) t
WHERE k.g % 2 = 0
GROUP BY d.doc_id, k.g, d.vs
""",
    # REAL baseline JPEG entropy decode (r8 fifth pass): dims
    # 8*((id%4)+1) x 8*((id%3)+1); every 8x8 block is uniform with
    # value (bx*29 + by*31 + id*7) % 256 (uniform -> DC-only -> the
    # lossy DCT is exact). A block's 64 pixels contribute
    # v * (512*bx + 224 + w*(512*by + 224)) to the positional
    # checksum (sum over x in [8bx, 8bx+8) and y likewise).
    "multimodal_jpeg_real": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
    AS mean_c0,
  round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
    AS mean_c1,
  round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
    AS mean_c2,
  CAST(sum(((bx.g*29 + yb.g*31 + d.doc_id*7) % 256)
           * (512*bx.g + 224 + d.w*(512*yb.g + 224))) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, 8*((doc_id % 4) + 1) AS w,
             8*((doc_id % 3) + 1) AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w//8 - 1)) AS g) bx,
  LATERAL (SELECT unnest(generate_series(0, d.h//8 - 1)) AS g) yb
GROUP BY d.doc_id, d.w, d.h
""",
    # 3-component 4:4:4 variant: per-component uniform-block rules
    # Y:(29,31,7) Cb:(17,23,5) Cr:(13,19,11); checksum over the LAST
    # component (Cr), matching the engine's blue-analog convention.
    "multimodal_jpeg_color_real": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
    AS mean_c0,
  round(avg(CAST((bx.g*17 + yb.g*23 + d.doc_id*5) % 256 AS DOUBLE)), 6)
    AS mean_c1,
  round(avg(CAST((bx.g*13 + yb.g*19 + d.doc_id*11) % 256 AS DOUBLE)), 6)
    AS mean_c2,
  CAST(sum(((bx.g*13 + yb.g*19 + d.doc_id*11) % 256)
           * (512*bx.g + 224 + d.w*(512*yb.g + 224))) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, 8*((doc_id % 4) + 1) AS w,
             8*((doc_id % 3) + 1) AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w//8 - 1)) AS g) bx,
  LATERAL (SELECT unnest(generate_series(0, d.h//8 - 1)) AS g) yb
GROUP BY d.doc_id, d.w, d.h
""",
    # Compressed + sub-byte BMP (r8 eighth pass): doc_id % 3 cycles
    # RLE8 / 4-bit / 1-bit palette. RLE8 and 4-bit share the 16-color
    # index rule (identical content, different byte paths); 1-bit uses
    # the 2-color rule. Palette entries follow the shared PLTE closed
    # form in BMP order; checksum over blue.
    "multimodal_pixels_bmp_rle": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((7*((x.g*11 + y.g*17) %
    (CASE WHEN CAST(d.doc_id % 3 AS INT) = 2 THEN 2 ELSE 16 END)) + 3)
    % 256 AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST((5*((x.g*11 + y.g*17) %
    (CASE WHEN CAST(d.doc_id % 3 AS INT) = 2 THEN 2 ELSE 16 END)) + 2)
    % 256 AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST((3*((x.g*11 + y.g*17) %
    (CASE WHEN CAST(d.doc_id % 3 AS INT) = 2 THEN 2 ELSE 16 END)) + 1)
    % 256 AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * ((7*((x.g*11 + y.g*17) %
    (CASE WHEN CAST(d.doc_id % 3 AS INT) = 2 THEN 2 ELSE 16 END)) + 3)
    % 256)) AS BIGINT) AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # Mixed three-codec decode (r8 seventh pass): doc_id % 3 cycles
    # BMP / PNG / progressive-JPEG, each with its own closed form and
    # its own dim rule (JPEG dims are block multiples); the blue-slot
    # checksum follows the dispatch convention (BMP blue, PNG blue,
    # JPEG gray=last component).
    "multimodal_pixels_mixed_real": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (x.g*7 + y.g*13) % 256
    WHEN 1 THEN (111*x.g + 74 + 101*y.g) % 256
    ELSE ((x.g//8)*29 + (y.g//8)*31 + d.doc_id*7) % 256
    END AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (x.g*7 + y.g*13 + 29) % 256
    WHEN 1 THEN (111*x.g + 37 + 101*y.g) % 256
    ELSE ((x.g//8)*29 + (y.g//8)*31 + d.doc_id*7) % 256
    END AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST(CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (x.g*7 + y.g*13 + 58) % 256
    WHEN 1 THEN (111*x.g + 101*y.g) % 256
    ELSE ((x.g//8)*29 + (y.g//8)*31 + d.doc_id*7) % 256
    END AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * (CASE CAST(d.doc_id % 3 AS INT)
    WHEN 0 THEN (x.g*7 + y.g*13) % 256
    WHEN 1 THEN (111*x.g + 74 + 101*y.g) % 256
    ELSE ((x.g//8)*29 + (y.g//8)*31 + d.doc_id*7) % 256
    END)) AS BIGINT) AS pos_checksum
FROM (SELECT doc_id,
        CASE WHEN doc_id % 3 = 2 THEN 8*((doc_id % 4) + 1)
             ELSE (doc_id % 16) + 1 END AS w,
        CASE WHEN doc_id % 3 = 2 THEN 8*(((doc_id // 4) % 3) + 1)
             ELSE ((doc_id // 16) % 16) + 1 END AS h
      FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # Progressive JPEG (r8 seventh pass): the oracles are VERBATIM
    # the baseline queries' — progressive stores the same coefficients
    # in a different scan order, so decoded content must be identical;
    # a scan-script or refinement bug diverges here only.
    "multimodal_jpeg_progressive_real": None,  # patched below
    "multimodal_jpeg_progressive_420": None,  # patched below
    # 4:2:0 variant (r8 sixth pass): dims 16*((id%3)+1) x
    # 16*((id%2)+1); luma follows the 8x8-grid rule, chroma the
    # 16x16 MCU-grid rules replicated to full resolution. A 16x16
    # cell's pixels contribute v * (4096*cx + 1920 + w*(4096*cy +
    # 1920)) to the positional checksum.
    "multimodal_jpeg_420_real": """
SELECT l.media_id, l.width, l.height,
       l.mean_c0, c.mean_c1, c.mean_c2, c.pos_checksum
FROM (
  SELECT d.doc_id AS media_id,
    CAST(d.w AS INTEGER) AS width,
    CAST(d.h AS INTEGER) AS height,
    round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
      AS mean_c0
  FROM (SELECT doc_id, 16*((doc_id % 3) + 1) AS w,
               16*((doc_id % 2) + 1) AS h FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.w//8 - 1)) AS g) bx,
    LATERAL (SELECT unnest(generate_series(0, d.h//8 - 1)) AS g) yb
  GROUP BY d.doc_id, d.w, d.h
) l
JOIN (
  SELECT d.doc_id AS media_id,
    round(avg(CAST((cx.g*17 + cy.g*23 + d.doc_id*5) % 256 AS DOUBLE)), 6)
      AS mean_c1,
    round(avg(CAST((cx.g*13 + cy.g*19 + d.doc_id*11) % 256 AS DOUBLE)), 6)
      AS mean_c2,
    CAST(sum(((cx.g*13 + cy.g*19 + d.doc_id*11) % 256)
             * (4096*cx.g + 1920 + d.w*(4096*cy.g + 1920))) AS BIGINT)
      AS pos_checksum
  FROM (SELECT doc_id, 16*((doc_id % 3) + 1) AS w,
               16*((doc_id % 2) + 1) AS h FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.w//16 - 1)) AS g) cx,
    LATERAL (SELECT unnest(generate_series(0, d.h//16 - 1)) AS g) cy
  GROUP BY d.doc_id, d.w
) c ON l.media_id = c.media_id
""",
    # 4:1:1 (r9): luma blocks over (w//8, h//8); chroma cells are 32x8
    # full-res regions (w//32, h//8). Per-cell position weight:
    # sum_{x,y in cell}(x + y*w) = 8*(1024*cx + 496)
    # + 32*w*(64*cy + 28) = 8192*cx + 3968 + w*(2048*cy + 896).
    "multimodal_jpeg_411_real": """
SELECT l.media_id, l.width, l.height,
       l.mean_c0, c.mean_c1, c.mean_c2, c.pos_checksum
FROM (
  SELECT d.doc_id AS media_id,
    CAST(d.w AS INTEGER) AS width,
    CAST(d.h AS INTEGER) AS height,
    round(avg(CAST((bx.g*29 + yb.g*31 + d.doc_id*7) % 256 AS DOUBLE)), 6)
      AS mean_c0
  FROM (SELECT doc_id, 32*((doc_id % 2) + 1) AS w,
               8*((doc_id % 3) + 1) AS h FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.w//8 - 1)) AS g) bx,
    LATERAL (SELECT unnest(generate_series(0, d.h//8 - 1)) AS g) yb
  GROUP BY d.doc_id, d.w, d.h
) l
JOIN (
  SELECT d.doc_id AS media_id,
    round(avg(CAST((cx.g*17 + cy.g*23 + d.doc_id*5) % 256 AS DOUBLE)), 6)
      AS mean_c1,
    round(avg(CAST((cx.g*13 + cy.g*19 + d.doc_id*11) % 256 AS DOUBLE)), 6)
      AS mean_c2,
    CAST(sum(((cx.g*13 + cy.g*19 + d.doc_id*11) % 256)
             * (8192*cx.g + 3968 + d.w*(2048*cy.g + 896))) AS BIGINT)
      AS pos_checksum
  FROM (SELECT doc_id, 32*((doc_id % 2) + 1) AS w,
               8*((doc_id % 3) + 1) AS h FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.w//32 - 1)) AS g) cx,
    LATERAL (SELECT unnest(generate_series(0, d.h//8 - 1)) AS g) cy
  GROUP BY d.doc_id, d.w
) c ON l.media_id = c.media_id
""",
    # BMP storage-layout coverage (r8 sixth pass): doc_id % 3 cycles
    # 24-bit / 32-bit / 8-bit palette. The first two decode to the
    # SAME channel rule (x*7 + y*13 + c*29) % 256 (alpha excluded);
    # the palette variant maps i = (x*11 + y*17) % 16 through the
    # PLTE closed form in BMP byte order. Checksum over blue.
    "multimodal_pixels_bmp_variants": """
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (x.g*7 + y.g*13) % 256
    ELSE (7*((x.g*11 + y.g*17) % 16) + 3) % 256
    END AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (x.g*7 + y.g*13 + 29) % 256
    ELSE (5*((x.g*11 + y.g*17) % 16) + 2) % 256
    END AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST(CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (x.g*7 + y.g*13 + 58) % 256
    ELSE (3*((x.g*11 + y.g*17) % 16) + 1) % 256
    END AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*d.w) * (CASE WHEN CAST(d.doc_id % 3 AS INT) < 2
    THEN (x.g*7 + y.g*13) % 256
    ELSE (7*((x.g*11 + y.g*17) % 16) + 3) % 256 END)) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, d.w, d.h
""",
    # Integer-PCM depth coverage (r8 sixth pass): doc_id % 3 cycles
    # 8/24/32-bit; data byte j is (j*31) % 256 at every depth, so
    # sample k reassembles from bytes step*k .. step*k+step-1 with
    # little-endian weights and sign extension (8-bit: unsigned -128).
    "multimodal_pcm_depths": """
SELECT media_id,
  CAST(channels AS INTEGER) AS channels,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(count(*) AS BIGINT) AS n_samples,
  CAST(sum(abs(v)) AS BIGINT) AS abs_sum,
  CAST(max(abs(v)) AS BIGINT) AS peak,
  CAST(sum(s.k * abs(v)) AS BIGINT) AS pos_checksum
FROM (
  SELECT d.media_id, d.channels, s.k,
    CASE CAST(d.media_id % 3 AS INT)
      WHEN 0 THEN ((s.k*31) % 256) - 128
      WHEN 1 THEN ((3*s.k*31) % 256)
             + (((3*s.k + 1)*31) % 256) * 256
             + (((3*s.k + 2)*31) % 256) * 65536
             - CASE WHEN (((3*s.k + 2)*31) % 256) >= 128
                    THEN 16777216 ELSE 0 END
      ELSE ((4*s.k*31) % 256)
         + (((4*s.k + 1)*31) % 256) * 256
         + (((4*s.k + 2)*31) % 256) * 65536
         + (((4*s.k + 3)*31) % 256) * 16777216
         - CASE WHEN (((4*s.k + 3)*31) % 256) >= 128
                THEN 4294967296 ELSE 0 END
    END AS v
  FROM (SELECT doc_id AS media_id, (doc_id % 3) + 1 AS channels,
               ((doc_id % 11) + 2) * 8 AS frames FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.channels*d.frames - 1))
             AS k) s
) s
GROUP BY media_id, channels
""",
    # IEEE-float PCM (r9): sample k is the dyadic rule
    # (((k*31) % 256) - 128) / 128.0, exact in float32/float64 and in
    # DuckDB's double arithmetic; multiples of 2^-7 have <= 7 decimal
    # digits so the 9-decimal rounding on both sides is the identity
    "multimodal_pcm_float": """
SELECT media_id,
  CAST(channels AS INTEGER) AS channels,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(count(*) AS BIGINT) AS n_samples,
  round(sum(abs(v)), 9) AS abs_sum,
  round(max(abs(v)), 9) AS peak,
  round(sum(s.k * abs(v)), 9) AS pos_checksum
FROM (
  SELECT d.media_id, d.channels, s.k,
    CAST(((s.k*31) % 256) - 128 AS DOUBLE) / 128.0 AS v
  FROM (SELECT doc_id AS media_id, (doc_id % 3) + 1 AS channels,
               ((doc_id % 11) + 2) * 8 AS frames FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.channels*d.frames - 1))
             AS k) s
) s
GROUP BY media_id, channels
""",
    # REAL PCM decode (r7): data byte j is (j*31) % 256, sample k is
    # int16(lo=b[2k], hi=b[2k+1]) — the oracle reconstructs every
    # sample from the byte rule and reduces the same statistics
    "multimodal_pcm_real": """
SELECT media_id,
  CAST(channels AS INTEGER) AS channels,
  CAST(8000 AS INTEGER) AS sample_rate,
  CAST(count(*) AS BIGINT) AS n_samples,
  round(avg(CAST(abs(v) AS DOUBLE)), 6) AS mean_abs,
  CAST(max(abs(v)) AS BIGINT) AS peak,
  CAST(sum(s.k * abs(v)) AS BIGINT) AS pos_checksum
FROM (
  SELECT d.media_id, d.channels, s.k,
    ((2*s.k*31) % 256) + (((2*s.k + 1)*31) % 256) * 256
      - CASE WHEN (((2*s.k + 1)*31) % 256) >= 128 THEN 65536 ELSE 0 END
      AS v, s.k AS kk
  FROM (SELECT doc_id AS media_id, (doc_id % 3) + 1 AS channels,
               ((doc_id % 11) + 2) * 8 AS frames FROM documents) d,
    LATERAL (SELECT unnest(generate_series(0, d.channels*d.frames - 1))
             AS k) s
) s
GROUP BY media_id, channels
""",
    # REAL resize (r7): nearest-neighbor sample indices recomputed
    # closed-form over the 4x3 target grid — resample + re-encode +
    # re-decode all verified by one hash
    "multimodal_resize_real": """
SELECT d.doc_id AS media_id,
  CAST(4 AS INTEGER) AS width,
  CAST(3 AS INTEGER) AS height,
  round(avg(CAST((((x.g*d.w)//4)*7 + ((y.g*d.h)//3)*13) % 256
            AS DOUBLE)), 6) AS mean_b,
  round(avg(CAST((((x.g*d.w)//4)*7 + ((y.g*d.h)//3)*13 + 29) % 256
            AS DOUBLE)), 6) AS mean_g,
  round(avg(CAST((((x.g*d.w)//4)*7 + ((y.g*d.h)//3)*13 + 58) % 256
            AS DOUBLE)), 6) AS mean_r,
  CAST(sum((x.g + y.g*4)
           * ((((x.g*d.w)//4)*7 + ((y.g*d.h)//3)*13) % 256)) AS BIGINT)
    AS pos_checksum
FROM (SELECT doc_id, (doc_id % 16) + 1 AS w,
             ((doc_id // 16) % 16) + 1 AS h FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, 3)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, 2)) AS g) y
GROUP BY d.doc_id
""",
    # multimodal -> ANN over REAL decoded content: embedding = rounded
    # channel means + dims (identical doubles both engines), exact
    # cosine top-5; same window/tiebreak as ann_cosine_topk. Inputs are
    # MIXED-format (r8): even ids carry the BMP pixel rule
    # (x*7 + y*13 + c*29) % 256, odd ids the PNG raw-byte rule
    # ((3x+c)*37 + y*101) % 256 — a decode bug in either format's path
    # shifts the embedding set and the ranking
    "multimodal_ann_real": """
WITH d AS (SELECT doc_id, (doc_id % 16) + 1 AS w,
                  ((doc_id // 16) % 16) + 1 AS h FROM documents),
m AS (
  SELECT d.doc_id,
    round(avg(CAST(CASE WHEN d.doc_id % 2 = 0
      THEN (x.g*7 + y.g*13) % 256
      ELSE (111*x.g + 74 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mb,
    round(avg(CAST(CASE WHEN d.doc_id % 2 = 0
      THEN (x.g*7 + y.g*13 + 29) % 256
      ELSE (111*x.g + 37 + 101*y.g) % 256 END AS DOUBLE)), 6) AS mg,
    round(avg(CAST(CASE WHEN d.doc_id % 2 = 0
      THEN (x.g*7 + y.g*13 + 58) % 256
      ELSE (111*x.g + 101*y.g) % 256 END AS DOUBLE)), 6) AS mr,
    d.w, d.h
  FROM d,
    LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
    LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
  GROUP BY d.doc_id, d.w, d.h),
v AS (SELECT doc_id AS vec_id,
             [mb, mg, mr, CAST(w AS DOUBLE), CAST(h AS DOUBLE)] AS e
      FROM m),
q AS (SELECT vec_id AS query_id, e AS qe FROM v WHERE vec_id < 3),
s AS (SELECT q.query_id, v.vec_id,
        list_dot_product(v.e, q.qe)
          / (sqrt(list_dot_product(v.e, v.e))
             * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM v CROSS JOIN q),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id)
          AS rk
      FROM s)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
""",
    # REAL GIF frame-pixel decode (r8): frame f's color index at (x, y)
    # is (x*3 + y*5 + f*7) % 8 under the closed-form palette
    # ((i*11)%256, (i*23)%256, (i*47)%256); the engine recovers the
    # indices by actually LZW-decompressing each frame's data stream —
    # the oracle recomputes the statistics from the two closed forms
    "multimodal_gif_pixels_real": """
SELECT d.doc_id AS media_id,
  CAST(f.g AS INTEGER) AS frame_idx,
  CAST(d.w AS INTEGER) AS width,
  CAST(d.h AS INTEGER) AS height,
  round(avg(CAST((((x.g*3 + y.g*5 + f.g*7) % 8) * 11) % 256 AS DOUBLE)), 6)
    AS mean_r,
  round(avg(CAST((((x.g*3 + y.g*5 + f.g*7) % 8) * 23) % 256 AS DOUBLE)), 6)
    AS mean_g,
  round(avg(CAST((((x.g*3 + y.g*5 + f.g*7) % 8) * 47) % 256 AS DOUBLE)), 6)
    AS mean_b,
  CAST(sum((x.g + y.g*d.w) * ((x.g*3 + y.g*5 + f.g*7) % 8)) AS BIGINT)
    AS idx_checksum
FROM (SELECT doc_id, (doc_id % 6) + 2 AS w, ((doc_id // 6) % 6) + 2 AS h,
             (doc_id % 4) + 1 AS nf FROM documents) d,
  LATERAL (SELECT unnest(generate_series(0, d.nf - 1)) AS g) f,
  LATERAL (SELECT unnest(generate_series(0, d.w - 1)) AS g) x,
  LATERAL (SELECT unnest(generate_series(0, d.h - 1)) AS g) y
GROUP BY d.doc_id, f.g, d.w, d.h
""",
    # interlaced variant (r8): the payload stores rows in 4-pass
    # interlace order; the RULE is in image coordinates, so the oracle
    # is the identical closed form — the engine must deinterlace to hit
    # the same hash (registered below after the dict literal)
    # real GIF block-grammar walk: the engine counts image descriptors
    # in generated multi-frame GIFs; the oracle recomputes the
    # id -> frame-count rule
    "multimodal_frames_real": """
SELECT doc_id AS media_id, CAST(g AS BIGINT) AS frame_idx
FROM (SELECT doc_id,
        unnest(generate_series(0, CAST(doc_id % 7 AS INT))) AS g
      FROM documents)
WHERE g % 2 = 0
""",
    # image near-dedup e2e: identical payload bytes within a doc_id%97
    # group must collapse to the group's min id through the synth ->
    # extract -> LSH -> verify -> anti-join chain
    "multimodal_dedup_images": """
SELECT doc_id FROM (
  SELECT doc_id, min(doc_id) OVER (PARTITION BY doc_id % 97) AS m
  FROM documents) WHERE doc_id = m
""",
    "multimodal_frames": """
WITH h AS (SELECT doc_id, md5(text) AS hx FROM documents),
w AS (SELECT doc_id,
  CAST((strpos('0123456789abcdef', substr(hx,1,1)) - 1) * 16
       + strpos('0123456789abcdef', substr(hx,2,1)) AS INTEGER) AS width
  FROM h)
SELECT doc_id AS media_id, CAST(g AS BIGINT) AS frame_idx
FROM (SELECT doc_id, unnest(generate_series(0, width % 16)) AS g FROM w)
WHERE g % 2 = 0
""",
    "s7_wildcard_lookup": """
WITH long AS (
  SELECT '/f'||doc_id AS file, '/entry/detector/channel_0/counts' AS h5_path,
         CAST(n_chars AS VARCHAR) AS value, 'counts' AS unit FROM documents
  UNION ALL
  SELECT '/f'||doc_id, '/entry/detector/channel_1/counts', CAST(doc_id AS VARCHAR), 'counts' FROM documents
  UNION ALL
  SELECT '/f'||doc_id, '/entry/detector/zchan/counts', '0', 'other' FROM documents
),
m AS (SELECT * FROM long
      WHERE regexp_matches(h5_path, '^/entry/detector/[^/]*channel_*[^/]*/counts$'))
SELECT file, string_agg(value, ',' ORDER BY h5_path) AS vals,
  CASE WHEN count(DISTINCT unit) = 1 THEN min(unit) ELSE '' END AS unit
FROM m GROUP BY file
""",
    "s6_hdf5_scan": """
WITH f AS (SELECT '/f'||doc_id AS file FROM documents),
s AS (SELECT file, CAST(concat('0x', substr(md5(file),1,8)) AS BIGINT) AS n FROM f)
SELECT file, t.h5_path, t.value, t.unit FROM s, LATERAL (VALUES
  ('/entry/title', 'run '||(n % 1000), ''),
  ('/entry/sample/name', 'sample-'||(n % 50), ''),
  ('/entry/experiment_identifier', 'prop-'||(n % 20), ''),
  ('/entry/instrument/name', 'instr-'||(n % 5), ''),
  ('/entry/sensor/temperature', CAST(round(200 + (n % 1000)/10.0, 1) AS VARCHAR), 'K'),
  ('/entry/sensor/pressure', CAST(round(1 + (n % 97)/100.0, 2) AS VARCHAR), 'bar'),
  ('/entry/user_alice/name', 'alice-'||(n % 7), ''),
  ('/entry/user_bob/name', 'bob-'||(n % 11), ''),
  ('/entry/detector/channel_0/counts', CAST(n % 10000 AS VARCHAR), 'counts'),
  ('/entry/detector/channel_1/counts', CAST((n // 7) % 10000 AS VARCHAR), 'counts')
) t(h5_path, value, unit)
""",
    "o2_first_match": """
SELECT l_orderkey, l_linenumber, strftime(l_shipdate::TIMESTAMP, '%Y-%m-%d') AS first_shipdate
FROM (SELECT *, row_number() OVER (PARTITION BY l_orderkey ORDER BY l_shipdate, l_linenumber) AS rn
      FROM lineitem)
WHERE rn = 1
""",
    "v3_error_channel": """
WITH r AS (
  SELECT event_id,
    CASE WHEN event_id % 7 = 0 THEN 'x'||json_extract_string(props,'$.k')
         ELSE json_extract_string(props,'$.k') END AS raw_k
  FROM events
)
SELECT event_id,
  TRY_CAST(raw_k AS BIGINT) AS k_parsed,
  CASE WHEN TRY_CAST(raw_k AS BIGINT) IS NULL THEN 1 ELSE 0 END AS n_failures,
  CASE WHEN TRY_CAST(raw_k AS BIGINT) IS NULL THEN 'k' ELSE '' END AS failed_vars
FROM r
""",
    "p8_null_drop_json": """
WITH e AS (SELECT event_id, CAST(json_extract_string(props,'$.k') AS BIGINT) AS k FROM events)
SELECT event_id,
  '{'|| concat_ws(',',
    CASE WHEN (k % 3) != 0 THEN '"owner":"grp-'||k||'"' END,
    '"k":'||k) ||'}' AS payload
FROM e
""",
    "ann_lsh_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sigv AS (SELECT vec_id, e, {_sig_sql('e')} AS sig FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, sig FROM sigv WHERE vec_id < 3),
sc AS (SELECT q.query_id, s.vec_id,
        list_dot_product(s.e, q.qe)
          / (sqrt(list_dot_product(s.e, s.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM sigv s JOIN q ON s.sig = q.sig),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
""",
    "dedup_embedding_cosine": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sigv AS (SELECT vec_id, e, {_sig_sql('e')} AS sig FROM v)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  round(list_dot_product(a.e, b.e)
    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) AS cosine
FROM sigv a JOIN sigv b ON a.sig = b.sig AND a.vec_id < b.vec_id
WHERE round(list_dot_product(a.e, b.e)
    / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(b.e, b.e))), 6) >= 0.3
""",
    "ann_ivf_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cv AS (SELECT vec_id, e, {_ivf_cell_sql('e')} AS cell FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, cell FROM cv WHERE vec_id < 3),
sc AS (SELECT q.query_id, c.vec_id,
        list_dot_product(c.e, q.qe)
          / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM cv c JOIN q ON c.cell = q.cell),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
""",
    "ann_ivf_nprobe_topk": f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cv AS (SELECT vec_id, e, {_ivf_cell_sql('e')} AS cell FROM v),
qd AS (SELECT vec_id AS query_id, e AS qe, {_ivf_dots_sql('e')} AS d
       FROM v WHERE vec_id < 3),
q1 AS (SELECT query_id, qe, d, list_position(d, list_max(d)) AS c1 FROM qd),
q2 AS (SELECT query_id, qe, c1,
        list_position(
          list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END),
          list_max(
            list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END))
        ) AS c2
      FROM q1),
sc AS (SELECT q.query_id, c.vec_id,
        list_dot_product(c.e, q.qe)
          / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM cv c JOIN q2 q ON c.cell IN (q.c1, q.c2)),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
""",
    "ingest_samples": """
WITH msgs AS (
  SELECT event_id, 'job-'||event_id AS job_id,
    'instr-'||(user_id % 8) AS instrument_name,
    'sample-'||(event_id % 40) AS description,
    'prop-'||((user_id % 8) * 3) AS proposal_id
  FROM events
),
firsts AS (
  SELECT * FROM (
    SELECT *, row_number() OVER (
      PARTITION BY description, proposal_id ORDER BY event_id) AS rn
    FROM msgs) WHERE rn = 1
),
existing AS (
  SELECT DISTINCT 'sample-'||(s_suppkey % 40) AS description,
    'prop-'||(s_nationkey % 25) AS proposal_id
  FROM supplier
)
SELECT f.description, f.proposal_id, f.instrument_name AS owner_group, f.job_id
FROM firsts f
WHERE NOT EXISTS (SELECT 1 FROM existing e
  WHERE e.description = f.description AND e.proposal_id = f.proposal_id)
""",
    "ingest_nexus": """
WITH f AS (SELECT '/f'||doc_id AS file FROM documents),
s AS (SELECT file, CAST(concat('0x', substr(md5(file),1,8)) AS BIGINT) AS n FROM f)
SELECT file,
  'prop-'||(n % 20)||'/sample-'||(n % 50) AS pid,
  'run '||(n % 1000) AS dataset_name,
  round(200 + (n % 1000)/10.0, 1) AS temperature,
  'K' AS temperature_unit,
  'alice-'||(n % 7)||',bob-'||(n % 11) AS users,
  'missing' AS failed_vars
FROM s
""",
    "ingest_coda_real": """
WITH f AS (SELECT '/f'||doc_id AS file FROM documents),
s AS (SELECT file, CAST(concat('0x', substr(md5(file),1,8)) AS BIGINT) AS n FROM f)
SELECT file,
  CAST(NULL AS VARCHAR) AS pid_value,
  'run '||(n % 1000) AS dataset_name,
  'first'||(n % 20)||' last'||(n % 20) AS owner,
  'pi'||(n % 20)||'@ess.eu' AS owner_email,
  -- the shipped schema says `value: instrument_id` (no <>), so the
  -- reference renders the literal string, not the variable
  'instrument_id' AS instrument_id,
  'ESS:CODA:instr-'||(n % 5) AS location,
  'ess_proposal_prop-'||(n % 20) AS owner_group,
  'scientific information management systems group' AS access_groups,
  'pid,start_time,end_time,run_number,acquisition_team_members' AS failed_vars
FROM s
""",
    "ingest_fallback": """
WITH f AS (
  SELECT '/data/'||source||'/doc_'||doc_id||'.nxs' AS file FROM documents
  WHERE source NOT LIKE '%src1%' AND source NOT LIKE 'src2%'
),
s AS (SELECT file, CAST(concat('0x', substr(md5(file),1,8)) AS BIGINT) AS n FROM f)
SELECT file,
  'scicat-ingestor-fallback-schema' AS schema_id,
  CAST(NULL AS VARCHAR) AS pid_value,
  'run '||(n % 1000) AS dataset_name,
  'first'||(n % 20)||' last'||(n % 20) AS principal_investigator,
  'first'||(n % 20)||' last'||(n % 20) AS owner,
  'pi'||(n % 20)||'@ess.eu' AS owner_email,
  '/data' AS source_folder,
  'ESS' AS creation_location,
  '2024-08-01T12:00:00Z' AS creation_time,
  'job_id,pid' AS failed_vars
FROM s
""",
    "ingest_sc": """
WITH b AS (SELECT event_id, user_id * 3 AS proposal_id FROM events)
SELECT b.event_id,
  p.c_name AS pi,
  CASE WHEN p.c_custkey IS NOT NULL
       THEN 'PI '||p.c_name||' nation '||p.c_nationkey END AS dataset_name,
  CASE WHEN p.c_custkey IS NULL THEN 'pi,nation_key,title' ELSE '' END AS failed_vars
FROM b LEFT JOIN customer p ON b.proposal_id = p.c_custkey
""",
    "dataset_assembly": """
WITH f AS (SELECT l_orderkey AS okey, list(CAST(floor(l_extendedprice) AS BIGINT)) AS sizes
           FROM lineitem GROUP BY l_orderkey),
b AS (SELECT o.*, coalesce(f.sizes, []) AS sizes, c.c_name
      FROM orders o LEFT JOIN f ON o.o_orderkey = f.okey
      LEFT JOIN customer c ON o.o_custkey = c.c_custkey)
SELECT md5('order-'||o_orderkey) AS pid,
  CAST(coalesce(list_sum(list_filter(sizes, x -> x IS NOT NULL)), 0) AS BIGINT) AS size,
  len(sizes) AS n_files,
  'order '||o_orderkey AS dataset_name,
  coalesce(CASE WHEN o_orderkey % 5 != 0 THEN 'grp' END, 'ess') AS owner_group,
  'p0' AS proposal_id,
  concat_ws(',',
    CASE WHEN o_orderkey % 13 = 0 OR c_name IS NULL THEN 'owner' END,
    CASE WHEN c_name IS NULL THEN 'ownerEmail' END) AS missing_fields
FROM b
""",
    "datafile_assembly": """
WITH b AS (SELECT l_orderkey, l_linenumber, CAST(floor(l_extendedprice) AS BIGINT) AS size,
  'run_'||l_orderkey||'/f'||l_linenumber||'.nxs' AS path,
  CASE WHEN l_linenumber = 1 THEN md5(CAST(l_orderkey AS VARCHAR)) END AS chk
  FROM lineitem WHERE l_linenumber <= 2)
SELECT l_orderkey, path, size, chk FROM b
UNION ALL
SELECT l_orderkey, '/ingestor/f'||l_linenumber||'.nxs.b2b' AS path, 128 AS size, NULL AS chk
FROM b WHERE chk IS NOT NULL
""",
    "ingest_e2e": """
WITH msgs AS (
  SELECT event_id, user_id, value,
    CAST(json_extract_string(props,'$.k') AS BIGINT) AS k
  FROM events WHERE NOT (event_type = 'error')
),
named AS (
  SELECT *, '/ess/data/src'||(k % 20)||'/run_'||event_id||'.nxs' AS filename FROM msgs
),
selected AS (
  SELECT *,
    CASE WHEN filename LIKE '%src1%' THEN 'coda'
         WHEN filename LIKE '/ess/data/src2%' THEN 'ymir'
         ELSE 'fallback' END AS schema_id
  FROM named
),
ds AS (
  SELECT 'job-'||event_id AS pid_value,
    'run '||event_id||' k='||k AS dataset_name,
    coalesce(c.c_name, 'ess') AS owner,
    schema_id,
    CAST(CAST(value AS DECIMAL(18,2)) AS DOUBLE) AS size,
    event_id
  FROM selected LEFT JOIN customer c ON (user_id + 1) = c.c_custkey
)
SELECT pid_value, dataset_name, owner, schema_id, size
FROM ds
WHERE NOT EXISTS (
  SELECT 1 FROM events e WHERE e.event_id % 10 = 0 AND 'job-'||e.event_id = ds.pid_value
)
""",
}

ORACLES["s8_s9_file_stats"] = _file_stats_oracle()


def _recall_oracle() -> str:
    """Compose recall@k from the per-method ANN oracles — the oracle
    reuses the exact same SQL the methods are checked against, so the
    recall row can't drift from the method definitions."""
    parts = [
        f"SELECT '{m}' AS method, query_id, neighbor_id FROM ({ORACLES[key]})"
        for m, key in (
            ("lsh", "ann_lsh_topk"),
            ("ivf", "ann_ivf_topk"),
            ("ivf_nprobe", "ann_ivf_nprobe_topk"),
            # present only once ann_pq_topk's oracle is registered (the
            # final _recall_oracle() re-binding at the end of this file)
            *((("pq", "ann_pq_topk"),) if "ann_pq_topk" in ORACLES else ()),
            *(
                (("lsh_multi", "ann_lsh_multi_topk"),)
                if "ann_lsh_multi_topk" in ORACLES
                else ()
            ),
            *(
                (("ivf_pq", "ann_ivf_pq_topk"),)
                if "ann_ivf_pq_topk" in ORACLES
                else ()
            ),
        )
    ]
    approx_union = "\nUNION ALL\n".join(parts)
    pq_val = ", ('pq')" if "ann_pq_topk" in ORACLES else ""
    pq_val += ", ('lsh_multi')" if "ann_lsh_multi_topk" in ORACLES else ""
    pq_val += ", ('ivf_pq')" if "ann_ivf_pq_topk" in ORACLES else ""
    return f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({ORACLES["ann_cosine_topk"]})),
ap AS ({approx_union}),
hit AS (SELECT ap.method, ap.query_id, count(*) AS n_hit
        FROM ap JOIN exact USING (query_id, neighbor_id)
        GROUP BY ap.method, ap.query_id),
base AS (SELECT m.method, e.query_id, count(*) AS n_exact
         FROM exact e CROSS JOIN (VALUES ('lsh'), ('ivf'), ('ivf_nprobe'){pq_val}) m(method)
         GROUP BY m.method, e.query_id)
SELECT b.method, b.query_id, b.n_exact,
  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / b.n_exact, 6) AS recall_at_k
FROM base b LEFT JOIN hit h ON b.method = h.method AND b.query_id = h.query_id
"""


ORACLES["ann_recall_report"] = _recall_oracle()


# round-2 additions -------------------------------------------------------

ORACLES["text_repetition"] = """
WITH w AS (
  SELECT doc_id, text,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS lines,
    list_filter(list_transform(string_split(text, chr(10)||chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS paras,
    list_filter(list_transform(regexp_split_to_array(lower(text), '\\s+'), x -> trim(x)),
                x -> length(x) > 0) AS toks
  FROM documents),
f AS (
  SELECT doc_id,
    len(lines) AS n_lines, len(paras) AS n_paras, len(toks) AS n_words,
    len(lines) - len(list_distinct(lines)) AS n_dup_lines,
    len(paras) - len(list_distinct(paras)) AS n_dup_paras,
    coalesce(list_max(list_transform(list_distinct(toks),
      d -> len(list_filter(toks, t -> t = d)))), 0) AS top_count,
    len(regexp_extract_all(text, '#|\\.\\.\\.')) AS n_symbols,
    len(list_filter(lines, l -> regexp_matches(l, '^[-*]'))) AS n_bullet,
    len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS n_ellipsis
  FROM w),
r AS (
  SELECT doc_id,
    round(CASE WHEN n_lines > 0 THEN CAST(n_dup_lines AS DOUBLE)/n_lines ELSE 0.0 END, 6) AS dup_line_frac,
    round(CASE WHEN n_paras > 0 THEN CAST(n_dup_paras AS DOUBLE)/n_paras ELSE 0.0 END, 6) AS dup_para_frac,
    round(CASE WHEN n_words > 0 THEN CAST(top_count AS DOUBLE)/n_words ELSE 0.0 END, 6) AS top_word_frac,
    round(CASE WHEN n_words > 0 THEN CAST(n_symbols AS DOUBLE)/n_words ELSE 0.0 END, 6) AS symbol_word_ratio,
    round(CASE WHEN n_lines > 0 THEN CAST(n_bullet AS DOUBLE)/n_lines ELSE 0.0 END, 6) AS bullet_line_frac,
    round(CASE WHEN n_lines > 0 THEN CAST(n_ellipsis AS DOUBLE)/n_lines ELSE 0.0 END, 6) AS ellipsis_line_frac
  FROM f)
SELECT doc_id, bullet_line_frac, dup_line_frac, dup_para_frac, ellipsis_line_frac,
  (dup_line_frac <= 0.30 AND dup_para_frac <= 0.30 AND top_word_frac <= 0.20
   AND symbol_word_ratio <= 0.10 AND bullet_line_frac <= 0.90
   AND ellipsis_line_frac <= 0.30) AS keep_gopher,
  symbol_word_ratio, top_word_frac
FROM r
"""

ORACLES["text_pii_scrub"] = """
SELECT doc_id,
  len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
  len(regexp_extract_all(text, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS n_ips,
  len(regexp_extract_all(text, '\\+\\d[\\d\\- ]{6,}\\d')) AS n_phones,
  regexp_replace(
    regexp_replace(
      regexp_replace(text,
        '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
      '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
    '\\+\\d[\\d\\- ]{6,}\\d', '<PHONE>', 'g') AS scrubbed
FROM documents
"""

ORACLES["dedup_lines_global"] = """
WITH e AS (
  SELECT doc_id,
    unnest(list_transform(range(1, len(string_split(text, chr(10))) + 1),
      i -> {'pos': i, 'line': trim(string_split(text, chr(10))[i])})) AS u
  FROM documents),
l AS (SELECT doc_id, u.pos AS pos, u.line AS line FROM e WHERE length(u.line) > 0),
t AS (SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM l)
SELECT doc_id,
  count(*) AS n_lines,
  CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
  coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS kept_text
FROM t GROUP BY doc_id
"""

ORACLES["dedup_semantic"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cv AS (SELECT vec_id, e, {_ivf_cell_sql('e')} AS cell FROM v)
SELECT c.vec_id, c.cell FROM cv c
WHERE NOT EXISTS (
  SELECT 1 FROM cv a
  WHERE a.cell = c.cell AND a.vec_id < c.vec_id
    AND round(list_dot_product(a.e, c.e)
      / (sqrt(list_dot_product(a.e, a.e)) * sqrt(list_dot_product(c.e, c.e))), 6) >= 0.3)
"""

ORACLES["ann_knn_join"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cv AS (SELECT vec_id, e, {_ivf_cell_sql('e')} AS cell FROM v),
s AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) AS c
      FROM cv a JOIN cv b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id),
r AS (SELECT vec_id, neighbor_id, c,
        row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, neighbor_id)
          AS rk
      FROM s)
SELECT vec_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 3
"""

ORACLES["ann_knn_join_nprobe"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
cv AS (SELECT vec_id, e, {_ivf_cell_sql('e')} AS cell FROM v),
ad AS (SELECT vec_id, e, {_ivf_dots_sql('e')} AS d FROM v),
a1 AS (SELECT vec_id, e, d, list_position(d, list_max(d)) AS c1 FROM ad),
a2 AS (SELECT vec_id, e, c1,
        list_position(
          list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END),
          list_max(
            list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END))
        ) AS c2
      FROM a1),
s AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) AS c
      FROM a2 a JOIN cv b
        ON b.cell IN (a.c1, a.c2) AND a.vec_id <> b.vec_id),
r AS (SELECT vec_id, neighbor_id, c,
        row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, neighbor_id)
          AS rk
      FROM s)
SELECT vec_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 3
"""

# interlaced GIF frames decode to the SAME image-coordinate statistics
# (the storage row permutation is the engine's problem, not the rule's)
ORACLES["multimodal_gif_pixels_interlaced"] = ORACLES["multimodal_gif_pixels_real"]

# kNN density (r8): one aggregate over the ann_knn_join oracle, left
# join back so isolated vectors report n_neighbors=0
ORACLES["ann_knn_density"] = f"""
WITH nn AS ({ORACLES["ann_knn_join"]}),
agg AS (SELECT vec_id, count(*) AS nn_count,
          round(avg(cosine), 6) AS knn_density, max(cosine) AS nn_sim
        FROM nn GROUP BY vec_id)
SELECT v.vec_id,
  CAST(coalesce(a.nn_count, 0) AS BIGINT) AS n_neighbors,
  a.knn_density, a.nn_sim
FROM embeddings v LEFT JOIN agg a USING (vec_id)
"""


def _prototypes_oracle(keep_frac: float = 0.75, cells: int = 8, dim: int = 64) -> str:
    """SSL-prototypes pruning twin: the same folded centroid constants
    (list_dot_product per cell), prototypicality = max dot / (|v| *
    |centroid|) with the centroid norms folded as the IDENTICAL double
    constants Spark's plan carries, rank on the rounded score. NULLS
    FIRST mirrors Spark's asc ordering for the zero-norm edge."""
    import math

    from scicat_ingestor_spark.operators.similarity import centroid_weights

    cents = [centroid_weights(c, dim) for c in range(cells)]
    cn = ",".join(repr(math.sqrt(sum(x * x for x in c))) for c in cents)
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
d AS (SELECT vec_id, e, {_ivf_dots_sql('e', cells, dim)} AS dots FROM v),
s AS (SELECT vec_id,
        CAST(list_position(dots, list_max(dots)) AS INT) AS cell,
        CASE WHEN list_dot_product(e, e) = 0 THEN NULL
             ELSE round(list_max(dots)
               / (sqrt(list_dot_product(e, e))
                  * ([{cn}])[list_position(dots, list_max(dots))]), 6)
        END AS proto
      FROM d),
r AS (SELECT vec_id, cell, proto,
        row_number() OVER (PARTITION BY cell
          ORDER BY proto ASC NULLS FIRST, vec_id) AS rk,
        count(*) OVER (PARTITION BY cell) AS n
      FROM s)
SELECT vec_id, cell, proto FROM r WHERE rk <= ceil({keep_frac} * n)
"""


ORACLES["dedup_semantic_prototypes"] = _prototypes_oracle()

ORACLES["corpus_prep_full_e2e"] = """
WITH base AS (SELECT doc_id, source, text FROM documents WHERE doc_id % 97 <> 0),
w1 AS (SELECT doc_id, source, text,
    list_filter(list_transform(string_split(text, chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS lines,
    list_filter(list_transform(string_split(text, chr(10)||chr(10)), x -> trim(x)),
                x -> length(x) > 0) AS paras,
    list_filter(list_transform(regexp_split_to_array(lower(text), '\\s+'), x -> trim(x)),
                x -> length(x) > 0) AS wtoks
  FROM base),
rep AS (SELECT doc_id, source, text FROM w1 WHERE
    round(CASE WHEN len(lines) > 0 THEN CAST(len(lines) - len(list_distinct(lines)) AS DOUBLE)/len(lines) ELSE 0.0 END, 6) <= 0.30
    AND round(CASE WHEN len(paras) > 0 THEN CAST(len(paras) - len(list_distinct(paras)) AS DOUBLE)/len(paras) ELSE 0.0 END, 6) <= 0.30
    AND round(CASE WHEN len(wtoks) > 0 THEN CAST(coalesce(list_max(list_transform(list_distinct(wtoks),
          d -> len(list_filter(wtoks, t -> t = d)))), 0) AS DOUBLE)/len(wtoks) ELSE 0.0 END, 6) <= 0.20
    AND round(CASE WHEN len(wtoks) > 0 THEN CAST(len(regexp_extract_all(text, '#|\\.\\.\\.')) AS DOUBLE)/len(wtoks) ELSE 0.0 END, 6) <= 0.10
    AND round(CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '^[-*]'))) AS DOUBLE)/len(lines) ELSE 0.0 END, 6) <= 0.90
    AND round(CASE WHEN len(lines) > 0 THEN CAST(len(list_filter(lines, l -> regexp_matches(l, '\\.\\.\\.$'))) AS DOUBLE)/len(lines) ELSE 0.0 END, 6) <= 0.30),
pii AS (SELECT doc_id, source,
    regexp_replace(
      regexp_replace(
        regexp_replace(text,
          '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b', '<IP>', 'g'),
      '\\+\\d[\\d\\- ]{6,}\\d', '<PHONE>', 'g') AS text
  FROM rep),
qual AS (SELECT * FROM pii WHERE len(regexp_split_to_array(trim(text), '\\s+')) >= 25),
le AS (SELECT doc_id, source,
    unnest(list_transform(range(1, len(string_split(text, chr(10))) + 1),
      i -> {'pos': i, 'line': trim(string_split(text, chr(10))[i])})) AS u
  FROM qual),
ll AS (SELECT doc_id, source, u.pos AS pos, u.line AS line FROM le WHERE length(u.line) > 0),
lt AS (SELECT *, row_number() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn FROM ll),
rebuilt AS (SELECT doc_id, source,
    coalesce(string_agg(CASE WHEN rn = 1 THEN line END, chr(10) ORDER BY pos), '') AS text
  FROM lt GROUP BY doc_id, source),
rb AS (SELECT * FROM rebuilt WHERE length(text) > 0),
wg AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks FROM rb),
g AS (SELECT doc_id, list_distinct(list_transform(
        range(1, greatest(len(toks)-3, 1)+1),
        i -> array_to_string(toks[i:i+3], ' '))) AS grams FROM wg),
ew AS (SELECT doc_id, regexp_split_to_array(lower(text), '\\s+') AS toks
  FROM documents WHERE doc_id % 97 = 0),
e AS (SELECT DISTINCT unnest(list_distinct(list_transform(
        range(1, greatest(len(toks)-3, 1)+1),
        i -> array_to_string(toks[i:i+3], ' ')))) AS gram FROM ew),
cg AS (SELECT doc_id, unnest(grams) AS gram FROM g),
contaminated AS (SELECT DISTINCT doc_id FROM cg JOIN e USING (gram)),
clean AS (SELECT * FROM rb WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)),
surv AS (SELECT *, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn FROM clean),
tok AS (SELECT source, doc_id, len(regexp_split_to_array(trim(text), '\\s+')) AS n_tokens
  FROM surv WHERE rn = 1),
o AS (SELECT source, doc_id, n_tokens,
    sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens AS start_off
  FROM tok)
SELECT source, CAST(floor(start_off / 512.0) AS BIGINT) AS bin_id,
  count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
FROM o GROUP BY source, bin_id
"""

ORACLES["q6_forecast_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount >= 0.05 AND l_discount <= 0.07
  AND l_quantity < 24
"""

ORACLES["q10_returned_items"] = """
SELECT c_custkey, c_name, c_acctbal, n_name,
  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
GROUP BY c_custkey, c_name, c_acctbal, n_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 20
"""

# Bloom prefilter is result-transparent: no false negatives, and the
# exact verify join removes false positives — so the oracle is the
# exact-set decontamination query verbatim.
ORACLES["text_decontaminate_bloom"] = ORACLES["text_decontaminate"]

ORACLES["q4_priority_semijoin"] = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
  AND EXISTS (
    SELECT 1 FROM lineitem l
    WHERE l.l_orderkey = o.o_orderkey
      AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""

ORACLES["q18_large_orders"] = """
WITH big AS (
  SELECT l_orderkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS q
  FROM lineitem GROUP BY l_orderkey HAVING q > 250)
SELECT c_name, c_custkey, o_orderkey,
  strftime(o_orderdate, '%Y-%m-%d') AS o_orderdate,
  o_totalprice,
  CAST(round(q, 2) AS DOUBLE) AS total_qty
FROM orders JOIN big ON o_orderkey = l_orderkey
JOIN customer ON o_custkey = c_custkey
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 20
"""

ORACLES["q19_disjunctive_revenue"] = """
SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
    * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5
        AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10
        AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15
        AND l_quantity BETWEEN 20 AND 30)
"""

ORACLES["text_tfidf_top"] = """
WITH t AS (
  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM t WHERE term <> ''
  GROUP BY doc_id, term),
dfq AS (SELECT term, count(*) AS df_docs FROM tf GROUP BY term),
n AS (SELECT count(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df_docs,
  round(tf * ln(n_docs / CAST(df_docs AS DOUBLE)), 6) AS tfidf
FROM tf JOIN dfq USING (term) CROSS JOIN n
ORDER BY tfidf DESC, doc_id ASC, term ASC
LIMIT 20
"""

def _pq_sql(col: str, dim: int = 64, m: int = 8, ksub: int = 16):
    """PQ codes + query dot tables as DuckDB SQL with the SAME codebook
    constants the Spark plan folds in (operators.similarity.pq_weight)."""
    from scicat_ingestor_spark.operators.similarity import pq_codebooks

    dsub = dim // m
    books = pq_codebooks(m, ksub, dsub)
    code_parts, tbl_parts = [], []
    for s_ in range(m):
        sub = f"{col}[{s_ * dsub + 1}:{(s_ + 1) * dsub}]"
        dots = ",".join(
            "list_dot_product(%s, [%s])" % (sub, ",".join(repr(x) for x in books[s_][c]))
            for c in range(ksub)
        )
        scores = ",".join(
            "2*list_dot_product(%s, [%s]) - %r"
            % (sub, ",".join(repr(x) for x in books[s_][c]),
               sum(x * x for x in books[s_][c]))
            for c in range(ksub)
        )
        code_parts.append(
            f"CAST(list_position([{scores}], list_max([{scores}])) AS INT)"
        )
        tbl_parts.append(f"[{dots}]")
    return "[%s]" % ",".join(code_parts), "[%s]" % ",".join(tbl_parts)


_PQ_CODES, _PQ_TBL = _pq_sql("e")

ORACLES["ann_pq_topk"] = f"""
WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e0 FROM embeddings),
v AS (SELECT vec_id,
        list_transform(e0, x -> x / sqrt(list_dot_product(e0, e0))) AS e
      FROM v0),
cd AS (SELECT vec_id, {_PQ_CODES} AS codes FROM v),
q AS (SELECT vec_id AS query_id, {_PQ_TBL} AS tbl FROM v WHERE vec_id < 3),
sc AS (SELECT q.query_id, c.vec_id,
        list_sum(list_transform(range(1, 9), i -> q.tbl[i][c.codes[i]])) AS a
      FROM cd c CROSS JOIN q),
r AS (SELECT query_id, vec_id AS neighbor_id, a,
        row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(a, 6) AS approx_cos, rk AS rank
FROM r WHERE rk <= 5
"""

# re-bind now that the PQ oracle exists: recall report covers it too
ORACLES["ann_recall_report"] = _recall_oracle()


def _multi_sig_cols(col: str, bits: int = 8, tables: int = 4, dim: int = 64) -> list:
    """One signature expression per table, plane family offset t*bits —
    identical constants to operators.similarity.lsh_multi_topk."""
    from scicat_ingestor_spark.operators.similarity import hyperplane_weights

    out = []
    for t in range(tables):
        parts = []
        for b in range(bits):
            arr = "[" + ",".join(
                repr(x) for x in hyperplane_weights(t * bits + b, dim)
            ) + "]"
            parts.append(
                f"(CASE WHEN list_dot_product({col}, {arr}) >= 0 THEN '1' ELSE '0' END)"
            )
        out.append("||".join(parts))
    return out


_MS = _multi_sig_cols("e")
_MS_SEL = ",".join(f"{sql} AS g{t}" for t, sql in enumerate(_MS))
_MS_OR = " OR ".join(f"s.g{t} = q.g{t}" for t in range(len(_MS)))

ORACLES["ann_lsh_multi_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
sigv AS (SELECT vec_id, e, {_MS_SEL} FROM v),
q AS (SELECT vec_id AS query_id, e AS qe, g0, g1, g2, g3
      FROM sigv WHERE vec_id < 3),
sc AS (SELECT q.query_id, s.vec_id,
        list_dot_product(s.e, q.qe)
          / (sqrt(list_dot_product(s.e, s.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM sigv s JOIN q ON ({_MS_OR})),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
"""

ORACLES["ann_recall_report"] = _recall_oracle()


def _vocab_sketch_oracle() -> str:
    """Same deterministic HLL as q_text_vocab_sketch: md5 12-bit register
    index, rho over the next 60 bits, EXACT 2^(61-M_j) decimal register
    sum; the numerator constant is folded in Python from the identical
    expression the Spark plan uses, so the one float division agrees
    bit-for-bit."""
    p = 12
    m = 1 << p
    num = repr((0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << 61))
    two61 = float(1 << 61)
    return f"""
WITH raw AS (
  SELECT source, unnest(string_split(lower(text), ' ')) AS term FROM documents
), toks AS (SELECT source, term FROM raw WHERE term <> ''),
base AS (
  SELECT source, count(*) AS n_tokens, count(DISTINCT term) AS vocab_exact
  FROM toks GROUP BY source
),
regs AS (
  SELECT source,
    ('0x' || substr(md5(term), 1, 3))::BIGINT AS idx,
    max(CASE WHEN ('0x' || substr(md5(term), 4, 15))::BIGINT = 0 THEN 61
        ELSE 61 - length(bin(('0x' || substr(md5(term), 4, 15))::BIGINT)) END) AS mj
  FROM toks GROUP BY source, idx
),
sk AS (
  SELECT source, count(*) AS n_present,
    sum(((1::BIGINT) << (61 - mj))::DECIMAL(38,0)) AS scaled_present
  FROM regs GROUP BY source
),
est AS (
  SELECT source,
    CAST(scaled_present AS DOUBLE)
      + ({m} - n_present)::DOUBLE * {two61!r} AS total,
    {m} - n_present AS zeros
  FROM sk
)
SELECT b.source, n_tokens, vocab_exact,
  CAST(floor(CASE WHEN ({num} / total) <= {2.5 * m!r} AND zeros > 0
    THEN {float(m)!r} * ln({float(m)!r} / zeros)
    ELSE {num} / total END) AS BIGINT) AS vocab_hll
FROM base b JOIN est USING (source)
ORDER BY b.source
"""


ORACLES["text_vocab_sketch"] = _vocab_sketch_oracle()


ORACLES["ann_ivf_pq_topk"] = f"""
WITH v0 AS (SELECT vec_id, embedding::DOUBLE[] AS e0 FROM embeddings),
v AS (SELECT vec_id, e0,
        list_transform(e0, x -> x / sqrt(list_dot_product(e0, e0))) AS e
      FROM v0),
cd AS (SELECT vec_id, {_ivf_cell_sql('e0')} AS cell, {_PQ_CODES} AS codes FROM v),
qd AS (SELECT vec_id AS query_id, {_ivf_dots_sql('e0')} AS d, {_PQ_TBL} AS tbl
       FROM v WHERE vec_id < 3),
q1 AS (SELECT query_id, tbl, d, list_position(d, list_max(d)) AS c1 FROM qd),
q2 AS (SELECT query_id, tbl, c1,
        list_position(
          list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END),
          list_max(
            list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END))
        ) AS c2
      FROM q1),
sc AS (SELECT q.query_id, c.vec_id,
        list_sum(list_transform(range(1, 9), i -> q.tbl[i][c.codes[i]])) AS a
      FROM cd c JOIN q2 q ON c.cell IN (q.c1, q.c2)),
r AS (SELECT query_id, vec_id AS neighbor_id, a,
        row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(a, 6) AS approx_cos, rk AS rank
FROM r WHERE rk <= 5
"""

# re-bind: the recall report now covers the IVF-PQ composition too
ORACLES["ann_recall_report"] = _recall_oracle()


# --- trained-ANN oracles: the k-means training REPLAYED in SQL -------------
#
# train_centroids / train_pq_codebooks are deterministic AND reproducible
# (fixed init, exactly 3 iterations, means snapped to the 2^-24 binary
# grid each step — floating-sum order noise is killed before it can
# diverge, and the snap itself is the IDENTICAL exact-scaling operation
# in both engines, unlike a decimal round), so
# the "data-dependent plan constants" are in fact a pure function of the
# table, expressible as unrolled Lloyd-iteration CTEs. This graduates
# the whole trained family off the rows-only waiver list: a training bug
# in EITHER engine breaks the value hash. Cross-engine bit-identity of
# the constants themselves is additionally pinned by
# tests/test_training_ops.py::test_trained_constants_match_duckdb.


def _trained_cents_ctes(k: int = 8, dim: int = 64, iters: int = 3, bits: int = 24):
    """Unrolled spherical-k-means CTEs over a CTE ``v(vec_id, e)``:
    assignment = argmax dot (ties to the lowest cell, Spark's
    array_position rule), means snapped to the 2^-bits binary grid
    (round(x * 2^bits) / 2^bits — both scalings EXACT in IEEE doubles,
    so this is the identical operation similarity._snap performs; a
    decimal round() would be computed differently by the two engines),
    normalize, snap again; empty/zero-norm cells keep their previous
    centroid. Returns (ctes_sql, final_cte_name) with
    tc{i}/ta{i}/tm{i}/tl{i} names reserved."""
    g = float(1 << bits)
    from scicat_ingestor_spark.operators.similarity import centroid_weights

    init_rows = ",".join(
        "(%d, [%s])" % (c + 1, ",".join(repr(x) for x in centroid_weights(c, dim)))
        for c in range(k)
    )
    ctes = [f"tc0(cell, cent) AS (SELECT * FROM (VALUES {init_rows}))"]
    prev = "tc0"
    for i in range(1, iters + 1):
        ctes.append(f"""
ta{i} AS (SELECT vec_id, e, cell FROM (
  SELECT v.vec_id, v.e, c.cell,
    row_number() OVER (PARTITION BY v.vec_id
      ORDER BY list_dot_product(v.e, c.cent) DESC, c.cell) AS rn
  FROM v CROSS JOIN {prev} c) WHERE rn = 1),
tm{i} AS (SELECT cell, pos, round(avg(e[pos]) * {g}) / {g} AS m
  FROM ta{i} CROSS JOIN range(1, {dim + 1}) t(pos) GROUP BY cell, pos),
tl{i} AS (SELECT cell, list(m ORDER BY pos) AS ml FROM tm{i} GROUP BY cell),
tc{i} AS (SELECT p.cell,
    CASE WHEN l.cell IS NULL OR list_dot_product(l.ml, l.ml) = 0 THEN p.cent
         ELSE list_transform(l.ml,
                x -> round(x / sqrt(list_dot_product(l.ml, l.ml)) * {g}) / {g})
    END AS cent
  FROM {prev} p LEFT JOIN tl{i} l USING (cell))""")
        prev = f"tc{i}"
    return ",\n".join(ctes), prev


def _trained_books_ctes(
    m: int = 8, ksub: int = 16, dsub: int = 8, iters: int = 3, bits: int = 24
):
    """Unrolled per-subspace L2-k-means CTEs over ``v(vec_id, e)``:
    unit-normalize, slice into m subvectors, assign by argmax
    2*dot - ||entry||^2 (ties to the lowest code), means snapped to
    the 2^-bits binary grid (see _trained_cents_ctes); empty cells
    keep their entry. Returns (ctes_sql, final_cte_name); also defines
    vu/subs for reuse by the serving SQL."""
    g = float(1 << bits)
    from scicat_ingestor_spark.operators.similarity import pq_codebooks

    books = pq_codebooks(m, ksub, dsub)
    init_rows = ",".join(
        "(%d, %d, [%s])" % (s, c + 1, ",".join(repr(x) for x in books[s][c]))
        for s in range(m)
        for c in range(ksub)
    )
    ctes = [
        "vu AS (SELECT vec_id,"
        " list_transform(e, x -> x / sqrt(list_dot_product(e, e))) AS u FROM v)",
        f"subs AS (SELECT vec_id, s, u[s*{dsub}+1:(s+1)*{dsub}] AS sub"
        f" FROM vu CROSS JOIN range(0, {m}) t(s))",
        f"bk0(s, code, cent) AS (SELECT * FROM (VALUES {init_rows}))",
    ]
    prev = "bk0"
    for i in range(1, iters + 1):
        ctes.append(f"""
pa{i} AS (SELECT vec_id, s, sub, code FROM (
  SELECT sub.vec_id, sub.s, sub.sub, b.code,
    row_number() OVER (PARTITION BY sub.vec_id, sub.s
      ORDER BY 2*list_dot_product(sub.sub, b.cent)
               - list_dot_product(b.cent, b.cent) DESC, b.code) AS rn
  FROM subs sub JOIN {prev} b USING (s)) WHERE rn = 1),
pm{i} AS (SELECT s, code, pos, round(avg(sub[pos]) * {g}) / {g} AS m
  FROM pa{i} CROSS JOIN range(1, {dsub + 1}) t(pos) GROUP BY s, code, pos),
pl{i} AS (SELECT s, code, list(m ORDER BY pos) AS ml FROM pm{i} GROUP BY s, code),
bk{i} AS (SELECT p.s, p.code, COALESCE(l.ml, p.cent) AS cent
  FROM {prev} p LEFT JOIN pl{i} l USING (s, code))""")
        prev = f"bk{i}"
    return ",\n".join(ctes), prev


_TC_CTES, _TC = _trained_cents_ctes()
_BK_CTES, _BK = _trained_books_ctes()

# serving fragments shared by the trained oracles: corpus cell / codes /
# query tables computed from the TRAINED constants CTEs
_TRAINED_CELL = f"""
tcv AS (SELECT vec_id, e, cell FROM (
  SELECT v.vec_id, v.e, c.cell,
    row_number() OVER (PARTITION BY v.vec_id
      ORDER BY list_dot_product(v.e, c.cent) DESC, c.cell) AS rn
  FROM v CROSS JOIN {_TC} c) WHERE rn = 1)"""

_TRAINED_CODES = f"""
pserve AS (SELECT vec_id, s, sub, code FROM (
  SELECT sub.vec_id, sub.s, sub.sub, b.code,
    row_number() OVER (PARTITION BY sub.vec_id, sub.s
      ORDER BY 2*list_dot_product(sub.sub, b.cent)
               - list_dot_product(b.cent, b.cent) DESC, b.code) AS rn
  FROM subs sub JOIN {_BK} b USING (s)) WHERE rn = 1),
pcodes AS (SELECT vec_id, list(code ORDER BY s) AS codes
  FROM pserve GROUP BY vec_id)"""


def _trained_qtbl(pred: str) -> str:
    """Per-query ADC dot tables (m lists of ksub dots, code order)
    against the trained codebooks, for query rows matching ``pred``."""
    return f"""
qt AS (SELECT sub.vec_id AS query_id, sub.s,
         list(list_dot_product(sub.sub, b.cent) ORDER BY b.code) AS trow
       FROM subs sub JOIN {_BK} b USING (s) WHERE {pred}
       GROUP BY sub.vec_id, sub.s),
qtbl AS (SELECT query_id, list(trow ORDER BY s) AS tbl FROM qt GROUP BY query_id)"""


ORACLES["ann_ivf_trained_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_TC_CTES},
{_TRAINED_CELL},
q AS (SELECT vec_id AS query_id, e AS qe, cell FROM tcv WHERE vec_id % 997 = 0),
sc AS (SELECT q.query_id, c.vec_id,
        list_dot_product(c.e, q.qe)
          / (sqrt(list_dot_product(c.e, c.e)) * sqrt(list_dot_product(q.qe, q.qe))) AS c
      FROM tcv c JOIN q ON c.cell = q.cell),
r AS (SELECT query_id, vec_id AS neighbor_id, c,
        row_number() OVER (PARTITION BY query_id ORDER BY c DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 5
"""

ORACLES["ann_pq_trained_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_BK_CTES},
{_TRAINED_CODES},
{_trained_qtbl("sub.vec_id < 3")},
sc AS (SELECT q.query_id, c.vec_id,
        list_sum(list_transform(range(1, 9), i -> q.tbl[i][c.codes[i]])) AS a
      FROM pcodes c CROSS JOIN qtbl q),
r AS (SELECT query_id, vec_id AS neighbor_id, a,
        row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(a, 6) AS approx_cos, rk AS rank
FROM r WHERE rk <= 5
"""

ORACLES["ann_ivf_pq_trained_topk"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_TC_CTES},
{_BK_CTES},
{_TRAINED_CELL},
{_TRAINED_CODES},
{_trained_qtbl("sub.vec_id < 3")},
qd AS (SELECT v.vec_id AS query_id,
         list(list_dot_product(v.e, c.cent) ORDER BY c.cell) AS d
       FROM v CROSS JOIN {_TC} c WHERE v.vec_id < 3 GROUP BY v.vec_id),
q1 AS (SELECT query_id, d, list_position(d, list_max(d)) AS c1 FROM qd),
q2 AS (SELECT q1.query_id, qtbl.tbl, q1.c1,
        list_position(
          list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END),
          list_max(
            list_transform(d, (x, i) -> CASE WHEN i = c1 THEN -1e308 ELSE x END))
        ) AS c2
      FROM q1 JOIN qtbl ON q1.query_id = qtbl.query_id),
cc AS (SELECT t.vec_id, t.cell, p.codes
       FROM tcv t JOIN pcodes p USING (vec_id)),
sc AS (SELECT q.query_id, c.vec_id,
        list_sum(list_transform(range(1, 9), i -> q.tbl[i][c.codes[i]])) AS a
      FROM cc c JOIN q2 q ON c.cell IN (q.c1, q.c2)),
r AS (SELECT query_id, vec_id AS neighbor_id, a,
        row_number() OVER (PARTITION BY query_id ORDER BY a DESC, vec_id) AS rk
      FROM sc)
SELECT query_id, neighbor_id, round(a, 6) AS approx_cos, rk AS rank
FROM r WHERE rk <= 5
"""


def _recall_trained_oracle() -> str:
    """ann_recall_trained_report's SQL twin, composed exactly like
    _recall_oracle from the now-oracled trained method queries."""
    parts = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, query_id, neighbor_id FROM ({ORACLES[o]})"
        for m, o in (
            ("pq", "ann_pq_topk"),
            ("pq_trained", "ann_pq_trained_topk"),
            ("ivf", "ann_ivf_topk"),
            ("ivf_trained", "ann_ivf_trained_topk"),
        )
    )
    return f"""
WITH exact AS (SELECT query_id, neighbor_id FROM ({ORACLES["ann_cosine_topk"]})),
ap AS ({parts}),
hit AS (SELECT ap.method, ap.query_id, count(*) AS n_hit
        FROM ap JOIN exact USING (query_id, neighbor_id)
        GROUP BY ap.method, ap.query_id),
base AS (SELECT m.method, e.query_id, count(*) AS n_exact
         FROM exact e
         CROSS JOIN (VALUES ('pq'), ('pq_trained'), ('ivf'), ('ivf_trained')) m(method)
         GROUP BY m.method, e.query_id)
SELECT b.method, b.query_id, b.n_exact,
  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / b.n_exact, 6) AS recall_at_k
FROM base b LEFT JOIN hit h ON b.method = h.method AND b.query_id = h.query_id
"""


ORACLES["ann_recall_trained_report"] = _recall_trained_oracle()

# self-kNN with TRAINED centroids (r8): the unrolled-training CTEs feed
# the same in-cell self-join + rank window as ann_knn_join
ORACLES["ann_knn_join_trained"] = f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
{_TC_CTES},
{_TRAINED_CELL},
s AS (SELECT a.vec_id, b.vec_id AS neighbor_id,
        list_dot_product(a.e, b.e)
          / (sqrt(list_dot_product(a.e, a.e))
             * sqrt(list_dot_product(b.e, b.e))) AS c
      FROM tcv a JOIN tcv b
        ON a.cell = b.cell AND a.vec_id <> b.vec_id),
r AS (SELECT vec_id, neighbor_id, c,
        row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, neighbor_id)
          AS rk
      FROM s)
SELECT vec_id, neighbor_id, round(c, 6) AS cosine, rk AS rank
FROM r WHERE rk <= 3
"""


def _knn_recall_oracle() -> str:
    """ann_knn_recall_report's SQL twin: exact self-kNN over the
    sampled probes (vec_id % 37 = 0) as ground truth, the three knn
    oracles (fixed / nprobe / trained) filtered to the sample as the
    measured methods — composed from the method oracles exactly like
    _recall_oracle, so the recall rows can't drift from the method
    definitions."""
    parts = "\nUNION ALL\n".join(
        f"SELECT '{m}' AS method, vec_id, neighbor_id FROM ({ORACLES[o]})\n"
        f"WHERE vec_id % 37 = 0"
        for m, o in (
            ("ivf", "ann_knn_join"),
            ("ivf_nprobe", "ann_knn_join_nprobe"),
            ("ivf_trained", "ann_knn_join_trained"),
        )
    )
    return f"""
WITH v AS (SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings),
p AS (SELECT * FROM v WHERE vec_id % 37 = 0),
es AS (SELECT p.vec_id, b.vec_id AS neighbor_id,
        list_dot_product(p.e, b.e)
          / (sqrt(list_dot_product(p.e, p.e))
             * sqrt(list_dot_product(b.e, b.e))) AS c
      FROM p JOIN v b ON p.vec_id <> b.vec_id),
exact AS (SELECT vec_id, neighbor_id FROM (
    SELECT vec_id, neighbor_id,
      row_number() OVER (PARTITION BY vec_id ORDER BY c DESC, neighbor_id)
        AS rk
    FROM es) WHERE rk <= 3),
ap AS ({parts}),
hit AS (SELECT ap.method, ap.vec_id, count(*) AS n_hit
        FROM ap JOIN exact USING (vec_id, neighbor_id)
        GROUP BY ap.method, ap.vec_id),
base AS (SELECT m.method, e.vec_id, count(*) AS n_exact
         FROM exact e
         CROSS JOIN (VALUES ('ivf'), ('ivf_nprobe'), ('ivf_trained')) m(method)
         GROUP BY m.method, e.vec_id)
SELECT b.method, b.vec_id, b.n_exact,
  CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
  round(CAST(coalesce(h.n_hit, 0) AS DOUBLE) / b.n_exact, 6) AS recall_at_k
FROM base b LEFT JOIN hit h ON b.method = h.method AND b.vec_id = h.vec_id
"""


ORACLES["ann_knn_recall_report"] = _knn_recall_oracle()


# S6 real branch: the inputs are the two static reference NeXus fixture
# files, so the correct output is this fixed relation (values verified
# byte-for-byte by tests/test_hdf5lite.py full walks).
# multimodal_features runs over the FIXED jpeg/gif fixture
# (operators/multimodal.fixture_media_rows — sf-independent, pure
# struct.pack bytes), so its correct output is a constant: extract ->
# brute-force cosine top-3 for the 4 fixture queries, pinned VALUES
# (the s6_real_nexus_scan precedent). Regenerate by running the query.
ORACLES["multimodal_features"] = """
SELECT * FROM (VALUES
  (CAST(0 AS BIGINT),  CAST(0 AS BIGINT),  CAST(1.0 AS DOUBLE),      1),
  (CAST(0 AS BIGINT),  CAST(5 AS BIGINT),  CAST(0.823057 AS DOUBLE), 2),
  (CAST(0 AS BIGINT),  CAST(22 AS BIGINT), CAST(0.782411 AS DOUBLE), 3),
  (CAST(6 AS BIGINT),  CAST(6 AS BIGINT),  CAST(1.0 AS DOUBLE),      1),
  (CAST(6 AS BIGINT),  CAST(12 AS BIGINT), CAST(0.835963 AS DOUBLE), 2),
  (CAST(6 AS BIGINT),  CAST(8 AS BIGINT),  CAST(0.677465 AS DOUBLE), 3),
  (CAST(12 AS BIGINT), CAST(12 AS BIGINT), CAST(1.0 AS DOUBLE),      1),
  (CAST(12 AS BIGINT), CAST(6 AS BIGINT),  CAST(0.835963 AS DOUBLE), 2),
  (CAST(12 AS BIGINT), CAST(23 AS BIGINT), CAST(0.396258 AS DOUBLE), 3),
  (CAST(18 AS BIGINT), CAST(18 AS BIGINT), CAST(1.0 AS DOUBLE),      1),
  (CAST(18 AS BIGINT), CAST(17 AS BIGINT), CAST(0.762266 AS DOUBLE), 2),
  (CAST(18 AS BIGINT), CAST(20 AS BIGINT), CAST(0.561356 AS DOUBLE), 3)
) AS t(query_id, neighbor_id, cosine, rank)
"""

ORACLES["s6_real_nexus_scan"] = """
SELECT * FROM (VALUES
  ('small-coda', 'odin', 'ODIN', 'A Sample',
   '2024-10-28T09:06:41.186Z', '2024-10-28T09:18:14.376Z', CAST(43 AS BIGINT)),
  ('small-ymir', 'october 28th, lego test 1, cont', 'YMIR', 'some sample',
   '2024-10-28T09:32:35.895Z', '2024-10-28T09:34:50.524Z', CAST(57 AS BIGINT))
) AS t(name, title, instrument, sample_name, start_time, end_time, n_datasets)
"""

# The parity demo: reference schemas x reference files is a pure
# function of static fixtures + pinned batch_ts, so the correct output
# is this fixed relation (cross-checked by the test_hdf5lite walks and
# test_reference_schemas fixture semantics).
ORACLES["ingest_real_files_e2e"] = """
SELECT * FROM (VALUES
  ('small-coda', 'Test Coda Metadata Schema',
   '20.500.12269/f22acb1c-950b-11ef-a3ef-fa163e9aae0a', 'odin',
   'Clara Codarino', 'clara@ess.eu', '443503', 'ess_proposal_443503',
   'ESS:CODA', '31010',
   'Anders Pettersson, Fredrik Bolmsten, George ONeill, Jonas Petersson, Massimiliano Novelli, Matt Clarke',
   CAST(0 AS BIGINT)),
  ('small-ymir', 'Ymir Metadata Schema',
   '20.500.12269/90d87f9a-950f-11ef-9101-fa163e943f63',
   'october 28th, lego test 1, cont - ' || md5('/root/reference/test-data/small-ymir.hdf'),
   'Max Novelli', 'max@ess.eu', '876380', '876380',
   'ESS:CODA:YMIR', '11465',
   'Anders Pettersson, Fredrik Bolmsten, George ONeill, Janos Babik, Jekabs Karklins, Jonas Petersson, Junjie Quan, Massimiliano Novelli, Matt Clarke, Søren Schmidt, Tibor Bukovics, Yoganandan Pandiyan',
   CAST(0 AS BIGINT))
) AS t(name, schema_name, pid, dataset_name, owner, owner_email,
       proposal_id, owner_group, location, run_number, team, n_failures)
"""


ORACLES["q7_volume_shipping"] = """
SELECT supp_nation, cust_nation, l_year,
  CAST(round(sum(volume), 2) AS DOUBLE) AS revenue
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
    year(l_shipdate) AS l_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
) t
GROUP BY supp_nation, cust_nation, l_year
ORDER BY supp_nation, cust_nation, l_year
"""

ORACLES["q8_market_share"] = """
SELECT o_year,
  CAST(round(sum(CASE WHEN supp_nation = 'NATION_1' THEN volume
                      ELSE CAST(0 AS DECIMAL(18,2)) END) / sum(volume), 6) AS DOUBLE)
    AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year, n1.n_name AS supp_nation,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4)) AS volume
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation n1 ON s_nationkey = n1.n_nationkey
  JOIN nation n2 ON c_nationkey = n2.n_nationkey
  JOIN region ON n2.n_regionkey = r_regionkey
  WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    AND p_type = 'PROMO' AND r_name = 'ASIA'
) t
GROUP BY o_year
ORDER BY o_year
"""

ORACLES["q14_promo_revenue"] = """
SELECT CAST(round(
    sum(CASE WHEN p_type = 'PROMO'
        THEN CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))
        ELSE CAST(0 AS DECIMAL(18,2)) END) * 100
    / sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))),
  6) AS DOUBLE) AS promo_revenue_pct
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1996-10-01 00:00:00'
"""


ORACLES["q13_order_count_distribution"] = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
  GROUP BY c_custkey
) t
GROUP BY c_count
ORDER BY custdist DESC, c_count DESC
"""

ORACLES["q15_top_supplier"] = """
WITH rev AS (
  SELECT l_suppkey,
    CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))), 2) AS DOUBLE) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name, total_revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE total_revenue = (SELECT max(total_revenue) FROM rev)
ORDER BY s_suppkey
"""


ORACLES["q17_small_quantity_revenue"] = """
SELECT CAST(round(CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) / 7 AS DECIMAL(24,6)), 2) AS DOUBLE) AS avg_yearly
FROM (
  SELECT l_extendedprice, l_quantity,
    avg(l_quantity) OVER (PARTITION BY l_partkey) AS avg_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_brand = 'Brand#1'
) t
WHERE l_quantity < 0.5 * avg_qty
"""


# ---------------------------------------------------------------------------
# round-5: the remaining TPC-H plan shapes. The oracle side deliberately
# keeps the textbook correlated/EXISTS/scalar-subquery SQL forms so the
# gate proves the Spark decorrelations compute the same relation.
# ---------------------------------------------------------------------------

ORACLES["q2_min_cost_supplier"] = """
WITH supply AS (
  SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
    min(l_extendedprice / l_quantity) AS ps_supplycost
  FROM lineitem GROUP BY 1, 2)
SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
  ps_supplycost AS supply_cost
FROM part, supply, supplier, nation, region
WHERE p_partkey = ps_partkey AND ps_suppkey = s_suppkey
  AND p_type = 'LARGE' AND p_size BETWEEN 1 AND 15
  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
  AND r_name = 'ASIA'
  AND ps_supplycost = (
    SELECT min(ps2.ps_supplycost) FROM supply ps2
    JOIN supplier s2 ON ps2.ps_suppkey = s2.s_suppkey
    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
    WHERE r2.r_name = 'ASIA' AND ps2.ps_partkey = p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 100
"""

ORACLES["q9_product_type_profit"] = """
SELECT nation, o_year, CAST(round(sum(amount), 2) AS DOUBLE) AS sum_profit
FROM (
  SELECT n_name AS nation, year(o_orderdate) AS o_year,
    CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1 - l_discount AS DECIMAL(18,4))
    - (CAST(p_retailprice AS DECIMAL(18,2)) * CAST(0.6 AS DECIMAL(2,1)))
      * CAST(l_quantity AS DECIMAL(18,2)) AS amount
  FROM lineitem
  JOIN orders ON l_orderkey = o_orderkey
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE p_name LIKE '%red%'
) t
GROUP BY nation, o_year
ORDER BY nation, o_year DESC
"""

ORACLES["q11_important_stock"] = """
WITH pv AS (
  SELECT l_partkey, sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS pvalue
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation ON s_nationkey = n_nationkey
  WHERE n_name = 'NATION_3'
  GROUP BY l_partkey)
SELECT l_partkey AS ps_partkey, CAST(round(pvalue, 2) AS DOUBLE) AS part_value
FROM pv
WHERE pvalue * 10000 > (SELECT sum(pvalue) FROM pv)
ORDER BY part_value DESC, ps_partkey
"""

ORACLES["q12_late_priority"] = """
SELECT l_returnflag,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END)
    AS BIGINT) AS high_line_count,
  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END)
    AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag
ORDER BY l_returnflag
"""

ORACLES["q16_supplier_part_types"] = """
SELECT p_brand, p_type, p_size, count(DISTINCT ps_suppkey) AS supplier_cnt
FROM (SELECT DISTINCT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey
      FROM lineitem) supply
JOIN part ON ps_partkey = p_partkey
WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
  AND p_size IN (1, 5, 9, 14, 19, 23, 36, 45)
  AND ps_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY p_brand, p_type, p_size
ORDER BY supplier_cnt DESC, p_brand, p_type, p_size
"""

ORACLES["q20_part_promotion"] = """
WITH pair AS (
  SELECT l_partkey, l_suppkey, sum(CAST(l_quantity AS DECIMAL(18,2))) AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
  GROUP BY 1, 2),
tot AS (SELECT l_partkey, sum(qty) AS part_total FROM pair GROUP BY 1)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN nation ON s_nationkey = n_nationkey
WHERE n_name IN ('NATION_1', 'NATION_2', 'NATION_3', 'NATION_4')
  AND s_suppkey IN (
    SELECT p.l_suppkey FROM pair p JOIN tot t ON p.l_partkey = t.l_partkey
    WHERE p.qty * 100 > t.part_total * 15)
ORDER BY s_name
"""

ORACLES["q21_suppliers_who_kept_waiting"] = """
SELECT s_name, count(*) AS numwait
FROM lineitem l1
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_3'
WHERE l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s_name
ORDER BY numwait DESC, s_name
LIMIT 100
"""

ORACLES["q22_global_sales_opportunity"] = """
WITH c AS (
  SELECT * FROM customer WHERE c_nationkey IN (1, 3, 5, 7, 9, 11, 13))
SELECT c_nationkey AS cntrycode, count(*) AS numcust,
  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE) AS totacctbal
FROM c
WHERE CAST(c_acctbal AS DECIMAL(18,2))
      * (SELECT count(*) FROM c c2 WHERE c2.c_acctbal > 0)
    > (SELECT sum(CAST(c2.c_acctbal AS DECIMAL(18,2))) FROM c c2
       WHERE c2.c_acctbal > 0)
  AND NOT EXISTS (
    SELECT 1 FROM orders o
    WHERE o.o_custkey = c.c_custkey
      AND o.o_orderdate >= TIMESTAMP '2000-07-01 00:00:00')
GROUP BY c_nationkey
ORDER BY cntrycode
"""


# Progressive JPEG shares the baseline closed forms verbatim (the
# shared-oracle cross-check pattern): same content, different scan
# order on the wire.
ORACLES["multimodal_jpeg_progressive_real"] = ORACLES["multimodal_jpeg_real"]
ORACLES["multimodal_jpeg_progressive_420"] = ORACLES["multimodal_jpeg_420_real"]


# WARC capture plane (r9): the fixture's HTML closed form — title line,
# h1 with a one-pass-decoded &amp;, the document text verbatim (the
# corpus is whitespace-normal so step 6 is the identity on it), and the
# div line with decoded &lt;&gt; and an &nbsp;-collapsed space. The
# warcinfo/request/plain-response siblings and both container layouts
# (gzip members on odd ids) must leave no trace.
ORACLES["warc_extract_text"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  CAST(200 AS INTEGER) AS http_status,
  'doc ' || doc_id || chr(10) ||
  'Doc ' || doc_id || ' & friends' || chr(10) ||
  text || chr(10) ||
  'tail <' || doc_id || '> end' AS text
FROM documents
"""

# Main-content (readability-class) extraction: on the same fixture,
# title and the trailing div are boilerplate — only the h1 and the
# body paragraph survive. The contrast with warc_extract_text's
# closed form pins the two extractors' semantic difference.
ORACLES["warc_main_text"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  'Doc ' || doc_id || ' & friends' || chr(10) || text AS text
FROM documents
"""

# Per-domain rollup over the extracted closed form; token convention
# is the shared len(regexp_split_to_array(trim(x), '\\s+')).
ORACLES["warc_domain_stats"] = """
WITH pages AS (
  SELECT source || '.example.org' AS domain,
    'doc ' || doc_id || chr(10) || 'Doc ' || doc_id || ' & friends' ||
    chr(10) || text || chr(10) || 'tail <' || doc_id || '> end' AS xt,
    CASE WHEN doc_id % 7 = 0 THEN 0 ELSE 1 END AS indexable
  FROM documents
)
SELECT domain,
  CAST(count(*) AS BIGINT) AS n_pages,
  CAST(sum(len(regexp_split_to_array(trim(xt), '\\s+'))) AS BIGINT)
    AS tokens,
  CAST(sum(indexable) AS BIGINT) AS n_indexable
FROM pages GROUP BY domain
"""

# robots.txt gate (RFC 9309 as of r10): longest-match over
# Allow+Disallow with wildcards for agent * (the googlebot
# Disallow-all group must not apply). By the fixture's path cycle,
# ids % 6 in (0, 4) are blocked (prefix Disallow; /*.bak$ wildcard),
# the rest survive — including the Allow carve-out (3) and the
# $-anchor near-miss (5) — with the shared extraction closed form.
ORACLES["warc_robots_filter"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org' ||
  CASE doc_id % 6
    WHEN 1 THEN '/doc/' || doc_id
    WHEN 2 THEN '/pub/' || doc_id
    WHEN 3 THEN '/private-' || source || '/ok/' || doc_id
    ELSE '/files/' || doc_id || '.bakx' END AS url,
  'doc ' || doc_id || chr(10) ||
  'Doc ' || doc_id || ' & friends' || chr(10) ||
  text || chr(10) ||
  'tail <' || doc_id || '> end' AS text
FROM documents
WHERE doc_id % 6 NOT IN (0, 4)
"""

# WET layout: conversion blocks carry the text verbatim.
ORACLES["warc_wet_extract"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  text
FROM documents
"""

# Robots-meta gate: same closed form as warc_extract_text, minus the
# noindex pages (doc_id % 7 = 0) — the directive itself strips to
# nothing visible, so presence/absence of text rows IS the check.
ORACLES["warc_indexable_text"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  'doc ' || doc_id || chr(10) ||
  'Doc ' || doc_id || ' & friends' || chr(10) ||
  text || chr(10) ||
  'tail <' || doc_id || '> end' AS text
FROM documents
WHERE doc_id % 7 <> 0
"""

# Latest-capture dedup: one row per page, fresh date + fresh text +
# true capture count; the stale re-capture (older date, messy surface
# URL folded in by canonicalization) must leave only its count.
ORACLES["warc_latest_capture"] = """
SELECT 'https://' || source || '.example.org/' || doc_id AS url,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
    AS n_captures,
  '2026-02-02T00:00:00Z' AS kept_date,
  'doc ' || doc_id || chr(10) ||
  'Doc ' || doc_id || ' & friends' || chr(10) ||
  text || chr(10) ||
  'tail <' || doc_id || '> end' AS text
FROM documents
"""

# Record walk: the per-id record multiset is a closed form of the
# fixture rule (warcinfo always; request on even ids; html response
# always; plain response on ids % 5 = 0), with seq following file
# order. Responses report the HTTP-level Content-Type, others the
# WARC-level one.
ORACLES["warc_records_scan"] = """
SELECT doc_id AS media_id, CAST(seq AS INTEGER) AS seq, warc_type,
       content_type, CAST(http_status AS INTEGER) AS http_status
FROM (
  SELECT doc_id, 0 AS seq, 'warcinfo' AS warc_type,
         'application/warc-fields' AS content_type,
         NULL AS http_status
  FROM documents
  UNION ALL
  SELECT doc_id, 1, 'request', 'application/http;msgtype=request', NULL
  FROM documents WHERE doc_id % 2 = 0
  UNION ALL
  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 2 ELSE 1 END, 'response',
         'text/html; charset=utf-8', 200
  FROM documents
  UNION ALL
  SELECT doc_id, CASE WHEN doc_id % 2 = 0 THEN 3 ELSE 2 END, 'response',
         'text/plain', 200
  FROM documents WHERE doc_id % 5 = 0
)
"""


# Fault tolerance (r10): both good pages of every doc survive with
# exact text; the dead-letter count is 1 for the five corruption modes
# and 0 for the control — closed-form from the doc_id % 6 cycle.
ORACLES["warc_fault_tolerance"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id || '/' || part
    AS url,
  text,
  CAST(CASE WHEN doc_id % 6 = 0 THEN 0 ELSE 1 END AS BIGINT)
    AS n_errors
FROM documents CROSS JOIN (SELECT 'a' AS part UNION ALL SELECT 'b') p
"""

# Charset ladder (r10): decoded text and the charset actually used,
# closed-form from the doc_id % 5 cycle (header param / meta sniff /
# strict-utf8 / latin-1 last resort).
ORACLES["warc_charset_decode"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/cs/' || doc_id AS url,
  CASE doc_id % 5
    WHEN 0 THEN 'utf-8'
    WHEN 1 THEN 'iso8859-1'
    WHEN 2 THEN 'cp1252'
    WHEN 3 THEN 'cp1252'
    ELSE 'iso8859-1' END AS charset,
  CASE doc_id % 5
    WHEN 0 THEN 'café ' || text
    WHEN 1 THEN 'café ' || doc_id
    WHEN 2 THEN 'price € ' || doc_id
    WHEN 3 THEN 'meta € ' || doc_id
    ELSE 'café ' || doc_id END AS text
FROM documents
"""

# Revisit resolution (r10): pages whose newest capture is a revisit
# keep the revisit DATE and TYPE but the referred response's text;
# others keep their single response row.
ORACLES["warc_revisit_resolve"] = """
SELECT 'https://' || source || '.example.org/' || doc_id AS url,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
    AS n_captures,
  CASE WHEN doc_id % 3 = 0 THEN '2026-03-03T00:00:00Z'
       ELSE '2026-01-01T00:00:00Z' END AS kept_date,
  CASE WHEN doc_id % 3 = 0 THEN 'revisit' ELSE 'response' END
    AS kept_type,
  text
FROM documents
"""

# Article-scoped, link-density-gated extraction (r10): even docs are
# <article>-wrapped (outside divs vanish by scoping), odd docs are
# whole-page; the link-list nav div dies by density in both; the
# body <div> text and the h1 survive in both; the title line only
# exists (and survives) outside an article scope (odd docs).
ORACLES["warc_article_extract"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  CASE WHEN doc_id % 2 = 0
    THEN 'Doc ' || doc_id || chr(10) || text
    ELSE 'doc ' || doc_id || chr(10) ||
         'Doc ' || doc_id || chr(10) || text
  END AS text
FROM documents
"""

# Agent-group selection (r10): for agent 'sis-crawler' only the
# longest-prefix group ('sis-crawler', Disallow /c/) applies — /a/
# ('*' group) and /b/ ('sis' group) pages survive.
ORACLES["warc_robots_agent_groups"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' ||
  CASE doc_id % 3 WHEN 0 THEN 'a' ELSE 'b' END || '/' || doc_id AS url,
  text
FROM documents
WHERE doc_id % 3 <> 2
"""


# Out-link extraction (r10): 3 resolved links per doc (absolute
# cross-domain, root-relative, path-relative against /d/) + the
# scheme-relative 4th on even ids; fragment and mailto links vanish.
ORACLES["warc_outlinks"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/d/' || doc_id AS url,
  link
FROM (
  SELECT doc_id, source,
    'https://t' || (doc_id % 7) || '.example.net/page' AS link
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://' || source || '.example.org/local/' || doc_id
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://' || source || '.example.org/d/other/' || doc_id || '.html'
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://t' || ((doc_id + 1) % 7) || '.example.net/s'
  FROM documents WHERE doc_id % 2 = 0
)
"""


# WET writer roundtrip (r10): write-side framing must read back
# verbatim through the scan path.
ORACLES["warc_wet_writer_roundtrip"] = """
SELECT 'https://' || source || '.example.org/' || doc_id AS url,
  '2026-02-02T00:00:00Z' AS warc_date,
  text
FROM documents
"""

# Redirect-chain resolution (r10): the content page resolves to
# itself (0 hops); each 3xx capture in the length-(doc_id % 4) chain
# resolves to the content page with its exact hop count.
ORACLES["warc_redirect_resolve"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org' || path AS url,
  CAST(status AS INTEGER) AS http_status,
  'https://' || source || '.example.org/p' || doc_id AS final_url,
  CAST(hops AS INTEGER) AS n_hops
FROM (
  SELECT doc_id, source, '/p' || doc_id AS path, 200 AS status,
         0 AS hops
  FROM documents
  UNION ALL
  SELECT doc_id, source, '/r1/' || doc_id, 301, 1
  FROM documents WHERE doc_id % 4 >= 1
  UNION ALL
  SELECT doc_id, source, '/r2/' || doc_id, 302, 2
  FROM documents WHERE doc_id % 4 >= 2
  UNION ALL
  SELECT doc_id, source, '/r3/' || doc_id, 301, 3
  FROM documents WHERE doc_id % 4 >= 3
)
"""




# Bigram LM scoring (r10): add-1 conditional model over the corpus's
# own statistics; per-doc mean -ln P(w2|w1).
ORACLES["text_bigram_logprob"] = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
uni AS MATERIALIZED (
  SELECT w, count(*) AS n1
  FROM (SELECT unnest(t) AS w FROM toks) GROUP BY w
),
v AS (SELECT count(*) AS v FROM uni),
big AS MATERIALIZED (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - 1)) AS i
  ) g
  WHERE len(t) >= 2
),
model AS MATERIALIZED (
  SELECT w1, w2,
    ln((count(*) + CAST(1.0 AS DOUBLE)) / (uni.n1 + (SELECT v FROM v)))
      AS logp
  FROM big JOIN uni ON uni.w = big.w1
  GROUP BY w1, w2, uni.n1
)
SELECT big.doc_id,
  round(avg(-model.logp), 6) AS mean_neg_logp,
  CAST(count(*) AS BIGINT) AS n_bigrams
FROM big JOIN model USING (w1, w2)
GROUP BY big.doc_id
"""

# interpolated Kneser-Ney bigram scoring (r11): the KenLM arithmetic
# replayed exactly — every model term is an integer aggregate over
# the distinct-bigram TYPE relation (prefix occurrences c(w1.),
# distinct continuations N1+, total types, count-of-counts discount
# D = n1/(n1+2*n2)), so both engines divide the same exact integers.
ORACLES["text_kn_logprob"] = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(text), '\\s+'),
                x -> x <> '') AS t
  FROM documents
),
big AS MATERIALIZED (
  SELECT doc_id, t[i] AS w1, t[i + 1] AS w2
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - 1)) AS i
  ) g
  WHERE len(t) >= 2
),
bt AS MATERIALIZED (
  SELECT w1, w2, count(*) AS c12 FROM big GROUP BY w1, w2
),
pre AS MATERIALIZED (
  SELECT w1, sum(c12) AS c1, count(*) AS fol FROM bt GROUP BY w1
),
cont AS MATERIALIZED (
  SELECT w2, count(*) AS prec FROM bt GROUP BY w2
),
gstats AS MATERIALIZED (
  SELECT count(*) AS tt,
    CASE WHEN sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END)
            + 2 * sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END) > 0
      THEN CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END) AS DOUBLE)
           / CAST(sum(CASE WHEN c12 = 1 THEN 1 ELSE 0 END)
                  + 2 * sum(CASE WHEN c12 = 2 THEN 1 ELSE 0 END)
                  AS DOUBLE)
      ELSE 0.75 END AS d
  FROM bt
),
model AS MATERIALIZED (
  SELECT bt.w1, bt.w2,
    ln(greatest(CAST(bt.c12 AS DOUBLE) - g.d, 0.0)
         / CAST(pre.c1 AS DOUBLE)
       + g.d * CAST(pre.fol AS DOUBLE) / CAST(pre.c1 AS DOUBLE)
             * CAST(cont.prec AS DOUBLE) / CAST(g.tt AS DOUBLE))
      AS logp
  FROM bt
  JOIN pre ON pre.w1 = bt.w1
  JOIN cont ON cont.w2 = bt.w2
  CROSS JOIN gstats g
)
SELECT big.doc_id,
  round(avg(-model.logp), 6) AS mean_neg_logp_kn,
  CAST(count(*) AS BIGINT) AS n_bigrams
FROM big JOIN model USING (w1, w2)
GROUP BY big.doc_id
"""

# temperature-based source sampling (r11): q_i ∝ n_i^0.3 (XLM-R/mT5),
# same md5 gate as source_mix_rebalance; keep_prob rounded to 6 dp
# BEFORE the gate compare in both engines so the single float pow
# cannot flip a boundary doc.
ORACLES["source_mix_temperature"] = """
WITH w AS (SELECT doc_id, source,
    len(regexp_split_to_array(trim(text), '\\s+')) AS t,
    md5(doc_id::VARCHAR) AS h
  FROM documents),
hx AS (SELECT *, ((strpos('0123456789abcdef', substr(h,1,1))-1)*4096
    + (strpos('0123456789abcdef', substr(h,2,1))-1)*256
    + (strpos('0123456789abcdef', substr(h,3,1))-1)*16
    + (strpos('0123456789abcdef', substr(h,4,1))-1)) / 65536.0 AS gate
  FROM w),
tot AS (SELECT source, CAST(sum(t) AS BIGINT) AS actual_tokens
        FROM w GROUP BY source),
z AS (SELECT sum(pow(CAST(actual_tokens AS DOUBLE), 0.3)) AS z FROM tot),
wt AS (SELECT source, actual_tokens,
    round(pow(CAST(actual_tokens AS DOUBLE), 0.3) / z.z, 6)
      AS target_share,
    round(least(1.0, CASE WHEN actual_tokens > 0 THEN
        100000.0 * pow(CAST(actual_tokens AS DOUBLE), 0.3) / z.z
          / actual_tokens END), 6) AS keep_prob
  FROM tot, z),
s AS (SELECT hx.source, count(*) AS n_kept
  FROM hx JOIN wt USING (source) WHERE gate < keep_prob
  GROUP BY hx.source)
SELECT wt.source, actual_tokens, target_share, keep_prob,
  CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept
FROM wt LEFT JOIN s ON wt.source = s.source
"""


# Unicode script profiling (r11): same explicit BMP range classes,
# same length-minus-stripped counts (DuckDB needs the 'g' flag), same
# priority-order dominant-script CASE — both engines spell the
# identical arithmetic over the identical script-cycled corpus.
def _script_oracle() -> str:
    ranges = [
        ("latin", "[A-Za-zÀ-ɏ]"),
        ("cyrillic", "[Ѐ-ӿ]"),
        ("greek", "[Ͱ-Ͽ]"),
        ("digit", "[0-9]"),
    ]
    lat = "abcdefghijklmnopqrstuvwxyz"
    cyr = "абвгдежзийклмнопрстуфхцчшщ"
    grk = "αβγδεζηθικλμνξοπρστυφχψωςϊ"
    cnt_cols = ",\n    ".join(
        f"length(t) - length(regexp_replace(t, '{cls}', '', 'g'))"
        f" AS c_{name}"
        for name, cls in ranges
    )
    names = [n for n, _ in ranges]
    dom = "CASE "
    for name in names:
        conds = " AND ".join(
            f"c_{name} >= c_{o}" for o in names if o != name
        )
        dom += f"WHEN c_{name} > 0 AND {conds} THEN '{name}' "
    dom += "ELSE 'none' END"
    ratio_cols = ",\n  ".join(
        f"round(CAST(c_{n} AS DOUBLE) / greatest(length(t), 1), 6)"
        f" AS {n}_ratio"
        for n in names
    )
    return f"""
WITH v AS MATERIALIZED (
  SELECT doc_id,
    CASE CAST(doc_id % 5 AS INTEGER)
      WHEN 0 THEN text
      WHEN 1 THEN translate(lower(text), '{lat}', '{cyr}')
      WHEN 2 THEN regexp_replace(lower(text), '[aeiou]', '7', 'g')
      WHEN 3 THEN translate(lower(text), '{lat}', '{grk}')
      ELSE lower(text) || ' ' || translate(lower(text), '{lat}', '{cyr}')
    END AS t
  FROM documents
),
c AS MATERIALIZED (
  SELECT doc_id, t,
    {cnt_cols}
  FROM v
)
SELECT doc_id,
  CAST(length(t) AS BIGINT) AS n_chars,
  {ratio_cols},
  {dom} AS dominant_script
FROM c
"""


ORACLES["text_script_profile"] = _script_oracle()


# robots politeness metadata (r10; group semantics pinned r11):
# group-exclusive crawl-delay — the blank-line-stacked 'sis-crawler'
# group's 0.5 beats '*' 2 on even-length sources; on odd-length
# sources the selected 'sis-crawler' group has NO delay and must
# yield NULL (no cross-group inheritance) — plus sitemap counts,
# keyed closed-form on length(source).
ORACLES["warc_robots_politeness"] = """
SELECT DISTINCT source || '.example.org' AS domain,
  CAST(CASE WHEN length(source) % 2 = 0 THEN 0.5 ELSE NULL END
       AS DOUBLE) AS crawl_delay,
  CAST(CASE WHEN length(source) % 3 = 0 THEN 2 ELSE 1 END
       AS INTEGER) AS n_sitemaps
FROM documents
"""

# CDX index lookup (r10): SURT urlkey (reversed host labels) folds
# the messy stale URL onto the fresh key; the newest timestamp wins
# with the true capture count — all derivable closed-form.
ORACLES["cdx_index_lookup"] = """
SELECT 'org,example,' || source || ')/' || doc_id AS urlkey,
  '20260202000000' AS timestamp,
  'https://' || source || '.example.org/' || doc_id AS url,
  CAST(200 AS INTEGER) AS http_status,
  'text/html' AS mime,
  CAST(CASE WHEN doc_id % 3 = 0 THEN 2 ELSE 1 END AS INTEGER)
    AS n_captures
FROM documents
"""

# DSIR importance weights (r10): hashed-bigram bucket counts with
# Laplace smoothing, per-doc sum of log(p_target/p_raw). Bucket =
# first 8 md5 hex chars as int, mod 64 — the engine-portable hash.
ORACLES["dsir_importance"] = """
WITH toks AS MATERIALIZED (
  SELECT doc_id,
    list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                x -> length(x) > 0) AS t
  FROM documents
),
grams AS MATERIALIZED (
  SELECT doc_id, t[i] || ' ' || t[i + 1] AS g
  FROM toks, LATERAL (
    SELECT unnest(generate_series(1, len(t) - 1)) AS i
  ) gg
  WHERE len(t) >= 2
),
bks AS MATERIALIZED (
  SELECT doc_id,
    CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT) % 64
         AS INTEGER) AS b
  FROM grams
),
ct AS (SELECT b, count(*) AS c FROM bks WHERE doc_id % 97 = 0 GROUP BY b),
cr AS (SELECT b, count(*) AS c FROM bks WHERE doc_id % 97 <> 0 GROUP BY b),
tot AS (
  SELECT (SELECT coalesce(sum(c), 0) FROM ct) AS tt,
         (SELECT coalesce(sum(c), 0) FROM cr) AS tr
),
lut AS MATERIALIZED (
  SELECT bb.b,
    ln(((coalesce(ct.c, 0) + CAST(1.0 AS DOUBLE))
         / ((SELECT tt FROM tot) + 64))
       / ((coalesce(cr.c, 0) + CAST(1.0 AS DOUBLE))
         / ((SELECT tr FROM tot) + 64))) AS lr
  FROM (SELECT unnest(generate_series(0, 63)) AS b) bb
  LEFT JOIN ct ON ct.b = bb.b
  LEFT JOIN cr ON cr.b = bb.b
)
SELECT d.doc_id,
  round(coalesce(s.v, CAST(0.0 AS DOUBLE)), 6) AS dsir_logweight
FROM documents d
LEFT JOIN (
  SELECT bks.doc_id, sum(lut.lr) AS v
  FROM bks JOIN lut USING (b) GROUP BY bks.doc_id
) s USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def _quality_lr_oracle(k: int = 8, lr: float = 0.5) -> str:
    """Replay the full-batch logistic-regression training as k
    unrolled CTE stages (the bpe_train precedent): stage n computes
    the sigmoid residuals under stage n-1's weights, aggregates the
    five gradient sums, and steps the weights; the final SELECT
    scores every document with the trained weights. Feature algebra
    and the dot-product term order mirror operators/selection.py
    exactly so both engines walk the same float path."""
    head = """
WITH feats AS MATERIALIZED (
  SELECT doc_id,
    CASE WHEN length(text) > 500 THEN CAST(1.0 AS DOUBLE)
         ELSE CAST(0.0 AS DOUBLE) END AS y,
    ln(CAST(1.0 AS DOUBLE) + n) AS x0,
    total_len / greatest(n, CAST(1.0 AS DOUBLE)) AS x1,
    alpha / greatest(n, CAST(1.0 AS DOUBLE)) AS x2,
    longw / greatest(n, CAST(1.0 AS DOUBLE)) AS x3
  FROM (
    SELECT doc_id, text,
      CAST(len(t) AS DOUBLE) AS n,
      CAST(list_sum(list_transform(t, x -> length(x))) AS DOUBLE)
        AS total_len,
      CAST(len(list_filter(t, x -> regexp_full_match(x, '[a-z]+')))
        AS DOUBLE) AS alpha,
      CAST(len(list_filter(t, x -> length(x) > 7)) AS DOUBLE) AS longw
    FROM (
      SELECT doc_id, text,
        list_filter(regexp_split_to_array(lower(trim(text)), '\\s+'),
                    x -> length(x) > 0) AS t
      FROM documents
    )
  )
),
w0 AS MATERIALIZED (SELECT CAST(0.0 AS DOUBLE) AS b, CAST(0.0 AS DOUBLE) AS w1,
              CAST(0.0 AS DOUBLE) AS w2, CAST(0.0 AS DOUBLE) AS w3,
              CAST(0.0 AS DOUBLE) AS w4)"""
    parts = [head]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f""",
g{i} AS MATERIALIZED (
  SELECT count(*) AS n,
    sum(e) AS g0, sum(e * x0) AS g1, sum(e * x1) AS g2,
    sum(e * x2) AS g3, sum(e * x3) AS g4
  FROM (
    SELECT y, x0, x1, x2, x3,
      CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
        (SELECT b FROM w{p}) + (SELECT w1 FROM w{p}) * x0
        + (SELECT w2 FROM w{p}) * x1 + (SELECT w3 FROM w{p}) * x2
        + (SELECT w4 FROM w{p}) * x3))) - y AS e
    FROM feats
  )
),
w{i} AS MATERIALIZED (
  SELECT
    (SELECT b FROM w{p}) - {lr} * g0 / n AS b,
    (SELECT w1 FROM w{p}) - {lr} * g1 / n AS w1,
    (SELECT w2 FROM w{p}) - {lr} * g2 / n AS w2,
    (SELECT w3 FROM w{p}) - {lr} * g3 / n AS w3,
    (SELECT w4 FROM w{p}) - {lr} * g4 / n AS w4
  FROM g{i}
)""")
    parts.append(f"""
SELECT doc_id, CAST(y AS INTEGER) AS label,
  round(CAST(1.0 AS DOUBLE) / (CAST(1.0 AS DOUBLE) + exp(-(
    (SELECT b FROM w{k}) + (SELECT w1 FROM w{k}) * x0
    + (SELECT w2 FROM w{k}) * x1 + (SELECT w3 FROM w{k}) * x2
    + (SELECT w4 FROM w{k}) * x3))), 6) AS p_quality
FROM feats
""")
    return "".join(parts)


ORACLES["quality_classifier"] = _quality_lr_oracle(8, 0.5)


def _pagerank_oracle(k: int = 4, damping: float = 0.85) -> str:
    """Unrolled damped power iteration over the closed-form domain
    edge set (the bpe_train precedent): contribution join + dangling
    mass + uniform teleport per stage, doubles throughout, mirroring
    the Spark algebra term for term (including rank * (1/deg) rather
    than rank/deg, so both engines take the identical float path)."""
    parts = [f"""
WITH edges AS MATERIALIZED (
  SELECT DISTINCT source || '.example.org' AS src,
         't' || (doc_id % 7) || '.example.net' AS dst
  FROM documents
  UNION
  SELECT DISTINCT source || '.example.org',
         't' || ((doc_id + 1) % 7) || '.example.net'
  FROM documents WHERE doc_id % 2 = 0
),
nodes AS MATERIALIZED (
  SELECT src AS node FROM edges UNION SELECT dst FROM edges
),
deg AS MATERIALIZED (
  SELECT src, CAST(1.0 AS DOUBLE) / count(*) AS w
  FROM edges GROUP BY src
),
nn AS MATERIALIZED (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
r0 AS MATERIALIZED (
  SELECT node, CAST(1.0 AS DOUBLE) / (SELECT n FROM nn) AS r FROM nodes
)"""]
    for i in range(1, k + 1):
        p = i - 1
        parts.append(f""",
c{i} AS MATERIALIZED (
  SELECT e.dst AS node, sum(p.r * deg.w) AS c
  FROM edges e
  JOIN r{p} p ON p.node = e.src
  JOIN deg ON deg.src = e.src
  GROUP BY e.dst
),
d{i} AS MATERIALIZED (
  SELECT coalesce(sum(r), CAST(0.0 AS DOUBLE)) AS dm
  FROM r{p} WHERE node NOT IN (SELECT src FROM deg)
),
r{i} AS MATERIALIZED (
  SELECT nodes.node,
    CAST({1.0 - damping} AS DOUBLE) / (SELECT n FROM nn)
    + CAST({damping} AS DOUBLE) * (
        coalesce(c{i}.c, CAST(0.0 AS DOUBLE))
        + (SELECT dm FROM d{i}) / (SELECT n FROM nn)
      ) AS r
  FROM nodes LEFT JOIN c{i} ON c{i}.node = nodes.node
)""")
    parts.append(f"""
SELECT node AS domain, round(r, 6) AS rank FROM r{k}
""")
    return "".join(parts)


ORACLES["link_pagerank"] = _pagerank_oracle(4, 0.85)

# Crawl-frontier budget (r10): PageRank x politeness — the scheduler
# composition. Same pagerank stages; the final select joins each
# SOURCE domain's crawl-delay closed form (1 + len(source) % 3
# seconds) and divides the UNROUNDED rank by it, mirroring the Spark
# algebra.
_frontier = _pagerank_oracle(4, 0.85)
ORACLES["crawl_frontier_budget"] = _frontier[
    : _frontier.rindex("\nSELECT")
] + """
SELECT r4.node AS domain,
  round(r4.r, 6) AS rank,
  CAST(1 + (length(s.source) % 3) AS DOUBLE) AS crawl_delay,
  round(r4.r / CAST(1 + (length(s.source) % 3) AS DOUBLE), 6)
    AS fetch_budget
FROM r4 JOIN (SELECT DISTINCT source FROM documents) s
  ON r4.node = s.source || '.example.org'
"""


def _bpe_oracle(k: int = 8, mode: str = "chars") -> str:
    """Replay BPE training as k unrolled CTE stages (the
    ann_ivf_trained precedent): stage n computes the weighted pair
    counts over stage n-1's vocabulary symbols, takes the argmax with
    a lexicographic tie-break, and applies the greedy left-to-right
    NON-OVERLAPPING rewrite via run-parity windows (consecutive
    matches form runs; odd-ranked matches within a run merge, the
    following position is consumed). The final SELECT re-encodes every
    document by joining its words to the trained vocabulary.

    ``mode='bytes'`` (r10) replays the BYTE-LEVEL variant: words are
    regex pre-tokens (operators/bpe.PRETOK_RE — identical match
    semantics in RE2 and Java regex) and the initial symbols are the
    UTF-8 bytes as uppercase hex pairs (hex(encode(word)) on both
    engines); the k merge stages are IDENTICAL — only w0/s0 and the
    final re-encode differ."""
    if mode == "bytes":
        from scicat_ingestor_spark.operators.bpe import PRETOK_RE

        pat = PRETOK_RE.replace("'", "''")
        head = f"""
WITH w0 AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(regexp_extract_all(text, '{pat}')) AS word
    FROM documents) t
  WHERE length(word) > 0 GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, freq, list(substr(h, i*2-1, 2) ORDER BY i) AS symbols
  FROM (SELECT word, freq, hex(encode(word)) AS h FROM w0) wh,
    LATERAL (SELECT unnest(generate_series(1, length(h)//2)) AS i) g
  GROUP BY word, freq
)"""
    else:
        head = """
WITH w0 AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents) t
  WHERE length(word) > 0 GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, freq, list(substr(word, i, 1) ORDER BY i) AS symbols
  FROM w0, LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) g
  GROUP BY word, freq
)"""
    parts = [head]
    for n in range(1, k + 1):
        p = n - 1
        parts.append(f""",
p{n} AS MATERIALIZED (
  SELECT symbols[i] AS a, symbols[i+1] AS b, sum(freq) AS c
  FROM s{p}, LATERAL (SELECT unnest(generate_series(1, len(symbols)-1))
                      AS i) g
  GROUP BY 1, 2
),
b{n} AS MATERIALIZED (SELECT a, b FROM p{n} ORDER BY c DESC, a, b LIMIT 1),
e{n} AS MATERIALIZED (
  SELECT word, freq, i, symbols[i] AS sym,
    CASE WHEN i < len(symbols)
          AND symbols[i] = (SELECT a FROM b{n})
          AND symbols[i+1] = (SELECT b FROM b{n})
         THEN 1 ELSE 0 END AS m
  FROM s{p}, LATERAL (SELECT unnest(generate_series(1, len(symbols)))
                      AS i) g
),
r{n} AS MATERIALIZED (
  SELECT *, sum(1-m) OVER (PARTITION BY word ORDER BY i) AS run_id
  FROM e{n}
),
k{n} AS MATERIALIZED (
  SELECT *, CASE WHEN m = 1 AND (sum(m) OVER
      (PARTITION BY word, run_id ORDER BY i)) % 2 = 1
    THEN 1 ELSE 0 END AS km
  FROM r{n}
),
o{n} AS MATERIALIZED (
  SELECT *, lag(km) OVER (PARTITION BY word ORDER BY i) AS pk
  FROM k{n}
),
s{n} AS MATERIALIZED (
  SELECT word, freq,
    list(CASE WHEN km = 1
              THEN (SELECT a || b FROM b{n}) ELSE sym END ORDER BY i)
      FILTER (WHERE coalesce(pk, 0) = 0) AS symbols
  FROM o{n} GROUP BY word, freq
)""")
    if mode == "bytes":
        parts.append(f"""
SELECT d.doc_id,
  CAST(count(*) AS BIGINT) AS n_pretokens,
  CAST(sum(len(sk.symbols)) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, text FROM documents) d,
  LATERAL (SELECT unnest(regexp_extract_all(d.text, '{pat}'))
           AS word) dw
  JOIN s{k} sk ON sk.word = dw.word
WHERE length(dw.word) > 0
GROUP BY d.doc_id
""")
    else:
        parts.append(f"""
SELECT d.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(len(sk.symbols)) AS BIGINT) AS n_bpe_tokens
FROM (SELECT doc_id, text FROM documents) d,
  LATERAL (SELECT unnest(regexp_split_to_array(trim(d.text), '\\s+'))
           AS word) dw
  JOIN s{k} sk ON sk.word = dw.word
WHERE length(dw.word) > 0
GROUP BY d.doc_id
""")
    return "".join(parts)


ORACLES["bpe_train_segment"] = _bpe_oracle(8)
ORACLES["bpe_train_bytes"] = _bpe_oracle(8, mode="bytes")


def _wordpiece_oracle(k: int = 8) -> str:
    """Replay WordPiece training + longest-match encoding (r11). The
    k training stages are the _bpe_oracle scaffold with two changes:
    initial symbols carry the ``##`` continuation prefix (first char
    bare), and the argmax is LIKELIHOOD-scored —
    c(ab) / (c(a)·c(b)) in double, ties on (a, b) — with the merged
    symbol fusing ``a || strip##(b)``. Encoding is replayed exactly:
    a per-(word, pos) best-match-length table (max-munch against the
    final vocabulary = alphabet + merge products) drives a RECURSIVE
    CTE whose single deterministic chain per word terminates either
    past the word end (piece count = steps) or at a matchless
    position ([UNK], 1 token)."""
    parts = ["""
WITH RECURSIVE w0 AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(text), '\\s+')) AS word
    FROM documents) t
  WHERE length(word) > 0 GROUP BY word
),
s0 AS MATERIALIZED (
  SELECT word, freq,
    list(CASE WHEN i = 1 THEN substr(word, i, 1)
              ELSE '##' || substr(word, i, 1) END ORDER BY i)
      AS symbols
  FROM w0, LATERAL (SELECT unnest(generate_series(1, length(word))) AS i) g
  GROUP BY word, freq
)"""]
    for n in range(1, k + 1):
        p = n - 1
        parts.append(f""",
p{n} AS MATERIALIZED (
  SELECT symbols[i] AS a, symbols[i+1] AS b, sum(freq) AS cp
  FROM s{p}, LATERAL (SELECT unnest(generate_series(1, len(symbols)-1))
                      AS i) g
  GROUP BY 1, 2
),
u{n} AS MATERIALIZED (
  SELECT sym, sum(freq) AS cs
  FROM (SELECT freq, unnest(symbols) AS sym FROM s{p}) t GROUP BY sym
),
b{n} AS MATERIALIZED (
  SELECT p.a, p.b,
    p.a || CASE WHEN p.b LIKE '##%' THEN substr(p.b, 3) ELSE p.b END
      AS m
  FROM p{n} p
  JOIN u{n} ua ON ua.sym = p.a
  JOIN u{n} ub ON ub.sym = p.b
  ORDER BY CAST(p.cp AS DOUBLE)
             / (CAST(ua.cs AS DOUBLE) * CAST(ub.cs AS DOUBLE)) DESC,
           p.a, p.b
  LIMIT 1
),
e{n} AS MATERIALIZED (
  SELECT word, freq, i, symbols[i] AS sym,
    CASE WHEN i < len(symbols)
          AND symbols[i] = (SELECT a FROM b{n})
          AND symbols[i+1] = (SELECT b FROM b{n})
         THEN 1 ELSE 0 END AS m
  FROM s{p}, LATERAL (SELECT unnest(generate_series(1, len(symbols)))
                      AS i) g
),
r{n} AS MATERIALIZED (
  SELECT *, sum(1-m) OVER (PARTITION BY word ORDER BY i) AS run_id
  FROM e{n}
),
k{n} AS MATERIALIZED (
  SELECT *, CASE WHEN m = 1 AND (sum(m) OVER
      (PARTITION BY word, run_id ORDER BY i)) % 2 = 1
    THEN 1 ELSE 0 END AS km
  FROM r{n}
),
o{n} AS MATERIALIZED (
  SELECT *, lag(km) OVER (PARTITION BY word ORDER BY i) AS pk
  FROM k{n}
),
s{n} AS MATERIALIZED (
  SELECT word, freq,
    list(CASE WHEN km = 1
              THEN (SELECT m FROM b{n}) ELSE sym END ORDER BY i)
      FILTER (WHERE coalesce(pk, 0) = 0) AS symbols
  FROM o{n} GROUP BY word, freq
)""")
    merged_union = "\n  UNION\n".join(
        f"  SELECT m AS piece FROM b{n}" for n in range(1, k + 1)
    )
    parts.append(f""",
vocabt AS MATERIALIZED (
  SELECT DISTINCT sym AS piece
  FROM (SELECT unnest(symbols) AS sym FROM s0) t
  UNION
{merged_union}
),
mx AS (
  SELECT max(length(CASE WHEN piece LIKE '##%' THEN substr(piece, 3)
                         ELSE piece END)) AS m
  FROM vocabt
),
words AS MATERIALIZED (SELECT word FROM w0),
bestl AS MATERIALIZED (
  SELECT w.word, g.pos, max(i.l) AS bl
  FROM words w,
    LATERAL (SELECT unnest(generate_series(1, length(w.word))) AS pos) g,
    LATERAL (SELECT unnest(generate_series(1, (SELECT m FROM mx))) AS l) i
  WHERE g.pos + i.l - 1 <= length(w.word)
    AND EXISTS (
      SELECT 1 FROM vocabt v
      WHERE v.piece = CASE WHEN g.pos = 1
                        THEN substr(w.word, g.pos, i.l)
                        ELSE '##' || substr(w.word, g.pos, i.l) END)
  GROUP BY w.word, g.pos
),
enc AS (
  SELECT word, 1 AS pos, 0 AS n, false AS failed FROM words
  UNION ALL
  SELECT e.word,
    CASE WHEN b.bl IS NULL THEN length(e.word) + 1
         ELSE e.pos + b.bl END,
    e.n + CASE WHEN b.bl IS NULL THEN 0 ELSE 1 END,
    b.bl IS NULL
  FROM enc e
  LEFT JOIN bestl b ON b.word = e.word AND b.pos = e.pos
  WHERE e.pos <= length(e.word) AND NOT e.failed
),
wp AS MATERIALIZED (
  SELECT word,
    CASE WHEN failed THEN 1 ELSE n END AS pieces,
    CASE WHEN failed THEN 1 ELSE 0 END AS unk
  FROM enc WHERE failed OR pos > length(word)
)
SELECT d.doc_id,
  CAST(count(*) AS BIGINT) AS n_words,
  CAST(sum(wp.pieces) AS BIGINT) AS n_wp_tokens,
  CAST(sum(wp.unk) AS BIGINT) AS n_unk_words
FROM (SELECT doc_id, text FROM documents) d,
  LATERAL (SELECT unnest(regexp_split_to_array(trim(d.text), '\\s+'))
           AS word) dw
  JOIN wp ON wp.word = dw.word
WHERE length(dw.word) > 0
GROUP BY d.doc_id
""")
    return "".join(parts)


ORACLES["wordpiece_train_tokens"] = _wordpiece_oracle(8)


# Exact-substring removal: duplicated-span coverage replayed with NOT
# EXISTS interval logic, rebuild via ordered string_agg. Span hashing
# matches dedup_duplicate_spans (lowercased 8-token md5); the rebuild
# keeps ORIGINAL tokens. MATERIALIZED: sp feeds both the frequency
# aggregate and the cut join.
ORACLES["dedup_remove_spans"] = """
WITH w AS MATERIALIZED (
  SELECT doc_id,
    regexp_split_to_array(lower(trim(text)), '\\s+') AS ltoks,
    regexp_split_to_array(trim(text), '\\s+') AS toks
  FROM documents
),
sp AS MATERIALIZED (
  SELECT doc_id, i AS s,
    md5(concat_ws(' ', ltoks[i], ltoks[i+1], ltoks[i+2], ltoks[i+3],
                       ltoks[i+4], ltoks[i+5], ltoks[i+6], ltoks[i+7]))
      AS h
  FROM w, LATERAL (SELECT unnest(range(1, greatest(len(ltoks)-7, 1)+1))
                   AS i) g
),
duph AS MATERIALIZED (
  SELECT h FROM (
    SELECT h, count(DISTINCT doc_id) AS nd FROM sp GROUP BY h
  ) WHERE nd > 1
),
cuts AS MATERIALIZED (
  SELECT DISTINCT sp.doc_id, sp.s FROM sp JOIN duph USING (h)
),
tok AS MATERIALIZED (
  SELECT w.doc_id, g.j, w.toks[g.j] AS t
  FROM w, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS j) g
),
kept AS MATERIALIZED (
  SELECT t.doc_id, t.j, t.t FROM tok t
  WHERE NOT EXISTS (
    SELECT 1 FROM cuts c
    WHERE c.doc_id = t.doc_id AND t.j BETWEEN c.s AND c.s + 7)
)
SELECT w.doc_id,
  CAST(any_value(len(w.toks)) AS BIGINT) AS n_tokens,
  CAST(any_value(len(w.toks)) - count(k.j) AS BIGINT) AS n_removed,
  coalesce(string_agg(k.t, ' ' ORDER BY k.j), '') AS text
FROM w LEFT JOIN kept k USING (doc_id)
GROUP BY w.doc_id
"""

# Full entity decoding (r11): numeric refs (dec/hex + the
# windows-1252 &#146; override) and long-tail named entities decode
# to real codepoints; the one-pass '&amp;#65;' trap stays literal
# '&#65;'. Closed form spells the expected Unicode directly.
ORACLES["warc_entity_decode"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/' || doc_id AS url,
  'café ' || text || ' — résumé' || chr(10) ||
  '’' || doc_id || '’ © ½ &#65; fin' AS text
FROM documents
"""


def _langid_oracle(final: str, k: int = 4, lr: float = 1.0) -> str:
    """Replay the trained-langid estimator end to end (the quality-LR
    precedent scaled to C=4 classes x 64 hashed buckets): synthesize
    the 4-language corpus, build normalized char-trigram histograms
    (md5 bucket hash, the engine-portable convention), unroll all k
    one-vs-rest GD iterations as CTE stages over a (class, b, w)
    weight relation (b = -1 is the bias), then score the held-out
    split and take argmax with ties to the first class in sorted
    order. ``final`` picks the last SELECT (predictions vs confusion
    counts)."""
    iters = ""
    prev = "w0"
    for i in range(1, k + 1):
        iters += f"""
z{i} AS MATERIALIZED (
  SELECT d.doc_id, d.lang, wb.class, wb.w + coalesce(dp.dot, 0.0) AS z
  FROM tdocs d
  CROSS JOIN (SELECT class, w FROM {prev} WHERE b = -1) wb
  LEFT JOIN (
    SELECT f.doc_id, w.class, sum(f.x * w.w) AS dot
    FROM tfeats f JOIN {prev} w ON w.b = f.b
    GROUP BY f.doc_id, w.class
  ) dp ON dp.doc_id = d.doc_id AND dp.class = wb.class
),
g{i} AS MATERIALIZED (
  SELECT z.class, f.b,
    sum((1.0/(1.0+exp(-z.z)) -
         CASE WHEN z.lang = z.class THEN 1.0 ELSE 0.0 END) * f.x)
      / (SELECT n FROM tn) AS gw
  FROM z{i} z JOIN tfeats f ON f.doc_id = z.doc_id
  GROUP BY z.class, f.b
  UNION ALL
  SELECT z.class, -1 AS b,
    sum(1.0/(1.0+exp(-z.z)) -
        CASE WHEN z.lang = z.class THEN 1.0 ELSE 0.0 END)
      / (SELECT n FROM tn) AS gw
  FROM z{i} z GROUP BY z.class
),
w{i} AS MATERIALIZED (
  SELECT w.class, w.b, w.w - {lr} * coalesce(g.gw, 0.0) AS w
  FROM {prev} w LEFT JOIN g{i} g ON g.class = w.class AND g.b = w.b
),"""
        prev = f"w{i}"
    return f"""
WITH variants AS MATERIALIZED (
  SELECT doc_id,
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN 'eng' WHEN 1 THEN 'rev' WHEN 2 THEN 'sfx'
      ELSE 'vow' END AS lang,
    CASE CAST(doc_id % 4 AS INTEGER)
      WHEN 0 THEN lower(text)
      WHEN 1 THEN array_to_string(
        list_transform(string_split(lower(text), ' '),
                       x -> reverse(x)), ' ')
      WHEN 2 THEN regexp_replace(lower(text), '([a-z]+)', '\\1os', 'g')
      ELSE translate(lower(text), 'aeiou', 'äéíöü') END AS t
  FROM documents
),
docs3 AS MATERIALIZED (
  SELECT doc_id, lang, lower(trim(t)) AS t FROM variants
),
grams AS MATERIALIZED (
  SELECT doc_id, substr(t, CAST(i AS INTEGER), 3) AS g
  FROM docs3, LATERAL (
    SELECT unnest(generate_series(1, length(t) - 2)) AS i
  ) s
  WHERE length(t) >= 3
),
bk AS MATERIALIZED (
  SELECT doc_id,
    CAST(CAST(concat('0x', substr(md5(g), 1, 8)) AS UBIGINT) % 64
         AS INTEGER) AS b
  FROM grams
),
feats_all AS MATERIALIZED (
  SELECT c.doc_id, c.b,
    CAST(c.cnt AS DOUBLE) / greatest(t.tot, 1.0) AS x
  FROM (SELECT doc_id, b, count(*) AS cnt FROM bk GROUP BY 1, 2) c
  JOIN (SELECT doc_id, CAST(count(*) AS DOUBLE) AS tot
        FROM bk GROUP BY 1) t USING (doc_id)
),
tdocs AS MATERIALIZED (
  SELECT doc_id, lang FROM docs3 WHERE doc_id % 5 <> 0
),
tn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM tdocs),
tfeats AS MATERIALIZED (
  SELECT f.* FROM feats_all f JOIN tdocs USING (doc_id)
),
w0 AS (
  SELECT c.class, b.b, CAST(0.0 AS DOUBLE) AS w
  FROM (SELECT unnest(['eng', 'rev', 'sfx', 'vow']) AS class) c
  CROSS JOIN (SELECT unnest(generate_series(-1, 63)) AS b) b
),{iters}
hdocs AS (SELECT doc_id, lang FROM docs3 WHERE doc_id % 5 = 0),
hz AS MATERIALIZED (
  SELECT d.doc_id, d.lang, wb.class, wb.w + coalesce(dp.dot, 0.0) AS z
  FROM hdocs d
  CROSS JOIN (SELECT class, w FROM {prev} WHERE b = -1) wb
  LEFT JOIN (
    SELECT f.doc_id, w.class, sum(f.x * w.w) AS dot
    FROM feats_all f JOIN {prev} w ON w.b = f.b
    GROUP BY f.doc_id, w.class
  ) dp ON dp.doc_id = d.doc_id AND dp.class = wb.class
),
pred AS (
  SELECT doc_id, any_value(lang) AS true_lang,
    (list(class ORDER BY z DESC, class ASC))[1] AS pred_lang
  FROM hz GROUP BY doc_id
)
{final}
"""


ORACLES["text_langid_trained"] = _langid_oracle(
    "SELECT doc_id, true_lang, pred_lang FROM pred"
)
ORACLES["text_langid_confusion"] = _langid_oracle(
    "SELECT true_lang, pred_lang, CAST(count(*) AS BIGINT) AS n "
    "FROM pred GROUP BY 1, 2"
)

# PDF extraction (r11): two-page PDFs extract closed-form; encrypted
# docs (ids % 7 = 0) dead-letter with the documented gate message.
ORACLES["warc_pdf_extract"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/d' || doc_id || '.pdf' AS url,
  CASE WHEN doc_id % 7 = 0 THEN NULL
       ELSE 'doc ' || doc_id || chr(10) || text || chr(10) ||
            'tail ' || doc_id END AS text,
  CASE WHEN doc_id % 7 = 0
       THEN 'not a PDF: encrypted (unsupported)'
       ELSE NULL END AS error
FROM documents
"""

# Sitemap frontier (r11): per DISTINCT domain, urlset entries /s/1..3
# (with lastmod) + the &-entity query URL (no lastmod) are uncaptured;
# /s/0 is captured; len%3=0 domains add /extra via the sitemapindex
# hop. Canonical anti keys on the URL.
ORACLES["sitemap_frontier"] = """
WITH doms AS (SELECT DISTINCT source AS s FROM documents),
fr AS (
  SELECT s || '.example.org' AS domain,
    'https://' || s || '.example.org/s/' || k AS url,
    '2026-0' || (k + 1) || '-01' AS lastmod
  FROM doms, LATERAL (SELECT unnest(generate_series(1, 3)) AS k) g
  UNION ALL
  SELECT s || '.example.org',
    'https://' || s || '.example.org/q?a=1&b=2', NULL
  FROM doms
  UNION ALL
  SELECT s || '.example.org',
    'https://' || s || '.example.org/extra', NULL
  FROM doms WHERE length(s) % 3 = 0
)
SELECT domain, url, lastmod FROM fr
"""

# Anchor-text aggregation (r11): per canonical target, ref counts and
# the sorted distinct cleaned anchors ('R&D note k' with the entity
# decoded and the nested <b> stripped; 'local j').
ORACLES["warc_anchor_text"] = """
WITH links AS (
  SELECT 'https://t' || (doc_id % 7) || '.example.net/page' AS url,
         'R&D note ' || (doc_id % 5) AS anchor
  FROM documents
  UNION ALL
  SELECT 'https://' || source || '.example.org/go/' || (doc_id % 3),
         'local ' || (doc_id % 3)
  FROM documents
)
SELECT url, CAST(count(*) AS BIGINT) AS n_refs,
  string_agg(DISTINCT anchor, ' | ' ORDER BY anchor) AS anchors
FROM links GROUP BY url
"""

# Harmonic centrality (r11): unrolled 3-hop BFS over the closed-form
# 9-node functional graph (i -> 2i mod 9 sans self, i -> i+3 mod 9);
# H(v) = sum 1/d over pairs within 3 hops.
ORACLES["link_harmonic"] = """
WITH base AS (SELECT unnest(generate_series(0, 8)) AS i),
edges AS MATERIALIZED (
  SELECT 'n' || i || '.example.net' AS src,
         'n' || ((2 * i) % 9) || '.example.net' AS dst
  FROM base WHERE i <> (2 * i) % 9
  UNION
  SELECT 'n' || i || '.example.net',
         'n' || ((i + 3) % 9) || '.example.net'
  FROM base
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
d1 AS MATERIALIZED (SELECT src, dst, 1 AS d FROM edges),
e2 AS (
  SELECT p.src, e.dst, 2 AS d
  FROM d1 p JOIN edges e ON e.src = p.dst
  WHERE p.src <> e.dst
),
d2 AS MATERIALIZED (
  SELECT src, dst, min(d) AS d
  FROM (SELECT * FROM d1 UNION ALL SELECT * FROM e2)
  GROUP BY src, dst
),
e3 AS (
  SELECT p.src, e.dst, 3 AS d
  FROM (SELECT * FROM d2 WHERE d = 2) p
  JOIN edges e ON e.src = p.dst
  WHERE p.src <> e.dst
),
d3 AS MATERIALIZED (
  SELECT src, dst, min(d) AS d
  FROM (SELECT * FROM d2 UNION ALL SELECT * FROM e3)
  GROUP BY src, dst
),
h AS (
  SELECT dst, sum(CAST(1.0 AS DOUBLE) / d) AS harmonic
  FROM d3 GROUP BY dst
)
SELECT n.node, round(coalesce(h.harmonic, 0.0), 6) AS harmonic
FROM nodes n LEFT JOIN h ON h.dst = n.node
"""


def _unigram_oracle(
    final: str,
    rounds: int = 2,
    vocab_size: int = 64,
    maxp: int = 4,
    maxw: int = 10,
) -> str:
    """Replay the unigram-LM trainer end to end (r11): substring
    seeding, then per EM round the forward Viterbi DP unrolled as one
    CTE per word position (each candidate is ONE multiply of a prior
    score by an exact integer-ratio probability — bit-identical to
    the Spark fold), the argmax choice table (row_number ties to the
    smallest split point = longest piece), the backtrack as a
    recursive CTE walking choices from length(word) to 0, and the
    smoothed M-step. ``maxw`` bounds the unroll at the corpus's max
    word length."""
    pre = f"""
WITH RECURSIVE toks AS MATERIALIZED (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(trim(text)), '\\s+'),
    x -> length(x) > 0)) AS word
  FROM documents
),
wrds AS MATERIALIZED (
  SELECT word, count(*) AS freq FROM toks GROUP BY word
),
subc AS MATERIALIZED (
  SELECT substr(w.word, CAST(i AS INTEGER), CAST(l AS INTEGER))
    AS piece, sum(w.freq) AS cnt
  FROM wrds w,
    LATERAL (SELECT unnest(generate_series(1, length(w.word))) AS i) a,
    LATERAL (SELECT unnest(generate_series(
      1, least({maxp}, length(w.word) - i + 1))) AS l) b
  GROUP BY piece
),
topn AS (
  SELECT piece, cnt FROM subc
  ORDER BY cnt DESC, piece ASC LIMIT {vocab_size}
),
chosen AS MATERIALIZED (
  SELECT piece, max(cnt) AS cnt FROM (
    SELECT * FROM topn
    UNION ALL SELECT piece, cnt FROM subc WHERE length(piece) = 1
  ) GROUP BY piece
),
v0 AS MATERIALIZED (
  SELECT piece, CAST(cnt AS DOUBLE) /
    (SELECT CAST(sum(cnt) AS DOUBLE) FROM chosen) AS p
  FROM chosen
)"""
    parts = [pre]
    for r in range(1, rounds + 2):  # last pass: segmentation only
        pv = f"v{r - 1}"
        parts.append(f""",
s{r}_0 AS (SELECT word, CAST(1.0 AS DOUBLE) AS sc FROM wrds)""")
        for i in range(1, maxw + 1):
            branches = []
            for j in range(max(0, i - maxp), i):
                branches.append(f"""
    SELECT w.word, {i} AS pos, {j} AS j,
      substr(w.word, {j + 1}, {i - j}) AS piece,
      s.sc * v.p AS cand
    FROM wrds w
    JOIN s{r}_{j} s ON s.word = w.word
    JOIN {pv} v ON v.piece = substr(w.word, {j + 1}, {i - j})
    WHERE length(w.word) >= {i}""")
            parts.append(f""",
cands{r}_{i} AS MATERIALIZED ({' UNION ALL '.join(branches)}
),
s{r}_{i} AS MATERIALIZED (
  SELECT word, max(cand) AS sc FROM cands{r}_{i} GROUP BY word
)""")
        allc = " UNION ALL ".join(
            f"SELECT * FROM cands{r}_{i}" for i in range(1, maxw + 1)
        )
        alls = " UNION ALL ".join(
            f"SELECT word, {i} AS pos, sc FROM s{r}_{i}"
            for i in range(1, maxw + 1)
        )
        parts.append(f""",
allc{r} AS MATERIALIZED ({allc}),
alls{r} AS MATERIALIZED ({alls}),
choice{r} AS MATERIALIZED (
  SELECT word, pos, j, piece FROM (
    SELECT c.word, c.pos, c.j, c.piece,
      row_number() OVER (
        PARTITION BY c.word, c.pos ORDER BY c.j) AS rn
    FROM allc{r} c
    JOIN alls{r} t
      ON t.word = c.word AND t.pos = c.pos AND c.cand = t.sc
  ) WHERE rn = 1
),
bt{r} AS (
  SELECT word, length(word) AS pos FROM wrds
  UNION ALL
  SELECT c.word, c.j FROM bt{r} b
  JOIN choice{r} c ON c.word = b.word AND c.pos = b.pos
  WHERE b.pos > 0
),
used{r} AS MATERIALIZED (
  SELECT c.piece, w.freq FROM bt{r} b
  JOIN choice{r} c ON c.word = b.word AND c.pos = b.pos
  JOIN wrds w ON w.word = b.word
)""")
        if r <= rounds:
            parts.append(f""",
cnt{r} AS MATERIALIZED (
  SELECT piece, sum(freq) AS c FROM used{r} GROUP BY piece
),
tot{r} AS (
  SELECT CAST(sum(c) AS DOUBLE) +
    (SELECT count(*) FROM {pv} WHERE length(piece) = 1) AS t
  FROM cnt{r}
),
v{r} AS MATERIALIZED (
  SELECT v.piece,
    CASE WHEN length(v.piece) = 1
      THEN (coalesce(c.c, 0) + 1) / (SELECT t FROM tot{r})
      ELSE c.c / (SELECT t FROM tot{r}) END AS p
  FROM {pv} v LEFT JOIN cnt{r} c USING (piece)
  WHERE length(v.piece) = 1 OR coalesce(c.c, 0) > 0
)""")
    fr = rounds + 1
    parts.append(f""",
npieces AS MATERIALIZED (
  SELECT b.word, count(*) AS n
  FROM bt{fr} b
  JOIN choice{fr} c ON c.word = b.word AND c.pos = b.pos
  GROUP BY b.word
)
{final}""")
    return "".join(parts)


ORACLES["unigram_train_vocab"] = _unigram_oracle(
    f"SELECT piece, round(p, 9) AS p FROM v2"
)
ORACLES["unigram_token_counts"] = _unigram_oracle(
    "SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words, "
    "CAST(sum(np.n) AS BIGINT) AS n_tokens "
    "FROM toks t JOIN npieces np USING (word) GROUP BY t.doc_id"
)


def _harmonic_hll_oracle() -> str:
    """Replay HyperBall over the 9-node closed-form graph: per-hop
    register unions (groupBy-max over the sparse (node, idx, rho)
    rows) + the deterministic HLL estimator (vocab-sketch math), and
    the exact 3-hop BFS beside it."""
    p = 12
    m = 1 << p
    num = repr((0.7213 / (1.0 + 1.079 / m)) * m * m * float(1 << 61))
    two61 = repr(float(1 << 61))
    parts = ["""
WITH base AS (SELECT unnest(generate_series(0, 8)) AS i),
edges AS MATERIALIZED (
  SELECT 'n' || i || '.example.net' AS src,
         'n' || ((2 * i) % 9) || '.example.net' AS dst
  FROM base WHERE i <> (2 * i) % 9
  UNION
  SELECT 'n' || i || '.example.net',
         'n' || ((i + 3) % 9) || '.example.net'
  FROM base
),
nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges),
d1 AS MATERIALIZED (SELECT src, dst, 1 AS d FROM edges),
e2x AS (
  SELECT p.src, e.dst, 2 AS d
  FROM d1 p JOIN edges e ON e.src = p.dst WHERE p.src <> e.dst
),
d2 AS MATERIALIZED (
  SELECT src, dst, min(d) AS d
  FROM (SELECT * FROM d1 UNION ALL SELECT * FROM e2x)
  GROUP BY src, dst
),
e3x AS (
  SELECT p.src, e.dst, 3 AS d
  FROM (SELECT * FROM d2 WHERE d = 2) p
  JOIN edges e ON e.src = p.dst WHERE p.src <> e.dst
),
d3 AS MATERIALIZED (
  SELECT src, dst, min(d) AS d
  FROM (SELECT * FROM d2 UNION ALL SELECT * FROM e3x)
  GROUP BY src, dst
),
hx AS (
  SELECT dst, sum(CAST(1.0 AS DOUBLE) / d) AS harmonic
  FROM d3 GROUP BY dst
),
b0 AS MATERIALIZED (
  SELECT node,
    ('0x' || substr(md5(node), 1, 3))::BIGINT AS idx,
    CASE WHEN ('0x' || substr(md5(node), 4, 15))::BIGINT = 0 THEN 61
      ELSE 61 - length(bin(('0x' || substr(md5(node), 4, 15))::BIGINT))
      END AS rho
  FROM nodes
)"""]
    for t in range(1, 4):
        parts.append(f""",
b{t} AS MATERIALIZED (
  SELECT node, idx, max(rho) AS rho FROM (
    SELECT * FROM b{t - 1}
    UNION ALL
    SELECT e.dst AS node, b.idx, b.rho
    FROM edges e JOIN b{t - 1} b ON b.node = e.src
  ) GROUP BY node, idx
)""")
    for t in range(0, 4):
        parts.append(f""",
e{t} AS MATERIALIZED (
  SELECT node,
    CASE WHEN ({num} / total) <= {2.5 * m!r} AND zeros > 0
      THEN {float(m)!r} * ln({float(m)!r} / zeros)
      ELSE {num} / total END AS est
  FROM (
    SELECT node,
      CAST(sp AS DOUBLE) + ({m} - n_present)::DOUBLE * {two61} AS total,
      {m} - n_present AS zeros
    FROM (
      SELECT node, count(*) AS n_present,
        sum(((1::BIGINT) << (61 - rho))::DECIMAL(38,0)) AS sp
      FROM b{t} GROUP BY node
    )
  )
)""")
    parts.append("""
SELECT n.node,
  round(coalesce(hx.harmonic, 0.0), 6) AS harmonic,
  round((e1.est - e0.est) / 1.0 + (e2.est - e1.est) / 2.0
        + (e3.est - e2.est) / 3.0, 6) AS harmonic_est
FROM nodes n
LEFT JOIN hx ON hx.dst = n.node
JOIN e0 ON e0.node = n.node
JOIN e1 ON e1.node = n.node
JOIN e2 ON e2.node = n.node
JOIN e3 ON e3.node = n.node
""")
    return "".join(parts)


ORACLES["link_harmonic_hll"] = _harmonic_hll_oracle()

# WAT writer roundtrip (r11): the link fixture's resolved out-links
# with their anchor text survive the JSON envelope + metadata-record
# framing verbatim.
ORACLES["warc_wat_roundtrip"] = """
SELECT 'https://' || source || '.example.org/d/' || doc_id AS url,
       link, anchor
FROM (
  SELECT doc_id, source,
    'https://t' || (doc_id % 7) || '.example.net/page' AS link,
    'x' AS anchor
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://' || source || '.example.org/local/' || doc_id, 'l'
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://' || source || '.example.org/d/other/' || doc_id
      || '.html', 'r'
  FROM documents
  UNION ALL
  SELECT doc_id, source,
    'https://t' || ((doc_id + 1) % 7) || '.example.net/s', 'p'
  FROM documents WHERE doc_id % 2 = 0
)
"""

# URL policy normalization (r11): all three surface variants fold to
# the sorted-query tracking-stripped key.
ORACLES["url_policy_dedup"] = """
SELECT 'https://' || source || '.example.org/p/' || doc_id
  || '?a=1&b=2' AS url,
  CAST(3 AS BIGINT) AS n_variants
FROM documents
"""

# CID-font PDF extraction (r11): the ToUnicode CMap recovers the
# ASCII range plus the two bfchar specials, closed-form.
ORACLES["warc_pdf_cid_extract"] = """
SELECT doc_id AS media_id,
  'https://' || source || '.example.org/c' || doc_id || '.pdf' AS url,
  'doc ' || doc_id || ' é’' || chr(10) || text AS text
FROM documents
"""


# perceptual image hashing (r11): dHash/aHash recomputed closed-form
# from the BMP pixel rule (x*7 + y*13 + c*29) % 256 — gray is the
# integer channel sum, downsample is the bmp_resize nearest-neighbor
# index convention, bits are row-major Y*8+X. The engine must decode
# the REAL bytes (bottom-up rows, stride) to hit the same strings.


def _gray_expr(sx: str, sy: str) -> str:
    """Integer gray (B+G+R) at source pixel (sx, sy) under the 24-bit
    BMP closed form."""
    base = f"(({sx})*7 + ({sy})*13)"
    return (
        f"(({base}) % 256) + (({base} + 29) % 256) + "
        f"(({base} + 58) % 256)"
    )


def _phash_cte(src: str, idc: str) -> str:
    """dh/ah CTEs computing the 64-char dHash/aHash strings per row of
    ``src`` (needs columns ``{idc}, w, h``)."""
    g_cur = _gray_expr("(X.g*d.w)//9", "(Y.g*d.h)//8")
    g_nxt = _gray_expr("((X.g+1)*d.w)//9", "(Y.g*d.h)//8")
    g_a = _gray_expr("(X.g*d.w)//8", "(Y.g*d.h)//8")
    return f"""
dh AS MATERIALIZED (
  SELECT d.{idc},
    string_agg(CASE WHEN ({g_nxt}) > ({g_cur}) THEN '1' ELSE '0' END,
               '' ORDER BY Y.g*8 + X.g) AS dhash
  FROM {src} d,
    LATERAL (SELECT unnest(generate_series(0, 7)) AS g) X,
    LATERAL (SELECT unnest(generate_series(0, 7)) AS g) Y
  GROUP BY d.{idc}
),
ac AS MATERIALIZED (
  SELECT d.{idc}, Y.g*8 + X.g AS ord, {g_a} AS cell
  FROM {src} d,
    LATERAL (SELECT unnest(generate_series(0, 7)) AS g) X,
    LATERAL (SELECT unnest(generate_series(0, 7)) AS g) Y
),
ah AS MATERIALIZED (
  SELECT {idc}, string_agg(bit, '' ORDER BY ord) AS ahash FROM (
    SELECT {idc}, ord,
      CASE WHEN 64*cell > sum(cell) OVER (PARTITION BY {idc})
           THEN '1' ELSE '0' END AS bit
    FROM ac) t
  GROUP BY {idc}
)"""


ORACLES["image_perceptual_hash"] = f"""
WITH d AS MATERIALIZED (
  SELECT doc_id, (doc_id % 16) + 1 AS w, ((doc_id // 16) % 16) + 1 AS h
  FROM documents
),{_phash_cte('d', 'doc_id')}
SELECT d.doc_id AS media_id,
  CAST(d.w AS INTEGER) AS width, CAST(d.h AS INTEGER) AS height,
  dh.dhash, ah.ahash
FROM d JOIN dh ON dh.doc_id = d.doc_id JOIN ah ON ah.doc_id = d.doc_id
"""

# survivor contract: banding (4 bands / 64 bits) has full recall at
# hamming <= 3 by pigeonhole and the verify filter drops everything
# above, so the engine's pair set EQUALS the all-pairs-within-3
# relation — replayed here at GROUP granularity (97 distinct images):
# a doc survives iff it is the minimum id across its hash
# neighborhood's groups (width-1 gradient-free images collide by
# design, so neighborhoods span groups).
ORACLES["image_phash_dedup"] = f"""
WITH grp AS MATERIALIZED (SELECT DISTINCT doc_id % 97 AS g FROM documents),
d AS MATERIALIZED (
  SELECT g, (g % 16) + 1 AS w, ((g // 16) % 16) + 1 AS h FROM grp
),{_phash_cte('d', 'g')}
, near AS MATERIALIZED (
  SELECT a.g AS ga, b.g AS gb
  FROM dh a JOIN dh b ON hamming(a.dhash, b.dhash) <= 3
),
gm AS MATERIALIZED (
  SELECT doc_id % 97 AS g, min(doc_id) AS mn FROM documents GROUP BY 1
),
thr AS MATERIALIZED (
  SELECT near.ga AS g, min(gm.mn) AS mn
  FROM near JOIN gm ON gm.g = near.gb GROUP BY near.ga
)
SELECT doc_id FROM documents
JOIN thr ON thr.g = doc_id % 97
WHERE doc_id = thr.mn
"""


# audio spectral fingerprint (r11): integer samples reconstructed from
# the two-tone floor rule, naive DFT per bin, (AMP*N/2)^2
# normalization, 3 dp rounding BEFORE the gradient compare — the
# rounding absorbs libm/summation-order noise so both engines emit
# identical bit strings.
ORACLES["audio_fingerprint"] = """
WITH d AS MATERIALIZED (
  SELECT doc_id, CAST(doc_id % 29 AS INTEGER) AS g FROM documents
),
sm AS MATERIALIZED (
  SELECT d.doc_id, t.g AS t, j.g AS j,
    floor(8192*sin(2*pi()*(1 + (d.g + t.g) % 16)*j.g/64) + 0.5)
    + floor(8192*sin(2*pi()*(1 + (d.g//2 + 2*t.g) % 16)*j.g/64) + 0.5)
      AS x
  FROM d,
    LATERAL (SELECT unnest(generate_series(0, 3)) AS g) t,
    LATERAL (SELECT unnest(generate_series(0, 63)) AS g) j
),
en AS MATERIALIZED (
  SELECT doc_id, t, k.g AS k,
    round((pow(sum(x*cos(2*pi()*k.g*j/64)), 2)
           + pow(sum(x*sin(2*pi()*k.g*j/64)), 2)) / 68719476736.0, 3)
      AS e
  FROM sm, LATERAL (SELECT unnest(generate_series(1, 17)) AS g) k
  GROUP BY doc_id, t, k.g
),
bits AS MATERIALIZED (
  SELECT a.doc_id, a.t*16 + (a.k - 1) AS ord,
    CASE WHEN b.e > a.e THEN '1' ELSE '0' END AS bit
  FROM en a JOIN en b ON b.doc_id = a.doc_id AND b.t = a.t
                     AND b.k = a.k + 1
  WHERE a.k <= 16
)
SELECT doc_id AS media_id, CAST(256 AS BIGINT) AS n_samples,
  string_agg(bit, '' ORDER BY ord) AS afp
FROM bits GROUP BY doc_id
"""


# rel=nofollow hygiene (r11): counts recomputed closed-form from the
# synthesis rule — 1 followed + 1 nofollow always; every third page
# adds a rel="sponsored" link that must count as FOLLOWED
# (token-boundary rel matching).
ORACLES["warc_nofollow_links"] = """
SELECT 'https://' || source || '.example.org/' || doc_id AS url,
  CAST(2 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS n_links,
  CAST(1 AS BIGINT) AS n_nofollow,
  CAST(1 + CASE WHEN doc_id % 3 = 0 THEN 1 ELSE 0 END AS BIGINT)
    AS n_followed
FROM documents
"""
