"""Build stress variants of a testdata dir for adversarial gate runs.

Two transforms over an existing sf dir (both deterministic — md5-based
row selection, pure SQL rewrites; schemas/dtypes unchanged):

  nullboost — raise NULL rates in the contract-nullable columns
      (events.value/props ~13%, documents.text+n_chars ~8%). Round 7
      this caught asof_join resurrecting stale payloads through
      per-column last(ignorenulls).
  tieboost  — force heavy duplicate keys: events.ts truncated to the
      minute, values to 1 dp, every 10th document an exact text dup of
      its predecessor, order/lineitem prices quantized. A query whose
      window ORDER BY lacks a complete tiebreak diverges here (round 7:
      175/175 clean — the tiebreaks are complete).
  constboost — zero-variance groups: one event_type gets a constant
      value AND constant props.k; every 5th user's values are constant.
      Under ANSI, F.corr's internal division and any plain `/` by a
      data-dependent stddev CRASH on these where DuckDB returns NULL.
      Round 7 this forced the try_divide zscore, the decomposed
      pairwise-masked corr, and exposed that marginal-vs-pairwise
      moment row sets shift corr by 7e-3 relative on NULL-bearing
      groups.
  degenboost — degenerate payloads: every 17th embedding becomes the
      all-zero vector and every 23rd a constant vector (zero norms →
      0/0 in every cosine; Spark ANSI double division THROWS where
      DuckDB `/` returns NULL — one bad vector kills a 100 TB job);
      documents gain empty-string, whitespace-only, punctuation-only,
      and single-char texts (zero-token ratios).
  skewboost — Zipfian hot keys: ~1/3 of orders on one custkey, ~30%
      of lineitem on one partkey, ~1/3 of events on one user and ~25%
      of events compressed into a single hour, ~40% of documents on
      one source. Correct answers change but both engines must agree:
      this stresses order-sensitive float sums over huge groups,
      window tiebreaks over giant partitions, and the skew-join paths.
  tinyboost — fewer rows than the models assume: embeddings=5
      (< nlist/topk), documents=7, events=3, orders=5, lineitem=9,
      customer=2. Hunts driver-side fit crashes (.first() -> None,
      k-means with k > n, BPE with no pairs) — the empty-partition
      reality of 100 TB pipelines.
  jsonboost — hostile events.props JSON: truncated objects, non-JSON
      text, empty strings, bare scalars, wrong-case keys, string /
      float / bool / array / object / huge-number k values, quoted
      and space-padded numerics. DuckDB's json functions THROW on
      malformed input and Spark's ANSI CAST throws on non-numeric
      strings — a single bad payload kills the job on either engine
      unless every extraction goes through the validity-guarded
      contract. (Duplicate-key objects are deliberately excluded:
      dup-key JSON is parser-undefined — Spark from_json takes the
      LAST occurrence, DuckDB json_extract the FIRST — a real
      pipeline normalizes or quarantines them upstream.)
  eraboost — timestamp extremes: ~8% of events moved to 1969 (negative
      epoch micros — floor-vs-truncate division and pre-epoch
      date_trunc/week-boundary semantics), one row pinned to epoch 0
      exactly, ~6% to 2120 (far future); ~10% of orders to 1931/2097
      dates. Engines must agree on every temporal op's pre-epoch
      behavior.
  longboost — pathologically long documents (the single-huge-row
      reality of web-scale corpora). Doc classes by modulus, first
      match wins (fractions are approximate — the moduli overlap):
      ~0.01% repeated 200x (~100k chars — the row that breaks per-row
      buffers; exactly one doc at driver sf0.01's 500 docs, more at
      larger corpora), ~1% repeated 20x (10-40k chars of self-similar
      text — repetition scoring and shingle volume), ~1% turned into
      ONE 8000-char token with no whitespace (tokenizer/prefix-filter
      edge), ~1% into the same token repeated 4000 times (a Zipf-hot
      term with tf in the thousands — tf-idf/PMI/BPE count pressure),
      ~1% given a 5000-space tail (normalization). n_chars is
      recomputed so metadata stays consistent with the text.
  uniboost — exotic Unicode injected into document texts by doc_id
      class: astral-plane emoji (4-byte UTF-8), combining marks, NBSP
      and zero-width space, CJK, RTL Hebrew, Turkish dotted I /
      Greek sigma, precomposed-vs-decomposed accents. Hunts
      codepoint-vs-byte-vs-grapheme divergence through the shingle /
      fingerprint / regex / levenshtein paths (SCALING.md rule 3).

Usage:
    python tools/stress_testdata.py nullboost \
        /root/repo/.localdata/sf0.01 /tmp/nullboost/sf0.01
    SPARK_GRAFT_DATA_ROOT=/tmp/nullboost python tools/check_correctness.py
"""

from __future__ import annotations

import os
import shutil
import sys

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _copy_rest(src: str, dst: str, rewritten: set[str]) -> None:
    for t in TABLES:
        if t not in rewritten:
            shutil.copy(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")


def nullboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 1, 1)
                  IN ('0','1') THEN NULL ELSE value END AS value,
             CASE WHEN substr(md5(CAST(event_id AS VARCHAR)), 2, 1)
                  IN ('2','3') THEN NULL ELSE props END AS props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                  THEN NULL ELSE text END AS text,
             lang, source,
             CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) = '0'
                  THEN NULL ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet')
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    return {"events", "documents"}


def tieboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT event_id, date_trunc('minute', CAST(ts AS TIMESTAMP)) AS ts,
             user_id, event_type, round(value, 1) AS value, props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT d.doc_id,
             CASE WHEN d.doc_id % 10 = 1 AND prev.text IS NOT NULL
                  THEN prev.text ELSE d.text END AS text,
             d.lang, d.source,
             CASE WHEN d.doc_id % 10 = 1 AND prev.text IS NOT NULL
                  THEN prev.n_chars ELSE d.n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet') d
      LEFT JOIN read_parquet('{src}/documents.parquet') prev
        ON prev.doc_id = d.doc_id - 1
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT o_orderkey, o_custkey, o_orderstatus,
             round(o_totalprice / 100) * 100 AS o_totalprice,
             o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet')
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/lineitem.parquet')"
    ).fetchall()]
    sel = ", ".join(
        "round(l_extendedprice) AS l_extendedprice"
        if c == "l_extendedprice" else c
        for c in cols
    )
    con.sql(f"COPY (SELECT {sel} FROM read_parquet('{src}/lineitem.parquet'))"
            f" TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")
    return {"events", "documents", "orders", "lineitem"}


def constboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT event_id, ts, user_id, event_type,
             CASE WHEN event_type = 'view' THEN 42.0
                  WHEN user_id % 5 = 0 THEN 17.5
                  ELSE value END AS value,
             CASE WHEN event_type = 'view' THEN '{{"k": 7}}'
                  ELSE props END AS props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    return {"events"}


def degenboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT vec_id,
             CASE WHEN vec_id % 17 = 0
                  THEN list_transform(embedding, x -> CAST(0.0 AS FLOAT))
                  WHEN vec_id % 23 = 0
                  THEN list_transform(embedding, x -> CAST(0.25 AS FLOAT))
                  ELSE embedding END AS embedding,
             label
      FROM read_parquet('{src}/embeddings.parquet')
    ) TO '{dst}/embeddings.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE WHEN doc_id % 13 = 3 THEN ''
                  WHEN doc_id % 13 = 5 THEN '   '
                  WHEN doc_id % 13 = 7 THEN '?!,.;:!!'
                  WHEN doc_id % 13 = 9 THEN 'x'
                  ELSE text END AS text,
             lang, source,
             CASE WHEN doc_id % 13 = 3 THEN 0
                  WHEN doc_id % 13 = 5 THEN 3
                  WHEN doc_id % 13 = 7 THEN 8
                  WHEN doc_id % 13 = 9 THEN 1
                  ELSE n_chars END AS n_chars
      FROM read_parquet('{src}/documents.parquet')
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    return {"embeddings", "documents"}


def skewboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT o_orderkey,
             CASE WHEN o_orderkey % 3 = 0
                  THEN (SELECT min(o_custkey)
                        FROM read_parquet('{src}/orders.parquet'))
                  ELSE o_custkey END AS o_custkey,
             o_orderstatus, o_totalprice, o_orderdate, o_orderpriority
      FROM read_parquet('{src}/orders.parquet')
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    cols = [r[0] for r in con.sql(
        f"DESCRIBE SELECT * FROM read_parquet('{src}/lineitem.parquet')"
    ).fetchall()]
    sel = ", ".join(
        f"CASE WHEN l_orderkey % 10 < 3 THEN (SELECT min(l_partkey) "
        f"FROM read_parquet('{src}/lineitem.parquet')) "
        "ELSE l_partkey END AS l_partkey"
        if c == "l_partkey" else c
        for c in cols
    )
    con.sql(f"COPY (SELECT {sel} FROM read_parquet('{src}/lineitem.parquet'))"
            f" TO '{dst}/lineitem.parquet' (FORMAT PARQUET)")
    con.sql(f"""
    COPY (
      SELECT event_id,
             CASE WHEN event_id % 4 = 0
                  THEN (SELECT date_trunc('hour', min(ts))
                        FROM read_parquet('{src}/events.parquet'))
                       + INTERVAL (event_id % 3600) SECOND
                  ELSE ts END AS ts,
             CASE WHEN event_id % 3 = 0
                  THEN (SELECT min(user_id)
                        FROM read_parquet('{src}/events.parquet'))
                  ELSE user_id END AS user_id,
             event_type, value, props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT doc_id, text, lang,
             CASE WHEN doc_id % 5 < 2
                  THEN (SELECT min(source)
                        FROM read_parquet('{src}/documents.parquet'))
                  ELSE source END AS source,
             n_chars
      FROM read_parquet('{src}/documents.parquet')
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    return {"orders", "lineitem", "events", "documents"}


def tinyboost(con, src: str, dst: str) -> set[str]:
    """Fewer rows than the models/rankings assume: embeddings=5
    (< nlist=8 coarse cells, < topk=10, one ANN query + 4 corpus
    vectors), documents=7 (< BM25 topk 15, singleton vocab windows),
    events=3, orders=5 / lineitem=9 / customer=2 (joins mostly empty).
    At 100 TB an empty or near-empty date partition is ROUTINE — a
    driver-side fit (.first(), k-means with k > n, BPE with no pairs
    left) must degrade gracefully, never crash the job. Deterministic:
    lowest primary keys kept, so vec_id/doc_id 0 survive as the fixed
    ANN/IVF query ids."""
    keep = {
        "embeddings": ("vec_id", 5),
        "documents": ("doc_id", 7),
        "events": ("event_id", 3),
        "orders": ("o_orderkey", 5),
        "lineitem": ("l_orderkey, l_linenumber", 9),
        "customer": ("c_custkey", 2),
    }
    for t, (key, n) in keep.items():
        con.sql(
            f"COPY (SELECT * FROM read_parquet('{src}/{t}.parquet') "
            f"ORDER BY {key} LIMIT {n}) "
            f"TO '{dst}/{t}.parquet' (FORMAT PARQUET)"
        )
    return set(keep)


def uniboost(con, src: str, dst: str) -> set[str]:
    # Injected fragments, chosen to maximize codepoint/byte/grapheme
    # disagreement surface: each is inserted mid-text so tokenizers,
    # shinglers, and prefix filters all cross it.
    frags = {
        1: "\u00c5ngstr\u00f6m \u00dcn\u00efc\u00f8d\u00e9",
        2: "caf\u00e9\u00a0au\u00a0lait",
        3: "\u6f22\u5b57\u30c6\u30ad\u30b9\u30c8",
        4: "\U0001f680\U0001f525 rocket",
        5: "de\u0301clair e\u0301tude",
        6: "\u0130stanbul \u03a3\u039f\u03a6\u039f\u03a3",
        7: "\u05e9\u05dc\u05d5\u05dd \u05e2\u05d1\u05e8\u05d9\u05ea",
        8: "zero\u200bwidth\u200bgap",
    }
    cases = " ".join(
        f"WHEN doc_id % 11 = {k} THEN "
        f"concat(substr(text, 1, 12), ' {v} ', substr(text, 13))"
        for k, v in frags.items()
    )
    con.sql(f"""
    COPY (
      SELECT doc_id,
             CASE {cases} ELSE text END AS text,
             lang, source, n_chars
      FROM read_parquet('{src}/documents.parquet')
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    return {"documents"}


def eraboost(con, src: str, dst: str) -> set[str]:
    con.sql(f"""
    COPY (
      SELECT event_id,
             CASE WHEN event_id % 12 = 1
                  THEN TIMESTAMP '1969-07-20 20:17:40'
                       + INTERVAL (event_id % 86400) SECOND
                  WHEN event_id % 17 = 2
                  THEN TIMESTAMP '1970-01-01 00:00:00'
                  WHEN event_id % 16 = 3
                  THEN TIMESTAMP '2120-02-29 23:59:59'
                       - INTERVAL (event_id % 3600) SECOND
                  ELSE ts END AS ts,
             user_id, event_type, value, props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    con.sql(f"""
    COPY (
      SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
             CASE WHEN o_orderkey % 19 = 4 THEN DATE '1931-06-15'
                  WHEN o_orderkey % 23 = 5 THEN DATE '2097-12-31'
                  ELSE o_orderdate END AS o_orderdate,
             o_orderpriority
      FROM read_parquet('{src}/orders.parquet')
    ) TO '{dst}/orders.parquet' (FORMAT PARQUET)""")
    return {"events", "orders"}


def jsonboost(con, src: str, dst: str) -> set[str]:
    frags = [
        '{"k": 7',                        # truncated
        "not json at all",
        "",
        '{"k": "seven"}',
        '{"k": [1, 2]}',
        '{"k": {"a": 1}}',
        "[1, 2, 3]",                      # array root
        "7",                              # bare scalar
        "null",
        '{"K": 7}',                       # wrong-case key
        '{"k": 7.9}',
        '{"k": true}',
        '{"k": 1e3}',
        '{"k": "0x7"}',
        '{"k": "  -42  "}',
        '{"k": 99999999999999999999}',
        '{"k": null}',
        '{"k": "7"}',
        '{"k": "+7"}',
        '{"k": -0.5}',
    ]
    whens = " ".join(
        f"WHEN event_id % 41 = {i} THEN '{f.replace(chr(39), chr(39)*2)}'"
        for i, f in enumerate(frags)
    )
    con.sql(f"""
    COPY (
      SELECT event_id, ts, user_id, event_type, value,
             CASE {whens} ELSE props END AS props
      FROM read_parquet('{src}/events.parquet')
    ) TO '{dst}/events.parquet' (FORMAT PARQUET)""")
    return {"events"}


def longboost(con, src: str, dst: str) -> set[str]:
    # CASE order matters only for determinism of the transform itself
    # (first match wins); both engines then read the same parquet.
    con.sql(f"""
    COPY (
      WITH t AS (
        SELECT doc_id,
               CASE
                 WHEN doc_id % 9973 = 4 THEN repeat(text, 200)
                 WHEN doc_id % 97 = 0 THEN repeat(text, 20)
                 WHEN doc_id % 101 = 1 THEN repeat('loremipsum', 800)
                 WHEN doc_id % 103 = 2 THEN repeat('word ', 4000)
                 WHEN doc_id % 107 = 3 THEN text || repeat(' ', 5000)
                 ELSE text END AS text,
               lang, source
        FROM read_parquet('{src}/documents.parquet')
      )
      SELECT doc_id, text, lang, source, length(text) AS n_chars FROM t
    ) TO '{dst}/documents.parquet' (FORMAT PARQUET)""")
    return {"documents"}


def main() -> int:
    mode, src, dst = sys.argv[1], sys.argv[2], sys.argv[3]
    os.makedirs(dst, exist_ok=True)
    con = duckdb.connect()
    rewritten = {
        "nullboost": nullboost,
        "tieboost": tieboost,
        "constboost": constboost,
        "degenboost": degenboost,
        "skewboost": skewboost,
        "tinyboost": tinyboost,
        "uniboost": uniboost,
        "eraboost": eraboost,
        "jsonboost": jsonboost,
        "longboost": longboost,
    }[mode](con, src, dst)
    _copy_rest(src, dst, rewritten)
    print(f"{mode}: wrote {dst} (rewrote {sorted(rewritten)})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
