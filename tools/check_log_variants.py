#!/usr/bin/env python3
"""Tolerance gate for the log-space estimator variants.

Usage: check_log_variants.py <verify_out_dir> <sf_dir>

The canonical DSIR (x82_importance_log, sum of log probability ratios)
and tf-idf (x83_tfidf_ln, tf * ln(N/df)) spellings CANNOT go through the
driver's bit-exact hash compare: ln is only faithfully rounded, so Spark
and DuckDB may legitimately differ in the last ulp. This tool runs the
DuckDB ln() restatement of each query and asserts per-row agreement to
|delta| < 1e-9 on the log-valued column, exact equality on every other
column — the verification VERDICT round 6 item 2 prescribes.
"""
import glob
import math
import sys

import duckdb

X82_SQL = """
WITH t AS (
  SELECT doc_id, lang, unnest(string_split(text, ' ')) AS tok FROM documents
), b AS (
  SELECT doc_id, lang,
         CAST(concat('0x', substr(md5(tok), 1, 4)) AS BIGINT) % 256 AS bkt
  FROM t
), src AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS src_n FROM b GROUP BY bkt
), tgt AS (
  SELECT bkt, CAST(count(*) AS BIGINT) AS tgt_n FROM b
  WHERE lang = 'en' GROUP BY bkt
), dist AS (
  SELECT src.bkt, src_n, coalesce(tgt_n, CAST(0 AS BIGINT)) AS tgt_n
  FROM src LEFT JOIN tgt ON src.bkt = tgt.bkt
), tot AS (
  SELECT sum(src_n) AS src_tot, sum(tgt_n) AS tgt_tot FROM dist
), lr AS (
  -- Laplace +1 over 256 buckets, exactly TextAnalysis.importanceWeightsLog
  SELECT bkt,
         ln(CAST(tgt_n + 1 AS DOUBLE) / CAST(tgt_tot + 256 AS DOUBLE))
           - ln(CAST(src_n + 1 AS DOUBLE) / CAST(src_tot + 256 AS DOUBLE))
           AS log_ratio
  FROM dist CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
       sum(log_ratio) AS log_weight
FROM b JOIN lr USING (bkt) GROUP BY doc_id ORDER BY doc_id
"""

X83_SQL = """
WITH t AS (
  SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
), tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
  FROM t GROUP BY doc_id, term
), df AS (
  SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY term
), nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_docs FROM documents
), s AS (
  SELECT doc_id, term, tf, df,
         CAST(tf AS DOUBLE) * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE))
           AS score,
         row_number() OVER (PARTITION BY doc_id
           ORDER BY CAST(tf AS DOUBLE)
                      * ln(CAST(n_docs AS DOUBLE) / CAST(df AS DOUBLE)) DESC,
                    term) AS rnk
  FROM tf JOIN df USING (term) CROSS JOIN nd
)
SELECT doc_id, term, tf, df, CAST(rnk AS BIGINT) AS rank, score
FROM s WHERE rnk <= 3 ORDER BY doc_id, rank
"""

# (query name, oracle sql, row-key columns, tolerance-compared column)
CHECKS = [
    ("x82_importance_log", X82_SQL, ["doc_id"], "log_weight"),
    ("x83_tfidf_ln", X83_SQL, ["doc_id", "rank"], "score"),
]

TOL = 1e-9


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    ok = True
    for name, sql, keys, tolcol in CHECKS:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            ok = False
            continue
        def by_key(rel):
            cols = rel.columns
            rows = {}
            for r in rel.fetchall():
                d = dict(zip(cols, r))
                rows[tuple(d[k] for k in keys)] = d
            return rows
        exp = by_key(con.sql(sql))
        got = by_key(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        if set(exp) != set(got):
            print(f"FAIL {name}: key sets differ "
                  f"({len(got)} spark vs {len(exp)} oracle rows)")
            ok = False
            continue
        worst = 0.0
        bad = None
        for k, e in exp.items():
            g = got[k]
            exact_cols = [c for c in e if c != tolcol]
            if any(g[c] != e[c] for c in exact_cols):
                bad = (k, g, e, "exact-column mismatch")
                break
            d = abs(g[tolcol] - e[tolcol])
            if math.isnan(d) or d >= TOL:
                bad = (k, g, e, f"|delta|={d}")
                break
            worst = max(worst, d)
        if bad:
            k, g, e, why = bad
            print(f"FAIL {name} @ {k}: {why}\n   spark : {g}\n   oracle: {e}")
            ok = False
        else:
            print(f"PASS {name} ({len(exp)} rows, worst |delta| = {worst:.3e})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
