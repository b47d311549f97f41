#!/usr/bin/env python3
"""Tolerance gate for the log-space estimator variants.

Usage: check_log_variants.py <verify_out_dir> <sf_dir>

The canonical DSIR (x82_importance_log, sum of log probability ratios)
and tf-idf (x83_tfidf_ln, tf * ln(N/df)) spellings CANNOT go through the
driver's bit-exact hash compare: ln is only faithfully rounded, so Spark
and DuckDB may legitimately differ in the last ulp. This tool runs the
DuckDB ln() restatement of each query and asserts per-row agreement on
the log-valued column, exact equality on every other column.

Tolerance model (not a bare absolute epsilon):
  - x82's log_weight is a SUM of per-token log ratios, and summation
    order differs between Spark's partial aggregation and DuckDB's
    sequential scan. The order-dependent rounding error grows with both
    the token count and the magnitude of intermediate partial sums, so
    the bound scales as TOL * max(1, |value|, n_tokens) per row.
  - x83's top-k is rank-keyed, and ranks are decided by comparing
    ln-valued scores: two near-tied terms can legitimately order A,B in
    one engine and B,A in the other (or swap a different term in at the
    rank-k cutoff). Rows are therefore matched per (doc, term); a term
    present on only one side is accepted iff its score is within
    tolerance of the OTHER side's cutoff (k-th) score — i.e. the
    disagreement is an ulp-level tie, not a wrong answer.
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

TOL = 1e-9


def rows_of(rel):
    cols = rel.columns
    return [dict(zip(cols, r)) for r in rel.fetchall()]


def scale_of(row, value):
    return max(1.0, abs(value), float(row.get("n_tokens", 1)))


def check_x82(exp, got):
    """Keyed by doc_id; log_weight within the order-scaled tolerance."""
    e_by = {r["doc_id"]: r for r in exp}
    g_by = {r["doc_id"]: r for r in got}
    if set(e_by) != set(g_by):
        return None, f"key sets differ ({len(g_by)} spark vs {len(e_by)} oracle rows)"
    worst = 0.0
    for k, e in e_by.items():
        g = g_by[k]
        if any(g[c] != e[c] for c in e if c != "log_weight"):
            return None, f"@ {k}: exact-column mismatch\n   spark : {g}\n   oracle: {e}"
        d = abs(g["log_weight"] - e["log_weight"])
        if math.isnan(d) or d >= TOL * scale_of(e, e["log_weight"]):
            return None, f"@ {k}: |delta|={d}\n   spark : {g}\n   oracle: {e}"
        worst = max(worst, d)
    return worst, None


def check_x83(exp, got):
    """Per-doc top-k matched by term (ranks are ln-derived and may swap
    at ulp-level ties); a term on only one side must sit within
    tolerance of the other side's rank-k cutoff score."""
    def by_doc(rows):
        d = {}
        for r in rows:
            d.setdefault(r["doc_id"], []).append(r)
        return d
    e_docs, g_docs = by_doc(exp), by_doc(got)
    if set(e_docs) != set(g_docs):
        return None, (f"doc sets differ ({len(g_docs)} spark vs "
                      f"{len(e_docs)} oracle docs)")
    worst = 0.0
    for doc, e_rows in e_docs.items():
        g_rows = g_docs[doc]
        e_by_t = {r["term"]: r for r in e_rows}
        g_by_t = {r["term"]: r for r in g_rows}
        for t in set(e_by_t) & set(g_by_t):
            e, g = e_by_t[t], g_by_t[t]
            # rank may differ only between tolerance-tied rows, which the
            # cutoff rule below already polices — compare tf/df exactly,
            # score within tolerance
            if (g["tf"], g["df"]) != (e["tf"], e["df"]):
                return None, (f"@ doc {doc} term {t!r}: tf/df mismatch\n"
                              f"   spark : {g}\n   oracle: {e}")
            d = abs(g["score"] - e["score"])
            if math.isnan(d) or d >= TOL * scale_of(e, e["score"]):
                return None, (f"@ doc {doc} term {t!r}: |delta|={d}\n"
                              f"   spark : {g}\n   oracle: {e}")
            worst = max(worst, d)
        e_cut = min(r["score"] for r in e_rows)
        g_cut = min(r["score"] for r in g_rows)
        for t in set(e_by_t) - set(g_by_t):
            d = abs(e_by_t[t]["score"] - g_cut)
            if d >= TOL * scale_of(e_by_t[t], g_cut):
                return None, (f"@ doc {doc}: oracle term {t!r} missing from "
                              f"spark and not a cutoff tie (|delta|={d})")
        for t in set(g_by_t) - set(e_by_t):
            d = abs(g_by_t[t]["score"] - e_cut)
            if d >= TOL * scale_of(g_by_t[t], e_cut):
                return None, (f"@ doc {doc}: spark term {t!r} missing from "
                              f"oracle and not a cutoff tie (|delta|={d})")
    return worst, None


CHECKS = [
    ("x82_importance_log", X82_SQL, check_x82),
    ("x83_tfidf_ln", X83_SQL, check_x83),
]


def main():
    out, sf = sys.argv[1], sys.argv[2]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS "
            f"SELECT * FROM read_parquet('{sf}/documents.parquet')")
    ok = True
    for name, sql, compare in CHECKS:
        files = glob.glob(f"{out}/{name}/*.parquet")
        if not files:
            print(f"FAIL {name}: no spark output")
            ok = False
            continue
        exp = rows_of(con.sql(sql))
        got = rows_of(con.sql(f"SELECT * FROM read_parquet({files!r})"))
        worst, err = compare(exp, got)
        if err:
            print(f"FAIL {name} {err}")
            ok = False
        else:
            print(f"PASS {name} ({len(exp)} rows, worst |delta| = {worst:.3e})")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
