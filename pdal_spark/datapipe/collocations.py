"""PMI collocation mining (Church & Hanks 1990, "Word Association
Norms, Mutual Information, and Lexicography") — the corpus-wide
collocation dictionary, in the classic distributed "pairs" formulation
(Lin & Dyer 2010, *Data-Intensive Text Processing with MapReduce* §3.2).

For adjacent word pairs (w1, w2):

    PMI(w1, w2) = log2( (c(w1,w2) / M) / ((c(w1)/N) * (c(w2)/N)) )
                = log2( c(w1,w2) * N * N / (M * c(w1) * c(w2)) )

with N = total tokens, M = total adjacent pairs. High-PMI pairs are
multi-word expressions ("new york"); the table feeds tokenizer vocab
construction and phrase-aware dedup shingling upstream of training.

Plan shape at 100 TB:
  * two map-side-combinable exchanges over the exploded token stream
    (pair counts keyed (w1, w2), word counts keyed w) — open
    vocabulary, no collect, no broadcast of either count table;
  * N and M are read off the AGGREGATED tables (corpus-sized inputs
    are scanned exactly twice, never a third time) and attached as a
    one-row broadcast (BroadcastNestedLoopJoin of a single row — not
    a cartesian product);
  * unigram attach = two shuffle hash joins on the word key. The
    count tables are vocabulary-sized; AQE broadcasts them when they
    fit, and the min_count filter is applied BEFORE the joins so only
    surviving pairs shuffle.

Integer count columns (cnt_pair, cnt_w1, cnt_w2) bit-compare against
the DuckDB twin; pmi is a single log2 over an identically-associated
double product, rounded to 6 decimals (the repo's twin-comparison
contract for log-domain scores).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions


def pmi_collocations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_count: int = 2,
) -> DataFrame:
    """Collocation table (w1, w2, cnt_pair, cnt_w1, cnt_w2, pmi) over
    whitespace-adjacent word pairs with cnt_pair >= min_count.

    Pair (i, i+1) windows never cross document boundaries; a one-word
    document contributes tokens but no pairs.
    """
    if min_count < 1:
        raise ValueError("min_count must be >= 1")
    df = ensure_min_partitions(df)
    words = F.split(F.col(text_col), " ")

    tok = df.select(F.explode(words).alias("w"))
    uni = tok.groupBy("w").agg(F.count("*").alias("cnt_w"))

    # adjacent pairs: explode skips the NULL produced for 1-word docs
    # (F.sequence(1, 0) would generate a DESCENDING range, so the
    # size >= 2 guard is correctness, not just hygiene)
    pair_arr = F.when(
        F.size(words) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - 1),
            lambda i: F.struct(
                F.element_at(words, i).alias("w1"),
                F.element_at(words, i + 1).alias("w2"),
            ),
        ),
    )
    pairs = df.select(F.explode(pair_arr).alias("p")).select(
        F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2")
    )
    pc_all = pairs.groupBy("w1", "w2").agg(F.count("*").alias("cnt_pair"))

    # corpus scalars off the aggregated tables (cheap second pass over
    # vocabulary-sized data, zero extra passes over the corpus)
    totals = uni.agg(F.sum("cnt_w").alias("n_tok")).join(
        pc_all.agg(F.sum("cnt_pair").alias("n_pairs"))
    )

    # pair-table marginals for Dunning's G² (row = pairs starting with
    # w1, col = pairs ending with w2) — vocabulary-sized re-aggregations
    # of the ALREADY-AGGREGATED pair table, never a third corpus pass
    row = pc_all.groupBy("w1").agg(F.sum("cnt_pair").alias("row_w1"))
    col = pc_all.groupBy("w2").agg(F.sum("cnt_pair").alias("col_w2"))

    pc = pc_all.filter(F.col("cnt_pair") >= min_count)
    u1 = uni.select(F.col("w").alias("w1"), F.col("cnt_w").alias("cnt_w1"))
    u2 = uni.select(F.col("w").alias("w2"), F.col("cnt_w").alias("cnt_w2"))
    out = (
        pc.join(u1, "w1")
        .join(u2, "w2")
        .join(row, "w1")
        .join(col, "w2")
        .join(F.broadcast(totals))
    )

    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi = F.round(
        F.log2(
            (d("cnt_pair") * d("n_tok") * d("n_tok"))
            / (d("n_pairs") * d("cnt_w1") * d("cnt_w2"))
        ),
        6,
    )
    # Dunning (1993) log-likelihood ratio over the 2x2 pair contingency
    # table; 0*ln(0) terms drop via the k > 0 guard. Fixed 4-term sum
    # order + single ln per term = the same doubles on both engines.
    m = d("n_pairs")
    k11 = d("cnt_pair")
    k12 = d("row_w1") - k11
    k21 = d("col_w2") - k11
    k22 = m - d("row_w1") - d("col_w2") + k11
    r1, r2 = d("row_w1"), m - d("row_w1")
    c1, c2 = d("col_w2"), m - d("col_w2")

    def term(k, r, c):
        return F.when(k > 0, k * F.log(k * m / (r * c))).otherwise(F.lit(0.0))

    llr = F.round(
        2.0
        * (
            term(k11, r1, c1)
            + term(k12, r1, c2)
            + term(k21, r2, c1)
            + term(k22, r2, c2)
        ),
        6,
    )
    return out.select(
        "w1", "w2", "cnt_pair", "cnt_w1", "cnt_w2",
        pmi.alias("pmi"), llr.alias("llr"),
    )


def pmi_collocations_sql(
    table: str = "documents",
    text: str = "text",
    min_count: int = 2,
) -> str:
    """DuckDB twin: identical pair/token definitions, identical double
    association order inside the single log2. DuckDB range(1, n) is
    end-exclusive, so pair starts are 1..len-1 and one-word documents
    vanish — same contract as the size >= 2 guard engine-side."""
    return f"""
WITH tok AS (
  SELECT unnest(string_split({text}, ' ')) AS w FROM {table}
),
uni AS (SELECT w, count(*) AS cnt_w FROM tok GROUP BY w),
pr AS (
  SELECT ws[i] AS w1, ws[i + 1] AS w2
  FROM (
    SELECT ws, unnest(range(1, len(ws))) AS i
    FROM (SELECT string_split({text}, ' ') AS ws FROM {table})
  )
),
pc_all AS (SELECT w1, w2, count(*) AS cnt_pair FROM pr GROUP BY w1, w2),
rowm AS (SELECT w1, CAST(sum(cnt_pair) AS BIGINT) AS row_w1
         FROM pc_all GROUP BY w1),
colm AS (SELECT w2, CAST(sum(cnt_pair) AS BIGINT) AS col_w2
         FROM pc_all GROUP BY w2),
tot AS (
  SELECT (SELECT CAST(sum(cnt_w) AS BIGINT) FROM uni) AS n_tok,
         (SELECT CAST(sum(cnt_pair) AS BIGINT) FROM pc_all) AS n_pairs
),
j AS (
  SELECT pc_all.w1, pc_all.w2, cnt_pair,
         u1.cnt_w AS cnt_w1, u2.cnt_w AS cnt_w2,
         CAST(cnt_pair AS DOUBLE) AS k11,
         CAST(row_w1 AS DOUBLE) AS r1, CAST(col_w2 AS DOUBLE) AS c1,
         CAST(n_tok AS DOUBLE) AS n_tok_d,
         CAST(n_pairs AS DOUBLE) AS m
  FROM pc_all
  JOIN uni u1 ON pc_all.w1 = u1.w
  JOIN uni u2 ON pc_all.w2 = u2.w
  JOIN rowm ON pc_all.w1 = rowm.w1
  JOIN colm ON pc_all.w2 = colm.w2
  CROSS JOIN tot
  WHERE cnt_pair >= {int(min_count)}
)
SELECT w1, w2, cnt_pair, cnt_w1, cnt_w2,
       round(log2(
         (k11 * n_tok_d * n_tok_d)
         / (m * CAST(cnt_w1 AS DOUBLE) * CAST(cnt_w2 AS DOUBLE))
       ), 6) AS pmi,
       round(2.0 * (
         (CASE WHEN k11 > 0
               THEN k11 * ln(k11 * m / (r1 * c1)) ELSE 0.0 END)
         + (CASE WHEN r1 - k11 > 0
                 THEN (r1 - k11) * ln((r1 - k11) * m / (r1 * (m - c1)))
                 ELSE 0.0 END)
         + (CASE WHEN c1 - k11 > 0
                 THEN (c1 - k11) * ln((c1 - k11) * m / ((m - r1) * c1))
                 ELSE 0.0 END)
         + (CASE WHEN m - r1 - c1 + k11 > 0
                 THEN (m - r1 - c1 + k11)
                      * ln((m - r1 - c1 + k11) * m / ((m - r1) * (m - c1)))
                 ELSE 0.0 END)
       ), 6) AS llr
FROM j
""".strip()
