"""Clustering-agreement metrics — Adjusted Rand Index (Hubert &
Arabie 1985) between two labelings of the same items: THE standard
score for "do these two partitions agree beyond chance", used here to
compare dedup clusterings (minhash components vs SemDeDup), audit
whether sources are language-pure, or validate a cheap clustering
against an expensive one before switching.

Pair-counting form over the contingency table:

    index     = Σ_ij C(n_ij, 2)
    expected  = Σ_i C(a_i, 2) · Σ_j C(b_j, 2) / C(n, 2)
    max_index = ½ [Σ_i C(a_i, 2) + Σ_j C(b_j, 2)]
    ARI       = (index − expected) / (max_index − expected)

Distributed shape: one id-keyed equi-join aligns the labelings, one
(label_a, label_b) exchange builds the contingency table, and the
margins are re-aggregations of it (the corpus is scanned once per
side). Every C(x,2) = x·(x−1)/2 is exact BIGINT math (cell and margin
counts are < 2^31 here, so x·(x−1) fits); the three Σ terms are exact
integer sums — order-free — and only the final expected/ARI divisions
are doubles (products of Σ terms go through double to dodge the int64
n⁴ bound). Degenerate inputs (all pairs agree or single cluster both
sides) emit ARI = 1.0 via the max_index == expected guard.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _c2(col):
    return (col * (col - F.lit(1)) / F.lit(2)).cast("long")


def adjusted_rand(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> DataFrame:
    """One-row result: (n_items, n_clusters_a, n_clusters_b, ari).
    Items present in only one labeling are dropped (inner join — ARI
    is defined over the common item set)."""
    j = a.select(F.col(id_col), F.col(label_a).alias("_la")).join(
        b.select(F.col(id_col), F.col(label_b).alias("_lb")), id_col
    )
    cont = j.groupBy("_la", "_lb").agg(F.count("*").alias("nij"))
    cells = cont.agg(
        F.sum(_c2(F.col("nij"))).alias("s_idx"),
        F.sum("nij").alias("n"),
    )
    rows = (
        cont.groupBy("_la")
        .agg(F.sum("nij").alias("ai"))
        .agg(
            F.sum(_c2(F.col("ai"))).alias("s_a"),
            F.count("*").alias("ka"),
        )
    )
    cols = (
        cont.groupBy("_lb")
        .agg(F.sum("nij").alias("bj"))
        .agg(
            F.sum(_c2(F.col("bj"))).alias("s_b"),
            F.count("*").alias("kb"),
        )
    )
    one = cells.join(F.broadcast(rows)).join(F.broadcast(cols))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    c2n = _c2(F.col("n")).cast("double")
    expected = d("s_a") * d("s_b") / c2n
    max_idx = (d("s_a") + d("s_b")) / 2.0
    ari = F.when(
        max_idx == expected, F.lit(1.0)
    ).otherwise(F.round((d("s_idx") - expected) / (max_idx - expected), 6))
    return one.select(
        F.col("n").alias("n_items"),
        F.col("ka").alias("n_clusters_a"),
        F.col("kb").alias("n_clusters_b"),
        ari.alias("ari"),
    )


def adjusted_rand_sql(
    a_sql: str,
    b_sql: str,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> str:
    """DuckDB twin: identical contingency algebra and double sequence.
    a_sql/b_sql must yield (id_col, label_a) / (id_col, label_b)."""
    c2 = lambda x: f"CAST({x} * ({x} - 1) / 2 AS BIGINT)"  # noqa: E731
    return f"""
WITH j AS (
  SELECT a.{label_a} AS la, b.{label_b} AS lb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING ({id_col})
),
cont AS (SELECT la, lb, count(*) AS nij FROM j GROUP BY la, lb),
cells AS (
  SELECT CAST(sum({c2('nij')}) AS BIGINT) AS s_idx,
         CAST(sum(nij) AS BIGINT) AS n
  FROM cont
),
rows_m AS (
  SELECT CAST(sum({c2('ai')}) AS BIGINT) AS s_a,
         CAST(count(*) AS BIGINT) AS ka
  FROM (SELECT la, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY la)
),
cols_m AS (
  SELECT CAST(sum({c2('bj')}) AS BIGINT) AS s_b,
         CAST(count(*) AS BIGINT) AS kb
  FROM (SELECT lb, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY lb)
)
SELECT n AS n_items, ka AS n_clusters_a, kb AS n_clusters_b,
  CASE WHEN (CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
            = CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
              / CAST({c2('n')} AS DOUBLE)
       THEN 1.0
       ELSE round(
         (CAST(s_idx AS DOUBLE)
           - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
             / CAST({c2('n')} AS DOUBLE))
         / ((CAST(s_a AS DOUBLE) + CAST(s_b AS DOUBLE)) / 2.0
           - CAST(s_a AS DOUBLE) * CAST(s_b AS DOUBLE)
             / CAST({c2('n')} AS DOUBLE)), 6)
       END AS ari
FROM cells CROSS JOIN rows_m CROSS JOIN cols_m
""".strip()


def normalized_mutual_info(
    a: DataFrame,
    b: DataFrame,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> DataFrame:
    """Normalized Mutual Information (sqrt normalization, the
    scikit-learn default) — ARI's information-theoretic sibling:

        MI  = Σ_ij (n_ij/n) · ln(n_ij·n / (a_i·b_j))
        NMI = MI / sqrt(H_a · H_b),  H = Σ (m/n)·ln(n/m)

    Same contingency plan as adjusted_rand plus two label-keyed margin
    joins (vocabulary-sized). Hash-exactness: each cell's
    UN-normalized term n_ij·ln(n_ij·n/(a_i·b_j)) and each margin's
    m·ln(n/m) are quantized ONCE to integer nano-units (round(·1e9) —
    one libm call per cell), summed exactly as BIGINTs, and the /n
    normalizations + sqrt run once at the end. Degenerate single-
    cluster sides (H = 0) emit NMI = 1.0 when the partitions carry
    identical information (both entropies 0) else 0.0 — the sklearn
    convention."""
    j = a.select(F.col(id_col), F.col(label_a).alias("_la")).join(
        b.select(F.col(id_col), F.col(label_b).alias("_lb")), id_col
    )
    cont = j.groupBy("_la", "_lb").agg(F.count("*").alias("nij"))
    rows = cont.groupBy("_la").agg(F.sum("nij").alias("ai"))
    cols = cont.groupBy("_lb").agg(F.sum("nij").alias("bj"))
    n1 = cont.agg(F.sum("nij").alias("n"))
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    GIGA = 1_000_000_000.0
    cells = (
        cont.join(rows, "_la")
        .join(cols, "_lb")
        .join(F.broadcast(n1))
        .select(
            F.round(
                d("nij")
                * F.log(d("nij") * d("n") / (d("ai") * d("bj")))
                * GIGA
            )
            .cast("long")
            .alias("mi_mu")
        )
        .agg(F.sum("mi_mu").alias("s_mi"))
    )

    def _entropy(margin: DataFrame, mcol: str, out: str) -> DataFrame:
        return (
            margin.join(F.broadcast(n1))
            .select(
                F.round(
                    d(mcol) * F.log(d("n") / d(mcol)) * GIGA
                )
                .cast("long")
                .alias("h_mu")
            )
            .agg(F.sum("h_mu").alias(out))
        )

    ha = _entropy(rows, "ai", "s_ha")
    hb = _entropy(cols, "bj", "s_hb")
    one = (
        cells.join(F.broadcast(ha))
        .join(F.broadcast(hb))
        .join(F.broadcast(n1))
    )
    mi = d("s_mi") / GIGA / d("n")
    h_a = d("s_ha") / GIGA / d("n")
    h_b = d("s_hb") / GIGA / d("n")
    nmi = (
        F.when((F.col("s_ha") == 0) & (F.col("s_hb") == 0), F.lit(1.0))
        .when((F.col("s_ha") == 0) | (F.col("s_hb") == 0), F.lit(0.0))
        .otherwise(F.round(mi / F.sqrt(h_a * h_b), 6))
    )
    return one.select(
        F.col("n").alias("n_items"),
        F.round(mi, 6).alias("mi"),
        F.round(h_a, 6).alias("h_a"),
        F.round(h_b, 6).alias("h_b"),
        nmi.alias("nmi"),
    )


def normalized_mutual_info_sql(
    a_sql: str,
    b_sql: str,
    id_col: str = "doc_id",
    label_a: str = "label_a",
    label_b: str = "label_b",
) -> str:
    """DuckDB twin: identical nano-unit quantization and final double
    sequence."""
    return f"""
WITH j AS (
  SELECT a.{label_a} AS la, b.{label_b} AS lb
  FROM ({a_sql}) a JOIN ({b_sql}) b USING ({id_col})
),
cont AS (SELECT la, lb, count(*) AS nij FROM j GROUP BY la, lb),
rows_m AS (SELECT la, CAST(sum(nij) AS BIGINT) AS ai FROM cont GROUP BY la),
cols_m AS (SELECT lb, CAST(sum(nij) AS BIGINT) AS bj FROM cont GROUP BY lb),
n1 AS (SELECT CAST(sum(nij) AS BIGINT) AS n FROM cont),
mi AS (
  SELECT CAST(sum(CAST(round(
           CAST(nij AS DOUBLE)
           * ln(CAST(nij AS DOUBLE) * CAST(n AS DOUBLE)
                / (CAST(ai AS DOUBLE) * CAST(bj AS DOUBLE)))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS s_mi
  FROM cont JOIN rows_m USING (la) JOIN cols_m USING (lb) CROSS JOIN n1
),
ha AS (
  SELECT CAST(sum(CAST(round(
           CAST(ai AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(ai AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS s_ha
  FROM rows_m CROSS JOIN n1
),
hb AS (
  SELECT CAST(sum(CAST(round(
           CAST(bj AS DOUBLE) * ln(CAST(n AS DOUBLE) / CAST(bj AS DOUBLE))
           * 1000000000.0) AS BIGINT)) AS BIGINT) AS s_hb
  FROM cols_m CROSS JOIN n1
)
SELECT n AS n_items,
       round(CAST(s_mi AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6)
         AS mi,
       round(CAST(s_ha AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6)
         AS h_a,
       round(CAST(s_hb AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE), 6)
         AS h_b,
       CASE WHEN s_ha = 0 AND s_hb = 0 THEN 1.0
            WHEN s_ha = 0 OR s_hb = 0 THEN 0.0
            ELSE round(
              (CAST(s_mi AS DOUBLE) / 1000000000.0 / CAST(n AS DOUBLE))
              / sqrt((CAST(s_ha AS DOUBLE) / 1000000000.0
                        / CAST(n AS DOUBLE))
                     * (CAST(s_hb AS DOUBLE) / 1000000000.0
                          / CAST(n AS DOUBLE))), 6)
       END AS nmi
FROM mi CROSS JOIN ha CROSS JOIN hb CROSS JOIN n1
""".strip()


def cohens_kappa(
    a: DataFrame, b: DataFrame, id_col: str = "doc_id",
) -> DataFrame:
    """Cohen's kappa (Cohen 1960) between two labelers over the same
    items: chance-corrected agreement
    kappa = (p_o - p_e) / (1 - p_e) — the metric for "does the cheap
    quality classifier actually agree with the rule bundle beyond
    chance", where raw agreement is inflated by the majority class.

    Inputs: (id, label_a) and (id, label_b), any label domain. One id
    equi-join + one (label_a, label_b) contingency exchange; marginals
    re-aggregate from the contingency rows (never a second scan); all
    probabilities are exact BIGINT count ratios evaluated in one
    fixed-shape double expression — deterministic cross-engine.
    Returns one row: (n, p_observed, p_expected, kappa), 6 dp."""
    j = a.select(F.col(id_col).alias("id"), "label_a").join(
        b.select(F.col(id_col).alias("id"), "label_b"), "id"
    )
    cont = j.groupBy("label_a", "label_b").agg(
        F.count(F.lit(1)).alias("c")
    ).persist()
    n_row = cont.agg(F.sum("c").alias("n"))
    diag = cont.filter(F.col("label_a") == F.col("label_b")).agg(
        F.coalesce(F.sum("c"), F.lit(0)).alias("agree")
    )
    ra = cont.groupBy("label_a").agg(F.sum("c").alias("ca"))
    rb = cont.groupBy("label_b").agg(F.sum("c").alias("cb"))
    ee = (
        ra.join(rb, ra["label_a"] == rb["label_b"])
        .agg(F.coalesce(F.sum(F.col("ca") * F.col("cb")), F.lit(0))
             .alias("e_sum"))
    )
    out = n_row.crossJoin(diag).crossJoin(ee)
    n = F.col("n").cast("double")
    po = F.col("agree").cast("double") / n
    pe = F.col("e_sum").cast("double") / (n * n)
    kappa = F.when(pe < 1.0, (po - pe) / (1.0 - pe)).otherwise(F.lit(1.0))
    return out.select(
        F.col("n").cast("long").alias("n"),
        F.round(po, 6).alias("p_observed"),
        F.round(pe, 6).alias("p_expected"),
        F.round(kappa, 6).alias("kappa"),
    )


def cohens_kappa_sql(a_sql: str, b_sql: str, id_col: str = "doc_id") -> str:
    """DuckDB twin of cohens_kappa (same contingency formulation)."""
    return f"""
      WITH j AS (
        SELECT a.label_a, b.label_b
        FROM ({a_sql}) a JOIN ({b_sql}) b ON a.{id_col} = b.{id_col}
      ),
      cont AS (
        SELECT label_a, label_b, count(*) AS c FROM j GROUP BY 1, 2
      ),
      n AS (SELECT CAST(sum(c) AS BIGINT) AS n FROM cont),
      diag AS (
        SELECT coalesce(sum(c), 0) AS agree FROM cont
        WHERE label_a = label_b
      ),
      ra AS (SELECT label_a, sum(c) AS ca FROM cont GROUP BY 1),
      rb AS (SELECT label_b, sum(c) AS cb FROM cont GROUP BY 1),
      ee AS (
        SELECT coalesce(sum(ca * cb), 0) AS e_sum
        FROM ra JOIN rb ON ra.label_a = rb.label_b
      )
      SELECT n.n AS n,
             round(CAST(agree AS DOUBLE) / n.n, 6) AS p_observed,
             round(CAST(e_sum AS DOUBLE)
                   / (CAST(n.n AS DOUBLE) * n.n), 6) AS p_expected,
             round(CASE WHEN CAST(e_sum AS DOUBLE)
                             / (CAST(n.n AS DOUBLE) * n.n) < 1.0
                   THEN (CAST(agree AS DOUBLE) / n.n
                         - CAST(e_sum AS DOUBLE)
                           / (CAST(n.n AS DOUBLE) * n.n))
                        / (1.0 - CAST(e_sum AS DOUBLE)
                           / (CAST(n.n AS DOUBLE) * n.n))
                   ELSE 1.0 END, 6) AS kappa
      FROM n, diag, ee
    """
