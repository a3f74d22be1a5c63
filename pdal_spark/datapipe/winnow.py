"""Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
SIGMOD 2003, "Winnowing: Local Algorithms for Document Fingerprinting"
— the MOSS algorithm) and fingerprint-overlap near-dup pairs.

Per document: hash every character k-gram, slide a window of w
consecutive hashes, and in each window select the MINIMUM hash,
breaking ties by the RIGHTMOST position (the paper's rule — it makes
the selection a function of local context only). The selected (pos,
hash) set is the fingerprint sketch, with guaranteed density 2/(w+1)
in expectation and the guarantee that any shared substring of length
>= w + k - 1 produces at least one shared fingerprint.

Spark shape: fingerprint extraction is MAP-ONLY (pure higher-order
array expressions — transform/slice/array_min/filter — no UDF, no
shuffle); documents shorter than k + w - 1 chars yield no full window
and produce no fingerprints (the paper's guarantee floor). The
window-min is recomputed per candidate position (O(n·w²) character
compares per doc, w is small) — the cost of staying in whole-stage
codegen instead of a Python kernel.

Pair generation is the standard inverted-index shape: one exchange on
the fingerprint value, a document-frequency cap (max_df) drops
ubiquitous fingerprints (boilerplate k-grams) BEFORE the self-join —
the same hot-key guard as the Jaccard prefix filter — then one pair
exchange counts shared fingerprints.

Hashes are the repo's exact-integer family (60-bit md5-prefix), so the
DuckDB twin replays every hash, window minimum, and tie bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pdal_spark.session import ensure_min_partitions


def _gram_hash(t: Column, i: Column, k: int, mode: str = "md5") -> Column:
    """Key of the char k-gram of t starting at i (1-based).

    mode="md5": 60-bit md5-prefix (the bloom/frequency content-key
    family) — DuckDB-replayable, the oracle mode. mode="xx": xxhash64
    masked non-negative — the open-vocabulary option (one long out, no
    hex string/conv per gram); no DuckDB twin, same winnowing
    guarantees (they hold for any hash). Measured at sf0.1×40 on
    local[16]: xx ≈ md5 throughput (2128 vs 2076 docs/s) — the
    higher-order window machinery, not the hash, dominates
    (BENCH/BASELINE.md §7)."""
    g = t.substr(i, F.lit(k))
    if mode == "xx":
        return F.xxhash64(g).bitwiseAND(F.lit((1 << 60) - 1))
    return F.conv(
        F.substring(F.md5(g.cast("binary")), 1, 15), 16, 10
    ).cast("long")


def _runs_positions(hsc, n, w: int):
    """Selected positions by the run-length characterization: p is the
    rightmost minimum of SOME window iff a window start j exists with
      max(1, p − L(p)) ≤ j ≤ min(n − w + 1, p + R(p) − w + 1)
    where L(p) = consecutive predecessors with h ≥ h[p] (capped at
    w−1) and R(p) = consecutive successors with h > h[p] (capped at
    w−1; a run reaching the array end behaves as unbounded because the
    j-range clamp already enforces j + w − 1 ≤ n). O(n·w) total work
    vs the direct form's O(n·w²) — and no per-window slice
    allocation."""
    def run(p, left: bool):
        hp = F.element_at(hsc, p)
        limit = F.least(F.lit(w - 1), (p - 1) if left else (n - p))
        offs = F.filter(
            F.sequence(F.lit(1), F.lit(w - 1)), lambda t: t <= limit
        )
        def step(acc, t):
            q = F.element_at(hsc, (p - t) if left else (p + t))
            ok = acc["alive"] & ((q >= hp) if left else (q > hp))
            return F.struct(
                F.when(ok, acc["cnt"] + 1).otherwise(acc["cnt"]).alias(
                    "cnt"
                ),
                ok.alias("alive"),
            )
        return F.aggregate(
            offs,
            F.struct(F.lit(0).alias("cnt"), F.lit(True).alias("alive")),
            step,
        )["cnt"]

    def selected(p):
        lo = F.greatest(F.lit(1), p - run(p, True))
        hi = F.least(n - (w - 1), p + run(p, False) - (w - 1))
        return lo <= hi

    return F.filter(F.sequence(F.lit(1), n), selected)


def winnow_fingerprints(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    hash_mode: str = "md5",
    impl: str = "runs",
) -> DataFrame:
    """(id, pos, fp) fingerprint table: pos = 1-based k-gram start of
    each winnowing-selected hash. Map-only; no shuffle. hash_mode:
    "md5" (oracle-replayable) or "xx" (allocation-light — see
    _gram_hash). impl: "runs" (default) = the run-length
    characterization, O(n·w) and measured 3.7x faster than the paper's
    per-window form (82s -> 22s on sf0.1x40 at local[16]); "classic" =
    the literal per-window rightmost-min, kept as the
    semantics-defining twin (set equality pinned across window sizes
    and adversarial ties in tests)."""
    if k < 1 or w < 1:
        raise ValueError("k and w must be >= 1")
    if impl not in ("classic", "runs"):
        raise ValueError("impl must be 'classic' or 'runs'")
    df = ensure_min_partitions(df)
    t = F.col(text_col)
    n_grams = F.length(t) - (k - 1)
    hs = F.when(
        n_grams >= 1,
        F.transform(
            F.sequence(F.lit(1), n_grams),
            lambda i: _gram_hash(t, i, k, hash_mode),
        ),
    )
    step = df.select(F.col(id_col), hs.alias("hs"))
    hsc = F.col("hs")
    n = F.size(hsc)
    n_win = n - (w - 1)
    if impl == "runs" and w > 1:
        sel = F.when(n_win >= 1, _runs_positions(hsc, n, w))
    elif impl == "runs":  # w == 1: every gram is selected
        sel = F.when(n_win >= 1, F.sequence(F.lit(1), n))
    else:
        # rightmost position of the window minimum (winnowing tie rule)
        sel = F.when(
            n_win >= 1,
            F.transform(
                F.sequence(F.lit(1), n_win),
                lambda j: F.array_max(
                    F.filter(
                        F.sequence(j, j + (w - 1)),
                        lambda p: F.element_at(hsc, p)
                        == F.array_min(F.slice(hsc, j, w)),
                    )
                ),
            ),
        )
    fps = F.array_distinct(
        F.transform(
            sel,
            lambda p: F.struct(
                p.alias("pos"), F.element_at(hsc, p).alias("fp")
            ),
        )
    )
    return (
        step.select(F.col(id_col), F.explode(fps).alias("s"))
        .select(id_col, F.col("s.pos").alias("pos"), F.col("s.fp").alias("fp"))
    )


def winnow_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> DataFrame:
    """(id_a, id_b, n_shared) for document pairs sharing >= min_shared
    distinct fingerprint VALUES, fingerprints present in more than
    max_df documents dropped before the join (boilerplate guard — at
    web scale a hot k-gram would otherwise quadratically explode the
    fingerprint bucket, exactly like a hot LSH band)."""
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w).select(
        F.col(id_col).alias("doc"), "fp"
    ).distinct()
    rare = fp.groupBy("fp").agg(F.count("*").alias("df_cnt")).filter(
        F.col("df_cnt") <= max_df
    )
    fp = fp.join(rare.select("fp"), "fp")
    a = fp.select(F.col("doc").alias("id_a"), "fp")
    b = fp.select(F.col("doc").alias("id_b"), "fp")
    return (
        a.join(b, "fp")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared"))
        .filter(F.col("n_shared") >= min_shared)
    )


def _fp_cte(
    table: str, text: str, id_col: str, k: int, w: int
) -> str:
    """CTE chain producing (id, pos, fp) — the DuckDB twin of
    winnow_fingerprints. DuckDB range() is end-exclusive and empty when
    stop <= start, matching the engine's n >= 1 guards; list slicing
    hs[j : j+w-1] is 1-based inclusive (w elements)."""
    gh = (
        f"CAST('0x' || substring(md5(substring({text}, i, {k})), 1, 15) "
        f"AS BIGINT)"
    )
    return f"""
g AS (
  SELECT {id_col},
         list_transform(range(1, length({text}) - {k - 1} + 1),
                        i -> {gh}) AS hs
  FROM {table}
),
sel AS (
  SELECT {id_col}, hs,
         list_transform(
           range(1, len(hs) - {w - 1} + 1),
           j -> list_max(list_filter(range(j, j + {w}),
                         p -> hs[p] = list_min(hs[j : j + {w - 1}])))
         ) AS ps
  FROM g
),
fp AS (
  SELECT DISTINCT {id_col}, p AS pos, hs[p] AS fp
  FROM (SELECT {id_col}, hs, unnest(ps) AS p FROM sel)
)""".strip()


def winnow_fingerprints_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
) -> str:
    return (
        f"WITH {_fp_cte(table, text, id_col, k, w)}\n"
        f"SELECT {id_col}, pos, fp FROM fp"
    )


def winnow_pairs_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    k: int = 8,
    w: int = 4,
    min_shared: int = 2,
    max_df: int = 50,
) -> str:
    return f"""
WITH {_fp_cte(table, text, id_col, k, w)},
fpv AS (SELECT DISTINCT {id_col} AS doc, fp FROM fp),
rare AS (
  SELECT fp FROM fpv GROUP BY fp HAVING count(*) <= {int(max_df)}
)
SELECT a.doc AS id_a, b.doc AS id_b,
       CAST(count(*) AS BIGINT) AS n_shared
FROM fpv a JOIN rare USING (fp) JOIN fpv b USING (fp)
WHERE a.doc < b.doc
GROUP BY 1, 2
HAVING count(*) >= {int(min_shared)}
""".strip()


def mirror_sources(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 8,
    w: int = 4,
    min_shared: int = 10,
    max_df: int = 50,
) -> DataFrame:
    """Mirror/syndication detection between SOURCES (hosts): pairs of
    sources whose page sets share many winnowing fingerprint values —
    the corpus-level product built on the same sketch as winnow_pairs
    (scrapers, mirrors, and syndication networks shared-ink at the
    source level even when no single page pair crosses the near-dup
    bar).

    Same screen-then-verify contract: fingerprints with document
    frequency > max_df dropped BEFORE the pair join (boilerplate
    k-grams would pair every source with every other), distinct
    (source, fp) so one source's internal duplication cannot inflate a
    pair, one fp-keyed self-join + one pair-count exchange.

    Output: (src_a, src_b, n_shared_fp) with n_shared_fp >= min_shared.
    """
    fp = winnow_fingerprints(df, text_col, id_col, k=k, w=w).select(
        F.col(id_col).alias("_doc"), "fp"
    )
    docs = df.select(
        F.col(id_col).alias("_doc"), F.col(group_col).alias("grp")
    )
    gfp = fp.join(docs, "_doc").select("grp", "fp").distinct()
    rare = (
        gfp.groupBy("fp")
        .agg(F.count("*").alias("df_cnt"))
        .filter(F.col("df_cnt") <= max_df)
        .select("fp")
    )
    gfp = gfp.join(rare, "fp")
    a = gfp.select("fp", F.col("grp").alias("src_a"))
    b = gfp.select("fp", F.col("grp").alias("src_b"))
    return (
        a.join(b, "fp")
        .filter(F.col("src_a") < F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count("*").alias("n_shared_fp"))
        .filter(F.col("n_shared_fp") >= min_shared)
    )


def mirror_sources_sql(
    table: str = "documents",
    text: str = "text",
    id_col: str = "doc_id",
    group_col: str = "source",
    k: int = 8,
    w: int = 4,
    min_shared: int = 10,
    max_df: int = 50,
) -> str:
    return f"""
WITH {_fp_cte(table, text, id_col, k, w)},
gfp AS (
  SELECT DISTINCT d.{group_col} AS grp, fp.fp
  FROM fp JOIN {table} d ON fp.{id_col} = d.{id_col}
),
rare AS (
  SELECT fp FROM gfp GROUP BY fp HAVING count(*) <= {int(max_df)}
)
SELECT a.grp AS src_a, b.grp AS src_b,
       CAST(count(*) AS BIGINT) AS n_shared_fp
FROM gfp a JOIN rare USING (fp) JOIN gfp b USING (fp)
WHERE a.grp < b.grp
GROUP BY 1, 2
HAVING count(*) >= {int(min_shared)}
""".strip()
