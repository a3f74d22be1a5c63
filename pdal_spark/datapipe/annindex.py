"""Persistent IVF similarity index over snapshot catalogs.

`simsearch.ivf_topk` trains + queries in one shot; at 100 TB the
embedding corpus is append-only and retraining spherical k-means per
crawl drop re-pays the full scan for vectors that cannot have moved.
This module persists what the query path actually needs — the (nlist,
d) centroid table and the (id, v, list_id) inverted-list membership —
in `catalog.SnapshotTable`s, so that:

* `build(df)` trains once (map-side Lloyd, deterministic) and stores
  centroids + assignments;
* `append(df)` assigns NEW vectors to the EXISTING centroids — one
  map-side pass with the broadcast centroid matrix, zero retraining,
  one snapshot commit (crawl-drop ingest cost is O(increment));
* `query(qdf, k, nprobe)` probes the stored lists without touching
  the build path — and with nprobe >= nlist the result is EXACT
  (identical fold/rounding/tie-break to `cosine_topk`), which is the
  driver-oracle mode.

Centroid drift is the documented trade: appended vectors may be
farther from their list centroid than at train time, degrading
nprobe<nlist recall — the index records `n_appended` per snapshot so
an operator can re-`build` when the appended fraction crosses their
threshold (the FAISS operational pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pdal_spark.catalog import SnapshotTable
from pdal_spark.datapipe.simsearch import (
    IVF_ITERS,
    IVF_NLIST,
    ivf_assign,
    ivf_rank,
    ivf_train,
)

__all__ = ["IvfIndex"]


class IvfIndex:
    def __init__(self, spark: SparkSession, root: str,
                 nlist: int = IVF_NLIST,
                 id_col: str = "vec_id", vec_col: str = "embedding"):
        self.spark = spark
        self.nlist = nlist
        self.id_col, self.vec_col = id_col, vec_col
        self.centroids_t = SnapshotTable(spark, f"{root}/centroids")
        self.members_t = SnapshotTable(spark, f"{root}/members")

    # -- build / append -----------------------------------------------------

    def build(self, df: DataFrame, n_iters: int = IVF_ITERS,
              sample_mod: int | None = None) -> dict:
        """Train centroids and store the full assignment (overwrites
        any previous index; history stays time-travelable)."""
        import numpy as np

        cents = ivf_train(df, self.nlist, n_iters, self.id_col,
                          self.vec_col, sample_mod)
        cdf = self.spark.createDataFrame(
            [(int(i), [float(x) for x in cents[i]])
             for i in range(len(cents))],
            "list_id int, centroid array<double>",
        )
        v_c = self.centroids_t.overwrite(cdf)
        members = ivf_assign(df, cents, 1, self.id_col, self.vec_col)
        v_m = self.members_t.overwrite(members)
        return {"centroids_version": v_c, "members_version": v_m,
                "nlist": len(cents)}

    def centroids(self):
        import numpy as np

        rows = self.centroids_t.read().orderBy("list_id").collect()
        return np.array([r.centroid for r in rows], dtype=np.float64)

    def append(self, df: DataFrame) -> dict:
        """Assign an increment to the EXISTING centroids (map-side,
        broadcast centroid matrix, no retrain) and append it to the
        member lists as one snapshot."""
        cents = self.centroids()
        members = ivf_assign(df, cents, 1, self.id_col, self.vec_col)
        v = self.members_t.append(members)
        return {"members_version": v, "n_appended": df.count()}

    # -- query --------------------------------------------------------------

    def query(self, qdf: DataFrame, k: int,
              nprobe: int | None = None) -> DataFrame:
        """Top-k cosine neighbors of each query vector among the
        INDEXED vectors (self-matches by id excluded, as in ivf_topk).
        nprobe defaults to nlist (exact mode)."""
        cents = self.centroids()
        nprobe = len(cents) if nprobe is None else nprobe
        members = self.members_t.read().withColumn("role", F.lit(0))
        probes = ivf_assign(qdf, cents, nprobe, self.id_col,
                            self.vec_col).withColumn("role", F.lit(1))
        return ivf_rank(members, probes, k)
