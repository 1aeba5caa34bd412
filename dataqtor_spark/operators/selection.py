"""Training-data selection over embedding columns (north-star extension):
coverage-driven subset selection for curation pipelines.

``kcenter_select`` is the greedy 2-approximation for the k-center
objective (Gonzalez 1985) — the classic "pick a maximally diverse
subset" primitive used to seed curriculum phases, pick annotation
batches, and build coresets for expensive downstream scoring.  Distance
is cosine distance (1 − cosine similarity) over an embedding column.

Scale shape: k bounded rounds; each round is ONE full scan of the
corpus (distance to the ≤k already-chosen centers, evaluated as literal
vectors — no join, no shuffle of the corpus) followed by a
TakeOrderedAndProject(1).  Driver state is k centers (k·dim doubles) —
the same bounded-collect contract as the IVF trainers in
:mod:`dataqtor_spark.operators.ann`.  Total cost O(k·n·dim), the
textbook bound; at 100 TB the scan is partition-parallel and nothing
ever materializes beyond one row per round.

Determinism (the ann01 device): cosine similarities round to 6 dp
BEFORE any comparison, maximin ties break on ascending id, and the
seed is the minimum id — reproducible across partitionings and
bit-exact against the SQL oracle's incremental-`least` replay.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from dataqtor_spark.operators.ann import _as_double, cosine


def kcenter_select(df: DataFrame, id_col: str = "vec_id",
                   vec_col: str = "embedding", k: int = 6) -> DataFrame:
    """Greedy k-center diversity selection.

    Returns a k-row DataFrame ``(rank INT, <id_col> , maximin_dist
    DOUBLE)``: ``rank`` is selection order, ``maximin_dist`` is the
    cosine distance from the chosen point to the nearest
    previously-chosen center (the k-center radius sequence — it is
    non-increasing).  The seed (rank 0) has no previous set, so its
    ``maximin_dist`` is NULL.
    """
    spark = df.sparkSession
    pts = df.select(F.col(id_col).alias("__id"),
                    _as_double(F.col(vec_col)).alias("__v"))

    def lit_vec(vals: list[float]):
        return F.array(*[F.lit(float(x)).cast("double") for x in vals])

    seed = pts.orderBy(F.asc("__id")).limit(1).collect()[0]
    centers = [(seed["__id"], list(seed["__v"]), None)]
    for _ in range(1, k):
        dists = [F.lit(1.0) - F.round(cosine(F.col("__v"), lit_vec(v)), 6)
                 for _, v, _ in centers]
        md = F.least(*dists) if len(dists) > 1 else dists[0]
        chosen_ids = [cid for cid, _, _ in centers]
        top = (pts.filter(~F.col("__id").isin(chosen_ids))
               .select("__id", "__v", md.alias("__md"))
               .orderBy(F.desc("__md"), F.asc("__id"))
               .limit(1).collect())
        if not top:  # fewer than k points
            break
        row = top[0]
        centers.append((row["__id"], list(row["__v"]), row["__md"]))
    out_rows = [(r, cid, mdv) for r, (cid, _, mdv) in enumerate(centers)]
    return spark.createDataFrame(
        out_rows, f"rank int, {id_col} long, maximin_dist double")
