package graft.plans

import org.apache.spark.sql.{Column, DataFrame}

/** Scale-shape helpers shared by the operators and the query registry. */
object ScaleShape {

  /** Scale-adaptive scan fan-out (r15, optimization-guide §2.5 "input
    * skew: one huge unsplittable file … repartition immediately after
    * the read"). The driver's testdata ships each table as ONE
    * single-row-group parquet file, so a scan yields one partition and
    * every row-local compute-heavy operator (tokenize/shingle/decode)
    * ran as ONE task on a 32-core session — profiled as cpu/wall ≈ 2.7
    * across the whole bench. When the scan's partition count is below
    * half the session parallelism, redistribute by a deterministic key
    * (hash partitioning — retry-safe, and no sort-before-repartition
    * cost that keyless round-robin pays); at production scale the scan
    * already carries ≥ parallelism splits and this is a NO-OP, so the
    * shuffle it inserts exists only where the input layout starves the
    * session. Deterministic filters still push past the repartition to
    * the scan (PushDownPredicates handles RepartitionOperation).
    *
    * Only applied where cross-row aggregates are exact (counts, min/max,
    * integer hashes, decimals) or rounded-per-row — partition layout
    * changes partial-sum order, so raw double sums keep their scan
    * order. */
  def fanOut(df: DataFrame, by: Column*): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions * 2 <= p) df.repartition(p, by: _*) else df
  }

  // NOTE (r15, negative result — kept so the next round doesn't retry
  // it): an experiment pinned AQE off + shuffle width 1 around the
  // iterative loops (trainers' gradient steps, k-means updates, the
  // connected-components rounds) on the theory that their reduce sides
  // are configuration-bounded and each AQE query stage costs a
  // scheduler dispatch (~40-60 ms). Measured STRICTLY WORSE (t9 3.6 s
  // -> 8.6 s, p2 2.5 s -> 8.2 s): AQE's runtime size stats are what
  // convert the loops' joins to broadcast and keep upstream widths
  // sane — the dispatch overhead it adds is the cheaper half of the
  // trade. Reverted; job-count reduction must come from restructuring
  // (fewer actions per round), not from planner pinning.
}
