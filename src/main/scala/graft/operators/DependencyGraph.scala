package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Distributed form of the reference's graph stage (SURVEY.md §2.1 G2-G5)
  * plus a multi-hop transitive closure extension. All pure DataFrame ops —
  * Catalyst handles pushdown/pruning; the graph is metadata-scale but every
  * op here is written to survive a 100 TB catalog (hash joins on `src`/`dst`,
  * no driver-side loops except the bounded closure iteration).
  *
  * Expected input: `lineage` DataFrame with columns
  * (view: string, deps: array<string>) — the output of the lineage UDF stage.
  */
object DependencyGraph {

  /** G2 (build edges): deps exploded → (src = dependency, dst = view).
    * Direction per reference dependencies_to_mermaid.py:108.
    * `posexplode` keeps the within-view dep position so first-seen edge
    * order (G3) is reproducible under distribution. */
  def edges(lineage: DataFrame): DataFrame =
    lineage.select(
      col("view"),
      posexplode(col("deps")).as(Seq("pos", "src"))
    ).select(col("src"), col("view").as("dst"), col("pos"))

  /** G3 (edge dedup, first-occurrence-wins): reference
    * dependencies_to_mermaid.py:110-117. Order key = (dst insertion order,
    * dep position); we approximate dict order with (dst, pos) which is
    * deterministic and distribution-safe. */
  def dedupEdges(edges: DataFrame): DataFrame = {
    val w = Window.partitionBy("src", "dst").orderBy("pos")
    edges.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .drop("rn")
  }

  /** G2 (node set): endpoints ∪ declared views.
    * Reference dependencies_to_mermaid.py:100-108. */
  def nodes(lineage: DataFrame): DataFrame = {
    val e = edges(lineage)
    e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id")))
      .union(lineage.select(col("view").as("id")))
      .distinct()
  }

  /** G4 (node classification): node ∈ table set → chTable else chView.
    * Reference dependencies_to_mermaid.py:125-129. Broadcast the table list
    * (catalog-sized) so classification never shuffles the node set. */
  def classify(nodes: DataFrame, tables: DataFrame): DataFrame =
    nodes.join(broadcast(tables.select(col("id").as("tid"))),
        nodes("id") === col("tid"), "left")
      .select(nodes("id"),
        when(col("tid").isNotNull, "chTable").otherwise("chView").as("cls"))

  /** G5 (isolated nodes): nodes that are endpoint of no edge, sorted.
    * Reference dependencies_to_mermaid.py:137-149. */
  def isolated(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val endpoints = edges.select(col("src").as("id"))
      .union(edges.select(col("dst").as("id"))).distinct()
    nodes.join(endpoints, Seq("id"), "left_anti").orderBy("id")
  }

  /** Fan-out per source object / fan-in per view — SQL-surface extension
    * (repo north star: analysis as Spark SQL over metadata). */
  def fanOut(edges: DataFrame): DataFrame =
    edges.groupBy("src").agg(count("*").as("fan_out")).orderBy(desc("fan_out"), col("src"))

  def fanIn(edges: DataFrame): DataFrame =
    edges.groupBy("dst").agg(count("*").as("fan_in")).orderBy(desc("fan_in"), col("dst"))

  /** Pointer-doubling reachability core: after round k, `reach` holds every
    * (src, dst) connected by a path of ≤ 2^k edges, with depth = the
    * `shortest`-or-longest such path (min-plus / max-plus matrix squaring).
    * O(log diameter) rounds instead of the frontier form's O(diameter),
    * and exactly ONE action per round: the convergence-stats aggregate
    * (pair count + depth sum) materializes the round's LAZY
    * `localCheckpoint` and returns the stats in the same job; later
    * rounds read the pinned blocks — no recompute.
    * Convergence: depths only shrink (min) / grow (max) and the pair set
    * only grows, so an unchanged (count, sum) fixes the point. For min,
    * an unchanged pair set already implies every shortest path ≤ 2^(k-1),
    * which round k measures exactly; for max (longest path, DAG-safe) the
    * sum catches depths still stretching after the pair set fills.
    * `maxRounds = 10` admits paths of 2^10 hops — far past any real
    * catalog's depth; cycles (a malformed catalog) terminate via the cap. */
  private def doubledClosure(edges: DataFrame, shortest: Boolean,
      maxRounds: Int): DataFrame = {
    val aggDepth = if (shortest) min(col("depth")) else max(col("depth"))
    // LAZY checkpoints (r15, the connectedComponents convention): the
    // convergence stats aggregate reads every partition, so it both
    // materializes the round's checkpoint and returns (count, sum) in
    // ONE action — the eager form paid a separate materializing job per
    // round. Values are unchanged: (src, dst)-keyed exact min/max over
    // integer depths is partition-layout-independent.
    var reach = edges.select(col("src"), col("dst"), lit(1).as("depth"))
      .localCheckpoint(false)
    def stats(df: DataFrame): (Long, Long) = {
      val r = df.agg(count(lit(1)), sum("depth")).head()
      (r.getLong(0), if (r.isNullAt(1)) 0L else r.getLong(1))
    }
    var prev = stats(reach)
    // pair-count-derived shuffle width for the round plans (r15, guide
    // §2.2): the reach set here is catalog-metadata-scale, yet each
    // round's self-join + groupBy planned at the session shuffle
    // constant — near-empty reduce tasks per round. One reduce partition
    // per ~20k reach pairs, re-derived each round from the live pair
    // count (the closure can grow quadratically), capped at the session
    // setting, which is restored after the loop.
    val sess = edges.sparkSession
    val savedSp = sess.conf.get("spark.sql.shuffle.partitions")
    def roundSp(pairs: Long): String = math.max(1L,
      math.min(savedSp.toLong, pairs / 20000L + 1L)).toString
    var i = 0
    var done = prev._1 == 0
    try {
      while (i < maxRounds && !done) {
        sess.conf.set("spark.sql.shuffle.partitions", roundSp(prev._1))
        val hop = reach.alias("a")
          .join(reach.alias("b"), col("a.dst") === col("b.src"))
          .select(col("a.src").as("src"), col("b.dst").as("dst"),
            (col("a.depth") + col("b.depth")).as("depth"))
        val combined = reach.union(hop)
          .groupBy("src", "dst").agg(aggDepth.as("depth"))
          .localCheckpoint(false)
        val cur = stats(combined)
        if (cur == prev) done = true
        prev = cur
        reach = combined
        i += 1
      }
    } finally sess.conf.set("spark.sql.shuffle.partitions", savedSp)
    reach
  }

  /** Refresh order: topological levels over the dependency DAG — level 0 =
    * objects that depend on nothing (base tables, isolated objects),
    * level(v) = 1 + max(level of v's dependencies) = the longest path
    * ending at v (any path ending at v extends backward to an in-degree-0
    * node, so the max over ALL paths ending at v is the level). Runs the
    * max-plus pointer-doubling closure, then one aggregation — O(log depth)
    * rounds. */
  def refreshLevels(allObjects: DataFrame, edges: DataFrame, maxRounds: Int = 10): DataFrame = {
    val lv = doubledClosure(edges, shortest = false, maxRounds)
      .groupBy(col("dst").as("id")).agg(max("depth").as("level"))
    val zeros = allObjects.select(col("id"))
      .join(lv, Seq("id"), "left_anti")
      .withColumn("level", lit(0))
    zeros.union(lv.select(col("id"), col("level")))
  }

  /** Multi-hop lineage: transitive closure with depth = shortest hop count,
    * via min-plus pointer doubling — O(log diameter) rounds, one action per
    * round (see [[doubledClosure]]). */
  def transitiveClosure(edges: DataFrame, maxRounds: Int = 10): DataFrame =
    doubledClosure(edges, shortest = true, maxRounds)
}
