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

  /** Refresh order: topological levels over the dependency DAG — level 0 =
    * objects that depend on nothing (base tables, isolated objects),
    * level(v) = 1 + max(level of v's dependencies). The order in which
    * materialized views must be rebuilt. Iterative frontier propagation,
    * same cost shape as [[transitiveClosure]] (bounded by DAG depth). */
  def refreshLevels(allObjects: DataFrame, edges: DataFrame, maxIter: Int = 20): DataFrame = {
    val sinks = edges.select(col("dst").as("id")).distinct()
    var levels = allObjects.select(col("id"))
      .join(sinks, Seq("id"), "left_anti")
      .withColumn("level", lit(0))
    var frontier = levels
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.id") === col("e.src"))
        .select(col("e.dst").as("id"), (col("f.level") + 1).as("level"))
        .groupBy("id").agg(max("level").as("level"))
      val n = next.count()
      if (n == 0) done = true
      else {
        // keep the max level seen per node (longest path semantics)
        levels = levels.union(next).groupBy("id").agg(max("level").as("level"))
          .localCheckpoint(true)
        frontier = next.localCheckpoint(true)
      }
      i += 1
    }
    levels
  }

  /** Multi-hop lineage: transitive closure by iterative self-join.
    * Cycle-safe (distinct per iteration, bounded by `maxIter`); checkpoint
    * every few rounds would cut plan growth on a huge catalog — here the
    * closure is bounded by graph diameter. Returns (src, dst, depth) with
    * depth = shortest hop count. */
  def transitiveClosure(edges: DataFrame, maxIter: Int = 20): DataFrame = {
    var closure = edges.select(col("src"), col("dst"), lit(1).as("depth"))
    var frontier = closure
    var i = 0
    var done = false
    while (i < maxIter && !done) {
      // new paths: frontier ⋈ base edges
      val next = frontier.alias("f")
        .join(edges.alias("e"), col("f.dst") === col("e.src"))
        .select(col("f.src"), col("e.dst"), (col("f.depth") + 1).as("depth"))
        // drop pairs already reached (shortest depth wins)
        .join(closure.select(col("src").as("cs"), col("dst").as("cd")),
          col("src") === col("cs") && col("dst") === col("cd"), "left_anti")
        .distinct()
      val n = next.count()
      if (n == 0) done = true
      else {
        closure = closure.union(next).localCheckpoint(true)
        frontier = next
      }
      i += 1
    }
    closure
  }
}
