package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.CatalogSource

/** The dependency analysis exposed as Spark SQL temp views over a catalog
  * snapshot — the repo north star (BASELINE.json: "Analysis scripts for
  * ClickHouse objects reimplemented as Spark SQL queries over metadata").
  *
  * After [[register]], a user can run plain SQL:
  * {{{
  *   SELECT * FROM graft_view_dependencies
  *   SELECT * FROM graft_isolated_objects
  *   SELECT * FROM graft_objects_by_engine
  *   SELECT * FROM graft_fan_out ORDER BY fan_out DESC
  *   SELECT * FROM graft_closure WHERE depth > 1   -- multi-hop lineage
  * }}}
  */
object MetadataSql {

  /** Register the full analysis as temp views derived from `catalog`
    * (a `system.tables`-shaped DataFrame). Views are lazy plans — each SQL
    * query re-optimizes end-to-end through Catalyst (filter pushdown into
    * the catalog scan included); `graft_closure` is materialized because
    * its iterative self-join cannot be expressed as a single lazy plan. */
  def register(spark: SparkSession, catalog: DataFrame): Unit = {
    catalog.createOrReplaceTempView("graft_catalog")

    CatalogSource.withKind(catalog).createOrReplaceTempView("graft_objects")

    val (deps, errs) = LineagePipeline.dependencies(catalog)
    deps.createOrReplaceTempView("graft_view_dependencies")
    errs.createOrReplaceTempView("graft_lineage_errors")

    val edges = DependencyGraph.dedupEdges(DependencyGraph.edges(deps))
      .select("src", "dst")
    edges.createOrReplaceTempView("graft_edges")

    val nodes = DependencyGraph.nodes(deps)
    val tables = CatalogSource.tables(catalog)
      .select(concat_ws(".", col("database"), col("name")).as("id"))
    DependencyGraph.classify(nodes, tables)
      .createOrReplaceTempView("graft_node_classes")

    val allObjects = catalog
      .filter(!col("database").isin("system", "INFORMATION_SCHEMA", "information_schema"))
      .select(concat_ws(".", col("database"), col("name")).as("id"))
    DependencyGraph.isolated(allObjects, edges)
      .createOrReplaceTempView("graft_isolated_objects")

    spark.sql(
      """SELECT engine, kind, count(*) AS n FROM graft_objects
        |WHERE database NOT IN ('system', 'INFORMATION_SCHEMA', 'information_schema')
        |GROUP BY engine, kind""".stripMargin)
      .createOrReplaceTempView("graft_objects_by_engine")

    DependencyGraph.fanOut(edges).createOrReplaceTempView("graft_fan_out")
    DependencyGraph.fanIn(edges).createOrReplaceTempView("graft_fan_in")

    // closure is iterative → materialize once at registration
    DependencyGraph.transitiveClosure(edges)
      .createOrReplaceTempView("graft_closure")
  }
}
