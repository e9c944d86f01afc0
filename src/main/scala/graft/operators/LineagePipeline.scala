package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.LineageExtractor
import graft.model.MermaidOptions
import graft.render.Mermaid
import graft.sources.CatalogSource

/** End-to-end dependency analysis: the reference CLI flow
  * (ch_view_dependencies.py:367-395) re-expressed as one declarative
  * DataFrame chain. The per-view N+1 DDL fetch + single-threaded parse loop
  * of the reference becomes a single scan + a parallel UDF — on a 100 TB
  * catalog the lineage stage parallelizes per-row with no shuffle at all;
  * the only shuffles are the (metadata-sized) graph aggregations.
  */
object LineagePipeline {

  /** struct-returning lineage UDF with the keep-going error channel
    * (op P1, ch_view_dependencies.py:346-361). */
  val lineageUdf = udf { (ddl: String, db: String) =>
    val (deps, err) = LineageExtractor.extract(ddl, Option(db))
    (deps, err.orNull)
  }

  /** views → (view, deps array<string>, error) */
  def lineage(views: DataFrame): DataFrame =
    views.select(
        concat_ws(".", col("database"), col("name")).as("view"),
        lineageUdf(coalesce(col("create_table_query"), lit("")), col("database"))
          .as("r"))
      .select(col("view"), col("r._1").as("deps"), col("r._2").as("error"))

  /** AST-exact tier of the same op: the real CH parser with per-row
    * heuristic fallback ([[LineageExtractor.extractExact]]); adds the
    * `tier` column so callers can audit which rows got the exact parse.
    * Same shape, same no-shuffle parallelism. */
  val lineageExactUdf = udf { (ddl: String, db: String) =>
    val (deps, tier, err) = LineageExtractor.extractExact(ddl, Option(db))
    (deps, tier, err.orNull)
  }

  /** views → (view, deps, tier, error) through the exact tier. */
  def lineageExact(views: DataFrame): DataFrame =
    views.select(
        concat_ws(".", col("database"), col("name")).as("view"),
        lineageExactUdf(coalesce(col("create_table_query"), lit("")), col("database"))
          .as("r"))
      .select(col("view"), col("r._1").as("deps"), col("r._2").as("tier"),
        col("r._3").as("error"))

  /** The reference's JSON payload shape `{"view_dependencies", "errors"}`
    * as two DataFrames. */
  def dependencies(catalog: DataFrame): (DataFrame, DataFrame) = {
    val lin = lineage(CatalogSource.views(catalog))
    (lin.filter(col("error").isNull).select("view", "deps"),
      lin.filter(col("error").isNotNull).select("view", "error"))
  }

  /** Full pipeline → Mermaid text (driver-side render of the collected,
    * metadata-scale graph; reference ch_view_dependencies.py:390-395). */
  def toMermaid(
      catalog: DataFrame,
      options: MermaidOptions = MermaidOptions(includeIsolatedNodes = false)
  ): String = {
    val (deps, _) = dependencies(catalog)
    val viewDeps = deps.orderBy("view").collect()
      .map(r => r.getString(0) -> r.getSeq[String](1))
    val tableSet = CatalogSource.tables(catalog)
      .select(concat_ws(".", col("database"), col("name"))).collect()
      .map(_.getString(0)).toSet
    Mermaid.render(viewDeps.toSeq, tableSet, options)
  }
}
