package graft.plans

import org.apache.spark.sql.DataFrame

/** EXPLAIN statement variants (explainStmt, ClickHouseParser.py:7487-7605)
  * mapped to Spark's plan stages. Each CH variant inspects one layer of
  * the query lifecycle; Spark's `QueryExecution` exposes the same layers:
  *
  *  | CH variant          | layer shown                    | Spark source            |
  *  |---------------------|--------------------------------|-------------------------|
  *  | EXPLAIN AST         | parse tree                     | `logical` (unresolved)  |
  *  | EXPLAIN SYNTAX      | rewritten/normalized query     | `analyzed`              |
  *  | EXPLAIN QUERY TREE  | analyzer IR tree               | `analyzed`              |
  *  | EXPLAIN PLAN        | optimized logical plan         | `optimizedPlan`         |
  *  | EXPLAIN PIPELINE    | physical execution pipeline    | `executedPlan`          |
  *  | EXPLAIN ESTIMATE    | cost / size estimates          | `optimizedPlan.stats`   |
  *
  *  EXPLAIN TABLE OVERRIDE (the remaining explainStmt alternative)
  *  inspects external-database-engine column overrides and is refused
  *  honestly at the dispatch layer — there is no external engine here.
  *
  * `df.explain(mode)` prints; these return the text so the surface is
  * composable (a SQL-visible `EXPLAIN` would route here via a parser rule).
  */
object ExplainOps {

  def explainText(df: DataFrame, variant: String): String = {
    val qe = df.queryExecution
    variant.trim.toUpperCase match {
      case "AST"      => qe.logical.treeString
      case "SYNTAX"   => qe.analyzed.treeString
      // CH's new-analyzer IR dump; Spark's analyzed plan IS that layer —
      // resolved attributes, expanded stars, coerced types
      case "QUERY TREE" => qe.analyzed.treeString
      case "" | "PLAN" => qe.optimizedPlan.treeString
      case "PIPELINE" => qe.executedPlan.treeString
      case "ESTIMATE" =>
        val s = qe.optimizedPlan.stats
        s"sizeInBytes=${s.sizeInBytes}" +
          s.rowCount.map(rc => s" rowCount=$rc").getOrElse("")
      case other =>
        throw new IllegalArgumentException(s"unknown EXPLAIN variant: $other")
    }
  }
}
