package graft

import org.apache.spark.sql.SparkSession

/** User-facing CH-SQL runner: execute a ClickHouse SELECT string against a
  * directory of parquet tables (table `t` resolves to `<dir>/t.parquet`).
  *
  * Usage: runMain graft.Sql <tableDir> "<CH SQL>" [maxRows]
  *
  * This is the reference's query surface as a command line — the same
  * translator the ch* oracle entries go through (graft.chsql.ChSql), so
  * anything it prints is covered by the cross-engine gate.
  */
object Sql {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2, "usage: graft.Sql <tableDir> \"<CH SQL>\" [maxRows]")
    val dir = args(0)
    val query = args(1)
    val maxRows = if (args.length > 2) args(2).toInt else 50
    val spark = SparkSession.builder()
      .master(sys.env.getOrElse("SPARK_GRAFT_MASTER", "local[4]"))
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "4"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = chsql.ChSql.sql(spark, query)(
      n => spark.read.parquet(s"$dir/$n.parquet"))
    df.show(maxRows, truncate = false)
    spark.stop()
  }
}
