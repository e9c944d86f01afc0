package graft

import org.apache.spark.sql.SparkSession

/** Dev tool (r15 optimization round): per-STATEMENT timing for the DDL
  * family — the ch4x/ch5x/ch88 queries run real CREATE/INSERT/mutate
  * sessions whose cost is driver-side (parse, catalog, write-commit), so
  * ProfileQuery's per-query totals can't localize it. Runs a statement
  * list N passes and prints per-statement wall times.
  *
  * Usage: runMain graft.DdlProbe [passes]
  */
object DdlProbe {
  def main(args: Array[String]): Unit = {
    val passes = args.headOption.map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val stmts = Seq(
      "DROP TABLE IF EXISTS ch88_t",
      """CREATE TABLE ch88_t (k Int64, p Int32, v Int64,
        |  d Int64 DEFAULT k * 2 + 1, n Nullable(Int64))
        |ENGINE = MergeTree PARTITION BY p ORDER BY k""".stripMargin,
      "INSERT INTO ch88_t VALUES (1, 0, 7, 100, 5), (2, 1, 8, 200, 6)",
      "INSERT INTO ch88_t (k, p) VALUES (3, 0), (4, 1)",
      "ALTER TABLE ch88_t CLEAR COLUMN v IN PARTITION 0",
      "ALTER TABLE ch88_t CLEAR COLUMN d IN PARTITION 1",
      "ALTER TABLE ch88_t ADD COLUMN w Int64 DEFAULT k * 10",
      "ALTER TABLE ch88_t MODIFY COLUMN v Int64 DEFAULT k * 5",
      "INSERT INTO ch88_t (k, p) VALUES (5, 0)",
      "SELECT k, p, v, d, n, w FROM ch88_t ORDER BY k")
    val resolve: String => org.apache.spark.sql.DataFrame = n =>
      if (spark.catalog.tableExists(n)) graft.chsql.ChDdl.readTable(spark, n)
      else spark.read.parquet(s"$dir/$n.parquet")
    for (p <- 1 to passes) {
      println(s"== pass $p ==")
      stmts.foreach { t =>
        val t0 = System.nanoTime()
        val df = graft.chsql.ChSql.statement(spark, t)(resolve)._1
        val tMid = System.nanoTime()
        df.queryExecution.toRdd.count()
        val t1 = System.nanoTime()
        println(f"  ${(tMid - t0) / 1e9}%7.3f + ${(t1 - tMid) / 1e9}%6.3f s  ${t.linesIterator.next().take(70)}")
      }
    }
    spark.stop()
  }
}
