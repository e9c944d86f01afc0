package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Dev scratch (r15): decompose per-query DataFrame BUILD cost.
  * Times repeated spark.read.parquet of the same table (listing +
  * footer/schema inference per call) vs a schema-supplied read, and a
  * representative ch-SQL translation, to size the per-query constant
  * the bench pays 291 times.
  */
object BuildProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def timeIt(label: String, n: Int)(f: => Unit): Unit = {
      f // warm
      val t0 = System.nanoTime()
      var i = 0
      while (i < n) { f; i += 1 }
      println(f"$label%-46s ${(System.nanoTime() - t0) / 1e6 / n}%8.1f ms/call")
    }

    val tables = Seq("lineitem", "orders", "documents", "customer")
    for (t <- tables) {
      timeIt(s"read.parquet($t)", 10) {
        spark.read.parquet(s"$dir/$t.parquet")
      }
    }
    val schema: StructType =
      spark.read.parquet(s"$dir/lineitem.parquet").schema
    timeIt("read.schema(known).parquet(lineitem)", 10) {
      spark.read.schema(schema).parquet(s"$dir/lineitem.parquet")
    }
    // analysis cost on top of the read
    timeIt("read+groupBy agg plan (no action)", 10) {
      spark.read.parquet(s"$dir/lineitem.parquet")
        .groupBy("l_returnflag").count().queryExecution.optimizedPlan
    }
    timeIt("chsql sql() ch1-style (incl. reads)", 10) {
      graft.chsql.ChSql.sql(spark,
        "SELECT l_returnflag, count() AS n, sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") {
        name => spark.read.parquet(s"$dir/$name.parquet")
      }
    }
    timeIt("chsql sql() ch1-style (schema-cached reads)", 10) {
      graft.chsql.ChSql.sql(spark,
        "SELECT l_returnflag, count() AS n, sum(l_quantity) AS q FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag") {
        name => spark.read.schema(schema).parquet(s"$dir/$name.parquet")
      }
    }
    spark.stop()
  }
}
