package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Plan-level evidence for the 100 TB design claims: bucketed tables join
  * without shuffling, partitioned layouts prune at the source, and scans
  * only read projected columns. (Run on sf0.001 — the assertions are about
  * plan SHAPE, which is scale-invariant.) */
class ScaleDesignSpec extends AnyFunSuite {

  private lazy val wh = java.nio.file.Files.createTempDirectory("graft_wh").toString

  // isolated child session: the JVM-wide session may exist already (suite
  // order), so AQE/broadcast knobs must be set at session level — builder
  // configs would be silently ignored by getOrCreate
  private lazy val spark = {
    val base = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.warehouse.dir", wh)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    val s = base.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force the issue
    s.conf.set("spark.sql.adaptive.enabled", "false") // plain plan shape for counts
    s
  }

  private val sf = "/root/testdata/sf0.001"

  private def shuffleCount(df: org.apache.spark.sql.DataFrame): Int =
    df.queryExecution.executedPlan.collect {
      case e: ShuffleExchangeExec => e
    }.size

  test("bucketed join is shuffle-free; unbucketed join shuffles both sides") {
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    // external tables with explicit fresh paths — immune to leftover
    // managed-table locations from earlier runs/sessions
    spark.read.parquet(s"$sf/lineitem.parquet")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    spark.read.parquet(s"$sf/orders.parquet")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").mode("overwrite").saveAsTable("ord_b")

    val bucketed = spark.table("li_b")
      .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    // only the final groupBy shuffles — the join is co-located
    assert(shuffleCount(bucketed) == 1)

    val unbucketed = spark.read.parquet(s"$sf/lineitem.parquet")
      .join(spark.read.parquet(s"$sf/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderstatus").count()
    assert(shuffleCount(unbucketed) >= 2)
  }

  test("partitioned layout prunes partitions at the source") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    spark.read.parquet(s"$sf/orders.parquet")
      .withColumn("o_year", year(col("o_orderdate")))
      .write.partitionBy("o_year").mode("overwrite").parquet(dir)

    val pruned = spark.read.parquet(dir).filter(col("o_year") === 1996)
    val scan = pruned.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    // only the 1996 partition's files are listed
    assert(scan.relation.location.inputFiles.length >
      scan.selectedPartitions.totalNumberOfFiles)
    val years = pruned.select("o_year").distinct().collect().map(_.getInt(0))
    assert(years.toSeq == Seq(1996))
  }

  test("projection prunes the parquet read schema") {
    val df = spark.read.parquet(s"$sf/lineitem.parquet")
      .select("l_orderkey", "l_quantity")
    val scan = df.queryExecution.executedPlan.collect {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.head
    assert(scan.requiredSchema.fieldNames.toSet == Set("l_orderkey", "l_quantity"))
  }
}
