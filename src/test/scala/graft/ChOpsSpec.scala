package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.ChOps

/** Semantics of the ClickHouse-construct rewrites not already covered by
  * the oracle gate. */
class ChOpsSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("dictGet: broadcast lookup preserves fact rows, missing keys null") {
    val facts = Seq((1L, 10), (2L, 20), (3L, 99)).toDF("id", "k")
    val dict = Seq((10, "a"), (20, "b")).toDF("dk", "v")
    val out = ChOps.dictGet(facts, dict, "k", "dk", Map("v" -> "name"))
      .orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getAs[String]("name") == "a")
    assert(out(2).getAs[String]("name") == null)
  }

  test("distributedTopKWithTies matches limitWithTies") {
    val df = Seq(5, 3, 5, 4, 1, 5, 2).toDF("v").repartition(4)
    val dist = ChOps.distributedTopKWithTies(df, col("v"), 2)
      .collect().map(_.getInt(0)).sorted.toSeq
    val global = ChOps.limitWithTies(df, Seq(desc("v")), 2)
      .collect().map(_.getInt(0)).sorted.toSeq
    // top-2 with ties: the three 5s (rank 1) — rank 2 is 4? rank():
    // 5,5,5 → rank 1; 4 → rank 4 > 2, so only the 5s survive
    assert(global == Seq(5, 5, 5))
    // cutoff form: n-th value of top-2 list = 5 → all values >= 5
    assert(dist == Seq(5, 5, 5))
  }

  test("saltedJoin equals plain join") {
    val left = Seq((1, "x"), (1, "y"), (2, "z")).toDF("key", "lv")
    val right = Seq((1, 100), (2, 200)).toDF("key", "rv")
    val plain = left.join(right, "key").select("key", "lv", "rv")
      .collect().map(_.toString).sorted.toSeq
    val salted = ChOps.saltedJoin(left, right, "key", 3)
      .select("key", "lv", "rv").collect().map(_.toString).sorted.toSeq
    assert(salted == plain)
  }
}
