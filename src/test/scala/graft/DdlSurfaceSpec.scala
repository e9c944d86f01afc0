package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.SparkSession

/** The DDL/DML statement surface of the reference grammar (SURVEY.md §2.2
  * "DDL / catalog statements") executed through Spark SQL: CREATE DATABASE /
  * TABLE / VIEW, INSERT VALUES + INSERT SELECT (CH insertStmt), CTAS,
  * ALTER ADD COLUMN, DESCRIBE, SHOW, TRUNCATE-equivalent, DROP. */
class DdlSurfaceSpec extends AnyFunSuite {

  private lazy val spark = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  private lazy val loc =
    java.nio.file.Files.createTempDirectory("graft_ddl").toString

  test("CREATE DATABASE / TABLE / INSERT / SELECT round-trip") {
    spark.sql(s"CREATE DATABASE IF NOT EXISTS graft_ddl LOCATION '$loc/db'")
    spark.sql(
      s"""CREATE TABLE graft_ddl.t (id BIGINT, name STRING)
         |USING parquet LOCATION '$loc/t'""".stripMargin)
    spark.sql("INSERT INTO graft_ddl.t VALUES (1, 'a'), (2, 'b')")
    spark.sql("INSERT INTO graft_ddl.t SELECT id + 10, upper(name) FROM graft_ddl.t")
    assert(spark.sql("SELECT count(*) FROM graft_ddl.t").head().getLong(0) == 4)
  }

  test("CREATE VIEW over the table; SHOW/DESCRIBE surface") {
    spark.sql(
      """CREATE OR REPLACE VIEW graft_ddl.v AS
        |SELECT name, count(*) AS n FROM graft_ddl.t GROUP BY name""".stripMargin)
    val names = spark.sql("SHOW TABLES IN graft_ddl").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(names.contains("t") && names.contains("v"))
    val cols = spark.sql("DESCRIBE graft_ddl.t").collect().map(_.getString(0))
    assert(cols.contains("id") && cols.contains("name"))
    assert(spark.sql("SELECT sum(n) FROM graft_ddl.v").head().getLong(0) == 4)
  }

  test("CTAS + ALTER TABLE ADD COLUMNS + DROP") {
    spark.sql(
      s"""CREATE TABLE graft_ddl.t2 USING parquet LOCATION '$loc/t2'
         |AS SELECT id, name FROM graft_ddl.t WHERE id <= 2""".stripMargin)
    assert(spark.sql("SELECT count(*) FROM graft_ddl.t2").head().getLong(0) == 2)
    spark.sql("ALTER TABLE graft_ddl.t2 ADD COLUMNS (extra INT)")
    assert(spark.table("graft_ddl.t2").columns.contains("extra"))
    spark.sql("DROP VIEW IF EXISTS graft_ddl.v")
    spark.sql("DROP TABLE graft_ddl.t2")
    val names = spark.sql("SHOW TABLES IN graft_ddl").collect()
      .map(_.getAs[String]("tableName")).toSet
    assert(!names.contains("t2") && !names.contains("v"))
  }

  test("INTO OUTFILE sinks: parquet, CSVWithNames, JSONEachRow round-trip") {
    import graft.sources.Sinks
    val dir = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val df = spark.sql("SELECT id, name FROM graft_ddl.t")
    val n = df.count()
    Sinks.intoOutfile(df, s"$dir/p")
    Sinks.intoOutfile(df, s"$dir/c", "CSVWithNames")
    Sinks.intoOutfile(df, s"$dir/j", "JSONEachRow")
    assert(spark.read.parquet(s"$dir/p").count() == n)
    assert(spark.read.option("header", "true").csv(s"$dir/c").count() == n)
    assert(spark.read.json(s"$dir/j").count() == n)
    // partitioned layout
    Sinks.intoOutfile(df.withColumn("b",
      org.apache.spark.sql.functions.pmod(
        org.apache.spark.sql.functions.col("id"),
        org.apache.spark.sql.functions.lit(2))), s"$dir/part",
      partitionBy = Seq("b"))
    assert(new java.io.File(s"$dir/part").listFiles()
      .exists(_.getName.startsWith("b=")))
  }

  test("ORDER BY (sorted write) and TTL (partition retention) mappings") {
    import graft.sources.Sinks
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_ttl").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("dt", date_format(col("o_orderdate"), "yyyy-MM"))
    Sinks.writeSorted(df, s"$dir/orders", Seq("o_custkey", "o_orderdate"),
      partitionBy = Seq("dt"))
    val before = spark.read.parquet(s"$dir/orders")
      .select("dt").distinct().count()
    val dropped = Sinks.applyTtl(spark, s"$dir/orders", "dt", "1997-01")
    assert(dropped.nonEmpty && dropped.forall(_ < "dt=1997-01"))
    val after = spark.read.parquet(s"$dir/orders")
    assert(after.select("dt").distinct().count() == before - dropped.length)
    assert(after.agg(min("dt")).head().getString(0) >= "1997-01")
  }

  test("INSERT OVERWRITE is the TRUNCATE+reload mutation path") {
    spark.sql("INSERT OVERWRITE graft_ddl.t VALUES (99, 'only')")
    val rows = spark.sql("SELECT id, name FROM graft_ddl.t").collect()
    assert(rows.length == 1 && rows(0).getLong(0) == 99L)
  }
}
