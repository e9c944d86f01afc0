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
    // catalog-first resolution so CREATE VIEW results are queryable;
    // otherwise table t reads <dir>/t.parquet
    def resolve(n: String): org.apache.spark.sql.DataFrame =
      if (spark.catalog.tableExists(n)) spark.table(n)
      else spark.read.parquet(s"$dir/$n.parquet")
    // ';'-separated statements (quote-aware split), each dispatched
    // through the statement layer (SELECT / EXPLAIN / CREATE VIEW / SET)
    val stmts = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var inQuote = false
      query.foreach {
        case '\'' => inQuote = !inQuote; cur += '\''
        case ';' if !inQuote => parts += cur.toString; cur.clear()
        case c => cur += c
      }
      if (cur.toString.trim.nonEmpty) parts += cur.toString
      parts.toSeq.map(_.trim).filter(_.nonEmpty)
    }
    for ((stmt, i) <- stmts.zipWithIndex) {
      // SHOW TABLES needs the directory listing — a CLI concern, so it
      // lives here rather than in the resolver-based statement layer
      if (stmt.toUpperCase(java.util.Locale.ROOT).startsWith("SHOW TABLES")) {
        import spark.implicits._
        val files = Option(new java.io.File(dir).listFiles()).toSeq.flatten
          .filter(_.getName.endsWith(".parquet"))
          .map(_.getName.stripSuffix(".parquet"))
        val views = spark.catalog.listTables().collect().map(_.name).toSeq
        render((files ++ views).distinct.sorted.toDF("name"), None, maxRows)
      } else {
        // run under a query id so KILL QUERY / SHOW PROCESSLIST see it
        operators.AdminOps.withQueryId(spark, s"cli-$i", stmt) {
          val (df, fmt) = chsql.ChSql.statement(spark, stmt)(resolve)
          render(df, fmt, maxRows)
        }
      }
    }
    spark.stop()
  }

  private def render(df: org.apache.spark.sql.DataFrame,
      fmt: Option[String], maxRows: Int): Unit = {
    // standalone `FORMAT f` (formatClause, ClickHouseParser.py:1765-1775)
    // picks the wire rendering; default is the Pretty-style ASCII table
    fmt.map(_.toLowerCase).getOrElse("pretty") match {
      case "jsoneachrow" =>
        df.toJSON.take(maxRows).foreach(println)
      case "tabseparated" | "tsv" =>
        df.take(maxRows).foreach(r => println(r.toSeq.mkString("\t")))
      case "tabseparatedwithnames" | "tsvwithnames" =>
        println(df.columns.mkString("\t"))
        df.take(maxRows).foreach(r => println(r.toSeq.mkString("\t")))
      case "csvwithnames" =>
        println(df.columns.mkString(","))
        df.take(maxRows).foreach(r => println(r.toSeq.mkString(",")))
      case "csv" =>
        df.take(maxRows).foreach(r => println(r.toSeq.mkString(",")))
      case _ => df.show(maxRows, truncate = false)
    }
  }
}
