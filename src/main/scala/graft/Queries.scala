package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types._
import graft.operators.{DependencyGraph, LineagePipeline}
import graft.sources.CatalogSource

/** The operator inventory (SURVEY.md §2) as named queries with DuckDB
  * oracles. Every entry keeps column names identical between the Spark
  * DataFrame and the oracle SQL, is deterministically ordered, and uses
  * decimal-cast sums so aggregate values are bit-identical regardless of
  * accumulation order (100 TB plans reorder partial aggregates freely —
  * correctness must not depend on float summation order).
  *
  * Metadata queries (m*) run the reference's own dataflow on the built-in
  * household fixture; their oracles re-derive the same result in pure SQL
  * from inline VALUES — an independent re-computation, not a tautology.
  */
object Queries {

  private def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  private def decimal(c: Column, p: Int = 18, sc: Int = 2): Column =
    c.cast(DecimalType(p, sc))

  // ---- fixture-derived inline oracle data -------------------------------

  /** The 17 expected dependency edges of the household fixture
    * (FIXTURES.md §2), as a SQL VALUES body. */
  private val edgeValues: String = Seq(
    ("test.car", "test.v_car_inventory"),
    ("test.household", "test.v_car_inventory"),
    ("test.human", "test.v_car_inventory"),
    ("test.v_household_flags", "test.v_city_household_flag_stats"),
    ("test.car", "test.v_household_flags"),
    ("test.household", "test.v_household_flags"),
    ("test.household_member", "test.v_household_flags"),
    ("test.pet", "test.v_household_flags"),
    ("test.v_household_flags", "test.v_household_health_score"),
    ("test.car", "test.v_household_roster"),
    ("test.household", "test.v_household_roster"),
    ("test.household_member", "test.v_household_roster"),
    ("test.pet", "test.v_household_roster"),
    ("test.human", "test.v_human_profile"),
    ("test.v_car_inventory", "test.v_human_profile"),
    ("test.human", "test.v_pet_ownership"),
    ("test.pet", "test.v_pet_ownership"))
    .map { case (s, d) => s"('$s','$d')" }.mkString(", ")

  private val viewNames = Seq("v_car_inventory", "v_city_household_flag_stats",
    "v_household_flags", "v_household_health_score", "v_household_roster",
    "v_human_profile", "v_pet_ownership")
  private val tableNames =
    Seq("car", "household", "household_member", "human", "orphan", "pet")

  private def fixtureEdges(s: SparkSession): DataFrame = {
    val (deps, _) = LineagePipeline.dependencies(
      CatalogSource.fixtureCatalog(s).toDF())
    DependencyGraph.dedupEdges(DependencyGraph.edges(deps)).select("src", "dst")
  }

  // ---- query registry ---------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(

    // ===== metadata analysis (reference's own dataflow, SURVEY.md §2.1) =====

    // S1: catalog scan, view-kind filter, system-db exclusion, ordered
    "m1_views_catalog" -> ((s, _) =>
      CatalogSource.views(CatalogSource.fixtureCatalog(s).toDF())
        .select("database", "name", "engine")),

    // S2: complementary non-view filter
    "m2_tables_catalog" -> ((s, _) =>
      CatalogSource.tables(CatalogSource.fixtureCatalog(s).toDF())
        .select("database", "name", "engine")),

    // E3+G2+G3: lineage UDF → explode to edges → first-seen dedup
    "m3_lineage_edges" -> ((s, _) => fixtureEdges(s).orderBy("src", "dst")),

    // aggregation over edges: fan-out per source object
    "m4_fanout" -> ((s, _) =>
      fixtureEdges(s).groupBy("src").agg(count(lit(1)).as("fan_out"))
        .orderBy(desc("fan_out"), col("src"))),

    // G4+G5: classification + isolated objects (left-anti join)
    "m5_isolated" -> ((s, _) => {
      val catalog = CatalogSource.fixtureCatalog(s).toDF()
        .filter(!col("database").isin("system", "INFORMATION_SCHEMA", "information_schema"))
      val objs = catalog.select(concat_ws(".", col("database"), col("name")).as("id"))
      DependencyGraph.isolated(objs, fixtureEdges(s))
    }),

    // transitive closure: multi-hop lineage with shortest depth
    "m6_closure" -> ((s, _) =>
      DependencyGraph.transitiveClosure(fixtureEdges(s))
        .orderBy("src", "dst")),

    // ===== relational operators over the TPC-H-ish testdata =====

    // scan → filter → hash agg (sum/avg/count) → sort  [TPC-H Q1 shape]
    "q1_pricing_summary" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").as("sum_qty"),
          sum(decimal(col("l_extendedprice"))).cast(DoubleType).as("sum_base_price"),
          sum(decimal(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 18, 4))
            .cast(DoubleType).as("sum_disc_price"),
          round(avg("l_quantity"), 6).as("avg_qty"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // two joins (one broadcast dim) → agg → sort
    "q2_revenue_by_nation" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val cust = tbl(s, dir, "customer")
      val nation = tbl(s, dir, "nation")
      orders.join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(decimal(col("o_totalprice"))).cast(DoubleType).as("revenue"),
          count(lit(1)).as("n_orders"))
        .orderBy("n_name")
    }),

    // 3-way join → filtered agg → top-N with deterministic tie-break  [Q3 shape]
    "q3_top_orders" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val orders = tbl(s, dir, "orders")
      val li = tbl(s, dir, "lineitem")
      cust.join(orders, col("c_custkey") === col("o_custkey"))
        .join(li, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate").cast(DateType).as("o_date"))
        .agg(sum(decimal(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 18, 4))
          .cast(DoubleType).as("revenue"))
        .orderBy(desc("revenue"), col("o_orderkey"))
        .limit(10)
    }),

    // left-semi join (EXISTS)  [Q4 shape]
    "q4_semi_join" -> ((s, dir) => {
      val orders = tbl(s, dir, "orders")
      val big = tbl(s, dir, "lineitem").filter(col("l_quantity") > 45)
      orders.join(big, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority").agg(count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    }),

    // left-anti join (NOT EXISTS)
    "q5_anti_join" -> ((s, dir) => {
      val cust = tbl(s, dir, "customer")
      val orders = tbl(s, dir, "orders")
      cust.join(orders, col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name").orderBy("c_custkey")
    }),

    // highly selective scan-filter-agg; pushdown-friendly  [TPC-H Q6 shape]
    "q6_forecast_revenue" -> ((s, dir) =>
      tbl(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1997-01-01").cast(TimestampType) &&
          col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
        .agg(sum(decimal(col("l_extendedprice") * col("l_discount"), 18, 4))
          .cast(DoubleType).as("revenue"))),

    // SELECT DISTINCT
    "q7_distinct" -> ((s, dir) =>
      tbl(s, dir, "lineitem").select("l_returnflag", "l_linestatus")
        .distinct().orderBy("l_returnflag", "l_linestatus")),

    // UNION (distinct) of two sources
    "q8_union" -> ((s, dir) =>
      tbl(s, dir, "customer").select(col("c_nationkey").as("nationkey"))
        .union(tbl(s, dir, "supplier").select(col("s_nationkey").as("nationkey")))
        .distinct().orderBy("nationkey")),

    // window: top-3 orders per customer (CH `LIMIT n BY` shape)
    "q9_window_topn" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(desc("o_totalprice"), col("o_orderkey"))
      tbl(s, dir, "orders")
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"), col("rn"))
        .orderBy("o_custkey", "rn")
    }),

    // window: running sum with explicit ROWS frame
    "q10_window_running" -> ((s, dir) => {
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_orderdate"), col("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      tbl(s, dir, "orders")
        .select(col("o_custkey"), col("o_orderkey"),
          sum(decimal(col("o_totalprice"))).over(w).cast(DoubleType).as("running_spend"))
        .orderBy("o_custkey", "o_orderkey")
    }))

  // ---- DuckDB oracles ---------------------------------------------------

  val oracles: Map[String, String] = Map(

    "m1_views_catalog" ->
      viewNames.map(v => s"('test','$v','View')")
        .mkString("SELECT * FROM (VALUES ", ", ",
          ") AS t(database, name, engine) ORDER BY database, name"),

    "m2_tables_catalog" ->
      tableNames.map(t => s"('test','$t','MergeTree')")
        .mkString("SELECT * FROM (VALUES ", ", ",
          ") AS t(database, name, engine) ORDER BY database, name"),

    "m3_lineage_edges" ->
      s"SELECT * FROM (VALUES $edgeValues) AS t(src, dst) ORDER BY src, dst",

    "m4_fanout" ->
      s"""SELECT src, count(*) AS fan_out FROM (VALUES $edgeValues) AS t(src, dst)
         |GROUP BY src ORDER BY fan_out DESC, src""".stripMargin,

    "m5_isolated" ->
      (tableNames.map(t => s"('test.$t')") ++ viewNames.map(v => s"('test.$v')"))
        .mkString("WITH objs(id) AS (VALUES ", ", ",
          s"""), e(src, dst) AS (VALUES $edgeValues)
             |SELECT id FROM objs
             |WHERE id NOT IN (SELECT src FROM e UNION SELECT dst FROM e)
             |ORDER BY id""".stripMargin),

    "m6_closure" ->
      s"""WITH RECURSIVE e(src, dst) AS (VALUES $edgeValues),
         |paths(src, dst, depth) AS (
         |  SELECT src, dst, 1 FROM e
         |  UNION ALL
         |  SELECT p.src, e.dst, p.depth + 1 FROM paths p JOIN e ON p.dst = e.src
         |  WHERE p.depth < 10)
         |SELECT src, dst, CAST(min(depth) AS INTEGER) AS depth
         |FROM paths GROUP BY src, dst ORDER BY src, dst""".stripMargin,

    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
        |  round(avg(l_quantity), 6) AS avg_qty,
        |  count(*) AS count_order
        |FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q2_revenue_by_nation" ->
      """SELECT n_name, CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
        |  count(*) AS n_orders
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name ORDER BY n_name""".stripMargin,

    "q3_top_orders" ->
      """SELECT o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
        |  CAST(sum(CAST(l_extendedprice * (1.0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON l_orderkey = o_orderkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, CAST(o_orderdate AS DATE)
        |ORDER BY revenue DESC, o_orderkey LIMIT 10""".stripMargin,

    "q4_semi_join" ->
      """SELECT o_orderpriority, count(*) AS n
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_quantity > 45)
        |GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "q5_anti_join" ->
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin,

    "q6_forecast_revenue" ->
      """SELECT CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        |  AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,

    "q7_distinct" ->
      """SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
        |ORDER BY l_returnflag, l_linestatus""".stripMargin,

    "q8_union" ->
      """SELECT c_nationkey AS nationkey FROM customer
        |UNION
        |SELECT s_nationkey FROM supplier
        |ORDER BY nationkey""".stripMargin,

    "q9_window_topn" ->
      """SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |    row_number() OVER (PARTITION BY o_custkey
        |                       ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |  FROM orders) WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,

    "q10_window_running" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(18,2)))
        |    OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_spend
        |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin)
}
