package graft.sources

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{array_contains, broadcast, coalesce,
  col, collect_list, count, element_at, lit, map_from_arrays,
  raise_error, sort_array, struct, when}

/** `CREATE DICTIONARY` execution (createDictionaryStmt,
  * ClickHouseParser.py:4005-4048): a named external lookup table with a
  * key, typed attributes, a SOURCE and a LAYOUT.
  *
  * Spark mapping: every CH layout (FLAT / HASHED / CACHE / DIRECT) is a
  * size tier of the same thing — a key-addressed map consulted per row.
  * The Spark-native equivalent for all of them is a broadcast hash
  * relation: the dictionary DataFrame broadcasts once per query and the
  * lookup is a broadcast-hash left join ([[graft.operators.ChOps.dictGet]]),
  * so the fact side NEVER shuffles — the property that makes dictGet
  * viable inside a 100 TB scan. LIFETIME (refresh period) maps to
  * [[reload]], which re-reads the source path — the hook that
  * `SYSTEM RELOAD DICTIONARY` ([[graft.operators.AdminOps.system]]) calls.
  *
  * The registry is process-local by design: dictionaries are session
  * state in ClickHouse too; on a cluster the registered source path is
  * what travels, the broadcast happens per query.
  */
object Dictionaries {

  /** `range`: `RANGE(MIN lo MAX hi)` of a `LAYOUT(RANGE_HASHED())`
    * dictionary (rangeClause, ClickHouseParser.py:4005-4048) — the two
    * source columns bounding each row's validity interval. None = point
    * dictionary (FLAT/HASHED/CACHE/DIRECT, all the same broadcast map). */
  final case class DictDef(
      name: String,
      load: SparkSession => DataFrame,
      keyCol: String,
      attrs: Map[String, String], // source column -> exposed attribute name
      range: Option[(String, String)] = None)

  private val registry = TrieMap.empty[String, DictDef]

  /** CH dictionaries are loaded once and RAM-resident until reload; the
    * Spark twin of "loaded" is a resolved DataFrame (schema inference —
    * a small Spark job for file sources — already done). Caching it here
    * keeps dictGet translation side-effect-free: referencing a
    * dictionary in a query fires zero jobs. */
  private val frameCache = TrieMap.empty[String, DataFrame]

  /** The dictionary's resolved source frame (cached until reload/drop). */
  def loaded(spark: SparkSession, name: String): DataFrame = {
    val d = registry.getOrElse(name,
      throw new IllegalArgumentException(s"unknown dictionary: $name"))
    frameCache.getOrElseUpdate(name, d.load(spark))
  }

  /** CREATE DICTIONARY from a parquet/csv/json path SOURCE. */
  def createFromPath(name: String, path: String, format: String,
      keyCol: String, attrs: Map[String, String],
      range: Option[(String, String)] = None): Unit = {
    frameCache.remove(name)
    registry.put(name, DictDef(name,
      s => TableFunctions.fileSource(s, path, format), keyCol, attrs, range))
  }

  /** CREATE DICTIONARY from an arbitrary relation (CH `SOURCE(CLICKHOUSE)`
    * ≈ a catalog query). */
  def create(name: String, load: SparkSession => DataFrame,
      keyCol: String, attrs: Map[String, String],
      range: Option[(String, String)] = None): Unit = {
    frameCache.remove(name)
    registry.put(name, DictDef(name, load, keyCol, attrs, range))
  }

  /** Re-register a previously captured definition verbatim (ATTACH
    * DICTIONARY) — preserves the range clause and source closure. */
  def register(d: DictDef): Unit = {
    frameCache.remove(d.name)
    registry.put(d.name, d)
  }

  def drop(name: String): Unit = { frameCache.remove(name); registry.remove(name) }

  def exists(name: String): Boolean = registry.contains(name)

  def names: Seq[String] = registry.keys.toSeq.sorted

  def get(name: String): Option[DictDef] = registry.get(name)

  /** The scalar tier caps at CH's RAM-resident-dictionary scale; past
    * this, [[dictGet]] (the broadcast-join tier) is the right shape. The
    * cap is enforced INSIDE the subquery (raise_error), so an oversized
    * dictionary fails at action time with a clear message instead of
    * OOMing the driver. */
  private val ScalarCap = 100000

  private def capGuard(dictName: String, payload: Column): Column =
    when(count(lit(1)) > ScalarCap, raise_error(lit(
      s"dictionary $dictName too large for the scalar tier " +
        s"(> $ScalarCap entries): use the dictGet join tier")))
      .otherwise(payload)

  /** Scalar `dictHas('d', key)`: key-membership probe. Lazy — the key
    * set rides as a one-row array scalar subquery inside the plan (zero
    * jobs at translate time; Catalyst executes the subplan once per
    * action and reuses it across references). */
  def dictHasLiteral(spark: SparkSession, dictName: String, key: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    val keysDf = loaded(spark, dictName)
      .agg(capGuard(dictName, collect_list(col(d.keyCol))).as("ks"))
    coalesce(array_contains(
      org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery(keysDf),
      key), lit(false))
  }

  /** Scalar `dictGet('d', 'attr', key)` (the CH expression form): CH
    * dictionaries are fully RAM-resident on every node; the scalar tier
    * mirrors that as a one-row map scalar subquery — the whole dictionary
    * folds to a map once per action, each row does a hash lookup
    * (GetMapValue, codegen'd). Planning stays side-effect-free: no data
    * is touched until the outer query runs (same contract as the lazy
    * scalar/EXISTS subqueries). */
  def dictGetLiteral(spark: SparkSession, dictName: String, attr: String,
      key: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    require(d.range.isEmpty,
      s"dictionary $dictName is RANGE_HASHED: dictGet needs a range point " +
        "argument — dictGet(dict, attr, key, point)")
    val src = d.attrs.collectFirst { case (s, a) if a == attr => s }
      .getOrElse(throw new IllegalArgumentException(
        s"dictionary $dictName has no attribute '$attr'"))
    val mapDf = loaded(spark, dictName).agg(capGuard(dictName,
      map_from_arrays(collect_list(col(d.keyCol)), collect_list(col(src))))
      .as("m"))
    element_at(
      org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery(mapDf), key)
  }

  /** The RANGE_HASHED dictionary as a one-row scalar-subquery map:
    * key -> ascending-sorted array of (lo, hi, value) intervals. Sorting
    * by the struct (lo first field) makes the overlapping-range pick
    * deterministic and equal to CH's default `range_lookup_strategy =
    * 'min'` — the matching interval with the smallest lower bound wins. */
  private def rangeMapScalar(spark: SparkSession, d: DictDef,
      src: String): Column = {
    val (lo, hi) = d.range.get
    val perKey = loaded(spark, d.name).groupBy(col(d.keyCol))
      .agg(sort_array(collect_list(struct(
        col(lo).as("lo"), col(hi).as("hi"), col(src).as("v")))).as("rs"))
    val mapDf = perKey.agg(capGuard(d.name,
      map_from_arrays(collect_list(col(d.keyCol)), collect_list(col("rs"))))
      .as("m"))
    org.apache.spark.sql.graftbridge.ColumnBridge.scalarSubquery(mapDf)
  }

  /** The probe point cast to the range-bound column's type — date
    * probes against Date bounds, timestamps against DateTime, without
    * the caller having to know the dictionary's declared types. */
  private def castPoint(spark: SparkSession, d: DictDef, point: Column): Column =
    point.cast(loaded(spark, d.name).schema(d.range.get._1).dataType)

  /** Scalar `dictGet('d', 'attr', key, point)` over a RANGE_HASHED
    * dictionary: hash-lookup the key's interval array, then a native
    * early-exit scan ([[graft.plans.NativeExpressions.RangeFirst]] —
    * Spark forbids HOF lambdas over scalar subqueries) finds the first
    * containing interval (= smallest lo, CH's default
    * `range_lookup_strategy = 'min'`). Null on miss — same contract as
    * the point tier; `dictGetOrDefault` adds the fallback. */
  def dictGetRangeLiteral(spark: SparkSession, dictName: String, attr: String,
      key: Column, point: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    require(d.range.isDefined,
      s"dictionary $dictName is not RANGE_HASHED: dictGet takes (dict, attr, key)")
    val src = d.attrs.collectFirst { case (s, a) if a == attr => s }
      .getOrElse(throw new IllegalArgumentException(
        s"dictionary $dictName has no attribute '$attr'"))
    val arr = element_at(rangeMapScalar(spark, d, src), key)
    graft.plans.NativeExpressions.range_first(
      arr, castPoint(spark, d, point))("v")
  }

  /** Scalar `dictHas('d', key, point)`: true iff some interval of the
    * key contains the point. */
  def dictHasRangeLiteral(spark: SparkSession, dictName: String,
      key: Column, point: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    require(d.range.isDefined,
      s"dictionary $dictName is not RANGE_HASHED: dictHas takes (dict, key)")
    val (_, hiC) = d.range.get
    val arr = element_at(rangeMapScalar(spark, d, hiC), key)
    graft.plans.NativeExpressions.range_first(
      arr, castPoint(spark, d, point)).isNotNull
  }

  /** LIFETIME refresh / SYSTEM RELOAD DICTIONARY: invalidate any cached
    * file listing so the next lookup sees the current source. */
  def reload(spark: SparkSession, name: String): Unit =
    registry.get(name).foreach { _ =>
      frameCache.remove(name) // next reference re-lists + re-resolves
      spark.catalog.clearCache()
    }

  /** dictGet('name', attrs..., key): broadcast-hash left join against the
    * registered dictionary — zero fact-side shuffle. */
  def dictGet(facts: DataFrame, dictName: String, factKey: Column): DataFrame = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    require(d.range.isEmpty,
      s"dictionary $dictName is RANGE_HASHED: use dictGetRange(facts, dict, key, point)")
    val spark = facts.sparkSession
    val dict = loaded(spark, dictName).select(
      (col(d.keyCol).as("__dk") +:
        d.attrs.toSeq.map { case (src, dst) => col(src).as(dst) }): _*)
    facts.join(broadcast(dict), factKey === col("__dk"), "left").drop("__dk")
  }

  /** Join tier for RANGE_HASHED dictionaries: pre-collapse the dictionary
    * to one row per key (sorted interval array — small: dictionary-scale),
    * broadcast it, equi-join on the key alone (broadcast hash, zero
    * fact-side shuffle — a range predicate in the join condition would
    * force a nested-loop join), then resolve the point against the
    * interval array row-locally with the same min-strategy pick as the
    * scalar tier. */
  def dictGetRange(facts: DataFrame, dictName: String, factKey: Column,
      factPoint: Column): DataFrame = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    val (lo, hi) = d.range.getOrElse(throw new IllegalArgumentException(
      s"dictionary $dictName is not RANGE_HASHED: use dictGet(facts, dict, key)"))
    val spark = facts.sparkSession
    val dict = loaded(spark, dictName).groupBy(col(d.keyCol).as("__dk"))
      .agg(sort_array(collect_list(struct(
        (Seq(col(lo).as("lo"), col(hi).as("hi")) ++
          d.attrs.toSeq.map { case (src, dst) => col(src).as(dst) }): _*)))
        .as("__rs"))
    val joined = facts.join(broadcast(dict), factKey === col("__dk"), "left")
    val hit = graft.plans.NativeExpressions.range_first(
      col("__rs"), castPoint(spark, d, factPoint))
    d.attrs.values.toSeq.sorted
      .foldLeft(joined) { (df, a) => df.withColumn(a, hit(a)) }
      .drop("__dk", "__rs")
  }
}
