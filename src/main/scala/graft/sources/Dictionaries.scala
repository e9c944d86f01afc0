package graft.sources

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.{broadcast, col, element_at, lit, map}

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

  final case class DictDef(
      name: String,
      load: SparkSession => DataFrame,
      keyCol: String,
      attrs: Map[String, String]) // source column -> exposed attribute name

  private val registry = TrieMap.empty[String, DictDef]

  /** CREATE DICTIONARY from a parquet/csv/json path SOURCE. */
  def createFromPath(name: String, path: String, format: String,
      keyCol: String, attrs: Map[String, String]): Unit =
    registry.put(name,
      DictDef(name, s => TableFunctions.fileSource(s, path, format), keyCol, attrs))

  /** CREATE DICTIONARY from an arbitrary relation (CH `SOURCE(CLICKHOUSE)`
    * ≈ a catalog query). */
  def create(name: String, load: SparkSession => DataFrame,
      keyCol: String, attrs: Map[String, String]): Unit =
    registry.put(name, DictDef(name, load, keyCol, attrs))

  def drop(name: String): Unit = registry.remove(name)

  def exists(name: String): Boolean = registry.contains(name)

  def names: Seq[String] = registry.keys.toSeq.sorted

  def get(name: String): Option[DictDef] = registry.get(name)

  /** Scalar `dictHas('d', key)`: key-membership probe against the
    * RAM-resident key set (In/InSet after Catalyst optimization). */
  def dictHasLiteral(spark: SparkSession, dictName: String, key: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    val keys = d.load(spark).select(col(d.keyCol)).collect().map(_.get(0))
    require(keys.length <= 100000,
      s"dictionary $dictName too large for the scalar tier")
    if (keys.isEmpty) lit(false) else key.isin(keys.toSeq: _*)
  }

  /** Scalar `dictGet('d', 'attr', key)` (the CH expression form): CH
    * dictionaries are fully RAM-resident on every node, so the scalar
    * tier mirrors that exactly — the dictionary loads once at plan time
    * into a broadcast map literal and each row does a hash lookup
    * (GetMapValue, codegen'd). Bounded: literal maps cap at 100k entries;
    * past that use [[dictGet]], the broadcast-join tier. */
  def dictGetLiteral(spark: SparkSession, dictName: String, attr: String,
      key: Column): Column = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    val src = d.attrs.collectFirst { case (s, a) if a == attr => s }
      .getOrElse(throw new IllegalArgumentException(
        s"dictionary $dictName has no attribute '$attr'"))
    val rows = d.load(spark).select(col(d.keyCol), col(src)).collect()
    require(rows.length <= 100000,
      s"dictionary $dictName too large for the scalar tier " +
        s"(${rows.length} entries > 100k): use the dictGet join tier")
    if (rows.isEmpty) lit(null)
    else element_at(
      map(rows.toSeq.flatMap(r => Seq(lit(r.get(0)), lit(r.get(1)))): _*), key)
  }

  /** LIFETIME refresh / SYSTEM RELOAD DICTIONARY: invalidate any cached
    * file listing so the next lookup sees the current source. */
  def reload(spark: SparkSession, name: String): Unit =
    registry.get(name).foreach(_ => spark.catalog.clearCache())

  /** dictGet('name', attrs..., key): broadcast-hash left join against the
    * registered dictionary — zero fact-side shuffle. */
  def dictGet(facts: DataFrame, dictName: String, factKey: Column): DataFrame = {
    val d = registry.getOrElse(dictName,
      throw new IllegalArgumentException(s"unknown dictionary: $dictName"))
    val spark = facts.sparkSession
    val dict = d.load(spark).select(
      (col(d.keyCol).as("__dk") +:
        d.attrs.toSeq.map { case (src, dst) => col(src).as(dst) }): _*)
    facts.join(broadcast(dict), factKey === col("__dk"), "left").drop("__dk")
  }
}
