package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, EqualTo, Expression, In, Literal, XxHash64}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{
  HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions._

/** Bloom-filter data-skipping index — the Spark twin of ClickHouse's
  * `INDEX i c TYPE bloom_filter` (AlterTableClauseAddIndex,
  * ClickHouseParser.py:2178-2241; tableIndexDfnt). CH stores a bloom
  * per granule and skips granules for equality-class predicates on
  * UNSORTED high-cardinality columns — exactly the case min/max stats
  * (our minmax/set twin: clustered parquet row groups) cannot prune.
  * Here the natural granule at rest is the parquet FILE:
  *
  *  - '''build''' ([[materialize]]): one scan groups the indexed
  *    column's K=3 `xxhash64(value, seed) mod 2^16` bit positions per
  *    file (`input_file_name`), storing the DISTINCT positions as a
  *    sorted int array in a sidecar table `<table>__bloom_<column>` —
  *    a few KB per file, SQL-replayable (a packed bitset would be
  *    opaque to the oracle and to debugging; at 100 TB the sidecar is
  *    still ~file-count-sized, i.e. metadata-scale);
  *  - '''serve''' ([[BloomPruneRule]]): an optimizer rule matches
  *    `Filter` conjuncts of shape `col = lit` / `col IN (lits)` on a
  *    bloom-indexed column directly above the table's file scan,
  *    probes the sidecar (driver-side — it is file-count-sized), and
  *    rewrites the scan's file index to only the files whose bloom
  *    may contain a probe value. No false negatives by construction:
  *    a file is dropped only if NO probe value has all K bits set.
  *    Files unknown to the sidecar (written after MATERIALIZE) are
  *    always kept — same keep-on-unknown contract CH applies to
  *    not-yet-materialized parts.
  *
  * Partitioned layouts compose (r12c): pruning rides a delegating
  * [[BloomPrunedFileIndex]] over the relation's own index, so partition
  * discovery/VALUES/pruning pass through untouched — partition filters
  * drop directories, the bloom drops files inside the survivors (the
  * case partition pruning alone cannot touch: a selective predicate on
  * a NON-partition column of a partitioned table).
  *
  * Scope bounds (each refused/skipped honestly, not silently wrong):
  * bare-attribute probes only (a cast around the column changes the
  * hashed type), non-null literal probes of the column's exact type.
  */
object BloomSkipIndex {
  val NumBits = 1 << 16
  val NumHashes = 3
  /** CH token boundary: tokens are maximal [A-Za-z0-9_]+ runs (the
    * hasToken/tokenbf_v1 contract). The SAME regex literal appears in
    * ChSql's hasToken translation — the prune rule matches on it. */
  val TokenSplitRe = "[^A-Za-z0-9_]+"
  /** Option key tagging an already-pruned relation (the rule runs in a
    * fixed-point batch; pruning must be idempotent). */
  private val PrunedTag = "graft.bloom.pruned"

  def sidecarName(table: String, column: String): String =
    s"${table.replace('.', '_')}__bloom_$column"

  /** tokenbf_v1 sidecar: bloom over the column's TOKENS, not its
    * values — serves hasToken(col, 'tok') predicates. */
  def tokenSidecarName(table: String, column: String): String =
    s"${table.replace('.', '_')}__tokbloom_$column"

  /** ngrambf_v1: bloom over character n-grams — serves substring
    * predicates (`LIKE '%pat%'` and friends) that no other index can. */
  val NgramN = 4
  def ngramSidecarName(table: String, column: String): String =
    s"${table.replace('.', '_')}__ngrambloom_$column"

  /** The K bit positions of one column expression — the SAME Catalyst
    * xxhash64 evaluates build-side (executor scan) and probe-side
    * (driver literal), so the two can never drift. */
  private def bitCols(c: org.apache.spark.sql.Column) =
    (0 until NumHashes).map(seed =>
      pmod(xxhash64(c, lit(seed)), lit(NumBits.toLong)).cast("int"))

  /** Build (or rebuild) the sidecar for `table.column`: one
    * map-combinable pass — explode K positions per row, distinct per
    * file, pack sorted. Overwrites any prior build. */
  def materialize(spark: SparkSession, table: String, column: String): String =
    buildSidecar(spark, table, column, sidecarName(table, column),
      v => array(bitCols(v): _*), spread = false)

  /** tokenbf_v1 build: the same bit machinery over the column's TOKENS
    * (flatten K positions per token). */
  def materializeTokens(spark: SparkSession, table: String,
      column: String): String =
    buildSidecar(spark, table, column, tokenSidecarName(table, column),
      v => flatten(transform(
        filter(split(v, TokenSplitRe), t => length(t) > 0),
        t => array(bitCols(t): _*))), spread = false)

  /** ngrambf_v1 build: every character [[NgramN]]-gram of every value.
    * Values shorter than N contribute nothing — and predicates shorter
    * than N never prune, so short values can never be wrongly dropped. */
  def materializeNgrams(spark: SparkSession, table: String,
      column: String): String =
    buildSidecar(spark, table, column, ngramSidecarName(table, column),
      v => flatten(transform(
        when(length(v) >= NgramN,
          transform(sequence(lit(1), length(v) - (NgramN - 1)),
            i => v.substr(i, lit(NgramN))))
          .otherwise(typedLit(Seq.empty[String])),
        g => array(bitCols(g): _*))))

  private def buildSidecar(spark: SparkSession, table: String,
      column: String, side: String,
      rowBits: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      spread: Boolean = true): String = {
    val df = spark.table(table)
    require(df.columns.contains(column),
      s"bloom index: no column $column in $table")
    // per-row bit positions stay an ARRAY folded by the bitset-OR
    // aggregate (8 KB fixed state/partition) — no per-bit explode rows
    // ever cross the shuffle; the build is scan-bound. Sidecar rows
    // store the PACKED words (r14): a fixed 8 KB per file at rest and
    // in the driver probe cache, independent of bit density — the
    // unpacked boxed Set[Int] form cost ~48 B/bit ≈ 3 MB per dense file,
    // unserveable driver memory at the ~10⁶-file scale this targets
    // fan out BETWEEN the file-name capture and the per-row bit compute
    // (r15): the hash/ngram bit pass is the build's CPU, and a table
    // written as one file ran it as one task; bitset-OR is commutative
    // and the partial agg keeps 8 KB state per (file, task), so the
    // redistribution changes nothing about the sidecar. No-op at
    // production file counts (fanOut's partition guard).
    // `spread` is ON only for the ngram build, whose per-row bit pass
    // (every character N-gram x K hashes) is the one expensive enough to
    // repay the redistribution — measured: ngram build 2.9s -> 1.0s, but
    // the cheap value/token bit passes LOST 0.3-0.8s to the same shuffle
    val captured = df.select(input_file_name().as("file"), col(column).as("v"))
    val bits = (if (spread) ScaleShape.fanOut(captured, col("file"), col("v"))
        else captured)
      .select(col("file"), rowBits(col("v")).as("rb"))
      .groupBy("file")
      .agg(BitsetOrAgg.bitsetOrPacked(col("rb"), NumBits).as("bits"))
    // STAGE + SWAP (r13): the build lands in a scratch table first, then
    // replaces the live sidecar with two catalog ops — the sidecar frame
    // never round-trips through the driver (the r12 collect +
    // parallelize(rows, 1) guard was file-count-sized: ~10⁶ rows ×
    // up-to-2¹⁶-entry arrays at 100 TB), and a reader can never observe
    // a half-written live sidecar. repartition(1) keeps the agg parallel
    // and ships the metadata-scale result through one exchange.
    val stage = side + "__stage"
    def clearDir(t: String): Unit = {
      // a prior session's managed-table directory may linger in the
      // warehouse after the catalog forgot the table (fresh metastore
      // per run) — clear it, or saveAsTable/RENAME refuses with
      // LOCATION_ALREADY_EXISTS
      val wh = spark.conf.get("spark.sql.warehouse.dir")
      val loc = new org.apache.hadoop.fs.Path(wh, t.toLowerCase)
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
    }
    spark.sql(s"DROP TABLE IF EXISTS $stage")
    clearDir(stage)
    bits.repartition(1).write.mode("overwrite").saveAsTable(stage)
    spark.sql(s"DROP TABLE IF EXISTS $side")
    clearDir(side)
    spark.sql(s"ALTER TABLE $stage RENAME TO $side")
    invalidate(side)
    side
  }

  // ---- driver-side probe-map cache (r13; representation + bounds r14) ----
  // BloomPruneRule fires on every planning pass; re-collecting the
  // sidecar each time made the OPTIMIZER pay a file-count-sized driver
  // read per query (fine at sandbox scale, a planning-latency killer at
  // 100 TB: ~10⁶ files × up-to-2¹⁶-entry int arrays). The probe map
  // loads once per (re)build: buildSidecar is the only writer and
  // invalidates its entry on swap; DROP INDEX invalidates explicitly,
  // and ChDdl invalidates on any plain DROP TABLE of a sidecar name.
  //
  // r14 representation: per-file bits are the PACKED Array[Long] words
  // (8 KB fixed, density-independent) probed by bit-test — the boxed
  // Set[Int] form cost ~48 B/entry (≈3 MB per dense file, ~400× this).
  // The cache is BOUNDED (LRU, MaxCachedSidecars entries): it can no
  // longer grow one entry per sidecar forever in a long-lived session.
  //
  // entry identity = (createTime, location): a sidecar dropped and
  // re-created OUT-OF-BAND (not through buildSidecar/DROP INDEX, which
  // invalidate explicitly) gets a fresh createTime — and if relocated,
  // a fresh location — so the stale map is discarded instead of trusted
  // on name identity alone. The check is one catalog metadata lookup
  // per planning pass, never a data read. (Residual window: an
  // out-of-band drop+recreate at the SAME location within the SAME
  // millisecond is indistinguishable; builds through buildSidecar never
  // hit it — they invalidate explicitly.)
  private final case class SidecarId(createTime: Long, location: String)
  private val MaxCachedSidecars = 64
  private val probeCache = new java.util.LinkedHashMap[
      String, (SidecarId, Map[String, Array[Long]])](16, 0.75f, true) {
    override def removeEldestEntry(
        e: java.util.Map.Entry[String, (SidecarId, Map[String, Array[Long]])])
        : Boolean = size() > MaxCachedSidecars
  }

  /** Count of sidecar loads that actually hit the store (cache misses) —
    * the observability hook for the one-read-per-build pin. */
  private[graft] val sidecarLoads =
    new java.util.concurrent.atomic.AtomicLong(0)

  /** Drop the cached probe map for a sidecar (rebuild/drop paths). */
  def invalidate(side: String): Unit =
    probeCache.synchronized { probeCache.remove(side.toLowerCase) }

  /** True iff every bit position in `want` is set in the packed words. */
  private[plans] def containsAll(bits: Array[Long], want: Set[Int]): Boolean =
    want.forall { b =>
      val w = b >>> 6
      w < bits.length && (bits(w) & (1L << (b & 63))) != 0L
    }

  private[graft] def probeMap(spark: SparkSession,
      side: String): Map[String, Array[Long]] = {
    val meta = spark.sessionState.catalog.getTableMetadata(
      org.apache.spark.sql.catalyst.TableIdentifier(side.toLowerCase))
    val id = SidecarId(meta.createTime,
      meta.storage.locationUri.map(_.toString).getOrElse(""))
    val key = side.toLowerCase
    // optimistic load OUTSIDE the lock (r14 ADVICE): collecting a Spark
    // job while holding the map's lock would block every concurrent
    // planning thread for the job's duration (and a re-entrant load
    // would deadlock); a racing duplicate load is rare and harmless —
    // last writer wins with an identical map
    probeCache.synchronized(Option(probeCache.get(key))) match {
      case Some((cachedId, m)) if cachedId == id => m
      case _ =>
        sidecarLoads.incrementAndGet()
        val df = spark.table(side)
        val packed = df.schema(1).dataType match {
          case org.apache.spark.sql.types.ArrayType(
            org.apache.spark.sql.types.LongType, _) => true
          case _ => false // legacy unpacked sidecar (pre-r14 build)
        }
        val m = df.collect().map { r =>
          val bits =
            if (packed) r.getSeq[Long](1).toArray
            else {
              val words = new Array[Long](NumBits / 64)
              r.getSeq[Int](1).foreach(b => words(b >>> 6) |= 1L << (b & 63))
              words
            }
          fileKey(r.getString(0)) -> bits
        }.toMap
        probeCache.synchronized { probeCache.put(key, (id, m)) }
        m
    }
  }

  /** Register the pruning rule in a live session (idempotent). */
  def install(spark: SparkSession): Unit = {
    val has = spark.experimental.extraOptimizations
      .exists(_.isInstanceOf[BloomPruneRule])
    if (!has)
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ BloomPruneRule(spark)
  }

  /** Bloom-indexed columns of a catalog table: `graft.bloomindex.<idx>`
    * table properties, value = column name. */
  def indexedColumns(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith("graft.bloomindex.") =>
      k.stripPrefix("graft.bloomindex.") -> v }

  /** tokenbf_v1-indexed columns: `graft.tokbloomindex.<idx>`. */
  def tokenIndexedColumns(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith("graft.tokbloomindex.") =>
      k.stripPrefix("graft.tokbloomindex.") -> v }

  /** ngrambf_v1-indexed columns: `graft.ngrambloomindex.<idx>`. */
  def ngramIndexedColumns(props: Map[String, String]): Map[String, String] =
    props.collect { case (k, v) if k.startsWith("graft.ngrambloomindex.") =>
      k.stripPrefix("graft.ngrambloomindex.") -> v }

  /** Sidecar rows key files by `input_file_name()` URIs; a relation's
    * `inputFiles` / listing may render the scheme differently
    * (`file:///x` vs `file:/x`, percent-encoding). Compare by the
    * decoded URI PATH — the full path, not the final segment: a
    * partitioned write reuses task file names across partition
    * directories (`p=0/part-00001-<uuid>` and `p=1/part-00001-<uuid>`),
    * so leaf names alone collide and would apply one directory's bloom
    * to the other's file (observed as false pruning in the r12c
    * partitioned-compose pin). A path the URI parser rejects keeps its
    * raw form — a key mismatch then fails SAFE (unknown file → kept). */
  private[plans] def fileKey(path: String): String = {
    val p =
      try {
        val u = new java.net.URI(path)
        if (u.getPath != null && u.getPath.nonEmpty) u.getPath else path
      } catch { case _: java.net.URISyntaxException => path }
    p.replaceAll("^/+", "/")
  }

  /** Driver-side probe bits for one literal — the same XxHash64
    * expression the build ran, evaluated over the literal. */
  private[plans] def probeBits(v: Literal): Seq[Int] =
    (0 until NumHashes).map { seed =>
      val h = XxHash64(Seq(v, Literal(seed)), 42L).eval(null)
        .asInstanceOf[Long]
      (((h % NumBits) + NumBits) % NumBits).toInt
    }

  /** Extract (column → probe literals) from the filter's top-level
    * conjuncts, for columns in `cols`. Sound for pruning: a row
    * satisfying `col = v` (or a positive IN arm) lives in a file whose
    * bloom contains v. */
  private[plans] def probesOf(cond: Expression,
      cols: Set[String]): Map[String, Seq[Literal]] = {
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).flatMap {
      case EqualTo(a: AttributeReference, l: Literal)
          if cols.contains(a.name) && l.value != null =>
        Some(a.name -> Seq(l))
      case EqualTo(l: Literal, a: AttributeReference)
          if cols.contains(a.name) && l.value != null =>
        Some(a.name -> Seq(l))
      case In(a: AttributeReference, vs)
          if cols.contains(a.name) && vs.nonEmpty &&
            vs.forall { case l: Literal => true; case _ => false } =>
        // null IN-arms never positively match; prune on the non-null ones
        val lits = vs.collect { case l: Literal if l.value != null => l }
        if (lits.nonEmpty) Some(a.name -> lits) else None
      case _ => None
    }.groupBy(_._1).map { case (k, vs) => k -> vs.flatMap(_._2) }
  }

  /** Token probes: top-level conjuncts of the exact shape ChSql's
    * hasToken translation emits — `array_contains(split(col,
    * TokenSplitRe), 'tok')`. Sound: hasToken true ⇒ the token is a
    * member of the file's token set ⇒ the token bloom contains it. */
  private[plans] def tokenProbesOf(cond: Expression,
      cols: Set[String]): Map[String, Seq[Literal]] = {
    import org.apache.spark.sql.catalyst.expressions.{ArrayContains, StringSplit}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    conjuncts(cond).flatMap {
      case ArrayContains(
          StringSplit(a: AttributeReference, re: Literal, _),
          l: Literal)
          if cols.contains(a.name) && l.value != null &&
            re.value != null && re.value.toString == TokenSplitRe =>
        Some(a.name -> Seq(l))
      case _ => None
    }.groupBy(_._1).map { case (k, vs) => k -> vs.flatMap(_._2) }
  }

  /** N-gram probes: substring predicates. LikeSimplification has run by
    * the time the user batch fires, so `LIKE '%p%'` / `'p%'` / `'%p'`
    * appear as Contains/StartsWith/EndsWith over the bare attribute.
    * Each matching conjunct yields ONE required bit-set — the union of
    * its pattern's n-gram bits (a matching row's value contains EVERY
    * n-gram of the pattern). Patterns shorter than [[NgramN]] yield no
    * grams and never prune. */
  private[plans] def ngramProbesOf(cond: Expression,
      cols: Set[String]): Map[String, Seq[Set[Int]]] = {
    import org.apache.spark.sql.catalyst.expressions.{
      Contains, EndsWith, StartsWith}
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
        conjuncts(l) ++ conjuncts(r)
      case other => Seq(other)
    }
    def gramBits(pat: String): Option[Set[Int]] =
      if (pat == null || pat.length < NgramN) None
      else Some(pat.sliding(NgramN)
        .flatMap(g => probeBits(Literal(g))).toSet)
    conjuncts(cond).flatMap {
      case Contains(a: AttributeReference, l: Literal)
          if cols.contains(a.name) && l.value != null =>
        gramBits(l.value.toString).map(a.name -> _)
      case StartsWith(a: AttributeReference, l: Literal)
          if cols.contains(a.name) && l.value != null =>
        gramBits(l.value.toString).map(a.name -> _)
      case EndsWith(a: AttributeReference, l: Literal)
          if cols.contains(a.name) && l.value != null =>
        gramBits(l.value.toString).map(a.name -> _)
      case _ => None
    }.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
  }
}

/** The serve-side optimizer rule (see [[BloomSkipIndex]]). Installed per
  * session by ADD INDEX ... TYPE bloom_filter, or cluster-wide via
  * `spark.sql.extensions=graft.plans.GraftExtensions`. */
case class BloomPruneRule(spark: SparkSession) extends Rule[LogicalPlan] {
  import BloomSkipIndex._

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond,
        l @ LogicalRelation(fs: HadoopFsRelation, _, Some(cat), _, _))
        if !fs.options.contains("graft.bloom.pruned") =>
      val table = cat.identifier.table
      val eqCols = indexedColumns(cat.properties).values.toSet
      val tokCols = tokenIndexedColumns(cat.properties).values.toSet
      val ngCols = ngramIndexedColumns(cat.properties).values.toSet
      if (eqCols.isEmpty && tokCols.isEmpty && ngCols.isEmpty) f
      else {
        // each entry: (sidecar, alternatives) — a file survives an entry
        // if ANY alternative's required bit-set is fully present
        val probes =
          probesOf(cond, eqCols).toSeq.map { case (c, lits) =>
            (sidecarName(table, c), lits.map(probeBits(_).toSet)) } ++
          tokenProbesOf(cond, tokCols).toSeq.map { case (c, lits) =>
            (tokenSidecarName(table, c), lits.map(probeBits(_).toSet)) } ++
          ngramProbesOf(cond, ngCols).toSeq.map { case (c, alts) =>
            (ngramSidecarName(table, c), alts) }
        if (probes.isEmpty) f
        else prune(f, l, fs, probes)
      }
  }

  private def prune(f: Filter, l: LogicalRelation, fs: HadoopFsRelation,
      probes: Seq[(String, Seq[Set[Int]])]): LogicalPlan = {
    val allFiles = fs.location.inputFiles
    // one surviving-file set per probed (sidecar, alternatives) group; a
    // kept file must pass EVERY probed bloom (conjunct semantics)
    val kept = probes.foldLeft(allFiles.toSeq) { case (files, (side, alts)) =>
      if (!spark.catalog.tableExists(side)) files // not materialized: keep
      else {
        val bitsByFile: Map[String, Array[Long]] = probeMap(spark, side)
        files.filter { path =>
          bitsByFile.get(fileKey(path)) match {
            case None => true // file newer than the build: keep
            case Some(bits) => alts.exists(containsAll(bits, _))
          }
        }
      }
    }
    if (kept.size == allFiles.length) f
    else {
      // delegate to the original index, filtered to the surviving files —
      // partition discovery/pruning, partition VALUES, and metadata all
      // pass straight through, so partitioned layouts compose: partition
      // pruning drops directories, the bloom drops files inside the
      // survivors (r12b shipped unpartitioned-only via an InMemoryFileIndex
      // rebuild, which would have lost partition values from leaf paths).
      // The index carries the DROPPED set, not the kept set: a file the
      // probe never saw (appearing via refresh()/concurrent writes, or a
      // path the two listing surfaces render differently) then passes
      // through — the same keep-on-unknown fail-safe fileKey documents
      val keptKeys = kept.map(fileKey).toSet
      val dropped = allFiles.iterator.map(fileKey)
        .filterNot(keptKeys.contains).toSet
      val newLoc = BloomPrunedFileIndex(fs.location, dropped)
      val pruned = fs.copy(location = newLoc,
        options = fs.options + ("graft.bloom.pruned" -> "true"))(spark)
      Filter(f.condition, l.copy(relation = pruned))
    }
  }

}

/** The surviving-file view of a relation's FileIndex after a bloom probe:
  * every listing is delegated to the original index with the bloom-
  * rejected files removed, so partition discovery, partition VALUES and
  * partition pruning compose unchanged — on a partitioned layout the
  * partition filter drops directories first, then the bloom drops files
  * inside the surviving directories (the case partition pruning alone
  * cannot touch: a selective predicate on a NON-partition column).
  * `dropped` holds the file keys ([[BloomSkipIndex.fileKey]]) the probe
  * POSITIVELY rejected — filtering by exclusion keeps the fail-safe
  * total: a file unknown to the probe snapshot (a refresh()/concurrent
  * write, or a path one listing surface renders differently) is never
  * in `dropped` and passes through. Directories left empty disappear
  * from the listing. */
private[graft] case class BloomPrunedFileIndex(
    underlying: org.apache.spark.sql.execution.datasources.FileIndex,
    dropped: Set[String])
  extends org.apache.spark.sql.execution.datasources.FileIndex {
  import BloomSkipIndex.fileKey
  override def rootPaths: Seq[org.apache.hadoop.fs.Path] =
    underlying.rootPaths
  override def listFiles(
      partitionFilters: Seq[Expression], dataFilters: Seq[Expression])
      : Seq[org.apache.spark.sql.execution.datasources.PartitionDirectory] =
    underlying.listFiles(partitionFilters, dataFilters)
      .map(pd => pd.copy(files =
        pd.files.filterNot(f => dropped.contains(fileKey(f.getPath.toString)))))
      .filter(_.files.nonEmpty)
  override def inputFiles: Array[String] =
    underlying.inputFiles.filterNot(p => dropped.contains(fileKey(p)))
  override def refresh(): Unit = underlying.refresh()
  // an upper bound is the contract (planner sizing only); refining it
  // would need a second listing pass for no planning benefit
  override def sizeInBytes: Long = underlying.sizeInBytes
  override def partitionSchema: org.apache.spark.sql.types.StructType =
    underlying.partitionSchema
}

/** Helper to read a table with pruning applied explicitly (the
  * rule-free entry point for tests and non-session use). */
object BloomPrunedRead {
  def apply(spark: SparkSession, table: String): DataFrame = {
    BloomSkipIndex.install(spark)
    spark.table(table)
  }
}
