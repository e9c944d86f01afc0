package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** ClickHouse SELECT constructs that Spark has no single operator for,
  * re-expressed as composed built-ins (preference (a) of the build rules —
  * every rewrite here stays inside whole-stage codegen and shuffles at most
  * once on the semantic key).
  *
  * Grammar surface covered (citations into /root/reference/generated_ch_parser/):
  *  - ASOF JOIN     — ClickHouseParser.py:10596-10645 (JoinOpInner/LeftRight ASOF)
  *  - ANY JOIN      — ClickHouseParser.py:10574-10645 (ANY modifier)
  *  - LIMIT n BY    — ClickHouseParser.py:10153-10206 (limitByClause)
  *  - WITH TOTALS   — ClickHouseParser.py:9129-9137
  *  - WITH FILL     — ClickHouseParser.py:11317-11352 + interpolate 10048-10102
  *  - SAMPLE k/m    — ClickHouseParser.py:11016-11083 (sampleClause)
  *  - LIMIT WITH TIES — ClickHouseParser.py:10223-10259
  */
object ChOps {

  /** ASOF LEFT JOIN: for each left row, the single right row with the
    * greatest `rightTs <= leftTs` within the same key group (ClickHouse
    * resolves the nearest match). With multiple right rows at an equal
    * (key, ts), the winner is the last in `tieBreak` ascending order when
    * `tieBreak` is given; with `tieBreak = Nil` the choice among exact
    * duplicates is NONDETERMINISTIC across runs — pass a tie-break (or
    * pre-aggregate the right side to one row per (key, ts), as the
    * shipped queries do) when the right side can carry such ties.
    *
    * Scale design: the naive formulation (range join + per-row max) is a
    * cartesian blow-up; this union-and-window form shuffles each side ONCE
    * on the key, sorts within partitions, and streams — the plan a
    * sort-merge asof join would produce natively. Skewed keys fall out of
    * AQE's skew handling since it is a plain window over a shuffle.
    *
    * Left columns are preserved; right value columns arrive as
    * `rightVals` struct fields (null when no match — LEFT semantics).
    */
  def asofJoinLeft(
      left: DataFrame,
      right: DataFrame,
      key: String,
      leftTs: String,
      rightTs: String,
      rightVals: Seq[String],
      tieBreak: Seq[String] = Nil
  ): DataFrame = {
    val leftCols = left.columns
    val tieType = right.select(tieBreak.map(col): _*).schema
      .fields.foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f))
    val leftTie = if (tieBreak.isEmpty) lit(0) else lit(null).cast(tieType)
    val rightTie = if (tieBreak.isEmpty) lit(0) else struct(tieBreak.map(col): _*)
    val l = left.select(
      col(key).as("__k"), col(leftTs).as("__ts"), lit(1).as("__side"),
      leftTie.as("__tie"),
      struct(leftCols.map(col): _*).as("__l"),
      lit(null).cast(right.select(rightVals.map(col): _*).schema
        .fields.foldLeft(new org.apache.spark.sql.types.StructType())((s, f) => s.add(f)))
        .as("__r"))
    val r = right.select(
      col(key).as("__k"), col(rightTs).as("__ts"), lit(0).as("__side"),
      rightTie.as("__tie"),
      lit(null).cast(l.schema("__l").dataType).as("__l"),
      struct(rightVals.map(col): _*).as("__r"))
    // right rows sort before left rows at equal ts (side 0 < 1) so an
    // exact-ts right row is visible to the left row — CH `<=` semantics;
    // __tie makes the winner among equal-(key, ts) right rows deterministic
    // (last in tie order wins, nulls-first keeps left rows unaffected).
    val w = Window.partitionBy("__k")
      .orderBy(col("__ts"), col("__side"), col("__tie").asc_nulls_first)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionByName(r)
      .withColumn("__match", last(col("__r"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .select(leftCols.map(c => col(s"__l.$c").as(c)) ++
        rightVals.map(c => col(s"__match.$c").as(c)): _*)
  }

  /** ASOF LEFT JOIN with a tolerance window: like [[asofJoinLeft]] but a
    * match older than `toleranceSeconds` before the left timestamp is
    * discarded (CH `ASOF JOIN ... ON k AND rts > lts - INTERVAL n`).
    * Implemented as the plain asof join + a post-match recency filter —
    * same single-shuffle plan. Emits the matched right timestamp as
    * `__match_ts` for the filter, then drops it. */
  def asofJoinLeftTolerance(
      left: DataFrame, right: DataFrame,
      key: String, leftTs: String, rightTs: String,
      rightVals: Seq[String], toleranceSeconds: Long
  ): DataFrame = {
    val joined = asofJoinLeft(left, right, key, leftTs, rightTs,
      rightVals :+ rightTs)
    val recent = col(rightTs).cast("timestamp").cast("double") >=
      col(leftTs).cast("timestamp").cast("double") - toleranceSeconds
    rightVals.foldLeft(joined) { (df, c) =>
      df.withColumn(c, when(recent, col(c)))
    }.drop(rightTs)
  }

  /** ANY LEFT JOIN: at most one right match per left row — ClickHouse keeps
    * a single arbitrary match; we make it deterministic by ranking the
    * right side on `pick` and keeping rank 1 (one shuffle of the right
    * side; the join itself then behaves like a 1:1 join). */
  def anyJoinLeft(
      left: DataFrame,
      right: DataFrame,
      usingKey: Seq[String],
      pick: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(usingKey.map(col): _*).orderBy(pick: _*)
    val one = right.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    left.join(one, usingKey, "left")
  }

  /** LIMIT n BY cols: top-n rows per group in `ord` order — the canonical
    * top-k-per-group window rewrite. */
  def limitBy(df: DataFrame, by: Seq[Column], ord: Seq[Column], n: Int,
      offset: Int = 0): DataFrame = {
    val w = Window.partitionBy(by: _*).orderBy(ord: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") > offset && col("__rn") <= offset + n)
      .drop("__rn")
  }

  /** LIMIT n WITH TIES via a global rank() window: correct on any ordering
    * tuple but moves EVERY row to one partition — use only on inputs already
    * known tiny (post-aggregation). For a single ordering value the default
    * is [[distributedTopKWithTies]], which never shuffles the table. */
  def limitWithTies(df: DataFrame, ord: Seq[Column], n: Int): DataFrame = {
    val w = Window.orderBy(ord: _*)
    df.withColumn("__rk", rank().over(w)).filter(col("__rk") <= n).drop("__rk")
  }

  /** GROUP BY ... WITH TOTALS: the per-group rows plus one grand-total row
    * (group columns null), i.e. ROLLUP restricted to {all, none} grouping
    * sets. Map-side partials still apply — one aggregation pass. */
  def withTotals(df: DataFrame, groupCols: Seq[String], aggs: Seq[Column]): DataFrame = {
    val sets = groupCols.map(col)
    df.groupingSets(Seq(sets, Seq.empty), sets: _*).agg(aggs.head, aggs.tail: _*)
  }

  /** ORDER BY ... WITH FILL [STEP step] for any axis `sequence()` supports
    * (integers with a numeric step, dates/timestamps with an interval step —
    * the full fillStep grammar, ClickHouseParser.py:11317-11352): generate
    * the complete axis [min, max] with `sequence()` + explode (distributed —
    * no driver-side range materialization), left-join the data, fill gaps
    * with the given per-column defaults. */
  def withFillStep(df: DataFrame, axisCol: String, step: Column,
      fills: Map[String, Column],
      from: Option[Column] = None, to: Option[Column] = None): DataFrame = {
    // explicit FROM e / TO e override the data bounds (fillFrom/fillTo in
    // the grammar); either side may still come from the data
    val bounds = df.agg(
      from.getOrElse(min(col(axisCol))).as("lo"),
      to.getOrElse(max(col(axisCol))).as("hi"))
    val axis = bounds.select(
      explode(sequence(col("lo"), col("hi"), step)).as(axisCol))
    val filled = axis.join(df, Seq(axisCol), "left")
    fills.foldLeft(filled) { case (acc, (c, v)) =>
      acc.withColumn(c, coalesce(col(c), v))
    }
  }

  /** WITH FILL specialization for a day-step date axis. `df` must have a
    * DateType column `dateCol`. */
  def withFillDays(df: DataFrame, dateCol: String, fills: Map[String, Column]): DataFrame =
    withFillStep(df, dateCol, expr("interval 1 day"), fills)

  /** Carry-forward interpolation (WITH FILL ... INTERPOLATE) without a
    * global window. The naive form — `last(value, ignoreNulls) OVER
    * (ORDER BY ord)` — moves the whole axis to ONE partition. Instead:
    *   1. bucket the axis by a coarse key (e.g. month for a day axis) and
    *      carry forward *within* each bucket — a partitioned window,
    *      parallel across buckets;
    *   2. reduce each bucket to its last non-null value (map-side-combined
    *      aggregation), run the carry across the *bucket summary* — one row
    *      per bucket, ~30-1000× smaller than the axis by construction — and
    *      broadcast it back;
    *   3. a row's value = its in-bucket carry, else the latest previous
    *      bucket's last value, else `default`.
    * The only ordered window over unbounded data is per-bucket; the global
    * pass touches one row per bucket. */
  def carryForwardFill(df: DataFrame, ordCol: String, valueCol: String,
      bucket: Column => Column, default: Column): DataFrame = {
    val b = df.withColumn("__b", bucket(col(ordCol)))
    val wIn = Window.partitionBy("__b").orderBy(ordCol)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val local = b.withColumn("__local",
      last(col(valueCol), ignoreNulls = true).over(wIn))
    val bucketLast = b.filter(col(valueCol).isNotNull)
      .groupBy("__b").agg(max_by(col(valueCol), col(ordCol)).as("__blast"))
    val wB = Window.orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, -1)
    val carry = b.select("__b").distinct()
      .join(bucketLast, Seq("__b"), "left")
      .withColumn("__prev", last(col("__blast"), ignoreNulls = true).over(wB))
      .select(col("__b"), col("__prev"))
    local.join(broadcast(carry), Seq("__b"))
      .withColumn(valueCol, coalesce(col("__local"), col("__prev"), default))
      .drop("__b", "__local", "__prev")
  }

  /** windowFunnel(window)(ts, cond1..condN) — CH's funnel-depth aggregate:
    * per key, the deepest step n such that matching events for steps 1..n
    * occur in order with step-n's chain starting within `windowMicros`.
    * Spark-first shape: map event type → step index (row-local), encode
    * (ts, step) into one long, collect + sort per key (ONE shuffle, the
    * same cost as any groupBy), and run the fold as a codegen'd native
    * expression over the sorted array. Sessions are bounded (a user's
    * events fit in memory by the same argument as sessionize); corpus
    * size never matters. Returns (key, level). */
  def windowFunnel(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], windowMicros: Long
  ): DataFrame = {
    // (ts, step) packs as ts*10+step: base 10 caps the chain at 10 steps.
    // An event type listed in multiple steps is assigned its FIRST matching
    // step only (CH can let one event satisfy several conditions; this
    // mapping is single-step-per-event) — so duplicates are rejected too.
    require(steps.length <= 10, s"windowFunnel supports at most 10 steps, got ${steps.length}")
    require(steps.distinct.size == steps.length,
      "windowFunnel steps must be distinct event types (single-step-per-event mapping)")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (t, i)) =>
        when(col(typeCol) === t, lit(i)).otherwise(acc) }
    df.select(col(keyCol), unix_micros(col(tsCol)).as("__t"), stepIdx.as("__s"))
      .filter(col("__s") >= 0)
      .select(col(keyCol), (col("__t") * 10 + col("__s")).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(keyCol),
        graft.plans.NativeExpressions.window_funnel_level(
          col("__evs"), steps.length, windowMicros).as("level"))
  }

  /** `SELECT ... FROM t FINAL` (the FINAL table modifier,
    * ClickHouseParser.py:12756): ReplacingMergeTree read-time collapse —
    * one row per sorting key, the one with the greatest version. A struct
    * max with the version leading (then the payload columns, so exact
    * version ties stay deterministic): a plain aggregate, partial
    * (map-side) combinable, one shuffle on the key — the same cost shape
    * as any groupBy, no window. */
  def selectFinal(df: DataFrame, keys: Seq[String], versionCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
    val ordered = versionCol +: payload.filterNot(_ == versionCol).toSeq
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(ordered.map(col): _*)).as("__f"))
      .select(keys.map(col) ++ ordered.map(c => col(s"__f.$c").as(c)): _*)
  }

  /** ReplacingMergeTree without a version column: CH keeps the
    * last-inserted row per key; with no insertion-order column to read
    * that from, the deterministic pin is the max over the whole payload
    * struct (same policy as [[selectFinal]]'s tie handling). */
  def selectFinalNoVersion(df: DataFrame, keys: Seq[String]): DataFrame = {
    val payload = df.columns.filterNot(keys.contains).toSeq
    if (payload.isEmpty) return df.dropDuplicates(keys)
    df.groupBy(keys.map(col): _*)
      .agg(max(struct(payload.map(col): _*)).as("__f"))
      .select(df.columns.map(c =>
        if (keys.contains(c)) col(c) else col(s"__f.$c").as(c)): _*)
  }

  /** SummingMergeTree collapse (engine clause,
    * ClickHouseParser.py:5807-5962): one row per sorting key with the
    * summed columns summed — `sumCols` from the engine argument list, or
    * every numeric non-key column when the list is empty (the CH
    * default). Non-summed payload keeps a deterministic representative
    * (min — CH keeps an arbitrary one). Rows whose summed columns are
    * all zero after the merge are dropped, CH's documented behavior.
    * Summed results cast back to the declared column type (CH keeps the
    * declared type and lets it wrap). Plain partial-combinable aggregate:
    * one shuffle on the key, map-side combine, no window. */
  def selectSummed(df: DataFrame, keys: Seq[String],
      sumColsArg: Seq[String]): DataFrame = {
    import org.apache.spark.sql.types.NumericType
    val payload = df.columns.filterNot(keys.contains).toSeq
    val sumCols =
      if (sumColsArg.nonEmpty) sumColsArg
      else payload.filter(c =>
        df.schema(c).dataType.isInstanceOf[NumericType])
    require(sumCols.forall(payload.contains),
      s"ChSql: SummingMergeTree column(s) ${sumCols.filterNot(payload.contains)
        .mkString(", ")} are not non-key stored columns")
    val aggs = payload.map { c =>
      if (sumCols.contains(c)) sum(col(c)).cast(df.schema(c).dataType).as(c)
      else min(col(c)).as(c)
    }
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*)
    if (sumCols.isEmpty) grouped
    else grouped.filter(!sumCols.map(c => col(c) <=> lit(0).cast(
      df.schema(c).dataType)).reduce(_ && _))
  }

  /** CollapsingMergeTree collapse (engine clause, same grammar region):
    * `signCol` is the engine argument, +1 for state rows and -1 for
    * cancel rows. Per sorting key the net sign decides: zero → the rows
    * cancelled out entirely; positive → one surviving +1 row; negative →
    * one surviving -1 row. CH keeps the last-inserted survivor; with no
    * insertion order to read, the deterministic pin is the max payload
    * struct among the surviving sign's rows (same policy as
    * [[selectFinal]]). One partial-combinable aggregate, one shuffle. */
  def selectCollapsed(df: DataFrame, keys: Seq[String],
      signCol: String): DataFrame = {
    val payload = df.columns.filterNot(keys.contains)
      .filterNot(_ == signCol).toSeq
    val signT = df.schema(signCol).dataType
    val rep = if (payload.isEmpty) lit(null) else struct(payload.map(col): _*)
    val grouped = df.groupBy(keys.map(col): _*)
      .agg(
        sum(col(signCol).cast("long")).as("__net"),
        max(when(col(signCol) > 0, rep)).as("__p"),
        min(when(col(signCol) < 0, rep)).as("__m"))
      .filter(col("__net") =!= 0)
    val side = col("__net") > 0
    grouped.select(df.columns.map { c =>
      if (keys.contains(c)) col(c)
      else if (c == signCol)
        when(side, lit(1)).otherwise(lit(-1)).cast(signT).as(c)
      else when(side, col(s"__p.$c")).otherwise(col(s"__m.$c")).as(c)
    }: _*)
  }

  /** AggregatingMergeTree collapse (engine clause, same grammar region):
    * one row per sorting key with every `AggregateFunction(f, ...)`
    * column's states MERGED INTO A STATE — not finalized; reading still
    * goes through the -Merge combinators, exactly CH's contract. Which
    * merge each column needs comes from the recorded stems
    * (`graft.aggfunc.<col>`, from the declared column types). Ordinary
    * non-key columns keep a deterministic representative (min — CH keeps
    * an arbitrary one). Every state merges associatively, so this is one
    * partial-combinable aggregate: one shuffle on the key at any scale. */
  def selectAggregated(df: DataFrame, keys: Seq[String],
      aggFuncs: Map[String, String],
      simpleFuncs: Map[String, String] = Map.empty): DataFrame = {
    (aggFuncs.keys ++ simpleFuncs.keys).foreach(c =>
      require(df.columns.contains(c),
        s"ChSql: AggregateFunction column $c is not a stored column"))
    val payload = df.columns.filterNot(keys.contains).toSeq
    // SimpleAggregateFunction columns fold with the PLAIN function over
    // values — the value is the state (CH's SimpleAggregateFunction
    // contract; the supported stems are CH's own list)
    def simpleExpr(c: String, stem: String): Column = {
      val dt = df.schema(c).dataType
      stem.toLowerCase(java.util.Locale.ROOT) match {
        case "sum" => sum(col(c)).cast(dt)
        case "min" => min(col(c))
        case "max" => max(col(c))
        case "any" | "anylast" => min(col(c)) // deterministic pin
        case "groupbitand" => bit_and(col(c))
        case "groupbitor" => bit_or(col(c))
        case "groupbitxor" => bit_xor(col(c))
        case "grouparrayarray" => flatten(collect_list(col(c)))
        case "groupuniqarrayarray" =>
          sort_array(array_distinct(flatten(collect_list(col(c)))))
        case other => throw new UnsupportedOperationException(
          s"ChSql: SimpleAggregateFunction($other) merge is not implemented")
      }
    }
    def mergeExpr(c: String, stem: String): Column = {
      val dt = df.schema(c).dataType
      stem.toLowerCase(java.util.Locale.ROOT) match {
        case "count" | "sum" => sum(col(c)).cast(dt)
        case "min" => min(col(c))
        case "max" => max(col(c))
        case "any" => min(col(c)) // deterministic pin for CH's arbitrary pick
        case "avg" =>
          val st = dt.asInstanceOf[org.apache.spark.sql.types.StructType]
          struct(sum(col(c).getField("s")).cast(st("s").dataType).as("s"),
            sum(col(c).getField("c")).cast(st("c").dataType).as("c"))
        case "uniq" | "uniqexact" | "groupuniqarray" | "groupbitmap" =>
          sort_array(array_distinct(flatten(collect_list(col(c)))))
        case "grouparray" => flatten(collect_list(col(c)))
        // tuple states fold by key and re-emit the same sorted tuple
        // shape — topK's k applies at topKMerge finalize time, so its
        // state merge IS the sumMap state merge
        case "summap" | "topk" =>
          graft.plans.SumMapMergeAgg.sumMapMerge(col(c))
        case other => throw new UnsupportedOperationException(
          s"ChSql: AggregatingMergeTree merge for stem $other is not implemented")
      }
    }
    val aggs = payload.map { c =>
      aggFuncs.get(c).map(mergeExpr(c, _))
        .orElse(simpleFuncs.get(c).map(simpleExpr(c, _)))
        .getOrElse(min(col(c))).as(c)
    }
    df.groupBy(keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .select(df.columns.map(col): _*)
  }

  /** `ORDER BY expr COLLATE 'name'` (ClickHouseParser.py:11307-11314):
    * Spark 4 strings are natively collatable, so the mapping is the
    * built-in `collate` — the sort comparator changes, the value doesn't.
    * CH/SQLite-style names map onto Spark's collation catalog; unknown
    * names pass through to it verbatim (ICU locale collations like
    * 'en_US_CI' resolve there). */
  def collateKey(c: Column, collation: String): Column = collation.toLowerCase match {
    case "ci" | "nocase" => collate(c, "UTF8_LCASE")  // ASCII-stable: == lower()
    case "bin" | "binary" => collate(c, "UTF8_BINARY")
    case "unicode" => collate(c, "UNICODE")
    case "unicode_ci" => collate(c, "UNICODE_CI")
    case other => collate(c, other)
  }

  /** SAMPLE k/m [OFFSET o/m]: deterministic bucket sampling on an integer
    * key — row kept iff `key % m ∈ [o, o+k)`. ClickHouse samples on a hash
    * of the sampling key; modulo buckets keep the same contract
    * (deterministic, repeatable, disjoint offsets) and are reproducible
    * across engines. */
  def sampleBuckets(df: DataFrame, key: Column, k: Int, m: Int, offset: Int = 0): DataFrame =
    df.filter(pmod(key, lit(m)) >= offset && pmod(key, lit(m)) < offset + k)

  /** CH external dictionary lookup (`dictGet('d', 'attr', key)` —
    * CreateDictionaryStmt ClickHouseParser.py:4005-4048): the dictionary is
    * a broadcast hash map; the lookup is a broadcast left join, so the fact
    * side never shuffles. */
  def dictGet(
      facts: DataFrame, dict: DataFrame,
      factKey: String, dictKey: String,
      attrs: Map[String, String]
  ): DataFrame = {
    val d = dict.select(
      (col(dictKey).as("__dk") +:
        attrs.toSeq.map { case (src, dst) => col(src).as(dst) }): _*)
    facts.join(broadcast(d), facts(factKey) === col("__dk"), "left").drop("__dk")
  }

  /** Distributed LIMIT n WITH TIES on a single ordering value — the
    * scale-safe form of [[limitWithTies]] (whose global window moves ALL
    * rows to one partition). Two passes:
    *   1. `orderBy(v).limit(n)` plans as TakeOrderedAndProject — each
    *      partition keeps its local top-n, the driver merges n·p rows —
    *      and yields the n-th (cutoff) value;
    *   2. a plain filter `v ≥ cutoff` (ties included) that pushes down to
    *      the scan.
    * Total data movement: O(n·partitions) + matched rows, never the table. */
  def distributedTopKWithTies(df: DataFrame, valueCol: Column, n: Int,
      descending: Boolean = true): DataFrame = {
    val ordered = if (descending) valueCol.desc else valueCol.asc
    val topVals = df.select(valueCol.as("__v")).orderBy(ordered).limit(n)
    val cutRow = topVals.agg(
      (if (descending) min(col("__v")) else max(col("__v"))).as("c")).head()
    if (cutRow.isNullAt(0)) df.limit(0)
    else {
      val cut = cutRow.get(0)
      df.filter(if (descending) valueCol >= lit(cut) else valueCol <= lit(cut))
    }
  }

  /** RIGHT SEMI JOIN (JoinOpLeftRight, ClickHouseParser.py:10618-10645):
    * rows of the RIGHT table that have a match on the left. Spark's Dataset
    * API only exposes left_semi, so the rewrite is the side swap —
    * identical semantics, and Catalyst still plans a hash semi join with
    * the (typically smaller) probe side broadcastable. */
  def rightSemiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    right.join(left, cond, "left_semi")

  /** RIGHT ANTI JOIN: rows of the RIGHT table with NO match on the left —
    * the same side-swap rewrite as [[rightSemiJoin]]. */
  def rightAntiJoin(left: DataFrame, right: DataFrame, cond: Column): DataFrame =
    right.join(left, cond, "left_anti")

  /** ANY RIGHT JOIN: mirror of [[anyJoinLeft]] — at most one LEFT match per
    * right row, deterministic via the `pick` ranking on the left side. */
  def anyJoinRight(
      left: DataFrame, right: DataFrame,
      usingKey: Seq[String], pick: Seq[Column]
  ): DataFrame = {
    val w = Window.partitionBy(usingKey.map(col): _*).orderBy(pick: _*)
    val one = left.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    one.join(right, usingKey, "right")
  }

  /** FULL ANY JOIN (JoinOpFull + ANY, ClickHouseParser.py:10574-10593):
    * CH's ANY strictness on a full join keeps at most one match per key on
    * EACH side — i.e. dedup both sides to one row per key (deterministic
    * via `pick`), then a plain full outer join. */
  def fullAnyJoin(
      left: DataFrame, right: DataFrame,
      usingKey: Seq[String],
      pickLeft: Seq[Column], pickRight: Seq[Column]
  ): DataFrame = {
    def onePerKey(df: DataFrame, pick: Seq[Column]): DataFrame = {
      val w = Window.partitionBy(usingKey.map(col): _*).orderBy(pick: _*)
      df.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn")
    }
    onePerKey(left, pickLeft).join(onePerKey(right, pickRight), usingKey, "full_outer")
  }

  /** LIMIT n OFFSET m / the comma form LIMIT m, n (limitExpr,
    * ClickHouseParser.py:11077-11139): skip `offset` rows of the given
    * ordering, keep the next `n`. Spark plans offset+limit together as a
    * single GlobalLimit(skip, take) over a TakeOrdered-style merge — only
    * offset+n rows per partition ever move. The input must carry a
    * deterministic ordering (as in CH, OFFSET without ORDER BY is
    * nondeterministic). */
  def limitOffset(df: DataFrame, offset: Int, n: Int): DataFrame =
    df.offset(offset).limit(n)

  /** Distributed LIMIT n WITH TIES on a COMPOUND ordering tuple — extends
    * [[distributedTopKWithTies]] to multi-column orderings (each with its
    * own direction; `true` = descending). Pass 1 computes the n-th ordering
    * tuple via `orderBy(...).limit(n)` (TakeOrderedAndProject: each
    * partition ships only its local top-n). Pass 2 keeps rows whose tuple
    * sorts at-or-before the cutoff — a plain lexicographic filter that
    * pushes to the scan. Ordering columns must be non-null (CH sorts nulls
    * into a fixed edge; pre-coalesce if needed). */
  def distributedTopKWithTiesCompound(
      df: DataFrame, ord: Seq[(Column, Boolean)], n: Int): DataFrame = {
    val proj = ord.zipWithIndex.map { case ((c, _), i) => c.as(s"__o$i") }
    val sorts = ord.zipWithIndex.map { case ((_, desc), i) =>
      if (desc) col(s"__o$i").desc else col(s"__o$i").asc }
    val top = df.select(proj: _*).orderBy(sorts: _*).limit(n).collect()
    if (top.isEmpty) df.limit(0)
    else {
      val cut = top.last // the n-th (or last available) ordering tuple
      def atOrBefore(i: Int): Column = {
        val (c, desc) = ord(i)
        val kv = lit(cut.get(i))
        val strict = if (desc) c > kv else c < kv
        if (i == ord.length - 1) strict || (c === kv)
        else strict || (c === kv && atOrBefore(i + 1))
      }
      df.filter(atOrBefore(0))
    }
  }

  /** CH `sequenceMatch('(?1).*(?2)...')` for the any-gap pattern family:
    * an ordered subsequence of the step conditions exists ⟺ the funnel
    * depth with an UNBOUNDED window reaches every step (the `.*` pattern
    * imposes order but no time bound — exactly windowFunnel's chain DP
    * with window = ∞). Returns (key, matched). For adjacency `(?1)(?2)`
    * and time-bound `(?t<=n)` forms use [[sequenceMatchPattern]]. */
  def sequenceMatch(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]
  ): DataFrame =
    windowFunnel(df, keyCol, tsCol, typeCol, steps, Long.MaxValue / 16)
      .select(col(keyCol), (col("level") === steps.length).as("matched"))

  /** Gap constraint between two consecutive matched pattern steps (the
    * separators of CH's sequenceMatch pattern sublanguage, parsed by the
    * grammar as plain function args — ClickHouseParser.py:15571-15603). */
  sealed trait StepGap
  /** `.*` — any number of any events between the two matches. */
  case object AnyGap extends StepGap
  /** `(?1)(?2)` — NO event of any kind between the two matches. */
  case object Adjacent extends StepGap
  /** `(?t<=n)` — any events between, but the matched events at most
    * `us` microseconds apart. */
  final case class MaxGapMicros(us: Long) extends StepGap

  /** CH `sequenceMatch` with the full separator sublanguage: `gaps(j)`
    * constrains matched step j → j+1. Same one-shuffle
    * collect-sorted-encode shape as [[windowFunnel]]; the stream keeps
    * NON-matching events too (encoded step −1) because adjacency counts
    * any event as a separator, and the codegen'd automaton backtracks
    * (greedy scans miss [s1, s1, s2] for an adjacent pattern). Scale: one
    * shuffle of (key, 8-byte encoded event); state is per-key row-local. */
  def sequenceMatchPattern(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String], gaps: Seq[StepGap]
  ): DataFrame = {
    require(steps.length <= 14, s"at most 14 steps, got ${steps.length}")
    require(gaps.length == steps.length - 1,
      s"need ${steps.length - 1} gap constraints, got ${gaps.length}")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (t, i)) =>
        when(col(typeCol) === t, lit(i)).otherwise(acc) }
    val gapLongs = gaps.map {
      case AnyGap => -1L
      case Adjacent => 0L
      case MaxGapMicros(us) => require(us > 0, "max gap must be positive"); us
    }
    df.select(col(keyCol),
        (unix_micros(col(tsCol)) * 16 + stepIdx + 1).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(keyCol),
        graft.plans.NativeExpressions.sequence_match_pattern(
          col("__evs"), steps.length, gapLongs).as("matched"))
  }

  /** CH `sequenceCount('(?1).*(?2)...')`: greedy NON-OVERLAPPING count of
    * complete ordered chains per key — the same one-shuffle
    * collect-sorted-encode shape as [[windowFunnel]], with a codegen'd
    * automaton fold. Returns (key, n_chains). */
  def sequenceCount(
      df: DataFrame, keyCol: String, tsCol: String, typeCol: String,
      steps: Seq[String]
  ): DataFrame = {
    require(steps.length <= 10, s"sequenceCount supports at most 10 steps, got ${steps.length}")
    require(steps.distinct.size == steps.length, "sequenceCount steps must be distinct")
    val stepIdx = steps.zipWithIndex
      .foldLeft(lit(-1)) { case (acc, (t, i)) =>
        when(col(typeCol) === t, lit(i)).otherwise(acc) }
    df.select(col(keyCol), unix_micros(col(tsCol)).as("__t"), stepIdx.as("__s"))
      .filter(col("__s") >= 0)
      .select(col(keyCol), (col("__t") * 10 + col("__s")).as("__e"))
      .groupBy(keyCol)
      .agg(sort_array(collect_list(col("__e"))).as("__evs"))
      .select(col(keyCol),
        graft.plans.NativeExpressions.sequence_count(
          col("__evs"), steps.length).as("n_chains"))
  }

  /** CH `histogram(N)(x)` adaptive tier: equi-depth bins seeded by
    * quantile edges derived from a fixed-resolution micro-histogram —
    * deterministic (CH's streaming bin-merge is merge-order dependent, so
    * two runs can disagree; this is replayable bit-for-bit by a SQL
    * oracle) AND bounded: no aggregation buffer ever exceeds `microBins`
    * entries, unlike an exact percentile whose final buffer holds every
    * value. Returns (bin, lo, hi, n) with lo/hi rounded to 6.
    *
    * Scale: pass 1 is a 3-scalar all-reduce (min/max/count); pass 2 is a
    * partial+final count over ≤`microBins` grid keys (the only collect is
    * the ≤4096-row micro-histogram — same bounded-probe shape as the IVF
    * codebook); pass 3 broadcasts the (nBins−1)-edge array as literals
    * and bins row-locally. No data-scale shuffle beyond a groupBy on
    * nBins keys. Edge precision is (max−min)/microBins — the equi-depth
    * split lands on the nearest grid boundary, the honest streaming-
    * approximation contract of an adaptive histogram. */
  def adaptiveHistogram(df: DataFrame, valueCol: String, nBins: Int,
      microBins: Int = 4096): DataFrame = {
    require(nBins >= 2, "need at least 2 bins")
    val v = col(valueCol).cast("double")
    // NULLs never enter a histogram (the exact-percentile predecessor
    // skipped them implicitly; least() would otherwise shove them into
    // the top micro-bin); count() counts only non-null values here too
    val dfv = df.filter(v.isNotNull)
    val head = dfv.agg(min(v).as("lo"), max(v).as("hi"),
      count(lit(1)).as("n")).head()
    if (head.isNullAt(0)) // empty / all-null input: zero bins
      return dfv.select(lit(0).as("bin"), lit(0.0).as("lo"),
        lit(0.0).as("hi"), lit(0L).as("n")).limit(0)
    val (lo0, hi0, n) = (head.getDouble(0), head.getDouble(1), head.getLong(2))
    val edgeVals: Seq[Double] =
      if (hi0 == lo0) Seq.fill(nBins - 1)(hi0) // degenerate: one occupied bin
      else {
        val micro = dfv
          .select(least(lit(microBins - 1),
            floor((v - lit(lo0)) / lit(hi0 - lo0) * lit(microBins)))
            .cast("int").as("mb"))
          .groupBy("mb").agg(count(lit(1)).as("cnt"))
          .orderBy("mb").collect() // bounded: ≤ microBins rows
        var cum = 0L
        val cums = micro.map { r => cum += r.getLong(1); (r.getInt(0), cum) }
        (1 until nBins).map { k =>
          val target = k.toDouble * n / nBins
          val b = cums.find(_._2 >= target).get._1
          lo0 + (b + 1) * (hi0 - lo0) / microBins
        }
      }
    val edges = array(edgeVals.map(lit): _*)
    dfv.select(v.as("__v"))
      .withColumn("bin",
        size(filter(edges, e => col("__v") > e)).cast("int"))
      .withColumn("lo", round(when(col("bin") === 0, lit(lo0))
        .otherwise(element_at(edges, col("bin"))), 6))
      .withColumn("hi", round(when(col("bin") === nBins - 1, lit(hi0))
        .otherwise(element_at(edges, col("bin") + 1)), 6))
      .groupBy("bin", "lo", "hi")
      .agg(count(lit(1)).as("n"))
  }

  /** CH `uniqUpTo(N)(x)`: exact distinct count while ≤ N, else N+1 —
    * the bounded-cardinality probe (a plain capped exact count: the
    * N-bounded early-out is a single-node optimization Spark's
    * distributed exact count subsumes). */
  def uniqUpTo(df: DataFrame, groupCols: Seq[String], valueCol: String,
      n: Int): DataFrame =
    df.groupBy(groupCols.map(col): _*)
      .agg(least(countDistinct(col(valueCol)), lit(n.toLong + 1)).as("uniq_upto"))

  /** Index array [from..to] that is empty when the input array is empty —
    * a bare sequence(0, size-1) at size=0 defaults to step -1 and yields
    * [0,-1], which CH's []-in-[]-out array-math contract must not see. */
  private def guardedIdx(a: Column, from: Int, toExclusiveOffset: Int): Column =
    when(size(a) === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(from), size(a) + toExclusiveOffset))

  /** CH `arrayDifference` (adjacent deltas, first element 0; [] → []) —
    * composed HOFs, codegen'd, no UDF. */
  def arrayDifference(a: Column): Column =
    transform(guardedIdx(a, 0, -1), i =>
      when(i === 0, element_at(a, 1) - element_at(a, 1))
        .otherwise(element_at(a, i + 1) - element_at(a, i)))

  /** CH `arrayCumSum` ([] → []) — per-prefix fold. O(n²) in the array
    * length, which is the portable formulation; arrays here are row-local
    * (bounded). */
  def arrayCumSum(a: Column): Column =
    transform(guardedIdx(a, 1, 0), i =>
      aggregate(slice(a, lit(1), i), lit(0L), (acc, x) => acc + x))

  /** CH `arrayCompact` — drop CONSECUTIVE duplicates (not a distinct). */
  def arrayCompact(a: Column): Column =
    filter(a, (x, i) => i === 0 || x =!= element_at(a, i))

  /** Skew-safe equi-join: salt the skewed (left) side's key into `salts`
    * sub-keys and replicate the right side per salt. Use when AQE's skew
    * handling isn't enough (e.g. one key is >10% of all rows). */
  def saltedJoin(
      left: DataFrame, right: DataFrame,
      key: String, salts: Int
  ): DataFrame = {
    val l = left.withColumn("__salt", pmod(monotonically_increasing_id(), lit(salts)))
    val r = right.crossJoin(
        broadcast(left.sparkSession.range(salts).select(col("id").as("__salt"))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
