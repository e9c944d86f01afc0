package graft

/** Seeded DDL/session fuzzer (VERDICT r9 §next-1): `ChDdl.scala` is the
  * engine's second-largest surface and was covered only by hand-written
  * DdlSurfaceSpec pins — and the SELECT-side fuzz gate has found a real
  * bug in every round it ran. This generator builds random DDL/DML
  * SESSIONS — CREATE TABLE (random ChTypes columns, engines,
  * DEFAULT/MATERIALIZED/ALIAS, partition/order keys) → INSERT random rows
  * (positional and by-name) → a random mutation/OPTIMIZE/partition-verb
  * sequence — and renders each session THREE ways:
  *
  *  1. the CH statement list (run through `ChSql.statement`);
  *  2. a pure-Scala MODEL: every op applied to an in-memory row vector
  *     with hand-rolled semantics (defaults, materialized columns, engine
  *     collapse rules mirroring ChOps exactly) — the in-JVM expectation;
  *  3. a DuckDB script (CREATE/INSERT/UPDATE/DELETE + collapse CTEs) —
  *     the independent-ENGINE replay, checked by
  *     `tools/fuzz_ddl_duck_check.py`.
  *
  * Metamorphic checks per seed (in [[FuzzDdlSpec]]):
  *  - final SELECT ≡ model;
  *  - SHOW CREATE round-trips: executing the emitted text re-creates a
  *    table whose own SHOW CREATE is byte-identical (modulo name);
  *  - engine arms: SELECT … FINAL ≡ model collapse, and OPTIMIZE FINAL
  *    followed by a plain SELECT ≡ the same collapse (OPTIMIZE FINAL ≡
  *    read-time FINAL);
  *  - arm coverage asserted (arms cycle deterministically with the seed,
  *    sidestepping the r9 seed-uniformity trap entirely).
  *
  * Determinism: every random draw comes off a splitmix64-scrambled seed;
  * engine-arm payloads are non-null so the struct-max/min collapse
  * tiebreaks are total orders in both engines; floats are quarter-steps
  * (exact in binary) mutated by integers only.
  */
private[graft] object FuzzDdl {

  final case class Col(name: String, chType: String, duckType: String)

  /** One generated session, rendered for all legs. `extraTables` are
    * secondary tables the session creates (CTAS targets, MOVE/EXCHANGE
    * partners) — the runner legs drop them alongside `table`.
    * `refusals` are (chStmt, duckStmt) pairs that MUST raise in BOTH
    * engines (the null_guard arm's NULL-into-non-Nullable writes) and
    * must leave the table state untouched — the legs run them before the
    * final-state compare, so a partial write would also surface as a
    * row diff. */
  final case class Sess(
      seed: Int, arm: String, table: String,
      chStmts: Seq[String],
      finalSelect: String,
      modelRows: Seq[Seq[Any]],
      collapsed: Option[Seq[Seq[Any]]],
      finalSelectFinal: Option[String],
      duckSetup: Seq[String],
      duckFinal: String,
      duckFinalCollapsed: Option[String],
      extraTables: Seq[String] = Nil,
      refusals: Seq[(String, String)] = Nil)

  val armNames: Seq[String] = Seq("mt_plain", "mt_nullable", "mt_part",
    "mt_defaults", "replacing_ver", "replacing_nover", "summing",
    "collapsing", "versioned", "aggregating",
    "part_verbs", "move_replace", "col_alter", "ctas_exchange",
    "projection", "modify_type", "clear_column", "ttl", "modify_default",
    "add_fill", "memory", "ctas_fill", "null_guard", "bloom_idx")

  /** Render a typed model value for multiset comparison — the same rules
    * as FuzzGrammar.canon / the python leg's canon_value. */
  def canonVal(v: Any): String = v match {
    case null => "<null>"
    case d: Double => f"$d%.6f"
    case other => other.toString
  }
  def canonModel(rows: Seq[Seq[Any]]): Seq[String] =
    rows.map(_.map(canonVal).mkString("|")).sorted

  private def litCh(v: Any): String = v match {
    case null => "NULL"
    case s: String => s"'$s'"
    case other => other.toString
  }

  // ---- model value helpers (inserted ints are Long end-to-end) ----
  private def asL(v: Any): Long = v match {
    case l: Long => l
    case i: Int => i.toLong
    case other => sys.error(s"asL($other)")
  }
  private def cmpVal(a: Any, b: Any): Int = (a, b) match {
    case (x: Long, y: Long) => java.lang.Long.compare(x, y)
    case (x: Int, y: Int) => Integer.compare(x, y)
    case (x: Double, y: Double) => java.lang.Double.compare(x, y)
    case (x: String, y: String) => x.compareTo(y)
    case _ => sys.error(s"cmpVal($a, $b)")
  }
  private def cmpTuple(a: Seq[Any], b: Seq[Any]): Int =
    a.zip(b).iterator.map { case (x, y) => cmpVal(x, y) }
      .find(_ != 0).getOrElse(0)

  // ---- engine collapse over the model (mirrors ChOps exactly) ----

  /** ReplacingMergeTree(ver): per key, max over struct(ver, payload…) —
    * ChOps.selectFinal. Column layout: (k, ver, p1, …). */
  private def collapseReplacingVer(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.groupBy(_.head).valuesIterator
      .map(_.maxBy(_.tail)(Ordering.fromLessThan[Seq[Any]](
        (a, b) => cmpTuple(a, b) < 0))).toSeq

  /** ReplacingMergeTree without version: max payload struct —
    * ChOps.selectFinalNoVersion. Layout: (k, p1, …). */
  private def collapseReplacingNoVer(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    collapseReplacingVer(rows) // identical shape: max over everything after k

  /** SummingMergeTree: per key, summed columns summed, non-summed payload
    * per-column min, all-zero-sum rows dropped — ChOps.selectSummed.
    * Layout: (k, p1, …); sumIdx are indices into the full row. */
  private def collapseSumming(rows: Seq[Seq[Any]],
      sumIdx: Set[Int]): Seq[Seq[Any]] =
    rows.groupBy(_.head).valuesIterator.map { grp =>
      val out = grp.head.indices.map { i =>
        if (i == 0) grp.head.head
        else if (sumIdx(i)) grp.map(r => asL(r(i))).sum: Any
        else grp.map(_(i)).min(Ordering.fromLessThan[Any](
          (a, b) => cmpVal(a, b) < 0))
      }
      out
    }.filter(r => sumIdx.exists(i => asL(r(i)) != 0L)).toSeq

  /** CollapsingMergeTree(sgn): net sign decides; surviving side's payload
    * is the max struct among +1 rows (net>0) / min among -1 rows (net<0)
    * — ChOps.selectCollapsed. Layout: (k, sgn, p1, …). */
  private def collapseCollapsing(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.groupBy(_.head).valuesIterator.flatMap { grp =>
      val net = grp.map(r => asL(r(1))).sum
      if (net == 0L) None
      else {
        val ord = Ordering.fromLessThan[Seq[Any]]((a, b) => cmpTuple(a, b) < 0)
        val payload =
          if (net > 0L) grp.filter(r => asL(r(1)) > 0L).map(_.drop(2)).max(ord)
          else grp.filter(r => asL(r(1)) < 0L).map(_.drop(2)).min(ord)
        Some((grp.head.head +: (if (net > 0L) 1L else -1L).asInstanceOf[Any]
          +: payload).toSeq)
      }
    }.toSeq

  /** VersionedCollapsingMergeTree(sgn, ver): the same ±sign collapse,
    * with the VERSION column joining the grouping key — distinct versions
    * of a key all survive (mirrors engineCollapse's
    * `selectCollapsed(df, keys :+ version, sign)`).
    * Layout: (k, ver, sgn, p1, …). */
  private def collapseVersioned(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.groupBy(r => (r.head, r(1))).valuesIterator.flatMap { grp =>
      val net = grp.map(r => asL(r(2))).sum
      if (net == 0L) None
      else {
        val ord = Ordering.fromLessThan[Seq[Any]]((a, b) => cmpTuple(a, b) < 0)
        val payload =
          if (net > 0L) grp.filter(r => asL(r(2)) > 0L).map(_.drop(3)).max(ord)
          else grp.filter(r => asL(r(2)) < 0L).map(_.drop(3)).min(ord)
        Some((grp.head.head +: grp.head(1) +:
          ((if (net > 0L) 1L else -1L): Any) +: payload).toSeq)
      }
    }.toSeq

  /** AggregatingMergeTree over SimpleAggregateFunction columns: the value
    * IS the state, so merge folds the PLAIN function per key —
    * ChOps.selectAggregated. Layout: (k, v sum, w max, s min). */
  private def collapseAggregating(rows: Seq[Seq[Any]]): Seq[Seq[Any]] =
    rows.groupBy(_.head).valuesIterator.map { grp =>
      Seq[Any](grp.head.head,
        grp.map(r => asL(r(1))).sum,
        grp.map(r => asL(r(2))).max,
        grp.map(_(3).asInstanceOf[String]).min)
    }.toSeq

  // ---- duck collapse SQL (CREATE tmp AS <collapse> / swap) ----

  private def duckSwap(t: String, collapseSql: String): Seq[String] = Seq(
    s"CREATE OR REPLACE TEMP TABLE __fz_tmp AS $collapseSql",
    s"DELETE FROM $t",
    s"INSERT INTO $t SELECT * FROM __fz_tmp",
    "DROP TABLE __fz_tmp")

  private def duckReplacingVerSql(t: String, payload: Seq[String]): String = {
    val ord = payload.map(c => s"$c DESC").mkString(", ")
    s"SELECT k, ${payload.mkString(", ")} FROM (SELECT *, row_number() " +
      s"OVER (PARTITION BY k ORDER BY $ord) AS __rn FROM $t) WHERE __rn = 1"
  }

  private def duckSummingSql(t: String, payload: Seq[String],
      sumCols: Set[String]): String = {
    val sel = payload.map { c =>
      if (sumCols(c)) s"CAST(sum($c) AS BIGINT) AS $c" else s"min($c) AS $c"
    }.mkString(", ")
    val nz = sumCols.toSeq.sorted
      .map(c => s"CAST(sum($c) AS BIGINT) <> 0").mkString(" OR ")
    s"SELECT k, $sel FROM $t GROUP BY k HAVING $nz"
  }

  private def duckCollapsingSql(t: String, payload: Seq[String]): String = {
    val desc = payload.map(c => s"$c DESC").mkString(", ")
    val asc = payload.map(c => s"$c ASC").mkString(", ")
    val pl = payload.mkString(", ")
    val outs = payload.map(c =>
      s"CASE WHEN n.net > 0 THEN p.$c ELSE g.$c END AS $c").mkString(", ")
    s"WITH __net AS (SELECT k, sum(sgn) AS net FROM $t GROUP BY k), " +
      s"__pos AS (SELECT k, $pl, row_number() OVER (PARTITION BY k " +
      s"ORDER BY $desc) AS rn FROM $t WHERE sgn > 0), " +
      s"__neg AS (SELECT k, $pl, row_number() OVER (PARTITION BY k " +
      s"ORDER BY $asc) AS rn FROM $t WHERE sgn < 0) " +
      s"SELECT n.k AS k, CAST(CASE WHEN n.net > 0 THEN 1 ELSE -1 END " +
      s"AS TINYINT) AS sgn, $outs FROM __net n " +
      s"LEFT JOIN __pos p ON p.k = n.k AND p.rn = 1 " +
      s"LEFT JOIN __neg g ON g.k = n.k AND g.rn = 1 WHERE n.net <> 0"
  }

  private def duckVersionedSql(t: String, payload: Seq[String]): String = {
    val desc = payload.map(c => s"$c DESC").mkString(", ")
    val asc = payload.map(c => s"$c ASC").mkString(", ")
    val pl = payload.mkString(", ")
    val outs = payload.map(c =>
      s"CASE WHEN n.net > 0 THEN p.$c ELSE g.$c END AS $c").mkString(", ")
    s"WITH __net AS (SELECT k, ver, sum(sgn) AS net FROM $t GROUP BY k, ver), " +
      s"__pos AS (SELECT k, ver, $pl, row_number() OVER (PARTITION BY k, ver " +
      s"ORDER BY $desc) AS rn FROM $t WHERE sgn > 0), " +
      s"__neg AS (SELECT k, ver, $pl, row_number() OVER (PARTITION BY k, ver " +
      s"ORDER BY $asc) AS rn FROM $t WHERE sgn < 0) " +
      s"SELECT n.k AS k, n.ver AS ver, CAST(CASE WHEN n.net > 0 THEN 1 " +
      s"ELSE -1 END AS TINYINT) AS sgn, $outs FROM __net n " +
      s"LEFT JOIN __pos p ON p.k = n.k AND p.ver = n.ver AND p.rn = 1 " +
      s"LEFT JOIN __neg g ON g.k = n.k AND g.ver = n.ver AND g.rn = 1 " +
      s"WHERE n.net <> 0"
  }

  private def duckAggregatingSql(t: String): String =
    s"SELECT k, CAST(sum(v) AS BIGINT) AS v, max(w) AS w, min(s) AS s " +
      s"FROM $t GROUP BY k"

  // =================== the generator ===================

  def gen(seed: Int): Sess = {
    val rnd = new scala.util.Random(FuzzGrammar.mix64(seed.toLong))
    def int(lo: Int, hi: Int): Int = lo + rnd.nextInt(hi - lo + 1)
    def pick[T](xs: Seq[T]): T = xs(rnd.nextInt(xs.size))
    def chance(p: Double): Boolean = rnd.nextDouble() < p
    // deterministic arm cycling: every armNames.size consecutive seeds
    // cover every arm — no uniformity trap to fall into (the r9 lesson)
    val arm = armNames((seed - 1) % armNames.size)
    val t = s"fz_ddl_$seed"
    val words = Seq("ab", "cd", "ee", "mn", "zz")

    // stored columns per arm (declared order)
    val sumColsExplicit = arm == "summing" && chance(0.5)
    // ttl arm: half the seeds PARTITION BY the TTL column — applyTtlNow's
    // metadata path (expired partitions drop by directory delete); the
    // other half exercise the row-delete mutation path
    val ttlPart = arm == "ttl" && chance(0.5)
    // projection arm: half the seeds ALSO partition by the group column,
    // so DROP PARTITION races the materialized projection (stale-serve
    // coverage); the agg list varies so the fold path sees every shape
    val projPart = arm == "projection" && chance(0.5)
    // bloom_idx arm: half the seeds PARTITION BY k, so the blooms build
    // and prune over a partitioned layout (r12c BloomPrunedFileIndex —
    // duplicate leaf file names across partition dirs are exactly the
    // shape that broke last-segment file keys); pruning must stay
    // invisible against the model and the DuckDB replay either way
    val bloomPart = arm == "bloom_idx" && chance(0.5)
    val projAggs: Seq[(String, String, String)] = // (alias, CH item, duck item)
      if (arm != "projection") Nil
      else Seq(("c", "count() AS c", "count(*) AS c"),
        ("sv", "sum(v) AS sv", "CAST(sum(v) AS BIGINT) AS sv")) ++
        (if (chance(0.5)) Seq(("mv", "min(v) AS mv", "min(v) AS mv")) else Nil) ++
        (if (chance(0.5)) Seq(("xv", "max(v) AS xv", "max(v) AS xv")) else Nil)
    val cols: Seq[Col] = arm match {
      case "mt_plain" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int64", "BIGINT"), Col("s", "String", "VARCHAR"),
        Col("f", "Float64", "DOUBLE"))
      case "mt_nullable" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int64", "BIGINT"), Col("n", "Nullable(Int64)", "BIGINT"))
      case "mt_part" | "part_verbs" | "move_replace" | "projection" =>
        Seq(Col("k", "Int64", "BIGINT"),
          Col("p", "Int32", "INTEGER"), Col("v", "Int64", "BIGINT"))
      case "col_alter" | "ctas_exchange" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int64", "BIGINT"), Col("s", "String", "VARCHAR"),
        Col("f", "Float64", "DOUBLE"))
      case "modify_type" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int32", "INTEGER"), Col("s", "String", "VARCHAR"))
      case "mt_defaults" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int64", "BIGINT"), Col("d", "Int64", "BIGINT"),
        Col("m", "Int64", "BIGINT"))
      case "clear_column" => Seq(Col("k", "Int64", "BIGINT"),
        Col("p", "Int32", "INTEGER"), Col("v", "Int64", "BIGINT"),
        Col("d", "Int64", "BIGINT"), Col("n", "Nullable(Int64)", "BIGINT"))
      case "ttl" => Seq(Col("k", "Int64", "BIGINT"),
        Col("dt", "Date", "DATE"), Col("v", "Int64", "BIGINT"))
      case "modify_default" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "Int64", "BIGINT"), Col("d", "Int64", "BIGINT"))
      case "add_fill" => Seq(Col("k", "Int64", "BIGINT"),
        Col("p", "Int32", "INTEGER"), Col("v", "Int64", "BIGINT"))
      case "memory" | "ctas_fill" | "null_guard" | "bloom_idx" =>
        Seq(Col("k", "Int64", "BIGINT"),
          Col("v", "Int64", "BIGINT"), Col("s", "String", "VARCHAR"),
          Col("n", "Nullable(Int64)", "BIGINT"))
      case "replacing_ver" => Seq(Col("k", "Int64", "BIGINT"),
        Col("ver", "Int64", "BIGINT"), Col("v", "Int64", "BIGINT"),
        Col("s", "String", "VARCHAR"))
      case "replacing_nover" | "summing" =>
        (Seq(Col("k", "Int64", "BIGINT"), Col("v", "Int64", "BIGINT")) ++
          (if (arm == "summing") Seq(Col("w", "Int64", "BIGINT")) else Nil) :+
          Col("s", "String", "VARCHAR"))
      case "collapsing" => Seq(Col("k", "Int64", "BIGINT"),
        Col("sgn", "Int8", "TINYINT"), Col("v", "Int64", "BIGINT"),
        Col("s", "String", "VARCHAR"))
      case "versioned" => Seq(Col("k", "Int64", "BIGINT"),
        Col("ver", "Int64", "BIGINT"), Col("sgn", "Int8", "TINYINT"),
        Col("v", "Int64", "BIGINT"), Col("s", "String", "VARCHAR"))
      case "aggregating" => Seq(Col("k", "Int64", "BIGINT"),
        Col("v", "SimpleAggregateFunction(sum, Int64)", "BIGINT"),
        Col("w", "SimpleAggregateFunction(max, Int64)", "BIGINT"),
        Col("s", "SimpleAggregateFunction(min, String)", "VARCHAR"))
    }
    var storedCols = cols // may grow via ADD COLUMN
    def idx(c: String): Int = storedCols.indexWhere(_.name == c)

    val createCh: String = {
      val colDefs = storedCols.map { c =>
        c.name match {
          case "d" => s"${c.name} ${c.chType} DEFAULT k * 2 + 1"
          case "m" => s"${c.name} ${c.chType} MATERIALIZED k + 100"
          case _ => s"${c.name} ${c.chType}"
        }
      } ++ (if (arm == "mt_defaults") Seq("al Int64 ALIAS k + 7") else Nil)
      val engine = arm match {
        case "replacing_ver" => "ReplacingMergeTree(ver)"
        case "replacing_nover" => "ReplacingMergeTree"
        case "summing" =>
          if (sumColsExplicit) "SummingMergeTree(v)" else "SummingMergeTree"
        case "collapsing" => "CollapsingMergeTree(sgn)"
        case "versioned" => "VersionedCollapsingMergeTree(sgn, ver)"
        case "aggregating" => "AggregatingMergeTree"
        case "memory" => "Memory"
        case _ => "MergeTree"
      }
      val tail =
        if (arm == "memory") "" // Memory takes no sorting/partition keys
        else (if (Set("mt_part", "part_verbs", "move_replace",
            "clear_column", "add_fill")(arm) || projPart) " PARTITION BY p"
          else if (ttlPart) " PARTITION BY dt"
          else if (bloomPart) " PARTITION BY k" else "") +
          " ORDER BY k" +
          (if (arm == "ttl") " TTL dt + INTERVAL 30 DAY" else "")
      s"CREATE TABLE $t (${colDefs.mkString(", ")}) ENGINE = $engine$tail"
    }
    // null_guard: declare the non-Nullable columns NOT NULL in DuckDB
    // too, so BOTH engines must refuse the arm's NULL-write attempts
    val createDuck: String =
      s"CREATE OR REPLACE TABLE $t (${
        storedCols.map(c => s"${c.name} ${c.duckType}${
          if (arm == "null_guard" && c.name != "n") " NOT NULL" else ""
        }").mkString(", ")})"

    // ---- session state ----
    val rows = scala.collection.mutable.ArrayBuffer.empty[Vector[Any]]
    // part_verbs: model of <db>/detached/<tbl>/<spec> — one buffer per
    // partition value; DETACH overwrites (engine deletes a stale copy),
    // ATTACH merges back additively and clears it
    val detached = scala.collection.mutable.Map.empty[Int, Vector[Vector[Any]]]
    // move_replace / ctas_exchange: the partner table's model rows
    val rowsB = scala.collection.mutable.ArrayBuffer.empty[Vector[Any]]
    var exchanged = false
    val ch = Seq.newBuilder[String]
    val duck = Seq.newBuilder[String]
    // null_guard: statements that must RAISE in both engines
    val refuse = Seq.newBuilder[(String, String)]
    ch += createCh
    duck += createDuck
    if (arm == "move_replace") {
      // identical partner schema (MOVE requires schema + partition-key
      // equality on both sides)
      ch += createCh.replace(s"CREATE TABLE $t ", s"CREATE TABLE ${t}_b ")
      duck += createDuck.replace(s"TABLE $t ", s"TABLE ${t}_b ")
    }

    def randVal(c: Col): Any = c.name match {
      case "k" => int(0, 6).toLong
      case "p" => int(0, 2)
      case "v" => // modify_type may widen v to Float64 mid-session
        if (storedCols.exists(c => c.name == "v" && c.chType == "Float64"))
          int(-20, 36) * 0.25
        else int(-5, 9).toLong
      case "w" => int(-3, 6).toLong
      case "ver" => int(0, 4).toLong
      case "sgn" => if (chance(0.5)) 1L else -1L
      case "s" => pick(words)
      case "f" => int(0, 40) * 0.25
      case "n" => if (chance(0.25)) null else int(0, 9).toLong
      case "sz" => pick(words) // post-RENAME name of s (col_alter)
      case "z" => int(0, 5).toLong // add_fill: plain added column
      case "extra" => int(10, 19).toLong
      case "d" => int(20, 29).toLong
      case "dt" => // ttl arm: dates either side of the 30-day horizon —
        // year-2000 rows expire on the next OPTIMIZE, year-2100 rows
        // survive (deterministic until 2100; model string == Date render)
        pick(Seq("2000-01-03", "2000-02-07", "2000-03-15",
          "2100-01-03", "2100-02-07"))
      case "m" => sys.error("materialized is never drawn")
      case other => sys.error(s"randVal($other)")
    }

    def duckInsert(newRows: Seq[Vector[Any]]): String =
      s"INSERT INTO $t VALUES " +
        newRows.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")

    /** One INSERT: positional (all insertable cols, declared order) or
      * by-name over a random permutation (exercises by-name binding and
      * DEFAULT/MATERIALIZED fill). */
    def genInsert(): Unit = {
      val nRows = int(1, 4)
      if (arm == "mt_defaults") {
        if (chance(0.5)) {
          // positional: insertable = (k, v, d) — m is MATERIALIZED
          val vals = (1 to nRows).map(_ => Vector[Any](
            randVal(Col("k", "", "")), randVal(Col("v", "", "")),
            randVal(Col("d", "", ""))))
          ch += s"INSERT INTO $t VALUES " +
            vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
          val full = vals.map(r => Vector[Any](r(0), r(1), r(2),
            asL(r(0)) + 100L))
          rows ++= full
          duck += duckInsert(full)
        } else {
          // by-name (k, v): d ← DEFAULT k*2+1, m ← MATERIALIZED k+100
          val vals = (1 to nRows).map(_ => Vector[Any](
            randVal(Col("k", "", "")), randVal(Col("v", "", ""))))
          ch += s"INSERT INTO $t (k, v) VALUES " +
            vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
          val full = vals.map(r => Vector[Any](r(0), r(1),
            asL(r(0)) * 2L + 1L, asL(r(0)) + 100L))
          rows ++= full
          duck += duckInsert(full)
        }
      } else {
        val vals = (1 to nRows).map(_ =>
          storedCols.map(randVal).toVector)
        if (chance(0.6)) {
          ch += s"INSERT INTO $t VALUES " +
            vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        } else {
          val perm = rnd.shuffle(storedCols.indices.toList)
          val names = perm.map(i => storedCols(i).name)
          ch += s"INSERT INTO $t (${names.mkString(", ")}) VALUES " +
            vals.map(r => perm.map(r).map(litCh).mkString("(", ", ", ")"))
              .mkString(", ")
        }
        rows ++= vals
        duck += duckInsert(vals)
      }
    }

    (1 to int(2, 3)).foreach(_ => genInsert())
    if (arm == "move_replace") {
      // seed the partner table (positional inserts; REPLACE/MOVE pull
      // from and push into these rows)
      (1 to int(1, 2)).foreach { _ =>
        val vals = (1 to int(1, 3)).map(_ => storedCols.map(randVal).toVector)
        val lits = vals.map(r => r.map(litCh).mkString("(", ", ", ")"))
          .mkString(", ")
        ch += s"INSERT INTO ${t}_b VALUES $lits"
        duck += s"INSERT INTO ${t}_b VALUES $lits"
        rowsB ++= vals
      }
    }

    if (arm == "projection") {
      // register + materialize an aggregating projection over the initial
      // rows; the engine must keep covered SELECTs correct through every
      // later insert (incremental fold), mutation (invalidate), partition
      // verb (invalidate) and re-MATERIALIZE (rebuild)
      ch += s"ALTER TABLE $t ADD PROJECTION pr (SELECT p, ${
        projAggs.map(_._2).mkString(", ")} GROUP BY p)"
      ch += s"ALTER TABLE $t MATERIALIZE PROJECTION pr"
    }

    // ---- mutation / maintenance phase ----
    val engineArm = Set("replacing_ver", "replacing_nover", "summing",
      "collapsing", "versioned", "aggregating")(arm)
    def collapseNow(rs: Seq[Seq[Any]]): Seq[Seq[Any]] = arm match {
      case "replacing_ver" => collapseReplacingVer(rs)
      case "replacing_nover" => collapseReplacingNoVer(rs)
      case "summing" =>
        val sumIdx = if (sumColsExplicit) Set(idx("v"))
          else Set(idx("v"), idx("w"))
        collapseSumming(rs, sumIdx)
      case "collapsing" => collapseCollapsing(rs)
      case "versioned" => collapseVersioned(rs)
      case "aggregating" => collapseAggregating(rs)
      case _ => rs
    }

    // ttl arm: the engine applies TTL on every un-partition-scoped
    // OPTIMIZE (CH applies TTL on merges); year-2000 rows sit past any
    // 30/45-day horizon, year-2100 rows are always live
    var ttlActive = arm == "ttl"
    def applyTtlModel(): Unit = if (ttlActive) {
      duck += s"DELETE FROM $t WHERE dt < DATE '2050-01-01'"
      val di = idx("dt")
      val keep = rows.filterNot(r => r(di).asInstanceOf[String] < "2050-01-01")
      rows.clear(); rows ++= keep
    }
    // modify_default arm: the CURRENT fill rule for a short INSERT
    // omitting d — DEFAULT expr if declared, else the Int64 type default
    var defFn: Option[Long => Long] =
      if (arm == "modify_default") Some(k => k * 2L + 1L) else None

    val mutPool = Seq.newBuilder[() => Unit]
    val iv = () => idx("v")
    // CH's Memory engine supports no mutations and no OPTIMIZE — the
    // engine refuses them (parity), so the memory arm draws none
    val memArm = arm == "memory"
    if (!memArm) mutPool += (() => { // heavy UPDATE v (pred on k)
      val (m0, c0) = (int(2, 4), int(1, 5)); val r0 = int(0, m0 - 1)
      ch += s"ALTER TABLE $t UPDATE v = v + $c0 WHERE k % $m0 = $r0"
      duck += s"UPDATE $t SET v = v + $c0 WHERE k % $m0 = $r0"
      val vi = iv()
      rows.indices.foreach { i =>
        if (asL(rows(i).head) % m0 == r0)
          rows(i) = rows(i).updated(vi, asL(rows(i)(vi)) + c0)
      }
    })
    if (!memArm) mutPool += (() => { // lightweight UPDATE v (pred on v)
      val (c0, c1) = (int(1, 3), int(0, 5))
      ch += s"UPDATE $t SET v = v - $c0 WHERE v > $c1"
      duck += s"UPDATE $t SET v = v - $c0 WHERE v > $c1"
      val vi = iv()
      rows.indices.foreach { i =>
        if (asL(rows(i)(vi)) > c1)
          rows(i) = rows(i).updated(vi, asL(rows(i)(vi)) - c0)
      }
    })
    if (!memArm) mutPool += (() => { // heavy DELETE (pred on k)
      val m0 = int(2, 4); val r0 = int(0, m0 - 1)
      ch += s"ALTER TABLE $t DELETE WHERE k % $m0 = $r0"
      duck += s"DELETE FROM $t WHERE k % $m0 = $r0"
      val keep = rows.filterNot(r => asL(r.head) % m0 == r0)
      rows.clear(); rows ++= keep
    })
    if (!memArm) mutPool += (() => { // lightweight DELETE (pred on v)
      val c0 = int(4, 8)
      ch += s"DELETE FROM $t WHERE v > $c0"
      duck += s"DELETE FROM $t WHERE v > $c0"
      val vi = iv()
      val keep = rows.filterNot(r => asL(r(vi)) > c0)
      rows.clear(); rows ++= keep
    })
    // (col_alter may DROP/RENAME s mid-session — its own ops cover strings)
    if (cols.exists(_.name == "s") && arm != "col_alter" && !memArm)
      mutPool += (() => { // string UPDATE
      ch += s"ALTER TABLE $t UPDATE s = concat(s, '_z') WHERE k % 2 = 0"
      duck += s"UPDATE $t SET s = s || '_z' WHERE k % 2 = 0"
      val si = idx("s")
      rows.indices.foreach { i =>
        if (asL(rows(i).head) % 2 == 0)
          rows(i) = rows(i).updated(si,
            rows(i)(si).asInstanceOf[String] + "_z")
      }
    })
    if (arm == "mt_nullable") mutPool += (() => { // NULL-pred surface
      ch += s"ALTER TABLE $t UPDATE n = n + 1 WHERE k % 2 = 1"
      duck += s"UPDATE $t SET n = n + 1 WHERE k % 2 = 1"
      val ni = idx("n")
      rows.indices.foreach { i =>
        if (asL(rows(i).head) % 2 == 1 && rows(i)(ni) != null)
          rows(i) = rows(i).updated(ni, asL(rows(i)(ni)) + 1L)
      }
    })
    if (arm == "mt_nullable") mutPool += (() => { // NULL pred never deletes
      val c0 = int(3, 7)
      ch += s"DELETE FROM $t WHERE n > $c0"
      duck += s"DELETE FROM $t WHERE n > $c0"
      val ni = idx("n")
      val keep = rows.filterNot(r => r(ni) != null && asL(r(ni)) > c0)
      rows.clear(); rows ++= keep
    })
    if (arm == "mt_part") mutPool += (() => { // partition verb
      val pv = int(0, 2)
      ch += s"ALTER TABLE $t DROP PARTITION $pv"
      duck += s"DELETE FROM $t WHERE p = $pv"
      val pi = idx("p")
      val keep = rows.filterNot(r => r(pi) == pv)
      rows.clear(); rows ++= keep
    })
    if (arm == "part_verbs") {
      val pi = () => idx("p")
      mutPool += (() => { // DETACH a LIVE partition (engine requires the
        // directory to exist; a stale detached copy of the same value is
        // overwritten — fs.delete before the move)
        val present = rows.map(r => r(pi()).asInstanceOf[Int]).distinct.sorted.toSeq
        if (present.nonEmpty) {
          val pv = pick(present)
          ch += s"ALTER TABLE $t DETACH PARTITION $pv"
          duck += s"CREATE OR REPLACE TABLE ${t}_det$pv AS " +
            s"SELECT * FROM $t WHERE p = $pv"
          duck += s"DELETE FROM $t WHERE p = $pv"
          val (det, keep) = rows.partition(r => r(pi()) == pv)
          detached(pv) = det.toVector
          rows.clear(); rows ++= keep
        }
      })
      mutPool += (() => { // ATTACH merges ADDITIVELY into any re-inserted
        // live rows (moveDirInto's exists-branch) and clears the buffer
        if (detached.nonEmpty) {
          val pv = pick(detached.keys.toSeq.sorted)
          ch += s"ALTER TABLE $t ATTACH PARTITION $pv"
          duck += s"INSERT INTO $t SELECT * FROM ${t}_det$pv"
          duck += s"DROP TABLE ${t}_det$pv"
          rows ++= detached.remove(pv).get
        }
      })
      mutPool += (() => { // DROP PARTITION is live-only: a detached copy
        // of the same value survives and can still be ATTACHed later
        val pv = int(0, 2)
        ch += s"ALTER TABLE $t DROP PARTITION $pv"
        duck += s"DELETE FROM $t WHERE p = $pv"
        val keep = rows.filterNot(r => r(pi()) == pv)
        rows.clear(); rows ++= keep
      })
    }
    if (arm == "move_replace") {
      val pi = () => idx("p")
      mutPool += (() => { // MOVE: directory rename; merges additively if
        // the partner already has the partition (moveDirInto)
        val present = rows.map(r => r(pi()).asInstanceOf[Int]).distinct.sorted.toSeq
        if (present.nonEmpty) {
          val pv = pick(present)
          ch += s"ALTER TABLE $t MOVE PARTITION $pv TO TABLE ${t}_b"
          duck += s"INSERT INTO ${t}_b SELECT * FROM $t WHERE p = $pv"
          duck += s"DELETE FROM $t WHERE p = $pv"
          val (mv, keep) = rows.partition(r => r(pi()) == pv)
          rowsB ++= mv
          rows.clear(); rows ++= keep
        }
      })
      mutPool += (() => { // REPLACE: target partition becomes a COPY of
        // the source's (source keeps its rows — CH copies parts)
        val presentB = rowsB.map(r => r(pi()).asInstanceOf[Int]).distinct.sorted.toSeq
        if (presentB.nonEmpty) {
          val pv = pick(presentB)
          ch += s"ALTER TABLE $t REPLACE PARTITION $pv FROM ${t}_b"
          duck += s"DELETE FROM $t WHERE p = $pv"
          duck += s"INSERT INTO $t SELECT * FROM ${t}_b WHERE p = $pv"
          val keep = rows.filterNot(r => r(pi()) == pv)
          rows.clear(); rows ++= keep
          rows ++= rowsB.filter(r => r(pi()) == pv)
        }
      })
    }
    if (arm == "col_alter") {
      mutPool += (() => { // DROP COLUMN rewrites data (immutable parquet)
        if (storedCols.exists(_.name == "f")) {
          val fi = idx("f")
          ch += s"ALTER TABLE $t DROP COLUMN f"
          duck += s"ALTER TABLE $t DROP COLUMN f"
          rows.indices.foreach(i => rows(i) = rows(i).patch(fi, Nil, 1))
          storedCols = storedCols.filterNot(_.name == "f")
        }
      })
      mutPool += (() => { // RENAME COLUMN is also a rewrite on parquet
        // (by-name resolution; a catalog-only rename would read NULLs)
        if (storedCols.exists(_.name == "s")) {
          ch += s"ALTER TABLE $t RENAME COLUMN s TO sz"
          duck += s"ALTER TABLE $t RENAME COLUMN s TO sz"
          storedCols = storedCols.map(c =>
            if (c.name == "s") c.copy(name = "sz") else c)
        }
      })
    }
    if (arm == "projection") {
      mutPool += (() => { // rebuild from the current base mid-session
        ch += s"ALTER TABLE $t MATERIALIZE PROJECTION pr"
      })
      if (projPart) mutPool += (() => { // partition verb vs live projection
        val pv = int(0, 2)
        ch += s"ALTER TABLE $t DROP PARTITION $pv"
        duck += s"DELETE FROM $t WHERE p = $pv"
        val pi = idx("p")
        val keep = rows.filterNot(r => r(pi) == pv)
        rows.clear(); rows ++= keep
      })
    }
    if (arm == "mt_defaults") mutPool += (() => { // UPDATE the DEFAULT col
      val c0 = int(1, 9)
      ch += s"ALTER TABLE $t UPDATE d = d + $c0 WHERE k % 2 = 0"
      duck += s"UPDATE $t SET d = d + $c0 WHERE k % 2 = 0"
      val di = idx("d")
      rows.indices.foreach { i =>
        if (asL(rows(i).head) % 2 == 0)
          rows(i) = rows(i).updated(di, asL(rows(i)(di)) + c0)
      }
    })
    if (arm == "clear_column") {
      // CLEAR COLUMN c IN PARTITION p: CH resets to the DEFAULT expr if
      // declared (d → k*2+1, recomputed from the CURRENT k), else the
      // type default (v → 0), NULL only for Nullable columns (n)
      def clearOp(cname: String): () => Unit = () => {
        val pv = int(0, 2)
        ch += s"ALTER TABLE $t CLEAR COLUMN $cname IN PARTITION $pv"
        val (pi, ci) = (idx("p"), idx(cname))
        val fill: Vector[Any] => Any = cname match {
          case "v" => _ => 0L
          case "d" => r => asL(r.head) * 2L + 1L
          case "n" => _ => null
        }
        duck += (cname match {
          case "v" => s"UPDATE $t SET v = 0 WHERE p = $pv"
          case "d" => s"UPDATE $t SET d = k * 2 + 1 WHERE p = $pv"
          case "n" => s"UPDATE $t SET n = NULL WHERE p = $pv"
        })
        rows.indices.foreach { i =>
          if (rows(i)(pi) == pv)
            rows(i) = rows(i).updated(ci, fill(rows(i)))
        }
      }
      mutPool += clearOp("v")
      mutPool += clearOp("d")
      mutPool += clearOp("n")
      mutPool += (() => { // short INSERT (k, p): v fills 0, d fills its
        // DEFAULT, n fills NULL — the whole omitted-column rule at once
        val vals = (1 to int(1, 3)).map(_ => Vector[Any](
          randVal(Col("k", "", "")), randVal(Col("p", "", ""))))
        ch += s"INSERT INTO $t (k, p) VALUES " +
          vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        val full = vals.map(r => Vector[Any](r(0), r(1), 0L,
          asL(r(0)) * 2L + 1L, null))
        rows ++= full
        duck += duckInsert(full)
      })
    }
    if (arm == "ttl") {
      mutPool += (() => { // re-declare the horizon (same expiry classes)
        ch += s"ALTER TABLE $t MODIFY TTL dt + INTERVAL 45 DAY"
        ttlActive = true
      })
      mutPool += (() => { // REMOVE TTL: later OPTIMIZEs stop expiring
        ch += s"ALTER TABLE $t REMOVE TTL"
        ttlActive = false
      })
    }
    if (arm == "modify_default") {
      mutPool += (() => { // swap/remove the DEFAULT: existing rows keep
        // their values (metadata-only), only LATER short INSERTs see it
        int(0, 2) match {
          case 0 =>
            ch += s"ALTER TABLE $t MODIFY COLUMN d Int64 DEFAULT k * 3"
            defFn = Some(k => k * 3L)
          case 1 =>
            ch += s"ALTER TABLE $t MODIFY COLUMN d REMOVE DEFAULT"
            defFn = None
          case 2 =>
            ch += s"ALTER TABLE $t MODIFY COLUMN d Int64 DEFAULT k + 40"
            defFn = Some(k => k + 40L)
        }
      })
      mutPool += (() => { // short INSERT (k, v): d fills the CURRENT rule
        val vals = (1 to int(1, 3)).map(_ => Vector[Any](
          randVal(Col("k", "", "")), randVal(Col("v", "", ""))))
        ch += s"INSERT INTO $t (k, v) VALUES " +
          vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        val full = vals.map(r => Vector[Any](r(0), r(1),
          defFn.map(f => f(asL(r(0)))).getOrElse(0L)))
        rows ++= full
        duck += duckInsert(full)
      })
    }
    if (arm == "add_fill") {
      val pi = () => idx("p")
      mutPool += (() => { // ADD COLUMN with an expression DEFAULT: the
        // ALTER is metadata-only, but pre-existing rows must READ k*10
        // (the graft.addfill coalesce); k is never mutated, so read-time
        // compute and post-rewrite materialization are indistinguishable
        ch += s"ALTER TABLE $t ADD COLUMN w Int64 DEFAULT k * 10"
        if (!storedCols.exists(_.name == "w")) {
          duck += s"ALTER TABLE $t ADD COLUMN w BIGINT"
          duck += s"UPDATE $t SET w = k * 10"
          rows.indices.foreach(i =>
            rows(i) = rows(i) :+ (asL(rows(i).head) * 10L: Any))
          storedCols = storedCols :+ Col("w", "Int64", "BIGINT")
        }
      })
      mutPool += (() => { // plain ADD COLUMN: old rows read the TYPE
        // default 0 (not NULL) — CH computes it for parts without the col
        ch += s"ALTER TABLE $t ADD COLUMN z Int64"
        if (!storedCols.exists(_.name == "z")) {
          duck += s"ALTER TABLE $t ADD COLUMN z BIGINT DEFAULT 0"
          rows.indices.foreach(i => rows(i) = rows(i) :+ (0L: Any))
          storedCols = storedCols :+ Col("z", "Int64", "BIGINT")
        }
      })
      mutPool += (() => { // partition drop races the read-fill marker
        val pv = int(0, 2)
        ch += s"ALTER TABLE $t DROP PARTITION $pv"
        duck += s"DELETE FROM $t WHERE p = $pv"
        val keep = rows.filterNot(r => r(pi()) == pv)
        rows.clear(); rows ++= keep
      })
      mutPool += (() => { // short INSERT (k, p): v fills 0; if added,
        // w fills its DEFAULT k*10 and z fills 0 — at WRITE time
        val vals = (1 to int(1, 3)).map(_ => Vector[Any](
          randVal(Col("k", "", "")), randVal(Col("p", "", ""))))
        ch += s"INSERT INTO $t (k, p) VALUES " +
          vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        val full = vals.map { r =>
          var row = Vector[Any](r(0), r(1), 0L)
          if (storedCols.exists(_.name == "w")) row :+= asL(r(0)) * 10L
          if (storedCols.exists(_.name == "z")) row :+= 0L
          row
        }
        rows ++= full
        duck += duckInsert(full)
      })
    }
    if (arm == "mt_plain") mutPool += (() => { // metadata ADD COLUMN + insert
      // idempotent like the engine: a second draw re-issues the ALTER
      // (the engine answers "already exists") but must not re-widen the
      // model — seed 329 of the first sweep had the double-widen bug
      // here, which in turn exposed the engine silently accepting a
      // DUPLICATE column name in an INSERT list (now a refusal)
      ch += s"ALTER TABLE $t ADD COLUMN extra Int64"
      if (!storedCols.exists(_.name == "extra")) {
        // CH: old parts read a non-Nullable added column as the type's
        // implicit default (0), not NULL — duck twins with DEFAULT 0
        duck += s"ALTER TABLE $t ADD COLUMN extra BIGINT DEFAULT 0"
        val widened = rows.map(_ :+ (0L: Any))
        rows.clear(); rows ++= widened
        storedCols = storedCols :+ Col("extra", "Int64", "BIGINT")
        val vals = (1 to 2).map(_ => storedCols.map(randVal).toVector)
        ch += s"INSERT INTO $t (${storedCols.map(_.name).mkString(", ")}) " +
          s"VALUES " +
          vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        duck += duckInsert(vals)
        rows ++= vals
      }
    })
    if (memArm) {
      mutPool += (() => { // short INSERT (k): v fills 0, s fills '',
        // n fills NULL — memAppend's declared-Nullable fill rule (the
        // Memory store relaxes physical nullability like parquet does)
        val vals = (1 to int(1, 3)).map(_ =>
          Vector[Any](randVal(Col("k", "", ""))))
        ch += s"INSERT INTO $t (k) VALUES " +
          vals.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
        val full = vals.map(r => Vector[Any](r(0), 0L, "", null))
        rows ++= full
        duck += duckInsert(full)
      })
      mutPool += (() => { // TRUNCATE clears the RAM store
        ch += s"TRUNCATE TABLE $t"
        duck += s"DELETE FROM $t"
        rows.clear()
      })
    }
    if (!memArm) mutPool += (() => { // plain OPTIMIZE: no-op compaction —
      // except on a TTL table, where the merge expires rows (CH parity)
      ch += s"OPTIMIZE TABLE $t"
      applyTtlModel()
    })
    if (!engineArm && !memArm) mutPool += (() => { // OPTIMIZE DEDUPLICATE
      ch += s"OPTIMIZE TABLE $t DEDUPLICATE"
      applyTtlModel() // the engine applies TTL before the dedup transform
      duck ++= duckSwap(t, s"SELECT DISTINCT * FROM $t")
      val dd = rows.distinct
      rows.clear(); rows ++= dd
    })
    if (engineArm) mutPool += (() => { // mid-session OPTIMIZE FINAL
      ch += s"OPTIMIZE TABLE $t FINAL"
      val collapseSql = arm match {
        case "replacing_ver" => duckReplacingVerSql(t, Seq("ver", "v", "s"))
        case "replacing_nover" => duckReplacingVerSql(t, Seq("v", "s"))
        case "summing" => duckSummingSql(t, Seq("v", "w", "s"),
          if (sumColsExplicit) Set("v") else Set("v", "w"))
        case "collapsing" => duckCollapsingSql(t, Seq("v", "s"))
        case "versioned" => duckVersionedSql(t, Seq("v", "s"))
        case "aggregating" => duckAggregatingSql(t)
      }
      duck ++= duckSwap(t, collapseSql)
      val cc = collapseNow(rows.toSeq)
      rows.clear(); rows ++= cc.map(_.toVector)
    })
    if (chance(0.08)) mutPool += (() => {
      ch += s"TRUNCATE TABLE $t"
      duck += s"DELETE FROM $t"
      rows.clear()
    })

    val pool = mutPool.result()
    (1 to int(1, 3)).foreach { _ =>
      pick(pool)()
      if (chance(0.4)) genInsert() // interleave inserts between mutations
    }

    if (arm == "ctas_exchange") {
      // CTAS snapshots the mutated table (schema from the SELECT), then
      // half the seeds swap names atomically — the final SELECT reads
      // ${t}_b, which holds the snapshot OR (post-swap) the original
      val m0 = int(2, 4); val r0 = int(0, m0 - 1)
      ch += s"CREATE TABLE ${t}_b ENGINE = MergeTree ORDER BY k " +
        s"AS SELECT k, v FROM $t WHERE k % $m0 = $r0"
      duck += s"CREATE OR REPLACE TABLE ${t}_b AS " +
        s"SELECT k, v FROM $t WHERE k % $m0 = $r0"
      val vi = idx("v")
      rowsB ++= rows.filter(r => asL(r.head) % m0 == r0)
        .map(r => Vector[Any](r.head, r(vi)))
      if (chance(0.5)) {
        exchanged = true
        ch += s"EXCHANGE TABLES $t AND ${t}_b"
        duck += s"ALTER TABLE $t RENAME TO ${t}_sw"
        duck += s"ALTER TABLE ${t}_b RENAME TO $t"
        duck += s"ALTER TABLE ${t}_sw RENAME TO ${t}_b"
      }
    }

    if (arm == "ctas_fill") {
      // the r11 declared-nullability contract, fuzzed end-to-end: CTAS
      // derives the snapshot's DECLARED column types from the SELECT
      // (readTable restores declared non-nullability via AssertNotNull,
      // so the snapshot's graft.nullcols must be exactly {n}); then the
      // fill rule is exercised ON the snapshot — a rewrite mutation
      // relaxes its physical schema mid-session, and short INSERTs must
      // still fill the TYPE default for v/s and NULL only for Nullable n
      // (the duck twin spells the model-computed fills explicitly, so
      // any drift renders as a row diff)
      ch += s"CREATE TABLE ${t}_c ENGINE = MergeTree ORDER BY k AS " +
        s"SELECT k, v, s, n FROM $t"
      duck += s"CREATE OR REPLACE TABLE ${t}_c AS SELECT k, v, s, n FROM $t"
      rowsB ++= rows // the snapshot's model state
      def duckInsertC(full: Seq[Vector[Any]]): String =
        s"INSERT INTO ${t}_c VALUES " +
          full.map(r => r.map(litCh).mkString("(", ", ", ")")).mkString(", ")
      val cOps = Seq(
        () => { // rewrite mutation: relaxes the snapshot's physical schema
          val (m0, c0) = (int(2, 4), int(1, 5)); val r0 = int(0, m0 - 1)
          ch += s"ALTER TABLE ${t}_c UPDATE v = v + $c0 WHERE k % $m0 = $r0"
          duck += s"UPDATE ${t}_c SET v = v + $c0 WHERE k % $m0 = $r0"
          rowsB.indices.foreach { i =>
            if (asL(rowsB(i).head) % m0 == r0)
              rowsB(i) = rowsB(i).updated(1, asL(rowsB(i)(1)) + c0)
          }
        },
        () => { // short INSERT (k): v fills 0, s fills '', n fills NULL
          val vals = (1 to int(1, 3)).map(_ =>
            Vector[Any](randVal(Col("k", "", ""))))
          ch += s"INSERT INTO ${t}_c (k) VALUES " +
            vals.map(r => r.map(litCh).mkString("(", ", ", ")"))
              .mkString(", ")
          val full = vals.map(r => Vector[Any](r(0), 0L, "", null))
          rowsB ++= full
          duck += duckInsertC(full)
        },
        () => { // by-name INSERT (k, n): explicit NULL legal ONLY in n;
          // omitted v/s still fill their type defaults
          val vals = (1 to int(1, 2)).map(_ => Vector[Any](
            randVal(Col("k", "", "")), randVal(Col("n", "", ""))))
          ch += s"INSERT INTO ${t}_c (k, n) VALUES " +
            vals.map(r => r.map(litCh).mkString("(", ", ", ")"))
              .mkString(", ")
          val full = vals.map(r => Vector[Any](r(0), 0L, "", r(1)))
          rowsB ++= full
          duck += duckInsertC(full)
        })
      (1 to int(2, 4)).foreach(_ => pick(cOps)())
    }

    if (arm == "null_guard") {
      // the declared-nullability REFUSAL contract, fuzzed (r11's write
      // guards were pinned by hand-written DdlSurfaceSpec cases only):
      // NULL into a non-Nullable column must raise in BOTH engines —
      // graft's guardNonNullableWrites vs DuckDB's NOT NULL constraint —
      // through the positional-INSERT, by-name-INSERT and UPDATE write
      // paths, leaving state untouched (the final compare re-checks
      // that). Legal Nullable writes interleave and must SUCCEED: the
      // arm's generic inserts already draw NULL n values, and an
      // explicit UPDATE n = NULL runs below. (The POPULATE and
      // Memory-append guard paths stay pinned in DdlSurfaceSpec — they
      // need MV/Memory scaffolding this session shape doesn't build.)
      genInsert() // refusal UPDATEs need a non-empty table in DuckDB
      val ni = idx("n")
      // legal: explicit NULL into the Nullable column must succeed
      val (m0, r0) = (int(2, 3), int(0, 1))
      ch += s"ALTER TABLE $t UPDATE n = NULL WHERE k % $m0 = $r0"
      duck += s"UPDATE $t SET n = NULL WHERE k % $m0 = $r0"
      rows.indices.foreach { i =>
        if (asL(rows(i).head) % m0 == r0)
          rows(i) = rows(i).updated(ni, null: Any)
      }
      val refuseOps = Seq(
        () => { // positional INSERT, NULL in non-Nullable v
          val ins = s"INSERT INTO $t VALUES (${int(0, 6)}, NULL, " +
            s"'${pick(words)}', ${int(0, 9)})"
          refuse += ((ins, ins))
        },
        () => { // by-name INSERT, NULL in non-Nullable s (v present so
          // both engines refuse for the SAME column)
          val ins = s"INSERT INTO $t (k, v, s) VALUES " +
            s"(${int(0, 6)}, ${int(-5, 9)}, NULL)"
          refuse += ((ins, ins))
        },
        () => { // UPDATE a non-Nullable column to NULL (always-true
          // predicate: DuckDB only raises when a row matches)
          refuse += ((s"ALTER TABLE $t UPDATE v = NULL WHERE k >= 0",
            s"UPDATE $t SET v = NULL WHERE k >= 0"))
        })
      (1 to int(1, 3)).foreach(_ => pick(refuseOps)())
    }

    if (arm == "bloom_idx") {
      // the r12 skip-index family fuzzed end-to-end: register +
      // materialize a value bloom on v and a token bloom on s AFTER the
      // mutation phase (stale-sidecar soundness rides keep-on-unknown),
      // keep inserting post-build (unknown files must be kept), and
      // half the seeds OPTIMIZE (compaction + sidecar rebuild). Pruning
      // must be invisible: the model and DuckDB replay the bare
      // predicate the final SELECT carries.
      ch += s"ALTER TABLE $t ADD INDEX bi v TYPE bloom_filter GRANULARITY 1"
      ch += s"ALTER TABLE $t ADD INDEX bs s TYPE tokenbf_v1(4096, 3, 0)"
      ch += s"ALTER TABLE $t MATERIALIZE INDEX bi"
      if (chance(0.7)) ch += s"ALTER TABLE $t MATERIALIZE INDEX bs"
      (1 to int(1, 2)).foreach(_ => genInsert())
      if (chance(0.5)) ch += s"OPTIMIZE TABLE $t"
    }
    // bloom_idx final-predicate draws (post-mutations, so probes can hit
    // or miss surviving rows either way)
    val bloomKind = if (arm == "bloom_idx") int(0, 2) else -1
    val bloomProbe = if (arm == "bloom_idx") int(-5, 9).toLong else 0L
    val bloomTok = if (arm == "bloom_idx") pick(words :+ "qq") else ""
    // predicate SHAPE (r13): 0 = bare probe; 1 = AND with a non-indexed
    // conjunct (the rule must prune on the indexed conjunct only —
    // probesOf's conjunct extraction under fuzz, not just unit pins);
    // 2 = OR branch over a NON-indexed column (the rule must NOT prune:
    // a row can satisfy the non-indexed side in a file the bloom would
    // drop); 3 = OR of two INDEXED-column probes (the IN-spelling's
    // non-prunable twin — probesOf must refuse the disjunction rather
    // than prune on either arm)
    val bloomShape = if (arm == "bloom_idx") int(0, 3) else 0
    val bloomK = if (arm == "bloom_idx") int(0, 6).toLong else 0L
    def bloomWrap(base: String): String = bloomShape match {
      case 1 => s"($base) AND k >= $bloomK"
      case 2 => s"($base) OR k = $bloomK"
      case 3 => s"($base) OR v = ${bloomProbe + 4}"
      case _ => base
    }

    if (arm == "modify_type") {
      // type changes AFTER the mutation phase (the model's integer
      // arithmetic must not see doubles): widen Int32 → Int64 (values
      // unchanged on every leg), then half the seeds widen again to
      // Float64 (model converts; post-modify INSERTs draw quarter-step
      // doubles via the type-aware randVal) — each modify is a cast
      // rewrite through rewriteSwap, then fresh INSERTs bind to the new
      // type through the declared-order property
      ch += s"ALTER TABLE $t MODIFY COLUMN v Int64"
      duck += s"ALTER TABLE $t ALTER v TYPE BIGINT"
      storedCols = storedCols.map(c => if (c.name == "v")
        c.copy(chType = "Int64", duckType = "BIGINT") else c)
      if (chance(0.5)) {
        ch += s"ALTER TABLE $t MODIFY COLUMN v Float64"
        duck += s"ALTER TABLE $t ALTER v TYPE DOUBLE"
        storedCols = storedCols.map(c => if (c.name == "v")
          c.copy(chType = "Float64", duckType = "DOUBLE") else c)
        val vi = idx("v")
        rows.indices.foreach(i =>
          rows(i) = rows(i).updated(vi, asL(rows(i)(vi)).toDouble: Any))
      }
      (1 to int(1, 2)).foreach(_ => genInsert())
    }

    // ---- final renders ----
    val selCols = storedCols.map(_.name) ++
      (if (arm == "mt_defaults") Seq("al") else Nil)
    val finalSelect = arm match {
      case "move_replace" =>
        s"SELECT k, p, v, 't' AS src FROM $t UNION ALL " +
          s"SELECT k, p, v, 'b' AS src FROM ${t}_b"
      case "ctas_exchange" => s"SELECT k, v FROM ${t}_b"
      case "ctas_fill" => s"SELECT k, v, s, n FROM ${t}_c"
      case "projection" => // exactly the projection's shape, so the
        // engine substitutes the materialized table whenever it is live
        s"SELECT p, ${projAggs.map(_._2).mkString(", ")} FROM $t GROUP BY p"
      case "bloom_idx" => bloomKind match {
        case 0 => s"SELECT ${selCols.mkString(", ")} FROM $t " +
          s"WHERE ${bloomWrap(s"v = $bloomProbe")}"
        case 1 => s"SELECT ${selCols.mkString(", ")} FROM $t " +
          s"WHERE ${bloomWrap(s"v IN ($bloomProbe, ${bloomProbe + 2})")}"
        case _ => s"SELECT ${selCols.mkString(", ")} FROM $t " +
          s"WHERE ${bloomWrap(s"hasToken(s, '$bloomTok')")}"
      }
      case _ => s"SELECT ${selCols.mkString(", ")} FROM $t"
    }
    val modelFinal: Seq[Seq[Any]] = arm match {
      case "mt_defaults" => rows.toSeq.map(r => r :+ (asL(r.head) + 7L: Any))
      case "move_replace" =>
        rows.toSeq.map(_ :+ ("t": Any)) ++ rowsB.toSeq.map(_ :+ ("b": Any))
      case "ctas_exchange" =>
        if (exchanged) rows.toSeq.map(r => Seq[Any](r.head, r(idx("v"))))
        else rowsB.toSeq
      case "ctas_fill" => rowsB.toSeq
      case "projection" =>
        val (pi, vi) = (idx("p"), idx("v"))
        rows.toSeq.groupBy(_(pi)).toSeq.map { case (p, rs) =>
          val vs = rs.map(r => asL(r(vi)))
          Seq[Any](p) ++ projAggs.map {
            case ("c", _, _) => rs.size.toLong
            case ("sv", _, _) => vs.sum
            case ("mv", _, _) => vs.min
            case ("xv", _, _) => vs.max
            case (a, _, _) => sys.error(s"projAgg $a")
          }
        }
      case "bloom_idx" =>
        val (ki, vi, si) = (idx("k"), idx("v"), idx("s"))
        rows.toSeq.filter { r =>
          val base = bloomKind match {
            case 0 => asL(r(vi)) == bloomProbe
            case 1 => asL(r(vi)) == bloomProbe || asL(r(vi)) == bloomProbe + 2
            // s values are single [a-z_]+ tokens by construction, so
            // hasToken(s, w) is exact-token equality on the whole value
            case _ => r(si).asInstanceOf[String] == bloomTok
          }
          bloomShape match {
            case 1 => base && asL(r(ki)) >= bloomK
            case 2 => base || asL(r(ki)) == bloomK
            case 3 => base || asL(r(vi)) == bloomProbe + 4
            case _ => base
          }
        }
      case _ => rows.toSeq
    }
    val duckFinal = arm match {
      case "bloom_idx" if bloomKind == 2 =>
        s"SELECT ${selCols.mkString(", ")} FROM $t WHERE " +
          bloomWrap(s"list_contains(" +
            s"string_split_regex(s, '[^A-Za-z0-9_]+'), '$bloomTok')")
      case "mt_defaults" => s"SELECT k, v, d, m, k + 7 AS al FROM $t"
      case "projection" =>
        s"SELECT p, ${projAggs.map(_._3).mkString(", ")} FROM $t GROUP BY p"
      case _ => finalSelect
    }
    val (collapsed, finSel, duckFinCollapsed) =
      if (!engineArm) (None, None, None)
      else {
        val cc = collapseNow(rows.toSeq)
        val sql = arm match {
          case "replacing_ver" => duckReplacingVerSql(t, Seq("ver", "v", "s"))
          case "replacing_nover" => duckReplacingVerSql(t, Seq("v", "s"))
          case "summing" => duckSummingSql(t, Seq("v", "w", "s"),
            if (sumColsExplicit) Set("v") else Set("v", "w"))
          case "collapsing" => duckCollapsingSql(t, Seq("v", "s"))
          case "versioned" => duckVersionedSql(t, Seq("v", "s"))
          case "aggregating" => duckAggregatingSql(t)
        }
        (Some(cc),
          Some(s"SELECT ${selCols.mkString(", ")} FROM $t FINAL"), Some(sql))
      }

    val extraTables =
      if (Set("move_replace", "ctas_exchange")(arm)) Seq(s"${t}_b")
      else if (arm == "ctas_fill") Seq(s"${t}_c")
      else Nil
    Sess(seed, arm, t, ch.result(), finalSelect, modelFinal, collapsed,
      finSel, duck.result(), duckFinal, duckFinCollapsed, extraTables,
      refuse.result())
  }
}
