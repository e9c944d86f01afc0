package graft.chsql

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** The DDL/DML statement surface of the CH grammar as *text*, planned onto
  * the operators that already implement the semantics:
  *
  *  - `CREATE TABLE name (cols) ENGINE = E[(v)] [ORDER BY ...] [PARTITION
  *    BY ...]` (createTableStmt, ClickHouseParser.py:4136-4183; schema
  *    5662-5806) → a managed Spark catalog table, column types through
  *    [[graft.model.ChTypes]], engine sorting key / version / partition
  *    key carried as table properties (`graft.order_by`, `graft.version`,
  *    partition key as real Spark partitioning).
  *  - `INSERT INTO t [(cols)] VALUES|SELECT` (insertStmt,
  *    ClickHouseParser.py:7607-7706, data clauses 7796-7856) → a
  *    distributed append (`insertInto`) — new parquet files next to the
  *    existing ones, exactly CH's new-part shape. Unlisted columns fill
  *    with NULL (CH fills defaults).
  *  - `ALTER TABLE t DELETE|UPDATE ... WHERE` (alterStmt,
  *    ClickHouseParser.py:2242-2344) → [[graft.operators.Mutations]]
  *    transforms inside a rewrite-and-swap: write rewritten data as a new
  *    table, then swap names — CH rewrites parts in the background and
  *    commits a metadata swap, same two phases. Column ALTERs
  *    (ADD/DROP/RENAME/MODIFY/COMMENT COLUMN, 2178-2896) ride the same
  *    rewrite.
  *  - `OPTIMIZE TABLE t [FINAL] [DEDUPLICATE]` (optimizeStmt, 8274-8365)
  *    → part-merge compaction (coalesce to few files per partition);
  *    FINAL applies the ReplacingMergeTree collapse
  *    ([[graft.operators.ChOps.selectFinal]]) using the engine keys from
  *    CREATE TABLE.
  *  - `DROP TABLE|VIEW`, `TRUNCATE`, `RENAME TABLE a TO b`, `USE db`,
  *    `SHOW DATABASES|TABLES|CREATE TABLE` (7149-7357, 8463-8690,
  *    14204-14248, 11994-13901) → Spark catalog operations.
  *
  * Scale note: every data-touching verb here is a distributed job — the
  * driver never materializes rows. INSERT appends files; mutations are a
  * single read→row-local-transform→write pass (no shuffle unless the
  * table is partitioned, in which case the write re-uses the partition
  * columns); OPTIMIZE is the standard small-file compaction job.
  */
object ChDdl {

  // ---- statement-head patterns (compiled once; dispatch() is on the
  // hot path for every statement, including plain SELECTs) ----

  private val createTableRe =
    ("(?is)^CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*" +
      "\\((.*)\\)\\s*ENGINE\\s*=\\s*(\\w+)\\s*(?:\\(([^)]*)\\))?(.*)$").r
  // CREATE MATERIALIZED VIEW name [TO target] [POPULATE] AS SELECT
  // (ClickHouseParser.py:4085-4133); LIVE VIEW (livе-view kind) rides
  // the same registry with complete-mode refresh semantics
  private val createMvRe =
    ("(?is)^CREATE\\s+(MATERIALIZED|LIVE)\\s+VIEW\\s+" +
      "(?:IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)" +
      "(?:\\s+TO\\s+([\\w.]+))?(\\s+POPULATE)?\\s+AS\\s+" +
      "((?:SELECT|WITH)\\s+.*)$").r
  // WATCH view [LIMIT n] (watchStmt, 14249-14321); the LIMIT (number of
  // refresh generations to emit) is accepted and left to the caller's
  // sink, which owns the subscription lifetime
  private val watchRe = "(?is)^WATCH\\s+([\\w.]+)(?:\\s+LIMIT\\s+\\d+)?\\s*$".r
  // CTAS (createTableStmt subquery form, 4136-4183): no column list —
  // the schema comes from the SELECT
  private val ctasRe =
    ("(?is)^CREATE\\s+TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*" +
      "(?:ENGINE\\s*=\\s*(\\w+)\\s*(?:\\(([^)]*)\\))?\\s*)?" +
      "((?:ORDER|PARTITION)\\s+BY\\s+[^;]*?)?\\s*AS\\s+" +
      "((?:SELECT|WITH)\\s+.*)$").r
  private val insertRe =
    ("(?is)^INSERT\\s+INTO\\s+(?!FUNCTION)(?:TABLE\\s+)?([\\w.]+)\\s*" +
      "(?:\\(([\\w\\s,`]*)\\)\\s*)?(VALUES\\s*(.*)|(?:SELECT|WITH)\\s+.*)$").r
  // INSERT ... FORMAT <fmt> <inline rows> (insertStmt data clause,
  // ClickHouseParser.py:7796-7856): the rows ride inline after FORMAT
  private val insertFormatRe =
    ("(?is)^INSERT\\s+INTO\\s+(?!FUNCTION)(?:TABLE\\s+)?([\\w.]+)\\s*" +
      "(?:\\(([\\w\\s,`]*)\\)\\s*)?FORMAT\\s+(\\w+)\\s+(.*)$").r
  // lightweight DELETE statement (deleteStmt — CH's `DELETE FROM t
  // WHERE p` is the mask-based mutation; the text layer runs the same
  // rewrite the heavy mutation uses, which is the mask's compacted end
  // state)
  private val deleteFromRe =
    "(?is)^DELETE\\s+FROM\\s+([\\w.]+)\\s+WHERE\\s+(.*)$".r
  private val alterRe = "(?is)^ALTER\\s+TABLE\\s+([\\w.]+)\\s+(.*)$".r
  private val dropRe = "(?is)^DROP\\s+(TABLE|VIEW)\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$".r
  private val truncateRe = "(?is)^TRUNCATE\\s+(?:TABLE\\s+)?([\\w.]+)\\s*$".r
  private val renameRe = "(?is)^RENAME\\s+TABLE\\s+(.*)$".r
  private val useRe = "(?is)^USE\\s+([\\w]+)\\s*$".r
  private val optimizeRe =
    ("(?is)^OPTIMIZE\\s+TABLE\\s+([\\w.]+)" +
      "(\\s+FINAL)?(\\s+DEDUPLICATE)?\\s*$").r
  private val showCreateRe = "(?is)^SHOW\\s+CREATE\\s+(?:TABLE\\s+)?([\\w.]+)\\s*$".r
  // dictionary DDL (dictionaryStmt — CREATE DICTIONARY name (schema)
  // PRIMARY KEY k SOURCE(FILE(path '...' [format '...'])) [LAYOUT/
  // LIFETIME ignored: layout is always the broadcast hash, lifetime is
  // SYSTEM RELOAD DICTIONARY])
  private val createDictRe =
    ("(?is)^CREATE\\s+DICTIONARY\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*" +
      "\\((.*?)\\)\\s*PRIMARY\\s+KEY\\s+(\\w+)\\s*" +
      "SOURCE\\s*\\(\\s*FILE\\s*\\(\\s*path\\s+'([^']+)'" +
      "(?:\\s+format\\s+'(\\w+)')?\\s*\\)\\s*\\).*$").r
  private val dropDictRe =
    "(?is)^DROP\\s+DICTIONARY\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$".r
  // admin verbs (checkStmt 3807-3837, existsStmt 7358-7419,
  // killStmt 8274-8365, systemStmt 13902-14107)
  // ATTACH/DETACH (attachStmt 3843-3879; the DETACH alternatives of
  // dropStmt 7149-7357): CH moves detached parts to a `detached/`
  // directory and forgets the table; ATTACH re-registers it from there.
  private val detachRe =
    "(?is)^DETACH\\s+(TABLE|VIEW|DICTIONARY)\\s+(IF\\s+EXISTS\\s+)?([\\w.]+)\\s*$".r
  private val attachRe =
    "(?is)^ATTACH\\s+(TABLE|DICTIONARY)\\s+(IF\\s+NOT\\s+EXISTS\\s+)?([\\w.]+)\\s*$".r
  private val checkRe = "(?is)^CHECK\\s+TABLE\\s+([\\w.]+)\\s*$".r
  private val existsRe = "(?is)^EXISTS\\s+(?:TABLE\\s+)?([\\w.]+)\\s*$".r
  private val killRe =
    "(?is)^KILL\\s+QUERY\\s+WHERE\\s+query_id\\s*=\\s*'([^']*)'\\s*$".r
  private val killMutationRe =
    "(?is)^KILL\\s+MUTATION\\s+WHERE\\s+(.+?)\\s*$".r
  private val systemRe = "(?is)^SYSTEM\\s+(\\w+(?:\\s+\\w+)*?)(?:\\s+'([^']*)')?\\s*$".r
  // showStmt family (ClickHouseParser.py:11994-13901): metadata, settings
  // and access introspection. Single-user engine — the access surfaces
  // report the implicit all-powerful `default` user, the cluster
  // surfaces the one local "cluster" Spark local mode is.
  private val showColumnsRe =
    ("(?is)^SHOW\\s+(?:EXTENDED\\s+)?(?:FULL\\s+)?(?:COLUMNS|FIELDS)\\s+" +
      "(?:FROM|IN)\\s+([\\w.]+)(?:\\s+(NOT\\s+)?(ILIKE|LIKE)\\s+'([^']*)')?\\s*$").r
  private val showIndexRe =
    ("(?is)^SHOW\\s+(?:EXTENDED\\s+)?(?:INDEX|INDEXES|INDICES|KEYS)\\s+" +
      "(?:FROM|IN)\\s+([\\w.]+)\\s*$").r
  private val showGrantsRe =
    ("(?is)^SHOW\\s+GRANTS(?:\\s+FOR\\s+(\\w+))?" +
      "(?:\\s+WITH\\s+IMPLICIT)?(?:\\s+FINAL)?\\s*$").r
  private val showSettingsRe =
    "(?is)^SHOW\\s+(CHANGED\\s+)?SETTINGS(?:\\s+(ILIKE|LIKE)\\s+'([^']*)')?\\s*$".r
  private val showSettingRe = "(?is)^SHOW\\s+SETTING\\s+(\\w+)\\s*$".r
  private val showFunctionsRe =
    "(?is)^SHOW\\s+FUNCTIONS(?:\\s+(ILIKE|LIKE)\\s+'([^']*)')?\\s*$".r
  private val showClusterRe = "(?is)^SHOW\\s+CLUSTER\\s+'([^']*)'\\s*$".r
  private val showClustersRe =
    "(?is)^SHOW\\s+CLUSTERS(?:\\s+(ILIKE|LIKE)\\s+'([^']*)')?\\s*$".r
  private val showCreateAccessRe =
    ("(?is)^SHOW\\s+CREATE\\s+(USER|ROLE|(?:ROW\\s+)?POLICY|QUOTA|" +
      "(?:SETTINGS\\s+)?PROFILE)\\s+(\\w+)\\s*$").r
  private val showCreateDbRe =
    "(?is)^SHOW\\s+CREATE\\s+DATABASE\\s+(\\w+)\\s*$".r
  private val showCreateDictRe =
    "(?is)^SHOW\\s+CREATE\\s+DICTIONARY\\s+([\\w.]+)\\s*$".r
  private val showRolesRe =
    "(?is)^SHOW\\s+(?:CURRENT\\s+|ENABLED\\s+)?ROLES\\s*$".r
  private val showProfilesRe =
    "(?is)^SHOW\\s+(?:SETTINGS\\s+)?PROFILES\\s*$".r
  private val showPoliciesRe =
    "(?is)^SHOW\\s+(?:ROW\\s+)?POLICIES(?:\\s+.*)?$".r
  private val showQuotaRe = "(?is)^SHOW\\s+(?:CURRENT\\s+)?QUOTA\\s*$".r


  /** Try to dispatch `text` as a DDL/DML statement. None = not a DDL head,
    * caller falls through to the SELECT path. Each Some result is a
    * one-column status frame (or a result frame for SHOW/metadata verbs). */
  def dispatch(spark: SparkSession, text: String)(
      resolve: String => DataFrame): Option[DataFrame] = {
    import spark.implicits._
    val trimmed = text.trim
    def status(msg: String): DataFrame = Seq(msg).toDF("status")

    trimmed match {
      case createMvRe(kind, name, targetOrNull, populateOrNull, sel) =>
        Some(createMaterializedView(spark, kind.toUpperCase(
          java.util.Locale.ROOT) == "LIVE", name, Option(targetOrNull),
          Option(populateOrNull).isDefined, sel, resolve, status))

      case watchRe(name) =>
        Some(watchView(spark, name, resolve))

      case createTableRe(ifNot, name, cols, engine, engineArgs, tail) =>
        // the tail may carry a trailing `AS SELECT` (schema + data form):
        // split it off so the engine clauses parse clean and the data
        // lands via the INSERT path instead of being silently dropped
        val (engineTail, asSelect) = {
          val t = Option(tail).getOrElse("")
          "(?is)\\bAS\\s+((?:SELECT|WITH)\\b.*)$".r.findFirstMatchIn(t) match {
            case Some(m) => (t.substring(0, m.start), Some(m.group(1)))
            case None => (t, None)
          }
        }
        val preExisting = spark.catalog.tableExists(name)
        val created = createTable(spark, Option(ifNot).isDefined, name, cols,
          engine, Option(engineArgs).getOrElse(""), engineTail, status)
        if (!(Option(ifNot).isDefined && preExisting))
          asSelect.foreach(sel =>
            appendInto(spark, name, Nil, ChSql.sql(spark, sel)(resolve)))
        Some(created)

      case ctasRe(ifNot, name, engineOrNull, engineArgsOrNull, tailOrNull, sel) =>
        if (Option(ifNot).isDefined && spark.catalog.tableExists(name))
          Some(status(s"table $name already exists"))
        else {
          if (!spark.catalog.tableExists(name)) dropStaleLocation(spark, name)
          val df = ChSql.sql(spark, sel)(resolve)
          val props = Seq(
            "graft.engine" -> Option(engineOrNull).getOrElse("MergeTree")) ++
            Option(tailOrNull).flatMap(t =>
              "(?is)ORDER\\s+BY\\s+(\\([^)]*\\)|[\\w]+)".r.findFirstMatchIn(t)
                .map(m => "graft.order_by" ->
                  m.group(1).stripPrefix("(").stripSuffix(")"))) ++
            Option(engineArgsOrNull).filter(_ =>
              Option(engineOrNull).exists(_.equalsIgnoreCase("ReplacingMergeTree")))
              .map("graft.version" -> _.trim)
          val partCols = Option(tailOrNull).flatMap(t =>
            "(?is)PARTITION\\s+BY\\s+(\\([^)]*\\)|[\\w]+)".r
              .findFirstMatchIn(t).map(_.group(1)
                .stripPrefix("(").stripSuffix(")")))
            .toSeq.flatMap(_.split(",")).map(_.trim)
            .filter(df.columns.contains)
          val w = df.write.mode(SaveMode.ErrorIfExists)
          (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w)
            .saveAsTable(name)
          spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES (" +
            props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")")
          Some(status(s"table $name created from select"))
        }

      case insertFormatRe(name, colsOrNull, fmt, data) =>
        val cols = Option(colsOrNull).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        appendInto(spark, name, cols, inlineRows(spark, name, cols, fmt, data))
        Some(status(s"inserted into $name ($fmt)"))

      case insertRe(name, colsOrNull, body, valuesOrNull) =>
        val cols = Option(colsOrNull).toSeq
          .flatMap(_.split(",")).map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty)
        val rows = Option(valuesOrNull) match {
          case Some(values) => // VALUES (...), (...)
            valuesFrame(spark, values, resolve)
          case None => // INSERT ... SELECT
            ChSql.sql(spark, body)(resolve)
        }
        appendInto(spark, name, cols, rows)
        Some(status(s"inserted into $name"))

      case deleteFromRe(name, pred) =>
        rewriteSwap(spark, name)(graft.operators.Mutations.delete(
          _, ChSql.compileExpr(spark, pred, resolve)))
        Some(status(s"deleted from $name"))

      case alterRe(name, clause) =>
        Some(alterTable(spark, name, clause.trim, resolve, status))

      case dropRe(kind, ifExists, name) =>
        val inCatalog = spark.catalog.tableExists(name)
        val isMv = mvMeta.contains(name)
        if (!inCatalog && !isMv && Option(ifExists).isEmpty)
          throw new IllegalArgumentException(s"ChSql: $kind $name does not exist")
        if (inCatalog) {
          // temp views (CREATE VIEW path) and catalog tables drop differently
          if (!spark.catalog.dropTempView(name) &&
            !spark.catalog.dropGlobalTempView(name))
            spark.sql(s"DROP TABLE $name")
        }
        graft.streaming.StreamingOps.dropView(name)
        mvMeta.remove(name)
        Some(status(s"dropped $name"))

      case truncateRe(name) =>
        spark.sql(s"TRUNCATE TABLE $name")
        Some(status(s"truncated $name"))

      case renameRe(list) =>
        // RENAME TABLE a TO b [, c TO d ...] (renameStmt, 8463-8530)
        val pairs = list.split(",").map(_.trim).map { p =>
          val m = "(?is)([\\w.]+)\\s+TO\\s+([\\w.]+)".r
            .findFirstMatchIn(p).getOrElse(throw new IllegalArgumentException(
              s"ChSql: RENAME expects 'a TO b', got '$p'"))
          (m.group(1), m.group(2))
        }
        pairs.foreach { case (a, b) => spark.sql(s"ALTER TABLE $a RENAME TO $b") }
        Some(status(pairs.map { case (a, b) => s"renamed $a to $b" }.mkString("; ")))

      case useRe(db) =>
        spark.sql(s"USE $db")
        Some(status(s"using $db"))

      case optimizeRe(name, fin, dedup) =>
        Some(optimizeTable(spark, name,
          Option(fin).isDefined, Option(dedup).isDefined, status))

      // ---- showStmt family (order: multi-word SHOW CREATE forms must
      // precede the generic SHOW CREATE TABLE pattern) ----

      case showCreateDbRe(name) =>
        require(spark.catalog.databaseExists(name),
          s"ChSql: database $name does not exist")
        Some(Seq(s"CREATE DATABASE $name").toDF("statement"))

      case showCreateDictRe(name) =>
        val d = graft.sources.Dictionaries.get(name).getOrElse(
          throw new IllegalArgumentException(
            s"ChSql: DICTIONARY $name does not exist"))
        val attrCols = d.attrs.keys.toSeq.sorted.filterNot(_ == d.keyCol)
        Some(Seq(s"CREATE DICTIONARY $name " +
          s"(${(d.keyCol +: attrCols).mkString(", ")}) " +
          s"PRIMARY KEY ${d.keyCol} LAYOUT(HASHED)").toDF("statement"))

      case showCreateAccessRe(kind, name) =>
        Some(Seq(showCreateAccess(kind, name)).toDF("statement"))

      case showCreateRe(name) =>
        Some(Seq(showCreate(spark, name, resolve)).toDF("statement"))

      case showColumnsRe(name, notOrNull, kwOrNull, patOrNull) =>
        Some(showColumns(spark, name, resolve,
          Option(notOrNull).isDefined, Option(kwOrNull), Option(patOrNull)))

      case showIndexRe(name) =>
        Some(showIndex(spark, name))

      case showGrantsRe(userOrNull) =>
        // single-user model: the implicit `default` user owns everything
        val u = Option(userOrNull).getOrElse("default")
        require(u.equalsIgnoreCase("default"),
          s"ChSql: there is no user named $u (single-user engine: only 'default')")
        Some(Seq(s"GRANT ALL ON *.* TO $u WITH GRANT OPTION").toDF("grants"))

      case showSettingsRe(changedOrNull, kwOrNull, patOrNull) =>
        val df0 = graft.plans.Settings.settingsRows(spark)
          .toDF("name", "value", "changed", "spark_key")
        val df1 = if (Option(changedOrNull).isDefined)
          df0.filter(col("changed")) else df0
        Some(likeFilter(df1, "name", Option(kwOrNull), Option(patOrNull)))

      case showSettingRe(name) =>
        val row = graft.plans.Settings.settingsRows(spark)
          .find(_._1 == name).getOrElse(throw new IllegalArgumentException(
            s"ChSql: unknown setting $name (no Spark twin — see Settings.mapping)"))
        Some(Seq((row._1, row._2)).toDF("name", "value"))

      case showFunctionsRe(kwOrNull, patOrNull) =>
        val df = FunctionCatalog.names
          .map(n => (n, FunctionCatalog.isAggregate(n)))
          .toDF("name", "is_aggregate")
        Some(likeFilter(df, "name", Option(kwOrNull), Option(patOrNull)))

      case showClusterRe(name) =>
        // Spark local mode is one "cluster" named local; a real deploy
        // would surface the executor topology here
        Some(Seq(("local", 1, 1, "localhost"))
          .toDF("cluster", "shard_num", "replica_num", "host_name")
          .filter(col("cluster") === name))

      case showClustersRe(kwOrNull, patOrNull) =>
        Some(likeFilter(Seq("local").toDF("cluster"), "cluster",
          Option(kwOrNull), Option(patOrNull)))

      case showRolesRe() =>
        Some(Seq.empty[String].toDF("name")) // no roles defined

      case showProfilesRe() =>
        Some(Seq("default").toDF("name"))

      case showPoliciesRe() =>
        Some(Seq.empty[String].toDF("name")) // no row policies defined

      case showQuotaRe() =>
        Some(Seq(("default", "default")).toDF("quota_name", "quota_key"))

      case createDictRe(ifNot, name, cols, key, path, fmtOrNull) =>
        import graft.sources.Dictionaries
        if (Option(ifNot).isDefined && Dictionaries.exists(name))
          Some(status(s"dictionary $name already exists"))
        else {
          val schema = graft.model.ChTypes.toSparkSchema(cols)
          require(schema.fieldNames.contains(key),
            s"ChSql: PRIMARY KEY $key is not a dictionary column")
          val attrs = schema.fieldNames.filterNot(_ == key)
            .map(c => c -> c).toMap
          Dictionaries.createFromPath(name, path,
            Option(fmtOrNull).getOrElse("parquet").toLowerCase, key, attrs)
          // CH loads FLAT/HASHED dictionaries at create time; warming the
          // resolved frame here keeps later dictGet translation zero-job
          Dictionaries.loaded(spark, name)
          Some(status(s"dictionary $name created"))
        }

      case dropDictRe(ifExists, name) =>
        import graft.sources.Dictionaries
        if (!Dictionaries.exists(name) && Option(ifExists).isEmpty)
          throw new IllegalArgumentException(
            s"ChSql: DICTIONARY $name does not exist")
        Dictionaries.drop(name)
        Some(status(s"dropped dictionary $name"))

      case t if t.toUpperCase(java.util.Locale.ROOT)
          .startsWith("SHOW DICTIONARIES") =>
        Some(graft.sources.Dictionaries.names.toDF("name"))

      case detachRe(kind, ifExists, name) =>
        Some(detach(spark, kind.toUpperCase(java.util.Locale.ROOT),
          Option(ifExists).isDefined, name, status))

      case attachRe(kind, ifNot, name) =>
        Some(attach(spark, kind.toUpperCase(java.util.Locale.ROOT),
          Option(ifNot).isDefined, name, status))

      case checkRe(name) =>
        // full-scan validation over the table's file location (the path
        // rides out of the resolver's scan relation, same as WATCH)
        val paths = filePaths(spark, resolve(name))
        require(paths.nonEmpty,
          s"ChSql: CHECK TABLE $name: not a file-backed table")
        val (ok, n, err) = graft.operators.AdminOps.checkTable(spark, paths.head)
        Some(Seq((name, ok, n, err.orNull)).toDF("table", "ok", "rows", "error"))

      case existsRe(name) =>
        val exists = spark.catalog.tableExists(name) ||
          (try { resolve(name); true } catch { case _: Exception => false })
        Some(Seq(if (exists) 1 else 0).toDF("result"))

      case killRe(queryId) =>
        Some(status(graft.operators.AdminOps.killQuery(spark, queryId)))

      case killMutationRe(where) =>
        Some(status(graft.operators.AdminOps.killMutation(where)))

      case t if t.toUpperCase(java.util.Locale.ROOT)
          .startsWith("SHOW PROCESSLIST") =>
        // showStmt PROCESSLIST alternative (ClickHouseParser.py:11994-13901):
        // live queries registered via AdminOps.withQueryId
        Some(graft.operators.AdminOps.processList()
          .toDF("query_id", "query", "elapsed_sec"))

      case systemRe(cmd, argOrNull) =>
        Some(status(graft.operators.AdminOps.system(
          spark, cmd, Option(argOrNull))))

      case t if t.toUpperCase(java.util.Locale.ROOT).trim == "SHOW USERS" =>
        Some(Seq("default").toDF("name"))

      case t if t.toUpperCase(java.util.Locale.ROOT).startsWith("SHOW QUOTAS") =>
        Some(Seq("default").toDF("name"))

      case t if t.toUpperCase(java.util.Locale.ROOT).trim == "SHOW ACCESS" =>
        // the concatenated access-entity dump (showStmt ACCESS,
        // ClickHouseParser.py:12295-12312)
        Some(Seq("CREATE USER default",
          "CREATE SETTINGS PROFILE default",
          "CREATE QUOTA default",
          "GRANT ALL ON *.* TO default WITH GRANT OPTION").toDF("access"))

      case t if t.toUpperCase(java.util.Locale.ROOT).trim == "SHOW PRIVILEGES" =>
        // the privilege vocabulary this engine's statement layer exposes
        Some(Seq(
          ("SELECT", "TABLE"), ("INSERT", "TABLE"), ("ALTER", "TABLE"),
          ("CREATE TABLE", "TABLE"), ("CREATE VIEW", "VIEW"),
          ("CREATE DICTIONARY", "DICTIONARY"), ("DROP", "TABLE"),
          ("TRUNCATE", "TABLE"), ("OPTIMIZE", "TABLE"), ("SHOW", "GLOBAL"),
          ("KILL QUERY", "GLOBAL"), ("SYSTEM", "GLOBAL"),
          ("dictGet", "DICTIONARY")).toDF("privilege", "level"))

      case t if t.toUpperCase(java.util.Locale.ROOT).trim == "SHOW ENGINES" =>
        // system.table_engines shape, restricted to engines with mapped
        // semantics (MergeTree family props, view/stream registry,
        // dictionary registry, file sources)
        Some(Seq(
          ("MergeTree", true, true, false),
          ("ReplacingMergeTree", true, true, true),
          ("View", false, false, false),
          ("MaterializedView", false, false, false),
          ("LiveView", false, false, false),
          ("Dictionary", false, false, false),
          ("File", false, false, false))
          .toDF("name", "supports_sort_order", "supports_partition_by",
            "supports_final"))

      case t if t.toUpperCase(java.util.Locale.ROOT).startsWith("SHOW MERGES") =>
        // merges/mutations run synchronously inside OPTIMIZE/ALTER here,
        // so the in-flight set is always empty — honest, not a stub
        Some(Seq.empty[(String, String, Double, Double, Boolean)]
          .toDF("database", "table", "elapsed", "progress", "is_mutation"))

      case t if t.toUpperCase(java.util.Locale.ROOT)
          .startsWith("SHOW FILESYSTEM CACHES") =>
        Some(Seq.empty[String].toDF("name")) // no fs cache layer

      case t if t.toUpperCase(java.util.Locale.ROOT).startsWith("SHOW DATABASES") =>
        Some(spark.catalog.listDatabases().toDF.select(col("name")))

      case t if t.toUpperCase(java.util.Locale.ROOT).startsWith("SHOW TABLES") =>
        Some(spark.catalog.listTables().toDF
          .select(col("name")).orderBy("name"))

      case _ => None
    }
  }

  // ===================== MATERIALIZED / LIVE VIEW =====================

  /** Text-layer MV metadata: source table + select text + TO target, so
    * WATCH can rebuild the stream twin from the registered name. */
  private final case class MvMeta(src: String, sel: String,
      target: Option[String])
  private val mvMeta =
    scala.collection.concurrent.TrieMap.empty[String, MvMeta]

  /** `CREATE MATERIALIZED VIEW v [TO t] [POPULATE] AS SELECT`: register
    * the transform in the [[graft.streaming.StreamingOps]] MV registry
    * (one function, applied identically in batch backfill and streaming
    * refresh — the Kappa contract). POPULATE runs the batch backfill now:
    * into the TO target when it is a writable catalog table, else as a
    * queryable temp view named after the MV (CH's implicit inner table). */
  private def createMaterializedView(spark: SparkSession, live: Boolean,
      name: String, target: Option[String], populate: Boolean, sel: String,
      resolve: String => DataFrame, status: String => DataFrame): DataFrame = {
    import graft.streaming.StreamingOps
    val src = ChSql.firstTable(sel).getOrElse(throw new IllegalArgumentException(
      s"ChSql: materialized view $name has no source table in its SELECT"))
    val transform: DataFrame => DataFrame =
      in => ChSql.sql(spark, sel)(n => if (n == src) in else resolve(n))
    StreamingOps.register(StreamingOps.MaterializedView(name, transform))
    mvMeta.put(name, MvMeta(src, sel, target))
    if (populate) {
      val out = StreamingOps.populate(
        StreamingOps.MaterializedView(name, transform), resolve(src))
      target match {
        case Some(t) if spark.catalog.tableExists(t) =>
          out.write.mode(SaveMode.Append).insertInto(t)
        case _ => out.createOrReplaceTempView(target.getOrElse(name))
      }
    }
    status(s"${if (live) "live" else "materialized"} view $name created" +
      (if (populate) " and populated" else ""))
  }

  /** `WATCH v`: the client-facing subscription — returns the STREAMING
    * twin of the registered transform over the view's file-backed source
    * (the path is recovered from the batch resolver's scan relation, so
    * the same statement works wherever tables are parquet-backed). The
    * caller attaches the sink and owns the query lifetime. */
  private def watchView(spark: SparkSession, name: String,
      resolve: String => DataFrame): DataFrame = {
    import graft.streaming.StreamingOps
    val meta = mvMeta.getOrElse(name, throw new IllegalArgumentException(
      s"ChSql: WATCH: unknown view '$name' (CREATE MATERIALIZED VIEW first)"))
    val srcBatch = resolve(meta.src)
    val paths = filePaths(spark, srcBatch)
    require(paths.nonEmpty,
      s"ChSql: WATCH $name: source table '${meta.src}' is not file-backed")
    StreamingOps.watch(spark, name, paths.head, srcBatch.schema)
  }

  // ===================== CREATE TABLE =====================

  private def createTable(spark: SparkSession, ifNotExists: Boolean,
      name: String, colsText: String, engine: String, engineArgs: String,
      tail: String, status: String => DataFrame): DataFrame = {
    val schema = graft.model.ChTypes.toSparkSchema(colsText)
    // engine tail: ORDER BY k / ORDER BY (k1, k2) / PARTITION BY c / TTL ...
    def clause(kw: String): Option[String] = {
      val re = ("(?is)" + kw +
        "\\s+(\\([^)]*\\)|[\\w()]+(?:\\s*,\\s*[\\w()]+)*?)" +
        "(?=\\s+(?:ORDER|PARTITION|PRIMARY|SAMPLE|TTL|SETTINGS)\\s|\\s*$)").r
      re.findFirstMatchIn(tail)
        .map(_.group(1).stripPrefix("(").stripSuffix(")").trim)
    }
    val orderBy = clause("ORDER\\s+BY")
    val partitionBy = clause("PARTITION\\s+BY")
    // ReplacingMergeTree(v): the engine argument is the version column
    val version = if (engine.equalsIgnoreCase("ReplacingMergeTree"))
      Some(engineArgs.trim).filter(_.nonEmpty) else None

    if (ifNotExists && spark.catalog.tableExists(name))
      return status(s"table $name already exists")
    if (!spark.catalog.tableExists(name)) dropStaleLocation(spark, name)

    val partCols = partitionBy.toSeq.flatMap(_.split(",")).map(_.trim)
      .filter(_.nonEmpty)
      // PARTITION BY toYYYYMM(d)-style expressions have no direct Spark
      // DDL twin; only plain column partitioning maps to real layout
      .filter(schema.fieldNames.contains)
    val props = Seq(
      "graft.engine" -> engine) ++
      orderBy.map("graft.order_by" -> _) ++
      version.map("graft.version" -> _)
    val propsSql = props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ")
    val partSql =
      if (partCols.isEmpty) "" else partCols.mkString(" PARTITIONED BY (", ", ", ")")
    spark.sql(
      s"CREATE TABLE ${if (ifNotExists) "IF NOT EXISTS " else ""}$name " +
        s"(${schema.toDDL}) USING parquet$partSql TBLPROPERTIES ($propsSql)")
    status(s"table $name created")
  }

  // ===================== INSERT =====================

  /** Parse `(...), (...)` VALUES tuples through the shared expression
    * grammar; each scalar is compiled by [[ChSql.compileExpr]], so
    * function calls (`toDate('...')`, `now()`) work, not just literals. */
  private def valuesFrame(spark: SparkSession, values: String,
      resolve: String => DataFrame): DataFrame = {
    val tuples = splitTuples(values)
    require(tuples.nonEmpty, "ChSql: INSERT VALUES needs at least one tuple")
    val frames = tuples.map { t =>
      val cols = splitTop(t).zipWithIndex.map { case (e, i) =>
        ChSql.compileExpr(spark, e, resolve).as(s"c$i")
      }
      spark.range(1).select(cols: _*)
    }
    frames.reduce(_.union(_))
  }

  /** Align `rows` to the target table schema (by the given column list,
    * or positionally when absent; missing columns become typed NULLs —
    * CH fills column defaults) and append distributedly — one lazy plan,
    * no extra pass over the data. */
  private def appendInto(spark: SparkSession, name: String,
      cols: Seq[String], rows: DataFrame): Unit = {
    require(spark.catalog.tableExists(name),
      s"ChSql: INSERT INTO unknown table '$name' (CREATE TABLE it first)")
    val target = spark.table(name).schema
    val byName = cols.nonEmpty
    if (byName) {
      require(cols.size == rows.columns.length,
        s"ChSql: INSERT column list has ${cols.size} names but the data has " +
          s"${rows.columns.length} columns")
      val unknown = cols.filterNot(target.fieldNames.contains)
      require(unknown.isEmpty,
        s"ChSql: INSERT INTO $name: no such column(s) ${
          unknown.mkString(", ")} (table has ${target.fieldNames.mkString(", ")})")
    }
    else require(target.size == rows.columns.length,
      s"ChSql: table $name has ${target.size} columns but the data has " +
        s"${rows.columns.length} (use an explicit column list)")
    val src = rows.columns
    val aligned = rows.select(target.fields.map { f =>
      val idx = if (byName) cols.indexOf(f.name) else target.fieldIndex(f.name)
      if (idx < 0) lit(null).cast(f.dataType).as(f.name)
      else col(src(idx)).cast(f.dataType).as(f.name)
    }.toSeq: _*)
    aligned.write.mode(SaveMode.Append).insertInto(name)
  }

  /** Inline `FORMAT <fmt>` data rows → a typed DataFrame against the
    * target's (possibly column-subset) schema. JSONEachRow parses through
    * Spark's JSON reader; CSV/TSV[WithNames] through the CSV reader —
    * both distributed readers over a Dataset[String], not driver loops. */
  private def inlineRows(spark: SparkSession, name: String,
      cols: Seq[String], fmt: String, data: String): DataFrame = {
    import spark.implicits._
    require(spark.catalog.tableExists(name),
      s"ChSql: INSERT INTO unknown table '$name'")
    val target = spark.table(name).schema
    val schema = org.apache.spark.sql.types.StructType(
      if (cols.isEmpty) target.fields.toSeq
      else cols.map(c => target(target.fieldIndex(c))))
    val lines = data.split("\n").map(_.trim).filter(_.nonEmpty).toSeq.toDS()
    // FAILFAST: a malformed inline row must reject the INSERT (CH does),
    // not silently append a row of NULLs (Spark's default PERMISSIVE)
    fmt.toLowerCase(java.util.Locale.ROOT) match {
      case "jsoneachrow" =>
        spark.read.schema(schema).option("mode", "FAILFAST").json(lines)
          .select(schema.fieldNames.map(col): _*) // JSON is order-free
      case "csv" | "csvwithnames" =>
        spark.read.schema(schema).option("mode", "FAILFAST")
          .option("header", fmt.equalsIgnoreCase("CSVWithNames")).csv(lines)
      case "tabseparated" | "tsv" | "tabseparatedwithnames" | "tsvwithnames" =>
        spark.read.schema(schema).option("mode", "FAILFAST").option("sep", "\t")
          .option("header", fmt.toLowerCase.endsWith("withnames")).csv(lines)
      case other => throw new IllegalArgumentException(
        s"ChSql: unsupported inline INSERT FORMAT '$other'")
    }
  }

  // ===================== ALTER =====================

  private def alterTable(spark: SparkSession, name: String, clause: String,
      resolve: String => DataFrame, status: String => DataFrame): DataFrame = {
    import graft.operators.Mutations
    val up = clause.toUpperCase(java.util.Locale.ROOT)
    // resolve columns of the target table during predicate compilation
    def pred(text: String): Column = ChSql.compileExpr(spark, text, resolve)

    if (up.startsWith("DELETE")) {
      val where = "(?is)^DELETE\\s+WHERE\\s+(.*)$".r.findFirstMatchIn(clause)
        .map(_.group(1)).getOrElse(throw new IllegalArgumentException(
          "ChSql: ALTER ... DELETE needs WHERE"))
      rewriteSwap(spark, name)(Mutations.delete(_, pred(where)))
      status(s"mutation applied to $name (delete)")
    } else if (up.startsWith("UPDATE")) {
      val m = "(?is)^UPDATE\\s+(.*)\\s+WHERE\\s+(.*)$".r.findFirstMatchIn(clause)
        .getOrElse(throw new IllegalArgumentException(
          "ChSql: ALTER ... UPDATE needs assignments and WHERE"))
      val assignments = splitTop(m.group(1)).map { a =>
        val eq = topLevelEq(a)
        require(eq > 0, s"ChSql: malformed UPDATE assignment '$a'")
        val c = a.substring(0, eq).trim.stripPrefix("`").stripSuffix("`")
        val e = a.substring(eq + 1).trim
        c -> ChSql.compileExpr(spark, e, resolve)
      }
      rewriteSwap(spark, name)(Mutations.update(_, assignments, pred(m.group(2))))
      status(s"mutation applied to $name (update ${assignments.map(_._1).mkString(",")})")
    } else if (up.startsWith("ADD COLUMN")) {
      val m = "(?is)^ADD\\s+COLUMN\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\w+)\\s+(.*)$".r
        .findFirstMatchIn(clause).get
      val dt = graft.model.ChTypes.toSpark(m.group(2).trim)
      rewriteSwap(spark, name)(_.withColumn(m.group(1), lit(null).cast(dt)))
      status(s"added column ${m.group(1)} to $name")
    } else if (up.startsWith("DROP COLUMN")) {
      val c = clause.split("\\s+").last
      rewriteSwap(spark, name)(Mutations.dropColumn(_, c))
      status(s"dropped column $c from $name")
    } else if (up.startsWith("RENAME COLUMN")) {
      val m = "(?is)^RENAME\\s+COLUMN\\s+(\\w+)\\s+TO\\s+(\\w+)$".r
        .findFirstMatchIn(clause).get
      rewriteSwap(spark, name)(Mutations.renameColumn(_, m.group(1), m.group(2)))
      status(s"renamed column ${m.group(1)} to ${m.group(2)} in $name")
    } else if (up.startsWith("MODIFY COLUMN")) {
      val m = "(?is)^MODIFY\\s+COLUMN\\s+(\\w+)\\s+(.*)$".r
        .findFirstMatchIn(clause).get
      val dt = graft.model.ChTypes.toSpark(m.group(2).trim)
      rewriteSwap(spark, name)(Mutations.modifyColumnType(_, m.group(1), dt))
      status(s"modified column ${m.group(1)} in $name")
    } else if (up.startsWith("COMMENT COLUMN")) {
      val m = "(?is)^COMMENT\\s+COLUMN\\s+(\\w+)\\s+'(.*)'$".r
        .findFirstMatchIn(clause).get
      rewriteSwap(spark, name)(Mutations.commentColumn(_, m.group(1), m.group(2)))
      status(s"commented column ${m.group(1)} in $name")
    } else throw new IllegalArgumentException(
      s"ChSql: unsupported ALTER TABLE clause: $clause")
  }

  /** The mutation job: rewrite the table through `transform` into a new
    * table, then swap names — the same two phases as a CH mutation
    * (background part rewrite, then metadata commit). Engine properties
    * survive the swap. Distributed end to end; the transforms themselves
    * (filter / conditional withColumn) are row-local, no shuffle. */
  private def rewriteSwap(spark: SparkSession, name: String)(
      transform: DataFrame => DataFrame): Unit = {
    require(spark.catalog.tableExists(name),
      s"ChSql: unknown table '$name'")
    val props = tableProps(spark, name)
    // preserve the physical layout: partition columns pass through, so
    // downstream partition pruning is unaffected by the mutation
    val partCols = spark.catalog.listColumns(name).collect()
      .filter(_.isPartition).map(_.name).toSeq
    // unique per-invocation suffix: concurrent mutations on different
    // tables must not share a staging name; tmp lives in the SAME
    // database (ALTER ... RENAME cannot cross dbs)
    val suffix = java.util.UUID.randomUUID().toString.replace("-", "").take(12)
    val (db, bare) = name.split("\\.").toSeq match {
      case Seq(d, t) => (s"$d.", t)
      case _ => ("", name)
    }
    val tmp = s"${db}graft_rw_${suffix}"
    val bak = s"${db}${bare}__graft_old_$suffix"
    if (!spark.catalog.tableExists(tmp)) dropStaleLocation(spark, tmp)
    val w = transform(spark.table(name)).write.mode(SaveMode.Overwrite)
    (if (partCols.nonEmpty) w.partitionBy(partCols: _*) else w).saveAsTable(tmp)
    // rename-aside instead of drop-then-rename: a failure between the two
    // renames leaves the data recoverable under the __graft_old name
    // instead of lost
    spark.sql(s"ALTER TABLE $name RENAME TO $bak")
    spark.sql(s"ALTER TABLE $tmp RENAME TO $name")
    spark.sql(s"DROP TABLE $bak")
    if (props.nonEmpty)
      spark.sql(s"ALTER TABLE $name SET TBLPROPERTIES (" +
        props.map { case (k, v) => s"'$k'='$v'" }.mkString(", ") + ")")
  }

  /** Root file paths behind a (file-backed) batch DataFrame — recovered
    * from the resolver's scan relation, so text statements that need a
    * path (CHECK TABLE, WATCH) work wherever tables are parquet-backed. */
  private def filePaths(spark: SparkSession, df: DataFrame): Seq[String] =
    df.queryExecution.analyzed.collect {
      case lr: org.apache.spark.sql.execution.datasources.LogicalRelation =>
        lr.relation match {
          case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
            fs.location.rootPaths.map(_.toString)
          case _ => Nil
        }
    }.flatten

  /** The session catalog is in-memory but managed-table directories
    * persist in the warehouse — a table CREATEd by a previous session is
    * unknown to this catalog yet its location blocks CREATE. When the
    * catalog does not know the name, the directory is an orphan: remove
    * it so CREATE TABLE is re-runnable across sessions. */
  private def dropStaleLocation(spark: SparkSession, name: String): Unit = {
    val parts = name.split("\\.")
    val (db, tbl) =
      if (parts.length == 2) (parts(0), parts(1))
      else (spark.catalog.currentDatabase, parts(0))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    val dbPath = if (db == "default") wh else s"$wh/$db.db"
    val loc = new org.apache.hadoop.fs.Path(s"$dbPath/$tbl")
    val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(loc)) fs.delete(loc, true)
  }

  private def tableProps(spark: SparkSession, name: String): Map[String, String] =
    spark.sql(s"SHOW TBLPROPERTIES $name").collect()
      .map(r => r.getString(0) -> r.getString(1))
      .filter(_._1.startsWith("graft.")).toMap

  // ===================== OPTIMIZE =====================

  /** Part-merge compaction; FINAL adds the ReplacingMergeTree collapse
    * using the engine keys recorded by CREATE TABLE. The rewrite coalesces
    * to a bounded file count — at 100 TB this is the standard maintenance
    * job that keeps scan-side file-open overhead sane. */
  private def optimizeTable(spark: SparkSession, name: String,
      fin: Boolean, dedup: Boolean, status: String => DataFrame): DataFrame = {
    val props = tableProps(spark, name)
    val targetFiles = math.max(1, spark.sparkContext.defaultParallelism / 4)
    rewriteSwap(spark, name) { df0 =>
      val df1 = if (dedup) df0.dropDuplicates() else df0
      val df2 = if (!fin) df1 else (props.get("graft.order_by"), props.get("graft.version")) match {
        case (Some(keys), Some(v)) =>
          graft.operators.ChOps.selectFinal(
            df1, keys.split(",").map(_.trim).toSeq, v)
        case _ => df1 // FINAL on a non-replacing engine is a no-op
      }
      df2.coalesce(targetFiles)
    }
    status(s"optimized $name" + (if (fin) " final" else "") +
      (if (dedup) " deduplicate" else ""))
  }

  // ===================== SHOW CREATE =====================

  private def showCreate(spark: SparkSession, name: String,
      resolve: String => DataFrame): String = {
    val (schema, props) =
      if (spark.catalog.tableExists(name))
        (spark.table(name).schema, tableProps(spark, name))
      else (resolve(name).schema, Map.empty[String, String])
    val cols = schema.fields.map(f =>
      s"  ${f.name} ${graft.model.ChTypes.toCh(f.dataType, f.nullable)}")
      .mkString(",\n")
    val engine = props.getOrElse("graft.engine", "MergeTree")
    val engineArgs = props.get("graft.version").map(v => s"($v)").getOrElse("")
    val orderBy = props.get("graft.order_by").map(k => s"\nORDER BY ($k)").getOrElse("")
    s"CREATE TABLE $name\n(\n$cols\n)\nENGINE = $engine$engineArgs$orderBy"
  }

  // ===================== ATTACH / DETACH =====================

  /** DETACHed dictionaries keep their definition here until re-ATTACHed
    * (dictionaries are session objects — no files to move). */
  private val detachedDicts = scala.collection.concurrent.TrieMap
    .empty[String, graft.sources.Dictionaries.DictDef]

  /** (db path, table name) for a possibly-qualified identifier, matching
    * the warehouse layout the managed DDL tables use. */
  private def dbPathAndTable(spark: SparkSession, name: String): (String, String) = {
    val parts = name.split("\\.")
    val (db, tbl) =
      if (parts.length == 2) (parts(0), parts(1))
      else (spark.catalog.currentDatabase, parts(0))
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    (if (db == "default") wh else s"$wh/$db.db", tbl)
  }

  /** `DETACH TABLE t`: move the data directory to `<db>/detached/<t>`
    * (CH's literal detached-parts model) and drop the catalog entry. The
    * graft table properties ride along in an underscore-prefixed metadata
    * file — parquet readers ignore `_*` files, so the directory stays a
    * valid table payload. DETACH VIEW/DICTIONARY are catalog/registry
    * moves with nothing on disk. */
  private def detach(spark: SparkSession, kind: String, ifExists: Boolean,
      name: String, status: String => DataFrame): DataFrame = kind match {
    case "DICTIONARY" =>
      graft.sources.Dictionaries.get(name) match {
        case Some(d) =>
          detachedDicts.put(name, d)
          graft.sources.Dictionaries.drop(name)
          status(s"detached dictionary $name")
        case None if ifExists => status(s"dictionary $name does not exist")
        case None => throw new IllegalArgumentException(
          s"ChSql: DICTIONARY $name does not exist")
      }
    case "VIEW" =>
      if (!spark.catalog.tableExists(name) && ifExists)
        status(s"view $name does not exist")
      else { spark.sql(s"DROP VIEW $name"); status(s"detached view $name") }
    case _ =>
      if (!spark.catalog.tableExists(name)) {
        if (ifExists) return status(s"table $name does not exist")
        throw new IllegalArgumentException(s"ChSql: TABLE $name does not exist")
      }
      val props = tableProps(spark, name)
      val (dbPath, tbl) = dbPathAndTable(spark, name)
      val loc = filePaths(spark, spark.table(name)).headOption
        .map(new org.apache.hadoop.fs.Path(_))
        .getOrElse(throw new IllegalArgumentException(
          s"ChSql: DETACH TABLE $name: not a file-backed table"))
      val dst = new org.apache.hadoop.fs.Path(s"$dbPath/detached/$tbl")
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(dst)) fs.delete(dst, true)
      fs.mkdirs(dst.getParent)
      require(fs.rename(loc, dst),
        s"ChSql: DETACH TABLE $name: could not move $loc aside")
      val out = fs.create(new org.apache.hadoop.fs.Path(dst, "_graft_props"))
      try out.write(props.map { case (k, v) => s"$k=$v" }
        .mkString("\n").getBytes("UTF-8"))
      finally out.close()
      // the data directory is gone, so the managed-table drop removes
      // only the catalog entry
      spark.sql(s"DROP TABLE $name")
      status(s"detached table $name (data kept under $dst)")
  }

  /** `ATTACH TABLE t`: the inverse — move `<db>/detached/<t>` back into
    * the warehouse and re-register the table (external, pointing at its
    * own files) with the preserved graft properties. Works across
    * sessions: the detached directory, not session memory, is the source
    * of truth. */
  private def attach(spark: SparkSession, kind: String, ifNot: Boolean,
      name: String, status: String => DataFrame): DataFrame = kind match {
    case "DICTIONARY" =>
      detachedDicts.remove(name) match {
        case Some(d) =>
          graft.sources.Dictionaries.create(name, d.load, d.keyCol, d.attrs)
          status(s"attached dictionary $name")
        case None if ifNot && graft.sources.Dictionaries.exists(name) =>
          status(s"dictionary $name already attached")
        case None => throw new IllegalArgumentException(
          s"ChSql: no detached dictionary $name")
      }
    case _ =>
      if (spark.catalog.tableExists(name)) {
        if (ifNot) return status(s"table $name already exists")
        throw new IllegalArgumentException(s"ChSql: TABLE $name already exists")
      }
      val (dbPath, tbl) = dbPathAndTable(spark, name)
      val src = new org.apache.hadoop.fs.Path(s"$dbPath/detached/$tbl")
      val dst = new org.apache.hadoop.fs.Path(s"$dbPath/$tbl")
      val fs = src.getFileSystem(spark.sparkContext.hadoopConfiguration)
      require(fs.exists(src),
        s"ChSql: no detached data for $name (expected $src)")
      val propsFile = new org.apache.hadoop.fs.Path(src, "_graft_props")
      val props: Map[String, String] =
        if (!fs.exists(propsFile)) Map.empty
        else {
          val in = fs.open(propsFile)
          val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
            finally in.close()
          fs.delete(propsFile, false)
          text.split("\n").filter(_.contains("="))
            .map { ln => val Array(k, v) = ln.split("=", 2); k -> v }.toMap
        }
      if (fs.exists(dst)) fs.delete(dst, true) // orphan from a stale create
      require(fs.rename(src, dst),
        s"ChSql: ATTACH TABLE $name: could not restore $src")
      val propsSql =
        if (props.isEmpty) ""
        else props.map { case (k, v) => s"'$k'='$v'" }
          .mkString(" TBLPROPERTIES (", ", ", ")")
      spark.sql(s"CREATE TABLE $name USING parquet LOCATION '${
        dst.toString.replace("\\", "\\\\").replace("'", "\\'")}'$propsSql")
      // partitioned layouts need their partition entries recovered
      try spark.sql(s"ALTER TABLE $name RECOVER PARTITIONS")
      catch { case _: Exception => () } // not partitioned
      status(s"attached table $name")
  }

  // ===================== SHOW family helpers =====================

  /** CH LIKE/ILIKE pattern filter over a metadata frame's name column
    * (the optional tail of the SHOW list forms). Spark's like/ilike use
    * the same `%`/`_` wildcards as CH. */
  private def likeFilter(df: DataFrame, colName: String,
      kw: Option[String], pat: Option[String],
      negate: Boolean = false): DataFrame =
    pat match {
      case None => df
      case Some(p) =>
        val c = if (kw.exists(_.equalsIgnoreCase("ILIKE")))
          col(colName).ilike(p) else col(colName).like(p)
        df.filter(if (negate) !c else c)
    }

  /** `SHOW COLUMNS FROM t` (showStmt COLUMNS, ClickHouseParser.py:
    * 12122-12203): CH's MySQL-compatible column frame — field / type /
    * null / key / default / extra. `key` marks sorting-key membership for
    * tables created through the DDL layer (CH reports PRI there too). */
  private def showColumns(spark: SparkSession, name: String,
      resolve: String => DataFrame, negate: Boolean,
      kw: Option[String], pat: Option[String]): DataFrame = {
    import spark.implicits._
    val (schema, props) =
      if (spark.catalog.tableExists(name))
        (spark.table(name).schema, tableProps(spark, name))
      else (resolve(name).schema, Map.empty[String, String])
    val keyCols = props.get("graft.order_by")
      .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty[String])
    val rows = schema.fields.toSeq.map { f =>
      (f.name, graft.model.ChTypes.toCh(f.dataType, f.nullable),
        if (f.nullable) "YES" else "NO",
        if (keyCols.contains(f.name)) "PRI" else "",
        null: String, "")
    }
    likeFilter(rows.toDF("field", "type", "null", "key", "default", "extra"),
      "field", kw, pat, negate)
  }

  /** `SHOW INDEX FROM t` (showStmt INDEX, 12344-12393): the one index a
    * MergeTree-shaped table has here is its sorting key — CH reports it
    * as the composite `PRIMARY` key, one row per component. Data-skipping
    * indexes have no explicit twin: parquet min/max column stats play
    * that role implicitly at scan time. */
  private def showIndex(spark: SparkSession, name: String): DataFrame = {
    import spark.implicits._
    val keys: Seq[String] =
      if (spark.catalog.tableExists(name))
        tableProps(spark, name).get("graft.order_by")
          .map(_.split(",").map(_.trim).toSeq).getOrElse(Nil)
      else Nil
    keys.zipWithIndex.map { case (c, i) =>
      (name, 1, "PRIMARY", i + 1, c, "A")
    }.toDF("table", "non_unique", "key_name", "seq_in_index",
      "column_name", "collation")
  }

  /** `SHOW CREATE USER|ROLE|ROW POLICY|QUOTA|SETTINGS PROFILE name`
    * (12011-12043, 12885-12917, ...): single-user model — the implicit
    * `default` user/profile/quota exist; roles and row policies have no
    * members, so asking for one is an error, same as CH for an unknown
    * entity. */
  private def showCreateAccess(kind0: String, name: String): String = {
    val kind = kind0.toUpperCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ").trim
    val normalized =
      if (kind.endsWith("PROFILE")) "SETTINGS PROFILE"
      else if (kind.endsWith("POLICY")) "ROW POLICY"
      else kind
    normalized match {
      case "USER" | "QUOTA" | "SETTINGS PROFILE" =>
        require(name.equalsIgnoreCase("default"),
          s"ChSql: there is no ${normalized.toLowerCase} named $name " +
            "(single-user engine: only 'default')")
        s"CREATE $normalized default"
      case _ =>
        throw new IllegalArgumentException(
          s"ChSql: there is no ${normalized.toLowerCase} named $name " +
            "(single-user engine defines none)")
    }
  }

  // ===================== small text utilities =====================

  /** Split `(...), (...)` into tuple bodies — quote- and paren-aware. */
  private def splitTuples(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var depth = 0; var inQ = false; var start = -1
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inQ) { if (c == '\\') i += 1 else if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' => depth += 1; if (depth == 1) start = i + 1
        case ')' =>
          depth -= 1
          if (depth == 0) { out += s.substring(start, i); start = -1 }
        case _ =>
      }
      i += 1
    }
    require(depth == 0 && !inQ, s"ChSql: unbalanced VALUES tuples in '$s'")
    out.toSeq
  }

  /** Split on top-level commas (quote- and paren/bracket-aware). */
  private def splitTop(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var depth = 0; var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inQ) {
        cur += c
        if (c == '\\' && i + 1 < s.length) { cur += s(i + 1); i += 1 }
        else if (c == '\'') inQ = false
      } else c match {
        case '\'' => inQ = true; cur += c
        case '(' | '[' => depth += 1; cur += c
        case ')' | ']' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString
    out.toSeq.map(_.trim).filter(_.nonEmpty)
  }

  /** Index of the first top-level `=` that is an assignment (not `==`,
    * `!=`, `<=`, `>=`). */
  private def topLevelEq(s: String): Int = {
    var depth = 0; var inQ = false
    var i = 0
    while (i < s.length) {
      val c = s(i)
      if (inQ) { if (c == '\\') i += 1 else if (c == '\'') inQ = false }
      else c match {
        case '\'' => inQ = true
        case '(' | '[' => depth += 1
        case ')' | ']' => depth -= 1
        case '=' if depth == 0 =>
          val prev = if (i > 0) s(i - 1) else ' '
          val next = if (i + 1 < s.length) s(i + 1) else ' '
          if (prev != '!' && prev != '<' && prev != '>' && prev != '=' && next != '=')
            return i
        case _ =>
      }
      i += 1
    }
    -1
  }
}
