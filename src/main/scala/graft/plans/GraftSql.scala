package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** SQL-dialect compatibility front end (SURVEY §4): the two statement
  * forms a reference user writes that Spark's parser rejects —
  * `QUALIFY` (reference: core/smartstore/api/order/models.sql:188 and 30+
  * other staging dedups) and `INSERT … ON CONFLICT` (113 uses across the
  * reference's load layer) — accepted here and lowered onto the same
  * engine primitives the Scala API uses.
  *
  * - [[sql]]: runs a query, rewriting a top-level `QUALIFY <pred>` into
  *   the canonical subquery + filter form. The predicate is evaluated
  *   over the query's result rows (windows included), matching
  *   DuckDB/BigQuery QUALIFY semantics: after WHERE/GROUP BY/HAVING,
  *   before ORDER BY/LIMIT (which stay outside the rewrite).
  * - [[insertOnConflict]]: parses `INSERT INTO <view> <select> ON
  *   CONFLICT (<keys>) DO NOTHING | DO UPDATE SET …`, resolves the target
  *   from the session catalog, and lowers the conflict action onto
  *   [[graft.operators.MergeOps]] — `EXCLUDED.c` → Replace,
  *   `COALESCE(EXCLUDED.c, c)` → SourceFirst, `COALESCE(c, EXCLUDED.c)` →
  *   TargetFirst, `LEAST`/`GREATEST` → Least/Greatest — returning the
  *   merged frame (the caller owns materialization, same contract as
  *   `MergeOps.upsert`).
  *
  * Both are deliberately conservative string-level rewrites: quoted
  * strings, backtick identifiers, and nesting are respected, and anything
  * unrecognized falls through to `spark.sql` so valid Spark SQL never
  * regresses. A full parser extension is not required for parity — these
  * two clauses are the only reference dialect forms Spark lacks.
  */
object GraftSql {

  /** Run a SQL query, accepting a top-level QUALIFY clause and the
    * table-maintenance statements ([[maintenance]]).
    */
  def sql(spark: SparkSession, text: String): DataFrame =
    maintenance(spark, text).getOrElse(sqlQuery(spark, text))

  /** Table-maintenance statements over the generational MERGE tables —
    * the SQL spelling of the Delta-style upkeep loop:
    *
    *   OPTIMIZE '<path>' [TARGET <bytes>]    → small-file compaction
    *     ([[graft.sources.Sinks.compactUpsertTable]]; dataChange=false
    *     commit)
    *   CHECKPOINT '<path>' [AT <version>]    → write the classic parquet
    *     checkpoint + `_last_checkpoint`
    *     ([[graft.sources.Sinks.checkpointDeltaLog]])
    *   VACUUM '<path>' [RETAIN <n> COMMITS]  → drop crashed `_txn-*`
    *     staging dirs, pre-checkpoint JSON commits, and generation
    *     directories beyond the retention window
    *     ([[graft.sources.Sinks.cleanStagedUpserts]] +
    *     [[graft.sources.Sinks.cleanDeltaLog]] +
    *     [[graft.sources.Sinks.vacuumTable]])
    *   DESCRIBE HISTORY '<path>'             → the commit log as a frame
    *     ([[graft.sources.Sinks.deltaHistory]])
    *   RESTORE '<path>' TO VERSION AS OF <v> → undo-by-append: commit
    *     the state at version v on top of the log
    *     ([[graft.sources.Sinks.restoreDeltaTable]]); also
    *     `TO TIMESTAMP AS OF '<yyyy-MM-dd HH:mm:ss[.f]>'` via
    *     [[graft.sources.Sinks.versionAtTimestamp]]
    *   ALTER TABLE '<path>' ADD CONSTRAINT <name> CHECK (<expr>) →
    *     validate every existing row, then enforce on all future MERGEs
    *     ([[graft.sources.Sinks.addDeltaCheckConstraint]]); DROP
    *     CONSTRAINT <name> removes it
    *     ([[graft.sources.Sinks.dropDeltaCheckConstraint]])
    *   ALTER TABLE '<path>' RENAME COLUMN <from> TO <to> →
    *     metadata-only rename via column mapping
    *     ([[graft.sources.Sinks.renameDeltaColumn]])
    *
    * Each returns a one-row summary frame. Anything else returns None
    * and falls through to the query path — valid Spark SQL never
    * regresses.
    */
  private def maintenance(spark: SparkSession,
                          text: String): Option[DataFrame] = {
    import spark.implicits._
    val Opt = """(?is)\s*OPTIMIZE\s+'([^']+)'(?:\s+TARGET\s+(\d+))?\s*;?\s*""".r
    val Cp = """(?is)\s*CHECKPOINT\s+'([^']+)'(?:\s+AT\s+(\d+))?\s*;?\s*""".r
    val Vac = """(?is)\s*VACUUM\s+'([^']+)'(?:\s+RETAIN\s+(\d+)\s+COMMITS)?\s*;?\s*""".r
    val Hist = """(?is)\s*DESCRIBE\s+HISTORY\s+'([^']+)'\s*;?\s*""".r
    val RstV =
      """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+VERSION\s+AS\s+OF\s+(\d+)\s*;?\s*""".r
    val RstTs =
      """(?is)\s*RESTORE\s+'([^']+)'\s+TO\s+TIMESTAMP\s+AS\s+OF\s+'([^']+)'\s*;?\s*""".r
    val AddCk =
      """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+ADD\s+CONSTRAINT\s+(\w+)\s+CHECK\s*\((.+)\)\s*;?\s*""".r
    val DropCk =
      """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+DROP\s+CONSTRAINT\s+(\w+)\s*;?\s*""".r
    val RenCol =
      """(?is)\s*ALTER\s+TABLE\s+'([^']+)'\s+RENAME\s+COLUMN\s+(\w+)\s+TO\s+(\w+)\s*;?\s*""".r
    def restore(path: String, version: Long) = {
      val (nv, added, removed) =
        graft.sources.Sinks.restoreDeltaTable(spark, path, version)
      Some(Seq((path, "RESTORE", version, nv, added.toLong,
        removed.toLong)).toDF("path", "operation", "restored_version",
        "new_version", "files_added", "files_removed"))
    }
    text match {
      case Hist(path) =>
        Some(graft.sources.Sinks.deltaHistory(spark, path))
      case RstV(path, v) => restore(path, v.toLong)
      case RstTs(path, ts) =>
        restore(path, graft.sources.Sinks.versionAtTimestamp(path,
          java.sql.Timestamp.valueOf(ts).getTime))
      case AddCk(path, name, check) =>
        graft.sources.Sinks.addDeltaCheckConstraint(spark, path, name,
          check.trim)
        Some(Seq((path, "ADD CONSTRAINT", name, check.trim))
          .toDF("path", "operation", "constraint_name", "check_expr"))
      case DropCk(path, name) =>
        graft.sources.Sinks.dropDeltaCheckConstraint(spark, path, name)
        Some(Seq((path, "DROP CONSTRAINT", name))
          .toDF("path", "operation", "constraint_name"))
      case RenCol(path, from, to) =>
        graft.sources.Sinks.renameDeltaColumn(spark, path, from, to)
        Some(Seq((path, "RENAME COLUMN", from, to))
          .toDF("path", "operation", "from_column", "to_column"))
      case Opt(path, target) =>
        val tb = Option(target).map(_.toLong).getOrElse(128L * 1024 * 1024)
        val (before, after) =
          graft.sources.Sinks.compactUpsertTable(spark, path, tb)
        Some(Seq((path, "OPTIMIZE", before.toLong, after.toLong))
          .toDF("path", "operation", "files_before", "files_after"))
      case Cp(path, v) =>
        val ver = graft.sources.Sinks.checkpointDeltaLog(spark, path,
          Option(v).map(_.toLong).getOrElse(-1L))
        Some(Seq((path, "CHECKPOINT", ver))
          .toDF("path", "operation", "version"))
      case Vac(path, retain) =>
        val keepCommits = Option(retain).map(_.toInt)
        // data-file retention sweep FIRST (round-14 ADVICE): its
        // crash-lagging refusal must fire BEFORE any cleanup mutates —
        // the old order ran the staged-dir and log-commit pruning and
        // only then surfaced the refusal, leaving a statement that
        // "failed" yet had already changed state. vacuumTable itself
        // checks-then-sweeps, so a refusal here leaves the table
        // untouched. Ages out generation dirs beyond the keep window —
        // live-referenced dirs are never touched (see Sinks.vacuumTable).
        // RETAIN n COMMITS extends to DATA retention too: time travel
        // to a retained commit must still find its files (round-13
        // review find — a RETAIN 10 run at the default keep=3 would
        // silently break reads of commits 4-9 back)
        val gens = graft.sources.Sinks.vacuumTable(spark, path,
          keepGenerations = math.max(3, keepCommits.getOrElse(0)))
        val staged = graft.sources.Sinks.cleanStagedUpserts(path)
        val logs = graft.sources.Sinks.cleanDeltaLog(path,
          keepCommits.getOrElse(0))
        Some(Seq((path, "VACUUM", staged.toLong, logs.toLong,
          gens.toLong))
          .toDF("path", "operation", "staged_removed", "commits_removed",
            "generations_removed"))
      case _ => None
    }
  }

  private def sqlQuery(spark: SparkSession, text: String): DataFrame =
    splitQualify(text) match {
      case None => spark.sql(text)
      case Some((body, pred, tail)) =>
        val inner = spark.sql(
          s"SELECT *, ($pred) AS __qualify FROM (\n$body\n)")
          .filter(col("__qualify")).drop("__qualify")
        if (tail.trim.isEmpty) inner
        else {
          // ORDER BY / LIMIT written after QUALIFY apply to the filtered
          // result — re-attach them over a temp view of the rewrite
          // (unique name so concurrent calls never collide; dropped after
          // analysis so repeated calls don't grow the session catalog)
          val v = "__graft_qualify_" +
            java.util.UUID.randomUUID().toString.replace("-", "")
          inner.createOrReplaceTempView(v)
          try spark.sql(s"SELECT * FROM $v $tail")
          finally spark.catalog.dropTempView(v)
        }
    }

  /** Find a top-level QUALIFY clause: returns (body-before, predicate,
    * trailing ORDER BY/LIMIT clause). None when the query has no
    * top-level QUALIFY (nested/quoted occurrences are NOT matched).
    */
  private[graft] def splitQualify(text: String): Option[(String, String, String)] = {
    val toks = topLevelKeywordOffsets(text)
    toks.find(_._1 == "QUALIFY").map { case (_, start, end) =>
      val after = toks.filter(t => (t._1 == "ORDER" || t._1 == "LIMIT") && t._2 > start)
      val tailStart = after.map(_._2).minOption.getOrElse(text.length)
      (text.substring(0, start), text.substring(end, tailStart),
        text.substring(tailStart))
    }
  }

  /** Offsets of top-level (depth-0, unquoted, uncommented) keywords of
    * interest. `--` line comments and nested `/* */` block comments are
    * skipped — a QUALIFY inside a comment must not trigger the rewrite
    * (the fallthrough contract: valid Spark SQL never regresses).
    */
  private def topLevelKeywordOffsets(text: String): Seq[(String, Int, Int)] = {
    val out = Seq.newBuilder[(String, Int, Int)]
    var i = 0; var depth = 0
    while (i < text.length) {
      if (i + 1 < text.length && text.charAt(i) == '-' && text.charAt(i + 1) == '-') {
        while (i < text.length && text.charAt(i) != '\n') i += 1
      } else if (i + 1 < text.length && text.charAt(i) == '/' && text.charAt(i + 1) == '*') {
        var nest = 1; i += 2
        while (i < text.length && nest > 0) {
          if (i + 1 < text.length && text.charAt(i) == '/' && text.charAt(i + 1) == '*') {
            nest += 1; i += 2
          } else if (i + 1 < text.length && text.charAt(i) == '*' && text.charAt(i + 1) == '/') {
            nest -= 1; i += 2
          } else i += 1
        }
      } else text.charAt(i) match {
        case '(' => depth += 1; i += 1
        case ')' => depth -= 1; i += 1
        case '\'' | '"' | '`' =>
          val q = text.charAt(i); i += 1
          while (i < text.length && text.charAt(i) != q) i += 1
          i += 1
        case c if c.isLetter && (i == 0 || !isWordChar(text.charAt(i - 1))) =>
          var j = i
          while (j < text.length && isWordChar(text.charAt(j))) j += 1
          val w = text.substring(i, j).toUpperCase
          if (depth == 0 && (w == "QUALIFY" || w == "ORDER" || w == "LIMIT"))
            out += ((w, i, j))
          i = j
        case _ => i += 1
      }
    }
    out.result()
  }

  private def isWordChar(c: Char): Boolean = c.isLetterOrDigit || c == '_'

  private val InsertRe =
    raw"(?is)\s*INSERT\s+INTO\s+([\w.`]+)\s+(.*?)\s+ON\s+CONFLICT\s*(?:\(([^)]*)\))?\s*DO\s+(NOTHING|UPDATE\s+SET\s+.*)\s*;?\s*".r

  /** Parse and execute an `INSERT … ON CONFLICT` against a catalog/temp
    * view target; returns the merged frame. `ON CONFLICT DO NOTHING`
    * without a key list uses `defaultKeys`.
    */
  def insertOnConflict(spark: SparkSession, text: String,
                       defaultKeys: Seq[String] = Nil): DataFrame = {
    import graft.operators.MergeOps
    // strip the statement terminator up front: the DO UPDATE arm's greedy
    // tail would otherwise carry ';' into the last SET clause's rhs
    text.trim.stripSuffix(";") match {
      case InsertRe(table, select, keysOpt, action) =>
        val target = spark.table(table.replace("`", ""))
        val source = sql(spark, select)
        val keys = Option(keysOpt).map(_.split(",").map(cleanIdent).toSeq)
          .getOrElse(defaultKeys)
        require(keys.nonEmpty,
          "ON CONFLICT requires a key list (or pass defaultKeys)")
        if (action.toUpperCase.startsWith("NOTHING"))
          MergeOps.insertIgnore(target, source, keys)
        else {
          val sets = action.replaceFirst("(?is)^UPDATE\\s+SET\\s+", "")
          val strategies = splitTopLevel(sets, ',').map { clause =>
            val Array(lhs, rhs) = clause.split("=", 2)
            cleanIdent(lhs) -> strategyOf(cleanIdent(lhs), rhs.trim)
          }.toMap
          MergeOps.upsert(target, source, keys, strategies)
        }
      case _ => throw new IllegalArgumentException(
        s"not an INSERT … ON CONFLICT statement: $text")
    }
  }

  private def cleanIdent(s: String): String = s.trim.replaceAll("[`\"]", "")

  /** Map one `SET c = <expr>` right-hand side onto a MergeOps strategy. */
  private[graft] def strategyOf(col: String,
                                rhs: String): graft.operators.MergeOps.Strategy = {
    import graft.operators.MergeOps._
    val r = rhs.trim.replaceAll("\\s+", "")
    val c = java.util.regex.Pattern.quote(col)
    if (r.matches(s"(?i)EXCLUDED\\.$c")) Replace
    else if (r.matches(s"(?i)COALESCE\\(EXCLUDED\\.$c,$c\\)")) SourceFirst
    else if (r.matches(s"(?i)COALESCE\\($c,EXCLUDED\\.$c\\)")) TargetFirst
    else if (r.matches(s"(?i)LEAST\\(EXCLUDED\\.$c,$c\\)") ||
      r.matches(s"(?i)LEAST\\($c,EXCLUDED\\.$c\\)")) Least
    else if (r.matches(s"(?i)GREATEST\\(EXCLUDED\\.$c,$c\\)") ||
      r.matches(s"(?i)GREATEST\\($c,EXCLUDED\\.$c\\)")) Greatest
    else if (r.matches(s"(?i)$c")) Ignore
    else throw new IllegalArgumentException(
      s"unsupported ON CONFLICT SET form for $col: $rhs (supported: " +
        "EXCLUDED.c, COALESCE(EXCLUDED.c, c), COALESCE(c, EXCLUDED.c), " +
        "LEAST/GREATEST(EXCLUDED.c, c), c)")
  }

  /** Split on a separator at paren depth 0, respecting quotes. */
  private def splitTopLevel(s: String, sep: Char): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = 0; var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '(' => depth += 1
        case ')' => depth -= 1
        case '\'' | '"' | '`' =>
          val q = s.charAt(i); i += 1
          while (i < s.length && s.charAt(i) != q) i += 1
        case c if c == sep && depth == 0 =>
          out += s.substring(start, i); start = i + 1
        case _ =>
      }
      i += 1
    }
    out += s.substring(start)
    out.result()
  }
}
