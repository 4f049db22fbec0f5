package graft.sources

import java.sql.DriverManager
import java.util.Properties

import org.apache.spark.sql.{DataFrame, SaveMode}

import graft.operators.MergeOps
import graft.operators.MergeOps._

/** S14 — strict relational sink via JDBC with the reference's staged-MERGE
  * protocol (reference: extensions/postgres.py:601-815 and
  * airflow/plugins/dual_load.py:23-103):
  *
  *  1. the batch is written DISTRIBUTED via `df.write.jdbc` into a staging
  *     table (executors stream partitions concurrently — the only data
  *     movement);
  *  2. one driver-side `MERGE INTO target USING staging` applies the
  *     per-column [[MergeOps.Strategy]] DSL transactionally inside the
  *     database;
  *  3. the staging table is dropped.
  *
  * Driver-side SQL here is metadata-scale work (DDL + one set-based MERGE
  * the database executes itself); row data never flows through the driver.
  *
  * Quoting matches Spark's JDBC writer exactly: COLUMN names are created
  * double-quoted (case-preserved), TABLE names are created unquoted (the
  * database folds them — uppercase in Derby, lowercase in Postgres) — so
  * this SQL quotes columns and leaves table names bare.
  */
object JdbcSink {

  private def q(ident: String): String = "\"" + ident + "\""

  /** Per-column conflict expression in portable SQL, matching the Spark
    * semantics of [[MergeOps.upsert]] exactly — including `greatest`/`least`
    * null-skipping (SQL comparisons with NULL would otherwise silently pick
    * the target arm).
    */
  private[graft] def strategySql(c: String, s: Strategy): String = {
    val sc = s"s.${q(c)}"; val tc = s"t.${q(c)}"
    s match {
      case Replace     => sc
      case Ignore      => tc
      case Greatest    => s"CASE WHEN $tc IS NULL THEN $sc WHEN $sc IS NULL THEN $tc " +
                          s"WHEN $sc > $tc THEN $sc ELSE $tc END"
      case Least       => s"CASE WHEN $tc IS NULL THEN $sc WHEN $sc IS NULL THEN $tc " +
                          s"WHEN $sc < $tc THEN $sc ELSE $tc END"
      case SourceFirst => s"COALESCE($sc, $tc)"
      case TargetFirst => s"COALESCE($tc, $sc)"
    }
  }

  /** ANSI `MERGE` statement (Derby, Postgres 15+, SQL Server, BigQuery). */
  private[graft] def mergeSql(target: String, staging: String,
                                keys: Seq[String], valueCols: Seq[String],
                                strategies: Map[String, Strategy],
                                default: Strategy): String = {
    val on = keys.map(k => s"t.${q(k)} = s.${q(k)}").mkString(" AND ")
    val sets = valueCols
      .map(c => s"${q(c)} = ${strategySql(c, strategies.getOrElse(c, default))}")
      .mkString(", ")
    val insertCols = (keys ++ valueCols).map(q).mkString(", ")
    val insertVals = (keys ++ valueCols).map(c => s"s.${q(c)}").mkString(", ")
    val update = if (valueCols.nonEmpty) s"WHEN MATCHED THEN UPDATE SET $sets " else ""
    s"MERGE INTO $target t USING $staging s ON $on " +
      update +
      s"WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"
  }

  /** Postgres `INSERT … ON CONFLICT` dialect of the same strategy DSL — the
    * reference's primary form (postgres.py:554-581); `EXCLUDED` plays the
    * source role. For engines predating ANSI MERGE.
    */
  private[graft] def onConflictSql(target: String, staging: String,
                                     keys: Seq[String], valueCols: Seq[String],
                                     strategies: Map[String, Strategy],
                                     default: Strategy): String = {
    def expr(c: String): String =
      strategySql(c, strategies.getOrElse(c, default))
        .replace(s"s.${q(c)}", s"EXCLUDED.${q(c)}")
        .replace(s"t.${q(c)}", s"$target.${q(c)}")
    val cols = (keys ++ valueCols).map(q).mkString(", ")
    val conflict = keys.map(q).mkString(", ")
    val sets = valueCols.map(c => s"${q(c)} = ${expr(c)}").mkString(", ")
    val action = if (valueCols.nonEmpty) s"DO UPDATE SET $sets" else "DO NOTHING"
    s"INSERT INTO $target ($cols) SELECT $cols FROM $staging " +
      s"ON CONFLICT ($conflict) $action"
  }

  /** Staged MERGE into a JDBC table. Returns the staged row count.
    *
    * The source is pre-deduped on `keys` (MERGE requires unique source keys;
    * same rule as [[MergeOps.upsert]]). If the target table does not exist it
    * is created empty from the staging schema, so first load and incremental
    * load share one code path (reference postgres.py:601-640).
    */
  def stagedMerge(df: DataFrame, url: String, table: String, keys: Seq[String],
                  strategies: Map[String, Strategy] = Map.empty,
                  default: Strategy = SourceFirst,
                  props: Properties = new Properties,
                  stagingTable: Option[String] = None): Long = {
    val staging = stagingTable.getOrElse(s"${table}_stg")
    val deduped = df.dropDuplicates(keys)
    val valueCols = df.columns.filterNot(keys.contains).toSeq
    deduped.write.mode(SaveMode.Overwrite).jdbc(url, staging, props)
    val conn = DriverManager.getConnection(url, props)
    try {
      def tableExists(name: String): Boolean = {
        val rs = conn.getMetaData.getTables(null, null, name, null)
        try rs.next() finally rs.close()
      }
      // unquoted names are folded by the database — probe both folds
      val exists = tableExists(table) || tableExists(table.toUpperCase) ||
        tableExists(table.toLowerCase)
      val st = conn.createStatement()
      try {
        // count what was actually staged (a second evaluation of `deduped`
        // would re-run the scan+shuffle and could disagree with the write)
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $staging")
        val n = { rs.next(); rs.getLong(1) }
        rs.close()
        if (!exists)
          st.executeUpdate(
            s"CREATE TABLE $table AS SELECT * FROM $staging WITH NO DATA")
        st.executeUpdate(
          mergeSql(table, staging, keys, valueCols, strategies, default))
        n
      } finally {
        // staging cleanup must happen on the failure path too — a leaked
        // staging table breaks the next run's Overwrite; ignore drop errors
        // (the original exception is the one worth surfacing)
        try st.executeUpdate(s"DROP TABLE $staging")
        catch { case _: java.sql.SQLException => }
        st.close()
      }
    } finally conn.close()
  }

  /** A `dualLoad`-shaped strict sink closing over connection details. */
  def strictSink(url: String, table: String, keys: Seq[String],
                 strategies: Map[String, Strategy] = Map.empty,
                 props: Properties = new Properties): DataFrame => Unit =
    df => { stagedMerge(df, url, table, keys, strategies, props = props); () }
}
