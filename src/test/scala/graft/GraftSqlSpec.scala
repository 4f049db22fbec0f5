package graft

import org.apache.spark.sql.functions._
import graft.plans.GraftSql

class GraftSqlSpec extends SparkSpec {
  import spark.implicits._

  test("QUALIFY rewrites to window filter (top-1 per key)") {
    Seq(("a", 1, 10), ("a", 2, 20), ("b", 3, 5), ("b", 4, 1))
      .toDF("k", "id", "v").createOrReplaceTempView("t_qual")
    val out = GraftSql.sql(spark,
      """SELECT k, id, v FROM t_qual
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) = 1""".stripMargin)
      .orderBy("k").collect()
    assert(out.map(r => (r.getString(0), r.getInt(1))).toSeq ==
      Seq(("a", 2), ("b", 3)))
  }

  test("QUALIFY with trailing ORDER BY/LIMIT; nested QUALIFY-free SQL untouched") {
    Seq(("a", 1), ("a", 2), ("a", 3), ("b", 9)).toDF("k", "v")
      .createOrReplaceTempView("t_qual2")
    val out = GraftSql.sql(spark,
      """SELECT k, v FROM t_qual2
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY v DESC) <= 2
        |ORDER BY v DESC LIMIT 2""".stripMargin).collect()
    assert(out.map(_.getInt(1)).toSeq == Seq(9, 3))
    // plain SQL (even with 'qualify' inside a string literal) passes through
    val plain = GraftSql.sql(spark,
      "SELECT 'no qualify here' AS s, count(*) AS n FROM t_qual2").collect()
    assert(plain.head.getLong(1) == 4L)
  }

  test("INSERT ON CONFLICT DO NOTHING lowers to insertIgnore") {
    Seq((1L, "a"), (2L, "b")).toDF("k", "name")
      .createOrReplaceTempView("t_conflict")
    Seq((2L, "B2"), (3L, "c")).toDF("k", "name")
      .createOrReplaceTempView("s_conflict")
    val out = GraftSql.insertOnConflict(spark,
      "INSERT INTO t_conflict SELECT * FROM s_conflict ON CONFLICT (k) DO NOTHING")
      .orderBy("k").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ==
      Seq((1L, "a"), (2L, "b"), (3L, "c")), "existing key 2 untouched")
  }

  test("INSERT ON CONFLICT DO UPDATE maps SET forms onto merge strategies") {
    Seq((1L, "a", 10, 100), (2L, "b", 20, 200)).toDF("k", "name", "lo", "hi")
      .createOrReplaceTempView("t_merge")
    Seq((2L, null.asInstanceOf[String], 5, 500), (3L, "c", 30, 300))
      .toDF("k", "name", "lo", "hi").createOrReplaceTempView("s_merge")
    val out = GraftSql.insertOnConflict(spark,
      """INSERT INTO t_merge SELECT * FROM s_merge
        |ON CONFLICT (k) DO UPDATE SET
        |  name = COALESCE(EXCLUDED.name, name),
        |  lo = LEAST(EXCLUDED.lo, lo),
        |  hi = GREATEST(EXCLUDED.hi, hi)""".stripMargin)
      .orderBy("k").collect()
    assert(out.length == 3)
    val r2 = out(1)
    assert(r2.getString(1) == "b", "null source name coalesces to target")
    assert(r2.getInt(2) == 5 && r2.getInt(3) == 500, "LEAST/GREATEST applied")
  }

  test("unsupported SET form fails loudly") {
    intercept[IllegalArgumentException] {
      GraftSql.strategyOf("c", "c + EXCLUDED.c")
    }
  }

  test("QUALIFY inside comments is NOT a clause; trailing semicolons parse") {
    Seq(("a", 1), ("a", 2)).toDF("k", "rn").createOrReplaceTempView("t_cmt")
    // line + block comments naming QUALIFY/ORDER/LIMIT must not trigger
    // the rewrite — the query is valid Spark SQL and passes through whole
    val out = GraftSql.sql(spark,
      """SELECT k, rn FROM t_cmt -- QUALIFY rn = 1
        |/* ORDER BY nothing LIMIT 0 */""".stripMargin).collect()
    assert(out.length == 2, "commented-out QUALIFY must not filter rows")
    // a real QUALIFY after a comment still works
    val real = GraftSql.sql(spark,
      """SELECT k, rn FROM t_cmt -- dedup below
        |QUALIFY ROW_NUMBER() OVER (PARTITION BY k ORDER BY rn DESC) = 1""".stripMargin)
      .collect()
    assert(real.length == 1 && real.head.getInt(1) == 2)

    // reference load statements end with ';' — DO UPDATE must still parse
    Seq((1L, "a")).toDF("k", "v").createOrReplaceTempView("t_semi")
    Seq((1L, "b")).toDF("k", "v").createOrReplaceTempView("s_semi")
    val merged = GraftSql.insertOnConflict(spark,
      "INSERT INTO t_semi SELECT * FROM s_semi ON CONFLICT (k) DO UPDATE SET v = EXCLUDED.v;")
      .collect()
    assert(merged.head.getString(1) == "b")
  }

  test("P5 SELECT * EXCEPT needs no rewrite — Spark 4 parses it natively") {
    // the reference's 25 BigQuery `SELECT * EXCEPT (cols)` sites map to
    // df.drop(cols) in the DataFrame API (q05) and to plain spark.sql
    // here — pinned so a Spark upgrade that drops the syntax is caught
    Seq((1L, "a", 2.0)).toDF("k", "v", "w")
      .createOrReplaceTempView("except_t")
    val cols = spark.sql("SELECT * EXCEPT (v) FROM except_t").columns
    assert(cols.toSeq == Seq("k", "w"))
  }

  test("maintenance statements: OPTIMIZE / CHECKPOINT / VACUUM lower " +
    "onto the table upkeep primitives; queries fall through untouched") {
    import graft.plans.GraftSql
    val dir = java.nio.file.Files.createTempDirectory("sqlmaint")
      .toString + "/t"
    // many small files so OPTIMIZE has work
    val coalKey = "spark.sql.adaptive.coalescePartitions.enabled"
    val prevCoal = spark.conf.get(coalKey, "true")
    spark.conf.set(coalKey, "false")
    try (0 until 3).foreach { i =>
      graft.sources.Sinks.upsertParquet(spark, dir,
        spark.range(i * 10, i * 10 + 10).toDF("k").repartition(8)
          .withColumn("v", col("k") * 2), Seq("k"),
        checkpointInterval = 0)
    } finally spark.conf.set(coalKey, prevCoal)
    val opt = GraftSql.sql(spark, s"OPTIMIZE '$dir'").head()
    assert(opt.getString(1) == "OPTIMIZE" &&
      opt.getLong(3) < opt.getLong(2), "compaction shrank the file count")
    val cp = GraftSql.sql(spark, s"CHECKPOINT '$dir'").head()
    assert(cp.getString(1) == "CHECKPOINT")
    val cpV = cp.getLong(2)
    assert(java.nio.file.Files.isRegularFile(java.nio.file.Paths.get(
      dir, "_delta_log", f"$cpV%020d.checkpoint.parquet")))
    val vac = GraftSql.sql(spark, s"VACUUM '$dir' RETAIN 1 COMMITS").head()
    assert(vac.getString(1) == "VACUUM" && vac.getLong(3) >= 1,
      s"pre-checkpoint commits removed: ${vac.getLong(3)}")
    // state still reconstructs after the upkeep cycle
    assert(graft.sources.Sinks.readDeltaTableAt(spark, dir).count() == 30)
    // DESCRIBE HISTORY shows the retained commits with operations
    val hist = GraftSql.sql(spark, s"DESCRIBE HISTORY '$dir'")
      .orderBy("version").collect()
    assert(hist.nonEmpty &&
      hist.map(_.getString(2)).toSet.subsetOf(Set("MERGE", "OPTIMIZE")))
    // non-maintenance text falls through to the query path
    assert(GraftSql.sql(spark, "SELECT 1 AS one").head().getInt(0) == 1)
  }
}
