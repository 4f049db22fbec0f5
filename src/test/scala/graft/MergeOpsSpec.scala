package graft

import org.apache.spark.sql.functions._
import graft.operators.MergeOps
import graft.operators.MergeOps._

class MergeOpsSpec extends SparkSpec {
  import spark.implicits._

  private def target = Seq(
    (1L, "t1", Option(10.0)),
    (2L, "t2", Option.empty[Double]),
    (3L, "t3", Option(30.0))
  ).toDF("k", "name", "v")

  private def source = Seq(
    (2L, "s2", Option(20.0)),
    (3L, null.asInstanceOf[String], Option(3.0)),
    (4L, "s4", Option(40.0))
  ).toDF("k", "name", "v")

  test("upsert Replace takes source values on match, inserts new, keeps unmatched") {
    val out = MergeOps.upsert(target, source, Seq("k"),
      default = Replace).orderBy("k").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L, 4L))
    assert(out(1).getString(1) == "s2")
    assert(out(2).getString(1) == null) // Replace takes source null too
    assert(out(0).getString(1) == "t1") // unmatched target untouched
    assert(out(3).getString(1) == "s4") // inserted
  }

  test("upsert SourceFirst coalesces source nulls to target") {
    val out = MergeOps.upsert(target, source, Seq("k"),
      default = SourceFirst).orderBy("k").collect()
    assert(out(2).getString(1) == "t3") // source null → target kept
    assert(out(1).getString(1) == "s2")
  }

  test("upsert TargetFirst fills only target nulls") {
    val out = MergeOps.upsert(target, source, Seq("k"),
      default = TargetFirst).orderBy("k").collect()
    assert(out(1).getString(1) == "t2")      // target non-null kept
    assert(out(1).getDouble(2) == 20.0)      // target null filled
  }

  test("upsert Greatest/Least per-column strategies") {
    val out = MergeOps.upsert(target, source, Seq("k"),
      Map("v" -> Greatest), default = Ignore).orderBy("k").collect()
    assert(out(2).getDouble(2) == 30.0) // greatest(3, 30)
    assert(out(2).getString(1) == "t3") // Ignore keeps target
  }

  test("upsert pre-dedups source keys deterministically") {
    val dupSource = Seq((2L, "a", Option(1.0)), (2L, "b", Option(2.0)))
      .toDF("k", "name", "v")
    val out = MergeOps.upsert(target, dupSource, Seq("k"),
      default = Replace, dedupOrder = Seq(col("name")))
      .filter(col("k") === 2).collect()
    assert(out.length == 1)
    assert(out(0).getString(1) == "a") // first by name
  }

  test("insertIgnore adds only absent keys") {
    val out = MergeOps.insertIgnore(target, source, Seq("k"))
      .orderBy("k").collect()
    assert(out.length == 4)
    assert(out(1).getString(1) == "t2") // existing key untouched
    assert(out(3).getString(1) == "s4")
  }

  test("alignSchemas widens both sides; merge evolves the schema") {
    val t = Seq((1L, "a"), (2L, "b")).toDF("k", "name")
    val s = Seq((2L, "B", 9.5), (3L, "C", 1.5)).toDF("k", "name", "score")
    val (t2, s2) = MergeOps.alignSchemas(t, s)
    assert(t2.columns.toSeq == Seq("k", "name", "score"),
      "target-first column order, new source column appended")
    assert(s2.columns.toSeq == Seq("k", "name", "score"))
    val out = MergeOps.upsert(t2, s2, Seq("k"))
      .orderBy("k").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2))))
    assert(out.toSeq == Seq(
      (1L, "a", None),          // untouched row: new column is NULL
      (2L, "B", Some(9.5)),     // updated row gains the new column
      (3L, "C", Some(1.5))))    // inserted row carries it
  }

  test("alignSchemas: a source batch MISSING a column leaves target values") {
    val t = Seq((1L, "a", 10.0)).toDF("k", "name", "score")
    val s = Seq((1L, "A")).toDF("k", "name")
    val (t2, s2) = MergeOps.alignSchemas(t, s)
    val out = MergeOps.upsert(t2, s2, Seq("k")).collect()
    assert(out(0).getString(1) == "A", "present column updates")
    assert(out(0).getDouble(2) == 10.0,
      "absent column coalesces to the target value")
  }

  test("alignSchemas rejects a same-name type change") {
    val t = Seq((1L, "a")).toDF("k", "v")
    val s = Seq((1L, 2.0)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      MergeOps.alignSchemas(t, s)
    }
    assert(e.getMessage.contains("cannot change a column's type"))
  }

  test("alignSchemas rejects a case-only rename (withColumn would null data)") {
    val t = Seq((1L, "a")).toDF("k", "score")
    val s = Seq((1L, "b")).toDF("k", "Score")
    val e = intercept[IllegalArgumentException] {
      MergeOps.alignSchemas(t, s)
    }
    assert(e.getMessage.contains("cannot re-case"))
  }
}
