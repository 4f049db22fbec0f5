package graft

import org.apache.spark.sql.functions._
import graft.operators.Allocation

class AllocationSpec extends SparkSpec {
  import spark.implicits._

  test("weightedAllocate preserves group totals exactly") {
    val df = Seq(
      ("g1", 1, 100.0, 33.333),
      ("g1", 2, 100.0, 33.333),
      ("g1", 3, 100.0, 33.334),
      ("g2", 1, 10.0, 1.0),
      ("g2", 2, 10.0, 2.0)
    ).toDF("g", "ln", "total", "w")
    val out = Allocation.weightedAllocate(df,
      Seq(col("g")), Seq(col("ln")), col("total"), col("w"), "alloc", 2)
    val sums = out.groupBy("g")
      .agg(sum("alloc").as("s"), first("total").as("t"))
      .collect()
    sums.foreach { r =>
      assert(BigDecimal(r.getDecimal(1)) == BigDecimal(r.getDouble(2)),
        s"group ${r.getString(0)}: ${r.getDecimal(1)} != ${r.getDouble(2)}")
    }
  }

  test("weightedAllocate remainder lands on first row by order") {
    val df = Seq(("g", 1, 100.0, 1.0), ("g", 2, 100.0, 1.0), ("g", 3, 100.0, 1.0))
      .toDF("g", "ln", "total", "w")
    val out = Allocation.weightedAllocate(df,
      Seq(col("g")), Seq(col("ln")), col("total"), col("w"), "alloc", 2)
      .orderBy("ln").collect()
    // 100/3 = 33.33 each, remainder .01 on row 1
    assert(out(0).getDecimal(4).toString == "33.34")
    assert(out(1).getDecimal(4).toString == "33.33")
    assert(out(2).getDecimal(4).toString == "33.33")
  }

  test("divModAllocate preserves totals and puts mod on offset 0") {
    val df = Seq((100L, 3), (7L, 2), (5L, 5)).toDF("amt", "n")
    val out = df.select(col("amt"), col("n"),
        posexplode(sequence(lit(0), col("n") - 1)).as(Seq("pos", "v")))
      .select(col("amt"), col("n"), col("pos"),
        Allocation.divModAllocate(col("amt"), col("n"), col("pos")).as("alloc"))
    val sums = out.groupBy("amt").agg(sum("alloc").as("s")).collect()
    sums.foreach(r => assert(r.getLong(0) == r.getLong(1)))
    val first = out.filter(col("amt") === 100 && col("pos") === 0).head()
    assert(first.getLong(3) == 34) // 33 + mod 1
  }
}
