package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import graft.operators.Allocation

/** Property tests (SURVEY §5 item 5): allocation operators must preserve
  * group totals exactly for arbitrary inputs. Raw ScalaCheck generators
  * sampled under fixed seeds (scalatestplus bridge not available offline).
  */
class AllocationPropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[T](gen: Gen[T], seed: Long): T =
    gen.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(throw new IllegalStateException("gen failed"))

  private val groupGen = for {
    n <- Gen.choose(1, 8)
    total <- Gen.choose(1L, 10_000_000L).map(_ / 100.0) // 2dp money
    weights <- Gen.listOfN(n, Gen.choose(1L, 1_000_000L).map(_ / 100.0))
  } yield (total, weights)

  test("weightedAllocate: SUM(alloc) == total for arbitrary groups") {
    (1L to 10L).foreach { seed =>
      val groups = sample(Gen.listOfN(5, groupGen), seed)
      val rows = groups.zipWithIndex.flatMap { case ((total, ws), g) =>
        ws.zipWithIndex.map { case (w, i) => (s"g$g", i, total, w) }
      }
      val df = rows.toDF("g", "ln", "total", "w")
      val out = Allocation.weightedAllocate(df,
        Seq(col("g")), Seq(col("ln")), col("total"), col("w"), "alloc", 2)
      val bad = out.groupBy("g")
        .agg(sum("alloc").as("s"), first("total").as("t"))
        .filter(col("s") =!= col("t").cast("decimal(38,2)"))
        .count()
      assert(bad == 0, s"seed $seed: group totals not preserved")
    }
  }

  test("divModAllocate: totals preserved for arbitrary amounts and slots") {
    val amtGen = for {
      amt <- Gen.choose(0L, 1_000_000_000L)
      n <- Gen.choose(1, 12)
    } yield (amt, n)
    (1L to 10L).foreach { seed =>
      val cases = sample(Gen.listOfN(30, amtGen), seed)
      val df = cases.zipWithIndex.map { case ((a, n), i) => (i, a, n) }
        .toDF("id", "amt", "n")
      val out = df.select(col("id"), col("amt"), col("n"),
          posexplode(sequence(lit(0), col("n") - 1)).as(Seq("pos", "v")))
        .select(col("id"), col("amt"),
          Allocation.divModAllocate(col("amt"), col("n"), col("pos")).as("alloc"))
      val bad = out.groupBy("id")
        .agg(sum("alloc").as("s"), first("amt").as("a"))
        .filter(col("s") =!= col("a")).count()
      assert(bad == 0, s"seed $seed: totals not preserved")
    }
  }
}
