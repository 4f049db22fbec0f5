package graft

import org.apache.spark.sql.functions._
import graft.staging.{Exposure, NaverSearch}

class Staging5Spec extends SparkSpec {
  import spark.implicits._

  test("naver search summary: double-nested payload → per-(seq,subject) counts") {
    val raw = Seq(
      ("q1", """[[{"section":"shop","subject":"a"},{"section":"shop","subject":"a"}],
                [{"section":"cafe","subject":"b"}]]""".replaceAll("\\s+", "")),
      ("q1", """[[{"section":"shop","subject":"a"}]]""")
    ).toDF("q", "p")
    val out = NaverSearch.stageSummary(raw, col("q"), col("p"))
      .orderBy("seq", "subject").collect()
    assert(out.length == 2)
    assert(out(0).getLong(1) == 0 && out(0).getString(3) == "a" &&
      out(0).getLong(4) == 3)  // 2 in row 1 + 1 in row 2, same (seq=0, shop, a)
    assert(out(1).getLong(1) == 1 && out(1).getString(3) == "b" &&
      out(1).getLong(4) == 1)
  }

  test("naver search summary: malformed payload fails by default, ignorable") {
    val bad = Seq(("q1", "{not json")).toDF("q", "p")
    val e = intercept[Exception] {
      NaverSearch.stageSummary(bad, col("q"), col("p")).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.toLowerCase.contains("malformed")), s"got: ${msgs(e)}")
    assert(NaverSearch.stageSummary(bad, col("q"), col("p"),
      onMalformed = "ignore").count() == 0)
  }

  private def exposureRaw = Seq(
    (1, "https://shopping-cdn.example/main_123/77001.jpg", "P1", true, "c>d", "B", "M", Some("1000"), None: Option[String]),
    (2, "https://searchad-img.example/ad/NzcwMDI=.png", "P2", false, "c>d", "", "M", None, Some("2000")),
    (3, "https://other.example/x.png", "P3", true, "c>d", "B", "", None, None)
  ).toDF("rank", "imageUrl", "productTitle", "isOwn", "categoryNames",
    "fmpBrand", "fmpMaker", "lowPrice", "mobileLowPrice")

  test("exposure staging: url-family id recovery, nullif, coalesce price") {
    val out = Exposure.stage(exposureRaw, "kw").orderBy("display_rank").collect()
    assert(out.length == 3)
    assert(out(0).getLong(out(0).fieldIndex("nv_mid")) == 77001L)   // path segment
    assert(out(1).getLong(out(1).fieldIndex("nv_mid")) == 77002L)   // base64 NzcwMDI= -> 77002
    assert(out(2).isNullAt(out(2).fieldIndex("nv_mid")))            // unknown host
    assert(out(1).isNullAt(out(1).fieldIndex("brand_name")))        // NULLIF('')
    assert(out(0).getInt(out(0).fieldIndex("sales_price")) == 1000)
    assert(out(1).getInt(out(1).fieldIndex("sales_price")) == 2000) // mobile fallback
    assert(out(2).isNullAt(out(2).fieldIndex("sales_price")))
  }

  test("exposure staging: optional is_own filter folds away when absent") {
    assert(Exposure.stage(exposureRaw, "kw", isOwn = Some(true)).count() == 2)
    val plan = Exposure.stage(exposureRaw, "kw", isOwn = None)
      .queryExecution.optimizedPlan.toString
    assert(!plan.toLowerCase.contains("filter"),
      "absent param must fold the filter out of the plan")
  }
}
