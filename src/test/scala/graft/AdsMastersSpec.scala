package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** Semantic pins for the ad-platform master marts (AdsMasters): the
  * worst-status GREATEST resolution, the bundle level-COALESCE, the Kleene
  * is_enabled logic, and the sort-key ladders. These complement the DuckDB
  * oracles (q100-q108) with row-level assertions a human can read.
  */
class AdsMastersSpec extends SparkSpec {

  private lazy val reg = graft.models.Analytics.registry(sf001)

  test("google adgroup master resolves the WORST status along the chain") {
    val master = reg.run("google_adgroup_master", spark)
      .select(col("adgroup_id"), col("campaign_id"),
        col("adgroup_status").as("resolved"))
    val grp = reg.run("gads_adgroup", spark)
      .select(col("adgroup_id").as("gid"),
        col("adgroup_status").as("gcode"))
    val cmp = reg.run("gads_campaign", spark)
      .select(col("campaign_id").as("cid"),
        col("campaign_status").as("ccode"))
    val joined = master.join(grp, master("adgroup_id") === grp("gid"))
      .join(cmp, master("campaign_id") === cmp("cid"), "left")
      .collect()
    assert(joined.nonEmpty)
    val sevByCode = Map("ENABLED" -> 0, "PAUSED" -> 1, "REMOVED" -> 2,
      "UNKNOWN" -> 3)
    val labelBySev = Map(0 -> "운영 가능", 1 -> "일시중지됨", 2 -> "삭제됨",
      3 -> "알 수 없음")
    joined.foreach { r =>
      val gSev = sevByCode(r.getAs[String]("gcode"))
      val cSev = Option(r.getAs[String]("ccode")).map(sevByCode).getOrElse(-1)
      assert(r.getAs[String]("resolved") == labelBySev(math.max(gSev, cSev)),
        s"adgroup ${r.getAs[Long]("adgroup_id")}")
    }
  }

  test("google ad master bundle ids COALESCE ad > adgroup > campaign") {
    val master = reg.run("google_ad_master", spark)
      .select("ad_id", "adgroup_id", "campaign_id", "bundle_product_ids")
    val rel = reg.run("ad_sbn_relation", spark)
      .filter(col("platform_name") === "구글").cache()
    def relMap(level: Int): Map[Long, String] = rel
      .filter(col("ad_level") === level)
      .collect().map(r => r.getLong(2) -> r.getString(3)).toMap
    val (l0, l1, l2) = (relMap(0), relMap(1), relMap(2))
    val rows = master.collect()
    assert(rows.exists(r => r.getAs[String]("bundle_product_ids") != null))
    rows.foreach { r =>
      val expected = l2.get(r.getAs[Long]("ad_id"))
        .orElse(l1.get(r.getAs[Long]("adgroup_id")))
        .orElse(l0.get(r.getAs[Long]("campaign_id")))
        .orNull
      assert(r.getAs[String]("bundle_product_ids") == expected,
        s"ad ${r.getAs[Long]("ad_id")}")
    }
  }

  test("searchad adgroup master is_enabled is Kleene AND with fallback") {
    val master = reg.run("nsa_adgroup_master", spark)
      .select("adgroup_id", "campaign_id", "is_enabled")
    val grp = reg.run("nsa_adgroup", spark)
      .select(col("adgroup_id").as("gid"), col("is_enabled").as("gEn"))
    val cmp = reg.run("nsa_campaign", spark)
      .select(col("campaign_id").as("cid"), col("is_enabled").as("cEn"))
    val joined = master.join(grp, master("adgroup_id") === grp("gid"))
      .join(cmp, master("campaign_id") === cmp("cid"), "left").collect()
    assert(joined.nonEmpty)
    joined.foreach { r =>
      val g = r.getAs[Boolean]("gEn")
      val c = if (r.isNullAt(r.fieldIndex("cEn"))) None
              else Some(r.getAs[Boolean]("cEn"))
      // COALESCE(c AND g, g): NULL AND false = false sticks; NULL AND true
      // falls through to g
      val expected = c match {
        case Some(cv) => cv && g
        case None     => if (!g) false else g // NULL AND g: false→false, true→NULL→g
      }
      assert(r.getAs[Boolean]("is_enabled") == expected)
    }
  }

  test("coupang campaign master passes unmapped campaign_type through raw") {
    val m = reg.run("cads_campaign_master", spark)
      .select("campaign_id", "campaign_type").collect()
    val byId = m.map(r => r.getLong(0) -> r.getString(1)).toMap
    byId.foreach { case (id, ct) =>
      if (id % 11 == 0) assert(ct == "XPA")       // unmapped → raw code
      else assert(ct == "상품광고")                 // mapped → label
    }
  }

  test("sort keys rank live rows before deleted rows") {
    val m = reg.run("cads_adgroup_master", spark)
      .select("is_deleted", "sort_key").collect()
    val (del, live) = m.partition(_.getBoolean(0))
    assert(del.nonEmpty && live.nonEmpty)
    assert(live.map(_.getLong(1)).max < del.map(_.getLong(1)).min)
  }
}
