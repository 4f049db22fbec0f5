package graft

import org.apache.spark.sql.functions._
import graft.staging.{CjStock, CoupangProduct, Ecount, SabangnetOrder, SmartstoreSettlement}

class Staging6Spec extends SparkSpec {
  import spark.implicits._

  test("sabangnet stageInvoice: ladders recode, unparseable rows rejected") {
    val raw = Seq(
      ("1", "3", "INV1", "CJ", "주문(완료)", "출고완료", "2024-01-02 10:30", "2024-01-04"),
      ("2", "3", null, "CJ", "주문(진행)", "신규주문", "2024-01-02 10:30", null),  // no invoice
      ("3", "3", "INV3", "CJ", "회수(완료)", "폐기", null, "2024-01-04"),          // no order_dt
      ("4", "3", "INV4", "CJ", "없는구분", "없는상태", "2024-01-05 00:01", "bad-date")
    ).toDF("주문번호(사방넷)", "계정등록순번", "송장번호", "택배사",
      "주문구분", "주문상태", "주문일시(YYYY-MM-DD HH:MM)", "송장등록일자(YYYY-MM-DD)")
    val out = SabangnetOrder.stageInvoice(raw).orderBy("order_seq").collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 4L), "guard drops rows 2 and 3")
    assert(out(0).getInt(4) == 2 && out(0).getInt(5) == 4, "ladder values")
    assert(out(1).isNullAt(4) && out(1).isNullAt(5), "unknown codes recode to null")
    assert(out(1).isNullAt(7), "unparseable invoice date -> null, row kept")
  }

  test("sabangnet upsertOption: latest wins, validity window widens") {
    def raw(rows: Seq[(String, String, String, String, String, String, String, String)]) =
      rows.toDF("상품코드(사방넷)", "상품코드(쇼핑몰)", "계정등록순번", "모델명",
        "상품명(확정)", "판매가(상품)", "주문번호(쇼핑몰)", "주문일시(YYYY-MM-DD HH:MM)")
    val target = SabangnetOrder.stageOption(raw(Seq(
      ("O1", "S1", "1", "M1", null, "100", "A", "2024-01-10 00:00"))))
    val out = SabangnetOrder.upsertOption(target, raw(Seq(
      ("O1", "S1", "1", null, "P1", "200", "B", "2024-01-05 00:00"),  // older
      ("O1", "S1", "1", null, "P2", "300", "C", "2024-01-20 00:00")   // newer wins dedup
    ))).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getAs[String]("model_code") == "M1", "source null coalesces to target")
    assert(r.getAs[String]("product_name") == "P2", "newest source row wins dedup")
    assert(r.getAs[Int]("sales_price") == 300)
    assert(r.getAs[java.sql.Timestamp]("first_order_dt").toString.startsWith("2024-01-10"),
      "LEAST of target first and deduped source (the newer source row)")
    assert(r.getAs[java.sql.Timestamp]("last_order_dt").toString.startsWith("2024-01-20"),
      "GREATEST widens the validity end")
  }

  test("coupang stageRocketOption: category coalesce + presence-gated status") {
    val full = """{"vendorItemId":1,"unitsSoldForLast30Days":5,
      |"listingDetails":{"vendorInventoryId":10,"productId":100,"vendorInventoryName":"L"},
      |"creturnConfigViewDto":{"vendorId":null,"productName":"CP","itemName":"I",
      |"onSale":false,"displayCategoryCodeLevel1":101,"displayCategoryCodeLevel3":null,
      |"displayCategoryCodeLevel5":null},
      |"inventoryDetails":{"isHiddenByVendor":false,"orderableQuantity":7}}""".stripMargin.replace("\n", "")
    val noCc = """{"vendorItemId":2,"unitsSoldForLast30Days":0,
      |"listingDetails":{"vendorInventoryId":20,"productId":200,"vendorInventoryName":"L2"},
      |"inventoryDetails":{"isHiddenByVendor":false,"orderableQuantity":9}}""".stripMargin.replace("\n", "")
    val hidden = full.replace("\"vendorItemId\":1", "\"vendorItemId\":3")
      .replace("\"isHiddenByVendor\":false", "\"isHiddenByVendor\":true")
    val out = CoupangProduct.stageRocketOption(
        Seq(full, noCc, hidden).toDF("p"), col("p"), vendorId = "VD")
      .orderBy("option_id").collect()
    assert(out(0).getAs[String]("vendor_id") == "VD", "null cc.vendorId -> param fallback")
    assert(out(0).getAs[Int]("display_category_id") == 101, "coalesce falls to level 1")
    assert(out(0).getAs[Int]("product_status") == 1, "visible + not onSale -> 1")
    assert(out(1).getAs[String]("product_name") == "L2", "absent cc -> listing name")
    assert(out(1).isNullAt(out(1).fieldIndex("product_status")),
      "absent cc + not hidden -> null status")
    assert(out(2).getAs[Int]("product_status") == 2, "hidden wins over onSale")
  }

  test("smartstore settlement: reject guard + recode + dim join by seq") {
    val raw = Seq(
      ("900000001", "9", "77", "PROD_ORDER", "QUICK_SETTLE_ORIGINAL", 100L, 3L, 1L, 96L, "2024-02-01", "2024-02-15"),
      ("900000002", "9", "bad", "REFUND", "NOPE", 50L, 1L, 0L, 49L, "2024-02-01", null),
      ("900000003", "9", "77", "DELIVERY", "NORMAL_SETTLE_ORIGINAL", 10L, 0L, 0L, 10L, "oops", null)
    ).toDF("productOrderId", "orderId", "productId", "productOrderType",
      "settleType", "paySettleAmount", "totalPayCommissionAmount",
      "benefitSettleAmount", "settleExpectAmount", "payDate", "settleCompleteDate")
    val staged = SmartstoreSettlement.stage(raw, channelSeq = 5L)
    val rows = staged.orderBy("product_order_id").collect()
    assert(rows.length == 2, "unparseable payDate rejected")
    assert(rows(0).getAs[Int]("settle_type") == 3)
    assert(rows(1).isNullAt(rows(1).fieldIndex("settle_type")), "unknown code -> null")
    assert(rows(1).isNullAt(rows(1).fieldIndex("product_id")), "try_cast 'bad' -> null")
    val named = staged.join(SmartstoreSettlement.settleTypeDim(spark)
        .select(col("seq").as("settle_type"), col("name")), Seq("settle_type"))
      .filter(col("product_order_id") === "900000001").collect()
    assert(named.head.getAs[String]("name") == "빠른정산")
  }

  test("searchad keyword: censored '< 10' counts and comp index") {
    val out = graft.staging.SearchadKeyword.stage(Seq(
        ("a", "< 10", "123", 1.25, 2.0, "낮음", 3L),
        ("b", "junk", "< 10", 0.0, 0.0, "높음", 1L),
        ("c", "456", "7", 9.9, 0.1, "??", 0L)
      ).toDF("relKeyword", "monthlyPcQcCnt", "monthlyMobileQcCnt",
        "monthlyAvePcClkCnt", "monthlyAveMobileClkCnt", "compIdx", "plAvgDepth"),
      today = java.time.LocalDate.of(2026, 3, 1)).orderBy("keyword").collect()
    assert(out(0).getAs[Int]("monthly_qc_cnt_pc") == 10, "'< 10' recodes to 10")
    assert(out(1).getAs[Int]("monthly_qc_cnt_pc") == 0, "other junk recodes to 0")
    assert(out(1).getAs[Int]("monthly_qc_cnt_mo") == 10)
    assert(out(0).getAs[java.math.BigDecimal]("monthly_avg_click_cnt_pc")
      .compareTo(new java.math.BigDecimal("1.3")) == 0, "DECIMAL(18,1) rounding")
    assert(out(0).getAs[Int]("comp_idx") == 0 && out(1).getAs[Int]("comp_idx") == 2)
    assert(out(2).isNullAt(out(2).fieldIndex("comp_idx")))
    assert(out(0).getAs[java.sql.Date]("start_date").toString == "2026-01-29")
    assert(out(0).getAs[java.sql.Date]("end_date").toString == "2026-02-28")
  }

  test("coupang ads report: comma-grouped numerics parse, re-agg to PK grain") {
    val raw = Seq(
      ("7", "55", "1055", "검색 영역", "1,234", "12", "45,678", "3", "1,000,000", 19960614L),
      ("7", "55", "1055", "검색 영역", "766", "8", "4,322", "1", "500,000", 19960614L),  // same PK -> re-agg
      ("7", "55", null, "로켓채널", "10", "1", "100", "0", "0", 19960614L)
    ).toDF("캠페인 ID", "광고집행 옵션ID", "광고전환매출발생 옵션ID",
      "광고 노출 지면", "노출수", "클릭수", "광고비", "총 주문수(1일)",
      "총 전환매출액(1일)", "날짜")
    val out = graft.staging.CoupangAdsReport.stageProductAdReport(raw, "V1")
      .orderBy("option_conv_id").collect()
    assert(out.length == 2, "duplicate PK rows re-aggregate")
    val rocket = out(0)
    assert(rocket.getAs[Long]("option_conv_id") == 0L, "null conv id coalesces to 0")
    assert(rocket.getAs[Int]("placement_group") == 2, "unknown placement -> ELSE 2")
    val agg = out(1)
    assert(agg.getAs[Int]("impression_count") == 2000, "'1,234' + '766' = 2000")
    assert(agg.getAs[Int]("ad_cost") == 50000)
    assert(agg.getAs[Int]("conv_amount") == 1500000, "million-scale double-comma parses")
    assert(agg.getAs[java.sql.Date]("ymd").toString == "1996-06-14")
  }

  test("bizdata marketing channel: IFNULL('-') barrier on PK dims") {
    val out = graft.staging.SmartstoreBizdata.stageMarketingChannel(
      Seq((null.asInstanceOf[String], "s", null.asInstanceOf[String], "d", "k", "5", "x", "2", "1", "99"))
        .toDF("deviceCategory", "ntSource", "ntMedium", "ntDetail",
          "ntKeyword", "numUsers", "numInteractions", "pv", "numPurchases",
          "payAmount"),
      channelSeq = 7L, ymd = java.time.LocalDate.of(2024, 3, 1)).collect().head
    assert(out.getAs[String]("device_category") == "-")
    assert(out.getAs[String]("nt_medium") == "-")
    assert(out.getAs[String]("nt_source") == "s")
    assert(out.getAs[Int]("num_users") == 5)
    assert(out.isNullAt(out.fieldIndex("num_interactions")), "junk metric -> null")
  }

  test("cj stock: yyyyMMdd int parse; ecount: expiration coalesces through '0'") {
    val cj = CjStock.stage(Seq(
        ("I1", "B1", "7", "n", "W0", "w", "Z1", "c", "12", 5L, 5L, 0L, "30", "2025-06-01", 20240229L),
        ("I2", null, "8", "n", "W0", "w", "Z1", "c", "x", 1L, 1L, 0L, "x", "bad", 20240230L)
      ).toDF("itemCd", "itemVarcode", "strrId", "itemNm", "whCd", "whNm",
        "zoneCd", "wcellNm", "lotNo", "invnQty", "avlbQty", "hldQty",
        "remainInvnDays", "validDatetime", "inbDate"),
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0)).orderBy("item_code").collect()
    assert(cj(0).getAs[java.sql.Date]("inbound_date").toString == "2024-02-29",
      "leap-day yyyyMMdd parses")
    assert(cj(1).isNullAt(cj(1).fieldIndex("inbound_date")),
      "Feb 30 is not a date -> null")
    assert(cj(1).isNullAt(cj(1).fieldIndex("lot_no")) &&
      cj(1).isNullAt(cj(1).fieldIndex("remain_days")))

    val ec = Ecount.stageProduct(Seq(
        ("P1", "o", "n", "k", "b", "r", "1", "u", "9", "0", "2027-01"),
        ("P2", "o", "n", "k", "b", "r", "1", "u", "9", "2026-06", "2027-01"),
        ("P3", "o", "n", "k", "b", "r", "1", "u", "9", "0", "0")
      ).toDF("PROD_CD", "CONT4", "PROD_DES", "CONT6", "CONT1", "REMARKS_WIN",
        "SIZE_DES", "UNIT", "IN_PRICE", "CONT2", "CONT3"),
      java.time.LocalDateTime.of(2026, 1, 1, 0, 0)).orderBy("product_code").collect()
    assert(ec(0).getAs[String]("expiration_date") == "2027-01",
      "'0' marker coalesces THROUGH to CONT3")
    assert(ec(1).getAs[String]("expiration_date") == "2026-06")
    assert(ec(2).isNullAt(ec(2).fieldIndex("expiration_date")), "both '0' -> null")
  }
}
