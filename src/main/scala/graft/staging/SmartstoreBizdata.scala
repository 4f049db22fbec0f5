package graft.staging

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — smartstore bizdata marketing channel (reference:
  * core/smartstore/api/bizdata/models.sql): the five nt_* channel
  * dimensions default to '-' (they are PRIMARY KEY members, so NULL is
  * not representable — the reference's IFNULL barrier), metrics TRY_CAST
  * to INTEGER, and `$channel_seq` / `$ymd` are caller-bound.
  */
object SmartstoreBizdata {

  def stageMarketingChannel(raw: DataFrame, channelSeq: Long,
                            ymd: LocalDate): DataFrame =
    raw.select(
      lit(channelSeq).as("channel_seq"),
      coalesce(col("deviceCategory"), lit("-")).as("device_category"),
      coalesce(col("ntSource"), lit("-")).as("nt_source"),
      coalesce(col("ntMedium"), lit("-")).as("nt_medium"),
      coalesce(col("ntDetail"), lit("-")).as("nt_detail"),
      coalesce(col("ntKeyword"), lit("-")).as("nt_keyword"),
      expr("try_cast(numUsers AS INT)").as("num_users"),
      expr("try_cast(numInteractions AS INT)").as("num_interactions"),
      expr("try_cast(pv AS INT)").as("page_view"),
      expr("try_cast(numPurchases AS INT)").as("num_purchases"),
      expr("try_cast(payAmount AS INT)").as("payment_amount"),
      lit(java.sql.Date.valueOf(ymd)).as("ymd"))
}
