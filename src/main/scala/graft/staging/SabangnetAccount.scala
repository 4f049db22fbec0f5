package graft.staging

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** L2 staging — sabangnet admin shop accounts (reference:
  * core/sabangnet/admin/account/models.sql): the account master rename
  * projection, the shop dim with its ISO-8601 'T' created-at parse, and
  * the "normal" account variant whose non-key attributes are declared
  * NULL (the id linkage loads first; the full master backfills — same
  * placeholder pattern as Meta insights dims).
  */
object SabangnetAccount {

  def stageAccount(raw: DataFrame): DataFrame =
    raw.select(
      col("acntRegsSrno").cast("int").as("account_no"),
      col("shmaId").as("shop_id"),
      col("shmaNm").as("shop_name"),
      col("olMktTydvsDivNm").as("shop_group"),
      col("shmaCnctnLoginId").as("userid"),
      col("sortSrno").cast("int").as("shop_seq"),
      col("shmaUrlAddr").as("shop_url"),
      col("corpNm").as("corp_name"),
      col("useYn").as("use_yn"))

  def stageShop(raw: DataFrame): DataFrame =
    raw.select(
      col("shmaId").as("shop_id"),
      col("shmaNm").as("shop_name"),
      col("olMktTydvsDivNm").as("shop_group"),
      col("exclFormSrno").cast("int").as("shop_seq"),
      col("rpstNm").as("rep_name"),
      col("shmaExpoYn").as("use_yn"),
      expr("try_to_timestamp(substring(fstRegsDt, 1, 19), " +
        "\"yyyy-MM-dd'T'HH:mm:ss\")").as("created_at"))

  /** AccountNormal (models.sql:80-95): id linkage only, attributes NULL. */
  def stageAccountNormal(raw: DataFrame): DataFrame =
    raw.select(
      col("acntRegsSrno").cast("int").as("account_no"),
      col("shmaId").as("shop_id"),
      lit(null).cast("string").as("shop_name"),
      lit(null).cast("string").as("shop_group"),
      lit(null).cast("string").as("userid"),
      lit(null).cast("int").as("shop_seq"),
      lit(null).cast("string").as("shop_url"),
      lit(null).cast("string").as("corp_name"),
      lit(null).cast("string").as("use_yn"))
}
