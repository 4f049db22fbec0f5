package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.sources.{Readers, Sinks}

class ReadersSpec extends SparkSpec {
  import spark.implicits._

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("name", StringType),
    StructField("amount", DoubleType)))

  test("csv reads with declared schema, header, and null handling") {
    val dir = Files.createTempDirectory("graft_csv").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.csv"),
      "id,name,amount\n1,alpha,10.5\n2,,20.0\n3,gamma,\n")
    val out = Readers.csv(spark, s"$dir/data.csv", schema).orderBy("id").collect()
    assert(out.length == 3)
    assert(out(0).getLong(0) == 1L && out(0).getDouble(2) == 10.5)
    assert(out(1).isNullAt(1))
    assert(out(2).isNullAt(2))
  }

  test("json reads with declared schema; bad branches go null not fail") {
    val dir = Files.createTempDirectory("graft_json").toString
    Files.writeString(java.nio.file.Paths.get(s"$dir/data.jsonl"),
      """{"id": 1, "name": "a", "amount": 5.0}
        |{"id": 2, "name": "b", "amount": "not-a-number"}
        |""".stripMargin)
    val out = Readers.json(spark, s"$dir/data.jsonl", schema).orderBy("id").collect()
    assert(out.length == 2)
    assert(out(0).getDouble(2) == 5.0)
  }

  test("rowBatch parses inline JSON rows (UNNEST($rows) primitive)") {
    val rows = Seq("""{"id": 7, "name": "x", "amount": 1.0}""").toDS()
    val out = Readers.rowBatch(spark, rows, schema).head()
    assert(out.getLong(0) == 7L)
  }

  test("copyTable projects, limits, and LIMIT 0 clones schema only") {
    val dir1 = Files.createTempDirectory("graft_cp1").toString
    val dir2 = Files.createTempDirectory("graft_cp2").toString
    val df = Tables.orders(spark, sf001)
    Sinks.copyTable(df, dir1, Seq("o_orderkey", "o_totalprice"), Some(10))
    val copied = spark.read.parquet(dir1)
    assert(copied.count() == 10)
    assert(copied.columns.toSeq == Seq("o_orderkey", "o_totalprice"))
    Sinks.copyTable(df, dir2, limit = Some(0))
    val empty = spark.read.parquet(dir2)
    assert(empty.count() == 0)
    assert(empty.schema == df.schema)
  }
}
