package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.functions.F

class ExtensionsSpec extends SparkSpec {
  import spark.implicits._

  test("GraftExtensions registers graft_dot for SQL use") {
    // `spark.sql.extensions` is a static conf — it only applies to a fresh
    // SparkContext (spark-submit path). Sharing this JVM's context, the
    // builder-side withExtensions is the applicable injection route.
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val out = s2.sql(
        "SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d)) AS d")
        .head().getDouble(0)
      assert(out == 32.0)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("GraftExtensions registers the text-hygiene scalars for SQL use") {
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      assert(s2.sql("SELECT graft_nfc('Café')").head.getString(0)
        == "Café")
      assert(s2.sql("SELECT graft_nfkc('ﬁrst')").head.getString(0)
        == "first")
      assert(s2.sql("SELECT graft_fix_mojibake('xÃ©y')")
        .head.getString(0) == "xéy")
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("GraftSession.defaults: scale confs + extensions on a fresh session") {
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = GraftSession.defaults(SparkSession.builder()
          .master("local[2]").config("spark.ui.enabled", "false"))
        .getOrCreate()
      assert(s2.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true")
      assert(s2.conf.get("spark.sql.parquet.aggregatePushdown") == "true")
      assert(s2.conf.get("spark.sql.session.timeZone") == "UTC")
      // the extension surface is live: native expression callable from SQL
      assert(s2.sql("SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d))")
        .head().getDouble(0) == 11.0)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("model registry is SQL-callable as table functions (start, end args)") {
    val prior = spark
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .getOrCreate()
      s2.conf.set("spark.graft.data.dir", sf001)
      // positional (start, end) form, through plain spark.sql
      val viaSql = s2.sql(
        "SELECT * FROM profit_mom('1996-01-01', '1996-06-30')")
        .orderBy("month", "channel").collect().toSeq
      val direct = graft.models.Analytics.registry(sf001)
        .run("profit_mom", s2, graft.models.Params(Map(
          "ds_start_date" -> "1996-01-01", "ds_end_date" -> "1996-06-30")))
        .orderBy("month", "channel").collect().toSeq
      assert(viaSql.nonEmpty && viaSql == direct,
        "SQL TVF invocation == registry run, row for row")
      // TVFs compose inside larger SQL (join, aggregate over the TVF)
      val n = s2.sql(
        """SELECT count(*) AS n
          |FROM profit_mom('1996-01-01', '1996-06-30')
          |WHERE revenue IS NOT NULL""".stripMargin).head().getLong(0)
      assert(n == viaSql.size.toLong ||
        n <= viaSql.size.toLong, "TVF usable as a plain relation")
      // explicit (key, value) pair form binds arbitrary params
      val paired = s2.sql(
        """SELECT * FROM profit_mom(
          |  'ds_start_date', '1996-01-01', 'ds_end_date', '1996-06-30')"""
          .stripMargin).orderBy("month", "channel").collect().toSeq
      assert(paired == direct)
      // a zero-arg model resolves too (parenthesized — a bare name is a
      // table lookup, not a function call)
      assert(s2.sql("SELECT * FROM sa_contract_master()").count() > 0)
      // every model name registered; sanitize produced no collisions
      val fns = graft.plans.GraftExtensions.modelFunctionNames
      assert(fns.map(_._1).distinct.size == fns.size)
      assert(fns.size == graft.models.Analytics.registry("").names.size,
        "every registered model has a SQL spelling")
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("delta_at / delta_range TVFs: SQL time travel + pruned range scan") {
    val prior = spark
    // build the table with the ORIGINAL session before swapping
    val dir = java.nio.file.Files.createTempDirectory("dtvf").toString + "/t"
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"), Seq("k"))
    graft.sources.Sinks.upsertParquet(spark, dir,
      Seq((2L, 25.0), (3L, 30.0)).toDF("k", "v"), Seq("k"))
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new graft.plans.GraftExtensions())
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val now = s2.sql(s"SELECT * FROM delta_at('$dir') ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(now == Seq((1L, 10.0), (2L, 25.0), (3L, 30.0)))
      val v0 = s2.sql(s"SELECT * FROM delta_at('$dir', 0) ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(v0 == Seq((1L, 10.0), (2L, 20.0)), "version arg time-travels")
      val ranged = s2.sql(
        s"SELECT * FROM delta_range('$dir', 'k', 2, 3) ORDER BY k")
        .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
      assert(ranged == Seq((2L, 25.0), (3L, 30.0)))
      // metadata-only count, current and time-traveled
      assert(s2.sql(s"SELECT * FROM delta_count('$dir')")
        .head().getLong(0) == 3L)
      assert(s2.sql(s"SELECT * FROM delta_count('$dir', 0)")
        .head().getLong(0) == 2L)
      // history TVF lists both commits
      assert(s2.sql(s"SELECT * FROM delta_history('$dir')").count() == 2L)
    } finally {
      SparkSession.setDefaultSession(prior)
      SparkSession.setActiveSession(prior)
    }
  }

  test("Tables.registerAll: fixture queryable through plain spark.sql") {
    Tables.registerAll(spark, sf001)
    assert(spark.sql("SELECT count(*) FROM region").head().getLong(0) == 5L)
    val joined = spark.sql(
      """SELECT r.r_name, count(*) AS n FROM nation n
        |JOIN region r ON n.n_regionkey = r.r_regionkey
        |GROUP BY r.r_name""".stripMargin)
    assert(joined.count() == 5L)
    // events registers through the schema-adaptive reader: ts is usable
    assert(spark.sql("SELECT max(ts) FROM events").head().get(0) != null)
  }

  test("DotProduct matches the HOF fold and survives codegen") {
    val df = Seq((Seq(1.0, 2.0), Seq(3.0, 4.0)), (Seq(0.5, -1.0), Seq(2.0, 2.0))).toDF("a", "b")
    val native = df.select(graft.plans.VectorExpressions.dot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0))
    val hof = df.select(aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0d), (acc, v) => acc + v).as("d"))
      .collect().map(_.getDouble(0))
    assert(native.toSeq == hof.toSeq)
    assert(native.toSeq == Seq(11.0, -1.0))
  }

  test("alignSchema adds typed nulls, drops extras, reorders, casts") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(
      StructField("k", LongType), StructField("v", DoubleType),
      StructField("tag", StringType)))
    val src = Seq((1, "x", "junk")).toDF("k", "v", "extra")
      .withColumn("v", lit("2.5"))
    val out = graft.functions.F.alignSchema(src, target)
    assert(out.schema.fields.map(f => (f.name, f.dataType)).toSeq ==
      target.fields.map(f => (f.name, f.dataType)).toSeq)
    val row = out.head()
    assert(row.getLong(0) == 1L && row.getDouble(1) == 2.5 && row.isNullAt(2))
  }

  test("alignSchema resolves source columns case-insensitively") {
    import org.apache.spark.sql.types._
    val target = StructType(Seq(StructField("amount", DoubleType)))
    val out = graft.functions.F.alignSchema(
      Seq(("2.5")).toDF("Amount"), target).head()
    assert(out.getDouble(0) == 2.5)
  }

  test("profile handles awkward column names and counts exactly") {
    val df = Seq((1, Option("x")), (2, None), (2, Option("y")))
      .toDF("order date", "a-b")
    val out = graft.functions.F.profile(df).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(out("order date") == ((3L, 3L, 2L)))
    assert(out("a-b") == ((3L, 2L, 2L)))
  }

  test("aggMap builds named aggregates with null-ignoring first") {
    val df = Seq(("a", Option(1), Option.empty[Int]), ("a", Option(2), Option(9)),
      ("b", Option(5), Option(7))).toDF("k", "x", "y")
    val out = F.aggMap(df, Seq(col("k")),
        Seq("x" -> "sum", "x" -> "count", "y" -> "first"))
      .orderBy("k").collect()
    assert(out(0).getAs[Long]("x_sum") == 3)
    assert(out(0).getAs[Long]("x_count") == 2)
    assert(out(0).getAs[Int]("y_first") == 9) // null skipped
    assert(out(1).getAs[Int]("y_first") == 7)
  }

  test("aggMap dropna filters null group keys") {
    val df = Seq((Option("a"), 1), (Option.empty[String], 2)).toDF("k", "x")
    assert(F.aggMap(df, Seq(col("k")), Seq("x" -> "sum"), dropna = true).count() == 1)
    assert(F.aggMap(df, Seq(col("k")), Seq("x" -> "sum")).count() == 2)
  }
}
