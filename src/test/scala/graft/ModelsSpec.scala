package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.models.{Analytics, Incremental, Model, ModelRegistry, Params, View}

class ModelsSpec extends SparkSpec {
  import spark.implicits._

  test("registry resolves deps topologically and rejects cycles") {
    val r = new ModelRegistry
    r.register(Model("a", Nil, View, _ => Seq(1).toDF("x")))
    r.register(Model("b", Seq("a"), View, ctx => ctx.ref("a")))
    r.register(Model("c", Seq("b", "a"), View, ctx => ctx.ref("b").union(ctx.ref("a"))))
    assert(r.topo("c") == Seq("a", "b", "c"))
    val bad = new ModelRegistry
    bad.register(Model("x", Seq("y"), View, ctx => ctx.ref("y")))
    bad.register(Model("y", Seq("x"), View, ctx => ctx.ref("x")))
    intercept[IllegalStateException](bad.topo("x"))
  }

  test("every registered model has a resolvable dependency closure") {
    val r = graft.models.Analytics.registry(sf001)
    // topo throws on a cycle or a declared-but-unregistered dependency;
    // this pins the WHOLE registry, including models no declared query
    // exercises, and catches misdeclared edges (a dep the body never
    // refs still costs a build in materialize-the-DAG drivers)
    r.names.foreach(n => r.topo(n))
    assert(r.names.size >= 40, s"registry shrank to ${r.names.size} models")
  }

  test("shared dependency is built once per run") {
    var builds = 0
    val r = new ModelRegistry
    r.register(Model("base", Nil, View, _ => { builds += 1; Seq(1, 2).toDF("x") }))
    r.register(Model("l", Seq("base"), View, ctx => ctx.ref("base")))
    r.register(Model("r2", Seq("base"), View, ctx => ctx.ref("base")))
    r.register(Model("top", Seq("l", "r2"), View,
      ctx => ctx.ref("l").union(ctx.ref("r2"))))
    assert(r.run("top", spark).count() == 4)
    assert(builds == 1)
  }

  test("analytics DAG: profit_mom computes month-over-month by channel") {
    val reg = Analytics.registry(sf001)
    val params = Params(Map(
      "ds_start_date" -> "1990-01-01", "ds_end_date" -> "2030-12-31"))
    val out = reg.run("profit_mom", spark, params).collect()
    assert(out.nonEmpty)
    val channels = out.map(_.getAs[String]("channel")).distinct.sorted
    assert(channels.toSeq == Seq("events", "lineitem", "orders"))
    // first month per channel has null prev/mom; later months have values
    val orders = out.filter(_.getAs[String]("channel") == "orders")
      .sortBy(_.getAs[java.sql.Date]("month").toString)
    assert(orders.head.getAs[Any]("mom_pct") == null)
    assert(orders.tail.forall(_.getAs[Any]("mom_pct") != null))
  }

  test("runReleasable/materialize release every run-scoped persist") {
    // round-15 directive 3: no RDD with storageLevel != NONE may survive
    // a model run once its release handle fires — ref promotions AND
    // operator-local persists (ctx.track) are all run-scoped.
    // localCheckpoint snapshots are exempt: the pinned blocks ARE the
    // data (lineage truncated — unpersisting them breaks the frame, so
    // release() must not touch them) and their lifecycle is
    // ContextCleaner weak-ref reclaim once the frame is unreachable —
    // unlike CacheManager persists, which are strongly held until an
    // explicit unpersist. The release contract covers the latter.
    def persistedRddCount: Int =
      spark.sparkContext.getPersistentRDDs.count {
        case (_, rdd) =>
          rdd.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE &&
            !rdd.isCheckpointed
      }
    spark.catalog.clearCache()
    spark.sparkContext.getPersistentRDDs.values
      .foreach(_.unpersist(blocking = true))
    val base = persistedRddCount
    val reg = Analytics.registry(sf001)
    // q112's DAG exercises ref promotions + ProductMarts ctx.track sites
    val (df, release) = reg.runReleasable("sabangnet_option_master", spark)
    df.write.format("noop").mode("overwrite").save()
    release()
    assert(persistedRddCount <= base,
      s"run left ${persistedRddCount - base} persisted RDD(s) behind")
    // materialize (eager Incremental write) must self-release
    val dir = Files.createTempDirectory("graft_rel").toString
    reg.materialize("core_sales_daily", spark, dir)
    assert(persistedRddCount <= base,
      s"materialize left ${persistedRddCount - base} persisted RDD(s)")
  }

  test("incremental materialization overwrites only batch partitions") {
    val reg = Analytics.registry(sf001)
    val dir = Files.createTempDirectory("graft_mat").toString
    reg.materialize("core_sales_daily", spark, dir)
    val full = spark.read.parquet(dir)
    val nDays = full.select("ymd").distinct().count()
    val before = full.count()
    // re-materialize → same content (dynamic overwrite replaces, not appends)
    reg.materialize("core_sales_daily", spark, dir)
    assert(spark.read.parquet(dir).count() == before)
    assert(spark.read.parquet(dir).select("ymd").distinct().count() == nDays)
  }
}
