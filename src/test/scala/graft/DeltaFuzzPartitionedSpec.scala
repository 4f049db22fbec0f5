package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{LogStores, Sinks, DeletionVectors}
import FuzzHarness.{CrashingStore, InjectedCrash, logVersions,
  maxPartMarkers, partPointerGen}
import scala.collection.immutable.{Map => IMap}

/** PARTITIONED twin of [[DeltaFuzzSpec]] — the crash machinery here is
  * the engine's most intricate (per-partition pointer swaps, ONE batch
  * commit carrying `partitionGens` markers for all touched partitions,
  * per-partition heal decisions), and until this spec it was covered
  * only by hand-written cases. Seeded histories drive partitioned
  * merges / DELETEs (keyed and partition-wide) / RESTORE / checkpoint /
  * clean / partitioned DV purge against an independent model; crash
  * histories kill the writer at a random storage-operation boundary —
  * including MID-WAY through a multi-partition pointer-swap loop, the
  * window where SOME partitions advanced and the batch commit never
  * landed — then assert the per-partition refuse-or-heal contract:
  *
  *  - a later merge heals exactly the lagging partitions it TOUCHES
  *    (untouched lagging partitions stay pending — asserted);
  *  - DELETE must refuse when any partition it touches lags, and is
  *    free to proceed on healthy partitions while others lag;
  *  - RESTORE / purge / constraint ops refuse while ANY partition lags.
  *
  * Per-partition crash adjudication uses only independent protocol
  * observables: each partition's `_CURRENT` bytes vs the max
  * `partitionGens` marker parsed from the raw JSONs + the
  * `graftPartGens` checkpoint snapshot.
  */
class DeltaFuzzPartitionedSpec extends SparkSpec {
  import spark.implicits._

  private val parts = Vector("a", "b", "c")
  private def partOf(k: Long): String = parts((k % 3).toInt)

  /** rows keyed by k; each row is a col->value map incl. ds. */
  private case class Model(cols: Vector[String],
                           rows: Map[Long, Map[String, Any]]) {
    def rowsOf(p: String): Map[Long, Map[String, Any]] =
      rows.filter { case (k, _) => partOf(k) == p }
    def mergePart(p: String, batchCols: Vector[String],
                  batch: Seq[Map[String, Any]],
                  base: Map[Long, Map[String, Any]]): Model = {
      val merged = batch.foldLeft(base) { (acc, r) =>
        val k = r("k").asInstanceOf[Long]
        acc + (k -> (acc.getOrElse(k, Map.empty) ++ r))
      }
      // the BASE may be a crashed batch's pending rows carrying a
      // column the logged schema has not seen yet — a heal that folds
      // them in logs the evolved schema, so the model's columns widen
      // from the merged ROWS, not only from this batch's columns
      val incoming = (batchCols ++ merged.values.flatMap(_.keys))
        .distinct.filterNot(cols.contains)
      Model(cols ++ incoming,
        rows.filterNot { case (k, _) => partOf(k) == p } ++ merged)
    }
  }
  private val emptyModel = Model(Vector("k", "ds", "v"), Map.empty)

  private def assertState(dir: String, model: Model, ctx: String): Unit = {
    if (logVersions(dir).isEmpty) {
      assert(model.rows.isEmpty, s"$ctx: model has rows, table has no log")
      return
    }
    if (model.rows.isEmpty) {
      val e = intercept[IllegalArgumentException] {
        Sinks.readDeltaTableAt(spark, dir)
      }
      assert(e.getMessage.contains("no live files"), s"$ctx: ${e.getMessage}")
      return
    }
    val df = Sinks.readDeltaTableAt(spark, dir)
    assert(df.columns.toSet == model.cols.toSet,
      s"$ctx: ${df.columns.toSet} != ${model.cols.toSet}")
    // collect-bound: fuzz tables hold <= 12 keys by construction
    val got = df.collect().map { r =>
      val m = df.columns.zipWithIndex.map { case (c, i) =>
        c -> (if (r.isNullAt(i)) null else r.get(i)) }.toMap
      m("k").asInstanceOf[Long] -> m
    }.toMap
    val want = model.rows.map { case (k, row) =>
      k -> model.cols.map(c => c -> row.getOrElse(c, null)).toMap }
    assert(got == want, s"$ctx:\n  got  $got\n  want $want")
  }

  private def runHistory(seed: Int, crash: Boolean): (Boolean, Boolean) = {
    val rnd = new scala.util.Random(seed)
    val root = Files.createTempDirectory(s"pfuzz-$seed")
    val dir = root.resolve("t").toString
    // every third history composes the crash injection with the
    // RENAME-FREE object-store primitive set — the invariants must hold
    // under both storage contracts
    val store =
      if (seed % 3 == 0)
        new CrashingStore(FuzzHarness.ObjectStoreSemantics)
      else new CrashingStore
    LogStores.register(root, store)
    try {
      var model = emptyModel
      // lagging partitions: pointer-committed-but-unlogged state —
      // (pending pointer generation, that partition's full row set)
      var pending = Map.empty[String, (Long, Map[Long, Map[String, Any]])]
      var sawWindow = false
      var hasConstraint = false
      val snapshots = scala.collection.mutable.Map.empty[Long, Model]
      val nOps = 6 + rnd.nextInt(3)
      val crashAtOp = if (crash) rnd.nextInt(nOps) else -1
      // one random op per history also gets the CLEAN-ROOM external
      // reader's conformance check (round-12 directive 1); the end
      // state always does (below)
      val externalAtOp = rnd.nextInt(nOps)

      def drain(): Unit = {
        val markers = maxPartMarkers(dir)
        pending.foreach { case (p, (gen, rows)) =>
          if (markers.getOrElse(p, -1L) >= gen) {
            val incoming = rows.values.flatMap(_.keys).toSeq.distinct
              .filterNot(model.cols.contains)
            model = Model(model.cols ++ incoming,
              model.rows.filterNot { case (k, _) => partOf(k) == p } ++ rows)
            pending -= p
          }
        }
      }

      def mergeOp(opIdx: Int): Unit = {
        val keys = rnd.shuffle((0L to 11L).toVector).take(1 + rnd.nextInt(5))
        val withW = rnd.nextDouble() < 0.2
        val batchCols =
          if (withW) Vector("k", "ds", "v", "w") else Vector("k", "ds", "v")
        val batch = keys.map { k =>
          val base = Map[String, Any]("k" -> k, "ds" -> partOf(k),
            "v" -> s"v$opIdx-$k")
          if (withW) base + ("w" -> s"w$opIdx-$k") else base
        }
        val df =
          if (withW) batch.map(r => (r("k").asInstanceOf[Long],
            r("ds").asInstanceOf[String], r("v").asInstanceOf[String],
            r("w").asInstanceOf[String])).toDF("k", "ds", "v", "w")
          else batch.map(r => (r("k").asInstanceOf[Long],
            r("ds").asInstanceOf[String], r("v").asInstanceOf[String]))
            .toDF("k", "ds", "v")
        val touched = keys.map(partOf).distinct
        val before = touched.map(p => p -> partPointerGen(dir, p)).toMap
        // per-partition merge base: a lagging partition's raw pointer
        // state (the engine heals from the raw dir), else its logged
        // rows; the merged per-partition row set is the SourceFirst
        // map-merge, same rule as the unpartitioned model
        def baseOf(p: String): IMap[Long, Map[String, Any]] =
          pending.get(p).map(_._2).getOrElse(model.rowsOf(p))
        def mergedRowsOf(p: String): IMap[Long, Map[String, Any]] =
          batch.filter(_("ds") == p).foldLeft(baseOf(p)) { (acc, r) =>
            val k = r("k").asInstanceOf[Long]
            acc + (k -> (acc.getOrElse(k, Map.empty) ++ r))
          }
        try {
          Sinks.upsertParquetPartitioned(spark, dir, df, Seq("k"), "ds",
            evolveSchema = true, staleLockMs = 5000L)
          // ONE batch commit: every touched partition logged (markers),
          // incl. the fold-in heal of any touched lagging partition
          touched.foreach { p =>
            model = model.mergePart(p, batchCols,
              batch.filter(_("ds") == p), baseOf(p))
            pending -= p
          }
        } catch {
          case _: InjectedCrash =>
            // per-partition adjudication: pointer advanced => that
            // partition's state is pointer-committed (pending until its
            // marker appears); drain() below settles the ones whose
            // markers landed before the crash point. Column evolution
            // rides the batch commit, so a crashed pre-commit batch
            // must NOT widen the logged model's columns yet — the
            // pending row maps carry the w values and surface when the
            // heal logs them alongside the evolved metaData
            touched.foreach { p =>
              val after = partPointerGen(dir, p)
              if (after != before(p))
                pending += p -> (after.get -> mergedRowsOf(p))
            }
        }
      }

      def deleteOp(): Unit = {
        val partWide = rnd.nextDouble() < 0.4
        val (pred, hits) =
          if (partWide) {
            val p = parts(rnd.nextInt(3))
            (col("ds") === p,
              model.rows.filter { case (k, _) => partOf(k) == p }.keySet)
          } else {
            val m = 2L + rnd.nextInt(3)
            val r = rnd.nextInt(m.toInt).toLong
            (pmod(col("k"), lit(m)) === r,
              model.rows.keySet.filter(k => ((k % m) + m) % m == r))
          }
        val touchedLagging =
          hits.map(partOf).exists(pending.contains)
        val vBefore = logVersions(dir).lastOption.getOrElse(-1L)
        try {
          val dv = DeletionVectors.deleteDeltaWhere(spark, dir, pred)
          if (touchedLagging)
            assert(dv.rowsDeleted == 0L,
              "DELETE succeeded with effect on a lagging partition")
          else if (dv.rowsDeleted > 0)
            model = model.copy(rows = model.rows -- hits)
        } catch {
          case _: InjectedCrash =>
            // a DELETE is one putIfAbsent commit; the log tail (an
            // independent observable) says whether it landed — DVs live
            // in the log, pointers untouched
            if (logVersions(dir).lastOption.getOrElse(-1L) > vBefore)
              model = model.copy(rows = model.rows -- hits)
          case _: IllegalArgumentException |
               _: IllegalStateException |
               _: java.util.ConcurrentModificationException => () // refusal
        }
      }

      def restoreOp(): Unit = {
        if (snapshots.isEmpty) return
        val ver = snapshots.keys.toSeq(rnd.nextInt(snapshots.size))
        val vBefore = logVersions(dir).lastOption.getOrElse(-1L)
        try {
          Sinks.restoreDeltaTable(spark, dir, ver, staleLockMs = 5000L)
          assert(pending.isEmpty,
            "RESTORE succeeded while a partition lags")
          model = snapshots(ver)
        } catch {
          case _: InjectedCrash =>
            if (logVersions(dir).lastOption.getOrElse(-1L) > vBefore)
              model = snapshots(ver)
          case _: IllegalArgumentException |
               _: IllegalStateException |
               _: java.util.ConcurrentModificationException => ()
        }
      }

      def purgeOp(): Unit =
        try {
          val purged = DeletionVectors.purgeDeletionVectors(spark, dir)
          if (pending.nonEmpty) assert(purged == 0,
            "purge succeeded with effect while a partition lags")
        } catch {
          case _: InjectedCrash => ()
          case _: IllegalArgumentException |
               _: IllegalStateException |
               _: java.util.ConcurrentModificationException => ()
        }

      def constraintOp(): Unit = {
        val vBefore = logVersions(dir).lastOption.getOrElse(-1L)
        try {
          if (!hasConstraint) {
            Sinks.addDeltaCheckConstraint(spark, dir, "k_bound",
              "k >= 0 AND k <= 11", staleLockMs = 5000L)
            assert(pending.isEmpty,
              "ADD CONSTRAINT succeeded while a partition lags")
            hasConstraint = true
          } else {
            Sinks.dropDeltaCheckConstraint(spark, dir, "k_bound",
              staleLockMs = 5000L)
            hasConstraint = false
          }
        } catch {
          case _: InjectedCrash =>
            if (logVersions(dir).lastOption.getOrElse(-1L) > vBefore)
              hasConstraint = !hasConstraint
          case _: IllegalArgumentException |
               _: IllegalStateException |
               _: java.util.ConcurrentModificationException => ()
        }
      }

      def checkpointOp(): Unit =
        try Sinks.checkpointDeltaLog(spark, dir)
        catch { case scala.util.control.NonFatal(_) => () }
      def cleanOp(): Unit =
        try Sinks.cleanDeltaLog(dir)
        catch { case scala.util.control.NonFatal(_) => () }

      // per-partition retention sweep under crash histories (round-12
      // residue 4): logical no-op; must refuse while ANY partition lags
      // (a lagging partition's raw pointer dir is the crashed batch's
      // only copy). Aggressive keeps stress the live-path rail —
      // post-RESTORE live files sit in old generations.
      def vacuumOp(): Unit =
        try {
          Sinks.vacuumTable(spark, dir,
            keepGenerations = 1 + rnd.nextInt(3), staleLockMs = 5000L)
          // with NO log at all (the very first merge crashed before any
          // commit) there is no lag for the guard to see — and nothing
          // to lose: keep >= 1 always preserves every pointer-named
          // generation, so a pending batch's only copy survives
          assert(pending.isEmpty ||
            (logVersions(dir).isEmpty && !Files.exists(
              Paths.get(dir, "_delta_log", "_last_checkpoint"))),
            "VACUUM succeeded while a partition lags — silent-undo bug")
        } catch {
          case _: InjectedCrash => () // partial sweep: state unchanged
          case _: IllegalArgumentException |
               _: IllegalStateException |
               _: java.util.ConcurrentModificationException => ()
        }

      (0 until nOps).foreach { opIdx =>
        val armed = opIdx == crashAtOp
        // half the crashes COMPLETE the tripping publish and then die —
        // the other side of the whole-object old-or-new contract
        if (armed) store.arm(1 + rnd.nextInt(8),
          completeTrippingOp = rnd.nextBoolean())
        val die = rnd.nextInt(100)
        if (opIdx == 0 || die < 45) mergeOp(opIdx)
        else if (die < 60) deleteOp()
        else if (die < 70) restoreOp()
        else if (die < 79) checkpointOp()
        else if (die < 85) cleanOp()
        else if (die < 91) constraintOp()
        else if (die < 96) purgeOp()
        else vacuumOp()
        if (armed) {
          store.disarm()
          Files.deleteIfExists(Paths.get(dir, "_LOCK"))
        }
        drain()
        if (pending.nonEmpty) {
          sawWindow = true
          // heal provenance, per partition (round-14 directive 6): a
          // lagging partition's pointer dir must be TRUSTED by its
          // _BASE stamp — interleaved commits in this single-writer
          // history can only have touched OTHER partitions (ops on a
          // lagging partition refuse), so the merge must ACCEPT the
          // raw dir; a distrust would discard a sole-copy batch.
          val tail = logVersions(dir).lastOption.getOrElse(-1L)
          pending.foreach { case (p, (gen, _)) =>
            assert(graft.sources.Sinks.unloggedGenTrusted(
              Paths.get(dir), Paths.get(dir, s"p=$p", s"gen-$gen"),
              tail, Some(p)),
              s"seed=$seed op=$opIdx: lagging partition p=$p gen-$gen " +
                s"distrusted by its _BASE stamp at tail $tail — the " +
                "heal would discard a sole-copy batch")
          }
        }
        assertState(dir, model, s"seed=$seed op=$opIdx")
        if (opIdx == externalAtOp)
          FuzzHarness.assertExternalMatches(spark, dir, model.cols,
            model.rows, s"seed=$seed op=$opIdx")
        if (pending.isEmpty)
          logVersions(dir).lastOption.foreach(v =>
            snapshots.getOrElseUpdate(v, model))
      }
      // converge: one final merge touching EVERY partition heals all
      if (pending.nonEmpty) {
        val batch = Seq(0L, 1L, 2L).map(k =>
          Map[String, Any]("k" -> k, "ds" -> partOf(k), "v" -> "heal"))
        val df = batch.map(r => (r("k").asInstanceOf[Long],
          r("ds").asInstanceOf[String], r("v").asInstanceOf[String]))
          .toDF("k", "ds", "v")
        def baseOf(p: String) =
          pending.get(p).map(_._2).getOrElse(model.rowsOf(p))
        Sinks.upsertParquetPartitioned(spark, dir, df, Seq("k"), "ds",
          evolveSchema = true, staleLockMs = 5000L)
        model = parts.foldLeft(model)((m, p) =>
          m.mergePart(p, Vector("k", "ds", "v"),
            batch.filter(_("ds") == p), baseOf(p)))
        pending = Map.empty
        drain()
        assertState(dir, model, s"seed=$seed heal")
      }
      // the settled end state must be readable by the clean-room
      // protocol reader (round-12 directive 1)
      FuzzHarness.assertExternalMatches(spark, dir, model.cols,
        model.rows, s"seed=$seed end")
      (store.fired, sawWindow)
    } finally LogStores.unregister(root)
  }

  private def runMany(seeds: Range, crash: Boolean): Unit = {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = seeds.map { s =>
        scala.concurrent.Future(scala.util.Try(runHistory(s, crash))
          .toEither.left.map(e => s -> e))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(25, "min"))
      val failures = results.collect { case Left((s, e)) => (s, e) }
      if (failures.nonEmpty)
        fail(s"${failures.size} histories failed; first: seed=" +
          s"${failures.head._1}\n${failures.head._2}\n" +
          failures.head._2.getStackTrace.take(6).mkString("\n"))
      if (crash) {
        val fired = results.collect { case Right((f, _)) if f => 1 }.size
        val windows = results.collect { case Right((_, w)) if w => 1 }.size
        assert(fired >= seeds.size / 4,
          s"only $fired/${seeds.size} crashes fired — injector inert")
        assert(windows >= 5,
          s"only $windows histories hit a lagging-partition window")
      }
    } finally pool.shutdown()
  }

  test("partitioned fuzz: 50 crash-free histories match the model after every op") {
    runMany(1 to 50, crash = false)
  }

  test("partitioned fuzz: 50 crash-injected histories refuse-or-heal per partition") {
    runMany(2001 to 2050, crash = true)
  }
}
