package graft

import java.nio.file.{Files, Path, Paths}
import org.apache.spark.sql.functions._
import graft.sources.{LogStore, LogStores, LocalFsLogStore, Sinks,
  DeletionVectors}
import scala.jdk.CollectionConverters._

/** Multi-writer concurrency fuzz (round-12 directive 2): N writer
  * threads race randomized op mixes on ONE table through the
  * PRODUCTION `_LOCK` + put-if-absent contract — no mocks, no fault
  * injection — and every outcome must be linearizable:
  *
  *  - every ACKED batch appears in the log exactly once (its Delta
  *    `txn` action), never zero times (lost batch) and never twice
  *    (double-apply);
  *  - every REFUSED op (ConcurrentModificationException) left no
  *    trace in the log;
  *  - the final table state equals an independent replay of the LOG's
  *    committed operations in version order (merges regenerated from
  *    their txn identity, DELETEs re-parsed from the logged predicate)
  *    — agreed on by graft's read path AND the clean-room
  *    [[ExternalDeltaReader]].
  *
  * The stale-lock-break path gets its own deterministic case: a holder
  * PAUSED past staleLockMs inside its pointer publish (a GC pause, an
  * object-store hang) loses the race to the stealer and must retry
  * cleanly — the round-13 design pass hardened the committers for
  * exactly this (expectedTail-pinned version CAS in appendDeltaCommit,
  * FileAlreadyExists treated as a retried lost race; see
  * `Sinks.appendDeltaCommit`'s scaladoc).
  */
class DeltaConcurrencySpec extends SparkSpec {
  import spark.implicits._

  private val om = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Per-version forensic facts parsed from the raw log JSON. */
  private case class CommitFacts(version: Long, operation: String,
                                 predicate: Option[String],
                                 txn: Option[(String, Long)])
  private def commitFacts(dir: String): Seq[CommitFacts] =
    Sinks.deltaLogVersions(dir).map { v =>
      val f = Paths.get(dir, "_delta_log", f"$v%020d.json")
      var op = ""
      var pred: Option[String] = None
      var txn: Option[(String, Long)] = None
      Files.readString(f).linesIterator.filter(_.nonEmpty).foreach { l =>
        val n = om.readTree(l)
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo")
          op = ci.get("operation").asText()
          if (ci.has("operationParameters") &&
              ci.get("operationParameters").has("predicate"))
            pred = Some(
              ci.get("operationParameters").get("predicate").asText())
        }
        if (n.has("txn"))
          txn = Some(n.get("txn").get("appId").asText() ->
            n.get("txn").get("version").asLong())
      }
      CommitFacts(v, op, pred, txn)
    }

  /** Deterministic batch payload for (history, writer, batch index) —
    * the replay regenerates it from the txn identity alone.
    */
  private def batchOf(histSeed: Int, w: Int,
                      i: Long): Seq[(Long, String)] = {
    val rnd = new scala.util.Random(histSeed * 7919 + w * 1009 + i.toInt)
    rnd.shuffle((0L to 11L).toVector).take(1 + rnd.nextInt(4))
      .map(k => k -> s"h$histSeed-w$w-b$i-$k")
  }

  // the logged predicate is Column#toString — Catalyst's PREFIX
  // rendering with typed literal suffixes: `=(pmod(k, 7L), 4L)`;
  // accept the infix spelling too in case the rendering changes
  private val DeletePredForms = Seq(
    """=\(pmod\('?k,\s*(\d+)L?\),\s*(\d+)L?\)""".r,
    """pmod\('?k,\s*(\d+)L?\)\s*=\s*(\d+)L?""".r)
  private def parseDeletePred(p: String): Option[(Long, Long)] =
    DeletePredForms.iterator.flatMap(_.findFirstMatchIn(p))
      .nextOption().map(m => (m.group(1).toLong, m.group(2).toLong))

  /** One seeded multi-writer history on a fresh table. */
  private def runHistory(histSeed: Int): Unit = {
    val dir = Files.createTempDirectory(s"conc-$histSeed").toString + "/t"
    val writers = 2 + (histSeed % 2) // 2 or 3 racing threads
    val acked =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    val refused =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until writers).map { w =>
      new Thread(() => {
        val rnd = new scala.util.Random(histSeed * 31 + w)
        val nOps = 4 + rnd.nextInt(3)
        var batchIdx = 0L
        var haveConstraint = false
        (0 until nOps).foreach { _ =>
          val die = rnd.nextInt(100)
          try {
            if (die < 65 || batchIdx == 0) {
              val i = batchIdx
              batchIdx += 1
              val df = batchOf(histSeed, w, i).toDF("k", "v")
              try {
                Sinks.upsertParquet(spark, dir, df, Seq("k"),
                  maxRetries = 40, txn = Some((s"w$w", i)))
                acked.add((s"w$w", i))
              } catch {
                case _: java.util.ConcurrentModificationException =>
                  refused.add((s"w$w", i))
              }
            } else if (die < 80) {
              // thread-distinct modulus — the replay parses (m, r) from
              // the logged predicate, no attribution needed
              val m = 5L + w
              val r = rnd.nextInt(m.toInt).toLong
              try DeletionVectors.deleteDeltaWhere(spark, dir,
                pmod(col("k"), lit(m)) === r)
              catch {
                case _: java.util.ConcurrentModificationException |
                     _: IllegalArgumentException => () // refusal
              }
            } else if (die < 90) {
              try {
                if (!haveConstraint) {
                  Sinks.addDeltaCheckConstraint(spark, dir, s"k_w$w",
                    "k >= 0 AND k <= 11")
                  haveConstraint = true
                } else {
                  Sinks.dropDeltaCheckConstraint(spark, dir, s"k_w$w")
                  haveConstraint = false
                }
              } catch {
                case _: java.util.ConcurrentModificationException |
                     _: IllegalArgumentException |
                     _: IllegalStateException => () // refusal
              }
            } else if (die < 95) {
              try Sinks.checkpointDeltaLog(spark, dir)
              catch { case scala.util.control.NonFatal(_) => () }
            } else {
              try Sinks.vacuumTable(spark, dir)
              catch {
                case _: java.util.ConcurrentModificationException |
                     _: IllegalArgumentException |
                     _: IllegalStateException => () // refusal
              }
            }
          } catch {
            case t: Throwable => errors.add(t)
          }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000L))
    assert(errors.isEmpty,
      s"hist=$histSeed unexpected writer failure: ${errors.peek()}")

    val facts = commitFacts(dir)
    // exactly-once: no (appId, version) committed twice, acked batches
    // all present, refused batches all absent
    val txnActions = facts.flatMap(_.txn)
    assert(txnActions.distinct.size == txnActions.size,
      s"hist=$histSeed: a batch committed twice: $txnActions")
    val committed = txnActions.toSet
    val lost = acked.asScala.toSet -- committed
    assert(lost.isEmpty, s"hist=$histSeed: acked batches lost: $lost")
    val ghosts = refused.asScala.toSet.intersect(committed)
    assert(ghosts.isEmpty,
      s"hist=$histSeed: refused batches actually committed: $ghosts")
    // with no crash injection and no stale steal, every MERGE commit is
    // a claimed batch — a txn-less MERGE would be an unexplained heal
    facts.filter(_.operation == "MERGE").foreach(f =>
      assert(f.txn.nonEmpty,
        s"hist=$histSeed: MERGE v${f.version} carries no txn"))
    // independent replay of the LOG in version order = the final state
    val expected = facts.sortBy(_.version)
      .foldLeft(Map.empty[Long, String]) { (state, f) =>
        f.operation match {
          case "MERGE" =>
            val (app, i) = f.txn.get
            state ++ batchOf(histSeed, app.stripPrefix("w").toInt, i)
          case "DELETE" =>
            val (m, r) = parseDeletePred(f.predicate.getOrElse(""))
              .getOrElse(fail(s"hist=$histSeed: unparseable DELETE " +
                s"predicate ${f.predicate}"))
            state.filterNot { case (k, _) => k % m == r }
          case _ => state // constraints/vacuum: no row effect
        }
      }
    val df = Sinks.readDeltaTableAt(spark, dir)
    // collect-bound: concurrency fixture holds <= 12 keys by construction
    val got = df.collect()
      .map(r => r.getLong(df.columns.indexOf("k")) ->
        r.getString(df.columns.indexOf("v"))).toMap
    assert(got == expected,
      s"hist=$histSeed:\n  got      $got\n  expected $expected")
    // the clean-room protocol reader agrees
    val ext = ExternalDeltaReader.readRows(spark, dir)._2
      .map(m => m("k").asInstanceOf[Long] ->
        m("v").asInstanceOf[String]).toMap
    assert(ext == expected, s"hist=$histSeed external: $ext")
  }

  test("high-contention merge race: 4 writers x 6 batches, all exactly-once") {
    val dir = Files.createTempDirectory("conc-m").toString + "/t"
    val acked =
      java.util.concurrent.ConcurrentHashMap.newKeySet[(String, Long)]()
    val errors =
      new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
    val threads = (0 until 4).map { w =>
      new Thread(() => {
        (0L until 6L).foreach { i =>
          try {
            Sinks.upsertParquet(spark, dir,
              batchOf(0, w, i).toDF("k", "v"), Seq("k"),
              maxRetries = 60, txn = Some((s"w$w", i)))
            acked.add((s"w$w", i))
          } catch { case t: Throwable => errors.add(t) }
        }
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join(600000L))
    assert(errors.isEmpty, s"writer failure: ${errors.peek()}")
    assert(acked.size == 24, s"only ${acked.size}/24 batches acked")
    val facts = commitFacts(dir)
    val txns = facts.flatMap(_.txn)
    assert(txns.size == 24 && txns.distinct.size == 24,
      s"txn actions: ${txns.size} (${txns.distinct.size} distinct)")
    // log-order replay = final state, on both read paths
    val expected = facts.sortBy(_.version).foldLeft(
      Map.empty[Long, String]) { (state, f) =>
      val (app, i) = f.txn.get
      state ++ batchOf(0, app.stripPrefix("w").toInt, i)
    }
    val df = Sinks.readDeltaTableAt(spark, dir)
    // collect-bound: 12 keys by construction
    val got = df.collect().map(r =>
      r.getLong(df.columns.indexOf("k")) ->
        r.getString(df.columns.indexOf("v"))).toMap
    assert(got == expected)
    assert(ExternalDeltaReader.snapshot(spark, dir).txns ==
      (0 until 4).map(w => s"w$w" -> 5L).toMap,
      "per-writer txn high-water marks")
  }

  test("100 seeded multi-writer histories (merge/DELETE/constraint/vacuum) are linearizable") {
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 100).map { s =>
        scala.concurrent.Future(scala.util.Try(runHistory(s))
          .toEither.left.map(e => s -> e))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(25, "min"))
      val failures = results.collect { case Left((s, e)) => (s, e) }
      if (failures.nonEmpty)
        fail(s"${failures.size} histories failed; first: hist=" +
          s"${failures.head._1}\n${failures.head._2}\n" +
          failures.head._2.getStackTrace.take(6).mkString("\n"))
    } finally pool.shutdown()
  }

  test("a holder paused past staleLockMs loses cleanly: no lost batch, no double-apply") {
    val root = Files.createTempDirectory("steal")
    val dir = root.resolve("t").toString
    // seed one committed generation through the default store, BEFORE
    // the slow store is registered
    Sinks.upsertParquet(spark, dir, Seq((0L, "seed")).toDF("k", "v"),
      Seq("k"))
    // the first _CURRENT publish after arming PAUSES the holder inside
    // its in-lock commit sequence, far past the stale window — modeling
    // a GC pause / object-store hang at the worst possible boundary
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val holderPaused = new java.util.concurrent.CountDownLatch(1)
    object SlowStore extends LogStore {
      def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
      def put(p: Path, c: String): Unit = {
        if (p.getFileName.toString == "_CURRENT" &&
            armed.compareAndSet(true, false)) {
          holderPaused.countDown()
          Thread.sleep(5000L)
        }
        LocalFsLogStore.put(p, c)
      }
      def putIfAbsent(p: Path, c: String): Unit =
        LocalFsLogStore.putIfAbsent(p, c)
      def putFile(s: Path, d: Path): Unit = LocalFsLogStore.putFile(s, d)
      def delete(p: Path): Unit = LocalFsLogStore.delete(p)
    }
    LogStores.register(root, SlowStore)
    try {
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val a = new Thread(() =>
        try Sinks.upsertParquet(spark, dir,
          Seq((1L, "A"), (2L, "A")).toDF("k", "v"), Seq("k"),
          staleLockMs = 300L, maxRetries = 20, txn = Some(("wa", 1L)))
        catch { case t: Throwable => errors.add(t) })
      val b = new Thread(() =>
        try {
          // start only once A is provably paused INSIDE its lock
          holderPaused.await()
          Sinks.upsertParquet(spark, dir,
            Seq((3L, "B"), (4L, "B")).toDF("k", "v"), Seq("k"),
            staleLockMs = 300L, maxRetries = 20, txn = Some(("wb", 1L)))
        } catch { case t: Throwable => errors.add(t) })
      a.start(); b.start()
      a.join(300000L); b.join(300000L)
      assert(errors.isEmpty, s"writer failure: ${errors.peek()}")
      // both batches landed exactly once — the paused holder lost its
      // first attempt to the stealer and retried against B's state
      val df = Sinks.readDeltaTableAt(spark, dir)
      // collect-bound: 5-row fixture
      val got = df.collect().map(r =>
        r.getLong(df.columns.indexOf("k")) ->
          r.getString(df.columns.indexOf("v"))).toMap
      assert(got == Map(0L -> "seed", 1L -> "A", 2L -> "A",
        3L -> "B", 4L -> "B"), s"lost update: $got")
      val txns = commitFacts(dir).flatMap(_.txn)
      assert(txns.distinct.size == txns.size, s"double-apply: $txns")
      assert(txns.toSet == Set("wa" -> 1L, "wb" -> 1L), txns.toString)
      // the steal actually happened: the STEALER committed first, the
      // paused holder's batch landed at a later version
      val vOf = commitFacts(dir).flatMap(f =>
        f.txn.map(t => t._1 -> f.version)).toMap
      assert(vOf("wa") > vOf("wb"),
        s"stale steal did not occur (wa@${vOf("wa")}, wb@${vOf("wb")}) " +
          "— the pause window was missed; raise the sleep")
      // and the clean-room reader agrees on the settled state
      assert(ExternalDeltaReader.readRows(spark, dir)._2
        .map(m => m("k").asInstanceOf[Long] ->
          m("v").asInstanceOf[String]).toMap == got)
    } finally LogStores.unregister(root)
  }
}
