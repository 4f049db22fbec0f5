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
                                 txn: Option[(String, Long)],
                                 gen: Option[Long])
  private def commitFacts(dir: String): Seq[CommitFacts] =
    Sinks.deltaLogVersions(dir).map { v =>
      val f = Paths.get(dir, "_delta_log", f"$v%020d.json")
      var op = ""
      var pred: Option[String] = None
      var txn: Option[(String, Long)] = None
      var gen: Option[Long] = None
      Files.readString(f).linesIterator.filter(_.nonEmpty).foreach { l =>
        val n = om.readTree(l)
        if (n.has("commitInfo")) {
          val ci = n.get("commitInfo")
          op = ci.get("operation").asText()
          if (ci.has("operationParameters")) {
            val ps = ci.get("operationParameters")
            if (ps.has("predicate"))
              pred = Some(ps.get("predicate").asText())
            if (ps.has("generation"))
              gen = Some(ps.get("generation").asText().toLong)
          }
        }
        if (n.has("txn"))
          txn = Some(n.get("txn").get("appId").asText() ->
            n.get("txn").get("version").asLong())
      }
      CommitFacts(v, op, pred, txn, gen)
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

  test("partitioned stale-steal: a holder paused mid-pointer-swap loses per-partition, both batches land") {
    val root = Files.createTempDirectory("psteal")
    val dir = root.resolve("t").toString
    Sinks.upsertParquetPartitioned(spark, dir,
      Seq((0L, "a", "seed"), (10L, "b", "seed")).toDF("k", "ds", "v"),
      Seq("k"), "ds")
    // pause the holder inside its FIRST partition pointer publish —
    // after one partition's gen-dir move, before any other partition
    // is touched: the worst window for the per-partition heal
    val armed = new java.util.concurrent.atomic.AtomicBoolean(true)
    val holderPaused = new java.util.concurrent.CountDownLatch(1)
    object SlowStore extends LogStore {
      def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
      def put(p: Path, c: String): Unit = {
        if (p.getFileName.toString == "_CURRENT" &&
            p.getParent.getFileName.toString.startsWith("p=") &&
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
        try Sinks.upsertParquetPartitioned(spark, dir,
          Seq((1L, "a", "A"), (11L, "b", "A")).toDF("k", "ds", "v"),
          Seq("k"), "ds", staleLockMs = 300L, maxRetries = 20,
          txn = Some(("pwa", 1L)))
        catch { case t: Throwable => errors.add(t) })
      val b = new Thread(() =>
        try {
          holderPaused.await()
          Sinks.upsertParquetPartitioned(spark, dir,
            Seq((2L, "a", "B"), (12L, "b", "B")).toDF("k", "ds", "v"),
            Seq("k"), "ds", staleLockMs = 300L, maxRetries = 20,
            txn = Some(("pwb", 1L)))
        } catch { case t: Throwable => errors.add(t) })
      a.start(); b.start()
      a.join(300000L); b.join(300000L)
      assert(errors.isEmpty, s"writer failure: ${errors.peek()}")
      val df = Sinks.readDeltaTableAt(spark, dir)
      // collect-bound: 6-row fixture
      val got = df.collect().map(r =>
        r.getLong(df.columns.indexOf("k")) ->
          r.getString(df.columns.indexOf("v"))).toMap
      assert(got == Map(0L -> "seed", 10L -> "seed", 1L -> "A",
        11L -> "A", 2L -> "B", 12L -> "B"), s"lost update: $got")
      val txns = commitFacts(dir).flatMap(_.txn)
      assert(txns.distinct.size == txns.size, s"double-apply: $txns")
      assert(txns.map(_._1).toSet == Set("pwa", "pwb"))
      // the steal happened: the paused holder retried and landed later
      val vOf = commitFacts(dir).flatMap(f =>
        f.txn.map(t => t._1 -> f.version)).toMap
      assert(vOf("pwa") > vOf("pwb"),
        s"stale steal did not occur (pwa@${vOf("pwa")}, " +
          s"pwb@${vOf("pwb")}); raise the sleep")
      // pointer reads agree after the dust settles
      assert(Sinks.readUpsertPartitionedTable(spark, dir)
        .select("k").collect().map(_.getLong(0)).toSet ==
        Set(0L, 1L, 2L, 10L, 11L, 12L))
      // and the clean-room reader sees the same state
      assert(ExternalDeltaReader.readRows(spark, dir)._2
        .map(m => m("k").asInstanceOf[Long]).toSet ==
        Set(0L, 1L, 2L, 10L, 11L, 12L))
    } finally LogStores.unregister(root)
  }

  /** SCHEDULE-CONTROLLED steal seam (round-14 directive 2 — the r13
    * storm's wall-clock `Thread.sleep` jitter vs a 120 ms stale window
    * made failures box-speed-dependent and unreplayable by seed).
    * Instead of sleeping, a seeded per-writer-thread draw PARKS the
    * calling thread on a latch immediately BEFORE a pointer/version
    * publish (the fence's check-to-operation residual window), and
    * while anyone is parked the `_LOCK`'s `lastModifiedMs` reads as
    * epoch 0 — every would-be stealer sees an infinitely stale lock
    * and steals IMMEDIATELY. The parkee is released only when another
    * thread COMPLETES a log-version publish (or when no other writer
    * remains / a 20 s backstop fires), so a drawn pause at a dangerous
    * operation ALWAYS yields the full steal-commit-wake interleaving —
    * no dependence on box speed, and a losing seed loses every run.
    */
  private final class ScheduledStealStore(seed: Int,
                                          writers: Int) extends LogStore {
    private val active =
      new java.util.concurrent.atomic.AtomicInteger(writers)
    private val parked = new java.util.concurrent.atomic.AtomicReference[
      java.util.concurrent.CountDownLatch](null)
    private val rnds = new java.util.concurrent.ConcurrentHashMap[
      Thread, java.util.Random]()
    private def rnd(): java.util.Random =
      rnds.computeIfAbsent(Thread.currentThread(), t =>
        // per-thread deterministic stream: writer threads are named
        // "w<i>" by the storm driver; unnamed threads share stream 9
        new java.util.Random(seed * 7877 +
          (t.getName match {
            case n if n.startsWith("w") =>
              scala.util.Try(n.stripPrefix("w").toInt).getOrElse(9)
            case _ => 9
          }) * 131))
    def writerDone(): Unit = { active.decrementAndGet(); releasePark() }
    private def releasePark(): Unit = {
      val l = parked.getAndSet(null)
      if (l != null) l.countDown()
    }
    private def maybePark(): Unit = {
      val r = rnd()
      if (r.nextInt(5) != 0) return
      val l = new java.util.concurrent.CountDownLatch(1)
      if (!parked.compareAndSet(null, l)) return // one parkee at a time
      if (active.get() <= 1) { releasePark(); return } // nobody to release us
      l.await(20, java.util.concurrent.TimeUnit.SECONDS) // backstop only
    }
    def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
    def put(p: Path, c: String): Unit = {
      maybePark(); LocalFsLogStore.put(p, c) }
    def putIfAbsent(p: Path, c: String): Unit = {
      val isCommit = p.getParent != null &&
        p.getParent.getFileName.toString == "_delta_log"
      maybePark()
      try LocalFsLogStore.putIfAbsent(p, c)
      // a completed version publish (won OR lost — either means a
      // commit attempt fully traversed the log CAS) wakes the parkee
      finally if (isCommit) releasePark()
    }
    def putFile(s: Path, d: Path): Unit = LocalFsLogStore.putFile(s, d)
    def delete(p: Path): Unit = LocalFsLogStore.delete(p)
    override def lastModifiedMs(p: Path): Long =
      if (parked.get() != null && p.getFileName.toString == "_LOCK") 0L
      else LocalFsLogStore.lastModifiedMs(p)
  }

  test("steal-storm: 50 schedule-controlled histories with forced steals stay linearizable") {
    // forced pauses INSIDE the critical section (before pointer/version
    // publishes) with instantly-stealable locks while paused: lock
    // steals happen on EVERY drawn pause, exercising the fence +
    // FAE-retry + _BASE-stamp machinery under swept interleavings —
    // the deterministic steal cases above pin one window each, this
    // sweeps the compositions. Writers own DISJOINT key ranges so
    // per-key linearizability is checkable without modeling
    // cross-writer merge order under heals (heal commits re-log a
    // crashed generation without its txn, so the log-replay
    // adjudication of the no-steal histories does not apply).
    def runStorm(seed: Int): Unit = {
      val root = Files.createTempDirectory(s"storm-$seed")
      val dir = root.resolve("t").toString
      val writers = 3
      val store = new ScheduledStealStore(seed, writers)
      LogStores.register(root, store)
      try {
        val errors =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val batchesPer = 3
        // writer w owns keys [w*4, w*4+4); batch (w, i) writes a seeded
        // subset with values "s<seed>-w<w>-b<i>"
        def batch(w: Int, i: Long): Seq[(Long, String)] = {
          val r = new scala.util.Random(seed * 911 + w * 31 + i.toInt)
          r.shuffle((w * 4 until w * 4 + 4).toVector)
            .take(1 + r.nextInt(3))
            .map(k => k.toLong -> s"s$seed-w$w-b$i")
        }
        val threads = (0 until writers).map { w =>
          val t = new Thread(() =>
            try (0L until batchesPer).foreach { i =>
              Sinks.upsertParquet(spark, dir, batch(w, i).toDF("k", "v"),
                Seq("k"), maxRetries = 60, staleLockMs = 120L,
                txn = Some((s"w$w", i)))
            } catch { case t: Throwable => errors.add(t) }
            finally store.writerDone())
          t.setName(s"w$w") // keys the store's per-writer random stream
          t
        }
        threads.foreach(_.start())
        threads.foreach(_.join(600000L))
        assert(errors.isEmpty,
          s"storm=$seed writer failure: ${errors.peek()}")
        // exactly-once per batch, even through steals and heals
        val txns = commitFacts(dir).flatMap(_.txn)
        assert(txns.distinct.size == txns.size,
          s"storm=$seed double-apply: $txns")
        assert(txns.toSet ==
          (for (w <- 0 until writers; i <- 0L until batchesPer)
            yield (s"w$w", i)).toSet,
          s"storm=$seed lost batches: ${txns.toSet}")
        // per-key linearizability: every key's final value is its
        // OWNER's last batch that wrote it (writers are serial, keys
        // disjoint, so no other order is linearizable)
        val expected = (for {
          w <- 0 until writers
          i <- 0L until batchesPer
          kv <- batch(w, i)
        } yield kv).groupBy(_._1).map { case (k, vs) => k -> vs.last._2 }
        val df = Sinks.readDeltaTableAt(spark, dir)
        // collect-bound: <= 12 keys by construction
        val got = df.collect().map(r =>
          r.getLong(df.columns.indexOf("k")) ->
            r.getString(df.columns.indexOf("v"))).toMap
        if (got != expected) {
          // per-version forensics: which commit dropped the key. Data
          // files may be vacuumed, so ALSO track each version's live
          // add set and the exact per-file k maxima from logged stats
          // (file max is exact: maxK==11 iff key 11 is present)
          val live = scala.collection.mutable.LinkedHashMap
            .empty[String, Long] // path -> maxK
          val hist = commitFacts(dir).map { f =>
            val jf = Paths.get(dir, "_delta_log", f"${f.version}%020d.json")
            Files.readString(jf).linesIterator.filter(_.nonEmpty)
              .foreach { l =>
                val n = om.readTree(l)
                if (n.has("remove"))
                  live -= n.get("remove").get("path").asText()
                if (n.has("add")) {
                  val a = n.get("add")
                  val mx =
                    if (!a.has("stats")) -1L
                    else scala.util.Try(om.readTree(a.get("stats")
                      .asText()).get("maxValues").get("k").asLong())
                      .getOrElse(-1L)
                  live(a.get("path").asText()) = mx
                }
              }
            val maxK = if (live.isEmpty) -1L else live.values.max
            val rows = scala.util.Try(
              ExternalDeltaReader.readRows(spark, dir, f.version)._2
                .map(m => m("k").asInstanceOf[Long].toString + "=" +
                  m("v").asInstanceOf[String]).sorted.mkString(","))
              .getOrElse("UNREADABLE")
            s"v${f.version} op=${f.operation} gen=${f.gen} " +
              s"txn=${f.txn} maxK=$maxK files=${live.keys.map(
                _.takeWhile(_ != '/')).toSet.mkString("+")} rows[$rows]"
          }.mkString("\n  ")
          fail(s"storm=$seed:\n  got      $got\n  expected " +
            s"$expected\n  $hist")
        }
        assert(ExternalDeltaReader.readRows(spark, dir)._2
          .map(m => m("k").asInstanceOf[Long] ->
            m("v").asInstanceOf[String]).toMap == expected,
          s"storm=$seed external reader disagrees")
      } finally LogStores.unregister(root)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 50).map { s =>
        scala.concurrent.Future(scala.util.Try(runStorm(s))
          .toEither.left.map(e => s -> e))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(25, "min"))
      val failures = results.collect { case Left((s, e)) => (s, e) }
      if (failures.nonEmpty)
        fail(s"${failures.size} storms failed; first: storm=" +
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

  test("mixed-op steal-storm: 50 schedule-controlled histories (merge + own-range DELETE + vacuum + checkpoint) stay linearizable") {
    // round-14 directive 5: the r13 storm was merge-only; this one
    // races the DV DELETE path, the standalone vacuum, and checkpoints
    // through the same forced-steal seam. Writers own DISJOINT key
    // ranges and DELETE only within their own range (parity predicate),
    // so the expected final state is each writer's ACKED op journal
    // replayed in that writer's serial order — refusals
    // (ConcurrentModificationException / crash-lagging requires) are
    // legal outcomes for DELETE/vacuum and must simply leave no trace.
    def runStorm(seed: Int): Unit = {
      val root = Files.createTempDirectory(s"mstorm-$seed")
      val dir = root.resolve("t").toString
      val writers = 3
      val store = new ScheduledStealStore(seed, writers)
      LogStores.register(root, store)
      try {
        val errors =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        def batch(w: Int, i: Long): Seq[(Long, String)] = {
          val r = new scala.util.Random(seed * 613 + w * 37 + i.toInt)
          r.shuffle((w * 4 until w * 4 + 4).toVector)
            .take(1 + r.nextInt(3))
            .map(k => k.toLong -> s"m$seed-w$w-b$i")
        }
        sealed trait Op
        final case class BatchOp(i: Long) extends Op
        final case class DelOp(parity: Long) extends Op
        val journals = Array.fill(writers)(
          scala.collection.mutable.ArrayBuffer.empty[Op])
        val acked = java.util.concurrent.ConcurrentHashMap
          .newKeySet[(String, Long)]()
        val refused = java.util.concurrent.ConcurrentHashMap
          .newKeySet[(String, Long)]()
        val threads = (0 until writers).map { w =>
          val t = new Thread(() =>
            try {
              val rnd = new scala.util.Random(seed * 101 + w)
              var batchIdx = 0L
              (0 until 5).foreach { opN =>
                val die = rnd.nextInt(100)
                if (die < 55 || opN == 0) {
                  val i = batchIdx; batchIdx += 1
                  try {
                    Sinks.upsertParquet(spark, dir,
                      batch(w, i).toDF("k", "v"), Seq("k"),
                      maxRetries = 60, staleLockMs = 120L,
                      txn = Some((s"w$w", i)))
                    acked.add((s"w$w", i)); journals(w) += BatchOp(i)
                  } catch {
                    case _: java.util.ConcurrentModificationException =>
                      refused.add((s"w$w", i))
                  }
                } else if (die < 80) {
                  val r = rnd.nextInt(2).toLong
                  try {
                    DeletionVectors.deleteDeltaWhere(spark, dir,
                      col("k") >= w * 4 && col("k") < w * 4 + 4 &&
                        pmod(col("k"), lit(2L)) === r)
                    journals(w) += DelOp(r)
                  } catch {
                    case _: java.util.ConcurrentModificationException |
                         _: IllegalArgumentException |
                         _: IllegalStateException => () // refusal
                  }
                } else if (die < 92) {
                  try Sinks.vacuumTable(spark, dir, keepGenerations = 2)
                  catch {
                    case _: java.util.ConcurrentModificationException |
                         _: IllegalArgumentException |
                         _: IllegalStateException => () // refusal
                  }
                } else {
                  try Sinks.checkpointDeltaLog(spark, dir)
                  catch { case scala.util.control.NonFatal(_) => () }
                }
              }
            } catch { case t: Throwable => errors.add(t) }
            finally store.writerDone())
          t.setName(s"w$w")
          t
        }
        threads.foreach(_.start())
        threads.foreach(_.join(600000L))
        assert(errors.isEmpty,
          s"mstorm=$seed writer failure: ${errors.peek()}")
        // exactly-once on the batch txns, through steals and heals
        val txns = commitFacts(dir).flatMap(_.txn)
        assert(txns.distinct.size == txns.size,
          s"mstorm=$seed double-apply: $txns")
        assert(acked.asScala.toSet.subsetOf(txns.toSet),
          s"mstorm=$seed acked batches lost: " +
            s"${acked.asScala.toSet -- txns.toSet}")
        assert(refused.asScala.toSet.intersect(txns.toSet).isEmpty,
          s"mstorm=$seed refused batches committed: " +
            s"${refused.asScala.toSet.intersect(txns.toSet)}")
        // per-writer serial replay of the ACKED journal = final state
        val expected = (0 until writers).flatMap { w =>
          journals(w).foldLeft(Map.empty[Long, String]) { (st, op) =>
            op match {
              case BatchOp(i) => st ++ batch(w, i)
              case DelOp(r) => st.filterNot { case (k, _) => k % 2 == r }
            }
          }
        }.toMap
        val df = Sinks.readDeltaTableAt(spark, dir)
        // collect-bound: <= 12 keys by construction
        val got = df.collect().map(r =>
          r.getLong(df.columns.indexOf("k")) ->
            r.getString(df.columns.indexOf("v"))).toMap
        assert(got == expected,
          s"mstorm=$seed:\n  got      $got\n  expected $expected")
        assert(ExternalDeltaReader.readRows(spark, dir)._2
          .map(m => m("k").asInstanceOf[Long] ->
            m("v").asInstanceOf[String]).toMap == expected,
          s"mstorm=$seed external reader disagrees")
      } finally LogStores.unregister(root)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 50).map { s =>
        scala.concurrent.Future(scala.util.Try(runStorm(s))
          .toEither.left.map(e => s -> e))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(30, "min"))
      val failures = results.collect { case Left((s, e)) => (s, e) }
      if (failures.nonEmpty)
        fail(s"${failures.size} mixed storms failed; first: mstorm=" +
          s"${failures.head._1}\n${failures.head._2}\n" +
          failures.head._2.getStackTrace.take(6).mkString("\n"))
    } finally pool.shutdown()
  }

  test("partitioned steal-storm: 25 schedule-controlled histories stay per-key linearizable") {
    // round-14 directive 5: the per-partition committer under forced
    // steals — per-partition pointer swaps, the partitionGens heal, and
    // the new per-partition _BASE stamps all race here. Same disjoint
    // key ownership; each key's partition is fixed (ds by parity), so
    // the expected state is the owner's last acked batch per key.
    def runStorm(seed: Int): Unit = {
      val root = Files.createTempDirectory(s"pstorm-$seed")
      val dir = root.resolve("t").toString
      val writers = 3
      val store = new ScheduledStealStore(seed, writers)
      LogStores.register(root, store)
      try {
        val errors =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val batchesPer = 2
        def batch(w: Int, i: Long): Seq[(Long, String, String)] = {
          val r = new scala.util.Random(seed * 419 + w * 53 + i.toInt)
          r.shuffle((w * 4 until w * 4 + 4).toVector)
            .take(1 + r.nextInt(3))
            .map(k => (k.toLong, if (k % 2 == 0) "a" else "b",
              s"p$seed-w$w-b$i"))
        }
        val threads = (0 until writers).map { w =>
          val t = new Thread(() =>
            try (0L until batchesPer).foreach { i =>
              Sinks.upsertParquetPartitioned(spark, dir,
                batch(w, i).toDF("k", "ds", "v"), Seq("k"), "ds",
                maxRetries = 60, staleLockMs = 120L,
                txn = Some((s"w$w", i)))
            } catch { case t: Throwable => errors.add(t) }
            finally store.writerDone())
          t.setName(s"w$w")
          t
        }
        threads.foreach(_.start())
        threads.foreach(_.join(600000L))
        assert(errors.isEmpty,
          s"pstorm=$seed writer failure: ${errors.peek()}")
        val txns = commitFacts(dir).flatMap(_.txn)
        assert(txns.distinct.size == txns.size,
          s"pstorm=$seed double-apply: $txns")
        assert(txns.toSet ==
          (for (w <- 0 until writers; i <- 0L until batchesPer)
            yield (s"w$w", i)).toSet,
          s"pstorm=$seed lost batches: ${txns.toSet}")
        val expected = (for {
          w <- 0 until writers
          i <- 0L until batchesPer
          kv <- batch(w, i)
        } yield kv).groupBy(_._1)
          .map { case (k, vs) => k -> vs.last._3 }
        val df = Sinks.readDeltaTableAt(spark, dir)
        // collect-bound: <= 12 keys by construction
        val got = df.collect().map(r =>
          r.getLong(df.columns.indexOf("k")) ->
            r.getString(df.columns.indexOf("v"))).toMap
        assert(got == expected,
          s"pstorm=$seed:\n  got      $got\n  expected $expected")
        // settled pointer read and clean-room reader agree
        assert(Sinks.readUpsertPartitionedTable(spark, dir)
          .select("k").collect().map(_.getLong(0)).toSet ==
          expected.keySet, s"pstorm=$seed pointer read disagrees")
        assert(ExternalDeltaReader.readRows(spark, dir)._2
          .map(m => m("k").asInstanceOf[Long] ->
            m("v").asInstanceOf[String]).toMap == expected,
          s"pstorm=$seed external reader disagrees")
      } finally LogStores.unregister(root)
    }
    val pool = java.util.concurrent.Executors.newFixedThreadPool(3)
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutor(pool)
    try {
      val futs = (1 to 25).map { s =>
        scala.concurrent.Future(scala.util.Try(runStorm(s))
          .toEither.left.map(e => s -> e))
      }
      val results = scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(futs),
        scala.concurrent.duration.Duration(30, "min"))
      val failures = results.collect { case Left((s, e)) => (s, e) }
      if (failures.nonEmpty)
        fail(s"${failures.size} partitioned storms failed; first: " +
          s"pstorm=${failures.head._1}\n${failures.head._2}\n" +
          failures.head._2.getStackTrace.take(6).mkString("\n"))
    } finally pool.shutdown()
  }

  test("replaced-generation poison (deterministic r13 storm loss): a paused holder never logs the stealer's files under its own txn") {
    // The exact interleaving the round-13 judge's forensics pinned:
    // H moves its staged gen-1, parks immediately BEFORE its _CURRENT
    // publish; W steals the (instantly-stale-while-parked) lock,
    // REPLACES gen-1 with its own stage, publishes its pointer, then
    // parks immediately before its v1 log publish. H wakes with v1
    // still free — pre-fix H logged gen-1's CURRENT files (W's data,
    // H's rows destroyed by the replace) under H's txn and acked: a
    // committed batch with zero rows written, invisible to the
    // exactly-once check. Post-fix H's stage-identity check fires, H
    // retries, and every row lands. Fully latch-sequenced — no
    // wall-clock dependence, fails identically every run pre-fix.
    val root = Files.createTempDirectory("identsteal")
    val dir = root.resolve("t").toString
    Sinks.upsertParquet(spark, dir, Seq((0L, "seed")).toDF("k", "v"),
      Seq("k"))
    val armH = new java.util.concurrent.atomic.AtomicBoolean(true)
    val armW = new java.util.concurrent.atomic.AtomicBoolean(false)
    val hParked = new java.util.concurrent.CountDownLatch(1)
    val wParked = new java.util.concurrent.CountDownLatch(1)
    val hRelease = new java.util.concurrent.CountDownLatch(1)
    val wRelease = new java.util.concurrent.CountDownLatch(1)
    object SchedStore extends LogStore {
      def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
      def put(p: Path, c: String): Unit = {
        if (p.getFileName.toString == "_CURRENT" &&
            armH.compareAndSet(true, false)) {
          hParked.countDown()
          hRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
        }
        LocalFsLogStore.put(p, c)
      }
      def putIfAbsent(p: Path, c: String): Unit = {
        if (p.getParent != null &&
            p.getParent.getFileName.toString == "_delta_log" &&
            armW.compareAndSet(true, false)) {
          wParked.countDown()
          wRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
        }
        LocalFsLogStore.putIfAbsent(p, c)
      }
      def putFile(s: Path, d: Path): Unit = LocalFsLogStore.putFile(s, d)
      def delete(p: Path): Unit = LocalFsLogStore.delete(p)
      // while H is parked its _LOCK reads infinitely stale, so W's
      // steal is immediate and schedule-forced, not clock-raced
      override def lastModifiedMs(p: Path): Long =
        if (hParked.getCount == 0 && hRelease.getCount > 0 &&
            p.getFileName.toString == "_LOCK") 0L
        else LocalFsLogStore.lastModifiedMs(p)
    }
    LogStores.register(root, SchedStore)
    try {
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val h = new Thread(() =>
        try Sinks.upsertParquet(spark, dir,
          Seq((1L, "H")).toDF("k", "v"), Seq("k"), staleLockMs = 300L,
          maxRetries = 20, txn = Some(("wh", 1L)))
        catch { case t: Throwable => errors.add(t) })
      h.setName("H")
      h.start()
      assert(hParked.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "H never reached its pointer publish")
      armW.set(true)
      val w = new Thread(() =>
        try Sinks.upsertParquet(spark, dir,
          Seq((2L, "W")).toDF("k", "v"), Seq("k"), staleLockMs = 300L,
          maxRetries = 20, txn = Some(("ww", 1L)))
        catch { case t: Throwable => errors.add(t) })
      w.setName("W")
      w.start()
      assert(wParked.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "W never reached its log publish (did it steal the lock?)")
      // H wakes into the poisoned world; W stays parked until H has
      // fully settled, so pre-fix H deterministically WINS the v1 CAS
      hRelease.countDown()
      h.join(240000L)
      assert(!h.isAlive, "H wedged")
      wRelease.countDown()
      w.join(240000L)
      assert(!w.isAlive, "W wedged")
      assert(errors.isEmpty, s"writer failure: ${errors.peek()}")
      val df = Sinks.readDeltaTableAt(spark, dir)
      // collect-bound: 3-row fixture
      val got = df.collect().map(r =>
        r.getLong(df.columns.indexOf("k")) ->
          r.getString(df.columns.indexOf("v"))).toMap
      assert(got == Map(0L -> "seed", 1L -> "H", 2L -> "W"),
        s"lost update: $got")
      val txns = commitFacts(dir).flatMap(_.txn)
      assert(txns.distinct.size == txns.size, s"double-apply: $txns")
      assert(txns.toSet == Set("wh" -> 1L, "ww" -> 1L), txns.toString)
      // pointer read and clean-room reader agree on the settled state
      val ptr = Sinks.readUpsertTable(spark, dir)
      assert(ptr.collect().map(r =>
        r.getLong(ptr.columns.indexOf("k"))).toSet == Set(0L, 1L, 2L))
      assert(ExternalDeltaReader.readRows(spark, dir)._2
        .map(m => m("k").asInstanceOf[Long] ->
          m("v").asInstanceOf[String]).toMap == got)
    } finally LogStores.unregister(root)
  }

  test("DELETE-resurrection residual (deterministic): a stale pointer publish must not resurrect deleted rows") {
    // The round-13 documented residual, now closed by the _BASE stamp:
    // H stages {1->H} against tail v0, moves gen-1, parks BEFORE its
    // pointer publish; a DELETE steals the lock and commits v1 (k=0
    // gone — deletion vectors only, no dir or pointer touched, so H's
    // dir survives). H wakes: its late put leaves the pointer AHEAD of
    // the log naming a dir whose content still carries the deleted
    // row. Pre-fix H's retry (and any other writer) healed that dir in
    // as merge base, resurrecting k=0 with a clean log. Post-fix the
    // dir's stamp (v0) mismatches the tail (v1): it is discarded, the
    // retry re-merges from the logged state, and k=0 stays dead.
    val root = Files.createTempDirectory("delres")
    val dir = root.resolve("t").toString
    Sinks.upsertParquet(spark, dir, Seq((0L, "seed")).toDF("k", "v"),
      Seq("k"))
    val armH = new java.util.concurrent.atomic.AtomicBoolean(true)
    val hParked = new java.util.concurrent.CountDownLatch(1)
    val hRelease = new java.util.concurrent.CountDownLatch(1)
    object SchedStore extends LogStore {
      def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
      def put(p: Path, c: String): Unit = {
        if (p.getFileName.toString == "_CURRENT" &&
            armH.compareAndSet(true, false)) {
          hParked.countDown()
          hRelease.await(30, java.util.concurrent.TimeUnit.SECONDS)
        }
        LocalFsLogStore.put(p, c)
      }
      def putIfAbsent(p: Path, c: String): Unit =
        LocalFsLogStore.putIfAbsent(p, c)
      def putFile(s: Path, d: Path): Unit = LocalFsLogStore.putFile(s, d)
      def delete(p: Path): Unit = LocalFsLogStore.delete(p)
      override def lastModifiedMs(p: Path): Long =
        if (hParked.getCount == 0 && hRelease.getCount > 0 &&
            p.getFileName.toString == "_LOCK") 0L
        else LocalFsLogStore.lastModifiedMs(p)
    }
    LogStores.register(root, SchedStore)
    try {
      val errors =
        new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
      val h = new Thread(() =>
        try Sinks.upsertParquet(spark, dir,
          Seq((1L, "H")).toDF("k", "v"), Seq("k"), staleLockMs = 300L,
          maxRetries = 20, txn = Some(("wh", 1L)))
        catch { case t: Throwable => errors.add(t) })
      h.setName("H")
      h.start()
      assert(hParked.await(120, java.util.concurrent.TimeUnit.SECONDS),
        "H never reached its pointer publish")
      // the DELETE steals H's (instantly-stale) lock and commits v1
      val del = DeletionVectors.deleteDeltaWhere(spark, dir,
        col("k") === 0L)
      assert(del.rowsDeleted == 1L, s"DELETE missed: $del")
      hRelease.countDown()
      h.join(240000L)
      assert(!h.isAlive, "H wedged")
      assert(errors.isEmpty, s"writer failure: ${errors.peek()}")
      val df = Sinks.readDeltaTableAt(spark, dir)
      // collect-bound: 1-row fixture
      val got = df.collect().map(r =>
        r.getLong(df.columns.indexOf("k")) ->
          r.getString(df.columns.indexOf("v"))).toMap
      assert(got == Map(1L -> "H"),
        s"DELETE undone by the stale pointer heal: $got")
      val txns = commitFacts(dir).flatMap(_.txn)
      assert(txns.toSet == Set("wh" -> 1L) &&
        txns.size == 1, txns.toString)
      // pointer read and clean-room reader agree: k=0 stays dead
      val ptr = Sinks.readUpsertTable(spark, dir)
      assert(ptr.collect().map(r =>
        r.getLong(ptr.columns.indexOf("k"))).toSet == Set(1L))
      assert(ExternalDeltaReader.readRows(spark, dir)._2
        .map(m => m("k").asInstanceOf[Long]).toSet == Set(1L))
    } finally LogStores.unregister(root)
  }
}
