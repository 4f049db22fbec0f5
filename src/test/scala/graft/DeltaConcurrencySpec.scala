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

  test("steal-storm: 20 jittered histories with aggressive stale windows stay linearizable") {
    // random pauses INSIDE the critical section (before pointer/version
    // publishes) with staleLockMs shorter than the pause: lock steals
    // happen ORGANICALLY here, exercising the fence + FAE-retry + heal
    // machinery under arbitrary interleavings — the deterministic steal
    // cases above pin one window each, this sweeps the rest. Writers
    // own DISJOINT key ranges so per-key linearizability is checkable
    // without modeling cross-writer merge order under heals (heal
    // commits re-log a crashed generation without its txn, so the
    // log-replay adjudication of the no-steal histories does not apply).
    final class JitterStore(seed: Int) extends LogStore {
      private val rnd = new java.util.Random(seed)
      private def jitter(): Unit = {
        val (hit, ms) = this.synchronized(
          (rnd.nextInt(6) == 0, 150 + rnd.nextInt(150)))
        if (hit) Thread.sleep(ms.toLong)
      }
      def createNew(p: Path): Unit = LocalFsLogStore.createNew(p)
      def put(p: Path, c: String): Unit = {
        jitter(); LocalFsLogStore.put(p, c) }
      def putIfAbsent(p: Path, c: String): Unit = {
        jitter(); LocalFsLogStore.putIfAbsent(p, c) }
      def putFile(s: Path, d: Path): Unit = LocalFsLogStore.putFile(s, d)
      def delete(p: Path): Unit = LocalFsLogStore.delete(p)
    }
    def runStorm(seed: Int): Unit = {
      val root = Files.createTempDirectory(s"storm-$seed")
      val dir = root.resolve("t").toString
      LogStores.register(root, new JitterStore(seed))
      try {
        val errors =
          new java.util.concurrent.ConcurrentLinkedQueue[Throwable]()
        val writers = 3
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
          new Thread(() =>
            try (0L until batchesPer).foreach { i =>
              Sinks.upsertParquet(spark, dir, batch(w, i).toDF("k", "v"),
                Seq("k"), maxRetries = 60, staleLockMs = 120L,
                txn = Some((s"w$w", i)))
            } catch { case t: Throwable => errors.add(t) })
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
      val futs = (1 to 20).map { s =>
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
}
