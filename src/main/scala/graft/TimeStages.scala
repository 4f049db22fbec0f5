package graft
import org.apache.spark.sql.SparkSession

/** Dev utility: time one query end-to-end N times (noop write), printing
  * each rep — for isolating regressions without the full Bench sweep.
  * Usage: runMain graft.TimeStages <queryName> <sfDir> [reps]
  */
object TimeStages {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = args(1)
    val reps = if (args.length > 2) args(2).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val stages = new java.util.concurrent.ConcurrentHashMap[Int, (String, Long)]()
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val si = sc.stageInfo
          val ms = (for {s <- si.submissionTime; c <- si.completionTime}
            yield c - s).getOrElse(0L)
          stages.put(si.stageId, (si.name.take(120), ms))
        }
      })
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      val t1 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"rep $i: build=${(t1 - t0) / 1e9}%.2f s " +
        f"exec=${(t2 - t1) / 1e9}%.2f s total=${(t2 - t0) / 1e9}%.2f s")
      if (i == reps) {
        import scala.jdk.CollectionConverters._
        println("--- slowest stages (this rep included cumulative) ---")
        stages.asScala.toSeq.sortBy(-_._2._2).take(15).foreach {
          case (id, (name, ms)) => println(f"stage $id%4d  $ms%6d ms  $name")
        }
      }
      stages.clear()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
