package graft

import org.apache.spark.sql.SparkSession

/** Plan audit: print the formatted physical plan for selected queries.
  * Usage: runMain graft.Explain [sfDir] [query ...]
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val names = if (args.length > 1) args.drop(1).toSeq
                else Seq("q12_star_join", "q13_rolling_30d", "q27_ngram_jaccard",
                         "q34_ann_bruteforce", "q01_agg_sum",
                         "q40_embedding_neardup", "q44_global_rank",
                         "q28_minhash_lsh", "q50_payment_split")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"\n========== $n ==========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
