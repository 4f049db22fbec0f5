package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.operators.TextAnalysis
import graft.plans.{Mojibake, TextExpressions => TX}

/** Unicode text-hygiene operators: script profiling, normalization
  * expressions, latin-1 mojibake repair. All non-ASCII content is written
  * as unicode escapes so the source is byte-unambiguous.
  */
class TextHygieneSpec extends SparkSpec {

  test("scriptProfile: per-script ratios, dominant, mixed-script gate") {
    import spark.implicits._
    val ru = "\u041F\u0440\u0438\u0432\u0435\u0442 \u043C\u0438\u0440" // cyrillic, 9 letters + 1 space
    val zh = "\u4F60\u597D\u4E16\u754C" // han, 4 letters
    val docs = Seq(
      (1L, "plain english text only"),
      (2L, ru),
      (3L, zh),
      (4L, "half english " + ru + " " + ru),
      (5L, "123 !!! ...")).toDF("doc_id", "text")
    val out = TextAnalysis.scriptProfile(docs, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getAs[String]("dominant"),
          r.getAs[Boolean]("keep"),
          r.getAs[Double]("latin_ratio"),
          r.getAs[Double]("cyrillic_ratio"))).toMap
    assert(out(1L)._2 == "latin" && out(1L)._3)
    assert(out(2L)._2 == "cyrillic" && out(2L)._3)
    assert(out(2L)._4 == 0.0 && out(2L)._5 == 1.0)
    assert(out(3L)._2 == "han" && out(3L)._3)
    // doc 4: 11 latin letters vs 18 cyrillic -> cyrillic dominant and
    // 18/29 > 0.5 keeps; ratios divide the exact long counts
    assert(out(4L)._2 == "cyrillic" && out(4L)._3)
    assert(out(4L)._4 == 11.0 / 29.0 && out(4L)._5 == 18.0 / 29.0)
    assert(out(5L) == ((0L, "none", false, 0.0, 0.0)),
      "no letters: dominant=none, keep=false")
  }

  test("UnicodeNormalize: NFC composes, NFKC folds compatibility forms") {
    import spark.implicits._
    val df = Seq(
      (1L, "Cafe\u0301"),   // e + combining acute
      (2L, "\uFB01rst \u2460 \uFF21")     // fi-ligature, circled 1, fullwidth A
    ).toDF("id", "s")
    val out = df.select(col("id"), TX.normalize(col("s")).as("nfc"),
        TX.normalize(col("s"), "NFKC").as("nfkc"))
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2))).toMap
    assert(out(1L) == (("Caf\u00E9", "Caf\u00E9")))
    assert(out(2L)._1 == "\uFB01rst \u2460 \uFF21", "NFC keeps compat chars")
    assert(out(2L)._2 == "first 1 A", "NFKC folds them")
    // SQL registration is covered in ExtensionsSpec (needs a fresh
    // session built withExtensions)
  }

  test("fixMojibake: repairs 2- and 3-byte forms; fixed points hold") {
    def fix(s: String): String =
      Mojibake.repair(UTF8String.fromString(s)).toString
    // 2-byte: e-acute U+00E9 mojibakes to C3 A9; a-grave to C3 A0;
    // i-diaeresis to C3 AF
    assert(fix("caf\u00C3\u00A9 d\u00C3\u00A9j\u00C3\u00A0 na\u00C3\u00AFve") == "caf\u00E9 d\u00E9j\u00E0 na\u00EFve")
    // 3-byte: em dash U+2014 = E2 80 94, curly quotes U+201C/U+201D
    assert(fix("a\u00E2\u0080\u0094b \u00E2\u0080\u009Cq\u00E2\u0080\u009D") == "a\u2014b \u201Cq\u201D")
    // fixed points: pure ASCII, dangling continuation, bare lead,
    // chars above U+00FF (windows-1252 mojibake), ED-lead forms whose
    // decode would be a UTF-16 surrogate
    for (s <- Seq("plain ascii", "dangl\u00A9ing", "lead \u00C3 end",
        "a\u00E2\u20ACb", "\u00ED\u00A0\u0080", "")) {
      assert(fix(s) == s, s"must pass through: $s")
    }
    // the Column path agrees with the helper
    import spark.implicits._
    val df = Seq((1L, "x\u00C3\u00A9y")).toDF("id", "s")
    assert(df.select(TX.fixMojibake(col("s"))).head.getString(0)
      == "x\u00E9y")
  }

  test("hygiene expressions stay inside whole-stage codegen") {
    // non-foldable input (derived from range id) so neither constant
    // folding nor local-relation collapse evaluates the expressions
    // driver-side \u2014 the assert proves the CODEGEN path computes them
    val df = spark.range(2)
      .select(when(col("id") === 0, "a\u00C3\u00A9")
        .otherwise("Cafe\u0301").as("s"))
      .select(TX.normalize(TX.fixMojibake(col("s"))).as("t"))
    val wsc = df.queryExecution.executedPlan.collect {
      case w: org.apache.spark.sql.execution.WholeStageCodegenExec => w
    }
    assert(wsc.nonEmpty, df.queryExecution.executedPlan.toString)
    val got = df.collect().map(_.getString(0)).sorted
    assert(got.toSeq == Seq("Caf\u00E9", "a\u00E9"))
  }
}
