package graft

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite

/** Coverage pin: every reference dbt model and every reference staging
  * domain (`models.sql`) is cited somewhere in `src/main/scala` — so a
  * refactor that drops a port (or its citation) fails loudly instead of
  * silently shrinking coverage.
  */
class CoverageSpec extends AnyFunSuite {

  private val refRoot = Paths.get("/root/reference")

  private def walk(p: Path): Seq[Path] =
    if (!Files.exists(p)) Seq.empty
    else {
      val stream = Files.walk(p)
      try stream.iterator.asScala.toSeq finally stream.close()
    }

  private lazy val sources: String = {
    val root = Paths.get("src/main/scala")
    walk(root).filter(_.toString.endsWith(".scala"))
      .map(f => new String(Files.readAllBytes(f), "UTF-8"))
      .mkString("\n")
  }

  test("every reference dbt model is cited in the source tree") {
    val models = walk(refRoot.resolve("dbt_bigquery/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    val missing = models.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited dbt models: ${missing.mkString(", ")}")
  }

  test("every reference dbt_postgres model is cited in the source tree") {
    // The PG project mirrors dbt_bigquery model-for-model today (61 names,
    // all shared), so the BigQuery citations already cover it — this walk
    // pins that: a future PG-ONLY model in the reference fails here
    // instead of slipping past the BigQuery-side check.
    val models = walk(refRoot.resolve("dbt_postgres/models"))
      .filter(_.toString.endsWith(".sql"))
      .map(_.getFileName.toString.stripSuffix(".sql"))
    assume(models.nonEmpty, "reference checkout not present")
    val missing = models.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited dbt_postgres models: ${missing.mkString(", ")}")
  }

  test("every reference staging domain is cited in the source tree") {
    val core = refRoot.resolve("src/linkmerce/core")
    val domains = walk(core)
      .filter(_.getFileName.toString == "models.sql")
      .map(p => core.relativize(p.getParent).toString)
    assume(domains.nonEmpty, "reference checkout not present")
    val missing = domains.filterNot(sources.contains)
    assert(missing.isEmpty,
      s"uncited staging domains: ${missing.mkString(", ")}")
  }
}
