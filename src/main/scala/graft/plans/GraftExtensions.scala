package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** SparkSessionExtensions entry point: registers graft's native expressions
  * AND the model registry as SQL-callable table functions, so both
  * `spark.sql("SELECT graft_dot(a, b)")` and
  * `spark.sql("SELECT * FROM profit_mom('1996-01-01', '1996-06-30')")`
  * work next to the Scala Column API — the SQL spelling of the
  * reference's parameterized-view surface
  * (dbt_bigquery/macros/materializations.sql:14-17 materializes models as
  * table functions over (start_date, end_date);
  * dbt_postgres/macros/table_functions.sql:9-90 generates the
  * `CREATE FUNCTION … RETURNS TABLE` form).
  *
  * Enable with:
  * `SparkSession.builder.config("spark.sql.extensions", "graft.plans.GraftExtensions")`
  * (or `GraftSession.builder()`). Model TVFs resolve their source data
  * from the `spark.graft.data.dir` session conf at ANALYSIS time, so one
  * session can repoint between fixture scales without re-registering.
  *
  * Argument convention (positional, matching the reference's TVFs):
  * zero args = no params; two args = `(ds_start_date, ds_end_date)`;
  * 2·n args (n > 1) = explicit `(key, value, key, value, …)` pairs for
  * models with a wider param surface. Names that are not valid SQL
  * identifiers (the few `a/b/c`-namespaced ports) register with
  * non-identifier characters mapped to `_`.
  *
  * This is the full extension surface the engine needs: no custom parser
  * rules, optimizer rules, or strategies are required for parity (SURVEY
  * §4 — Catalyst built-ins cover the reference's optimizations); the
  * genuine extension points are the vector-expression hot path, the
  * Unicode text-hygiene scalars, and this TVF binding.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (children: Seq[Expression]) => {
        require(children.length == 2, "graft_dot(a, b) takes 2 arguments")
        DotProduct(children.head, children(1))
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfc"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_nfc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfc(s) takes 1 argument")
        UnicodeNormalize(children.head, "NFC")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_nfkc"),
      new ExpressionInfo(classOf[UnicodeNormalize].getName, "graft_nfkc"),
      (children: Seq[Expression]) => {
        require(children.length == 1, "graft_nfkc(s) takes 1 argument")
        UnicodeNormalize(children.head, "NFKC")
      }))
    ext.injectFunction((
      FunctionIdentifier("graft_fix_mojibake"),
      new ExpressionInfo(classOf[MojibakeRepair].getName,
        "graft_fix_mojibake"),
      (children: Seq[Expression]) => {
        require(children.length == 1,
          "graft_fix_mojibake(s) takes 1 argument")
        MojibakeRepair(children.head)
      }))
    GraftExtensions.modelFunctionNames.foreach { case (fnName, model) =>
      ext.injectTableFunction((
        FunctionIdentifier(fnName),
        new ExpressionInfo("graft.models", fnName),
        (args: Seq[Expression]) =>
          GraftExtensions.modelPlan(model, args)))
    }
    // Delta-log table functions: `delta_at(path[, version])` time-travels
    // a generational MERGE table through its transaction log alone, and
    // `delta_range(path, col, lo, hi)` answers a range predicate with
    // stats-based file skipping — the SQL spelling of
    // Sinks.readDeltaTableAt / readDeltaTablePruned.
    ext.injectTableFunction((
      FunctionIdentifier("delta_at"),
      new ExpressionInfo("graft.sources", "delta_at"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2,
          "delta_at(path[, version]) takes 1 or 2 arguments")
        val path = GraftExtensions.litValue(args(0), "delta_at", 1).toString
        val v = if (args.length == 2)
          GraftExtensions.litValue(args(1), "delta_at", 2) match {
            case n: Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"delta_at version must be numeric, got $other")
          }
        else Long.MaxValue
        graft.sources.Sinks.readDeltaTableAt(SparkSession.active, path, v)
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("delta_count"),
      new ExpressionInfo("graft.sources", "delta_count"),
      (args: Seq[Expression]) => {
        require(args.nonEmpty && args.length <= 2,
          "delta_count(path[, version]) takes 1 or 2 arguments")
        val path = GraftExtensions.litValue(args(0), "delta_count", 1)
          .toString
        val v = if (args.length == 2)
          GraftExtensions.litValue(args(1), "delta_count", 2) match {
            case n: Number => n.longValue()
            case other => throw new IllegalArgumentException(
              s"delta_count version must be numeric, got $other")
          }
        else Long.MaxValue
        val spark = SparkSession.active
        val n = graft.sources.Sinks.deltaTableCount(spark, path, v)
          .getOrElse(throw new IllegalStateException(
            s"$path has live files without numRecords stats — " +
              "metadata count would be partial; use count(*) over " +
              "delta_at instead"))
        spark.range(1).select(
          org.apache.spark.sql.functions.lit(n).as("n_rows"))
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("delta_history"),
      new ExpressionInfo("graft.sources", "delta_history"),
      (args: Seq[Expression]) => {
        require(args.length == 1, "delta_history(path) takes 1 argument")
        val path = GraftExtensions.litValue(args(0), "delta_history", 1)
          .toString
        graft.sources.Sinks.deltaHistory(SparkSession.active, path)
          .queryExecution.logical
      }))
    ext.injectTableFunction((
      FunctionIdentifier("delta_range"),
      new ExpressionInfo("graft.sources", "delta_range"),
      (args: Seq[Expression]) => {
        require(args.length == 4,
          "delta_range(path, col, lo, hi) takes 4 arguments")
        val path = GraftExtensions.litValue(args(0), "delta_range", 1).toString
        val colName = GraftExtensions.litValue(args(1), "delta_range", 2).toString
        val lo = GraftExtensions.litValue(args(2), "delta_range", 3)
        val hi = GraftExtensions.litValue(args(3), "delta_range", 4)
        graft.sources.Sinks.readDeltaTablePruned(SparkSession.active,
          path, colName, lo, hi).queryExecution.logical
      }))
  }
}

object GraftExtensions {

  /** (sql function name, model name) for every registered model — names
    * are stable across data dirs (the registry's build closures bind the
    * dir; its name list does not). First registration wins on a sanitize
    * collision (none exist today; pinned by ExtensionsSpec).
    */
  private[graft] lazy val modelFunctionNames: Seq[(String, String)] =
    graft.models.Analytics.registry("").names
      .map(n => n.replaceAll("[^A-Za-z0-9_]", "_") -> n)
      .foldLeft(Vector.empty[(String, String)]) { (acc, kv) =>
        if (acc.exists(_._1 == kv._1)) acc else acc :+ kv
      }

  /** Evaluate a foldable TVF argument to an external JVM value (Catalyst
    * internals like UTF8String / date ints are converted).
    */
  private[plans] def litValue(e: Expression, fn: String, i: Int): Any = {
    require(e.foldable, s"$fn argument $i must be a literal")
    val v = e.eval()
    require(v != null, s"$fn argument $i is null")
    e.dataType match {
      case org.apache.spark.sql.types.StringType => v.toString
      case org.apache.spark.sql.types.DateType =>
        org.apache.spark.sql.catalyst.util.DateTimeUtils
          .daysToLocalDate(v.asInstanceOf[Int]).toString
      case _ => v
    }
  }

  /** Resolve one model TVF invocation to its logical plan. Runs at
    * analysis time: arguments must be foldable literals (the reference's
    * TVFs are invoked with literal dates too).
    */
  private def modelPlan(model: String, args: Seq[Expression]): LogicalPlan = {
    val spark = SparkSession.active
    val dir = spark.conf.get("spark.graft.data.dir", "")
    require(dir.nonEmpty,
      s"model function '$model' needs the data location: " +
        """spark.conf.set("spark.graft.data.dir", <fixture dir>)""")
    val lits = args.zipWithIndex.map { case (e, i) =>
      require(e.foldable,
        s"model function '$model' argument ${i + 1} must be a literal")
      val v = e.eval()
      require(v != null, s"model function '$model' argument ${i + 1} is null")
      e.dataType match {
        case org.apache.spark.sql.types.DateType =>
          org.apache.spark.sql.catalyst.util.DateTimeUtils
            .daysToLocalDate(v.asInstanceOf[Int]).toString
        case _ => v.toString
      }
    }
    val params = lits.length match {
      case 0 => graft.models.Params()
      case 2 => graft.models.Params(Map(
        "ds_start_date" -> lits(0), "ds_end_date" -> lits(1)))
      case n if n % 2 == 0 => graft.models.Params(
        lits.grouped(2).map(p => p.head -> p(1)).toMap)
      case _ => throw new IllegalArgumentException(
        s"model function '$model' takes 0 args, (start, end), or " +
          s"(key, value, …) pairs — got ${lits.length}")
    }
    graft.models.Analytics.registry(dir).run(model, spark, params)
      .queryExecution.logical
  }
}
