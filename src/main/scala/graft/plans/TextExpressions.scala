package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftx.bridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for Unicode text hygiene — the repair pass a
  * training-data pipeline runs before any tokenization or hashing, since a
  * decomposed `e` + COMBINING ACUTE and a precomposed `é` hash apart and a
  * mojibake'd document poisons every downstream n-gram. Spark has no
  * built-in Unicode normalizer and the zero-UDF rule holds, so these are
  * SURVEY §7-case custom expressions: scalar, codegen'd, inside
  * whole-stage codegen (same pattern as [[DotProduct]]).
  */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"unknown normalization form: $form")

  override def dataType: DataType = StringType
  override def prettyName: String = s"graft_${form.toLowerCase}"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      "org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($c.toString(), " +
        s"java.text.Normalizer.Form.$form))")

  override protected def withNewChildInternal(newChild: Expression)
      : UnicodeNormalize = copy(child = newChild)
}

/** Latin-1 mojibake repair: a UTF-8 document decoded as ISO-8859-1 turns
  * every multi-byte character into a lead char in U+00C2–U+00EF followed by
  * continuation chars in U+0080–U+00BF (`é` → `Ã©`). The repair re-reads
  * those code points as the UTF-8 bytes they were.
  *
  * The rule is deliberately a CLOSED FORM, not a charset round-trip, so an
  * independent SQL engine can replay it value-for-value: the string must
  * match `(ASCII | [C2-DF][80-BF] | [E0-EC EE EF][80-BF]{2})*` and contain
  * at least one lead — anything else (already-clean text, chars above
  * U+00FF, dangling continuations, ED leads whose decode would be a UTF-16
  * surrogate, 4-byte/astral forms) passes through UNCHANGED. ASCII is a
  * fixed point, so the pass is safe to run unconditionally. Windows-1252
  * mojibake (`â€”`) is out of scope — its chars exceed U+00FF and pass
  * through untouched.
  */
case class MojibakeRepair(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def prettyName: String = "graft_fix_mojibake"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${t.catalogString}")
  }

  override def nullSafeEval(v: Any): Any =
    Mojibake.repair(v.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.Mojibake.repair($c)")

  override protected def withNewChildInternal(newChild: Expression)
      : MojibakeRepair = copy(child = newChild)
}

object Mojibake {
  private def isCont(c: Char): Boolean = c >= 0x80 && c <= 0xBF
  private def isLead2(c: Char): Boolean = c >= 0xC2 && c <= 0xDF
  private def isLead3(c: Char): Boolean =
    c >= 0xE0 && c <= 0xEF && c != 0xED

  /** See [[MojibakeRepair]] for the exact rule. Called from codegen. */
  def repair(s: UTF8String): UTF8String = {
    val str = s.toString
    val n = str.length
    var hasLead = false
    var i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < 0x80) i += 1
      else if (isLead2(c)) {
        if (i + 1 >= n || !isCont(str.charAt(i + 1))) return s
        hasLead = true; i += 2
      } else if (isLead3(c)) {
        if (i + 2 >= n || !isCont(str.charAt(i + 1)) ||
          !isCont(str.charAt(i + 2))) return s
        hasLead = true; i += 3
      } else return s
    }
    if (!hasLead) return s
    val sb = new java.lang.StringBuilder(n)
    i = 0
    while (i < n) {
      val c = str.charAt(i)
      if (c < 0x80) { sb.append(c); i += 1 }
      else if (c <= 0xDF) {
        sb.append((((c & 0x1F) << 6) | (str.charAt(i + 1) & 0x3F)).toChar)
        i += 2
      } else {
        sb.append((((c & 0x0F) << 12) | ((str.charAt(i + 1) & 0x3F) << 6) |
          (str.charAt(i + 2) & 0x3F)).toChar)
        i += 3
      }
    }
    UTF8String.fromString(sb.toString)
  }
}

object TextExpressions {
  /** Unicode-normalize a string column; `form` ∈ NFC/NFD/NFKC/NFKD.
    * NFC is SQL-oracle-replayable (DuckDB `nfc_normalize`); the
    * compatibility forms are spec-anchored.
    */
  def normalize(c: Column, form: String = "NFC"): Column =
    bridge.column(UnicodeNormalize(bridge.expression(c), form))

  /** Repair Latin-1 mojibake (see [[MojibakeRepair]] for the closed-form
    * rule); clean text and ASCII are fixed points.
    */
  def fixMojibake(c: Column): Column =
    bridge.column(MojibakeRepair(bridge.expression(c)))
}
