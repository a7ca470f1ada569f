package graft.functions

import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd Unicode NFC normalization (canonical decomposition, then
  * canonical composition) — the text-hygiene primitive every corpus
  * pipeline runs before tokenization or dedup: the same visible string
  * can arrive as precomposed `é` (U+00E9) or decomposed `e`+`◌́`
  * (U+0065 U+0301), and without normalization the two spellings hash,
  * shingle, and join as DIFFERENT documents — silently splitting
  * near-dup clusters and vocabulary counts. Spark ships no normalizer
  * function; this wraps the JDK's `java.text.Normalizer` (ICU-derived,
  * Unicode-conformant) as a null-intolerant unary expression whose
  * generated code is one static call — it stays inside whole-stage
  * codegen like the other `graft_*` scalars (SURVEY §4.3).
  *
  * The JVM and DuckDB (`nfc_normalize`) implement the same Unicode
  * normalization spec, which is what makes the query over this
  * expression oracle-addressable cross-engine.
  *
  * Scale: per-row pure function, no state, no shuffle — embarrassingly
  * parallel at any scale. The common fast path (already-NFC ASCII) is
  * `Normalizer.isNormalized`'s quick check inside the JDK.
  */
case class Nfc(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_nfc"

  override protected def nullSafeEval(input: Any): Any =
    Nfc.normalize(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Nfc.normalize($c)")

  override protected def withNewChildInternal(newChild: Expression): Nfc =
    copy(child = newChild)
}

object Nfc {
  /** Static helper the generated code calls — UTF8String in/out so the
    * codegen'd call site needs no boxing decisions. */
  def normalize(s: UTF8String): UTF8String = {
    val str = s.toString
    if (Normalizer.isNormalized(str, Normalizer.Form.NFC)) s
    else UTF8String.fromString(Normalizer.normalize(str, Normalizer.Form.NFC))
  }

  /** Column-API entry point. */
  def nfc(c: Column): Column = ColumnBridge.column(Nfc(ColumnBridge.expression(c)))
}
