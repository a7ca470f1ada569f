package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd word n-gram construction: array<string> of tokens → the
  * len−n+1 space-joined consecutive n-grams.
  *
  * Semantically identical to the HOF chain the dedup/decontamination
  * queries would otherwise use —
  * `zip_with(w, slice(w, 2, size(w)), concat_ws(" ", _, _))` stacked
  * n−1 deep, sliced to drop the padded tail — but Spark evaluates
  * higher-order functions INTERPRETED (per-element lambda dispatch,
  * one intermediate array per layer). This expression is one tight
  * generated loop, no intermediate arrays, so the n-gram hot path of
  * the shingle/repetition/decontamination family stays inside
  * whole-stage codegen (same justification as [[DotProduct]]; SURVEY
  * §4.3). Registered for SQL as `graft_ngrams` via GraftExtensions.
  *
  * Null semantics: null input array → null; null ELEMENTS are skipped
  * by the join exactly like `concat_ws` (token arrays from
  * split+filter never contain nulls in practice).
  */
case class NGrams(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, "n-gram width must be >= 1")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<string>, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_ngrams"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val out = arr.numElements() - n + 1
    if (out <= 0) new GenericArrayData(Array.empty[Any])
    else {
      val sep = UTF8String.fromString(" ")
      val res = new Array[Any](out)
      var i = 0
      while (i < out) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = arr.getUTF8String(i + j); j += 1 }
        res(i) = UTF8String.concatWs(sep, parts: _*)
        i += 1
      }
      new GenericArrayData(res)
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val utf8 = classOf[UTF8String].getName
      val gad = classOf[GenericArrayData].getName
      val sep = ctx.addReferenceObj("ngramSep", UTF8String.fromString(" "), utf8)
      val out = ctx.freshName("out")
      val res = ctx.freshName("res")
      val parts = ctx.freshName("parts")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      s"""
         |final int $out = $c.numElements() - $n + 1;
         |if ($out <= 0) {
         |  ${ev.value} = new $gad(new Object[0]);
         |} else {
         |  Object[] $res = new Object[$out];
         |  $utf8[] $parts = new $utf8[$n];
         |  for (int $i = 0; $i < $out; $i++) {
         |    for (int $j = 0; $j < $n; $j++) {
         |      $parts[$j] = $c.getUTF8String($i + $j);
         |    }
         |    $res[$i] = $utf8.concatWs($sep, $parts);
         |  }
         |  ${ev.value} = new $gad($res);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {
  /** Column-API entry point: consecutive space-joined word n-grams. */
  def ngrams(c: Column, n: Int): Column =
    ColumnBridge.column(NGrams(ColumnBridge.expression(c), n))
}
