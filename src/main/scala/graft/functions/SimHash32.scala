package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode, FalseLiteral}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftShims
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Codegen'd single-pass 32-bit SimHash fold over a token-hash array —
  * the per-row fingerprint kernel of the streaming near-dup screen
  * ([[graft.streaming.NeardupStream]]) and the narrow sibling of the
  * q15 aggregate form.
  *
  * Semantically IDENTICAL to the built-in higher-order composition the
  * kernel previously used (and which the spec still cross-checks
  * bit-for-bit):
  *
  * {{{
  * (0 until 32).map { b =>
  *   when(aggregate(hs, lit(0),
  *     (acc, h) => acc + when(shiftright(h, b) % 2 === 1, 1).otherwise(-1)) > 0,
  *     1L << b).otherwise(0L)
  * }.reduce(_ + _)
  * }}}
  *
  * including its three contract corners:
  *
  *   - NULL array → fingerprint 0 (each `aggregate` is null, each
  *     `when(null > 0, …).otherwise(0)` contributes 0) — hence
  *     `nullable = false`, never null out;
  *   - NULL element → −1 on every bit (the per-bit `when` falls
  *     through to `otherwise(-1)` on a null comparison);
  *   - negative element → −1 on every bit (`shiftright` is arithmetic,
  *     so `(h >> b) % 2` is 0 or −1 for h < 0, never 1). The upstream
  *     hasher [[graft.queries.TextOps.hsCol]] only emits non-negative
  *     32-bit values, but the expression must agree with the lambda
  *     form on EVERY input, not just well-formed ones.
  *
  * The difference is cost: the lambda form makes 32 INTERPRETED passes
  * over the array (one `aggregate` per bit — higher-order functions
  * never enter whole-stage codegen); this expression makes one
  * codegen'd pass accumulating all 32 bit-sums in a local int[32].
  * Same preference-order rationale as [[DotProduct]] and
  * [[HashedShingles]] (SURVEY §7): built-ins express the semantics but
  * not the evaluation shape. The interpreted `eval` mirrors the
  * generated code exactly for non-codegen contexts.
  */
case class SimHash32(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"requires an array<bigint> input, got ${other.simpleString}")
  }

  override def eval(input: InternalRow): Any = {
    val raw = child.eval(input)
    if (raw == null) return 0L
    val arr = raw.asInstanceOf[ArrayData]
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var b = 0
        while (b < 32) { counts(b) -= 1; b += 1 }
      } else {
        val h = arr.getLong(i)
        if (h < 0L) {
          var b = 0
          while (b < 32) { counts(b) -= 1; b += 1 }
        } else {
          var b = 0
          while (b < 32) {
            counts(b) += (if (((h >>> b) & 1L) == 1L) 1 else -1)
            b += 1
          }
        }
      }
      i += 1
    }
    var fp = 0L
    var b = 0
    while (b < 32) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val counts = ctx.freshName("counts")
    val i = ctx.freshName("i")
    val n = ctx.freshName("n")
    val h = ctx.freshName("h")
    val b = ctx.freshName("b")
    val code =
      code"""
         |${c.code}
         |long ${ev.value} = 0L;
         |if (!${c.isNull}) {
         |  final int[] $counts = new int[32];
         |  final int $n = ${c.value}.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (${c.value}.isNullAt($i)) {
         |      for (int $b = 0; $b < 32; $b++) { $counts[$b]--; }
         |    } else {
         |      final long $h = ${c.value}.getLong($i);
         |      if ($h < 0L) {
         |        for (int $b = 0; $b < 32; $b++) { $counts[$b]--; }
         |      } else {
         |        for (int $b = 0; $b < 32; $b++) {
         |          $counts[$b] += ((($h >>> $b) & 1L) == 1L) ? 1 : -1;
         |        }
         |      }
         |    }
         |  }
         |  for (int $b = 0; $b < 32; $b++) {
         |    if ($counts[$b] > 0) { ${ev.value} |= (1L << $b); }
         |  }
         |}
       """.stripMargin
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash32 =
    copy(child = newChild)

  override def prettyName: String = "simhash32"
}

object SimHash32 {
  /** DataFrame-API entry: `simhash32(col("hs")).as("fp")`. */
  def simhash32(hs: Column): Column =
    graftShims.column(SimHash32(graftShims.expression(hs)))
}
