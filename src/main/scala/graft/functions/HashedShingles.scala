package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, UnaryExpression, XXH64}
import org.apache.spark.sql.graftShims
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst `Generator`: emit the xxhash64 of every DISTINCT
  * k-word shingle of a (lowercased, space-tokenized) text column — one
  * output row per distinct shingle, column `hs: long`.
  *
  * Semantically identical to the built-in composition
  * `explode(array_distinct(transform(seq, i -> concat_ws(" ",
  * slice(filter(split(lower(text), " "), …), i, k)))))` followed by
  * `xxhash64(s)`, and verified row-for-row against it in the spec
  * (same tokenizer, same separator, same xxhash64 seed 42 over the
  * identical UTF-8 bytes). The difference is cost: the built-in chain
  * evaluates a lambda expression tree per shingle (interpreted — no
  * whole-stage codegen for higher-order functions) and materializes
  * the token array, every slice, every concatenated string, and the
  * distinct array per row; this generator makes ONE pass over the
  * string with a reusable buffer and emits 8-byte hashes.
  *
  * This is the one place in the library where the preference order of
  * SURVEY §7 reaches a custom Expression: built-ins express the
  * semantics but cannot express the single-pass evaluation. The
  * operator stays a narrow `Generate` (no shuffle, no UDF object
  * round-trip); `CodegenFallback` is standard for generators — the
  * surrounding projections still codegen.
  */
case class HashedShingles(child: Expression, k: Int)
  extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType =
    StructType(StructField("hs", LongType, nullable = false) :: Nil)

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && k >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"requires a string child and k >= 1 (got ${child.dataType}, k=$k)")

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val raw = child.eval(input)
    if (raw == null) return Nil
    // same lowercase as SQL lower(): UTF8String.toLowerCase
    val text = raw.asInstanceOf[UTF8String].toLowerCase.toString
    // same tokens as filter(split(text, " "), t -> length(t) > 0):
    // split on single spaces, drop empties
    val toks = new scala.collection.mutable.ArrayBuffer[String](64)
    var start = 0
    var i = 0
    val n = text.length
    while (i <= n) {
      if (i == n || text.charAt(i) == ' ') {
        if (i > start) toks += text.substring(start, i)
        start = i + 1
      }
      i += 1
    }
    if (toks.length < k) return Nil
    val seen = new java.util.HashSet[java.lang.Long](toks.length * 2)
    val out = new scala.collection.mutable.ArrayBuffer[InternalRow](toks.length)
    val sb = new java.lang.StringBuilder(64)
    var j = 0
    while (j <= toks.length - k) {
      sb.setLength(0)
      var m = 0
      while (m < k) {
        if (m > 0) sb.append(' ')
        sb.append(toks(j + m))
        m += 1
      }
      // identical bytes + seed as SQL xxhash64(shingle_string)
      val u = UTF8String.fromString(sb.toString)
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      if (seen.add(h)) out += InternalRow(h)
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): HashedShingles =
    copy(child = newChild)

  override def prettyName: String = "hashed_shingles"
}

object HashedShingles {
  /** DataFrame-API entry: `hashedShingles(col("text"), 3).as("hs")`. */
  def hashedShingles(text: Column, k: Int = 3): Column =
    graftShims.column(HashedShingles(graftShims.expression(text), k))
}
