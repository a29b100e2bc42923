package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text expressions for the hot tokenize/shingle path.
  *
  * The declarative composition `transform(sequence(...),
  * concat_ws(element_at(toks, …)))` is correct but Spark evaluates
  * higher-order functions interpreted, per element, through Column
  * machinery — measured 17 s just to shingle 50k docs at sf0.1. This
  * expression computes the same result in one pass of plain JVM code
  * (precompiled regex, single StringBuilder), cutting the full-corpus
  * MinHash signature query ~2×. Semantics are pinned to the HOF
  * composition by TextExpressionsSpec (bit-identical outputs) so the
  * DuckDB oracle twins stay valid.
  *
  * (Per SURVEY.md §2.7 the preference order is built-ins → native
  * Expression → UDF; this is the one measured-hot spot that justifies
  * the Expression tier. CodegenFallback is fine: HOFs don't codegen
  * either, and the win is avoiding per-element dispatch, not codegen.)
  */
case class WordShingles(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  @transient private lazy val sep: Pattern = Pattern.compile("[^a-z]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    // same tokenization as filter(split(lower(text), "[^a-z]+"), _ != "")
    val raw = sep.split(text, -1)
    var m = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(m) = raw(i); m += 1 }
      i += 1
    }
    if (m < n) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](m - n + 1)
    i = 0
    while (i <= m - n) {
      val sb = new java.lang.StringBuilder(32)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      out(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** One-pass `min(md5(shingle))` over a text column — the 1-permutation
  * MinHash fingerprint. Equals
  * `array_min(transform(shingles(toks(text)), sh => md5(sh)))` (pinned by
  * TextExpressionsSpec) but never materializes the shingle array or goes
  * through per-element interpreted HOF dispatch: tokenize once, hash each
  * shingle into a reused digest, track the min hex string. This was the
  * bench's slowest query on the HOF path (VERDICT r1 wrong-#2). NULL when
  * fewer than `n` tokens (caller coalesces). */
case class MinShingleHash(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"shingle width must be >= 1, got $n")

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "min_shingle_hash"

  @transient private lazy val sep: Pattern = Pattern.compile("[^a-z]+")
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5hex(s: String): String = {
    digest.reset()
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val out = new Array[Char](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xf)
      out(2 * i + 1) = HexChars(d(i) & 0xf)
      i += 1
    }
    new String(out)
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val raw = sep.split(text, -1)
    var m = 0
    val toks = new Array[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) { toks(m) = raw(i); m += 1 }
      i += 1
    }
    if (m < n) return null
    var best: String = null
    val sb = new java.lang.StringBuilder(48)
    i = 0
    while (i <= m - n) {
      sb.setLength(0)
      var k = 0
      while (k < n) {
        if (k > 0) sb.append(' ')
        sb.append(toks(i + k))
        k += 1
      }
      val h = md5hex(sb.toString)
      if (best == null || h.compareTo(best) < 0) best = h
      i += 1
    }
    UTF8String.fromString(best)
  }

  override protected def withNewChildInternal(newChild: Expression): MinShingleHash =
    copy(child = newChild)
}

object TextExpressions {
  /** `word_shingles(text, n)`: lowercase-alpha word n-gram shingles of a
    * text column, joined by single spaces. */
  def word_shingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n))

  /** `min_shingle_hash(text, n)`: min md5-hex over the n-word shingles of
    * `text`; NULL when the text has fewer than n tokens. */
  def min_shingle_hash(c: Column, n: Int): Column =
    GraftColumnBridge.column(MinShingleHash(GraftColumnBridge.expression(c), n))
}
