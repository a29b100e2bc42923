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

object TextExpressions {
  /** `word_shingles(text, n)`: lowercase-alpha word n-gram shingles of a
    * text column, joined by single spaces. */
  def word_shingles(c: Column, n: Int): Column =
    GraftColumnBridge.column(WordShingles(GraftColumnBridge.expression(c), n))
}
