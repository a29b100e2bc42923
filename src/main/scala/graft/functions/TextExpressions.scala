package graft.functions

import java.util.regex.Pattern
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
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

/** One-pass full MinHash signature: all `perms` permutation minima over
  * the text's word n-shingles, in a single tokenize→digest→update pass.
  * Value-identical to the explode + `perms`-way min-aggregation
  * formulation (pinned by TextExpressionsSpec) with a fundamentally
  * better plan shape: signature computation becomes a NARROW projection
  * — no explode, no shuffle, no 64-column aggregation buffer — which is
  * the difference between "one pass over the corpus" and "shuffle the
  * corpus's shingles" at 100 TB. Permutation `i` is
  * `(A_i·h + B_i) mod P` over the 32-bit md5-derived base hash `h`
  * (constants shared with the oracle via `Params.minHashA/B/P`).
  * Returns an EMPTY array when the text has fewer than `n` tokens —
  * matching the aggregation formulation, where such docs produce no
  * shingle rows and therefore no output row (callers filter empties). */
case class MinHashSignature(child: Expression, n: Int,
                            as: Seq[Long], bs: Seq[Long], permP: Long)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1 && as.nonEmpty && as.length == bs.length,
    s"invalid shingle width $n / coefficient arrays ${as.length}/${bs.length}")
  private def perms: Int = as.length

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  @transient private lazy val sep: Pattern = Pattern.compile("[^a-z]+")
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")
  @transient private lazy val aArr: Array[Long] = as.toArray
  @transient private lazy val bArr: Array[Long] = bs.toArray

  /** First 8 hex chars of md5 = first 4 bytes, big-endian unsigned —
    * exactly `Params.md5Long(c, 8)` / the oracle's
    * `('0x' || substring(md5(c), 1, 8))::BIGINT`. */
  private def baseHash(s: String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) | ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
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
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val sigs = Array.fill(perms)(Long.MaxValue)
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
      val h = baseHash(sb.toString)
      var p = 0
      while (p < perms) {
        val v = (h * aArr(p) + bArr(p)) % permP
        if (v < sigs(p)) sigs(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sigs)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** One-pass SimHash over a document's DISTINCT tokens: each distinct
  * token votes ±1 on every bit of its md5-derived `bits`-wide hash;
  * the document hash sets bit j where the vote is strictly positive.
  * Value-identical to the explode → per-doc distinct → `bits`-column
  * vote aggregation (pinned by TextExpressionsSpec) with a narrow
  * plan: no token explode, no distinct shuffle, no vote-sum
  * aggregation. NULL for token-less docs — the aggregation form emits
  * no row for them (callers filter). `bits` must be a multiple of 4
  * (the hash is the first `bits/4` md5 hex chars read big-endian; at 64
  * bits that is SIGNED two's complement, matching `Params.md5Long64`
  * and the oracle's `md5Long64Sql`). */
case class SimHash64(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {

  require(bits >= 4 && bits % 4 == 0 && bits <= 64,
    s"bits must be a multiple of 4 in [4, 64], got $bits")

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "simhash64"

  @transient private lazy val sep: Pattern = Pattern.compile("[^a-z]+")
  @transient private lazy val digest = java.security.MessageDigest.getInstance("MD5")

  /** First `bits/4` md5 hex chars parsed base-16 — nibble-exact twin of
    * `conv(substring(md5(t), 1, bits/4), 16, 10)`. */
  private def tokenHash(s: String): Long = {
    digest.reset()
    val d = digest.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val nibbles = bits / 4
    var v = 0L
    var i = 0
    while (i < nibbles) {
      val b = d(i / 2)
      val nib = if (i % 2 == 0) (b >> 4) & 0xf else b & 0xf
      v = (v << 4) | nib
      i += 1
    }
    v
  }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val raw = sep.split(text, -1)
    val seen = new java.util.HashSet[String]()
    val votes = new Array[Int](bits)
    var i = 0
    while (i < raw.length) {
      val t = raw(i)
      if (t.nonEmpty && seen.add(t)) {
        val h = tokenHash(t)
        var j = 0
        while (j < bits) {
          votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    if (seen.isEmpty) return null
    var out = 0L
    var j = 0
    while (j < bits) {
      if (votes(j) > 0) out |= 1L << j
      j += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** `true` iff the text has at least `n` lowercase-alpha tokens — the
  * EARLY-EXIT twin of the tokenizer the sibling expressions share (a
  * maximal `[a-z]+` run of the lowercased text is exactly one nonempty
  * token of the `[^a-z]+` split). Exists so callers can pre-filter
  * short docs CHEAPLY instead of filtering on the derived signature
  * column: Catalyst pushes such a filter below the projection by
  * re-inlining the full expression, so `filter(size(sig) > 0)` priced
  * every doc's complete MinHash/SimHash TWICE (r19 plan evidence:
  * `minhash_signature` appeared in both Filter and Project). This
  * predicate stops scanning at the n-th token. */
case class MinTokens(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, s"token threshold must be >= 1, got $n")

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType
  override def prettyName: String = "min_tokens"

  @transient private lazy val runs: Pattern = Pattern.compile("[a-z]+")

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toString.toLowerCase
    val m = runs.matcher(text)
    var found = 0
    while (found < n && m.find()) found += 1
    found >= n
  }

  override protected def withNewChildInternal(newChild: Expression): MinTokens =
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

  /** `minhash_signature(text, n, A, B, P)`: the full MinHash signature
    * (one long per permutation) in one narrow pass; empty array below
    * `n` tokens. */
  def minhash_signature(c: Column, n: Int, as: Seq[Long], bs: Seq[Long],
                        permP: Long): Column =
    GraftColumnBridge.column(MinHashSignature(
      GraftColumnBridge.expression(c), n, as, bs, permP))

  /** `simhash64(text, bits)`: majority-vote SimHash over distinct tokens
    * in one narrow pass; NULL for token-less text. */
  def simhash64(c: Column, bits: Int): Column =
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(c), bits))

  /** `min_tokens(text, n)`: true iff `text` has >= n lowercase-alpha
    * tokens — the cheap early-exit pre-filter for the signature
    * expressions (false/NULL rows are exactly those whose signature
    * would be empty/NULL). */
  def min_tokens(c: Column, n: Int): Column =
    GraftColumnBridge.column(MinTokens(GraftColumnBridge.expression(c), n))
}
