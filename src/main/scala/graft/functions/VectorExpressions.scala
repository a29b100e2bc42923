package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** `vector_dot(a, b)` — ordered dot product over numeric arrays
  * (float or double elements per side), as a native codegen'd
  * expression.
  *
  * Why not `aggregate(zip_with(a, b, _*_), 0.0, _+_)`: Spark's
  * higher-order functions are CodegenFallback — every element pays
  * interpreted lambda dispatch and boxing, and the composition
  * allocates an intermediate products array per row. This expression
  * is one fused primitive-double loop inside whole-stage codegen: the
  * same win, smaller scale, as `WordShingles` vs the HOF shingle
  * pipeline (TextExpressions scaladoc).
  *
  * Summation is in element order, bit-identical to both the HOF
  * foldLeft it replaces and DuckDB's `list_dot_product` (the oracle
  * twin). Corner semantics deliberately MATCH the HOF composition, so
  * the [[graft.plans.RewriteHofDotProduct]] optimizer rule can swap one
  * for the other without observable change: unequal lengths → null
  * (zip_with pads with null, which poisons the fold) and a null element
  * → null. */
case class VectorDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType): Boolean = dt match {
      case ArrayType(FloatType | DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vector_dot needs array<float|double> args, got " +
        s"${left.dataType.simpleString} / ${right.dataType.simpleString}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vector_dot"

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def mayHaveNullElems: Boolean =
    left.dataType.asInstanceOf[ArrayType].containsNull ||
      right.dataType.asInstanceOf[ArrayType].containsNull

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    val lf = isFloat(left)
    val rf = isFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val xe = if (isFloat(left)) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      val ye = if (isFloat(right)) s"(double) $y.getFloat($i)" else s"$y.getDouble($i)"
      val nullElemCheck = if (mayHaveNullElems)
        s"if ($x.isNullAt($i) || $y.isNullAt($i)) { ${ev.isNull} = true; break; }"
      else ""
      s"""
         |int $n = $x.numElements();
         |if ($y.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $nullElemCheck
         |    $acc += $xe * $ye;
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** `pack_doubles(array<double|float>)` → binary: each element as 8
  * big-endian IEEE-754 bytes (`Double.doubleToLongBits`). The exact,
  * version-proof persistence encoding for trained vector structures
  * (ANN centroids / PQ codebooks) in SSTable cells — a decimal-string
  * round trip would hinge on the engine's float formatting, while the
  * bit pattern IS the value. Null elements refuse loudly: a trained
  * centroid with a null coordinate is a bug upstream, not data. */
case class PackDoubles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"pack_doubles needs array<float|double>, got ${other.simpleString}")
  }
  override def dataType: DataType = BinaryType
  override def prettyName: String = "pack_doubles"

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = java.nio.ByteBuffer.allocate(n * 8)
    var i = 0
    while (i < n) {
      require(!x.isNullAt(i),
        s"pack_doubles: null element at position $i — refusing to encode")
      out.putLong(java.lang.Double.doubleToLongBits(
        if (isFloat) x.getFloat(i).toDouble else x.getDouble(i)))
      i += 1
    }
    out.array()
  }

  // manual big-endian packing — janino (Spark's codegen compiler) fails
  // to resolve java.nio.ByteBuffer statics, so the generated code writes
  // bytes directly; bit-identical to the interpreted path
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val bits = ctx.freshName("bits")
      val j = ctx.freshName("j")
      val elem = if (isFloat) s"(double) $x.getFloat($i)" else s"$x.getDouble($i)"
      s"""
         |int $n = $x.numElements();
         |byte[] $out = new byte[$n * 8];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($x.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "pack_doubles: null element at position " + $i +
         |        " — refusing to encode");
         |  }
         |  long $bits = Double.doubleToLongBits($elem);
         |  for (int $j = 0; $j < 8; $j++) {
         |    $out[$i * 8 + $j] = (byte) ($bits >>> (56 - 8 * $j));
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PackDoubles =
    copy(child = newChild)
}

/** `unpack_doubles(binary)` → array<double>: the exact inverse of
  * [[PackDoubles]]. Refuses a length that is not a multiple of 8 —
  * a truncated cell must fail loudly, never decode as a shorter
  * vector. */
case class UnpackDoubles(child: Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case BinaryType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unpack_doubles needs binary, got ${other.simpleString}")
  }
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "unpack_doubles"

  override def nullSafeEval(a: Any): Any = {
    val bytes = a.asInstanceOf[Array[Byte]]
    require(bytes.length % 8 == 0,
      s"unpack_doubles: ${bytes.length} bytes is not a whole number of " +
        "8-byte doubles — the cell is truncated or not a packed vector")
    val buf = java.nio.ByteBuffer.wrap(bytes)
    val out = new Array[Double](bytes.length / 8)
    var i = 0
    while (i < out.length) { out(i) = java.lang.Double.longBitsToDouble(buf.getLong()); i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, x => {
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val bits = ctx.freshName("bits")
      val out = ctx.freshName("out")
      // manual big-endian unpacking — see PackDoubles.doGenCode (janino
      // cannot resolve the java.nio statics)
      s"""
         |if ($x.length % 8 != 0) {
         |  throw new IllegalArgumentException(
         |    "unpack_doubles: " + $x.length + " bytes is not a whole number " +
         |      "of 8-byte doubles — the cell is truncated or not a packed vector");
         |}
         |double[] $out = new double[$x.length / 8];
         |for (int $i = 0; $i < $out.length; $i++) {
         |  long $bits = 0L;
         |  for (int $j = 0; $j < 8; $j++) {
         |    $bits = ($bits << 8) | (((long) $x[$i * 8 + $j]) & 0xffL);
         |  }
         |  $out[$i] = Double.longBitsToDouble($bits);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): UnpackDoubles =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column wrapper for [[VectorDot]]. */
  def vector_dot(a: Column, b: Column): Column =
    GraftColumnBridge.column(VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))

  /** Column wrappers for [[PackDoubles]] / [[UnpackDoubles]]. */
  def pack_doubles(a: Column): Column =
    GraftColumnBridge.column(PackDoubles(GraftColumnBridge.expression(a)))
  def unpack_doubles(a: Column): Column =
    GraftColumnBridge.column(UnpackDoubles(GraftColumnBridge.expression(a)))
}
