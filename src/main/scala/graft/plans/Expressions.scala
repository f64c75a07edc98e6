package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expressions for the pairwise similarity hot path.
  *
  * Why custom (builder-brief preference order (b)): `zip_with` + `aggregate`
  * are higher-order functions — evaluated interpretively per row with a
  * lambda-variable box and an intermediate array allocation per pair. At
  * candidate-pair volume (N^2 inside blocks) that interpretation dominates.
  * This expression is a tight primitive loop and participates in whole-stage
  * codegen, with IDENTICAL exact-integer semantics to the composed form
  * (same values -> DuckDB oracles unchanged).
  */
case class LongArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  // internal-use expression: callers guarantee array<long> inputs
  // (Similarity.quantize); no ExpectsInputTypes because AbstractDataType is
  // private[sql] outside the spark package
  override def dataType: DataType = LongType

  /** Contract: element arrays are non-null-element quantized vectors
    * (Similarity.quantize output); shorter length wins on mismatch.
    */
  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var s = 0L
    var i = 0
    while (i < n) { s += a.getLong(i) * b.getLong(i); i += 1 }
    s
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val s = ctx.freshName("s")
      s"""
         |int $n = Math.min($a.numElements(), $b.numElements());
         |long $s = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $s += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $s;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongArrayDot =
    copy(left = newLeft, right = newRight)
}

/** Quantize an array<double> to array<long> via floor(x*scale + 0.5) —
  * the shared vector-quantization recipe of the similarity/clustering
  * family ([[graft.pipeline.Similarity.quantize]]).
  *
  * Why custom (builder-brief preference order (b)): the composed form is
  * `transform(vec, x -> floor(x*scale + 0.5))` — Spark's higher-order
  * functions are CodegenFallback, so every embedding component pays
  * interpreted lambda-variable plumbing, and the expression breaks the
  * whole-stage-codegen span it sits in. This is the per-row dominant cost
  * of quantizing a 100 TB embedding corpus. Bit-identical semantics: the
  * same IEEE multiply/add/floor per element ((SQL FLOOR(double) IS
  * Math.floor), NULL elements propagate as NULL elements.
  */
case class QuantizeDoubles(child: Expression, scale: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = true)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i))
        out(i) = java.lang.Long.valueOf(
          math.floor(a.getDouble(i) * scale + 0.5).toLong)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val arr = ctx.freshName("arr")
      s"""
         |int $n = $a.numElements();
         |Object[] $arr = new Object[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$a.isNullAt($i)) {
         |    $arr[$i] = Long.valueOf((long) Math.floor($a.getDouble($i) * $scale + 0.5));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($arr);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): QuantizeDoubles =
    copy(child = newChild)
}

/** Bit-interleaved z-order key of two non-negative ints (Morton code):
  * bit i of x lands at bit 2i, bit i of y at bit 2i+1, over the low 16 bits
  * of each — a 32-bit space-filling curve key.
  *
  * Why custom (builder-brief preference order (b)): the composed form is a
  * 32-term shift/mask/add chain per row — semantically fine, but the layout
  * writer evaluates it for EVERY row of a 100 TB rewrite, and a codegen'd
  * magic-number spread (the standard Morton bit-twiddle) is ~16x fewer ops.
  * The whole point of the key is data layout: `repartitionByRange` on it
  * co-locates rows that are close in BOTH dimensions, so multi-dimensional
  * range scans prune files on either predicate (the DeltaLake/Iceberg
  * OPTIMIZE ZORDER technique, built from public bit-twiddling only).
  *
  * Inputs outside [0, 2^16) raise: truncating silently would interleave
  * garbage and destroy the locality property the caller is buying.
  */
case class ZOrder16(left: Expression, right: Expression) extends BinaryExpression {

  override def dataType: DataType = LongType

  private def spread(v: Long): Long = {
    // 0x0000xxxx -> one zero bit between each of the 16 payload bits
    var x = v & 0xffffL
    x = (x | (x << 8)) & 0x00ff00ffL
    x = (x | (x << 4)) & 0x0f0f0f0fL
    x = (x | (x << 2)) & 0x33333333L
    x = (x | (x << 1)) & 0x55555555L
    x
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val x = l.asInstanceOf[Long]
    val y = r.asInstanceOf[Long]
    if (x < 0 || x > 0xffffL || y < 0 || y > 0xffffL)
      throw new IllegalArgumentException(
        s"ZOrder16 inputs must be in [0, 65535], got ($x, $y)")
    spread(x) | (spread(y) << 1)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val x = ctx.freshName("x")
      val y = ctx.freshName("y")
      val sp = (v: String) =>
        s"""$v = ($v | ($v << 8)) & 0x00ff00ffL;
           |$v = ($v | ($v << 4)) & 0x0f0f0f0fL;
           |$v = ($v | ($v << 2)) & 0x33333333L;
           |$v = ($v | ($v << 1)) & 0x55555555L;""".stripMargin
      s"""
         |if ($a < 0L || $a > 65535L || $b < 0L || $b > 65535L) {
         |  throw new IllegalArgumentException(
         |    "ZOrder16 inputs must be in [0, 65535], got (" + $a + ", " + $b + ")");
         |}
         |long $x = $a & 0xffffL;
         |long $y = $b & 0xffffL;
         |${sp(x)}
         |${sp(y)}
         |${ev.value} = $x | ($y << 1);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZOrder16 =
    copy(left = newLeft, right = newRight)
}

/** General N-dimensional z-order key: bit i of dimension j lands at output
  * bit i*nDims + j, over `bitsPer` bits per dimension (nDims * bitsPer <=
  * 63, so the key fits a signed long). The 2-dim x 16-bit case stays on
  * [[ZOrder16]]'s magic-number spread (fewer ops on the hottest layout
  * shape); this form covers the rest of the (dims, resolution) plane —
  * 3-dim x 21-bit, 4-dim x 15-bit, coarse 8-dim keys — with one plain
  * codegen'd bit loop (<= 63 iterations, fully unrollable by the JIT).
  *
  * The child is an `array(dim...)` of longs (CreateArray is codegen'd), so
  * the expression stays unary and the arity lives in data — same bridge
  * discipline as [[QuantizeDoubles]]. NULL array or NULL element -> NULL
  * key; out-of-range values raise (truncation would silently destroy the
  * locality the caller is buying — the [[ZOrder16]] argument verbatim).
  */
case class ZOrderArray(child: Expression, nDims: Int, bitsPer: Int)
    extends UnaryExpression {

  require(nDims >= 2, s"nDims: $nDims (a 1-dim z-order is the identity)")
  require(bitsPer >= 1 && nDims * bitsPer <= 63,
    s"nDims * bitsPer must fit a signed long: $nDims * $bitsPer")

  override def dataType: DataType = LongType

  // the child array (CreateArray) is itself never null, but a null ELEMENT
  // yields a NULL key — without this override codegen plants a FalseLiteral
  // isNull and the null silently materializes as 0
  override def nullable: Boolean = true

  private val limit = 1L << bitsPer

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() != nDims)
      throw new IllegalArgumentException(
        s"ZOrderArray expects $nDims dims, got ${a.numElements()}")
    var out = 0L
    var j = 0
    while (j < nDims) {
      if (a.isNullAt(j)) return null
      val x = a.getLong(j)
      if (x < 0L || x >= limit)
        throw new IllegalArgumentException(
          s"ZOrderArray dim $j out of [0, $limit): $x")
      var i = 0
      while (i < bitsPer) {
        out |= ((x >> i) & 1L) << (i * nDims + j)
        i += 1
      }
      j += 1
    }
    out
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val x = ctx.freshName("x")
      val out = ctx.freshName("out")
      s"""
         |if ($a.numElements() != $nDims) {
         |  throw new IllegalArgumentException(
         |    "ZOrderArray expects $nDims dims, got " + $a.numElements());
         |}
         |long $out = 0L;
         |for (int $j = 0; $j < $nDims && !${ev.isNull}; $j++) {
         |  if ($a.isNullAt($j)) { ${ev.isNull} = true; break; }
         |  long $x = $a.getLong($j);
         |  if ($x < 0L || $x >= ${limit}L) {
         |    throw new IllegalArgumentException(
         |      "ZOrderArray dim " + $j + " out of [0, ${limit}): " + $x);
         |  }
         |  for (int $i = 0; $i < $bitsPer; $i++) {
         |    $out |= (($x >> $i) & 1L) << ($i * $nDims + $j);
         |  }
         |}
         |${ev.value} = $out;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): ZOrderArray =
    copy(child = newChild)
}

/** Unicode NFC normalization of a string — the canonicalization step that
  * belongs UPSTREAM of every hash-based text operator here: "é" as one
  * codepoint and "e"+combining-acute are different byte strings (different
  * md5, different shingles, different dedup verdict) for the same rendered
  * text, and a 100 TB web corpus contains both encodings of everything.
  *
  * Why custom (builder-brief preference order (b)): Spark has NO unicode
  * normalization builtin — the alternatives are a black-box Scala UDF
  * (breaks codegen, opaque to Catalyst) or shipping text to Python. This is
  * a one-call codegen'd expression around the JDK's java.text.Normalizer
  * (ICU-equivalent NFC tables); NULL propagates like any unary expression.
  * DuckDB's nfc_normalize() applies the same canonical composition, which
  * is what makes oracle parity possible at all.
  */
case class NormalizeNfc(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.StringType

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    org.apache.spark.unsafe.types.UTF8String.fromString(
      java.text.Normalizer.normalize(s.toString, java.text.Normalizer.Form.NFC))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"""
         |${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($a.toString(),
         |    java.text.Normalizer.Form.NFC));
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): NormalizeNfc =
    copy(child = newChild)
}

object Expressions {
  /** Unicode NFC canonical composition (codegen'd; see [[NormalizeNfc]]). */
  def normalizeNfc(s: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(s)))

  /** Exact-integer dot product of two array<long> columns (codegen'd). */
  def longArrayDot(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      LongArrayDot(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** 32-bit Morton z-order key of two long columns in [0, 2^16) (codegen'd). */
  def zorder16(x: Column, y: Column): Column =
    GraftSqlBridge.column(
      ZOrder16(GraftSqlBridge.expression(x.cast("long")),
        GraftSqlBridge.expression(y.cast("long"))))

  /** floor(x*scale + 0.5) per element, array<double> -> array<long>
    * (codegen'd).
    */
  def quantizeDoubles(vec: Column, scale: Int): Column =
    GraftSqlBridge.column(
      QuantizeDoubles(GraftSqlBridge.expression(vec.cast("array<double>")), scale))

  /** General N-dim z-order key over long columns in [0, 2^bitsPer)
    * (codegen'd; nDims * bitsPer <= 63). zorderN(16, x, y) equals
    * [[zorder16]] bit-for-bit — the 2x16 case just has a faster spread.
    */
  def zorderN(bitsPer: Int, dims: Column*): Column = {
    require(dims.size >= 2, s"need >= 2 dims, got ${dims.size}")
    GraftSqlBridge.column(ZOrderArray(
      GraftSqlBridge.expression(
        org.apache.spark.sql.functions.array(dims.map(_.cast("long")): _*)),
      dims.size, bitsPer))
  }
}
