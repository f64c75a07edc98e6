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

/** Per-gram md5 prefix hashes: for each of the `length(s) - k + 1`
  * character-k-grams of a string, the first 8 hex digits of its md5 as a
  * long — the winnowing gram-hash stream ([[graft.pipeline.TextAnalysis
  * .winnowFingerprints]]), value-identical to
  * `conv(substring(md5(s.substr(i+1, k)), 1, 8), 16, 10)` per gram.
  *
  * Why custom (builder-brief preference order (b)): the composed form is a
  * `transform` lambda — interpreted per GRAM, each gram paying a
  * UTF8String slice, a hex-string render of the full digest, a substring,
  * and a base-16 STRING PARSE. At corpus scale that is ~1.5k interpreted
  * lambda evaluations per document (measured 10s at sf0.1). Here the loop
  * is compiled Scala with one reused MessageDigest and no hex round-trip;
  * per-row interpretation overhead (this expression is eval-only) is ONE
  * boxed call per document, not one per gram.
  */
case class Md5GramHashes(child: Expression, k: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(k >= 1, s"k: $k")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val s = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    val nChars = s.numChars()
    val n = nChars - (k - 1)
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    // one-pass codepoint offset table, then each gram digests a byte
    // slice directly — the same bytes per-gram substringSQL would
    // produce, without its walk-from-the-start O(n^2) on multibyte text
    val bytes = s.getBytes
    val offsets = new Array[Int](nChars + 1)
    var ci = 0
    var bi = 0
    while (bi < bytes.length) {
      offsets(ci) = bi
      bi += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(bi))
      ci += 1
    }
    offsets(nChars) = bytes.length
    val md = java.security.MessageDigest.getInstance("MD5")
    val out = new Array[Any](n)
    var i = 0
    while (i < n) {
      md.reset()
      md.update(bytes, offsets(i), offsets(i + k) - offsets(i))
      val d = md.digest()
      // first 8 hex digits == first 4 digest bytes, big-endian unsigned
      out(i) = java.lang.Long.valueOf(
        ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Md5GramHashes =
    copy(child = newChild)
}

/** Rightmost-minimum sliding-window selection over an array<long> — the
  * winnowing rule (Schleimer et al. 2003): for each window of `w`
  * consecutive entries, emit (global index, value) of the RIGHTMOST
  * minimal entry. Value-identical to the composed
  * `slice`/`reverse`/`array_min`/`array_position` formulation, but O(n)
  * via a monotonic deque instead of O(n*w) with four array allocations
  * per window — the other half of the measured winnowing cost.
  */
case class WinnowSelect(child: Expression, w: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(w >= 1, s"w: $w")

  private val structType = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("pos",
      org.apache.spark.sql.types.IntegerType, nullable = false),
    org.apache.spark.sql.types.StructField("fp", LongType, nullable = false)))

  override def dataType: DataType = ArrayType(structType, containsNull = false)

  override def nullSafeEval(v: Any): Any = {
    val a = v.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (n < 1) return new GenericArrayData(Array.empty[Any])
    val nWin = math.max(n - w, 0) + 1
    val out = new Array[Any](nWin)
    // monotonic deque of indices; values strictly increasing front->back.
    // `>=` pop keeps the LATER index on ties == rightmost-min preference.
    val deque = new Array[Int](n)
    var head = 0
    var tail = 0 // exclusive
    var i = 0
    while (i < n) {
      val x = a.getLong(i)
      while (tail > head && a.getLong(deque(tail - 1)) >= x) tail -= 1
      deque(tail) = i; tail += 1
      val t = i - w + 1 // window starting at t ends at i
      if (t >= 0 || i == n - 1) {
        // evict entries left of the window start (clamped for short arrays)
        val start = math.max(t, 0)
        while (deque(head) < start) head += 1
        out(math.max(t, 0)) = org.apache.spark.sql.catalyst.InternalRow(
          deque(head), a.getLong(deque(head)))
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
}

/** Shared Jaro-Winkler kernel, callable from both interpreted eval and
  * generated code. The exact semantics (validated bit-for-bit against
  * DuckDB's `jaro_winkler_similarity` on 9k randomized cases, empty/1-char
  * edges included):
  *   - either side empty -> 0.0 (even both-empty);
  *   - both length 1 -> equal ? 1.0 : 0.0;
  *   - match window = max(l1,l2)/2 - 1 (integer floor, clamped >= 0);
  *   - transpositions t = (mismatched matched positions) / 2, INTEGER div;
  *   - jaro = (m/l1 + m/l2 + (m-t)/m) / 3 in exactly that operand order;
  *   - Winkler boost only when jaro > 0.7: jaro + p*0.1*(1-jaro), common
  *     prefix p capped at 4.
  * Operates on UTF-16 code units (ASCII-safe; matches DuckDB on the
  * Latin-1 surface the star schema uses — supplementary-plane text would
  * count surrogates individually).
  */
object JaroWinklerKernel {
  def similarity(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String): Double = {
    val s1 = ua.toString
    val s2 = ub.toString
    val l1 = s1.length
    val l2 = s2.length
    if (l1 == 0 || l2 == 0) return 0.0
    if (l1 == 1 && l2 == 1) return if (s1.charAt(0) == s2.charAt(0)) 1.0 else 0.0
    val bound = math.max(0, math.max(l1, l2) / 2 - 1)
    val f1 = new Array[Boolean](l1)
    val f2 = new Array[Boolean](l2)
    var m = 0
    var i = 0
    while (i < l1) {
      val c = s1.charAt(i)
      var j = math.max(0, i - bound)
      val hi = math.min(l2, i + bound + 1)
      var found = false
      while (j < hi && !found) {
        if (!f2(j) && s2.charAt(j) == c) {
          f1(i) = true; f2(j) = true; m += 1; found = true
        }
        j += 1
      }
      i += 1
    }
    if (m == 0) return 0.0
    // walk both flag arrays in lockstep counting order mismatches
    var trans = 0
    var j2 = 0
    i = 0
    while (i < l1) {
      if (f1(i)) {
        while (!f2(j2)) j2 += 1
        if (s1.charAt(i) != s2.charAt(j2)) trans += 1
        j2 += 1
      }
      i += 1
    }
    val t = trans / 2
    val md = m.toDouble
    val jaro = (md / l1 + md / l2 + (md - t) / md) / 3.0
    if (jaro > 0.7) {
      var p = 0
      val pmax = math.min(4, math.min(l1, l2))
      while (p < pmax && s1.charAt(p) == s2.charAt(p)) p += 1
      jaro + p * 0.1 * (1.0 - jaro)
    } else jaro
  }
}

/** DEFLATE-compressed byte length of a string (zlib level passed at plan
  * build): the compression-ratio quality signal of Gopher-class corpus
  * filters — template spam and repeated boilerplate compress far below
  * natural text, so `deflated/raw` separates them with zero linguistics.
  *
  * Eval-only (CodegenFallback) by the [[Md5GramHashes]] rule: the work is
  * a compiled-native Deflater pass over the document bytes; one boxed call
  * per ROW is noise against it, and inlining zlib into generated Java buys
  * nothing. No SQL engine exposes deflate, so queries built on this carry
  * no DuckDB oracle (rows-only driver check) — the spec pins determinism
  * and the repetitive-vs-natural ordering instead. Output depends only on
  * the JDK's bundled zlib (stable within a JVM, the comparison is always
  * within-corpus), never on partitioning.
  */
case class DeflateLength(child: Expression, level: Int) extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  require(level >= 1 && level <= 9, s"deflate level: $level")

  override def dataType: DataType = LongType

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    val d = new java.util.zip.Deflater(level)
    try {
      d.setInput(bytes)
      d.finish()
      val buf = new Array[Byte](8192)
      var total = 0L
      while (!d.finished()) total += d.deflate(buf)
      total
    } finally d.end()
  }

  override protected def withNewChildInternal(newChild: Expression): DeflateLength =
    copy(child = newChild)
}

/** True Damerau-Levenshtein distance (Lowrance-Wagner 1975: unrestricted
  * adjacent transpositions, matching DuckDB's `damerau_levenshtein` —
  * 'CA'->'ABC' is 2, where the restricted OSA variant says 3). The edit
  * model real-world typos follow: a swapped character pair costs 1, not
  * the 2 a plain levenshtein charges, which is why record-linkage
  * blocking on keyboard-entered keys wants this kernel over the builtin.
  *
  * Classic O(m*n) DP with the last-occurrence row bookkeeping (`da` per
  * alphabet symbol via a HashMap — unicode-safe, no fixed alphabet). One
  * reused int matrix per call; char access stays on the decoded string.
  */
object DamerauLevenshteinKernel {
  def distance(ua: org.apache.spark.unsafe.types.UTF8String,
      ub: org.apache.spark.unsafe.types.UTF8String): Int = {
    val s1 = ua.toString
    val s2 = ub.toString
    val m = s1.length
    val n = s2.length
    if (m == 0) return n
    if (n == 0) return m
    val inf = m + n
    // matrix is (m+2) x (n+2), flattened; row stride n+2
    val w = n + 2
    val d = new Array[Int]((m + 2) * w)
    d(0) = inf
    var i = 0
    while (i <= m) { d((i + 1) * w) = inf; d((i + 1) * w + 1) = i; i += 1 }
    var j = 0
    while (j <= n) { d(j + 1) = inf; d(w + j + 1) = j; j += 1 }
    val da = new java.util.HashMap[Character, Integer]()
    i = 1
    while (i <= m) {
      var db = 0
      val c1 = s1.charAt(i - 1)
      j = 1
      while (j <= n) {
        val c2 = s2.charAt(j - 1)
        val k: Int = { val v = da.get(c2); if (v == null) 0 else v }
        val l = db
        val cost = if (c1 == c2) { db = j; 0 } else 1
        val sub = d(i * w + j) + cost
        val ins = d((i + 1) * w + j) + 1
        val del = d(i * w + j + 1) + 1
        val tra = d(k * w + l) + (i - k - 1) + 1 + (j - l - 1)
        var best = sub
        if (ins < best) best = ins
        if (del < best) best = del
        if (tra < best) best = tra
        d((i + 1) * w + j + 1) = best
        j += 1
      }
      da.put(c1, i)
      i += 1
    }
    d((m + 1) * w + n + 1)
  }
}

/** [[DamerauLevenshteinKernel]] as a codegen'd binary expression (one
  * static call, whole-stage spans survive — the JaroWinkler seat).
  */
case class DamerauLevenshtein(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.IntegerType

  override def nullSafeEval(l: Any, r: Any): Any =
    DamerauLevenshteinKernel.distance(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.DamerauLevenshteinKernel.distance($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DamerauLevenshtein =
    copy(left = newLeft, right = newRight)
}

/** Jaro-Winkler string similarity as a native binary expression — Spark has
  * no builtin (levenshtein is its only string-distance), and a UDF would
  * break codegen; the generated code is one static call into
  * [[JaroWinklerKernel]] so whole-stage codegen spans survive.
  */
case class JaroWinkler(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = org.apache.spark.sql.types.DoubleType

  override def nullSafeEval(l: Any, r: Any): Any =
    JaroWinklerKernel.similarity(
      l.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      r.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.JaroWinklerKernel.similarity($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): JaroWinkler =
    copy(left = newLeft, right = newRight)
}

object Expressions {

  /** Jaro-Winkler similarity in [0,1] (codegen'd; see [[JaroWinkler]]). */
  def jaroWinkler(a: Column, b: Column): Column =
    GraftSqlBridge.column(
      JaroWinkler(GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** True Damerau-Levenshtein distance (codegen'd; see
    * [[DamerauLevenshtein]]).
    */
  def damerauLevenshtein(a: Column, b: Column): Column =
    GraftSqlBridge.column(DamerauLevenshtein(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  /** DEFLATE-compressed byte length of a string (see [[DeflateLength]]). */
  def deflateLength(s: Column, level: Int = 6): Column =
    GraftSqlBridge.column(DeflateLength(GraftSqlBridge.expression(s), level))
  /** Unicode NFC canonical composition (codegen'd; see [[NormalizeNfc]]). */
  def normalizeNfc(s: Column): Column =
    GraftSqlBridge.column(NormalizeNfc(GraftSqlBridge.expression(s)))

  /** Per-gram md5-prefix hash stream (see [[Md5GramHashes]]). */
  def md5GramHashes(text: Column, k: Int): Column =
    GraftSqlBridge.column(Md5GramHashes(GraftSqlBridge.expression(text), k))

  /** Rightmost-min sliding-window winnowing selection (see [[WinnowSelect]]). */
  def winnowSelect(hashes: Column, w: Int): Column =
    GraftSqlBridge.column(WinnowSelect(GraftSqlBridge.expression(hashes), w))

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
