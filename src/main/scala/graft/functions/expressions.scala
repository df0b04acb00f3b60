package graft.functions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, CodegenFallback, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for the text-dedup hot path.
  *
  * Why expressions and not the built-in higher-order functions: lambda
  * functions (`transform`/`aggregate`) are evaluated interpreted — one
  * boxed invocation per array element — and Catalyst does not share the
  * common md5-shingle subtree across the 12 MinHash signature expressions.
  * Measured at sf0.1 that made signature computation alone cost 51 s.
  * These expressions run one compiled-Scala call per ROW (CodegenFallback
  * is a single invoke; the inner loops are plain JVM code), with
  * [[SortedIntersectSize]] additionally generating a two-pointer codegen
  * loop. Semantics are bit-identical to the HOF formulas they replace
  * (same md5-prefix hash, same constants), so the DuckDB oracles are
  * unchanged except for the explicit distinct+sort on shingle sets.
  */
object TextKernels {

  val P: Long = 2147483647L

  private val digest = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  /** First 4 md5 bytes as unsigned int — identical to parsing the first 8
    * hex chars of md5 (conv(substr(md5(s),1,8),16,10)). Full 32-bit range:
    * bit 31 is meaningful (SimHash depends on it). */
  def rawHash32(s: String): Long = {
    val d = digest.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** [[rawHash32]] reduced mod P (the MinHash domain). NOTE: values are
    * < 2^31, so bit 31 is always 0 — use [[rawHash32]] where the full bit
    * width matters. */
  def hash32(s: String): Long = rawHash32(s) % P

  private val splitter = java.util.regex.Pattern.compile("[^a-z0-9]+")

  /** Lowercased alphanumeric tokens (same as Text.tokens). */
  def tokenize(text: String): Array[String] =
    splitter.split(text.toLowerCase).filter(_.nonEmpty)

  /** FNV-1a 64 over UTF-8 bytes — the cheap per-token hash feeding
    * [[WindowHashes]]' rolling combination (internal prefilter keys
    * only; never crosses an engine boundary). */
  def fnv64(s: String): Long = {
    var h = 0xcbf29ce484222325L
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    while (i < b.length) { h ^= (b(i) & 0xffL); h *= 0x100000001b3L; i += 1 }
    h
  }
}

/** Sorted distinct hash set of word n-gram shingles of a text column.
  * Replaces: array_sort(array_distinct(transform(array_distinct(
  * shingles(tokens(text))), s -> strHash32(s) % P))). */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_shingle_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String].toString)
    if (toks.length < n) new GenericArrayData(Array.empty[Long])
    else {
      val out = new java.util.TreeSet[java.lang.Long]()
      val sb = new java.lang.StringBuilder()
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j)); j += 1
        }
        out.add(TextKernels.hash32(sb.toString))
        i += 1
      }
      val arr = new Array[Long](out.size)
      val it = out.iterator(); var k = 0
      while (it.hasNext) { arr(k) = it.next(); k += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleHashes =
    copy(child = newChild)
}

/** Per-position word n-gram window hashes in DOCUMENT ORDER — one Long
  * per start position, duplicates preserved (unlike [[ShingleHashes]]'
  * sorted distinct set): the bounded-suffix-key stream of the
  * exact-substring dedup prefilter (`Dedup.exactSubstrDedup`).
  * Rabin–Karp rolling combination of per-token FNV-1a 64 hashes in
  * Long wrap arithmetic — O(tokens) per document regardless of n,
  * where the interpreted shingle-string chain allocates O(tokens·n)
  * characters. Prefilter key ONLY: equal token windows hash equal (no
  * false negatives), a collision merely admits a candidate the exact
  * string recheck downstream discards — so the hash never crosses an
  * engine boundary and needs no oracle mirror. */
case class WindowHashes(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_window_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String].toString)
    val m = toks.length
    if (m < n) new GenericArrayData(Array.empty[Long])
    else {
      val th = new Array[Long](m)
      var i = 0
      while (i < m) { th(i) = TextKernels.fnv64(toks(i)); i += 1 }
      val M = 0x9E3779B97F4A7C15L | 1L // odd → invertible mod 2^64
      var mn1 = 1L // M^(n-1) mod 2^64
      i = 1
      while (i < n) { mn1 *= M; i += 1 }
      val out = new Array[Long](m - n + 1)
      var h = 0L
      i = 0
      while (i < n) { h = h * M + th(i); i += 1 }
      out(0) = h
      i = 1
      while (i <= m - n) {
        h = (h - th(i - 1) * mn1) * M + th(i + n - 1)
        out(i) = h
        i += 1
      }
      new GenericArrayData(out)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): WindowHashes =
    copy(child = newChild)
}

/** Per-token RAW 32-bit hashes in document order (multiset — input to
  * SimHash, which needs all 32 bits meaningful; no mod-P reduction). */
case class TokenHashes(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_token_hashes"

  override def nullSafeEval(input: Any): Any = {
    val toks = TextKernels.tokenize(input.asInstanceOf[UTF8String].toString)
    val arr = new Array[Long](toks.length)
    var i = 0
    while (i < toks.length) { arr(i) = TextKernels.rawHash32(toks(i)); i += 1 }
    new GenericArrayData(arr)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenHashes =
    copy(child = newChild)
}

/** k MinHash signatures in one pass over the hash set: sig_i = min over x
  * of (a_i·x + b_i) mod P, 1-based i, constants from Dedup.minhashA/B.
  * Null (no signature) for an empty set. */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<BIGINT>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // an empty hash set evaluates to null regardless of child nullability
  override def nullable: Boolean = true
  override def prettyName: String = "graft_minhash_signature"

  private val as = (1 to k).map(i => graft.ops.Dedup.minhashA(i)).toArray
  private val bs = (1 to k).map(i => graft.ops.Dedup.minhashB(i)).toArray

  override def nullSafeEval(input: Any): Any = {
    val hv = input.asInstanceOf[ArrayData]
    val m = hv.numElements()
    if (m == 0) null
    else {
      val sig = Array.fill(k)(Long.MaxValue)
      var j = 0
      while (j < m) {
        val x = hv.getLong(j)
        var i = 0
        while (i < k) {
          val h = (as(i) * x + bs(i)) % TextKernels.P
          if (h < sig(i)) sig(i) = h
          i += 1
        }
        j += 1
      }
      new GenericArrayData(sig)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** SimHash over a token-hash multiset: bit j of the result is set iff
  * Σ_tokens (bit_j(hash)·2 − 1) > 0. Matches the unrolled HOF formula
  * (x // 2^j % 2) exactly for non-negative hashes. */
case class SimHash(child: Expression, bits: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<BIGINT>, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_simhash"

  override def nullSafeEval(input: Any): Any = {
    val th = input.asInstanceOf[ArrayData]
    val counts = new Array[Int](bits)
    val m = th.numElements()
    var i = 0
    while (i < m) {
      val x = th.getLong(i)
      var j = 0
      while (j < bits) {
        if (((x >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var sim = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) sim |= (1L << j); j += 1 }
    sim
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash =
    copy(child = newChild)
}

/** Intersection size of two SORTED DISTINCT long arrays — two-pointer
  * merge, full whole-stage codegen (no per-call hash set like the
  * built-in array_intersect). */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == LongType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<BIGINT>, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = IntegerType
  override def prettyName: String = "graft_sorted_intersect_size"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    var i = 0; var j = 0; var c = 0
    val xn = x.numElements(); val yn = y.numElements()
    while (i < xn && j < yn) {
      val xv = x.getLong(i); val yv = y.getLong(j)
      if (xv == yv) { c += 1; i += 1; j += 1 }
      else if (xv < yv) i += 1
      else j += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c")
      val xn = ctx.freshName("xn"); val yn = ctx.freshName("yn")
      val xv = ctx.freshName("xv"); val yv = ctx.freshName("yv")
      s"""
         |int $i = 0, $j = 0, $c = 0;
         |final int $xn = $a.numElements(), $yn = $b.numElements();
         |while ($i < $xn && $j < $yn) {
         |  final long $xv = $a.getLong($i);
         |  final long $yv = $b.getLong($j);
         |  if ($xv == $yv) { $c++; $i++; $j++; }
         |  else if ($xv < $yv) { $i++; }
         |  else { $j++; }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

/** All `tables` random-hyperplane LSH bucket ids of a double vector in one
  * compiled pass — bit-identical to Similarity's HOF formula (sequential
  * left-fold projection per plane; plane (t·nbits+b, j) sign =
  * ((g·dim + j)·Mult) mod P mod 2 == 0 ? +1 : −1, j 0-based), which
  * evaluates interpreted per element and per plane (tables·nbits folds of
  * dim boxed lambda calls per row). Signs are precomputed once per plan.
  * Returns ARRAY<BIGINT> of length `tables` (bucket of table t at index t). */
case class LshBuckets(child: Expression, nbits: Int, dim: Int, tables: Int)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType.isInstanceOf[ArrayType] &&
      child.dataType.asInstanceOf[ArrayType].elementType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects ARRAY<DOUBLE>, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_lsh_buckets"

  // signs(g)(j) for plane g = t*nbits + b, vector element j (0-based)
  private lazy val signs: Array[Array[Double]] =
    Array.tabulate(tables * nbits, dim) { (g, j) =>
      if ((g.toLong * dim + j) * graft.ops.Text.Mult % graft.ops.Text.P % 2 == 0) 1.0 else -1.0
    }

  private def signAt(g: Int, j: Int): Double =
    if ((g.toLong * dim + j) * graft.ops.Text.Mult % graft.ops.Text.P % 2 == 0) 1.0 else -1.0

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    // ALL elements, like the HOF spec (which folds the whole array even
    // past the declared dim) — precomputed signs cover j < dim, the
    // formula covers any overhang, so kernel and spec stay bit-identical
    // for every input length
    val n = v.numElements()
    val out = new Array[Long](tables)
    var t = 0
    while (t < tables) {
      var bucket = 0L
      var b = 0
      while (b < nbits) {
        val g = t * nbits + b
        val s = signs(g)
        var proj = 0.0
        var j = 0
        while (j < n) {
          proj += v.getDouble(j) * (if (j < dim) s(j) else signAt(g, j))
          j += 1
        }
        if (proj > 0) bucket |= (1L << b)
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): LshBuckets =
    copy(child = newChild)
}

/** Sequential-left-fold dot product of two double arrays — bit-identical
  * to aggregate(zip_with(a, b, _*_), 0.0, _+_) but one compiled loop
  * (the HOF pair is interpreted per element and dominated the
  * embedding-similarity bench at sf0.1). */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<DOUBLE>, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Exact-semantics fused form of the idiomatic HOF dot product
  * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` — substituted by the
  * [[graft.plans.KernelFusion]] optimizer rule so users who write the
  * idiomatic Spark formulation still execute one compiled loop.
  *
  * Unlike [[DotProduct]] (which contracts to min length for the
  * engine-internal call sites), this replicates the HOF tree's null
  * semantics EXACTLY, as an optimizer substitution must: zip_with pads
  * the shorter array with nulls and a null element nullifies the fold,
  * so ragged lengths or any null element yield NULL. */
case class FusedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(dt: DataType) = dt.isInstanceOf[ArrayType] &&
      dt.asInstanceOf[ArrayType].elementType == DoubleType
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two ARRAY<DOUBLE>, got ${left.dataType}, ${right.dataType}")
  }
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_fused_dot_product"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = x.numElements()
    if (y.numElements() != n) return null
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (x.isNullAt(i) || y.isNullAt(i)) return null
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |final int $n = $a.numElements();
         |double $acc = 0.0;
         |if ($b.numElements() != $n) {
         |  ${ev.isNull} = true;
         |} else {
         |  for (int $i = 0; $i < $n && !${ev.isNull}; $i++) {
         |    if ($a.isNullAt($i) || $b.isNullAt($i)) { ${ev.isNull} = true; }
         |    else { $acc += $a.getDouble($i) * $b.getDouble($i); }
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FusedDotProduct =
    copy(left = newLeft, right = newRight)
}

/** Fused form of the tokenization pipeline
  * `filter(split(lower(text), regex, -1), t => t != "")` — substituted by
  * [[graft.plans.KernelFusion]]. The built-in chain splits compiled but
  * then runs the empty-string filter as an interpreted lambda per array
  * element; this does lowercase → split → drop-empties in one call,
  * reusing the engine's own primitives (UTF8String.toLowerCase, the same
  * java.util.regex split as StringSplit) so results are bit-identical. */
case class Tokenize(child: Expression, regex: String, lowercase: Boolean)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_tokenize"

  @transient private lazy val pattern = java.util.regex.Pattern.compile(regex)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val str = (if (lowercase) s.toLowerCase else s).toString
    val parts = pattern.split(str, -1)
    val out = new Array[Any](parts.length)
    var n = 0
    var i = 0
    while (i < parts.length) {
      if (!parts(i).isEmpty) { out(n) = UTF8String.fromString(parts(i)); n += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out.asInstanceOf[Array[AnyRef]], n))
  }

  override protected def withNewChildInternal(newChild: Expression): Tokenize =
    copy(child = newChild)
}

/** Content-defined chunk boundaries: 1-based END positions i (w ≤ i <
  * len) where the base-31 mod-1e9+7 rolling hash of the w-codepoint
  * window ending at i divides by `divisor`. The boundary predicate is
  * POSITION-LOCAL (a pure function of the w chars in the window), which
  * is the content-defined-chunking robustness property: editing one
  * region moves only that region's boundaries, so downstream chunk-level
  * dedup re-chunks an insertion-shifted document into mostly-identical
  * pieces — unlike fixed-offset chunking, where one inserted byte shifts
  * every boundary after it (Muthitacharoen et al. 2001, LBFS).
  *
  * The window hash is DEFINED as the fold (h·31 + codepoint) mod p over
  * the window — what any engine can replay per position — and COMPUTED
  * here in one O(len) rolling pass (h·31 + c_in − c_out·31^w, mod-kept);
  * the recurrence is exact mod arithmetic, so both routes agree bit for
  * bit. Boundaries at i == len are excluded (a chunk may not be empty).
  */
case class CdcBoundaries(child: Expression, w: Int, divisor: Int)
    extends UnaryExpression with CodegenFallback {
  require(w >= 1 && divisor >= 1, s"bad CDC params: w=$w divisor=$divisor")
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "graft_cdc_boundaries"

  private val P = 1000000007L
  private val powW: Long = {
    var r = 1L; var i = 0
    while (i < w) { r = r * 31 % P; i += 1 }
    r
  }

  override def nullSafeEval(input: Any): Any = {
    val cps = input.asInstanceOf[UTF8String].toString.codePoints().toArray
    val n = cps.length
    if (n < w) new GenericArrayData(Array.empty[Int])
    else {
      val out = new java.util.ArrayList[Integer]()
      var h = 0L
      var i = 0
      while (i < n) {
        h = (h * 31 + cps(i)) % P
        if (i >= w) h = ((h - cps(i - w) * powW) % P + P) % P
        // i is 0-based; the window [i-w+1, i] is full once i >= w-1, and
        // a boundary at the final position would create an empty chunk
        if (i >= w - 1 && i < n - 1 && h % divisor == 0) out.add(i + 1)
        i += 1
      }
      val arr = new Array[Int](out.size)
      var k = 0
      while (k < arr.length) { arr(k) = out.get(k); k += 1 }
      new GenericArrayData(arr)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): CdcBoundaries =
    copy(child = newChild)
}

/** Average-hash (aHash) of a payload string: 64-point stride sample,
  * bits = byte > exact integer mean, packed MSB-first into [hi, lo]
  * 32-bit halves (two BIGINTs — one 64-bit pack would need the sign
  * bit, which DuckDB BIGINT arithmetic throws on). NULL for payloads
  * shorter than 64 bytes (nothing to resize). One compiled pass per
  * row replacing a 64-element transform + three interpreted aggregate
  * folds — the q219 hot path. Bit-identical to the defining HOF chain
  * (same stride, same positions, same strict `>` against the floored
  * mean) the DuckDB oracle still runs.
  *
  * Input contract: printable-ASCII payloads only. The kernel samples
  * UTF-8 BYTES and gates on byte length, while the defining HOF chain
  * (substr/ascii) samples CHARACTERS and gates on character length —
  * the two agree exactly on single-byte (ASCII) input, which is what
  * q219 feeds it (its pipeline strips to printable ASCII first). On
  * multi-byte UTF-8 the byte-level semantics here are the intended
  * ones (a real deploy hashes binary image payloads, where bytes are
  * the only sampling unit), but the bit-identical-to-HOF contract does
  * NOT hold; KernelEquivalenceSpec pins both facts. */
case class AHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_ahash"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[UTF8String].getBytes
    val len = bytes.length
    if (len < 64) return null
    val stride = len / 64
    val s = new Array[Int](64)
    var i = 0
    var total = 0L
    while (i < 64) {
      val b = bytes(i * stride) & 0xff
      s(i) = b
      total += b
      i += 1
    }
    val m = total / 64
    var hi = 0L
    var lo = 0L
    i = 0
    while (i < 32) { hi = hi * 2 + (if (s(i) > m) 1 else 0); i += 1 }
    while (i < 64) { lo = lo * 2 + (if (s(i) > m) 1 else 0); i += 1 }
    new GenericArrayData(Array(hi, lo))
  }

  override protected def withNewChildInternal(newChild: Expression): AHash64 =
    copy(child = newChild)
}

/** Unicode-normalization dedup fingerprint: NFC-normalize, lowercase
  * (ROOT locale), collapse every whitespace run to a single space,
  * trim. The canonical pre-dedup text cleanup — two documents that
  * differ only in composed-vs-decomposed accents (é vs e+́), case, or
  * whitespace layout fingerprint identically. One compiled pass per
  * row (java.text.Normalizer + one regex), replacing a 3-deep nested
  * regexp/lower/normalize expression tree.
  *
  * Cross-engine contract: on ASCII text this is bit-identical to
  * DuckDB's trim(regexp_replace(lower(nfc_normalize(x)), '\s+', ' ',
  * 'g')) — which is what the corpus contains and the q244 oracle
  * pins. On non-ASCII input Java's and utf8proc's lowercase tables
  * agree on all common scripts but may diverge on exotic code points;
  * the NFC merge behavior itself (the reason the operator exists) is
  * pinned engine-side in KernelEquivalenceSpec. */
case class NormText(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_norm_text"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val n = java.text.Normalizer
      .normalize(s, java.text.Normalizer.Form.NFC)
      .toLowerCase(java.util.Locale.ROOT)
      .replaceAll("\\s+", " ")
      .trim
    UTF8String.fromString(n)
  }

  override protected def withNewChildInternal(newChild: Expression): NormText =
    copy(child = newChild)
}

/** Upper-triangle pair products of a numeric vector, quantized to
  * DECIMAL(9,5): element k is round(v_i·10⁵)·round(v_j·10⁵) for the
  * k-th (i<j) pair in row-major order — the covariance audit's (q243)
  * inner loop as ONE compiled pass per row. The interpreted
  * alternative (nested transform lambdas building 2016 structs per
  * row) evaluates per element and measured 8× this expression's
  * runtime at sf1 (kernel stage alone; the q243 query end-to-end
  * moved 3.4× — 24.0 → 6.99 s — because scan + partial-aggregate
  * cost is unchanged by the swap; ops/PairMoments.scala).
  * Quantization matches Spark's double→DECIMAL(9,5) cast
  * (BigDecimal.valueOf + HALF_UP) and therefore DuckDB's
  * CAST(CAST(x AS DECIMAL(9,5))·100000 AS HUGEINT), so the products
  * are the exact scale-10¹⁰ integers the oracle sums. Products of two
  * scale-5 integers bounded by |v| < 10⁴ fit comfortably in a long.
  * Output order is positional: pos p ↔ the p-th pair of the fixed
  * d=64 grid — callers join a broadcast pos→(i,j) map. */
case class PairProducts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType | DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects ARRAY<FLOAT|DOUBLE>, got $other")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_pair_products"

  // lazy (Spark convention for type-derived fields): an eager val would
  // ClassCastException at construction on a wrong-typed or unresolved
  // child, before checkInputDataTypes can report the friendly failure
  private lazy val elemIsFloat =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val u = new Array[Long](n)
    var i = 0
    while (i < n) {
      val d = if (elemIsFloat) arr.getFloat(i).toDouble else arr.getDouble(i)
      // Spark's double→DECIMAL(9,5) cast semantics, unscaled
      u(i) = java.math.BigDecimal.valueOf(d)
        .setScale(5, java.math.RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      i += 1
    }
    val out = new Array[Long](n * (n - 1) / 2)
    var k = 0
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        out(k) = u(i) * u(j)
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): PairProducts =
    copy(child = newChild)
}

/** `graft_char_counts(text)` → array<struct<cp INT, n BIGINT>>, the
  * per-document CODE-POINT histogram sorted by code point — the input
  * to the character-entropy quality gate (q283). One compiled pass per
  * row builds the histogram locally, so downstream explodes are bounded
  * by the document's ALPHABET (≲ a few hundred rows), never its length:
  * the corpus-character-sized shuffle a naive explode(split(text,''))
  * would pay disappears entirely. Unit is the Unicode code point
  * (surrogate pairs count once) — the same unit as DuckDB's
  * `unicode(substr(text, i, 1))`, which the oracle mirrors. */
case class CharCounts(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("cp", IntegerType, nullable = false),
      StructField("n", LongType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "graft_char_counts"

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String].toString
    val m = new java.util.TreeMap[Integer, Long]()
    var i = 0
    while (i < s.length) {
      val cp = s.codePointAt(i)
      m.merge(cp, 1L, (a, b) => a + b)
      i += Character.charCount(cp)
    }
    val out = new Array[Any](m.size)
    val it = m.entrySet().iterator()
    var k = 0
    while (it.hasNext) {
      val e = it.next()
      out(k) = org.apache.spark.sql.catalyst.InternalRow(e.getKey.intValue(), e.getValue)
      k += 1
    }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): CharCounts =
    copy(child = newChild)
}
