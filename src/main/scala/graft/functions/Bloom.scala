package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types._

/** Bloom filter over 64-bit hashes, built driver-side and shipped as a
  * BINARY literal — the scan-level prefilter for membership tests
  * against a set that is large for a join build side but small as
  * bits (the same shape as Spark's own InjectRuntimeFilter, made
  * explicit and composable). At ~10 bits/element (k=7, FP ≈ 0.8%) the
  * filter is 15–20× smaller than a broadcast-join hash relation of the
  * same set, and the probe is k bit-tests inside the scan's generated
  * code — the overwhelmingly-negative majority of rows dies before any
  * explode/join output row ever materializes. One-sided: NO false
  * negatives (a member is never rejected), so an exact confirm join on
  * the survivors yields exactly the un-prefiltered result.
  *
  * Serialized form: Int k, then the bit array byte-granular (m = 8 ×
  * (len − 4) bits). Probing reads single bytes — no word parsing, no
  * per-row allocation.
  */
object Bloom {
  /** Size the filter at `bitsPerItem` bits/element (10 → FP ≈ 0.8%) and
    * the optimal k = round(bits/item · ln 2), capped to [1, 15]. */
  def build(hashes: Iterator[Long], nItems: Long, bitsPerItem: Int): Array[Byte] = {
    require(nItems >= 0 && bitsPerItem >= 4 && bitsPerItem <= 24,
      s"bad bloom spec: $nItems items at $bitsPerItem bits")
    val m = math.max(64L, nItems * bitsPerItem)
    // a JVM byte array caps at ~2^31 — fail with a sizing message, not a
    // wrapped-negative allocation (2^31 bytes ≈ 1.7e9 items at 10 bits)
    require(m / 8 + 4 <= Int.MaxValue.toLong,
      s"bloom of $nItems items x $bitsPerItem bits exceeds a single array; " +
        "shard the filter or lower bitsPerItem")
    val nBytes = ((m + 7) / 8).toInt
    val k = math.min(15, math.max(1, math.round(bitsPerItem * math.log(2.0)).toInt))
    val out = new Array[Byte](4 + nBytes)
    out(0) = (k >>> 24).toByte; out(1) = (k >>> 16).toByte
    out(2) = (k >>> 8).toByte; out(3) = k.toByte
    hashes.foreach { h => set(out, h) }
    out
  }

  private def mix(h: Long): Long = {
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  private def set(bytes: Array[Byte], h: Long): Unit = {
    val k = readK(bytes)
    val m = (bytes.length - 4).toLong * 8L
    val h1 = mix(h)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % m
      val idx = 4 + (bit >>> 3).toInt
      bytes(idx) = (bytes(idx) | (1 << (bit & 7L).toInt)).toByte
      i += 1
    }
  }

  private def readK(bytes: Array[Byte]): Int =
    ((bytes(0) & 0xff) << 24) | ((bytes(1) & 0xff) << 16) |
      ((bytes(2) & 0xff) << 8) | (bytes(3) & 0xff)

  /** Static probe — also the codegen target (called from generated
    * Java), so eval and codegen share one definition. */
  def contains(bytes: Array[Byte], h: Long): Boolean = {
    val k = readK(bytes)
    val m = (bytes.length - 4).toLong * 8L
    val h1 = mix(h)
    val h2 = mix(h1) | 1L
    var i = 0
    while (i < k) {
      val bit = ((h1 + i * h2) & Long.MaxValue) % m
      if (((bytes(4 + (bit >>> 3).toInt) >>> (bit & 7L).toInt) & 1) == 0)
        return false
      i += 1
    }
    true
  }
}

/** `graft_bloom_contains(bloom, hash)` → BOOLEAN membership probe.
  * `bloom` is normally a BINARY literal from [[Bloom.build]]; the probe
  * stays inside whole-stage codegen as a static call on the plan-
  * referenced byte array. */
case class BloomContains(left: Expression, right: Expression)
    extends BinaryExpression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, BIGINT), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = BooleanType
  override def prettyName: String = "graft_bloom_contains"

  override def nullSafeEval(bloom: Any, h: Any): Any =
    Bloom.contains(bloom.asInstanceOf[Array[Byte]], h.asInstanceOf[Long])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, h) =>
      s"${ev.value} = graft.functions.Bloom.contains($b, $h);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}
