package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KLL quantile sketch (Karnin, Lang, Liberty 2016, "Optimal Quantile
  * Approximation in Streams") — the RE-AGGREGATABLE quantile estimate
  * that completes the materialized-sketch cube family (HLL/KMV for NDV,
  * Misra–Gries for heavy hitters, KLL for quantiles): per-partition /
  * per-day sketches are materialized once and ROLLED UP with
  * [[KllMergeAgg]], so percentiles over any group combination never
  * rescan raw data — at 100 TB the difference between reading a few KiB
  * of sketch per partition and a full-corpus sort.
  *
  * Structure: geometrically-capacity-decayed levels; level i holds items
  * of weight 2^i. A full level sorts and promotes every other item to
  * level i+1. Compaction parity alternates via a per-sketch counter, so
  * a fixed input order yields ONE fixed sketch (no RNG — estimates are
  * reproducible run to run for a fixed merge tree; across merge orders
  * they stay inside the rank-error bound, which is what the q77 bounds
  * booleans assert). Rank error ≈ O(1/k) with k = 256 default (~1%
  * observed; the oracle contract grants 5%).
  *
  * Serialized form (also the BINARY column format): Int k, Long n,
  * Long compactions, Int numLevels, then per level Int size + doubles.
  */
object Kll {
  import scala.collection.mutable.ArrayBuffer

  final class Buffer(val k: Int) {
    val levels: ArrayBuffer[ArrayBuffer[Double]] = ArrayBuffer(new ArrayBuffer[Double])
    var n: Long = 0L
    var compactions: Long = 0L

    /** Capacity of level i decays geometrically (2/3 per level below the
      * top), floored at 8 — the KLL memory/error trade. */
    private def capacity(i: Int): Int = {
      val depth = levels.size - 1 - i
      math.max(8, (k * math.pow(2.0 / 3.0, depth.toDouble)).toInt)
    }

    def update(v: Double): Unit = {
      levels(0) += v
      n += 1
      compress()
    }

    def mergeFrom(other: Buffer): Buffer = {
      while (levels.size < other.levels.size) levels += new ArrayBuffer[Double]
      var i = 0
      while (i < other.levels.size) {
        levels(i) ++= other.levels(i)
        i += 1
      }
      n += other.n
      compactions += other.compactions
      compress()
      this
    }

    private def compress(): Unit = {
      var i = 0
      while (i < levels.size) {
        val lvl = levels(i)
        if (lvl.size >= capacity(i) && lvl.size >= 2) {
          val sorted = lvl.sorted
          // odd size: the last (max) item is the unpaired leftover and
          // stays at this level — total item weight is preserved exactly,
          // so Σ weight·count == n stays an invariant, not an expectation
          val even = sorted.size - (sorted.size % 2)
          if (i + 1 >= levels.size) levels += new ArrayBuffer[Double]
          val offset = (compactions & 1L).toInt // alternating keep-parity
          compactions += 1
          var j = offset
          while (j < even) {
            levels(i + 1) += sorted(j)
            j += 2
          }
          lvl.clear()
          if (even < sorted.size) lvl += sorted(even)
        }
        i += 1
      }
    }

    /** Weighted items as (value, weight) pairs, unsorted. */
    def weighted(): Array[(Double, Long)] = {
      val out = Array.newBuilder[(Double, Long)]
      var i = 0
      while (i < levels.size) {
        val w = 1L << i
        levels(i).foreach(v => out += (v -> w))
        i += 1
      }
      out.result()
    }
  }

  def toBytes(buf: Buffer): Array[Byte] = {
    val sizes = buf.levels.map(_.size)
    val bb = ByteBuffer.allocate(4 + 8 + 8 + 4 + 4 * sizes.size + 8 * sizes.sum)
    bb.putInt(buf.k); bb.putLong(buf.n); bb.putLong(buf.compactions)
    bb.putInt(buf.levels.size)
    buf.levels.foreach { lvl =>
      bb.putInt(lvl.size)
      lvl.foreach(bb.putDouble)
    }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Buffer = {
    require(bytes.length >= 24, s"malformed KLL sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    buf.n = bb.getLong
    buf.compactions = bb.getLong
    val numLevels = bb.getInt
    var i = 0
    while (i < numLevels) {
      if (i >= buf.levels.size) buf.levels += new scala.collection.mutable.ArrayBuffer[Double]
      val sz = bb.getInt
      var j = 0
      while (j < sz) { buf.levels(i) += bb.getDouble; j += 1 }
      i += 1
    }
    buf
  }

  /** Quantile estimate from serialized sketch bytes: the smallest
    * retained value whose cumulative weight reaches q·n. Null (None) on
    * an empty sketch. */
  def quantile(bytes: Array[Byte], q: Double): Option[Double] = {
    if (bytes.isEmpty) return None
    val buf = fromBytes(bytes)
    if (buf.n == 0) return None
    require(q >= 0.0 && q <= 1.0, s"quantile must be in [0,1], got $q")
    val items = buf.weighted().sortBy(_._1)
    val target = math.max(1L, math.ceil(q * buf.n).toLong)
    var cum = 0L
    var i = 0
    while (i < items.length) {
      cum += items(i)._2
      if (cum >= target) return Some(items(i)._1)
      i += 1
    }
    Some(items.last._1)
  }
}

/** `graft_kll_sketch(col[, k])` → BINARY mergeable quantile sketch
  * (default k=256; rank error ~1%, granted 5% by the oracle contract). */
case class KllSketchAgg(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kll.Buffer] {

  require(k >= 16, s"k must be >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == DoubleType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects DOUBLE, got ${child.dataType}")

  override def createAggregationBuffer(): Kll.Buffer = new Kll.Buffer(k)

  override def update(buf: Kll.Buffer, input: InternalRow): Kll.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.update(v.asInstanceOf[Double])
    buf
  }

  override def merge(a: Kll.Buffer, b: Kll.Buffer): Kll.Buffer = a.mergeFrom(b)
  override def eval(buf: Kll.Buffer): Any = Kll.toBytes(buf)
  override def serialize(buf: Kll.Buffer): Array[Byte] = Kll.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Kll.Buffer = Kll.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllSketchAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllSketchAgg =
    copy(child = newChildren.head)
}

/** `graft_kll_merge(sketchCol)` — rollup over materialized BINARY
  * sketches. "No sketches seen" serializes as the zero-length sentinel
  * (same contract as [[KmvMergeAgg]]); mixed k merges keep the SMALLER
  * k's error bound implicitly (capacities are per-sketch). */
case class KllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Kll.Buffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")

  override def createAggregationBuffer(): Option[Kll.Buffer] = None

  private def mergeBufs(a: Option[Kll.Buffer], b: Kll.Buffer): Option[Kll.Buffer] =
    a match {
      case None                    => Some(b)
      case Some(x) if x.k <= b.k   => Some(x.mergeFrom(b))
      case Some(x)                 => Some(b.mergeFrom(x)) // keep the smaller k
    }

  override def update(buf: Option[Kll.Buffer], input: InternalRow): Option[Kll.Buffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      if (bytes.isEmpty) buf else mergeBufs(buf, Kll.fromBytes(bytes))
    }
  }

  override def merge(a: Option[Kll.Buffer], b: Option[Kll.Buffer]): Option[Kll.Buffer] =
    b.fold(a)(bb => mergeBufs(a, bb))

  override def eval(buf: Option[Kll.Buffer]): Any =
    buf.fold(Array.emptyByteArray)(Kll.toBytes)
  override def serialize(buf: Option[Kll.Buffer]): Array[Byte] =
    buf.fold(Array.emptyByteArray)(Kll.toBytes)
  override def deserialize(bytes: Array[Byte]): Option[Kll.Buffer] =
    if (bytes.isEmpty) None else Some(Kll.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KllMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_kll_quantile(sketch, q)` → DOUBLE estimate (NULL on the empty
  * sentinel — a merge over zero sketches has no quantiles). */
case class KllQuantile(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == DoubleType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, DOUBLE), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_kll_quantile"
  override def nullSafeEval(sk: Any, q: Any): Any =
    Kll.quantile(sk.asInstanceOf[Array[Byte]], q.asInstanceOf[Double]).orNull
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KllQuantile =
    copy(left = newLeft, right = newRight)
}
