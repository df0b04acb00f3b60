package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** KMV (k-minimum-values / bottom-k) sketch: keeps the k smallest
  * DISTINCT hash values of a column. Complements the HLL family with the
  * estimate HLL cannot give — SET OVERLAP between two materialized
  * sketches (Jaccard / intersection cardinality, e.g. audience overlap
  * across 100 TB partitions without a distinct-join):
  *
  *  - distinct estimate: (k−1)/θ where θ = k-th smallest hash as a
  *    fraction of hash space (exact count while under k distinct values)
  *  - Jaccard(A, B): among the bottom-k of A ∪ B, the fraction present
  *    in both sketches (Beyer et al. 2007, "On Synopses for Distinct-
  *    Value Estimation Under Multiset Operations")
  *
  * The hash is the fixed splitmix64 finalizer shared with HLL, so every
  * estimate is DETERMINISTIC — merge order, partitioning, and rollup
  * shape cannot change it (bottom-k of a union is associative and
  * idempotent). Hashes are compared UNSIGNED.
  *
  * Serialized form (also the BINARY column format): Int k, Int n,
  * n longs sorted ascending unsigned.
  */
object Kmv {
  def flip(h: Long): Long = h ^ Long.MinValue // unsigned order as signed

  /** Mutable bottom-k distinct set over sign-flipped hashes. */
  final class Buffer(val k: Int) {
    val set = new java.util.TreeSet[java.lang.Long]()
    def offer(flipped: Long): Unit = {
      if (set.size < k) { set.add(flipped); () }
      else if (flipped < set.last()) {
        if (set.add(flipped)) set.pollLast()
        ()
      }
    }
    def mergeFrom(other: Buffer): Buffer = {
      other.set.forEach(v => offer(v))
      this
    }
  }

  def toBytes(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(8 + 8 * buf.set.size)
    bb.putInt(buf.k); bb.putInt(buf.set.size)
    buf.set.forEach(v => { bb.putLong(v); () })
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Buffer = {
    require(bytes.length >= 8 && (bytes.length - 8) % 8 == 0,
      s"malformed KMV sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val buf = new Buffer(bb.getInt)
    val n = bb.getInt
    var i = 0
    while (i < n) { buf.offer(bb.getLong); i += 1 }
    buf
  }

  /** Distinct-count estimate from serialized sketch bytes (0 for the
    * empty-sentinel sketch). */
  def estimate(bytes: Array[Byte]): Long = {
    if (bytes.isEmpty) return 0L
    require(bytes.length >= 8, s"malformed KMV sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val k = bb.getInt; val n = bb.getInt
    if (n < k) n.toLong // sketch holds every distinct hash seen
    else {
      var kth = 0L
      var i = 0
      while (i < n) { kth = bb.getLong; i += 1 }
      // stored values are sign-FLIPPED hashes: unsigned magnitude
      // u = stored + 2^63; θ = u / 2^64
      val theta = (kth.toDouble + math.pow(2.0, 63)) / math.pow(2.0, 64)
      math.round((k - 1) / theta)
    }
  }

  /** Jaccard estimate between two sketches: fraction of the union's
    * bottom-min(kA,kB) present in both (0.0 if either is the empty
    * sentinel). */
  def jaccard(a: Array[Byte], b: Array[Byte]): Double = {
    if (a.isEmpty || b.isEmpty) return 0.0
    val ba = fromBytes(a); val bb = fromBytes(b)
    val k = math.min(ba.k, bb.k)
    val union = new java.util.TreeSet[java.lang.Long]()
    union.addAll(ba.set); union.addAll(bb.set)
    var inBoth = 0; var seen = 0
    val it = union.iterator()
    while (it.hasNext && seen < k) {
      val v = it.next()
      if (ba.set.contains(v) && bb.set.contains(v)) inBoth += 1
      seen += 1
    }
    if (seen == 0) 0.0 else inBoth.toDouble / seen
  }
}

/** `graft_kmv_sketch(col[, k])` → BINARY bottom-k sketch (default k=1024,
  * ~8 KiB; relative NDV error ≈ 1/√(k−2) ≈ 3%). */
case class KmvSketch(
    child: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Kmv.Buffer] {

  require(k >= 16, s"k must be >= 16, got $k")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")

  override def createAggregationBuffer(): Kmv.Buffer = new Kmv.Buffer(k)

  override def update(buf: Kmv.Buffer, input: InternalRow): Kmv.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.offer(Kmv.flip(HllDistinct.hash64(v.asInstanceOf[Long])))
    buf
  }

  override def merge(a: Kmv.Buffer, b: Kmv.Buffer): Kmv.Buffer = a.mergeFrom(b)
  override def eval(buf: Kmv.Buffer): Any = Kmv.toBytes(buf)
  override def serialize(buf: Kmv.Buffer): Array[Byte] = Kmv.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Kmv.Buffer = Kmv.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvSketch =
    copy(child = newChildren.head)
}

/** `graft_kmv_merge(sketchCol)` — union rollup over BINARY sketches
  * (bottom-k of the union; result k = min of the inputs' k). */
case class KmvMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Kmv.Buffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_kmv_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")

  override def createAggregationBuffer(): Option[Kmv.Buffer] = None

  private def mergeBufs(a: Option[Kmv.Buffer], b: Kmv.Buffer): Option[Kmv.Buffer] =
    a match {
      case None => Some(b)
      case Some(x) if x.k <= b.k => Some(x.mergeFrom(b))
      case Some(x) =>
        // result k must be the SMALLER k — rebuild at b's k, then merge x in
        val nb = new Kmv.Buffer(b.k)
        nb.mergeFrom(b)
        Some(nb.mergeFrom(x))
    }

  override def update(buf: Option[Kmv.Buffer], input: InternalRow): Option[Kmv.Buffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      // empty sentinel (a merge of zero sketches) carries no information
      if (bytes.isEmpty) buf else mergeBufs(buf, Kmv.fromBytes(bytes))
    }
  }

  override def merge(a: Option[Kmv.Buffer], b: Option[Kmv.Buffer]): Option[Kmv.Buffer] =
    b.fold(a)(bb => mergeBufs(a, bb))

  // "no sketches seen" serializes as a ZERO-LENGTH sentinel and round-
  // trips back to None — it must never look like a real low-k sketch, or
  // an empty partition in a partial aggregation would silently contract
  // the whole merged result to that k
  override def eval(buf: Option[Kmv.Buffer]): Any =
    buf.fold(Array.emptyByteArray)(Kmv.toBytes)
  override def serialize(buf: Option[Kmv.Buffer]): Array[Byte] =
    buf.fold(Array.emptyByteArray)(Kmv.toBytes)
  override def deserialize(bytes: Array[Byte]): Option[Kmv.Buffer] =
    if (bytes.isEmpty) None else Some(Kmv.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): KmvMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): KmvMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_kmv_estimate(sketch)` → BIGINT distinct estimate. */
case class KmvEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_kmv_estimate"
  override def nullSafeEval(input: Any): Any =
    Kmv.estimate(input.asInstanceOf[Array[Byte]])
  override protected def withNewChildInternal(newChild: Expression): KmvEstimate =
    copy(child = newChild)
}

/** `graft_kmv_jaccard(a, b)` → DOUBLE Jaccard estimate between sketches. */
case class KmvJaccard(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects two BINARY sketches, got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_kmv_jaccard"
  override def nullSafeEval(a: Any, b: Any): Any =
    Kmv.jaccard(a.asInstanceOf[Array[Byte]], b.asInstanceOf[Array[Byte]])
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): KmvJaccard =
    copy(left = newLeft, right = newRight)
}
