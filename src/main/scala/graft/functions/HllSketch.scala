package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Shared dense-HLL register math (see [[HllDistinct]] for the algorithm
  * and determinism notes). */
object Hll {
  def updateRegisters(buf: Array[Byte], precision: Int, value: Long): Unit = {
    val h = HllDistinct.hash64(value)
    val idx = (h >>> (64 - precision)).toInt
    val w = h << precision
    val rank = (if (w == 0) 64 - precision else java.lang.Long.numberOfLeadingZeros(w)) + 1
    if (rank > (buf(idx) & 0xff)) buf(idx) = rank.toByte
  }

  /** Register-wise max of `b` into `a` (sizes must match). */
  def mergeInto(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    require(a.length == b.length,
      s"cannot merge HLL sketches of different precision (${a.length} vs ${b.length} registers)")
    var i = 0
    while (i < a.length) {
      if ((b(i) & 0xff) > (a(i) & 0xff)) a(i) = b(i)
      i += 1
    }
    a
  }

  def estimate(buf: Array[Byte]): Long = {
    val m = buf.length
    // Flajolet et al. bias-correction constants: the asymptotic formula
    // overestimates alpha for small register counts, so m=16/32/64 use
    // the published exact values (HyperLogLog paper, Fig. 3).
    val alpha = m match {
      case 16 => 0.673
      case 32 => 0.697
      case 64 => 0.709
      case _  => 0.7213 / (1.0 + 1.079 / m)
    }
    var sum = 0.0
    var zeros = 0
    var i = 0
    while (i < m) {
      val r = buf(i) & 0xff
      sum += 1.0 / (1L << r)
      if (r == 0) zeros += 1
      i += 1
    }
    val est = alpha * m.toDouble * m.toDouble / sum
    val corrected =
      if (est <= 2.5 * m && zeros > 0) m * math.log(m.toDouble / zeros) // linear counting
      else est
    math.round(corrected)
  }
}

/** `graft_hll_sketch(col[, p])` — the RE-AGGREGATABLE form of
  * [[HllDistinct]]: returns the raw 2^p register bytes instead of the
  * estimate, so per-partition/per-day sketches can be MATERIALIZED and
  * later rolled up with [[HllMergeAgg]] + [[HllEstimate]] without
  * rescanning raw data — the pre-aggregated-cube pattern that makes
  * distinct counts tractable at 100 TB (register max is commutative and
  * idempotent, so any rollup tree gives the identical estimate; pinned
  * in HllSpec). */
case class HllSketch(
    child: Expression,
    precision: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 16, s"precision must be in [4,16], got $precision")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](1 << precision)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.updateRegisters(buf, precision, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.mergeInto(a, b)
  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllSketch =
    copy(child = newChildren.head)
}

/** `graft_hll_merge(sketchCol)` — aggregates BINARY register sketches by
  * register-wise max: the rollup step over materialized [[HllSketch]]
  * outputs. Mixed-precision inputs are an error, not a silent wrong
  * answer. */
case class HllMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_hll_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")

  // empty buffer = "no sketches seen yet"; sized lazily from the first input
  override def createAggregationBuffer(): Array[Byte] = Array.emptyByteArray

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val sk = v.asInstanceOf[Array[Byte]]
      if (buf.isEmpty) sk.clone() else Hll.mergeInto(buf, sk)
    }
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] =
    if (a.isEmpty) b else if (b.isEmpty) a else Hll.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = buf.clone()
  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_hll_estimate(sketch)` — scalar estimate from register bytes
  * ([[Hll.estimate]]); the read side of the materialized-sketch cube.
  * An empty sketch (merge of zero rows) estimates 0. */
case class HllEstimate(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_estimate"

  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0L else Hll.estimate(bytes)
  }

  override protected def withNewChildInternal(newChild: Expression): HllEstimate =
    copy(child = newChild)
}
