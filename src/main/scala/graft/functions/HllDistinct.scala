package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** HyperLogLog distinct-count sketch as a native Catalyst aggregate
  * (TypedImperativeAggregate) — the custom-aggregation extension point the
  * built-in `approx_count_distinct` also uses, implemented here as a
  * first-class engine operator so sketches can be built, merged across
  * partitions, and (at 100 TB) pre-aggregated per file/partition and
  * rolled up without rescanning raw data.
  *
  * Standard dense HLL (Flajolet et al. 2007 + the linear-counting
  * small-range correction from the HLL++ paper): 2^p byte registers,
  * register j = max leading-zero rank of the low 64−p hash bits whose top
  * p bits equal j. The per-value hash is a fixed splitmix64 finalizer, so
  * the estimate is DETERMINISTIC for a given value set — merge order and
  * partitioning cannot change it (register max is commutative/associative;
  * pinned in HllSpec).
  *
  * Input: BIGINT (hash wider types to a long first). Output: BIGINT
  * estimate. Relative error ≈ 1.04/√(2^p) — ~1.6% at the default p=12
  * with 4 KiB of state.
  */
case class HllDistinct(
    child: Expression,
    precision: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] {

  require(precision >= 4 && precision <= 16, s"precision must be in [4,16], got $precision")

  private val m = 1 << precision

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](m)

  // register math shared with the re-aggregatable sketch family
  // (HllSketch / HllMergeAgg / HllEstimate) via graft.functions.Hll
  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) Hll.updateRegisters(buf, precision, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = Hll.mergeInto(a, b)

  override def eval(buf: Array[Byte]): Any = Hll.estimate(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def withNewMutableAggBufferOffset(newOffset: Int): HllDistinct =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): HllDistinct =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): HllDistinct =
    copy(child = newChildren.head)
}

object HllDistinct {
  /** splitmix64 finalizer — a fixed, engine-portable 64-bit mix (public
    * constants from the SplitMix64 PRNG; Steele et al. 2014). */
  def hash64(x0: Long): Long = {
    var x = x0 + 0x9E3779B97F4A7C15L
    x = (x ^ (x >>> 30)) * 0xBF58476D1CE4E5B9L
    x = (x ^ (x >>> 27)) * 0x94D049BB133111EBL
    x ^ (x >>> 31)
  }
}
