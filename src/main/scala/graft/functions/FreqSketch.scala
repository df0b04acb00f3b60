package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import scala.collection.mutable

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Misra–Gries frequency sketch as a native Catalyst aggregate: finds
  * heavy-hitter CANDIDATES over a string column in one scan with O(k)
  * state per partition, mergeable across partitions (the 100 TB shape:
  * map-side partial sketches, one tiny final merge — no groupBy over the
  * full term domain).
  *
  * Guarantee (Misra & Gries 1982; merge bound from Agarwal et al.,
  * "Mergeable Summaries"): every item with true frequency > n/(k+1) of
  * the n rows scanned survives the sketch REGARDLESS of partitioning or
  * merge order. The surviving SET can vary with merge order below that
  * bound, so deterministic pipelines use the two-pass pattern: sketch →
  * candidate set (superset of the true heavy hitters), then one exact
  * count pass filtered to the candidates (a broadcast semi-join, not a
  * full-domain aggregate) — the final thresholded output is exact and
  * engine-independent. See LlmQueries q53.
  *
  * Returns ARRAY<STRING>: the candidate items, sorted (deterministic
  * array layout for a given candidate set).
  */
case class FreqSketch(
    child: Expression,
    capacity: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, Long]] {

  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "graft_freq_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def createAggregationBuffer(): mutable.HashMap[String, Long] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, Long], input: InternalRow)
      : mutable.HashMap[String, Long] = {
    val v = child.eval(input)
    if (v != null) {
      // UTF8String may alias a reused scan buffer — materialize the key
      val key = v.asInstanceOf[UTF8String].toString
      buf.get(key) match {
        case Some(c) => buf.update(key, c + 1)
        case None =>
          if (buf.size < capacity) buf.update(key, 1L)
          else decrementAll(buf, 1L) // the classic MG "pay one from all"
      }
    }
    buf
  }

  override def merge(a: mutable.HashMap[String, Long], b: mutable.HashMap[String, Long])
      : mutable.HashMap[String, Long] = {
    b.foreach { case (k, c) => a.update(k, a.getOrElse(k, 0L) + c) }
    if (a.size > capacity) {
      // standard mergeable-summaries trim: subtract the (capacity+1)-th
      // largest counter from all, drop the non-positive — size ≤ capacity
      // and the n/(k+1) survival bound is preserved
      val counts = a.values.toArray
      java.util.Arrays.sort(counts)
      decrementAll(a, counts(counts.length - capacity - 1))
    }
    a
  }

  private def decrementAll(buf: mutable.HashMap[String, Long], by: Long): Unit = {
    val dead = mutable.ArrayBuffer.empty[String]
    buf.foreach { case (k, c) => if (c <= by) dead += k else buf.update(k, c - by) }
    dead.foreach(buf.remove)
  }

  override def eval(buf: mutable.HashMap[String, Long]): Any =
    new GenericArrayData(
      buf.keysIterator.toArray.sorted[String].map(UTF8String.fromString(_): Any))

  override def serialize(buf: mutable.HashMap[String, Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.size)
    // length-prefixed UTF-8, not writeUTF: modified-UTF-8 caps keys at
    // 65535 bytes and would fail the whole aggregation on one long item
    buf.foreach { case (k, c) =>
      val bytes = k.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      out.writeInt(bytes.length); out.write(bytes); out.writeLong(c)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): mutable.HashMap[String, Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = mutable.HashMap.empty[String, Long]
    var i = 0
    while (i < n) {
      val len = in.readInt()
      val bytes = new Array[Byte](len)
      in.readFully(bytes)
      buf.update(new String(bytes, java.nio.charset.StandardCharsets.UTF_8), in.readLong())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): FreqSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): FreqSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): FreqSketch =
    copy(child = newChildren.head)
}
