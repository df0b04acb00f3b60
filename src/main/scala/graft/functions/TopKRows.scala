package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, RowOrdering, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{GenericArrayData, TypeUtils}
import org.apache.spark.sql.types._

/** Bounded-heap top-k per group as a native Catalyst aggregate — the
  * scale path for "top k rows per key". The window formulation
  * (`row_number over (partition by key order by ...) <= k`) must SORT
  * every key's full row set; this aggregate keeps a k-element min-heap
  * per group, so partial (map-side) aggregation prunes to k rows per
  * key per partition BEFORE the shuffle, and the final merge is
  * O(k log k) per key. At 100 TB that's the difference between shuffling
  * the table and shuffling k·keys rows.
  *
  * `graft_topk(sortKey, payload, k)` keeps the k LARGEST sort keys and
  * returns ARRAY of payloads in descending key order. The sort key can
  * be any orderable type — compose tie-breaks into a struct
  * (e.g. struct(price, id)) and make it UNIQUE per group: uniqueness is
  * what makes the result deterministic under any partitioning.
  */
case class TopKRows(
    keyExpr: Expression,
    payloadExpr: Expression,
    k: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[TopKRows.Heap] {

  require(k > 0, s"k must be positive, got $k")

  override def children: Seq[Expression] = Seq(keyExpr, payloadExpr)
  override def nullable: Boolean = false
  // a nullable payload expression can put null elements in the result
  // array — declare it, or downstream codegen skips null checks
  override def dataType: DataType =
    ArrayType(payloadExpr.dataType, containsNull = payloadExpr.nullable)
  override def prettyName: String = "graft_topk"

  override def checkInputDataTypes(): TypeCheckResult =
    if (RowOrdering.isOrderable(keyExpr.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName sort key type ${keyExpr.dataType} is not orderable")

  @transient private lazy val keyOrdering: Ordering[Any] =
    TypeUtils.getInterpretedOrdering(keyExpr.dataType)

  override def createAggregationBuffer(): TopKRows.Heap =
    new TopKRows.Heap(k, keyOrdering)

  override def update(heap: TopKRows.Heap, input: InternalRow): TopKRows.Heap = {
    val key = keyExpr.eval(input)
    if (key != null) {
      // offer before copying: most rows lose to the heap floor and cost
      // nothing; only admitted rows pay the defensive copy (eval results
      // may alias reused scan buffers)
      if (heap.admits(key))
        heap.offer(InternalRow.copyValue(key), InternalRow.copyValue(payloadExpr.eval(input)))
    }
    heap
  }

  override def merge(a: TopKRows.Heap, b: TopKRows.Heap): TopKRows.Heap = {
    b.foreach { (key, payload) => if (a.admits(key)) a.offer(key, payload) }
    a
  }

  override def eval(heap: TopKRows.Heap): Any =
    new GenericArrayData(heap.sortedDescPayloads)

  // (key, payload) pairs cross the partial/final shuffle as UnsafeRow
  // bytes — the engine's own row format, so any orderable key type and
  // any payload type serialize without a bespoke codec
  @transient private lazy val pairProjection =
    UnsafeProjection.create(Array(keyExpr.dataType, payloadExpr.dataType))

  override def serialize(heap: TopKRows.Heap): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(heap.size)
    val row = new GenericInternalRow(2)
    heap.foreach { (key, payload) =>
      row.update(0, key); row.update(1, payload)
      val bytes = pairProjection(row).getBytes
      out.writeInt(bytes.length)
      out.write(bytes)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKRows.Heap = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val heap = createAggregationBuffer()
    var i = 0
    while (i < n) {
      val size = in.readInt()
      val buf = new Array[Byte](size)
      in.readFully(buf)
      val ur = new UnsafeRow(2)
      ur.pointTo(buf, size)
      heap.offer(
        InternalRow.copyValue(ur.get(0, keyExpr.dataType)),
        InternalRow.copyValue(ur.get(1, payloadExpr.dataType)))
      i += 1
    }
    heap
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): TopKRows =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): TopKRows =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): TopKRows =
    copy(keyExpr = newChildren(0), payloadExpr = newChildren(1))
}

object TopKRows {

  /** Min-heap of (key, payload) bounded at k: the floor (smallest key)
    * is evicted when a larger key arrives. */
  final class Heap(k: Int, ord: Ordering[Any]) {
    private val keys = new Array[Any](k)
    private val payloads = new Array[Any](k)
    private var n = 0

    def size: Int = n

    /** Would `key` enter the heap? (No allocation — the hot-path test.) */
    def admits(key: Any): Boolean = n < k || ord.compare(key, keys(0)) > 0

    def offer(key: Any, payload: Any): Unit =
      if (n < k) {
        keys(n) = key; payloads(n) = payload
        n += 1
        var i = n - 1 // sift up
        while (i > 0 && ord.compare(keys((i - 1) / 2), keys(i)) > 0) {
          swap(i, (i - 1) / 2); i = (i - 1) / 2
        }
      } else if (ord.compare(key, keys(0)) > 0) {
        keys(0) = key; payloads(0) = payload
        siftDown(0)
      }

    private def swap(i: Int, j: Int): Unit = {
      val tk = keys(i); keys(i) = keys(j); keys(j) = tk
      val tp = payloads(i); payloads(i) = payloads(j); payloads(j) = tp
    }

    private def siftDown(start: Int): Unit = {
      var i = start
      var done = false
      while (!done) {
        val l = 2 * i + 1; val r = l + 1
        var m = i
        if (l < n && ord.compare(keys(l), keys(m)) < 0) m = l
        if (r < n && ord.compare(keys(r), keys(m)) < 0) m = r
        if (m == i) done = true else { swap(i, m); i = m }
      }
    }

    def foreach(f: (Any, Any) => Unit): Unit = {
      var i = 0
      while (i < n) { f(keys(i), payloads(i)); i += 1 }
    }

    /** Payloads ordered by key DESCENDING. */
    def sortedDescPayloads: Array[Any] =
      (0 until n).sortBy(keys(_))(ord.reverse).map(payloads(_)).toArray
  }
}
