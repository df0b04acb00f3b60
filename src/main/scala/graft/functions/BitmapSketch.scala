package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._

/** Paged EXACT bitmap of non-negative longs — the roaring-bitmap shape
  * (Chambi et al. 2016) reduced to its load-bearing idea: the id space
  * splits into 65536-bit pages keyed by id >>> 16, pages materialize
  * only where ids actually land, and set union is page-wise OR. Where
  * [[Hll]] answers "about how many distinct" in 2^p bytes, this answers
  * EXACTLY, at a cost proportional to the id-space density — the right
  * tool for bounded dictionaries (users, skus, shards) where audits
  * must reconcile to the integer.
  *
  * Determinism/mergeability: membership is a pure function of the value
  * set; OR is commutative, associative, and idempotent, so any rollup
  * tree (partition partials, day cubes, retry replays) yields the
  * identical bitmap. Serialized form is pages sorted by page id —
  * byte-identical for equal sets, so sketches can themselves be
  * compared or content-hashed.
  *
  * Scale shape: mergeable TypedImperativeAggregate partial state — the
  * map-side-combine pre-aggregation pattern; a 10M-dense-id universe
  * costs ~1.25 MB per group partial. Negative ids are a loud error
  * (silent masking would corrupt the count); nulls are ignored like
  * every SQL aggregate. */
object Bitmap {
  type Pages = scala.collection.mutable.LongMap[Array[Long]]

  val PageBits = 16
  val PageWords = (1 << PageBits) / 64 // 1024 longs = 65536 bits

  /** Guard for the documented bounded-dictionary contract: every
    * touched page costs a dense 8 KB word array (no sparse container),
    * so n SCATTERED ids — a hashed/random id space, outside the
    * contract — cost ~8 KB each. 131072 pages ≈ 1 GiB per aggregation
    * buffer is already far past any sane dictionary (covers ids up to
    * ~8.6e9 dense); past it the buffer is headed for executor OOM, so
    * fail loudly with the fix (dictionary-encode, or use graft_hll)
    * instead of dying on a heap dump. */
  val MaxPages = 1 << 17

  def empty: Pages = new scala.collection.mutable.LongMap[Array[Long]]()

  def add(p: Pages, v: Long, maxPages: Int = MaxPages): Unit = {
    require(v >= 0, s"bitmap ids must be non-negative, got $v")
    val page = v >>> PageBits
    val bit = (v & 0xffffL).toInt
    val words = p.getOrElse(page, null) match {
      case null =>
        require(p.size < maxPages,
          s"bitmap exceeded $maxPages pages (~${maxPages * 8L * PageWords / (1 << 30)} GiB): " +
            "the id space is too sparse for an exact paged bitmap — " +
            "dictionary-encode the ids first, or use graft_hll")
        val w = new Array[Long](PageWords)
        p.update(page, w)
        w
      case w => w
    }
    words(bit >>> 6) |= 1L << (bit & 63)
  }

  def mergeInto(a: Pages, b: Pages, maxPages: Int = MaxPages): Pages = {
    b.foreach { case (page, words) =>
      a.get(page) match {
        case Some(aw) =>
          var i = 0
          while (i < PageWords) { aw(i) |= words(i); i += 1 }
        case None =>
          require(a.size < maxPages,
            s"bitmap merge exceeded $maxPages pages — id space too " +
              "sparse for an exact paged bitmap (see Bitmap.MaxPages)")
          a.update(page, words.clone())
      }
    }
    a
  }

  def count(p: Pages): Long = {
    var n = 0L
    p.foreach { case (_, words) =>
      var i = 0
      while (i < PageWords) { n += java.lang.Long.bitCount(words(i)); i += 1 }
    }
    n
  }

  /** Pages sorted by id: equal sets serialize byte-identically. */
  def serialize(p: Pages): Array[Byte] = {
    val pages = p.toSeq.sortBy(_._1)
    val bb = java.nio.ByteBuffer.allocate(4 + pages.size * (8 + PageWords * 8))
    bb.putInt(pages.size)
    pages.foreach { case (page, words) =>
      bb.putLong(page)
      var i = 0
      while (i < PageWords) { bb.putLong(words(i)); i += 1 }
    }
    bb.array()
  }

  def deserialize(bytes: Array[Byte]): Pages = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val p = empty
    var k = 0
    while (k < n) {
      val page = bb.getLong
      val words = new Array[Long](PageWords)
      var i = 0
      while (i < PageWords) { words(i) = bb.getLong; i += 1 }
      p.update(page, words)
      k += 1
    }
    p
  }
}

/** `graft_bitmap_sketch(col)` — exact paged bitmap of a BIGINT column,
  * returned as re-aggregatable BINARY (roll up with
  * [[BitmapMergeAgg]], read with [[BitmapCount]]). */
case class BitmapSketch(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Pages] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BIGINT, got ${child.dataType}")

  override def createAggregationBuffer(): Bitmap.Pages = Bitmap.empty

  override def update(buf: Bitmap.Pages, input: InternalRow): Bitmap.Pages = {
    val v = child.eval(input)
    if (v != null) Bitmap.add(buf, v.asInstanceOf[Long])
    buf
  }

  override def merge(a: Bitmap.Pages, b: Bitmap.Pages): Bitmap.Pages =
    Bitmap.mergeInto(a, b)
  override def eval(buf: Bitmap.Pages): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.Pages): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Pages =
    Bitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapSketch =
    copy(child = newChildren.head)
}

/** `graft_bitmap_merge(sketchCol)` — ORs materialized [[BitmapSketch]]
  * binaries: the rollup step over pre-aggregated bitmap cubes. */
case class BitmapMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Bitmap.Pages] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_bitmap_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")

  override def createAggregationBuffer(): Bitmap.Pages = Bitmap.empty

  override def update(buf: Bitmap.Pages, input: InternalRow): Bitmap.Pages = {
    val v = child.eval(input)
    if (v != null)
      Bitmap.mergeInto(buf, Bitmap.deserialize(v.asInstanceOf[Array[Byte]]))
    buf
  }

  override def merge(a: Bitmap.Pages, b: Bitmap.Pages): Bitmap.Pages =
    Bitmap.mergeInto(a, b)
  override def eval(buf: Bitmap.Pages): Any = Bitmap.serialize(buf)
  override def serialize(buf: Bitmap.Pages): Array[Byte] = Bitmap.serialize(buf)
  override def deserialize(bytes: Array[Byte]): Bitmap.Pages =
    Bitmap.deserialize(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): BitmapMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): BitmapMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_bitmap_count(sketch)` — exact cardinality of a serialized
  * bitmap (popcount over pages). */
case class BitmapCount(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_bitmap_count"

  override def nullSafeEval(input: Any): Any =
    Bitmap.count(Bitmap.deserialize(input.asInstanceOf[Array[Byte]]))

  override protected def withNewChildInternal(newChild: Expression): BitmapCount =
    copy(child = newChild)
}
