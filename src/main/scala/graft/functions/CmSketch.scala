package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Count–Min sketch (Cormode & Muthukrishnan 2005, "An improved data
  * stream summary: the count-min sketch and its applications") as a
  * native Catalyst aggregate — point-frequency estimates over a string
  * column in one scan with fixed d×w counter state, completing the
  * mergeable-sketch cube next to NDV (HLL/KMV), heavy-hitter candidates
  * (Misra–Gries) and quantiles (KLL): the reference's analytics layer
  * answers "how often does this term occur" only by a full-domain
  * GROUP BY (dbt models over warehouse tables); at 100 TB the sketch is
  * the pre-aggregation shape — map-side partials, one tiny merge, no
  * shuffle keyed on the (unbounded) term domain.
  *
  * Guarantees, both load-bearing for the spec and q99:
  *  - ONE-SIDED error: counters only over-count (hash collisions), so
  *    estimate ≥ true frequency ALWAYS — deterministically, not with
  *    probability;
  *  - estimate ≤ true + (e/w)·N with probability ≥ 1 − e^−d per query
  *    (N = total rows sketched), the classic bound;
  *  - merge is ELEMENTWISE COUNTER ADDITION — commutative, associative,
  *    and (unlike Misra–Gries, whose surviving candidate SET varies
  *    with merge order below the guarantee line) the merged sketch is
  *    BIT-IDENTICAL for any partitioning or rollup shape, so estimates
  *    are engine-deterministic with no two-pass confirm needed.
  *
  * Row hashing is double hashing over a fixed FNV-1a/splitmix base —
  * no RNG, no seeds to thread, same value on every run and engine.
  *
  * Serialized form (also the BINARY column format): Int d, Int w,
  * Long n, then d·w longs row-major.
  */
object Cm {
  /** FNV-1a 64 over UTF-8 bytes, then a splitmix64 finalizer — the
    * avalanche pass matters: FNV alone leaves low-bit regularity that
    * double hashing would fold into systematic collisions. */
  def hash64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    var z = h + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** Counter index of `item` in row `r`: (h1 + r·h2) mod w with h2
    * forced odd, Knuth-style double hashing. */
  def index(h1: Long, h2: Long, r: Int, w: Int): Int = {
    val x = h1 + r.toLong * (h2 | 1L)
    // floorMod over the sign-stripped value keeps the index in [0, w)
    ((x & Long.MaxValue) % w).toInt
  }

  final class Buffer(val d: Int, val w: Int) {
    val cells = new Array[Long](d * w)
    var n = 0L

    def add(bytes: Array[Byte]): Unit = {
      val h1 = hash64(bytes)
      // one extra mix derives the second base hash from the first —
      // cheaper than re-scanning the bytes, independent enough after
      // the splitmix avalanche
      var z = h1 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val h2 = z ^ (z >>> 31)
      var r = 0
      while (r < d) { cells(r * w + index(h1, h2, r, w)) += 1L; r += 1 }
      n += 1L
    }

    def estimate(bytes: Array[Byte]): Long = {
      val h1 = hash64(bytes)
      var z = h1 + 0x9e3779b97f4a7c15L
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      val h2 = z ^ (z >>> 31)
      var best = Long.MaxValue
      var r = 0
      while (r < d) {
        val c = cells(r * w + index(h1, h2, r, w))
        if (c < best) best = c
        r += 1
      }
      if (best == Long.MaxValue) 0L else best
    }

    def mergeFrom(other: Buffer): Buffer = {
      require(other.d == d && other.w == w,
        s"cannot merge CM sketches of different shape: ${d}x$w vs ${other.d}x${other.w}")
      var i = 0
      while (i < cells.length) { cells(i) += other.cells(i); i += 1 }
      n += other.n
      this
    }
  }

  def toBytes(buf: Buffer): Array[Byte] = {
    val bb = ByteBuffer.allocate(16 + 8 * buf.cells.length)
    bb.putInt(buf.d); bb.putInt(buf.w); bb.putLong(buf.n)
    var i = 0
    while (i < buf.cells.length) { bb.putLong(buf.cells(i)); i += 1 }
    bb.array()
  }

  def fromBytes(bytes: Array[Byte]): Buffer = {
    require(bytes.length >= 16, s"malformed CM sketch: ${bytes.length} bytes")
    val bb = ByteBuffer.wrap(bytes)
    val d = bb.getInt
    val w = bb.getInt
    // validate the untrusted header BEFORE allocating d·w cells: a
    // corrupt header must die here with a real message, not overflow
    // the Int product past the length check (d=w=65536 → d*w == 0) and
    // crash mid-query, or allocate gigabytes
    require(d > 0 && w > 0 && bytes.length == 16 + 8L * d * w,
      s"malformed CM sketch: ${bytes.length} bytes for ${d}x$w")
    val buf = new Buffer(d, w)
    buf.n = bb.getLong
    var i = 0
    while (i < buf.cells.length) { buf.cells(i) = bb.getLong; i += 1 }
    buf
  }
}

/** `graft_cm_sketch(col[, width[, depth]])` → BINARY Count–Min sketch
  * (defaults w=2048, d=4: 64 KiB state, ε = e/2048 ≈ 0.13% of N). */
case class CmSketch(
    child: Expression,
    width: Int,
    depth: Int,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Cm.Buffer] {

  require(width >= 16 && depth >= 1 && depth <= 16,
    s"bad CM shape: ${depth}x$width")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cm_sketch"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects STRING, got ${child.dataType}")

  override def createAggregationBuffer(): Cm.Buffer = new Cm.Buffer(depth, width)

  override def update(buf: Cm.Buffer, input: InternalRow): Cm.Buffer = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[UTF8String].getBytes)
    buf
  }

  override def merge(a: Cm.Buffer, b: Cm.Buffer): Cm.Buffer = a.mergeFrom(b)
  override def eval(buf: Cm.Buffer): Any = Cm.toBytes(buf)
  override def serialize(buf: Cm.Buffer): Array[Byte] = Cm.toBytes(buf)
  override def deserialize(bytes: Array[Byte]): Cm.Buffer = Cm.fromBytes(bytes)

  override def withNewMutableAggBufferOffset(newOffset: Int): CmSketch =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmSketch =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmSketch =
    copy(child = newChildren.head)
}

/** `graft_cm_merge(sketchCol)` — rollup over BINARY sketches by
  * elementwise counter addition. All inputs must share one d×w shape
  * (unlike KLL/KMV there is no smaller-k downgrade: differently-shaped
  * counter grids have no common refinement, so a mix fails loudly). */
case class CmMergeAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Option[Cm.Buffer]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = BinaryType
  override def prettyName: String = "graft_cm_merge"

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")

  override def createAggregationBuffer(): Option[Cm.Buffer] = None

  private def mergeBufs(a: Option[Cm.Buffer], b: Cm.Buffer): Option[Cm.Buffer] =
    a match {
      case None => Some(b)
      case Some(x) => Some(x.mergeFrom(b))
    }

  override def update(buf: Option[Cm.Buffer], input: InternalRow): Option[Cm.Buffer] = {
    val v = child.eval(input)
    if (v == null) buf
    else {
      val bytes = v.asInstanceOf[Array[Byte]]
      // empty sentinel (a merge of zero sketches) carries no information
      if (bytes.isEmpty) buf else mergeBufs(buf, Cm.fromBytes(bytes))
    }
  }

  override def merge(a: Option[Cm.Buffer], b: Option[Cm.Buffer]): Option[Cm.Buffer] =
    b.fold(a)(bb => mergeBufs(a, bb))

  // "no sketches seen" serializes as a ZERO-LENGTH sentinel and round-
  // trips back to None, so an empty partition in a partial aggregation
  // contributes nothing instead of a zero-grid of some arbitrary shape
  override def eval(buf: Option[Cm.Buffer]): Any =
    buf.fold(Array.emptyByteArray)(Cm.toBytes)
  override def serialize(buf: Option[Cm.Buffer]): Array[Byte] =
    buf.fold(Array.emptyByteArray)(Cm.toBytes)
  override def deserialize(bytes: Array[Byte]): Option[Cm.Buffer] =
    if (bytes.isEmpty) None else Some(Cm.fromBytes(bytes))

  override def withNewMutableAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CmMergeAgg =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(newChildren: IndexedSeq[Expression]): CmMergeAgg =
    copy(child = newChildren.head)
}

/** `graft_cm_estimate(sketch, item)` → BIGINT estimated frequency of
  * `item` (min over the sketch's rows; 0 for the empty sentinel). A
  * scalar expression, so lookups stay DISTRIBUTED — probe a broadcast
  * sketch from any executor instead of collecting it to the driver. */
case class CmEstimate(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == StringType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, STRING), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_estimate"
  // same-REFERENCE memo: probing one broadcast sketch across many rows
  // deserializes the d×w grid once, not per row (worst case under a
  // racing reuse is a harmless recompute)
  @transient private var lastBytes: Array[Byte] = _
  @transient private var lastBuf: Cm.Buffer = _
  override def nullSafeEval(sk: Any, item: Any): Any = {
    val bytes = sk.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0L
    else {
      if (lastBytes ne bytes) { lastBuf = Cm.fromBytes(bytes); lastBytes = bytes }
      lastBuf.estimate(item.asInstanceOf[UTF8String].getBytes)
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmEstimate =
    copy(left = newLeft, right = newRight)
}

/** `graft_cm_join_size(a, b)` → BIGINT estimated equi-join output size
  * Σ_k f_a(k)·f_b(k) as the MIN over rows of the counter-grid inner
  * product (Cormode & Muthukrishnan §4.2, the AGMS-style join-size
  * estimate). One-sided like the point estimate — collisions only add,
  * so estimate ≥ true size always, and ≤ true + (e/w)·N_a·N_b with
  * probability ≥ 1 − e^−d. Lets a planner size an exchange or pick a
  * broadcast/salt strategy from two table sketches WITHOUT running the
  * join. Shapes must match (same d×w). */
case class CmJoinSize(left: Expression, right: Expression)
    extends BinaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == BinaryType && right.dataType == BinaryType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName expects (BINARY, BINARY), got ${left.dataType}, ${right.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_join_size"
  override def nullSafeEval(a: Any, b: Any): Any = {
    val ba = a.asInstanceOf[Array[Byte]]
    val bb = b.asInstanceOf[Array[Byte]]
    if (ba.isEmpty || bb.isEmpty) 0L
    else {
      val x = Cm.fromBytes(ba)
      val y = Cm.fromBytes(bb)
      require(x.d == y.d && x.w == y.w,
        s"cannot estimate join size across shapes: ${x.d}x${x.w} vs ${y.d}x${y.w}")
      // saturating arithmetic: at ~1e10-row tables a row's inner product
      // can pass Long.MaxValue (N_a·N_b ~ 1e20) — the planner must read
      // "huge join", never a wrapped-negative "tiny join" that picks a
      // catastrophic broadcast
      var best = Long.MaxValue
      var r = 0
      while (r < x.d) {
        var acc = 0L
        var j = 0
        var saturated = false
        while (j < x.w && !saturated) {
          try acc = Math.addExact(acc,
            Math.multiplyExact(x.cells(r * x.w + j), y.cells(r * x.w + j)))
          catch { case _: ArithmeticException => saturated = true }
          j += 1
        }
        if (!saturated && acc < best) best = acc
        r += 1
      }
      best
    }
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CmJoinSize =
    copy(left = newLeft, right = newRight)
}

/** `graft_cm_total(sketch)` → BIGINT rows sketched (the N in the ε·N
  * error bound — lets a query state its own accuracy contract). */
case class CmTotal(child: Expression)
    extends UnaryExpression with CodegenFallback {
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(s"$prettyName expects BINARY, got ${child.dataType}")
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_cm_total"
  override def nullSafeEval(input: Any): Any = {
    val bytes = input.asInstanceOf[Array[Byte]]
    if (bytes.isEmpty) 0L
    else {
      val bb = ByteBuffer.wrap(bytes)
      bb.getInt; bb.getInt
      bb.getLong
    }
  }
  override protected def withNewChildInternal(newChild: Expression): CmTotal =
    copy(child = newChild)
}
