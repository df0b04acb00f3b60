package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck state machine for scd2Merge: random source batches applied
  * through the Spark operator must match a driver-side reference model of
  * the reference's MERGE semantics (jobs/silver/silver_builder.py:103-132),
  * including the two-phase quirk (a changed key's new version only lands
  * on the following batch).
  */
object Scd2Props extends Properties("scd2Merge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(20).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val sentinel = "2099-12-31T00:00"

  /** Model row: (key, value, start, end, isCurrent) with ISO timestamps. */
  private type V = (Long, String, String, String, Boolean)

  /** Reference model of one merge pass (plain Scala). */
  private def modelMerge(state: Vector[V], batch: Map[Long, String], ts: String): Vector[V] = {
    val current = state.filter(_._5).map(v => v._1 -> v).toMap
    val updated = state.map {
      case (k, v, s, _, true) if batch.contains(k) && batch(k) != v =>
        (k, v, s, ts, false) // close-out
      case other => other
    }
    val inserts = batch.collect {
      case (k, v) if !current.contains(k) => (k, v, ts, sentinel, true)
    }
    updated ++ inserts
  }

  private def toDf(state: Vector[V]) =
    state.toDF("id", "name", "s", "e", "is_current")
      .withColumn("effective_start_date", col("s").cast("timestamp_ntz"))
      .withColumn("effective_end_date", col("e").cast("timestamp_ntz"))
      .drop("s", "e")
      .select("id", "name", "effective_start_date", "effective_end_date", "is_current")

  private def fromDf(df: org.apache.spark.sql.DataFrame): Vector[V] =
    df.collect().toVector.map { r =>
      (r.getLong(0), r.getString(1),
        r.getAs[java.time.LocalDateTime](2).toString,
        r.getAs[java.time.LocalDateTime](3).toString,
        r.getBoolean(4))
    }

  private val genBatch: Gen[Map[Long, String]] = Gen.mapOf(for {
    k <- Gen.choose(1L, 8L) // small key space to force matches
    v <- Gen.oneOf("a", "b", "c")
  } yield k -> v)

  property("n random batches == reference model") = Prop.forAll(
    Gen.listOfN(3, genBatch)) { batches =>
    val timestamps = Seq("2024-02-01T00:00", "2024-03-01T00:00", "2024-04-01T00:00")
    var modelState = Vector.empty[V]
    var sparkState = toDf(modelState)
    batches.zip(timestamps).foreach { case (batch, ts) =>
      modelState = modelMerge(modelState, batch, ts)
      val src = batch.toSeq.toDF("id", "name")
        .withColumn("updated_at", lit(ts.replace('T', ' ') + ":00").cast("timestamp_ntz"))
      sparkState = Merge.scd2Merge(sparkState, src, "id", Seq("name"),
        sentinelEnd = "2099-12-31 00:00:00")
    }
    val got = fromDf(sparkState).sorted
    val want = modelState.sorted
    Prop(got == want) :| s"spark=$got model=$want"
  }
}
