package graft.functions

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck property for the Misra–Gries sketch: on random skewed word
  * streams, under random partitioning, every item with true frequency
  * > n/(capacity+1) must be in the candidate set, and the set never
  * exceeds capacity. (The two-pass exact verify in q53 builds on exactly
  * this superset guarantee.) */
object FreqSketchProps extends Properties("freqSketch") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genStream: Gen[(List[String], Int, Int)] = for {
    nHeavy <- Gen.choose(1, 4)
    heavyReps <- Gen.choose(200, 400)
    noiseKinds <- Gen.choose(50, 300)
    capacity <- Gen.choose(16, 64)
    parts <- Gen.oneOf(1, 3, 8)
    seed <- Gen.choose(0, 10000)
  } yield {
    val rng = new scala.util.Random(seed)
    val heavy = (1 to nHeavy).flatMap(h => List.fill(heavyReps)(s"heavy$h"))
    val noise = List.fill(noiseKinds * 3)(s"w${rng.nextInt(noiseKinds)}")
    (rng.shuffle(heavy ++ noise).toList, capacity, parts)
  }

  property("superset of true heavy hitters; size bounded by capacity") =
    Prop.forAll(genStream) { case (words, capacity, parts) =>
      val n = words.size
      val trueCounts = words.groupBy(identity).view.mapValues(_.size)
      val mustSurvive = trueCounts.filter(_._2 > n.toDouble / (capacity + 1)).keySet
      val cands = words.toDF("w").repartition(parts)
        .agg(call_function("graft_freq_sketch", col("w"), lit(capacity)))
        .head().getSeq[String](0).toSet
      mustSurvive.subsetOf(cands) && cands.size <= capacity
    }
}
