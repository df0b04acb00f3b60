package graft.ops

import graft.TestSpark
import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the DQ rule algebra and the upsert merge
  * (SURVEY §5: rule algebra + merge semantics against driver-side
  * reference models over random data). */
object QualityProps extends Properties("quality-merge") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15).withWorkers(1)

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private val genRows: Gen[List[(Long, Option[Double])]] = Gen.listOf(for {
    id <- Gen.choose(1L, 12L) // small domain forces duplicate keys
    v <- Gen.option(Gen.choose(-50.0, 150.0))
  } yield (id, v))

  property("rule violation counts == reference model") = Prop.forAll(genRows) { rows =>
    val df = rows.toDF("id", "v")
    val nn = Quality.violatingRows(Quality.NotNull("t", "v"), df).count()
    val bt = Quality.violatingRows(Quality.Between("t", "v", 0, 100), df).count()
    val uq = Quality.violatingRows(Quality.Unique("t", "id"), df).count()
    val modelNn = rows.count(_._2.isEmpty)
    val modelBt = rows.count(r => r._2.isEmpty || r._2.exists(x => x < 0 || x > 100))
    val keyCounts = rows.groupBy(_._1).view.mapValues(_.size)
    val modelUq = keyCounts.values.filter(_ > 1).sum
    Prop(nn == modelNn && bt == modelBt && uq == modelUq) :|
      s"got ($nn,$bt,$uq) model ($modelNn,$modelBt,$modelUq)"
  }

  property("quarantine == union of per-rule violator keys, deduped") = Prop.forAll(genRows) { rows =>
    val df = rows.toDF("id", "v").withColumn("rid",
      org.apache.spark.sql.functions.monotonically_increasing_id())
    val rules = Seq(Quality.NotNull("t", "v"), Quality.Between("t", "v", 0, 100))
    val q = Quality.quarantine(rules, df, Seq("rid")).count()
    val perRule = rules.map(r =>
      Quality.violatingRows(r, df).select("rid").as[Long].collect().toSet
        .map((x: Long) => (x, s"${r.ruleName}:${r.columnName}")))
    Prop(q == perRule.reduce(_ ++ _).size) :| s"quarantine $q vs model ${perRule.reduce(_ ++ _).size}"
  }

  private val genTable: Gen[Map[Long, Double]] = Gen.mapOf(for {
    id <- Gen.choose(1L, 10L)
    v <- Gen.choose(0.0, 9.0)
  } yield id -> v)

  property("upsertMerge == map override model") = Prop.forAll(genTable, genTable) { (t, s) =>
    val target = t.toSeq.toDF("id", "v")
    val source = s.toSeq.toDF("id", "v")
    val got = Merge.upsertMerge(target, source, "id")
      .as[(Long, Double)].collect().toMap
    val model = t ++ s // source wins on match; both sides' unmatched survive
    Prop(got == model) :| s"got $got model $model"
  }
}
