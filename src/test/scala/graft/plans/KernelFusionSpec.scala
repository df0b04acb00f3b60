package graft.plans

import graft.SparkSuite
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Pins for the kernel-fusion optimizer rule: the idiomatic HOF dot
  * product fuses to the compiled kernel, the substitution is exactly
  * semantics-preserving (ragged lengths, null elements, null arrays),
  * and near-miss patterns are left untouched. */
class KernelFusionSpec extends SparkSuite {
  import spark.implicits._

  private def hofDot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, v) => acc + v)

  private def optimizedContainsFused(df: DataFrame): Boolean =
    df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.FusedDotProduct]))

  // repartition keeps ConvertToLocalRelation from evaluating the
  // projection at optimization time (which would erase the expression
  // before the plan assertions — and skip the codegen path entirely)
  private val vecs = Seq(
    (Seq(1.0, 2.0, 3.0), Seq(4.0, 5.0, 6.0)),   // plain
    (Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0)),         // ragged → NULL
    (Seq.empty[Double], Seq.empty[Double]))      // empty → 0.0
    .toDF("a", "b").repartition(2)

  test("idiomatic HOF dot product fuses to the compiled kernel") {
    val df = vecs.select(hofDot(col("a"), col("b")).as("dot"))
    assert(optimizedContainsFused(df), df.queryExecution.optimizedPlan.toString)
    // commuted lambda operands fuse too (bit-identical for doubles)
    val commuted = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => y * x),
        lit(0.0), (acc, v) => v + acc).as("dot"))
    assert(optimizedContainsFused(commuted))
  }

  test("fusion is exactly semantics-preserving, including NULL cases") {
    // null element and null array rows, built with explicit nullable arrays
    val tricky = Seq[(Option[Seq[Option[Double]]], Option[Seq[Option[Double]]])](
      (Some(Seq(Some(1.0), Some(2.0))), Some(Seq(Some(3.0), Some(4.0)))),
      (Some(Seq(Some(1.0), None)), Some(Seq(Some(3.0), Some(4.0)))), // null elem → NULL
      (None, Some(Seq(Some(1.0)))),                                  // null array → NULL
      (Some(Seq(Some(1.0))), Some(Seq(Some(1.0), Some(2.0)))))       // ragged → NULL
      .toDF("a", "b").repartition(2)
      .select(col("a").cast("array<double>").as("a"), col("b").cast("array<double>").as("b"))
    val fused = tricky.select(hofDot(col("a"), col("b")).as("d"))
    assert(optimizedContainsFused(fused))
    val unfused = withFusionDisabled {
      val df = tricky.select(hofDot(col("a"), col("b")).as("d"))
      assert(!optimizedContainsFused(df), "excludedRules must disable fusion")
      df.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    }
    // repartition scrambles row order — compare as multisets
    val got = fused.collect().map(r => if (r.isNullAt(0)) null else r.getDouble(0)).toSeq
    assert(got.sortBy(String.valueOf(_)) == unfused.sortBy(String.valueOf(_)),
      s"fused=$got unfused=$unfused")
    assert(got.count(_ == null) == 3 && got.contains(11.0))
  }

  test("near-miss patterns do not fuse") {
    // wrong seed, wrong zip lambda, non-trivial finish: all left alone
    val wrongSeed = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(1.0), (acc, v) => acc + v))
    val wrongLambda = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x + y),
        lit(0.0), (acc, v) => acc + v))
    val withFinish = vecs.select(
      aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
        lit(0.0), (acc, v) => acc + v, acc => acc * 2))
    Seq(wrongSeed, wrongLambda, withFinish).foreach(df =>
      assert(!optimizedContainsFused(df), df.queryExecution.optimizedPlan.toString))
  }

  private def withFusionDisabled[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.optimizer.excludedRules")
    spark.conf.set("spark.sql.optimizer.excludedRules", "graft.plans.KernelFusion")
    try body finally prev match {
      case Some(v) => spark.conf.set("spark.sql.optimizer.excludedRules", v)
      case None => spark.conf.unset("spark.sql.optimizer.excludedRules")
    }
  }

  test("tokenization chain fuses and is bit-identical, unicode included") {
    val texts = Seq(
      "Hello, World! 42 times",
      "  -- punctuation -- only --  ",
      "",
      "ÅNGSTRÖM über café 北京 MIXED case12three",
      "\ttabs\nand\nnewlines 007").toDF("text").repartition(2)
    def toks(df: org.apache.spark.sql.DataFrame) = df.select(
      filter(split(lower(col("text")), "[^a-z0-9]+"), t => t =!= "").as("t"))
    val fusedDf = toks(texts)
    assert(fusedDf.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.Tokenize])),
      fusedDf.queryExecution.optimizedPlan.toString)
    val fused = fusedDf.collect().map(_.getSeq[String](0)).toSeq
    val unfused = withFusionDisabled {
      val df = toks(texts)
      assert(!df.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.Tokenize])))
      df.collect().map(_.getSeq[String](0)).toSeq
    }
    assert(fused.sortBy(_.mkString(" ")) == unfused.sortBy(_.mkString(" ")))
    // un-lowered and custom-regex variants fuse too
    val noLower = texts.select(filter(split(col("text"), ","), t => t =!= ""))
    assert(noLower.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[graft.functions.Tokenize])))
  }

  test("tokenize near-misses do not fuse") {
    val df = Seq("a b").toDF("text").repartition(2)
    // different filter predicate (keeps empties out by length): not the pattern
    val lenFilter = df.select(
      filter(split(lower(col("text")), " "), t => length(t) > 0))
    // split with an explicit non-(-1) limit never reaches the pattern
    // (functions.split(str, regex) always passes -1, so build via expr)
    val limited = df.selectExpr("filter(split(text, ' ', 2), t -> t != '')")
    Seq(lenFilter, limited).foreach(d =>
      assert(!d.queryExecution.optimizedPlan.expressions
        .exists(_.exists(_.isInstanceOf[graft.functions.Tokenize])),
        d.queryExecution.optimizedPlan.toString))
  }

  test("fused plan result matches the engine-internal kernel on dense vectors") {
    val dense = (1 to 50).map { i =>
      val r = new scala.util.Random(i)
      (Seq.fill(64)(r.nextDouble() * 2 - 1), Seq.fill(64)(r.nextDouble() * 2 - 1))
    }.toDF("a", "b")
    val viaHof = dense.select(hofDot(col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    val viaKernel = dense.select(
      call_function("graft_dot_product", col("a"), col("b")).as("d"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaHof == viaKernel) // bit-identical sequential folds
  }
}
