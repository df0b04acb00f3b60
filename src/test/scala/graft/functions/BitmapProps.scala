package graft.functions

import org.scalacheck.{Gen, Prop, Properties, Test}

/** ScalaCheck properties for the paged-bitmap kernel (no Spark needed —
  * the TypedImperativeAggregate wrappers are a thin shell over these
  * operations, and BitmapSpec covers the Spark plumbing): exact count,
  * OR = set union, idempotence/commutativity of merge (the algebraic
  * replay shield q184 relies on), and byte-stable serialization. */
object BitmapProps extends Properties("bitmap") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(50).withWorkers(1)

  // ids spanning several pages with deliberate page-boundary values
  private val genIds: Gen[List[Long]] = for {
    base <- Gen.listOf(Gen.choose(0L, 300000L))
    edges <- Gen.someOf(Seq(0L, 63L, 64L, 65535L, 65536L, 131071L, 131072L))
  } yield base ++ edges

  private def build(ids: Seq[Long]): Bitmap.Pages = {
    val p = Bitmap.empty
    ids.foreach(Bitmap.add(p, _))
    p
  }

  property("count == distinct") = Prop.forAll(genIds) { ids =>
    Bitmap.count(build(ids)) == ids.distinct.size.toLong
  }

  property("merge == set union, any order, byte-stable") =
    Prop.forAll(genIds, genIds) { (a, b) =>
      val ab = Bitmap.serialize(Bitmap.mergeInto(build(a), build(b)))
      val ba = Bitmap.serialize(Bitmap.mergeInto(build(b), build(a)))
      val direct = Bitmap.serialize(build(a ++ b))
      java.util.Arrays.equals(ab, ba) && java.util.Arrays.equals(ab, direct)
    }

  property("merge is idempotent (the q184 replay shield)") =
    Prop.forAll(genIds) { a =>
      val once = Bitmap.serialize(build(a))
      val twice = Bitmap.serialize(Bitmap.mergeInto(build(a), build(a)))
      java.util.Arrays.equals(once, twice)
    }

  property("serialize/deserialize roundtrip preserves count and bytes") =
    Prop.forAll(genIds) { a =>
      val bytes = Bitmap.serialize(build(a))
      val back = Bitmap.deserialize(bytes)
      Bitmap.count(back) == a.distinct.size.toLong &&
        java.util.Arrays.equals(Bitmap.serialize(back), bytes)
    }
}
