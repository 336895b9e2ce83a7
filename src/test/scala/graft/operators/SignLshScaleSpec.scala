package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The sign-LSH bucket space must grow with the corpus: occupancy is
  * n / 2^planes and same-bucket pair generation is quadratic in occupancy,
  * so a constant plane count is a scale-killer. These specs pin the
  * plane-count formula (including the invariant that keeps the static
  * oracle SQL valid at test scale), show the bucket space actually widening
  * past the 8-plane ceiling, and exercise the occupancy-cap backstop.
  */
class SignLshScaleSpec extends SparkSpec {

  test("planesFor: monotone, reference-default at oracle scales, capped at maxPlanes") {
    // every oracle scale factor (<= 16 384 vectors) keeps the static 8-plane
    // layout the oracle SQL is generated from
    for (n <- Seq(100L, 500L, 5000L, 16384L))
      assert(Similarity.planesFor(n) == Similarity.numPlanes, s"n=$n")
    // past the threshold the space widens, monotonically
    assert(Similarity.planesFor(20000L) == 9)
    assert(Similarity.planesFor(40000L) == 10)
    val ns = Seq(1L, 1000L, 100000L, 10000000L, 1000000000L, Long.MaxValue / 2)
    val ps = ns.map(Similarity.planesFor)
    assert(ps == ps.sorted)
    assert(ps.last == Similarity.maxPlanes)
    // mean occupancy stays <= targetOccupancy until the plane cap binds
    assert((10000000L >> Similarity.planesFor(10000000L)) <= Similarity.targetOccupancy)
  }

  /** Deterministic pseudo-random embeddings large enough that 8 planes
    * can't hold the target occupancy.
    */
  private def syntheticEmbeddings(n: Int) = {
    import spark.implicits._
    spark.range(n.toLong).toDF("vec_id")
      .withColumn("embedding",
        expr(s"transform(sequence(0, ${Similarity.dim - 1}), " +
          "j -> CAST((pmod(hash(vec_id, j), 21) - 10) / 10.0 AS FLOAT))"))
  }

  test("bucket space widens past 256 buckets once the corpus outgrows 8 planes") {
    val emb = syntheticEmbeddings(20000)
    val planes = Similarity.planesFor(20000L)
    assert(planes > Similarity.numPlanes)
    val buckets = Similarity.lshBucketsOver(emb, planes)
      .agg(countDistinct(col("bucket")).as("n"), max(col("bucket")).as("mx"))
      .head()
    assert(buckets.getLong(0) > 256, s"only ${buckets.getLong(0)} distinct buckets")
    assert(buckets.getLong(1) > 255L) // high plane bits actually set
  }

  test("occupancy cap bounds every bucket and accounts for drops") {
    val emb = syntheticEmbeddings(5000)
    val (kept, dropped) = Similarity.lshBucketsCapped(emb, Similarity.numPlanes, 16)
    val maxOcc = kept.groupBy("bucket").agg(count(lit(1)).as("n"))
      .agg(max(col("n"))).head().getLong(0)
    assert(maxOcc <= 16)
    assert(kept.count() + dropped == 5000L)
    assert(dropped > 0) // the synthetic corpus is clustered enough to trip the cap
  }
}
