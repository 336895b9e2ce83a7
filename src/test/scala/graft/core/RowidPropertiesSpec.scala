package graft.core

import graft.SparkSpec
import scala.util.Random

/** Property-style tests (seeded random cases — the scalatest/scalacheck
  * bridge isn't on the offline classpath) for the store's ordering laws:
  * rowid density across arbitrary batch splits, and merged-view equivalence
  * with the reference's 3-way pullx routing (writable_cache.rs:248-298).
  */
case class PRec(v: Long)

class RowidPropertiesSpec extends SparkSpec {

  test("rowids stay dense under arbitrary batch splits") {
    import spark.implicits._
    val rnd = new Random(42)
    (1 to 4).foreach { _ =>
      val sizes = Vector.fill(3)(rnd.nextInt(26))
      val s = VectorStore.create[PRec](spark, tmpDir("prop"))
      var next = 0L
      sizes.foreach { sz =>
        s.pushx((0 until sz).map(i => PRec(next + i)))
        next += sz
      }
      assert(s.len == next, s"sizes=$sizes")
      if (next > 0) assert(s.getall().get.map(_.v) == (0L until next), s"sizes=$sizes")
    }
  }

  test("buffered merged reads ≡ flat vector for any (split, range)") {
    import spark.implicits._
    val data = (0L until 40L).map(PRec)
    val rnd = new Random(7)
    (1 to 6).foreach { _ =>
      val committed = rnd.nextInt(41)
      val index = rnd.nextInt(41)
      val count = rnd.nextInt(41)
      val base = VectorStore.create[PRec](spark, tmpDir("propbuf"))
      base.pushx(data.take(committed))
      val buf = new BufferedVectorStore[PRec](base, maxItems = 1000000)
      buf.pushx(data.drop(committed))
      val expected =
        if (index + count <= 40) Some(data.slice(index, index + count))
        else None
      assert(buf.getx(index.toLong, count.toLong) == expected,
        s"committed=$committed index=$index count=$count")
      buf.close()
    }
  }
}
