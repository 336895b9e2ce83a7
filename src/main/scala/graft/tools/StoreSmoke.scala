package graft.tools

import graft.core._
import org.apache.spark.sql.SparkSession

/** Manual end-to-end smoke of the VectorEngine-semantics store stack through
  * the public API (reference semantics: /root/repo/SURVEY.md §2.1, §2.4).
  * Run: sbt "runMain graft.tools.StoreSmoke /tmp/storesmoke"
  */
object StoreSmoke {
  final case class Msg(sender: String, body: String, n: Long)

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/storesmoke")
    val spark = GraftSession.local("store-smoke")
    import spark.implicits._

    def check(name: String, cond: Boolean): Unit =
      println(s"${if (cond) "OK " else "FAIL"} $name")

    // --- VectorStore: pushx/len/get/getx/pull OOB/getall ---
    val store = VectorStore.create[Msg](spark, s"$dir/t${System.nanoTime()}")
    check("empty store isEmpty", store.isEmpty && store.getall().isEmpty)
    store.pushx((0 until 100).map(i => Msg(s"u${i % 7}", s"hello $i", i.toLong)))
    store.pushx((100 until 130).map(i => Msg(s"u${i % 7}", s"hello $i", i.toLong)))
    check("len after two appends", store.len == 130)
    check("point get(42)", store.get(42).contains(Msg("u0", "hello 42", 42)))
    check("getx(95,10) straddles batches",
      store.getx(95, 10).exists(xs => xs.map(_.n) == (95L until 105L)))
    check("get OOB is None", store.get(130).isEmpty)
    check("pull OOB throws",
      try { store.pull(999); false } catch { case _: IndexOutOfBoundsException => true })
    check("getall ordered", store.getall().exists(_.map(_.n) == (0L until 130L)))

    // --- BufferedVectorStore: merged view before/after flush ---
    val buf = new BufferedVectorStore[Msg](store, maxItems = 1000000)
    buf.pushx((130 until 160).map(i => Msg("buf", s"b $i", i.toLong)))
    check("merged len committed+buffered", buf.len == 160)
    check("merged read from buffer", buf.get(145).exists(_.n == 145L))
    check("merged straddle getx(125,10)",
      buf.getx(125, 10).exists(_.map(_.n) == (125L until 135L)))
    buf.flush()
    check("after flush durable len", store.len == 160)
    check("after flush read from base", store.get(159).exists(_.n == 159L))
    buf.close()

    // --- ReadCachedStore: hit/miss accounting, bulk bypass ---
    val cached = ReadCachedStore.over(store)
    cached.getting(7); cached.getting(7); cached.getting(8)
    val (hits, misses) = cached.stats
    check("LRU hit/miss (1 hit, 2 miss)", hits == 1 && misses == 2)
    check("bulk bypasses cache", cached.gettingLot(0, 5).exists(_.size == 5) && cached.cachedCount == 2)

    // --- reopen: manifest-backed O(1) length ---
    val reopened = VectorStore.open[Msg](spark, store.table.root)
    check("reopen sees manifest length", reopened.len == 160)

    spark.stop()
  }
}
