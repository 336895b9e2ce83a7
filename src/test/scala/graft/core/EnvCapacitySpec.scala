package graft.core

import org.scalatest.funsuite.AnyFunSuite

/** Env-tunable cache capacities — reference `MAX_WRCACHE_ITEMS`
  * (writable_cache.rs:20,60-70) and `MAX_RECACHE_ITEMS`
  * (readable_cache.rs:14,56-60): override wins, garbage ignored, reference
  * defaults otherwise. Env vars are immutable inside a JVM, so the specs
  * drive the documented same-named system-property precedence path.
  */
class EnvCapacitySpec extends AnyFunSuite {

  private def withProp[A](name: String, value: String)(body: => A): A = {
    val old = sys.props.get(name)
    sys.props(name) = value
    try body
    finally old match {
      case Some(v) => sys.props(name) = v
      case None    => sys.props -= name
    }
  }

  test("reference defaults with no override (writable_cache.rs:20, readable_cache.rs:14)") {
    assert(BufferedVectorStore.defaultMaxItems == 500000)
    assert(ReadCachedStore.defaultCapacity == 1024000)
  }

  test("MAX_WRCACHE_ITEMS override reaches BufferedVectorStore.maxItems") {
    withProp("MAX_WRCACHE_ITEMS", "1234") {
      assert(BufferedVectorStore.defaultMaxItems == 1234)
    }
  }

  test("MAX_RECACHE_ITEMS override reaches the LRU capacity (evicts at the configured size)") {
    withProp("MAX_RECACHE_ITEMS", "2") {
      val c = new ReadCachedStore[String](i => Some(s"v$i"), (_, _) => None)
      (0L to 4L).foreach(c.getting)
      assert(c.cachedCount == 2) // capacity honored, eldest evicted
    }
  }

  test("non-numeric and non-positive overrides fall back to the default (reference unwrap_or)") {
    withProp("MAX_WRCACHE_ITEMS", "not-a-number") {
      assert(BufferedVectorStore.defaultMaxItems == 500000)
    }
    withProp("MAX_RECACHE_ITEMS", "0") {
      assert(ReadCachedStore.defaultCapacity == 1024000)
    }
  }
}
