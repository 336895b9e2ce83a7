package graft.core

import java.util.{LinkedHashMap => JLinkedHashMap, Map => JMap}

/** LRU point-read cache over a store — the reference's `ReadableCache`
  * (reference: src/cache/readable_cache.rs):
  *
  *  - `getting` probes the LRU (recency updated), misses fall through to
  *    the backing store and populate the cache (readable_cache.rs:68-80);
  *  - bulk reads (`gettingLot`) bypass the cache entirely
  *    (readable_cache.rs:83-85) — scans must not evict the hot set;
  *  - capacity defaults to the reference's 1 024 000
  *    (readable_cache.rs:14), env-tunable there via MAX_RECACHE_ITEMS;
  *  - writes pass straight through and never touch the cache
  *    (readable_cache.rs:154-156).
  *
  * This is a driver-side serving-layer helper: Spark's own analog for
  * distributed data is `Dataset.persist()` + BlockManager LRU (SURVEY.md
  * §2.4); per-row LRU only makes sense where the reference used it — hot
  * point lookups.
  */
final class ReadCachedStore[T](
    fetch: Long => Option[T],
    fetchRange: (Long, Long) => Option[Seq[T]],
    capacity: Int = ReadCachedStore.defaultCapacity
) {

  private val lru = new JLinkedHashMap[Long, T](16, 0.75f, /*accessOrder=*/ true) {
    override def removeEldestEntry(e: JMap.Entry[Long, T]): Boolean = size() > capacity
  }

  private var hitCount = 0L
  private var missCount = 0L

  /** Cached point read — reference `getting` (readable_cache.rs:68-80). */
  def getting(index: Long): Option[T] = {
    val cached = lru.synchronized(Option(lru.get(index)))
    cached match {
      case some @ Some(_) =>
        lru.synchronized { hitCount += 1 }
        some
      case None =>
        lru.synchronized { missCount += 1 }
        val fetched = fetch(index)
        fetched.foreach(v => lru.synchronized(lru.put(index, v)))
        fetched
    }
  }

  /** Bulk read bypasses the LRU — reference `getting_lot`
    * (readable_cache.rs:83-85).
    */
  def gettingLot(index: Long, count: Long): Option[Seq[T]] = fetchRange(index, count)

  /** Manual warm-up — reference `add_to_cache`/`add_bulk_to_cache`
    * (readable_cache.rs:88-108).
    */
  def addToCache(index: Long, value: T): Unit = lru.synchronized(lru.put(index, value))
  def addBulkToCache(startIndex: Long, values: Seq[T]): Unit = lru.synchronized {
    values.zipWithIndex.foreach { case (v, i) => lru.put(startIndex + i, v) }
  }

  def cachedCount: Int = lru.synchronized(lru.size())
  def stats: (Long, Long) = lru.synchronized((hitCount, missCount))
}

object ReadCachedStore {
  /** Default LRU capacity: `MAX_RECACHE_ITEMS` env var, falling back to the
    * reference's 1 024 000 (readable_cache.rs:14,56-60). A same-named JVM
    * system property takes precedence so tests can exercise the override
    * without forking (env vars are immutable within a JVM).
    */
  def defaultCapacity: Int = EnvCapacity("MAX_RECACHE_ITEMS", 1024000)

  /** Cache stack composition as in the reference's
    * `ReadableCache<WritableCache<DynamicVectorManageService<T>,T>,T>`
    * (tests/tests/cache_engine_performance_test.rs:103-106).
    */
  def over[T](store: BufferedVectorStore[T], capacity: Int = defaultCapacity): ReadCachedStore[T] =
    new ReadCachedStore[T](store.get, store.getx, capacity)

  def over[T](store: VectorStore[T])(implicit d: DummyImplicit): ReadCachedStore[T] =
    new ReadCachedStore[T](store.get, store.getx, defaultCapacity)
}

/** Env-tunable capacity lookup shared by the cache tiers — the reference
  * pattern `env::var(name).ok().and_then(parse).unwrap_or(default)`
  * (writable_cache.rs:60-70, readable_cache.rs:56-60). Non-numeric or
  * non-positive values fall back to the default, as there.
  */
private[core] object EnvCapacity {
  def apply(name: String, default: Int): Int =
    sys.props.get(name).orElse(sys.env.get(name))
      .flatMap(_.trim.toIntOption).filter(_ > 0).getOrElse(default)
}
