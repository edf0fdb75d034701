package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** Concurrency contract of [[SessionCache]] — the in-memory sibling of
  * DiskLayoutCache's slot-monitor scheme, now carrying every memoized
  * index whose build thunk persists a DataFrame (ivf/pq/ivfadc/
  * pagerank/dsir/LM/BM25) and the q30 bucketed-table writer. The
  * contract under test is exactly what the raw TrieMap.getOrElseUpdate
  * pattern violated: a first-call race must run the side-effectful
  * build ONCE (the loser's persist would leak cached blocks for the
  * session lifetime), while distinct keys must not serialize on each
  * other.
  */
class SessionCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("racing first callers of one key run the build exactly once") {
    val cache = new SessionCache[String, Long](_ => ())
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val fs = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Long] {
          def call(): Long = cache.getOrBuild(spark, "k") {
            builds.incrementAndGet()
            Thread.sleep(50) // widen the race window
            42L
          }
        })
      }
      assert(fs.map(_.get()).toSet == Set(42L))
      assert(builds.get() == 1, s"build ran ${builds.get()} times")
    } finally pool.shutdown()
  }

  test("distinct keys build independently and memoize separately") {
    val cache = new SessionCache[String, Long](_ => ())
    assert(cache.getOrBuild(spark, "a")(1L) == 1L)
    assert(cache.getOrBuild(spark, "b")(2L) == 2L)
    var rebuilt = false
    assert(cache.getOrBuild(spark, "a") { rebuilt = true; 99L } == 1L)
    assert(!rebuilt, "memoized key rebuilt")
  }

  test("builds of DIFFERENT keys do not serialize on each other") {
    val cache = new SessionCache[String, Unit](_ => ())
    val inside = new java.util.concurrent.CountDownLatch(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fs = Seq("c1", "c2").map { k =>
        pool.submit(new java.util.concurrent.Callable[Unit] {
          def call(): Unit = cache.getOrBuild(spark, k) {
            inside.countDown()
            assert(inside.await(5, java.util.concurrent.TimeUnit.SECONDS),
              "peer build never entered: builds serialized globally")
          }
        })
      }
      fs.foreach(_.get())
    } finally pool.shutdown()
  }

  test("live sessions are never pruned and the evict hook never fires spuriously") {
    // the prune keys off sparkContext.isStopped, which is context-
    // global — exercising a genuinely stopped session would require
    // killing the suite's shared context, so the stopped-path eviction
    // is covered by code review + the identical DiskLayoutCache
    // precedent; what this pins is the complementary invariant
    val evicted = new java.util.concurrent.atomic.AtomicInteger(0)
    val cache = new SessionCache[String, Long](_ => evicted.incrementAndGet())
    assert(cache.getOrBuild(spark, "live")(7L) == 7L)
    (1 to 3).foreach(_ => assert(cache.getOrBuild(spark, "live")(99L) == 7L))
    assert(evicted.get() == 0, "live session's value was evicted")
  }
}
