package graft.operators

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

class DiskLayoutCacheSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("racing first callers of one layout build it exactly once") {
    val cache = new DiskLayoutCache("graft_test_once")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(8)
    try {
      val futures = (1 to 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = cache.getOrBuild(spark, "/tmp/ds-a") { _ =>
            builds.incrementAndGet()
            Thread.sleep(50) // widen the race window
          }
        })
      }
      val paths = futures.map(_.get()).distinct
      assert(builds.get() == 1, s"build ran ${builds.get()} times")
      assert(paths.size == 1)
    } finally pool.shutdown()
  }

  test("distinct datasets get distinct paths and independent builds") {
    val cache = new DiskLayoutCache("graft_test_multi")
    val a = cache.getOrBuild(spark, "/tmp/ds-a")(_ => ())
    val b = cache.getOrBuild(spark, "/tmp/ds-b")(_ => ())
    assert(a != b)
    // memoized: a second lookup returns the same path without a build
    var rebuilt = false
    assert(cache.getOrBuild(spark, "/tmp/ds-a")(_ => rebuilt = true) == a)
    assert(!rebuilt)
  }

  test("builds of DIFFERENT keys do not serialize on each other") {
    val cache = new DiskLayoutCache("graft_test_conc")
    val inside = new java.util.concurrent.CountDownLatch(2)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      // both builders must be inside their build concurrently — under
      // the old one-global-lock scheme the second would block until
      // the first finished and the latch would time out
      val fs = Seq("/tmp/ds-c1", "/tmp/ds-c2").map { d =>
        pool.submit(new java.util.concurrent.Callable[String] {
          def call(): String = cache.getOrBuild(spark, d) { _ =>
            inside.countDown()
            assert(inside.await(5, java.util.concurrent.TimeUnit.SECONDS),
              "peer build never entered: builds serialized globally")
          }
        })
      }
      fs.foreach(_.get())
    } finally pool.shutdown()
  }
}
