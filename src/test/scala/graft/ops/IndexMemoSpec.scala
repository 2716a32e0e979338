package graft.ops

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.scalatest.funsuite.AnyFunSuite

/** IndexMemo locking contract: one key builds exactly once under
  * concurrency, and two DIFFERENT keys build in parallel — the build of one
  * must not serialize behind the other's monitor (the round-3 advisory:
  * a global `cache.synchronized` held across an eager Spark-job build made
  * two sessions' first use block each other for the full job duration).
  */
class IndexMemoSpec extends AnyFunSuite {

  test("a single key builds exactly once under concurrent first use") {
    val cache = IndexMemo.cache[String, Int]()
    val builds = new AtomicInteger(0)
    val pool = Executors.newFixedThreadPool(8)
    try {
      val tasks = (0 until 8).map { _ =>
        pool.submit(new java.util.concurrent.Callable[Int] {
          def call(): Int = IndexMemo(cache, "k") { builds.incrementAndGet(); 42 }
        })
      }
      assert(tasks.map(_.get(30, TimeUnit.SECONDS)).forall(_ == 42))
      assert(builds.get() == 1)
    } finally pool.shutdownNow()
  }

  test("distinct keys build concurrently, not behind one global monitor") {
    val cache = IndexMemo.cache[String, Int]()
    // key A's build blocks until key B's build has STARTED; under a global
    // monitor B could never start while A holds it → deadlock (timeout).
    val bStarted = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(2)
    try {
      val a = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = IndexMemo(cache, "a") {
          assert(bStarted.await(10, TimeUnit.SECONDS),
            "key-b build never started while key-a build was in progress")
          1
        }
      })
      val b = pool.submit(new java.util.concurrent.Callable[Int] {
        def call(): Int = IndexMemo(cache, "b") { bStarted.countDown(); 2 }
      })
      assert(b.get(15, TimeUnit.SECONDS) == 2)
      assert(a.get(15, TimeUnit.SECONDS) == 1)
    } finally pool.shutdownNow()
  }
}
