package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** Scope isolation for the persist registry: one runner's release must
  * never evict a concurrently-running runner's blocks (the process-global
  * registry defect from the round-5 verdict). */
class CachesSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  test("a concurrent runner's release() does not evict this runner's persists") {
    val dfA = spark.range(0, 1000).toDF("v")
    Caches.persist(dfA)
    dfA.count() // materialize A's blocks

    @volatile var bReleasedItsOwn = false
    val runnerB = new Thread(() => {
      val dfB = spark.range(0, 500).toDF("w")
      Caches.persist(dfB)
      dfB.count()
      Caches.release() // B releases — must only touch B's registrations
      bReleasedItsOwn = dfB.storageLevel == StorageLevel.NONE
    })
    runnerB.start()
    runnerB.join()

    assert(bReleasedItsOwn, "runner B's own persist was not released")
    assert(dfA.storageLevel != StorageLevel.NONE,
      "runner B's release evicted runner A's persist (scope leak)")
    Caches.release()
    assert(dfA.storageLevel == StorageLevel.NONE,
      "runner A's own release did not drop its persist")
  }

  test("memo computes once per key, survives release(), rebuilds on key change") {
    var builds = 0
    def build() = { builds += 1; spark.range(0, 10).toDF("v") }
    val a = Caches.memo("caches-spec-memo", "k1")(build())
    assert(builds == 1)
    assert(a.count() == 10)
    Caches.release() // the per-query release must NOT drop the memo
    val b = Caches.memo("caches-spec-memo", "k1")(build())
    assert(builds == 1, "same key must reuse, not rebuild")
    assert(b.count() == 10, "memoized frame must stay readable after release()")
    val c = Caches.memo("caches-spec-memo", "k2")(build())
    assert(builds == 2, "key change must rebuild")
    assert(c.count() == 10)
    // intra-build persists are scoped: they release when the build ends
    val inner = spark.range(0, 5).toDF("w")
    Caches.memo("caches-spec-memo2", "k") {
      Caches.persist(inner); inner.count(); inner
    }
    assert(inner.storageLevel == StorageLevel.NONE,
      "memo build scope did not release the construction's persist")
  }

  test("scoped {} releases only its own registrations, even nested") {
    val outer = spark.range(0, 100).toDF("v")
    Caches.persist(outer)
    val inner = Caches.scoped {
      val df = spark.range(0, 50).toDF("w")
      Caches.persist(df)
      df.count()
      df
    }
    assert(inner.storageLevel == StorageLevel.NONE,
      "scoped block exit did not release its registration")
    assert(outer.storageLevel != StorageLevel.NONE,
      "scoped block exit evicted an outer-scope persist")
    Caches.release()
    assert(outer.storageLevel == StorageLevel.NONE)
  }
}
