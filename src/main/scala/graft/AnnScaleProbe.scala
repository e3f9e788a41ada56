package graft

import org.apache.spark.sql.functions._

/** Dev scratch main — not part of the library surface.
  *
  * Vectors-only scale probe for the ANN index-BUILD family (round-15
  * verdict item 2): generate n synthetic 64-dim vectors DISTRIBUTED
  * (spark.range + xxhash64 arithmetic — no testdata dependency, no
  * driver-side materialization) and time the sharded build + merge
  * (`annMergeOf`) across the OLD 2¹⁶-plane-pool clamp at ~2M vectors.
  * `ANN_PROBE_NS` (comma list, default "400000,4000000") picks the sizes:
  * the defaults straddle the old clamp one decade apart, so the printed
  * ratio IS the ×/decade figure the verdict's bar (< ~×3·linear) reads
  * against — at the pool's target density the candidate join is linear in
  * n, so a clean ladder shows ≈ core-saturated-linear growth, while a
  * clamped pool showed merge ×7.4-15.7/decade before the rungs existed.
  *
  * The synthetic vectors mimic the testdata embeddings' shape (uniform
  * in [-1,1]⁶⁴, vec_id ≥ 0, the first 5 ids being the excluded query
  * set) so `nbFrameOf`'s count base and the bucket distribution behave
  * like a real corpus decade, just bigger than any SF the driver ships. */
object AnnScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = Sessions.local()
    import spark.implicits._
    val sizes = sys.env.getOrElse("ANN_PROBE_NS", "400000,4000000")
      .split(",").map(_.trim.toLong).toSeq
    for (n <- sizes) {
      // deterministic pseudo-random coordinates: xxhash64(vec_id, d)
      // folded to [-1, 1] — codegen'd, distributed, reproducible
      val e = Caches.persist(
        spark.range(n).select($"id".as("vec_id"),
          transform(sequence(lit(0), lit(63)),
            d => pmod(xxhash64($"id", d), lit(2000001L)).cast("double")
              / 1000000.0 - 1.0).as("v"))
          .withColumn("nrm",
            sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x))))
      e.write.format("noop").mode("overwrite").save() // build outside timing
      // the engine derives nb from the corpus; replay the ladder here so
      // the probe line records which rung the size landed on
      val nb = (4 to 29).find(k => n <= 32L * (1L << k)).getOrElse(30)
      val t0 = System.nanoTime()
      graft.ops.EmbeddingOps.annMergeOf(e)
        .write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"ann_merge_synth","n":$n,"nb":$nb,"sec":$sec%.1f}""")
      Caches.release()
    }
    spark.stop()
  }
}
