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
    // deterministic pseudo-random coordinates: xxhash64(vec_id, d)
    // folded to [-1, 1] — codegen'd, distributed, reproducible
    def vecsOf(n: Long) = Caches.persist(
      spark.range(n).select($"id".as("vec_id"),
        transform(sequence(lit(0), lit(63)),
          d => pmod(xxhash64($"id", d), lit(2000001L)).cast("double")
            / 1000000.0 - 1.0).as("v"))
        .withColumn("nrm",
          sqrt(aggregate($"v", lit(0.0), (acc, x) => acc + x * x))))
    if (sys.env.get("ANN_PROBE_MODE").contains("cands")) {
      // candidate-volume mode: the exact pair count annMergeOf's four
      // bucket joins process, ladder vs historical clamps, on
      // (vec_id, bucket) only — MBs of shuffle where the timed merge at
      // the same n would spill >100 GB (this box's disk bound). The
      // printed `expect` is the uniform-bucket closed form
      // (1+nb)·n²/2^nb: measured≈expect on every feasible cell validates
      // the formula the infeasible clamp cells extrapolate with.
      val cells = sys.env.getOrElse("ANN_PROBE_CANDS",
        "400000:,400000:12,4000000:,4000000:16").split(",").map(_.trim)
      for (cell <- cells) {
        val Array(ns, cs) = cell.split(":", 2)
        val n = ns.toLong
        val clamp = if (cs.isEmpty) None else Some(cs.toInt)
        val e = vecsOf(n)
        e.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        val r = graft.ops.EmbeddingOps.annMergeCandCountOf(e, clamp)
          .collect().head
        val sec = (System.nanoTime() - t0) / 1e9
        val (nn, nb, c) = (r.getLong(0), r.getInt(1), r.getLong(2))
        val expect = (1L + nb) * nn * nn / (1L << nb)
        println(f"""{"probe":"ann_merge_cands","n":$n,"clamp":"${clamp.getOrElse("ladder")}","nb":$nb,"cands":$c,"cands_per_vec":${c / math.max(nn, 1)},"expect":$expect,"sec":$sec%.1f}""")
        Caches.release()
      }
    } else {
      val sizes = sys.env.getOrElse("ANN_PROBE_NS", "400000,4000000")
        .split(",").map(_.trim.toLong).toSeq
      for (n <- sizes) {
        val e = vecsOf(n)
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
    }
    spark.stop()
  }
}
