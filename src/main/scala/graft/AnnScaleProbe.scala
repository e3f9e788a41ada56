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
      // cell format `n:` (ladder) or `n:clamp`; a bare `n` is ladder mode
      // (round-16 ADVICE: the 2-way destructuring threw MatchError on it)
      val cells = sys.env.getOrElse("ANN_PROBE_CANDS",
        "400000:,400000:12,4000000:,4000000:16").split(",").map(_.trim)
      for (cell <- cells) {
        val parts = cell.split(":", 2)
        val n = parts(0).toLong
        val clamp = if (parts.length < 2 || parts(1).isEmpty) None
          else Some(parts(1).toInt)
        val e = vecsOf(n)
        e.write.format("noop").mode("overwrite").save()
        val t0 = System.nanoTime()
        val r = graft.ops.EmbeddingOps.annMergeCandCountOf(e, clamp)
          .collect().head
        val sec = (System.nanoTime() - t0) / 1e9
        val (nn, nb, c) = (r.getLong(0), r.getInt(1), r.getLong(2))
        // expectation in Double (round-16 ADVICE: the Long form overflows
        // at nn ≳ 7e8 — exactly the sizes this mode exists to reach)
        val expect = (1.0 + nb) * nn * nn / (1L << nb)
        println(f"""{"probe":"ann_merge_cands","n":$n,"clamp":"${clamp.getOrElse("ladder")}","nb":$nb,"cands":$c,"cands_per_vec":${c / math.max(nn, 1)},"expect":$expect%.0f,"sec":$sec%.1f}""")
        Caches.release()
      }
    } else if (sys.env.get("ANN_PROBE_MODE").contains("rebucket")) {
      // Two-level bucketing prototype — the documented LSH-forest escape
      // hatch past the pool-30 design bound (round-16 verdict item 6):
      // emulate a corpus FAR past the clamp by pinning level-1 to nb1
      // planes (n/2^nb1 vectors per bucket stands in for the >34B-vector
      // density the 30-plane ladder would hit at full scale; target
      // shrunk proportionally per the verdict's scaled-down protocol),
      // then re-bucket each overfull level-1 prefix on the NEXT k planes
      // of the same pool, k chosen PER BUCKET by the integer ladder
      // (smallest k with count <= target*2^k — the same never-a-float-log
      // discipline as the engine's nb derivation). Reported densities
      // and Σc² candidate volumes show whether the move holds the
      // per-bucket work at the target band. 1-row aggregate readouts are
      // collected (dev-scratch probe main, off the registry path).
      val n = sys.env.getOrElse("ANN_PROBE_N", "400000").toLong
      val nb1 = sys.env.getOrElse("ANN_PROBE_NB1", "10").toInt
      val target = sys.env.getOrElse("ANN_PROBE_TARGET", "32").toLong
      val maxExtra = 30 - nb1
      val e = vecsOf(n)
      e.write.format("noop").mode("overwrite").save()
      val t0 = System.nanoTime()
      val b1 = Caches.persist(e.withColumn("bucket",
        graft.ops.EmbeddingOps.probeBucketRange(lit(0), lit(nb1))))
      val s1 = Caches.persist(b1.groupBy($"bucket").count())
      val st1 = s1.agg(max($"count").as("mx"),
        sum($"count" * $"count").as("c2"), count(lit(1)).as("nb")).collect().head
      // per-bucket extra-plane count by integer ladder
      val kCol = (0 until maxExtra).foldRight(lit(maxExtra): org.apache.spark.sql.Column) {
        (k, acc) => when($"count" <= lit(target * (1L << k)), lit(k)).otherwise(acc)
      }
      val plan = s1.select($"bucket", kCol.as("k"))
      val b2 = b1.join(broadcast(plan), "bucket")
        .withColumn("bucket2", when($"k" === 0, lit(0)).otherwise(
          graft.ops.EmbeddingOps.probeBucketRange(lit(nb1), lit(nb1) + $"k")))
      val s2 = Caches.persist(b2.groupBy($"bucket", $"bucket2").count())
      val st2 = s2.agg(max($"count").as("mx"),
        sum($"count" * $"count").as("c2"), count(lit(1)).as("nb")).collect().head
      val kmax = plan.agg(max($"k")).collect().head.getInt(0)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"ann_rebucket","n":$n,"nb1":$nb1,"target":$target,"b1_buckets":${st1.getLong(2)},"b1_max":${st1.getLong(0)},"b1_cands_per_vec":${st1.getLong(1) / n},"b2_buckets":${st2.getLong(2)},"b2_max":${st2.getLong(0)},"b2_cands_per_vec":${st2.getLong(1) / n},"k_max":$kmax,"planes_used_max":${nb1 + kmax},"sec":$sec%.1f}""")
      Caches.release()
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
