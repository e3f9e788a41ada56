package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

class PackingOpsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val sf = "/root/testdata/sf0.001"

  test("packing is a dense end-to-end layout within every bucket") {
    val rows = PackingOps.packSequences.run(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.length == graft.io.Tables.documents(spark, sf).count())
    // every offset lies inside the context window
    assert(rows.forall { case (_, _, _, off, _) => off >= 0 && off < 2048 })
    // within a bucket, doc starts (pack*2048+off) tile the token stream with
    // no holes: sorted starts advance by exactly the previous doc's length
    rows.groupBy(_._2).foreach { case (bucket, docs) =>
      val starts = docs.map(d => (d._3 * 2048 + d._4, d._5)).sortBy(_._1)
      starts.sliding(2).foreach {
        case Array((s1, n1), (s2, _)) =>
          assert(s2 == s1 + n1, s"hole in bucket $bucket: $s1+$n1 != $s2")
        case _ =>
      }
      assert(starts.head._1 == 0L, s"bucket $bucket must start at offset 0")
    }
  }

  test("packing re-derives identically (pure function of the corpus)") {
    val a = PackingOps.packSequences.run(spark, sf).collect().map(_.toSeq).toSeq
    val b = PackingOps.packSequences.run(spark, sf).collect().map(_.toSeq).toSeq
    assert(a == b)
  }

  test("packing bucket count derives from the corpus: bounded per-bucket lists") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    import org.apache.spark.sql.functions._
    // 600 docs -> nb = ceil(600/256) = 3 buckets (the FFD shard recipe)
    val docs = (0 until 600).map { i =>
      (i.toLong, Seq.fill(10 + i % 90)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = ops.PackingOps.packOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val buckets = out.map(_._2).distinct.sorted
    assert(buckets.forall(b => b >= 0 && b < 3),
      s"bucket ids must lie in [0, ceil(600/256)): ${buckets.toSeq}")
    assert(buckets.length == 3, "600 docs must fan out across all 3 derived buckets")
    // per-bucket doc count bounded near the target (hash-uniform split)
    out.groupBy(_._2).foreach { case (b, g) =>
      assert(g.length < 2 * 256, s"bucket $b holds ${g.length} docs — unbounded") }
    // layout stays dense within every derived bucket (same invariant as the
    // sf run above: starts tile the token stream with no holes)
    out.groupBy(_._2).foreach { case (bucket, ds) =>
      val starts = ds.map(d => (d._3 * 2048 + d._4, d._5)).sortBy(_._1)
      starts.sliding(2).foreach {
        case Array((s1, n1), (s2, _)) =>
          assert(s2 == s1 + n1, s"hole in bucket $bucket: $s1+$n1 != $s2")
        case _ =>
      }
      assert(starts.head._1 == 0L, s"bucket $bucket must start at offset 0")
    }
  }

  test("decontamination flags exactly the docs sharing a 4-gram with the eval set") {
    import spark.implicits.{newLongEncoder, newProductEncoder, localSeqToDatasetHolder}
    // doc 97*2=194 is "eval" (id % 97 == 0); doc 1 shares its 4-gram, doc 2
    // shares only 3 consecutive words, doc 3 nothing.
    val docs = Seq(
      (194L, "alpha beta gamma delta epsilon"),
      (1L, "xx alpha beta gamma delta yy"),   // contains eval 4-gram
      (2L, "beta gamma delta zz ww qq"),      // only a 3-word overlap
      (3L, "totally different words here ok"),
    ).toDF("doc_id", "text")
    val out = PackingOps.decontamOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    assert(out.toSeq == Seq((1L, 1L)))
  }

  test("eval docs are never self-flagged") {
    val flagged = PackingOps.decontaminate.run(spark, sf)
      .filter("doc_id % 97 = 0").count()
    assert(flagged == 0)
  }

  test("gap fill emits a dense hourly grid per station with correct carry") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    import org.apache.spark.sql.functions._
    // station A reads at 00h and 03h -> hours 01,02 are gaps carrying 1.0
    val events = Seq(
      (1L, "2024-01-01 00:10:00", "A", 1.0),
      (2L, "2024-01-01 03:20:00", "A", 9.0),
      (3L, "2024-01-01 01:00:00", "B", 5.0),
    ).toDF("event_id", "ts", "event_type", "value")
      .withColumn("ts", to_timestamp($"ts"))
      .withColumn("user_id", lit(0L))
    val out = ops.TimeSeriesOps.gapFillOf(events).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(3)))
    assert(out.toSeq == Seq(
      ("A", "2024-01-01 00", 0L, 1.0),
      ("A", "2024-01-01 01", 1L, 1.0),
      ("A", "2024-01-01 02", 1L, 1.0),
      ("A", "2024-01-01 03", 0L, 9.0),
      ("B", "2024-01-01 01", 0L, 5.0),
    ))
  }

  test("length-bucketed batching matches a driver-side replay of the layout") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    import org.apache.spark.sql.functions._
    // 20 docs with word counts spanning three 16-wide length buckets
    val docs = (0 until 20).map { i =>
      (i.toLong, Seq.fill(5 + (i * 7) % 40)("w").mkString(" "))
    }.toDF("doc_id", "text")
    // fetch the engine's own portable hash, then replay batching in Scala
    val hashed = docs
      .select($"doc_id", size(split($"text", " ")).cast("long").as("n_tok"),
        call_function("md5hash60", $"doc_id".cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // per-lb (n_batches, n_docs, n_tok, pad_tok) from a flat batch list
    def replay(lbOf: Long => Long): Map[Long, (Long, Long, Long, Long)] =
      hashed.map { case (id, n, h) => (lbOf(n), h % 32, h, id, n) }
        .groupBy(t => (t._1, t._2)).toSeq
        .flatMap { case ((lb, _), g) =>
          g.sortBy(t => (t._3, t._4)).zipWithIndex
            .groupBy { case (_, rn) => rn / 8 }.values
            .map { b =>
              val lens = b.map(_._1._5)
              (lb, lens.length.toLong, lens.max, lens.sum)
            }
        }
        .groupBy(_._1)
        .map { case (lb, batches) =>
          lb -> (batches.length.toLong, batches.map(_._2).sum,
            batches.map(_._4).sum,
            batches.map(b => b._3 * b._2 - b._4).sum)
        }
    val expLen = replay(n => n / 16)
    val expHash = replay(_ => -1L)
    val out = ops.PackingOps.lengthBucketsOf(docs).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getLong(5)))
    for ((layout, exp) <- Seq(("length", expLen), ("hash", expHash));
         (lb, (nBatches, nDocs, nTok, padTok)) <- exp) {
      assert(out.contains((layout, lb, nBatches, nDocs, nTok, padTok)),
        s"$layout bucket $lb: expected ($nBatches, $nDocs, $nTok, $padTok) in ${out.toSeq}")
    }
    assert(out.length == expLen.size + expHash.size)
    // equal-length corpus pads nothing under either layout
    val flat = (0 until 10).map(i => (i.toLong, "a b c d e")).toDF("doc_id", "text")
    assert(ops.PackingOps.lengthBucketsOf(flat).collect()
      .forall(_.getLong(5) == 0L))
  }

  test("first-fit-decreasing packing matches a driver-side replay, bins never overflow") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    import org.apache.spark.sql.functions._
    // lengths chosen so several docs must share bins and first-fit matters
    val lens = Seq(1200, 1100, 1000, 900, 800, 700, 600, 500, 400, 300,
      200, 100, 50, 25, 1500, 1800)
    val docs = lens.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val hashed = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        call_function("md5hash60", col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val expected = ffdReplay(hashed)
    val out = ops.PackingOps.packFfdOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSeq == expected)
    // no (shard, bin) ever exceeds the context window
    out.groupBy(t => (t._2, t._3)).foreach { case (sb, g) =>
      assert(g.map(_._4).sum <= 2048L, s"bin $sb overflows") }
  }

  /** Driver-side FFD replay including the corpus-derived shard count:
    * ns = max(1, ceil(n_docs / 256)), shard = h % ns, per-shard first-fit
    * in (len DESC, h, doc_id) order. */
  private def ffdReplay(hashed: Seq[(Long, Long, Long)]): Seq[(Long, Long, Long, Long)] = {
    val ns = math.max(1L, math.ceil(hashed.size / 256.0).toLong)
    hashed.groupBy(_._3 % ns).toSeq.flatMap { case (shard, g) =>
      val sorted = g.sortBy(t => (-t._2, t._3, t._1))
      val loads = collection.mutable.ArrayBuffer.empty[Long]
      sorted.map { case (id, n, _) =>
        val idx = loads.indexWhere(_ + n <= 2048)
        val bin = if (idx >= 0) { loads(idx) += n; idx + 1 }
        else { loads += n; loads.length }
        (id, shard, bin.toLong, n)
      }
    }.sortBy(_._1)
  }

  test("FFD shard count derives from the corpus: bounded per-shard lists at any size") {
    import spark.implicits.{newProductEncoder, localSeqToDatasetHolder}
    import org.apache.spark.sql.functions._
    // 600 docs -> ns = ceil(600/256) = 3 shards; 16 docs (test above) -> 1
    val docs = (0 until 600).map { i =>
      (i.toLong, Seq.fill(10 + i % 90)("w").mkString(" "))
    }.toDF("doc_id", "text")
    val out = ops.PackingOps.packFfdOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val shards = out.map(_._2).distinct.sorted
    assert(shards.forall(s => s >= 0 && s < 3),
      s"shard ids must lie in [0, ceil(600/256)): ${shards.toSeq}")
    assert(shards.length == 3, "600 docs must fan out across all 3 derived shards")
    // per-shard doc count bounded near the target (hash-uniform split)
    out.groupBy(_._2).foreach { case (s, g) =>
      assert(g.length < 2 * 256, s"shard $s holds ${g.length} docs — unbounded") }
    // and the full assignment still matches the driver-side replay
    val hashed = docs
      .select(col("doc_id"), size(split(col("text"), " ")).cast("long").as("n"),
        call_function("md5hash60", col("doc_id").cast("string")).as("h"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(out.toSeq == ffdReplay(hashed))
  }
}
