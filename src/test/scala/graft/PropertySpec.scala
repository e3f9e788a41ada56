package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.ops._

/** Property tests (SURVEY §5 item 3) for the algebraic/parser pieces where
  * a law holds for ALL inputs, not just fixtures. ScalaCheck generators
  * drive the cases from fixed seeds (no scalatest bridge on the classpath;
  * Spark jobs per case are expensive anyway, so few, larger cases). */
class PropertySpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark

  /** Run `f` over `n` deterministic samples of `g`. */
  private def forAllSeeded[A](g: Gen[A], n: Int = 5)(f: A => Unit): Unit =
    (1 to n).foreach { i =>
      f(g.apply(Gen.Parameters.default, Seed(i.toLong))
        .getOrElse(fail(s"generator exhausted at seed $i")))
    }

  private def forAll2[A, B](ga: Gen[A], gb: Gen[B], n: Int = 5)(
      f: (A, B) => Unit): Unit =
    forAllSeeded(Gen.zip(ga, gb), n) { case (a, b) => f(a, b) }

  private val token = Gen.alphaLowerStr.map(_.take(6)).suchThat(_.nonEmpty)

  test("union-distinct has set semantics for any two word lists") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    forAll2(Gen.listOf(token), Gen.listOf(token)) { (xs: List[String], ys: List[String]) =>
      val df1 = xs.map(Tuple1(_)).toDF("w")
      val df2 = ys.map(Tuple1(_)).toDF("w")
      val got = df1.union(df2).distinct().collect().map(_.getString(0)).toSet
      assert(got == (xs.toSet ++ ys.toSet))
    }
  }

  test("hourly dedup is idempotent: dedup(dedup(x)) == dedup(x)") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    val evGen = for {
      n <- Gen.choose(1, 80)
      rows <- Gen.listOfN(n, for {
        tpe <- Gen.oneOf("a", "b")
        h <- Gen.choose(0, 5)
        m <- Gen.choose(0, 59)
        id <- Gen.choose(0L, 1000000L)
        v <- Gen.choose(-100.0, 100.0)
      } yield (id, java.sql.Timestamp.valueOf(f"2024-01-01 $h%02d:$m%02d:00"),
        1L, tpe, v))
    } yield rows
    forAllSeeded(evGen) { rows =>
      val df = rows.toDF("event_id", "ts", "user_id", "event_type", "value")
      val once = TimeSeriesOps.hourlyOf(df)
      // re-shape the deduped output back to the input schema and re-dedup
      val asEvents = once.select(
        $"event_id",
        to_timestamp(concat($"day", lit(" "), lpad($"hr", 2, "0"), lit(":00:00"))).as("ts"),
        lit(1L).as("user_id"), $"event_type", $"value")
      val twice = TimeSeriesOps.hourlyOf(asEvents)
      assert(twice.count() == once.count())
      val keysOnce = once.select($"event_type", $"day", $"hr").collect().toSet
      val keysTwice = twice.select($"event_type", $"day", $"hr").collect().toSet
      assert(keysOnce == keysTwice)
    }
  }

  test("pipe .tbl parser drops exactly the under-arity lines") {
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    val lineGen = for {
      id <- Gen.choose(1, 99999)
      name <- token
      nfields <- Gen.frequency(8 -> Gen.const(8), 2 -> Gen.choose(1, 7))
    } yield s"$id|$name|addr|3|phone|12.34|SEG|c".split("\\|")
      .take(nfields).mkString("|")
    forAllSeeded(Gen.listOfN(30, lineGen)) { lines =>
      val tmp = java.nio.file.Files.createTempDirectory("prop").resolve("c.tbl")
      java.nio.file.Files.write(tmp,
        lines.mkString("\n").getBytes("UTF-8"))
      val parsed = io.RefFormats.customerTbl(spark, tmp.toString)
      val wellFormed = lines.count(_.split("\\|").length >= 8)
      assert(parsed.count() == wellFormed)
    }
  }

  test("salted join equals plain join for any salt count") {
    import spark.implicits.{localSeqToDatasetHolder, newProductEncoder}
    forAll2(Gen.choose(1, 16), Gen.choose(1, 200)) { (salts: Int, n: Int) =>
      val probe = (1 to n).map(i => (i.toLong % 5, i)).toDF("k", "p")
      val build = (0L to 4L).map(k => (k, s"d$k")).toDF("k", "name")
      val salted = SkewOps.saltedJoin(probe, build, "k", salts, col("p"))
      val plain = probe.join(build, "k")
      assert(salted.exceptAll(plain).count() == 0)
      assert(plain.exceptAll(salted).count() == 0)
    }
  }

  test("top-k aggregator laws: any partition + merge order gives the sorted top-k") {
    // Partial aggregation is only correct if the buffer algebra commutes
    // with arbitrary partitioning and merge grouping — the law Spark
    // exploits when it map-side-combines. No Spark job needed: the laws
    // are pure buffer algebra.
    val agg = new TypedOps.TopKOrders(3)
    val item = Gen.zip(Gen.chooseNum(1L, 50L), Gen.chooseNum(0.0, 10.0))
    forAll2(Gen.listOf(item), Gen.chooseNum(1, 7), n = 8) { (xs, splitN) =>
      // feed distinct (score,id) pairs: the reference ranking below dedups,
      // and the aggregator (correctly) keeps whatever multiset it is given
      val in = xs.map { case (id, v) => (v, id) }.distinct
      val exp = in.sortBy { case (v, id) => (-v, id) }.take(3)
      // sequential reduce
      val seq = in.foldLeft(agg.zero) { (b, x) => agg.reduce(b, (x._2, x._1)) }
      assert(seq.items == exp)
      // arbitrary partitioning, then merges in arbitrary grouping order
      val parts = in.grouped(math.max(1, in.length / splitN)).toList
      val bufs = parts.map(_.foldLeft(agg.zero) { (b, x) => agg.reduce(b, (x._2, x._1)) })
      val mergedLtr = bufs.foldLeft(agg.zero)(agg.merge)
      val mergedRtl = bufs.foldRight(agg.zero)(agg.merge)
      assert(mergedLtr.items == exp, s"LTR merge broke on $in split $splitN")
      assert(mergedRtl.items == exp, s"RTL merge broke on $in split $splitN")
    }
  }

  test("bpe training law: the engine's merge table equals a reference BPE for any corpus") {
    import spark.implicits.{localSeqToDatasetHolder, newStringEncoder}
    // reference implementation: word-frequency BPE with greedy left-to-right
    // merging and (count desc, pair asc) selection — written imperatively,
    // independent of the DataFrame fold under test
    def refBpe(texts: List[String], k: Int): Seq[(Long, String, String, Long)] = {
      val wc = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      var seqs: Map[String, Vector[String]] =
        wc.keys.map(w => w -> w.map(_.toString).toVector).toMap
      (1 to k).iterator.map { r =>
        val pc = scala.collection.mutable.Map.empty[(String, String), Long]
        for ((w, s) <- seqs; i <- 0 until s.length - 1)
          pc((s(i), s(i + 1))) = pc.getOrElse((s(i), s(i + 1)), 0L) + wc(w)
        if (pc.isEmpty) None
        else {
          val ((p1, p2), n) = pc.minBy { case ((a, b), c) => (-c, a, b) }
          def merge(s: Vector[String]): Vector[String] =
            s.foldLeft(Vector.empty[String]) { (acc, t) =>
              if (acc.nonEmpty && acc.last == p1 && t == p2)
                acc.init :+ (p1 + p2)
              else acc :+ t
            }
          seqs = seqs.view.mapValues(merge).toMap
          Some((r.toLong, p1, p2, n))
        }
      }.takeWhile(_.isDefined).flatten.toSeq
    }
    // words over a 2-letter alphabet maximize overlapping-merge traps
    val word = Gen.listOfN(5, Gen.oneOf("a", "b")).map(_.mkString)
      .flatMap(w => Gen.choose(1, 5).map(w.take))
    val corpus = Gen.nonEmptyListOf(Gen.listOfN(4, word).map(_.mkString(" ")))
    forAllSeeded(corpus, n = 4) { texts =>
      val got = LlmTextOps.bpeTrainOf(texts.toDF("text"), 3).collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
        .toSeq
      assert(got == refBpe(texts, 3), s"bpe diverged on corpus $texts")
    }
  }
}
