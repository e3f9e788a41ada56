package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.io.RefFormats
import graft.ops._ // $"col" interpolator

/** Goldens against the reference repo's bundled data files (read-only).
  * Counts and spot values were computed independently (DuckDB/wc) from the
  * raw files. */
class RefFormatsSpec extends AnyFunSuite {
  private lazy val spark = SparkTestSession.spark
  private val ref = "/root/reference"

  test("customer.tbl: 1500 typed rows, spot row 1") {
    val df = RefFormats.customerTbl(spark,
      s"$ref/Assignment 7/data/customer.tbl")
    assert(df.count() == 1500)
    val r = df.filter($"c_custkey" === 1).collect().head
    assert(r.getAs[String]("c_name") == "Customer#000000001")
    assert(math.abs(r.getAs[Double]("c_acctbal") - 711.56) < 1e-9)
    assert(r.getAs[Int]("c_nationkey") == 15)
  }

  test("order.tbl: 15000 typed rows, dates kept as strings") {
    val df = RefFormats.orderTbl(spark, s"$ref/Assignment 7/data/order.tbl")
    assert(df.count() == 15000)
    assert(df.schema("o_orderdate").dataType.typeName == "string")
    assert(df.filter($"o_orderdate".rlike("^\\d{4}-\\d{2}-\\d{2}$")).count() == 15000)
  }

  test("weather CSV: banner skipped, M→null, first reading per hour kept") {
    val df = RefFormats.weatherCsv(spark,
      s"$ref/Assignment 4/Assig-4/Assig-4/data/vancouver.csv", "YVR")
    // 10407 data rows collapse to 8435 distinct station-hours
    assert(df.count() == 8435)
    assert(df.groupBy($"date", $"hour").count().filter($"count" > 1).count() == 0)
    val r = df.filter($"date" === "2021-10-04" && $"hour" === 21).collect().head
    assert(r.getAs[Double]("temperature") == 57.0)
    assert(r.isNullAt(r.fieldIndex("gust"))) // sentinel M → null
    assert(r.getAs[String]("station") == "YVR")
  }

  test("users.txt quoted-KV: 5996 rows, typed fields, float lon/lat") {
    val df = RefFormats.usersKv(spark, s"$ref/Assignment 5/users.txt")
    assert(df.count() == 5996) // wc -l says 5995: no trailing newline
    val r = df.filter($"user_id" === 1).collect().head
    assert(r.getAs[String]("first_name") == "Mohammed")
    assert(r.getAs[String]("last_name") == "Ahern")
    assert(r.getAs[String]("country") == "China")
    assert(math.abs(r.getAs[Double]("longitude") - 105.324979) < 1e-9)
    assert(r.getAs[Long]("last_login") == 1581151007L)
    assert(r.getAs[java.sql.Timestamp]("last_login_ts").toInstant.getEpochSecond
      == 1581151007L)
  }

  test("RediSearch tag+range query on real users.txt matches a python recount") {
    // golden computed independently: China|Russia users with 40<=lat<=46
    val rows = ops.RefDataOps.usersSearch.run(spark, "").collect()
    assert(rows.length == 161) // independent python recount over users.txt
    rows.foreach { r =>
      assert(Set("China", "Russia")(r.getString(3)))
      val lat = r.getDouble(4)
      assert(lat >= 40 && lat <= 46)
    }
  }

  test("leaderboard:2 top-10 matches an independent python recount (Redis tie order)") {
    // golden: sorted (-score, member-string desc) over leaderboard:2 rows of
    // userscores.csv, emails joined from users.txt — computed outside Spark
    val rows = ops.RefDataOps.scoresTop10.run(spark, "").collect()
    assert(rows.map(_.getInt(1)).toSeq ==
      Seq(2468, 501, 318, 2971, 2491, 1972, 1731, 1868, 3326, 2082))
    assert(rows.map(_.getInt(2)).toSeq ==
      Seq(499, 498, 498, 498, 498, 498, 498, 497, 496, 496))
    assert(rows.map(_.getInt(0)).toSeq == (1 to 10))
    assert(rows.head.getString(3) == "dpriddlecz@wp.com")
    assert(rows.last.getString(3) == "bbowhay29@economist.com")
    assert(rows.forall(!_.isNullAt(3)))
  }

  test("userscores.csv: 3911 rows, int scores, leaderboard tags") {
    val df = RefFormats.scoresCsv(spark, s"$ref/Assignment 5/userscores.csv")
    assert(df.count() == 3911) // header + 3911 CRLF data rows, no final \n
    val r = df.filter($"user_id" === 1 && $"leaderboard" === "leaderboard:3")
      .collect().head
    assert(r.getAs[Int]("score") == 19)
  }
}
