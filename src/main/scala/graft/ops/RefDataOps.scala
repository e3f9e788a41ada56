package graft.ops

import org.apache.spark.sql.functions._

import graft.QueryDef
import graft.io.RefFormats

/** Queries over the reference repo's OWN bundled datasets (read-only at
  * /root/reference), run through the graft parsers — the closest possible
  * replication of what the reference actually executes. Registered
  * rows-only: the DuckDB oracle only sees the sfDir parquet tables, so
  * these are value-checked by RefFormatsSpec goldens instead.
  */
object RefDataOps {

  private val RefRoot = "/root/reference"

  /** The Bigtable assignment end-to-end: all three station CSVs → hourly
    * downsample → per-station monthly max temperature
    * (`Bigtable.java:56-113,166-183`; the reference loads SEA/YVR/PDX the
    * same way, then runs the "summer months" max across stations). */
  val weatherMonthlyMax: QueryDef =
    QueryDef.rowsOnly("ref_weather_monthly_max") { (spark, _) =>
      val data = s"$RefRoot/Assignment 4/Assig-4/Assig-4/data"
      Seq("seatac" -> "SEA", "vancouver" -> "YVR", "portland" -> "PDX")
        .map { case (f, st) => RefFormats.weatherCsv(spark, s"$data/$f.csv", st) }
        .reduce(_ union _)
        .groupBy($"station", year($"date").as("yr"), month($"date").as("mo"))
        .agg(max($"temperature").as("max_temp"),
          count(lit(1)).as("n_hours"))
        .orderBy($"station", $"yr", $"mo")
    }

  /** The RediSearch query on the real users.txt (`redis_client.py:303-340`:
    * `(@country:{China}|@country:{Russia}) @latitude:[40 46]`), through the
    * quoted-KV parser. */
  val usersSearch: QueryDef =
    QueryDef.rowsOnly("ref_users_search") { (spark, _) =>
      RefFormats.usersKv(spark, s"$RefRoot/Assignment 5/users.txt")
        .filter($"country".isin("China", "Russia") &&
          $"latitude".between(40, 46))
        .select($"user_id", $"first_name", $"last_name", $"country",
          $"latitude")
        .orderBy($"user_id")
    }

  /** The Mongo top-5-customers pipeline on the reference's own .tbl files
    * (`MongoDB.java:432-468` over `Assignment 7/data/{customer,order}.tbl`). */
  val tblTop5Customers: QueryDef =
    QueryDef.rowsOnly("ref_tbl_top5_customers") { (spark, _) =>
      val c = RefFormats.customerTbl(spark, s"$RefRoot/Assignment 7/data/customer.tbl")
      val o = RefFormats.orderTbl(spark, s"$RefRoot/Assignment 7/data/order.tbl")
      c.join(o, c("c_custkey") === o("o_custkey"))
        .groupBy($"c_custkey")
        .agg(round(sum($"o_totalprice"), 2).as("total_order_amount"),
          first($"c_name").as("c_name"))
        .orderBy(desc("total_order_amount"), asc("c_custkey"))
        .limit(5)
        .select($"c_custkey", $"c_name", $"total_order_amount")
    }

  /** The Redis leaderboard query end-to-end on the reference's OWN files
    * (`redis_client.py:427-465` query5: `zrevrange('leaderboard:2', 0, 9,
    * withscores=True)` then a per-member `hget(email)` loop): top-10 of
    * leaderboard:2 with Redis's exact tie order — score desc, then member
    * string desc, since ZREVRANGE reverses the sorted set's (score,
    * member-lex-asc) order — joined to the parsed users.txt hash table for
    * emails. The reference's 10 sequential RPCs become one broadcast join of
    * the 10-row top-k; left join keeps a NULL email exactly where the
    * reference appends None. */
  val scoresTop10: QueryDef =
    QueryDef.rowsOnly("ref_scores_top10") { (spark, _) =>
      import org.apache.spark.sql.expressions.Window
      val top = RefFormats.scoresCsv(spark, s"$RefRoot/Assignment 5/userscores.csv")
        .filter($"leaderboard" === "leaderboard:2")
        .withColumn("member", concat(lit("user:"), $"user_id"))
        .orderBy(desc("score"), desc("member"))
        .limit(10) // TakeOrderedAndProject — top-k before any join
        .withColumn("rank",
          row_number().over(Window.orderBy(desc("score"), desc("member"))))
      val users = RefFormats.usersKv(spark, s"$RefRoot/Assignment 5/users.txt")
        .select($"user_id".as("u_id"), $"email")
      broadcast(top).join(users, top("user_id") === $"u_id", "left")
        .select($"rank", $"user_id", $"score", $"email")
        .orderBy($"rank")
    }

  val all: Seq[QueryDef] =
    Seq(weatherMonthlyMax, usersSearch, tblTop5Customers, scoresTop10)
}
