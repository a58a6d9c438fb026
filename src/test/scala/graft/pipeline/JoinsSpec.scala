package graft.pipeline

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.joins.Joins
import graft.kmeans.SparkTestSession

class JoinsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("asofJoin picks the latest preceding right row; no match -> nulls") {
    val clicks = Seq(
      (7L, 1L, ts("2024-01-01 10:00:00")),
      (7L, 2L, ts("2024-01-01 12:00:00")),
      (9L, 3L, ts("2024-01-01 10:00:00"))) // user 9 has no views
      .toDF("user_id", "click_id", "ts")
    val views = Seq(
      (7L, ts("2024-01-01 09:00:00"), 100L),
      (7L, ts("2024-01-01 11:00:00"), 101L),
      (7L, ts("2024-01-01 13:00:00"), 102L)) // after both clicks
      .toDF("user_id", "vts", "view_id")
    val got = Joins.asofJoin(clicks, views, "user_id", "ts", "vts", "view_id")
      .select($"click_id", $"asof_value")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    assert(got === Map(1L -> Some(100L), 2L -> Some(101L), 3L -> None))
  }

  test("asofJoin ties on timestamp break to the larger value") {
    val l = Seq((1L, 10L, ts("2024-01-01 10:00:00"))).toDF("k", "lid", "ts")
    val r = Seq(
      (1L, ts("2024-01-01 10:00:00"), 5L),
      (1L, ts("2024-01-01 10:00:00"), 9L)).toDF("k", "vts", "v")
    val got = Joins.asofJoin(l, r, "k", "ts", "vts", "v")
      .select($"asof_value").as[Long].head()
    assert(got === 9L)
  }

  test("asofJoin matches driver-side brute force on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(11)
    val left = (1L to 120L).map(i =>
      (rnd.nextInt(6).toLong, i, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00")))
    val right = (1L to 80L).map(i =>
      (rnd.nextInt(6).toLong, ts(f"2024-01-01 ${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:00"), 1000L + i))
    val got = Joins.asofJoin(
        left.toDF("k", "lid", "ts"), right.toDF("k", "vts", "v"),
        "k", "ts", "vts", "v")
      .select($"lid", $"asof_value")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1))))
      .toMap
    left.foreach { case (k, lid, lts) =>
      // latest preceding right row for the key; ties on ts -> max value
      val want = right.filter(r => r._1 == k && !r._2.after(lts))
        .sortBy(r => (r._2.getTime, r._3)).lastOption.map(_._3)
      assert(got(lid) === want, s"left row $lid (k=$k, ts=$lts)")
    }
  }

  test("timeBoundJoin keeps only right events inside [lts, lts+window]") {
    val v = Seq((7L, 100L, ts("2024-01-01 00:00:00")))
      .toDF("v_user", "view_id", "vts")
    val c = Seq(
      (7L, 200L, ts("2024-01-01 00:10:00")),
      (7L, 201L, ts("2024-01-01 00:30:00")), // boundary: included
      (7L, 202L, ts("2024-01-01 00:31:00")),
      (8L, 203L, ts("2024-01-01 00:10:00"))) // other user
      .toDF("c_user", "click_id", "cts")
    val got = Joins.timeBoundJoin(v, c, "v_user", "c_user", "vts", "cts", "30 minutes")
      .select($"click_id").as[Long].collect().toSet
    assert(got === Set(200L, 201L))
  }

  // ---------------------------------------------------------- interval join

  test("intervalJoin matches the brute-force overlap predicate on random " +
      "intervals, each pair exactly once (incl. multi-bucket spans)") {
    val rnd = new scala.util.Random(17)
    // widths from sub-bucket to 5-bucket spans; negative starts too
    def ivs(n: Int, idBase: Long) = (0 until n).map { i =>
      val s = rnd.nextInt(4000).toLong - 500L
      (idBase + i, s, s + rnd.nextInt(500).toLong)
    }
    val l = ivs(60, 0L).toDF("l_id", "l_s", "l_e")
    val r = ivs(60, 1000L).toDF("r_id", "r_s", "r_e")
    val got = Joins.intervalJoin(l, r, "l_s", "l_e", "r_s", "r_e", 100L)
      .select($"l_id", $"r_id").as[(Long, Long)].collect().toSeq
    val lc = l.as[(Long, Long, Long)].collect()
    val rc = r.as[(Long, Long, Long)].collect()
    val expect = for {
      (li, ls, le) <- lc.toSeq
      (ri, rs, re) <- rc.toSeq
      if rs <= le && ls <= re
    } yield (li, ri)
    assert(got.sorted === expect.sorted) // Seq compare: duplicates surface
  }

  test("intervalJoin drops malformed (end < start) intervals instead of " +
      "manufacturing overlaps from descending bucket sequences") {
    val l = Seq((1L, 100L, 50L), (2L, 0L, 10L)).toDF("l_id", "l_s", "l_e")
    val r = Seq((9L, 0L, 200L)).toDF("r_id", "r_s", "r_e")
    val got = Joins.intervalJoin(l, r, "l_s", "l_e", "r_s", "r_e", 60L)
      .select($"l_id").as[Long].collect().toSet
    assert(got === Set(2L))
  }

  test("intervalJoin rejects non-positive bucket width and ambiguous names") {
    val d = Seq((1L, 0L, 1L)).toDF("a_id", "a_s", "a_e")
    intercept[IllegalArgumentException](
      Joins.intervalJoin(d, d, "a_s", "a_e", "a_s", "a_e", 10L))
    val r = Seq((2L, 0L, 1L)).toDF("b_id", "b_s", "b_e")
    intercept[IllegalArgumentException](
      Joins.intervalJoin(d, r, "a_s", "a_e", "b_s", "b_e", 0L))
  }
}
