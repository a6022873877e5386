package graft.ops

import graft.SparkSpec

class AsOfJoinSpec extends SparkSpec {

  import spark.implicits._

  private val left = Seq(
    (1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L), // key 1 at ts 10/20/5
    (1L, 8L, 104L), // equal-ts inclusivity vs right (1, 8)
    (2L, 7L, 103L) // key with no right rows
  ).toDF("k", "ts", "lid")

  private val right = Seq(
    (1L, 8L, 200L),
    (1L, 15L, 201L), (1L, 15L, 202L), // duplicate ts -> max payload 202 wins
    (3L, 1L, 203L) // key with no left rows
  ).toDF("k", "ts", "rid")

  test("asOf matches the latest right row at or before each left ts; left-join semantics") {
    val out = AsOfJoin.asOf(left, right, "k", "ts", "lid", "rid")
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out === Map(
      100L -> Some(200L), // ts 10 -> right ts 8
      101L -> Some(202L), // ts 20 -> right ts 15, equal-ts dup resolved to max id
      102L -> None, // ts 5 precedes every right row
      104L -> Some(200L), // ts 8 == right ts 8 (inclusive)
      103L -> None // no right rows for key 2
    ))
  }

  test("asOf is partitioning-invariant and emits exactly one row per left row") {
    val base = AsOfJoin.asOf(left, right, "k", "ts", "lid", "rid")
      .collect().map(_.toSeq).toSet
    val shuffled = AsOfJoin.asOf(left.repartition(7), right.repartition(3),
      "k", "ts", "lid", "rid")
      .collect().map(_.toSeq).toSet
    assert(base === shuffled)
    assert(base.size === left.count())
  }

  test("asOfAll carries a multi-column payload from ONE winning right row") {
    // trades (key, ts, price, ccy, venue): the enrichment columns must
    // never mix across right rows — a left row matching ts 15 gets
    // (320, "eur", "B") as a unit, the lexicographic max among the
    // equal-ts pair, not max price + max ccy independently
    val trades = Seq(
      (1L, 8L, 500L, "usd", "A"),
      (1L, 15L, 320L, "eur", "B"),
      (1L, 15L, 320L, "chf", "Z"), // equal ts AND price: ccy breaks the tie
      (3L, 1L, 900L, "gbp", "C")
    ).toDF("k", "ts", "price", "ccy", "venue")
    val out = AsOfJoin.asOfAll(left, trades, "k", "ts", "lid",
      Seq("price", "ccy", "venue"))
      .collect()
      .map(r => r.getLong(0) -> (
        (if (r.isNullAt(3)) None else Some(r.getLong(3))),
        Option(r.getString(4)), Option(r.getString(5))))
      .toMap
    assert(out === Map(
      100L -> ((Some(500L), Some("usd"), Some("A"))), // ts 10 -> right ts 8
      101L -> ((Some(320L), Some("eur"), Some("B"))), // ts 20 -> max-(price,ccy,venue) of the ts-15 pair
      102L -> ((None, None, None)), // ts 5 precedes all
      104L -> ((Some(500L), Some("usd"), Some("A"))), // inclusive equal ts
      103L -> ((None, None, None)) // key 2 has no trades
    ))
    // schema contract: asof_-prefixed payload columns in order
    val cols = AsOfJoin.asOfAll(left, trades, "k", "ts", "lid",
      Seq("price", "ccy", "venue")).columns.toSeq
    assert(cols === Seq("lid", "k", "ts", "asof_price", "asof_ccy", "asof_venue"))
  }

  test("asOfAll has no join and no aggregate node (single-shuffle sweep)") {
    val trades = Seq((1L, 8L, 500L, "usd")).toDF("k", "ts", "price", "ccy")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    val plan =
      try AsOfJoin.asOfAll(left, trades, "k", "ts", "lid", Seq("price", "ccy"))
        .queryExecution.executedPlan
      finally spark.conf.set("spark.sql.adaptive.enabled", "true")
    def nodes(p: org.apache.spark.sql.execution.SparkPlan): Seq[String] =
      p.nodeName +: p.children.flatMap(nodes)
    val names = nodes(plan)
    assert(!names.exists(_.contains("Join")), names.mkString(", "))
    assert(!names.exists(_.contains("Aggregate")), names.mkString(", "))
    assert(names.count(_.contains("Exchange")) === 1, names.mkString(", "))
  }

  test("asOfNext matches the earliest right row at or after each left ts") {
    val out = AsOfJoin.asOfNext(left, right, "k", "ts", "lid", Seq("rid"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3))))
      .toMap
    assert(out === Map(
      100L -> Some(202L), // ts 10 -> next right ts 15, equal-ts dup resolved to max id
      101L -> None, // ts 20 is past every right row
      102L -> Some(200L), // ts 5 -> right ts 8
      104L -> Some(200L), // ts 8 == right ts 8 (inclusive)
      103L -> None // no right rows for key 2
    ))
  }

  test("asOfNext equals the correlated-subquery reference on a generated fixture") {
    val l = (0L until 200L).map(i => (i % 7, (i * 13) % 101, i)).toDF("k", "ts", "lid")
    val r = (0L until 150L).map(i => (i % 5, (i * 17) % 97, 1000L + i)).toDF("k", "ts", "rid")
    val out = AsOfJoin.asOfNext(l, r, "k", "ts", "lid", Seq("rid"))
      .collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3)))
      .toMap
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val expected = l.collect().map { x =>
      val (k, ts, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rRows.filter(rr => rr._1 == k && rr._2 >= ts)
      val best =
        if (cands.isEmpty) -1L
        else { val mts = cands.map(_._2).min; cands.filter(_._2 == mts).map(_._3).max }
      lid -> best
    }.toMap
    assert(out === expected)
  }

  test("asOfAll with a distinct right timestamp column name keeps the left name in the output") {
    val quotes = Seq(
      (1L, 8L, 200L), (1L, 15L, 201L)
    ).toDF("k", "quote_time", "rid")
    val out = AsOfJoin.asOfAll(left, quotes, "k", "ts", "lid", Seq("rid"),
      rightTsCol = Some("quote_time"))
    assert(out.columns.toSeq === Seq("lid", "k", "ts", "asof_rid"))
    val m = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    assert(m === Map(100L -> Some(200L), 101L -> Some(201L), 102L -> None,
      104L -> Some(200L), 103L -> None))
  }

  test("tolerance nulls stale backward matches but keeps the left row") {
    // lid 101 at ts 20 matches right ts 15 (age 5); lid 100 at ts 10
    // matches right ts 8 (age 2). tolerance 3 keeps only age <= 3.
    val out = AsOfJoin.asOfAll(left, right, "k", "ts", "lid", Seq("rid"),
      tolerance = Some(org.apache.spark.sql.functions.lit(3L)),
      emitMatchedTs = true)
    assert(out.columns.toSeq === Seq("lid", "k", "ts", "asof_rid", "asof_ts"))
    val m = out.collect().map(r => r.getLong(0) -> (
      (if (r.isNullAt(3)) None else Some(r.getLong(3))),
      (if (r.isNullAt(4)) None else Some(r.getLong(4))))).toMap
    assert(m === Map(
      100L -> ((Some(200L), Some(8L))), // age 2 <= 3
      101L -> ((None, None)), // age 5 > 3: stale -> non-match, row kept
      102L -> ((None, None)),
      104L -> ((Some(200L), Some(8L))), // age 0
      103L -> ((None, None))))
  }

  test("tolerance bounds the forward direction symmetrically") {
    val out = AsOfJoin.asOfAll(left, right, "k", "ts", "lid", Seq("rid"),
      forward = true,
      tolerance = Some(org.apache.spark.sql.functions.lit(3L)))
    val m = out.collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(3)) None else Some(r.getLong(3)))).toMap
    // ts 5 -> next right ts 8 (ahead 3, kept); ts 10 -> 15 (ahead 5, stale);
    // ts 20 -> nothing ahead; ts 8 -> 8 (ahead 0)
    assert(m === Map(102L -> Some(200L), 100L -> None, 101L -> None,
      104L -> Some(200L), 103L -> None))
  }

  test("non-orderable payload types fail loud at construction") {
    val mapRight = Seq((1L, 8L, Map("a" -> 1L))).toDF("k", "ts", "props")
    val e = intercept[IllegalArgumentException] {
      AsOfJoin.asOfAll(left, mapRight, "k", "ts", "lid", Seq("props"))
    }
    assert(e.getMessage.contains("non-orderable"))
    val e2 = intercept[IllegalArgumentException] {
      AsOfJoin.asOfAll(left, right, "k", "ts", "lid", Seq("ts", "rid"))
    }
    assert(e2.getMessage.contains("carried implicitly"))
  }

  test("asOf equals the correlated-subquery reference on a generated fixture") {
    val l = (0L until 200L).map(i => (i % 7, (i * 13) % 101, i)).toDF("k", "ts", "lid")
    val r = (0L until 150L).map(i => (i % 5, (i * 17) % 97, 1000L + i)).toDF("k", "ts", "rid")
    val out = AsOfJoin.asOf(l, r, "k", "ts", "lid", "rid")
      .collect()
      .map(x => x.getLong(0) -> (if (x.isNullAt(3)) -1L else x.getLong(3)))
      .toMap
    val rRows = r.collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val expected = l.collect().map { x =>
      val (k, ts, lid) = (x.getLong(0), x.getLong(1), x.getLong(2))
      val cands = rRows.filter(rr => rr._1 == k && rr._2 <= ts)
      val best =
        if (cands.isEmpty) -1L
        else { val mts = cands.map(_._2).max; cands.filter(_._2 == mts).map(_._3).max }
      lid -> best
    }.toMap
    assert(out === expected)
  }
}
