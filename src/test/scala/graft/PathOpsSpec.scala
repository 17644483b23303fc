package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.dfw.PathOps

/** Journey analytics: hand-derived fixtures for the top-k path counts
  * and the Markov removal-effect solve (the latter's expected ppm
  * values are worked by hand in the comments — the same integer
  * Jacobi arithmetic the oracle CTEs unroll).
  */
class PathOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("topPaths: trigrams per (user, day), counted and ranked") {
    val ev = Seq(
      (1L, ts(1), 1L, "A"), (1L, ts(2), 2L, "B"),
      (1L, ts(3), 3L, "C"), (1L, ts(4), 4L, "D"),
      (2L, ts(1), 5L, "A"), (2L, ts(2), 6L, "B"), (2L, ts(3), 7L, "C"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = PathOps.topPaths(ev, col("user_id"), col("ts"),
        col("event_type"), Seq(col("ts"), col("event_id")), n = 3, k = 10)
      .as[(String, Long)].collect().toSeq
    got shouldBe Seq(("A>B>C", 2L), ("B>C>D", 1L))
  }

  test("markovAttribution: hand-solved 3-journey chain, exact ppm") {
    // J1: view click purchase | J2: view | J3: click purchase
    // counts: start→view 2, start→click 1, view→click 1, view→null 1,
    //         click→conv 2
    // base:   p(click)=1e6, p(view)=500000, p(start)=2e6/3=666666
    // -view:  start→null 2, start→click 1 ⇒ p(start)=333333
    //         removal = 333333·1e6/666666 = 500000 exact
    // -click: view→null only ⇒ p(start)=0, removal = 1000000
    // attr:   500000/1500000=333333 ppm, 1000000/1500000=666666 ppm
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "click"), (1L, ts(3), 3L, "purchase"),
      (2L, ts(1), 4L, "view"),
      (3L, ts(1), 5L, "click"), (3L, ts(2), 6L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = PathOps.markovAttribution(ev, col("user_id"), col("ts"),
        col("event_type"), "purchase", Seq(col("ts"), col("event_id")), iters = 40)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(
      ("click", 666666L, 0L, 1000000L, 666666L),
      ("view", 666666L, 333333L, 500000L, 333333L))
  }

  test("markovAttribution: conversion-first journey feeds start→conv; no channels → empty") {
    val ev = Seq((1L, ts(1), 1L, "purchase"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = PathOps.markovAttribution(ev, col("user_id"), col("ts"),
      col("event_type"), "purchase", Seq(col("ts"), col("event_id")))
    got.count() shouldBe 0L // p(start)=1e6 but there are no channels to rank
  }

  test("markovAttribution: journeys truncate at the FIRST conversion") {
    // view purchase view view — the trailing views must not create
    // view→view transitions (p(view) would drop below 1e6 otherwise)
    val ev = Seq(
      (1L, ts(1), 1L, "view"), (1L, ts(2), 2L, "purchase"),
      (1L, ts(3), 3L, "view"), (1L, ts(4), 4L, "view"))
      .toDF("user_id", "ts", "event_id", "event_type")
    val got = PathOps.markovAttribution(ev, col("user_id"), col("ts"),
        col("event_type"), "purchase", Seq(col("ts"), col("event_id")))
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    got shouldBe Seq(("view", 1000000L, 0L, 1000000L, 1000000L))
  }
}
