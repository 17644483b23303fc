package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.dfw.Config
import graft.sources.Tables

/** Driver-side config semantics (S3/S4, T8/T10) — no Spark needed. */
class ConfigSpec extends AnyFunSuite with Matchers {

  test("S3 renderPath substitutes {key} templates (tools.py:114-123)") {
    Tables.renderPath("done_{name}.parquet", Map("name" -> "iris")) shouldBe "done_iris.parquet"
    Tables.renderPath("{root}/{name}_{k}.bin",
      Map("root" -> "/data", "name" -> "x", "k" -> 3)) shouldBe "/data/x_3.bin"
  }

  test("S3 renderPath rejects unsupported value types") {
    an[IllegalArgumentException] should be thrownBy
      Tables.renderPath("{a}", Map("a" -> Seq(1, 2)))
  }

  test("S4 normalizeFormat strips any case-variant suffix then re-appends") {
    Tables.normalizeFormat("data") shouldBe "data.parquet"
    Tables.normalizeFormat("data.PARQUET") shouldBe "data.parquet"
    Tables.normalizeFormat("data.Parquet") shouldBe "data.parquet"
  }

  test("T8 setDefaults: user keys win, missing keys filled, inputs untouched") {
    val defaults = Map("a" -> 1, "b" -> 2)
    val user = Map("b" -> 9)
    Config.setDefaults(defaults, user) shouldBe Map("a" -> 1, "b" -> 9)
    user shouldBe Map("b" -> 9) // no caller mutation (documented divergence from tools.py:50-55)
  }

  test("T10 matchAndFill: scalar broadcasts to every database") {
    val (filled, warnings) = Config.matchAndFill(Seq("d1", "d2"), "train", Left(0.5))
    filled shouldBe Map("d1" -> 0.5, "d2" -> 0.5)
    warnings shouldBe empty
  }

  test("T10 matchAndFill: per-db map with default fallback and unknown-key warning") {
    val (filled, warnings) = Config.matchAndFill(Seq("d1", "d2"), "train",
      Right(Map("d1" -> 0.7, "default" -> 0.5, "typo" -> 0.9)))
    filled shouldBe Map("d1" -> 0.7, "d2" -> 0.5)
    warnings should have size 1
    warnings.head should include("typo")
  }

  test("T10 matchAndFill: missing databases without a default is fatal") {
    an[IllegalArgumentException] should be thrownBy
      Config.matchAndFill(Seq("d1", "d2"), "train", Right(Map("d1" -> 0.7)))
  }

  test("ProcessConfig validation mirrors the reference's checks") {
    an[IllegalArgumentException] should be thrownBy Config.ProcessConfig(cv = 0)
    an[IllegalArgumentException] should be thrownBy Config.ProcessConfig(train = Nil)
  }

  // name_map indirection, reference preprocess.py:333-341
  test("mapNames: names indirect through name_map") {
    Config.mapNames(Seq("a", "b"), Map("a" -> "db_a", "b" -> "db_b")) shouldBe
      Seq("db_a", "db_b")
  }

  test("mapNames: empty name_map (reference None) passes names through") {
    Config.mapNames(Seq("a", "b"), Map.empty) shouldBe Seq("a", "b")
  }

  test("mapNames: missing key is fatal with the reference's message") {
    val e = the[IllegalArgumentException] thrownBy
      Config.mapNames(Seq("a", "missing"), Map("a" -> "db_a"))
    e.getMessage should include("name_map")
    e.getMessage should include("missing")
  }
}
