package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.dfw.{Config, PreProcess, SplitOps}

/** End-to-end facade semantics: the reference's generator lifecycle
  * (`preprocess.py:24-99`) plus the implicit invariants it guarantees.
  */
class PreProcessSpec extends SparkSpec {
  import spark.implicits._

  /** Two dbs x two classes x 12 samples each, 3 features. */
  private def samples: DataFrame =
    (for {
      db <- Seq("d1", "d2"); cls <- 0 to 1; i <- 0 until 12
    } yield (db, "default", cls, (cls * 100 + i).toLong,
        Seq(i.toDouble, i * 2.0, db.length.toDouble)))
      .toDF("db", "descriptor", "cls", "sample_id", "features")

  private def pp = PreProcess(samples, config = Config.ProcessConfig(
    center = true, extend = true, cv = 3, train = Seq(SplitOps.Frac(0.5))))

  test("generator: train/test partition covers every sample exactly once") {
    val g = pp.generator(trial = 0).cache()
    g.count() shouldBe 48
    g.select("db", "cls", "sample_id").distinct().count() shouldBe 48
    // per class: 6 train + 6 test
    val counts = g.groupBy("db", "cls", "role").count()
      .select("count").as[Long].collect().toSet
    counts shouldBe Set(6L)
  }

  test("generator: extend appends bias before centering; per-descriptor train mean is ~0") {
    val g = pp.generator(trial = 0)
    g.select(expr("size(features)")).distinct().as[Int].collect() shouldBe Array(4)
    // the reference centers over the concatenated train matrix per
    // (db, descriptor) across ALL classes (preprocess.py:76-79)
    val trainMeans = g.filter(col("role") === "train")
      .select(col("db"), col("descriptor"), posexplode(col("features_centered")).as(Seq("p", "v")))
      .groupBy("db", "descriptor", "p").agg(avg("v").as("m"))
      .select("m").as[Double].collect()
    all(trainMeans.map(math.abs)) should be < 1e-9
  }

  test("generator: per-class train means are NOT zero — inter-class separation survives centering") {
    // classes differ in their mean feature values; subtracting the shared
    // per-descriptor mean must leave that separation intact (the reference
    // never zeroes per-class means)
    val s = (for {
      cls <- 0 to 1; i <- 0 until 8
    } yield ("d", "default", cls, (cls * 100 + i).toLong,
        Seq(cls * 10.0 + i, cls * 20.0)))
      .toDF("db", "descriptor", "cls", "sample_id", "features")
    val g = PreProcess(s, config = Config.ProcessConfig(
      center = true, extend = false, cv = 2, train = Seq(SplitOps.Frac(0.5))))
      .generator(0)
    val perClass = g.filter(col("role") === "train")
      .select(col("cls"), element_at(col("features_centered"), 2).as("v"))
      .groupBy("cls").agg(avg("v").as("m"))
      .orderBy("cls").select("m").as[Double].collect()
    perClass(0) should be < -1.0 // class 0 sits below the shared mean
    perClass(1) should be > 1.0  // class 1 above it
  }

  test("withTrain re-derives splits lazily (the reference's train setter)") {
    val bigger = pp.withTrain(SplitOps.Frac(0.75)).generator(0)
    bigger.filter(col("role") === "train").count() shouldBe 4 * 9 // round(12*.75)=9
    // original facade unchanged
    pp.generator(0).filter(col("role") === "train").count() shouldBe 4 * 6
  }

  test("cvData: folds are disjoint, cover the train prefix, one test chunk per fold") {
    val cvd = pp.cvData(trial = 0).cache()
    // 4 (db,cls) groups x 6 train samples x 3 cv folds
    cvd.count() shouldBe 4 * 6 * 3
    // within each (db, cls, cv_fold): test rows = that fold's chunk
    val testSizes = cvd.filter(col("cv_role") === "test")
      .groupBy("db", "cls", "cv_fold").count().select("count").as[Long].collect()
    testSizes.sum shouldBe 4 * 6 // each train sample is test exactly once
    all(testSizes) shouldBe 2L   // linspace(0,6,4) -> equal chunks of 2
  }

  test("cvData: bias extension applies before the fold cut (preprocess.py:54-56)") {
    val cvd = pp.cvData(trial = 0)
    cvd.select(expr("size(features)")).distinct().as[Int].collect() shouldBe Array(4)
    // per-fold train mean ~0 per (db, descriptor, cv_fold) across classes
    val foldMeans = cvd.filter(col("cv_role") === "train")
      .select(col("db"), col("descriptor"), col("cv_fold"),
        posexplode(col("features_centered")).as(Seq("p", "v")))
      .groupBy("db", "descriptor", "cv_fold", "p").agg(avg("v").as("m"))
      .select("m").as[Double].collect()
    all(foldMeans.map(math.abs)) should be < 1e-9
  }

  test("stored permutations drive the gather order when provided") {
    val s = (0 until 4).map(i => ("d", "default", 0, i.toLong, Seq(i.toDouble)))
      .toDF("db", "descriptor", "cls", "sample_id", "features")
    // trial 0 reverses the ids
    val perm = (0 until 4).map(i => ("d", "default", 0, 0, (3 - i).toLong, i.toLong))
      .toDF("db", "descriptor", "cls", "trial", "pos", "sample_id")
    val ranked = PreProcess(s, Some(perm)).ranked(trial = 0)
      .orderBy("pos").select("sample_id").as[Long].collect()
    ranked shouldBe Array(3L, 2L, 1L, 0L)
  }

  test("classNum counts distinct classes per (db, descriptor)") {
    val got = pp.classNum.select("db", "class_num").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    got shouldBe Map("d1" -> 2L, "d2" -> 2L)
  }

  test("offsets shift each class by cumulative preceding train sizes") {
    val got = PreProcess(samples).offsets(0)
      .filter(col("db") === "d1").orderBy("cls")
      .select("offset").as[Long].collect()
    got shouldBe Array(0L, 6L) // cls 0 first (6 train rows), cls 1 offset by 6
  }
}
