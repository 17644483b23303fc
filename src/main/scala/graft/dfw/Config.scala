package graft.dfw

/** Config model (SURVEY.md §2.5 T8/T10, §2.2 P5).
  *
  * The reference drives everything from nested dicts with
  * scalar→per-database broadcast and a `'default'`-key fallback
  * (`/root/reference/DFW/preprocess.py:212-242,435-466`), defaults
  * merged by mutating the caller's dict (`tools.py:50-55`). Here the
  * same semantics are immutable Scala values; validation happens at
  * construction instead of deep inside the pipeline.
  */
object Config {

  val DefaultKeyName = "default"

  /** Per-database preprocessing settings
    * (defaults: `/root/reference/DFW/predefine.py:17-22`).
    */
  final case class ProcessConfig(
      center: Boolean = true,
      extend: Boolean = false,
      cv: Int = 5,
      train: Seq[SplitOps.TrainSpec] = Seq(SplitOps.Frac(0.5))) {
    require(cv >= 1, s""""cv" item should be a positive integer, got $cv""")
    require(train.nonEmpty, """"train" item should not be empty""")
  }

  /** Per-database load settings
    * (defaults: `predefine.py:6-15`; range is 1-based inclusive,
    * (-1, _) means "all classes", `preprocess.py:413-419`).
    */
  final case class LoadConfig(
      format: String = "done_{name}.parquet",
      root: String = ".",
      range: (Int, Int) = (-1, -1),
      labeled: Boolean = false)

  /** T8: default-merge — copy missing keys from defaults into the user
    * config. The reference mutates the caller's dict (`tools.py:50-55`);
    * we return a new map (documented divergence, SURVEY.md §5.4).
    */
  def setDefaults[V](defaults: Map[String, V], user: Map[String, V]): Map[String, V] =
    defaults ++ user

  /** T10: scalar→per-database broadcast-fill with `'default'` fallback
    * (`preprocess.py:435-466`). `item` may be:
    *  - `Left(scalar)` — replicated to every database;
    *  - `Right(perDb)` — per-database map; databases missing from the
    *    map fall back to the `'default'` entry, which must then exist.
    * Unknown keys in a per-database map are reported via the returned
    * warnings (reference prints to stdout, `tools.py:83-85`).
    */
  def matchAndFill[V](names: Seq[String], key: String,
                      item: Either[V, Map[String, V]]): (Map[String, V], Seq[String]) =
    item match {
      case Left(scalar) => (names.map(_ -> scalar).toMap, Nil)
      case Right(perDb) =>
        val unknown = perDb.keySet -- names.toSet - DefaultKeyName
        val warnings =
          if (unknown.nonEmpty)
            Seq(s"""found unknown key set [${unknown.toSeq.sorted.mkString(", ")}] in "$key" item!""")
          else Nil
        if (!perDb.contains(DefaultKeyName) && !names.forall(perDb.contains))
          throw new IllegalArgumentException(
            s"""could not match length of "name" item and "$key" item, please set "default" item at least!""")
        (names.map(n => n -> perDb.getOrElse(n, perDb(DefaultKeyName))).toMap, warnings)
    }
}
