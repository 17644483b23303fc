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

  /** `name_map` indirection (`preprocess.py:333-341`): when a
    * `name_map` dict is configured, every entry of the `name` list is
    * looked up through it (`operator.itemgetter(*name)(name_map)`) and
    * the MAPPED names become the database list; a missing key is fatal
    * with the reference's message (KeyError → `err_exit_mesg`, here an
    * IllegalArgumentException — T12 discipline, no sys.exit).
    * `nameMap = None` (here: empty map) passes names through unchanged.
    *
    * Documented divergence (SURVEY.md §5.4 discipline): for a
    * SINGLE-element `name` list the reference's
    * `list(itemgetter(n)(m))` iterates the looked-up VALUE — a string
    * value explodes into its characters, an int value raises
    * TypeError. That is an accident of `itemgetter`'s scalar return,
    * not a semantic; we map one name to one value in every arity.
    */
  def mapNames(names: Seq[String], nameMap: Map[String, String]): Seq[String] =
    if (nameMap.isEmpty) names
    else names.map { n =>
      nameMap.getOrElse(n, throw new IllegalArgumentException(
        s"""could not find "'$n'" key in name_map, please recheck it!"""))
    }

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
