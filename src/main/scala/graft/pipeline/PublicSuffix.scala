package graft.pipeline

/** Vendored public-suffix snapshot (see
  * `resources/graft/public-suffix-snapshot.txt`), categorized by rule
  * shape for the registered-domain lookup in
  * [[TextAnalysis.registeredDomain]].
  *
  * The lookup never needs the rules as a DataFrame: the sets are a few
  * hundred strings at most, inlined as `InSet` literals into the scan
  * stage — each worker evaluates membership locally, no join and no
  * broadcast traffic beyond the closure itself. Sorted order keeps the
  * generated plans (and the oracle SQL derived from these sets) stable
  * across runs.
  *
  * Supported rule shapes (everything in the snapshot, and everything
  * the PSL algorithm needs for suffixes up to three labels): plain
  * 2- and 3-label suffixes, 1- and 2-label wildcard bases (`*.ck`,
  * `*.kobe.jp`), and 2- and 3-label exceptions (`!www.ck`,
  * `!city.kobe.jp`). Single-label plain rules are rejected at load —
  * the two-label fallback already covers every bare TLD.
  */
object PublicSuffix {

  private val rules: Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/public-suffix-snapshot.txt")
    require(in != null, "public-suffix snapshot resource missing")
    try
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .toVector
    finally in.close()
  }

  // rule strings are interpolated verbatim into oracle SQL literals
  // (sqlList) and Column literals — constrain the charset at load so a
  // snapshot edit can never smuggle a quote/backslash into either
  private val ruleChars = "^[a-z0-9.*!-]+$".r
  require(rules.forall(r => ruleChars.matches(r)),
    "snapshot rules must match [a-z0-9.*!-]+ (SQL-literal-safe)")

  private def nLabels(r: String): Int = r.count(_ == '.') + 1

  private val plain: Vector[String] =
    rules.filterNot(r => r.startsWith("!") || r.startsWith("*."))
  require(plain.forall(nLabels(_) >= 2),
    "single-label plain rules are redundant with the two-label fallback")
  require((plain ++ rules).forall(nLabels(_) <= 3),
    "snapshot rules beyond 3 labels need a wider lookup")

  /** Plain 2-label public suffixes (`co.uk`). */
  val plain2: Seq[String] = plain.filter(nLabels(_) == 2).sorted
  /** Plain 3-label public suffixes (`s3.amazonaws.com`). */
  val plain3: Seq[String] = plain.filter(nLabels(_) == 3).sorted

  private val wild: Vector[String] =
    rules.filter(_.startsWith("*.")).map(_.drop(2))
  /** 1-label wildcard bases: `*.ck` stored as `ck` (any direct child
    * is a 2-label public suffix).
    */
  val wild1: Seq[String] = wild.filter(nLabels(_) == 1).sorted
  /** 2-label wildcard bases: `*.kobe.jp` stored as `kobe.jp`. */
  val wild2: Seq[String] = wild.filter(nLabels(_) == 2).sorted

  private val exc: Vector[String] =
    rules.filter(_.startsWith("!")).map(_.tail)
  /** 2-label exception rules: the rule names the registrable domain. */
  val exc2: Seq[String] = exc.filter(nLabels(_) == 2).sorted
  /** 3-label exception rules (`!city.kobe.jp`). */
  val exc3: Seq[String] = exc.filter(nLabels(_) == 3).sorted

  /** The set as a SQL `IN` list body — the oracle replays the lookup
    * against the IDENTICAL snapshot by construction. Empty sets render
    * as a never-matching placeholder so the SQL stays well-formed.
    */
  def sqlList(xs: Seq[String]): String =
    if (xs.isEmpty) "''" else xs.map(x => s"'$x'").mkString(", ")
}
