package graft.pipeline

/** Vendored byte-pair-encoding merge table — the [[GearTable]]
  * discipline applied to tokenization: a FIXED, ordered list of symbol
  * merges compiled into the engine (no resource files, no environment
  * drift), so the segmentation is a pure deterministic function of the
  * input text on every engine that replays the same table.
  *
  * Rank = list index (lower merges first), the standard BPE priority.
  * The table is a small hand-built English-frequency set — enough to
  * exercise multi-level merges (`i|n` then `in|g`, `t|h` → `th|e`) —
  * not a trained GPT vocabulary; the OPERATOR contract (greedy
  * lowest-rank leftmost merge to fixpoint) is what production swaps a
  * real merges file into.
  */
object BpeMerges {

  /** Ordered merges as "left|right" (symbols never contain '|'). */
  val merges: Vector[String] = Vector(
    "t|h", "th|e", "i|n", "a|n", "r|e", "o|n", "e|r", "a|t",
    "e|n", "o|r", "s|t", "e|s", "a|r", "o|u", "in|g", "an|d",
    "o|f", "t|o", "i|s", "e|d", "i|t", "a|l", "l|e", "c|o",
    "s|e", "n|e", "h|e", "m|e", "d|e", "l|l", "u|r", "r|a",
    "r|i", "l|i", "the|r", "w|h", "v|e", "p|r", "q|u", "c|h")

  /** rank lookup (0-based; absent pair = no merge). */
  val rank: Map[String, Int] = merges.zipWithIndex.toMap

  /** The table as a DuckDB list literal, for oracle SQL generation —
    * single source of truth with [[merges]].
    */
  def sqlList: String =
    merges.map(m => s"'$m'").mkString("[", ", ", "]")
}
