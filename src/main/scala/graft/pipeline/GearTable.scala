package graft.pipeline

/** The 256-entry gear table driving content-defined chunk boundaries in
  * [[TextAnalysis.cdcChunksGear]] (the FastCDC/gear-hash family, Xia et
  * al., FAST'16): one table lookup + shift + add per character instead
  * of one digest per position — the ~100× constant-factor CPU win over
  * a per-position MD5 at corpus scale.
  *
  * The table is DERIVED, not random: entry `i` is the first 3 bytes of
  * `md5("gear:" ++ i)`, truncated to 24 bits. That keeps the whole
  * boundary rule replayable by any engine with an md5 function — the
  * same vendored-determinism argument as the public-suffix snapshot —
  * and [[sqlList]] renders the identical values as a SQL list literal
  * so the DuckDB oracle replays the rolling hash from the same table
  * by construction (single source of truth, no resource drift).
  *
  * 24 bits is the full rolling-hash width: the shift-and-add recurrence
  * `h ← (2h + gear(c)) mod 2^24` makes `h` at position p depend on
  * exactly the previous 24 characters (older contributions shift out of
  * the modulus), so the oracle can replay it with 24 LAG terms in plain
  * BIGINT arithmetic — no 64-bit wraparound emulation.
  */
object GearTable {

  val Width = 24
  val Mod: Int = 1 << Width // 2^24

  /** gear(i) = first 3 bytes of md5("gear:i"), big-endian, 0..2^24-1. */
  val values: Array[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { i =>
      md.reset()
      val d = md.digest(s"gear:$i".getBytes("UTF-8"))
      ((d(0) & 0xff) << 16) | ((d(1) & 0xff) << 8) | (d(2) & 0xff)
    }
  }

  /** `maskBits` bits spread evenly across the 24-bit hash (FastCDC
    * spreads its mask for exactly this reason): a low-bit mask would
    * make boundaries a function of only the last `maskBits` characters;
    * the spread reaches the full lookback. Boundary probability stays
    * 2^-maskBits → expected chunk length 2^maskBits.
    */
  def mask(maskBits: Int): Int = {
    require(maskBits >= 1 && maskBits <= Width,
      s"maskBits must be in [1, $Width]")
    (0 until maskBits).map(i => 1 << (i * Width / maskBits)).sum
  }

  /** The table as a SQL list literal — the oracle's copy IS this one. */
  def sqlList: String = values.mkString("[", ", ", "]")
}
