package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * `sample()`/`rand()` draws differ per run and per partitioning; a
  * training pipeline needs the SAME subset on every run, on any engine,
  * regardless of cluster layout. Keyed md5 sampling gives that: a row is
  * kept iff the top 60 bits of `md5(salt || id)` fall below
  * `fraction · 2⁶⁰` — a pure per-row predicate (no shuffle, fully
  * codegen'd, pushes through joins) that any SQL engine reproduces
  * bit-for-bit. Changing `salt` draws an independent sample (e.g.
  * train/validation splits via disjoint salts).
  */
object Sampling {

  /** 60-bit uniform hash of (salt, id) — first 15 hex chars of md5. */
  def hash60(idCol: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), idCol.cast("string"))
      .cast("binary")), 1, 15), 16, 10).cast("long")

  /** Keep rows where hash60(salt, id)/2⁶⁰ < fraction. */
  def deterministicSample(
      df: DataFrame, idCol: String, fraction: Double,
      salt: String = "s0:"): DataFrame = {
    require(fraction >= 0.0 && fraction <= 1.0, "fraction must be in [0,1]")
    val threshold = (fraction * (1L << 60).toDouble).toLong
    df.filter(hash60(col(idCol), salt) < threshold)
  }

  /** Stratified deterministic sampling: per-stratum keep fractions (the
    * training-mix shape — e.g. keep 100% of books, 10% of common-crawl),
    * same engine-portable md5 predicate as [[deterministicSample]]. The
    * per-row threshold comes from a codegen'd CASE over the stratum
    * column — still a pure scan-stage predicate: no shuffle, no join, no
    * broadcast, pushes into the source read. Strata absent from
    * `fractions` fall back to `defaultFraction`. Rows keep/drop
    * INDEPENDENTLY of partitioning and of other strata, and adding a
    * stratum later never changes which rows of existing strata survive
    * (each row's draw depends only on (salt, id)).
    *
    * For thousands of strata prefer joining a broadcast quota table
    * instead of a CASE chain; at the usual training-mix scale (tens of
    * sources) the CASE wins — zero extra plan nodes.
    */
  def stratifiedSample(
      df: DataFrame, idCol: String, stratumCol: String,
      fractions: Map[String, Double], defaultFraction: Double = 0.0,
      salt: String = "s0:"): DataFrame = {
    (fractions.values.toSeq :+ defaultFraction).foreach(f =>
      require(f >= 0.0 && f <= 1.0, "fractions must be in [0,1]"))
    def thr(f: Double): Long = (f * (1L << 60).toDouble).toLong
    val threshold = fractions.toSeq.sortBy(_._1).foldLeft(
      lit(thr(defaultFraction))) { case (acc, (stratum, f)) =>
      when(col(stratumCol) === stratum, lit(thr(f))).otherwise(acc)
    }
    df.filter(hash60(col(idCol), salt) < threshold)
  }

  /** Quality-weighted deterministic sampling (importance resampling): a
    * row survives iff its uniform 60-bit draw, as a fraction of 2⁶⁰,
    * falls below its own `weight` expression — keep probability equals
    * the weight (≤ 0 never keeps, ≥ 1 always keeps), so a corpus thins
    * proportionally to quality in one pass: the usual data-mixing move
    * of keeping high-quality text while downsampling boilerplate.
    * Same engine-portable (salt, id) draw as [[deterministicSample]],
    * and still a pure scan-stage predicate — the weight expression
    * rides in the same codegen'd stage, no shuffle, no join, and the
    * draw stays independent of partitioning and corpus growth.
    *
    * The comparison deliberately stays in DOUBLE space: both engines
    * convert the 60-bit draw with the same IEEE round-to-nearest and
    * multiply identically, whereas a per-row double→long threshold cast
    * would truncate here but round in an external replay.
    */
  def weightedSample(
      df: DataFrame, idCol: String, weight: Column,
      salt: String = "w0:"): DataFrame =
    // the explicit weight >= 1 arm honors the "always keeps" contract:
    // the ~64 draws nearest 2^60 round UP to exactly 2^60 as doubles
    // and would fail `< 1.0 * 2^60` — a ~2^-54 silent drop otherwise
    df.filter(weight >= lit(1.0) ||
      hash60(col(idCol), salt).cast("double") <
        weight * lit((1L << 60).toDouble))

  /** Token-budget mixture downsampling — the data-mixing move that
    * turns "train on B tokens at these source proportions" into
    * per-row keep decisions: each source's keep RATE is
    * `min(1, budget·share / source_tokens)` (computed FROM the data —
    * one per-source token aggregate, broadcast back), and rows then
    * survive the same engine-portable (salt, id) draw as
    * [[weightedSample]], so the expected kept token mass of source s
    * is `budget·share(s)` (capped at everything the source has — a
    * short source undershoots its share rather than inventing data;
    * pair with [[oversample]] when repetition is acceptable).
    * Deterministic end-to-end: same corpus, same budget, same salt →
    * the same rows on any engine. Sources absent from `shares` get
    * rate 0. Scale shape: one map-side-combined aggregate over the
    * corpus, a source-count-sized broadcast join, and the scan-stage
    * predicate — nothing is O(rows) past the scans.
    */
  def mixToBudget(
      df: DataFrame, idCol: String, sourceCol: String, tokenCol: String,
      shares: Map[String, Double], budgetTokens: Long,
      salt: String = "mix0:"): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    shares.values.foreach(s =>
      require(s >= 0.0 && s.isFinite, "shares must be non-negative"))
    val share = shares.toSeq.sortBy(_._1).foldLeft(lit(0.0).as("__share")) {
      case (acc, (s, v)) => when(col(sourceCol) === s, lit(v)).otherwise(acc)
    }
    val rates = df.groupBy(col(sourceCol))
      .agg(sum(col(tokenCol)).cast("double").as("__tok"))
      .select(col(sourceCol), least(lit(1.0),
        share * lit(budgetTokens.toDouble) / col("__tok")).as("__rate"))
    df.join(broadcast(rates), Seq(sourceCol))
      .filter(col("__rate") >= lit(1.0) ||
        hash60(col(idCol), salt).cast("double") <
          col("__rate") * lit((1L << 60).toDouble))
      .drop("__rate")
  }

  /** Temperature-flattened mixture downsampling — the multilingual /
    * multi-source "α-scaling" move: instead of sampling sources at
    * their natural proportions (α=1, which lets one giant source drown
    * the mix) each source's share of the budget is proportional to
    * `tok_s^α`; the standard √-flattening (α=0.5, the published
    * default for multilingual pretraining mixes) boosts small sources
    * by the square-root of their deficit. Keep rate per source:
    * `min(1, budget · √tok_s / Σ_t √tok_t / tok_s)`, then the same
    * engine-portable (salt, id) draw as [[weightedSample]].
    *
    * α is FIXED at 0.5 here deliberately: `sqrt` is correctly rounded
    * in IEEE-754 on every engine, so the rate — and therefore the kept
    * SET — replays bit-identically off-Spark, which a general
    * `pow(tok, α)` cannot promise (libm `pow` is faithfully- but not
    * correctly-rounded and may differ per platform in the last ulp).
    * The normalizer is summed in EXPLICIT `sources` order as a
    * left-assoc fold of per-source conditional aggregates — never a
    * data-ordered float SUM whose reduction order could flip a ulp.
    * Sources absent from `sources` get rate 0; sources listed but
    * absent from the corpus contribute √0 = 0 to the normalizer.
    * Scale shape: identical to [[mixToBudget]] — one map-side-combined
    * aggregate (k conditional sums in a single 1-row pass), a 1-row
    * broadcast, and the scan-stage predicate.
    */
  def temperatureMix(
      df: DataFrame, idCol: String, sourceCol: String, tokenCol: String,
      sources: Seq[String], budgetTokens: Long,
      salt: String = "temp0:"): DataFrame = {
    require(budgetTokens >= 0, "budget must be non-negative")
    require(sources.nonEmpty, "at least one source")
    require(sources.distinct == sources, "sources must be distinct")
    val aggs = sources.zipWithIndex.map { case (s0, i) =>
      coalesce(sum(when(col(sourceCol) === s0, col(tokenCol))), lit(0L))
        .cast("double").as(s"__t_$i")
    }
    val norm = sources.indices
      .map(i => sqrt(col(s"__t_$i")))
      .reduceLeft(_ + _).as("__norm")
    val totals = broadcast(
      df.agg(aggs.head, aggs.tail: _*).select(col("*"), norm))
    val rate = sources.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (s0, i)) =>
        when(col(sourceCol) === s0, least(lit(1.0),
          lit(budgetTokens.toDouble) * sqrt(col(s"__t_$i")) /
            col("__norm") / col(s"__t_$i"))).otherwise(acc)
    }
    df.crossJoin(totals)
      .filter(rate >= lit(1.0) ||
        hash60(col(idCol), salt).cast("double") <
          rate * lit((1L << 60).toDouble))
      .drop(sources.indices.map(i => s"__t_$i") :+ "__norm": _*)
  }

  /** Sequential Poisson sampling (Ohlsson 1998): deterministic
    * probability-proportional-to-size selection of EXACTLY k rows —
    * rank every row by `draw / weight` (draw = the 60-bit (salt, id)
    * hash as a double) and keep the k smallest, ties to the lower id.
    * Heavier rows get proportionally smaller keys, so inclusion
    * probability approaches the textbook `k·w / Σw` PPS target while
    * the SAMPLE SIZE is hard, which per-row Bernoulli thinning
    * ([[weightedSample]]) cannot give. The ranking key is a single
    * IEEE division of engine-identical operands — no `pow`/`ln` of the
    * Efraimidis-Spirakis exponential formulation, whose last-ulp libm
    * drift could flip the kth boundary between engines.
    *
    * Scale shape: a pure scan-stage key computation into a global
    * top-k — Spark plans `TakeOrderedAndProject` (per-partition heaps,
    * single k-row merge on the driver), never a full sort or a single
    * ordered shuffle. Rows with weight ≤ 0 are excluded (they'd rank
    * last anyway via +Inf, but NULL weights would rank FIRST — the
    * explicit filter keeps both out).
    */
  def sequentialPoissonSample(
      df: DataFrame, idCol: String, weight: Column, k: Int,
      salt: String = "sps0:"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    df.filter(weight > lit(0.0))
      .withColumn("__key",
        hash60(col(idCol), salt).cast("double") / weight.cast("double"))
      .orderBy(col("__key"), col(idCol))
      .limit(k)
      .drop("__key")
  }

  /** Deterministic exact-k selection per stratum (fixed eval sets,
    * per-source golden subsets): within each stratum keep the k rows
    * with the smallest (salt, id) draws — same engine-portable hash as
    * [[deterministicSample]], but with a HARD size guarantee instead of
    * a probabilistic one, at the cost of one rank window keyed by the
    * stratum (fraction sampling stays the shuffle-free choice when a
    * ±√n size wobble is fine). Ties (a 60-bit hash collision) break on
    * the id itself, so selection is total-ordered and replayable.
    * Membership is stable under corpus GROWTH only in the probabilistic
    * form; exact-k selection by construction evicts the largest draw
    * when a smaller one arrives — that's the documented trade.
    */
  def exactKPerStratum(
      df: DataFrame, idCol: String, stratumCol: String, k: Int,
      salt: String = "k0:"): DataFrame = {
    require(k >= 1, "k must be at least 1")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(hash60(col(idCol), salt), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic oversampling (the upsampling half of a training
    * mix): each row is emitted `floor(weight)` times, plus one more iff
    * its (salt, id) draw falls below the fractional part — so a source
    * weighted 2.5 contributes each document twice and half the
    * documents a third time, deterministically. Emits a `copy` column
    * (1-based) so downstream shuffles can spread the duplicates. Pure
    * scan-stage explode: no shuffle, no join; rows with weight < 1
    * thin exactly like [[weightedSample]] (an empty sequence drops the
    * row). The fractional comparison stays in DOUBLE space for the same
    * engine-parity reason as [[weightedSample]]; `weight − floor
    * (weight)` is an exact double subtraction on both engines.
    */
  def oversample(
      df: DataFrame, idCol: String, weight: Column,
      salt: String = "o0:"): DataFrame = {
    val copies = floor(weight).cast("long") +
      when(hash60(col(idCol), salt).cast("double") <
        (weight - floor(weight)) * lit((1L << 60).toDouble), 1L)
        .otherwise(0L)
    // sequence() infers a NEGATIVE step when start > stop, so guard the
    // zero-copy case explicitly instead of exploding sequence(1, 0)
    df.withColumn("copy",
      explode(when(copies >= 1L, sequence(lit(1L), copies))
        .otherwise(array().cast("array<long>"))))
  }

  /** Deterministic N-way split assignment (train/val/test): the row's
    * 60-bit draw falls into cumulative-weight buckets, returned as a
    * `split` column. A pure codegen'd CASE over the same (salt, id)
    * draw — no shuffle, no join; splits are disjoint and exhaustive by
    * construction, and a row's assignment NEVER changes as the corpus
    * grows or the job re-runs (the property `randomSplit` lacks). The
    * last split absorbs the residual weight, so float rounding in the
    * thresholds can't leak rows.
    */
  /** DSIR-style importance scores (Xie et al., "Data Selection for
    * Language Models via Importance Resampling", NeurIPS'23, simplified
    * to unigram features): per RAW document, the average log-likelihood
    * ratio of its tokens under the TARGET corpus' unigram distribution
    * vs the raw corpus' own — positive means "looks more like the
    * target than like average raw data". Feed the exponentiated score
    * into [[weightedSample]] to complete the resampling step; this op
    * is the scoring pass.
    *
    * Both distributions are Laplace-smoothed over the UNION vocabulary
    * (so every ratio is finite and both corpora share one support):
    * p(w) = (c(w)+1)/(N+V).
    *
    * Scale shape: one token explosion per corpus, two token-keyed count
    * aggregates (map-side combined, vocabulary-sized outputs), a 1-row
    * totals broadcast, and one token-keyed join back to the raw
    * explosion — everything shuffles on the token, nothing is
    * O(docs²). The per-doc average is a float reduction over the doc's
    * token multiset; the exposed surface is ROUND(6) (q100's
    * precedent), far above reduction-order ulp drift.
    */
  def dsirScores(
      raw: DataFrame, target: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def toks(df: DataFrame, cols: Column*): DataFrame =
      df.select(cols :+ explode(
        TextAnalysis.whitespaceTokens(lower(col(textCol)))).as("tok"): _*)
    val rawTok = toks(raw, col(idCol).as("id"))
    val rc = rawTok.groupBy(col("tok")).agg(count(lit(1)).as("cr"))
    val tc = toks(target).groupBy(col("tok")).agg(count(lit(1)).as("ct"))
    val vocab = rc.join(tc, Seq("tok"), "full")
      .select(col("tok"),
        coalesce(col("cr"), lit(0L)).as("cr"),
        coalesce(col("ct"), lit(0L)).as("ct"))
    val totals = broadcast(vocab.agg(
      sum(col("cr")).cast("double").as("nr"),
      sum(col("ct")).cast("double").as("nt"),
      count(lit(1)).cast("double").as("v")))
    // identical arithmetic shape on the oracle side: two smoothed
    // probabilities, one division, one ln
    val ratios = vocab.crossJoin(totals)
      .select(col("tok"),
        log(((col("ct").cast("double") + lit(1.0)) / (col("nt") + col("v")))
          / ((col("cr").cast("double") + lit(1.0)) / (col("nr") + col("v"))))
          .as("__lr"))
    rawTok.join(ratios, "tok")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("__lr")), 6).as("avg_logratio"))
  }

  def splitAssign(
      df: DataFrame, idCol: String,
      splits: Seq[(String, Double)],
      salt: String = "split:"): DataFrame = {
    require(splits.nonEmpty, "at least one split")
    splits.foreach { case (_, w) =>
      require(w > 0.0, "split weights must be positive") }
    require(math.abs(splits.map(_._2).sum - 1.0) < 1e-9,
      "split weights must sum to 1")
    val h = hash60(col(idCol), salt)
    val thresholds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(c => (c * (1L << 60).toDouble).toLong)
    val assignment = splits.init.zip(thresholds.init)
      .foldRight(lit(splits.last._1): Column) {
        case (((name, _), thr), acc) => when(h < thr, lit(name)).otherwise(acc)
      }
    df.withColumn("split", assignment)
  }

  /** Deterministic negative sampling for (user, item) training pairs:
    * per user, draw `k` items the user did NOT interact with — the
    * contrastive-training counterpart to the positive pairs. Draws
    * are salted-hash residues over the dense item-id domain
    * (hash60(salt, user:i) mod |items|), so the sample is replayable
    * and collision handling is pure relational algebra: overdraw
    * k·`overfetch` candidates, ANTI-join the positives, keep the
    * first k by draw index.
    *
    * Scale shape: candidates mint in the scan stage (explode of a
    * literal sequence — no RNG, no driver loop); the anti-join and
    * the per-user top-k window are both user-keyed; |items| arrives
    * as a 1-row broadcast census. A user whose catalog coverage is so
    * dense that k·overfetch draws all collide yields fewer than k
    * negatives — deterministically on any engine.
    */
  def negativeSample(
      positives: DataFrame, // (user, item) — item ids dense 0..P-1
      itemCount: Long, k: Int = 3, overfetch: Int = 4,
      salt: String = "neg:"): DataFrame = {
    require(k >= 1 && overfetch >= 1 && itemCount >= 1,
      "need k, overfetch, itemCount >= 1")
    import org.apache.spark.sql.expressions.Window
    val draws = k * overfetch
    val cands = positives.select(col("user")).distinct()
      .select(col("user"),
        explode(sequence(lit(0), lit(draws - 1))).as("i"))
      .select(col("user"), col("i"),
        (hash60(concat(col("user").cast("string"), lit(":"),
          col("i").cast("string")), salt) % itemCount).as("item"))
    val w = Window.partitionBy(col("user")).orderBy(col("i"))
    cands
      .join(positives.select(col("user"), col("item")).distinct(),
        Seq("user", "item"), "left_anti")
      // two draw indices whose hash residues collide on the SAME item
      // both survive the positive anti-join — dedup on (user, item)
      // keeping the smallest draw index, so the emitted negatives are
      // distinct items per user (the contract a contrastive loss
      // assumes). Same (user)-keyed shuffle the top-k window needs.
      .groupBy(col("user"), col("item"))
      .agg(min(col("i")).as("i"))
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .select(col("user"), col("item"), col("i").as("draw_idx"))
  }
}
