package graft.pipeline

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, language ID, quality scoring, fingerprinting. All pure
  * Column expressions (whole-stage codegen; no UDFs in the hot path).
  */
object TextAnalysis {

  /** Whitespace tokenization. */
  def whitespaceTokens(text: Column): Column = split(trim(text), "\\s+")

  /** BPE-ish pre-tokenization: letter runs, digit runs, single punctuation
    * marks (the usual byte-pair pre-split regex family).
    */
  def bpeTokens(text: Column): Column =
    regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0))

  def tokenCount(text: Column): Column = size(whitespaceTokens(text))
  def bpeTokenCount(text: Column): Column = size(bpeTokens(text))

  /** Small per-language stopword profiles (top function words). Public
    * knowledge; enough for a coarse n-gram/stopword language heuristic.
    */
  val stopwordProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it",
      "for", "on", "with", "as", "at", "this", "be", "are", "was"),
    "fr" -> Seq("le", "la", "les", "de", "des", "un", "une", "et", "est",
      "que", "pour", "dans", "qui", "au", "pas", "sur", "avec", "ce"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine",
      "zu", "den", "mit", "auf", "für", "im", "sich", "des", "von", "es"),
    "es" -> Seq("el", "la", "los", "las", "de", "y", "que", "en", "un",
      "una", "es", "no", "por", "con", "para", "se", "su", "al"),
    "zh" -> Seq("的", "是", "了", "在", "和", "有", "我", "不", "这", "人",
      "他", "们", "中", "来", "上", "大", "为", "个"))

  /** Whole-token stopword counter: one linear regex scan of the lowered
    * text per profile — `(?:^|\s)(?:w1|w2|…)(?=\s|$)` counts every
    * whitespace-delimited token equal to a profile word, repeats
    * included, exactly like a per-token membership filter but codegen'd
    * (a `filter` HOF lambda is interpreted per token and was the slowest
    * pure-scan cost in the text family). Longest-first alternation keeps
    * the match greedy without backtracking; the lookahead leaves the
    * trailing separator for the next match, so consecutive stopwords all
    * count.
    */
  private def stopwordHits(loweredText: Column, words: Seq[String]): Column = {
    // Pattern.quote each word: current profiles are plain letters, but a
    // future word containing a regex metacharacter (apostrophe-d forms,
    // '.') must stay a literal, not silently change matching semantics
    val pat = "(?:^|\\s)(?:" +
      words.sortBy(w => (-w.length, w))
        .map(java.util.regex.Pattern.quote)
        .mkString("|") + ")(?=\\s|$)"
    size(regexp_extract_all(loweredText, lit(pat), lit(0)))
  }

  /** Coarse language ID: the profile with the highest stopword hit-ratio
    * wins; ties resolve by profile priority (list order, `en` first).
    * Returns the 2-letter code, or "und" when nothing matches.
    */
  def languageId(text: Column): Column = {
    val lowered = lower(trim(text))
    val nToks = size(whitespaceTokens(text))
    val n = stopwordProfiles.length
    val scored = stopwordProfiles.zipWithIndex.map { case ((lang, words), i) =>
      // count matches including repeats: a membership count is more
      // faithful than a distinct intersect for ratio scoring
      val hitCount = stopwordHits(lowered, words)
      struct(
        (hitCount.cast("double") / greatest(nToks, lit(1))).as("score"),
        lit(n - i).as("prio"), lit(lang).as("lang"))
    }
    val best = array_max(array(scored: _*))
    when(best.getField("score") > 0, best.getField("lang")).otherwise("und")
  }

  /** Language-ID validation against ground-truth labels: the
    * (predicted, actual) contingency matrix of [[languageId]] over a
    * labelled corpus — the accuracy/confusion gate a pipeline runs
    * before trusting language routing (per-language sampling, langid
    * filters). Same external-validation shape as
    * [[Similarity.clusterAgreement]]: one scan (the per-profile regex
    * counters are codegen'd Column expressions) into one
    * (predicted, actual) aggregate — the result is at most
    * (profiles+1)×labels rows, nothing downstream is O(rows).
    * Accuracy = Σ diagonal / Σ all, derivable from the returned counts.
    */
  def langidConfusion(
      docs: DataFrame, textCol: String, labelCol: String): DataFrame =
    docs
      .select(languageId(col(textCol)).as("predicted"),
        col(labelCol).as("actual"))
      .groupBy("predicted", "actual")
      .agg(count(lit(1)).as("n"))

  /** Quality metrics: char/token counts, mean token length, punctuation
    * and alphabetic ratios, stopword ratio (en profile), plus a bounded
    * composite score in [0,1].
    */
  def qualityMetrics(text: Column): Column = {
    val nChars = length(text)
    val toks = whitespaceTokens(text)
    val nToks = size(toks)
    val meanTokLen = (nChars - nToks + 1).cast("double") /
      greatest(nToks, lit(1))
    val punct = length(regexp_replace(text, "[^.!?,;:]", ""))
    val alpha = length(regexp_replace(text, "[^A-Za-z]", ""))
    val stops = stopwordHits(lower(trim(text)), stopwordProfiles.head._2)
    struct(
      nChars.as("n_chars"),
      nToks.as("n_tokens"),
      round(meanTokLen, 6).as("mean_token_len"),
      round(punct.cast("double") / greatest(nChars, lit(1)), 6).as("punct_ratio"),
      round(alpha.cast("double") / greatest(nChars, lit(1)), 6).as("alpha_ratio"),
      round(stops.cast("double") / greatest(nToks, lit(1)), 6).as("stopword_ratio"))
  }

  /** Gopher quality-rule flags (Rae et al. 2021, §A1.1 — the standard
    * pretraining document filter), adapted as pure Column expressions so
    * the whole rule set evaluates in ONE codegen'd scan stage:
    *  - word count within [minWords, maxWords];
    *  - mean word length within [3, 10] characters;
    *  - symbol-to-word ratio (`#` characters and `...` runs) ≤ 0.1;
    *  - < 90% of lines start with a bullet, < 30% end with an ellipsis;
    *  - ≥ 80% of words contain at least one alphabetic character;
    *  - ≥ 2 hits from the 8-word English stopword probe.
    * Returns a struct of per-rule booleans plus the composite `keep`.
    * Every term is integer arithmetic over exact counts (ratios compare
    * as count·denominator bounds), so external engines replay the flags
    * bit-for-bit.
    *
    * Every counter is a regex scan or length difference — deliberately
    * no higher-order array functions (`filter`/`aggregate` lambdas are
    * interpreted per element and split the whole-stage-codegen span):
    *  - token-length sum = count of non-whitespace chars (tokens are
    *    maximal `\S+` runs, so their lengths sum to exactly that);
    *  - bullet lines: one match per line whose first non-space char is
    *    a bullet — the anchor consumes the preceding newline, so
    *    consecutive bullet lines all count;
    *  - ellipsis lines: `...` + optional spaces + end-of-line; at most
    *    one match per line because the match consumes through EOL;
    *  - alpha words: lazy scan from a token boundary to the token's
    *    first letter — at most one match per token because the rest of
    *    the token contains no whitespace to re-anchor on;
    *  - stopword probe: the [[stopwordHits]] whole-token alternation.
    */
  def gopherQualityFlags(
      text: Column,
      minWords: Int = 50,
      maxWords: Int = 100000): Column = {
    val nWords = size(whitespaceTokens(text))
    val sumWordLen = length(regexp_replace(text, "\\s+", ""))
    val hashes = length(text) - length(regexp_replace(text, "#", ""))
    val ellipses =
      (length(text) - length(regexp_replace(text, "\\.\\.\\.", ""))) / 3
    val nLines = size(split(text, "\n", -1))
    val bulletLines =
      size(regexp_extract_all(text, lit("(?:^|\n) *[-*•]"), lit(0)))
    val ellipsisLines =
      size(regexp_extract_all(text, lit("\\.\\.\\. *(?:\n|$)"), lit(0)))
    val alphaWords =
      size(regexp_extract_all(text, lit("(?:^|\\s)[^\\s]*?[A-Za-z]"), lit(0)))
    val stopProbe = Seq("the", "be", "to", "of", "and", "that", "have", "with")
    val stopHits = stopwordHits(lower(trim(text)), stopProbe)
    // ratio thresholds as exact integer comparisons: count/denom <= r
    // spelled count*10 <= denom*(10r) — no float rounding to replay
    val wordCountOk = nWords >= minWords && nWords <= maxWords
    val meanLenOk = sumWordLen >= nWords * 3 && sumWordLen <= nWords * 10
    val symbolOk = (hashes + ellipses) * 10 <= nWords
    // <=, not <: Rae et al. §A1.1 removes documents with MORE THAN 90%
    // bullet / 30% ellipsis lines, so a document exactly on the
    // boundary is kept
    val bulletOk = bulletLines * 10 <= nLines * 9
    val ellipsisOk = ellipsisLines * 10 <= nLines * 3
    val alphaOk = alphaWords * 10 >= nWords * 8
    val stopOk = stopHits >= 2
    struct(
      nWords.as("n_words"),
      wordCountOk.as("word_count_ok"),
      meanLenOk.as("mean_len_ok"),
      symbolOk.as("symbol_ok"),
      bulletOk.as("bullet_ok"),
      ellipsisOk.as("ellipsis_ok"),
      alphaOk.as("alpha_ok"),
      stopOk.as("stopword_ok"),
      (wordCountOk && meanLenOk && symbolOk && bulletOk &&
        ellipsisOk && alphaOk && stopOk).as("keep"))
  }

  /** Corpus unigram language-model score per document: average negative
    * log-likelihood of the document's tokens under the corpus unigram
    * distribution — the classic cheap importance/quality signal (low
    * avg-NLL ≈ stereotypical text, high ≈ rare-token soup). Two passes,
    * both keyed: token counts (map-side combine, shuffle one row per
    * distinct token) and a token-keyed join of the doc tokens back to
    * the counts (AQE broadcasts the vocabulary when it is small; at
    * corpus scale it shuffles on the token — never on documents). The
    * corpus total rides in as a broadcast scalar.
    * Output: (id, n_tokens, avg_nll).
    */
  def unigramLogLoss(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    // the token explosion feeds the count table AND the score join; the
    // count table feeds the total AND the join — cache both while the
    // (small, per-doc) result materializes, then release. MEMORY_AND_
    // DISK spill makes the token cache a disk-vs-recompute trade at
    // corpus scale, the same one the shingle tables take.
    val toks = docs.select(col(idCol).as("id"),
      explode(whitespaceTokens(lower(col(textCol)))).as("token")).cache()
    val counts = toks.groupBy(col("token")).agg(count(lit(1)).as("tf"))
      .cache()
    // Vocabulary census (r17): materialize the cached count table BEFORE
    // the score join is planned, so the planner sees the EXACT vocabulary
    // size instead of a post-aggregate estimate. Bounded vocabularies
    // then auto-broadcast and the token frame is never shuffled for the
    // join (100× probe: q78 shuffle 178 → 8 MB); an open vocabulary past
    // the threshold keeps today's token-keyed SMJ — the planner's own
    // regime choice, now made on real numbers. One extra count() job,
    // flat locally.
    counts.count()
    val total = counts.agg(sum(col("tf")).cast("double").as("__total"))
    PipelineCache.materialize(toks, counts)(toks.join(counts, "token")
      .crossJoin(broadcast(total))
      .select(col("id"),
        -log(col("tf").cast("double") / col("__total")) as "nll")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("nll")), 6).as("avg_nll")))
  }

  /** Interpolated bigram language-model score per document: average
    * negative log-likelihood under `λ·P(t|prev) + (1−λ)·P(t)`, with
    * `P(t|prev) = c(prev,t)/c(prev)` over corpus bigram counts and the
    * document's first token scored by its unigram probability alone.
    * The sharper sibling of [[unigramLogLoss]]: repetitive boilerplate
    * scores artificially low under unigrams but a bigram model exposes
    * unusual transitions (and vice versa for keyword-stuffed spam).
    *
    * Scale shape: one window per document orders tokens for the `prev`
    * pairing (keyed by id — no global sort), then every join is keyed
    * by token or (prev, token): unigram counts, bigram counts, and the
    * score join all shuffle on content-derived keys with map-side
    * combine; the corpus token total rides in as a broadcast scalar.
    * Denominator c(prev) is the corpus unigram count (standard MLE
    * denominator up to final-token edge mass — documented choice so an
    * external engine replays it with the same two count tables).
    * Output: (id, n_tokens, avg_nll).
    */
  def bigramLogLoss(
      docs: DataFrame, idCol: String, textCol: String,
      lambda: Double = 0.9): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, "lambda must be in [0,1]")
    // the windowed token frame feeds unigram counts, bigram counts AND
    // the score join — cache it so the explosion + per-doc window run
    // once, release once the (small, per-doc) result materializes
    val w = docs.select(col(idCol).as("id"),
      posexplode(whitespaceTokens(lower(col(textCol))))
        .as(Seq("pos", "token")))
      .withColumn("prev",
        lag(col("token"), 1).over(
          Window.partitionBy(col("id")).orderBy(col("pos"))))
      .cache()
    val uni = w.groupBy(col("token")).agg(count(lit(1)).as("cu")).cache()
    val big = w.filter(col("prev").isNotNull)
      .groupBy(col("prev"), col("token")).agg(count(lit(1)).as("cb"))
      .cache()
    // Count-table census (r17): materialize both cached count tables
    // BEFORE the three-way score join is planned, so the planner sees
    // exact unigram/bigram table sizes instead of post-aggregate
    // estimates. Bounded vocabularies then auto-broadcast all three
    // joins and the token frame is never re-shuffled after its one
    // per-doc window exchange (100× probe: shuffle 1406 → 357 MB,
    // spill 2.5 GB → 0, peak task 144 → 71 MB); an open vocabulary past
    // the threshold keeps today's keyed SMJs. Two extra count() jobs,
    // flat locally.
    uni.count(); big.count()
    val total = uni.agg(sum(col("cu")).cast("double").as("__total"))
    val uniPrev = uni.select(col("token").as("prev"), col("cu").as("cup"))
    val unigramP = col("cu").cast("double") / col("__total")
    PipelineCache.materialize(w, uni, big)(w.join(uni, "token")
      .join(uniPrev, Seq("prev"), "left")
      .join(big, Seq("prev", "token"), "left")
      .crossJoin(broadcast(total))
      .select(col("id"),
        (-log(when(col("prev").isNull, unigramP)
          .otherwise(lit(lambda) * (col("cb").cast("double") / col("cup")) +
            lit(1.0 - lambda) * unigramP))).as("nll"))
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_tokens"),
        round(avg(col("nll")), 6).as("avg_nll")))
  }

  /** Top-k characteristic terms per document by TF-IDF — the classic
    * keyword/topic signal (and the usual feature for cheap topic-drift
    * monitoring over a corpus). `score = tf · ln(N / df)` with raw
    * corpus counts; ties (equal tf and df give the bit-identical
    * score) break on the token itself, so ranking is total-ordered and
    * externally replayable.
    *
    * Scale shape: term frequencies shuffle once on (id, token) with
    * map-side combine; document frequencies reduce the tf frame by
    * token (one more keyed shuffle, output = vocabulary size); the
    * document count rides in as a broadcast scalar, and the final rank
    * window is keyed by document. Nothing broader than a key ever
    * moves. Output: (id, rank, token, score).
    */
  def tfidfTopK(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int = 3): DataFrame = {
    require(k >= 1, "k must be at least 1")
    // tf (distinct (doc, token) rows — already aggregated, far smaller
    // than the raw explosion) feeds df, the doc count AND the score
    // join: cache it so the token explosion runs once, release when
    // the (k-per-doc, small) result materializes
    val tf = docs.select(col(idCol).as("id"),
      explode(whitespaceTokens(lower(col(textCol)))).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
      .cache()
    val df = tf.groupBy(col("token")).agg(count(lit(1)).as("df"))
    val n = tf.agg(countDistinct(col("id")).cast("double").as("__n"))
    PipelineCache.materialize(tf)(tfidfRank(tf, df, n, k))
  }

  /** [[tfidfTopK]] over the persisted [[TextArtifacts]] layout: the
    * token explosion and both corpus aggregates are served from the
    * warehouse tables (built once per corpus), so the query itself is
    * one Exchange-free co-bucketed tf⋈df SMJ plus the per-document rank
    * window — the only shuffle left. Bit-identical to the inline path:
    * every score is a per-row product (no float reduction), and N from
    * [[TextArtifacts.docLengths]]'s row count equals the inline
    * countDistinct by construction.
    */
  def tfidfTopKShared(
      docs: DataFrame, idCol: String, textCol: String,
      corpusKey: String, k: Int = 3): DataFrame = {
    require(k >= 1, "k must be at least 1")
    val tf = TextArtifacts.termFreq(docs, idCol, textCol, corpusKey)
    val df = TextArtifacts.docFreq(docs, idCol, textCol, corpusKey)
    val n = TextArtifacts.docLengths(docs, idCol, textCol, corpusKey)
      .agg(count(lit(1)).cast("double").as("__n"))
    tfidfRank(tf, df, n, k)
  }

  /** Shared score+rank block of the TF-IDF paths: per-row tf·ln(N/df)
    * — no float reduction anywhere, so the result is independent of
    * the tf frame's physical layout — with rank ties broken on the
    * token. `n` is a 1-row (__n: double) aggregate.
    */
  private def tfidfRank(
      tf: DataFrame, df: DataFrame, n: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("id"))
      .orderBy(col("score").desc, col("token"))
    tf.join(df, "token")
      .crossJoin(broadcast(n))
      .withColumn("score", col("tf") * log(col("__n") / col("df")))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("id"), col("rank"), col("token"),
        round(col("score"), 6).as("score"))
  }

  /** BM25 document ranking for a fixed query (Robertson/Lucene form):
    * per query term `idf·tf·(k1+1)/(tf + k1·(1−b+b·len/avglen))` with
    * `idf = ln(1 + (N−df+0.5)/(df+0.5))`, summed over the query terms,
    * top-k docs by score. The retrieval scorer a training pipeline uses
    * for quality-biased selection and eval-set mining.
    *
    * Engine parity is by construction: the per-term contributions are
    * pivoted into one conditional aggregate per LITERAL query term and
    * added in explicit left-assoc term order — never a data-ordered
    * float SUM (each pivot cell aggregates at most the single (doc,
    * term) tf row, so no reduction-order freedom exists anywhere).
    * Every arithmetic op except `ln` is exact IEEE on identical
    * operands; `ln` agrees to well under the ROUND(6) the score
    * surface carries. Identical documents produce bit-identical
    * scores, so the (score DESC, id) rank tie-break replays exactly.
    *
    * Scale shape: one token explosion → (doc, token) tf aggregate
    * (map-side combined), a query-sized df row set and a 1-row
    * (N, avglen) aggregate both broadcast, then TakeOrderedAndProject
    * for the top-k. Nothing is O(corpus) past the scans.
    */
  def bm25TopK(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame =
    bm25TopKImpl(docs, idCol, textCol, queryTerms, k, k1, b,
      materialized = true)

  /** [[bm25TopK]] with the result checkpoint optional, so PlanSpec can
    * inspect the full physical plan (an eager localCheckpoint truncates
    * it to an RDD scan). Production callers always materialize — it is
    * what releases the shared tf cache.
    */
  private[graft] def bm25TopKImpl(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String], k: Int,
      k1: Double, b: Double, materialized: Boolean): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term")
    require(queryTerms.distinct == queryTerms, "query terms must be distinct")
    val tf = docs.select(col(idCol).as("id"),
      explode(whitespaceTokens(lower(col(textCol)))).as("token"))
      .groupBy(col("id"), col("token")).agg(count(lit(1)).as("tf"))
    if (materialized) tf.cache()
    // doc lengths and their total stay INTEGER sums (order-free exact;
    // a float SUM over docs would ulp-drift with reduction order) and
    // only the final avg division happens in double space
    val lens = tf.groupBy(col("id"))
      .agg(sum(col("tf")).as("len"))
    val stats = broadcast(lens.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(col("len")).cast("double") / count(lit(1)).cast("double"))
        .as("__avg")))
    val dfs = broadcast(tf
      .filter(col("token").isin(queryTerms: _*))
      .groupBy(col("token")).agg(count(lit(1)).cast("double").as("df")))
    val result = bm25Score(tf, lens, dfs, stats, queryTerms, k, k1, b)
    if (materialized) PipelineCache.materialize(tf)(result) else result
  }

  /** [[bm25TopK]] over the persisted [[TextArtifacts]] layout: the tf
    * probe filters LITERAL query terms against the token-bucketed table
    * (bucket-pruned at scan time), df comes from the materialized
    * vocabulary table, and the length stats from the materialized
    * docLengths — no token explosion, no corpus-wide shuffle left in
    * the query at all. Bit-identical to the inline path: the score
    * block is shared, its pivot cells hold at most one row each, and
    * the df/len/N values are the same integers the inline aggregates
    * produce.
    */
  def bm25TopKShared(
      docs: DataFrame, idCol: String, textCol: String,
      corpusKey: String, queryTerms: Seq[String], k: Int = 10,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "at least one query term")
    require(queryTerms.distinct == queryTerms, "query terms must be distinct")
    val tf = TextArtifacts.termFreq(docs, idCol, textCol, corpusKey)
      .filter(col("token").isin(queryTerms: _*))
    val lens = TextArtifacts.docLengths(docs, idCol, textCol, corpusKey)
    val stats = broadcast(lens.agg(
      count(lit(1)).cast("double").as("__n"),
      (sum(col("len")).cast("double") / count(lit(1)).cast("double"))
        .as("__avg")))
    val dfs = broadcast(
      TextArtifacts.docFreq(docs, idCol, textCol, corpusKey)
        .filter(col("token").isin(queryTerms: _*))
        .select(col("token"), col("df").cast("double").as("df")))
    bm25Score(tf, lens, dfs, stats, queryTerms, k, k1, b)
  }

  /** Shared scoring block of the BM25 paths (see [[bm25TopK]] for the
    * engine-parity argument): `tf` may be pre-filtered to the query
    * terms (the dfs inner join restricts identically), `dfs` is
    * (token, df: double), `stats` a 1-row (__n, __avg) aggregate.
    */
  private def bm25Score(
      tf: DataFrame, lens: DataFrame, dfs: DataFrame, stats: DataFrame,
      queryTerms: Seq[String], k: Int,
      k1: Double, b: Double): DataFrame = {
    val contrib = tf.join(dfs, "token")
      .join(lens, "id")
      .crossJoin(stats)
      .withColumn("__idf",
        log(lit(1.0) + (col("__n") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5))))
      .withColumn("__c", col("__idf") *
        (col("tf").cast("double") * lit(k1 + 1.0) /
          (col("tf").cast("double") + lit(k1) *
            (lit(1.0 - b) +
              lit(b) * col("len").cast("double") / col("__avg")))))
    val pivots = queryTerms.zipWithIndex.map { case (t, i) =>
      sum(when(col("token") === t, col("__c"))).as(s"__s_$i") }
    val score = queryTerms.indices
      .map(i => coalesce(col(s"__s_$i"), lit(0.0)))
      .reduceLeft(_ + _)
    contrib
      .groupBy(col("id"))
      .agg(pivots.head, pivots.tail: _*)
      .withColumn("score", score)
      .orderBy(col("score").desc, col("id"))
      .limit(k)
      .select(col("id"), round(col("score"), 6).as("score"))
  }

  /** Whole-document fingerprint: 64-bit xxhash of whitespace-normalized
    * lowercase text — codegen'd, shuffle-friendly dedup key.
    */
  def fingerprint(text: Column): Column =
    xxhash64(lower(regexp_replace(trim(text), "\\s+", " ")))

  /** Email-address redaction pattern — deliberately RE2-compatible (no
    * backrefs/lookarounds) so external engines replay it byte-for-byte.
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** PII scrub: replace every email address with `[EMAIL]`. A pure
    * codegen'd `regexp_replace` — the scrub runs in the scan stage at
    * full scan parallelism.
    */
  def redactEmails(text: Column): Column =
    regexp_replace(text, EmailPattern, "[EMAIL]")

  /** Count of email addresses in a document (audit metric for the
    * scrub).
    */
  def emailCount(text: Column): Column =
    size(regexp_extract_all(text, lit(EmailPattern), lit(0)))

  /** IPv4 literals (dotted quad, word-bounded) — RE2-compatible like
    * [[EmailPattern]].
    */
  val Ipv4Pattern = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"

  /** E.164-style phone numbers: `+` followed by 7–15 digits. Restricted
    * to the plus-prefixed international form deliberately — local
    * formats are locale soup and the false-positive cost in a training
    * corpus (scrubbing prices, ids, years) outweighs recall.
    */
  val PhonePattern = "\\+[0-9]{7,15}\\b"

  /** Full PII scrub: emails → `[EMAIL]`, IPv4 → `[IP]`, E.164 phones →
    * `[PHONE]`, applied in that order (emails first so their host parts
    * can't half-match the later patterns). Three chained codegen'd
    * `regexp_replace` calls — still one scan stage at full parallelism.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailPattern, "[EMAIL]"),
        Ipv4Pattern, "[IP]"),
      PhonePattern, "[PHONE]")

  /** Per-document PII counts (the scrub's audit metric): emails, IPv4
    * literals, E.164 phones — counted on the SAME intermediate texts the
    * scrub sees, so counts and replacements always agree.
    */
  def piiCounts(text: Column): Column = {
    val afterEmail = regexp_replace(text, EmailPattern, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Pattern, "[IP]")
    struct(
      size(regexp_extract_all(text, lit(EmailPattern), lit(0)))
        .as("emails"),
      size(regexp_extract_all(afterEmail, lit(Ipv4Pattern), lit(0)))
        .as("ips"),
      size(regexp_extract_all(afterIp, lit(PhonePattern), lit(0)))
        .as("phones"))
  }

  /** Corpus-level line deduplication (the C4/RefinedWeb boilerplate
    * scrub: "discard any line appearing in more than maxDf pages"):
    * navigation chrome, cookie banners and share buttons repeat across
    * a site's pages, so a line's document frequency is the boilerplate
    * signal. Three keyed shuffles, none on documents: (1) distinct
    * (line, doc) pairs collapse before counting, so a line's cost is
    * df, not occurrences; (2) the df table joins back on the line (AQE
    * broadcasts it when the over-threshold set is small); (3) surviving
    * lines reassemble per doc via a sorted-struct aggregate — no
    * window. Every document survives (empty text if fully boilerplate);
    * dropping short docs is the caller's policy. Output: (id, n_total,
    * n_kept, text).
    */
  def dedupLines(
      docs: DataFrame, idCol: String, textCol: String,
      maxDf: Int): DataFrame = {
    require(maxDf >= 1, "maxDf must be positive")
    val lines = docs.select(col(idCol).as("id"),
        posexplode(split(col(textCol), "\n", -1)).as(Seq("pos", "line")))
    val lineDf = lines.select(col("line"), col("id")).distinct()
      .groupBy(col("line")).agg(count(lit(1)).as("__df"))
    val kept = lines.join(lineDf, "line").filter(col("__df") <= maxDf)
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            e => e.getField("line")),
          "\n").as("text"))
    docs.select(col(idCol).as("id"),
        (size(split(col(textCol), "\n", -1))).cast("long").as("n_total"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_total"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** Within-document repeated-substring removal (the repetition half of
    * Lee et al. 2022, "Deduplicating Training Data Makes Language
    * Models Better"): every NON-FIRST occurrence of a token k-gram
    * marks its k-token span for removal, surviving tokens reassemble in
    * order — so templated chunks, chorus-style repetition and copy-
    * pasted paragraphs collapse to their first occurrence. The rule is
    * deliberately relational (span marking, not a greedy scan): no
    * sequential state, so it needs no per-document fold and an external
    * engine replays it exactly.
    *
    * Scale shape: positional k-grams hash to 60-bit md5 keys before the
    * first-occurrence aggregate, so the two heavy shuffles — (id,
    * gram_hash) for first positions, (id, pos) for span coverage — move
    * fixed-width keys, never k-token strings. Everything is keyed by
    * document (or finer); reassembly is the dedupLines sorted-struct
    * aggregate, no window. Output: (id, n_tokens, n_kept, text).
    */
  def removeRepeatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    scrubCoveredSpans(docs, idCol, textCol, k) { grams =>
      val firsts = grams.groupBy(col("id"), col("gram"))
        .agg(min(col("gpos")).as("__fp"))
      grams.join(firsts, Seq("id", "gram"))
        .filter(col("gpos") > col("__fp"))
    }

  /** Cross-document repeated-substring removal — the corpus-level form
    * of [[removeRepeatedSpans]] and the gram-granular analog of Lee et
    * al.'s ExactSubstr dedup: a k-gram's FIRST occurrence in the whole
    * corpus (lowest (id, position)) survives; every other occurrence,
    * in any document, marks its span for removal. Shared boilerplate
    * (mirror pages, syndicated passages, licence blocks) collapses to
    * one canonical copy corpus-wide instead of once per document.
    *
    * Scale shape: identical to the within-document form except the
    * first-occurrence aggregate is keyed by gram hash ALONE — a single
    * corpus-wide shuffle of fixed-width keys with map-side combine;
    * stop-gram posting lists skew that join, but each occurrence joins
    * 1:1 against its gram's single first-occurrence row, which AQE
    * skew-splits cleanly (no quadratic candidate blowup, unlike a
    * posting-list self-join).
    */
  def removeRepeatedSpansCorpus(
      docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame =
    scrubCoveredSpans(docs, idCol, textCol, k) { grams =>
      val firsts = grams.groupBy(col("gram"))
        .agg(min(struct(col("id"), col("gpos"))).as("__f"))
      grams.join(firsts, Seq("gram"))
        .filter(col("id") =!= col("__f").getField("id") ||
          col("gpos") =!= col("__f").getField("gpos"))
    }

  /** Shared span-scrub machinery: positional k-gram hashes, a caller-
    * supplied rule selecting the occurrences to remove, k-token span
    * coverage, and ordered aggregate reassembly (no window).
    */
  private def scrubCoveredSpans(
      docs: DataFrame, idCol: String, textCol: String, k: Int)(
      toRemove: DataFrame => DataFrame): DataFrame = {
    require(k >= 2, "span length must be at least 2 tokens")
    val base = docs.select(col(idCol).as("id"),
      whitespaceTokens(col(textCol)).as("toks"))
    // positional k-gram hashes: gram i covers tokens [i, i+k)
    val grams = base.select(col("id"),
      posexplode(
        when(size(col("toks")) >= k,
          transform(sequence(lit(0), size(col("toks")) - k),
            i => conv(substring(
              md5(array_join(slice(col("toks"), i + 1, lit(k)), " ")),
              1, 15), 16, 10).cast("long")))
          .otherwise(array().cast("array<long>")))
        .as(Seq("gpos", "gram")))
    val covered = toRemove(grams)
      .select(col("id"),
        explode(sequence(col("gpos"), col("gpos") + (k - 1))).as("pos"))
      .distinct()
    val kept = base
      .select(col("id"), posexplode(col("toks")).as(Seq("pos", "tok")))
      .join(covered, Seq("id", "pos"), "left_anti")
      .groupBy(col("id"))
      .agg(count(lit(1)).as("n_kept"),
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("tok")))),
            e => e.getField("tok")),
          " ").as("text"))
    base.select(col("id"), size(col("toks")).cast("long").as("n_tokens"))
      .join(kept, Seq("id"), "left")
      .select(col("id"), col("n_tokens"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text"), lit("")).as("text"))
  }

  /** http/https URL literals — RE2-compatible like the PII patterns. */
  val UrlPattern = "https?://[A-Za-z0-9.-]+(?::[0-9]+)?(?:/[^\\s]*)?"

  /** Hosts of every URL in the document, in occurrence order. */
  def urlHosts(text: Column): Column =
    transform(regexp_extract_all(text, lit(UrlPattern), lit(0)),
      u => regexp_extract(u, "https?://([A-Za-z0-9.-]+)", 1))

  /** Registered domain of a host — the C4-style grouping key for
    * per-site statistics and blocklists. Public-suffix aware via the
    * vendored [[PublicSuffix]] snapshot (so `shop.x.co.uk` groups as
    * `x.co.uk`, not `co.uk`), with the standard last-two-labels
    * fallback for every suffix the snapshot doesn't name. PSL
    * precedence is exception > wildcard/plain (longest first) >
    * default. Pure codegen'd expressions: the label split and the
    * `InSet` membership probes run in the scan stage — no join, no
    * shuffle, no UDF. A host that IS a public suffix has no registered
    * domain in PSL terms; this returns the fallback for it, keeping
    * the column total (grouping keys must not be null).
    */
  def registeredDomain(host: Column): Column = {
    import PublicSuffix._
    val parts = split(host, "\\.")
    val n = size(parts)
    def tail(k: Int) = array_join(slice(parts, -k, k), ".")
    def inSet(c: Column, xs: Seq[String]) =
      if (xs.isEmpty) lit(false) else c.isInCollection(xs)
    // rule sets have fixed label counts, so a clamped short tail can
    // never match a longer rule — the n-guards only protect the OUTPUT
    // label count of each branch
    when(n >= 3 && inSet(tail(3), exc3), tail(3))
      .when(n >= 2 && inSet(tail(2), exc2), tail(2))
      .when(n >= 4 && (inSet(tail(3), plain3) || inSet(tail(2), wild2)),
        tail(4))
      .when(n >= 3 && (inSet(tail(2), plain2) || inSet(tail(1), wild1)),
        tail(3))
      .otherwise(regexp_extract(host, "([A-Za-z0-9-]+\\.[A-Za-z0-9-]+)$", 1))
  }

  /** Per-domain corpus statistics: distinct documents citing the domain
    * and total URL occurrences. One shuffle on the domain key; URLs
    * explode from a codegen'd regex scan.
    */
  def domainStats(
      docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"),
        explode(urlHosts(col(textCol))).as("host"))
      .select(col("id"), registeredDomain(col("host")).as("domain"))
      .groupBy(col("domain"))
      .agg(countDistinct(col("id")).as("n_docs"),
        count(lit(1)).as("n_urls"))

  /** Drop documents citing any blocklisted domain. For the usual small
    * blocklist this is a pure scan-stage `exists` predicate — no
    * shuffle, no join, pushes with the scan; a million-entry blocklist
    * would swap in a broadcast anti-join instead.
    */
  def dropBlockedDomains(
      docs: DataFrame, textCol: String, blocked: Seq[String]): DataFrame =
    docs.filter(!exists(urlHosts(col(textCol)),
      h => registeredDomain(h).isInCollection(blocked)))

  /** Corpus vocabulary: the k most frequent lowercase whitespace tokens,
    * deterministically tie-broken by token. Map-side partial counts keep
    * the shuffle at one row per (token, partition); the final top-k is
    * `TakeOrderedAndProject` — no full sort at any vocabulary size.
    */
  def topTokens(docs: DataFrame, textCol: String, k: Int): DataFrame =
    docs.select(explode(whitespaceTokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)

  /** [[winnowingFingerprints]] with an md5-derived k-gram hash instead of
    * the rolling polynomial: each k-gram hashes to the first 15 hex chars
    * of its md5 (60 bits, non-negative), so the selected fingerprint set
    * is reproducible by any engine with an md5 function — same selection
    * guarantee, ~k× the per-gram hash cost (no rolling reuse). Use the
    * rolling variant at scale; this one where cross-engine replay matters.
    * K-grams are indexed by Unicode CODE POINT, like the gear/winnow
    * scale kernels and SQL `substr` — a UTF-16 window would split
    * surrogate pairs on non-BMP text and hash replacement bytes no
    * external engine would produce.
    */
  def winnowingFingerprintsMd5(text: Column, k: Int = 8, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val f = udf { s: String =>
      if (s == null) Array.empty[Long]
      else {
        val t = s.toLowerCase.replaceAll("\\s+", " ").trim
        val cps = t.codePoints().toArray
        val n = cps.length
        if (n < k) Array.empty[Long]
        else {
          val m = n - k + 1
          val md = java.security.MessageDigest.getInstance("MD5")
          val hashes = new Array[Long](m)
          var i = 0
          while (i < m) {
            md.reset()
            val dig = md.digest(
              new String(cps, i, k).getBytes("UTF-8"))
            // first 15 hex chars = 60 bits: 7 full bytes + high nibble
            var h = 0L
            var j = 0
            while (j < 7) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
            h = (h << 4) | ((dig(7) & 0xf0L) >>> 4)
            hashes(i) = h
            i += 1
          }
          val selected = new java.util.TreeSet[java.lang.Long]()
          val lastStart = math.max(0, m - w)
          var start = 0
          while (start <= lastStart) {
            val end = math.min(start + w, m)
            var mn = hashes(start)
            var j = start + 1
            while (j < end) { if (hashes(j) < mn) mn = hashes(j); j += 1 }
            selected.add(mn)
            start += 1
          }
          val out = new Array[Long](selected.size())
          val it = selected.iterator()
          i = 0
          while (it.hasNext) { out(i) = it.next(); i += 1 }
          out
        }
      }
    }
    f(text)
  }

  /** Content-defined chunking (the rsync/FastCDC boundary family): a
    * chunk boundary falls after every character where the rolling gear
    * hash of the normalized text — `h ← (2h + gear(c)) mod 2^24` over
    * the vendored [[GearTable]] — has all [[GearTable.mask]] bits zero,
    * so boundaries follow CONTENT, and an insertion early in a document
    * shifts only the chunk it lands in, not every downstream chunk
    * (the failure mode of fixed-size blocking). ONE table lookup per
    * character replaces the earlier per-position MD5 (~window-length
    * digest bytes per character); the derived table keeps the rule
    * replayable — the q121 oracle folds the identical values through
    * the identical recurrence as 24 LAG terms.
    *
    * Returns (fp, len, start) structs per chunk: fp = md5-60 of the
    * chunk text (the dedup JOIN surface is unchanged — still an md5
    * key any engine can recompute), expected chunk length ≈ 2^maskBits
    * characters. Indexing is by Unicode CODE POINT throughout (both
    * the hash input and the chunk substrings), matching SQL `substr`
    * semantics on non-ASCII text — a UTF-16 `String.substring` would
    * split surrogate pairs and diverge from any external replay.
    * Document-local (no shuffle); chunk-level dedup joins shuffle on
    * the 8-byte fingerprint. Runs as the codegen'd `gear_chunks`
    * Expression (no per-document encoder round-trip); the retained UDF
    * twin below pins output parity in PipelineSpec.
    */
  def cdcChunksGear(text: Column, maskBits: Int = 6): Column = {
    GearTable.mask(maskBits) // validates the range eagerly
    call_function("gear_chunks", text, lit(maskBits))
  }

  /** Reference UDF implementation of [[cdcChunksGear]] — kept (not used
    * on any query path) as the parity oracle for the codegen'd
    * Expression.
    */
  private[graft] def cdcChunksGearUdf(
      text: Column, maskBits: Int = 6): Column = {
    val mask = GearTable.mask(maskBits) // validates the range
    val gear = GearTable.values
    val f = udf { s: String =>
      // null → null matches the Expression's nullSafeEval (bit-identical
      // parity must include the null row, not just non-null inputs)
      if (s == null) null
      else {
        val t = s.toLowerCase.replaceAll("\\s+", " ").trim
        val cps = t.codePoints().toArray
        val n = cps.length
        if (n == 0) Array.empty[(Long, Int, Int)]
        else {
          val md = java.security.MessageDigest.getInstance("MD5")
          def h60(sub: String): Long = {
            md.reset()
            val dig = md.digest(sub.getBytes("UTF-8"))
            var h = 0L
            var j = 0
            while (j < 7) { h = (h << 8) | (dig(j) & 0xffL); j += 1 }
            (h << 4) | ((dig(7) & 0xf0L) >>> 4)
          }
          val cuts = scala.collection.mutable.ArrayBuffer[Int](0)
          var h = 0
          var p = 0
          while (p < n) {
            h = ((h << 1) + gear(cps(p) & 0xff)) & (GearTable.Mod - 1)
            // a boundary at the last character coincides with the end
            // bound appended below
            if ((h & mask) == 0 && p + 1 < n) cuts += (p + 1)
            p += 1
          }
          cuts += n
          cuts.iterator.zip(cuts.iterator.drop(1)).map { case (a, b) =>
            (h60(new String(cps, a, b - a)), b - a, a)
          }.toArray
        }
      }
    }
    f(text)
  }

  /** Winnowing fingerprints (the MOSS scheme): polynomial rolling hash
    * over character k-grams of the normalized text, then the minimum hash
    * of each sliding window of `w` consecutive k-gram hashes (rightmost
    * minimum wins ties), deduplicated and sorted. Guarantees every match
    * of length ≥ w+k−1 between two documents shares a fingerprint, at
    * density ~2/(w+1). Document-local (no shuffle); downstream overlap
    * joins shuffle on the 8-byte fingerprint. Runs as the codegen'd
    * `winnow_fps` Expression (no per-document encoder round-trip); the
    * retained UDF twin below pins output parity in PipelineSpec.
    */
  def winnowingFingerprints(text: Column, k: Int = 8, w: Int = 4): Column =
    call_function("winnow_fps", text, lit(k), lit(w))

  /** Reference UDF implementation of [[winnowingFingerprints]] — kept
    * (not used on any query path) as the parity oracle for the codegen'd
    * Expression.
    */
  private[graft] def winnowingFingerprintsUdf(
      text: Column, k: Int = 8, w: Int = 4): Column = {
    require(k >= 1 && w >= 1, "k and w must be >= 1")
    val f = udf { s: String =>
      // null → null matches the Expression's nullSafeEval (bit-identical
      // parity must include the null row, not just non-null inputs)
      if (s == null) null
      else {
        val t = s.trim.toLowerCase.replaceAll("\\s+", " ")
        val n = t.length
        if (n < k) Array.empty[Long]
        else {
          val B = 1000003L
          var bPow = 1L // B^(k-1)
          var i = 1
          while (i < k) { bPow *= B; i += 1 }
          val m = n - k + 1
          val hashes = new Array[Long](m)
          var h = 0L
          i = 0
          while (i < k) { h = h * B + t.charAt(i); i += 1 }
          hashes(0) = h
          i = 1
          while (i < m) {
            h = (h - t.charAt(i - 1) * bPow) * B + t.charAt(i + k - 1)
            hashes(i) = h
            i += 1
          }
          // sliding-window minimum, rightmost tie — emit once per window
          // position change (standard winnowing selection)
          val selected = new java.util.TreeSet[java.lang.Long]()
          var minIdx = -1
          var start = 0
          val lastStart = math.max(0, m - w)
          while (start <= lastStart) {
            val end = math.min(start + w, m)
            if (minIdx < start) {
              minIdx = start
              var j = start + 1
              while (j < end) {
                if (hashes(j) <= hashes(minIdx)) minIdx = j
                j += 1
              }
            } else {
              val j = end - 1
              if (hashes(j) <= hashes(minIdx)) minIdx = j
            }
            selected.add(hashes(minIdx))
            start += 1
          }
          val out = new Array[Long](selected.size())
          val it = selected.iterator()
          i = 0
          while (it.hasNext) { out(i) = it.next(); i += 1 }
          out
        }
      }
    }
    f(text)
  }

  /** BPE subword segmentation of the corpus vocabulary — the tokenizer
    * half of a training-data pipeline: per distinct word (lowercased
    * whitespace token, printable-ASCII, ≥ `minCount` occurrences), its
    * greedy lowest-rank-leftmost-merge segmentation over the vendored
    * [[BpeMerges]] table, with subword count and corpus frequency.
    * Compute fan-in is the point at scale: the kernel runs once per
    * VOCABULARY entry (one map-side-combined count aggregate shrinks
    * the token stream first), not once per token occurrence — the
    * standard tokenize-the-vocab-then-join shape.
    *
    * The per-word kernel is the codegen'd `bpe_split` Expression
    * ([[graft.functions.BpeSplitExpression]]); its one-merge-per-step
    * contract is replayed exactly by the q-entry's recursive-CTE
    * oracle.
    */
  def bpeSegmentVocab(
      docs: DataFrame, textCol: String, minCount: Long = 2L): DataFrame =
    docs
      .select(explode(split(trim(lower(col(textCol))), "\\s+")).as("word"))
      .filter(col("word").rlike("\\A[ -~]+\\z"))
      .groupBy(col("word")).agg(count(lit(1)).as("cnt"))
      .filter(col("cnt") >= minCount)
      .withColumn("__seg", call_function("bpe_split", col("word")))
      .select(col("word"),
        array_join(col("__seg"), " ").as("segmentation"),
        size(col("__seg")).cast("long").as("n_subwords"),
        col("cnt"))

  /** Strided context-window chunking — documents into fixed-size token
    * windows with overlap, the sequence-preparation step between
    * cleaning and packing in a training pipeline (pack whole docs with
    * [[Packing]]; SPLIT long docs with this). Chunk starts are
    * 0, stride, 2·stride, … while start < n_tokens, each chunk the next
    * `window` tokens (the tail chunks run short). Scale shape: one
    * scan-stage sequence+explode per document — no shuffle, no state;
    * chunk count per doc is ⌈n/stride⌉, bounded by doc length.
    * Output: (id, chunk_start, n_tokens, chunk_text).
    */
  def contextChunks(
      docs: DataFrame, textCol: String, idCol: String,
      window: Int, stride: Int): DataFrame = {
    require(window > 0 && stride > 0, "window and stride must be positive")
    docs
      .select(col(idCol), whitespaceTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") >= 1)
      .withColumn("chunk_start",
        explode(sequence(lit(0), col("__n") - 1, lit(stride))))
      .select(col(idCol), col("chunk_start").cast("long").as("chunk_start"),
        least(lit(window), col("__n") - col("chunk_start"))
          .cast("long").as("n_tokens"),
        array_join(slice(col("__toks"), col("chunk_start") + 1, lit(window)),
          " ").as("chunk_text"))
  }

  /** Per-document character statistics in ONE pass — the
    * [[graft.functions.CharStatsExpression]] kernel: code-point count,
    * Σ count² over code-point classes, and distinct code points,
    * without exploding a row per character (the naive relational form
    * is a (doc, char) shuffle whose row count is the corpus's character
    * count — this is a scan-stage struct). Downstream math stays exact:
    * Simpson diversity 1 − Σc²/n² is integer arithmetic plus ONE IEEE
    * division, so the quality cut replays bit-identically cross-engine
    * (no ln, no ordered float sum — chosen over Shannon entropy for
    * exactly that reason).
    * Returns struct(n_chars, sum_sq, distinct_chars).
    */
  def charStats(text: Column): Column =
    call_function("char_stats", text)

  /** Collocation mining by pointwise mutual information: corpus bigram
    * and unigram counts joined, PMI = ln(c_ab·N_bigrams / (c_a·c_b)),
    * top-k by (rounded) PMI. One ln per OUTPUT row on an exactly
    * computed double argument (integer products + one division) —
    * ROUND(6) absorbs libm's faithful-vs-correct rounding slack (the
    * q108 discipline); no float SUM anywhere. Scale shape: one
    * (bigram) count shuffle + one (unigram) count shuffle + two keyed
    * joins on token, then global top-k (TakeOrderedAndProject).
    */
  def pmiCollocations(
      docs: DataFrame, textCol: String, minCount: Long = 5L,
      k: Int = 50): DataFrame = {
    val toks = docs.select(
      whitespaceTokens(trim(lower(col(textCol)))).as("t"))
    val uni = toks.select(explode(col("t")).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val bi = toks.select(explode(ngramsAll(col("t"), 2)).as("g"))
      .groupBy("g").agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
      .withColumn("a", split(col("g"), " ").getItem(0))
      .withColumn("b", split(col("g"), " ").getItem(1))
    val nb = toks.select(
      sum(greatest(size(col("t")) - 1, lit(0))).as("n_bi"))
    bi.join(uni.withColumnRenamed("w", "a").withColumnRenamed("c", "c_a"),
        "a")
      .join(uni.withColumnRenamed("w", "b").withColumnRenamed("c", "c_b"),
        "b")
      .crossJoin(broadcast(nb))
      .select(col("a").as("token_a"), col("b").as("token_b"),
        col("c_ab"), col("c_a"), col("c_b"),
        round(log(
          (col("c_ab").cast("double") * col("n_bi").cast("double")) /
            (col("c_a").cast("double") * col("c_b").cast("double"))), 6)
          .as("pmi"))
      .orderBy(col("pmi").desc, col("token_a"), col("token_b"))
      .limit(k)
  }

  /** Positional phrase search: documents containing the exact token
    * sequence `phrase`, via a positional-postings intersection — the
    * retrieval primitive BM25 ([[bm25TopK]]) can't express (bag-of-words
    * scoring has no adjacency). Each posting for a phrase term maps to
    * its implied phrase START (pos − term index); a start where ALL k
    * distinct term indexes appear is a match — correct even when the
    * phrase repeats a token.
    *
    * Scale shape: the phrase-term filter lands in the SCAN stage (tiny
    * literal IN-set — the inverted-index access path without
    * materializing an index), the k-row phrase table broadcasts, and the
    * only shuffles are the two keyed aggregates on (doc, start) and doc.
    * Output: (id, n_matches, first_pos).
    */
  def phraseSearch(
      docs: DataFrame, textCol: String, idCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    val k = phrase.length
    val spark = docs.sparkSession
    import spark.implicits._
    val ph = phrase.zipWithIndex.toDF("tok", "idx")
    docs
      .select(col(idCol),
        posexplode(whitespaceTokens(trim(lower(col(textCol)))))
          .as(Seq("pos", "tok")))
      .filter(col("tok").isin(phrase.distinct: _*))
      .join(broadcast(ph), "tok")
      .select(col(idCol), (col("pos") - col("idx")).as("base"), col("idx"))
      .filter(col("base") >= 0)
      .groupBy(col(idCol), col("base"))
      .agg(countDistinct(col("idx")).as("__nid"))
      .filter(col("__nid") === k)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_matches"),
        min(col("base")).cast("long").as("first_pos"))
  }

  /** Tokenizer fertility report — corpus-weighted subwords-per-word by
    * word-length bucket, the standard "how well does this merge table
    * fit this corpus" tokenizer diagnostic, computed on the
    * [[bpeSegmentVocab]] output (kernel cost stays per-VOCAB-entry).
    * Integer sums only; fertility is one IEEE division of exact
    * integers — bit-identical cross-engine, no rounding surface.
    */
  def bpeFertility(
      docs: DataFrame, textCol: String, minCount: Long = 2L): DataFrame =
    bpeSegmentVocab(docs, textCol, minCount)
      .withColumn("len_bucket",
        when(length(col("word")) <= 3, "short")
          .when(length(col("word")) <= 6, "mid").otherwise("long"))
      .groupBy("len_bucket")
      .agg(count(lit(1)).as("n_vocab"),
        sum(col("cnt")).as("total_words"),
        sum(col("cnt") * col("n_subwords")).as("total_subwords"))
      .withColumn("fertility",
        col("total_subwords").cast("double") /
          col("total_words").cast("double"))

  /** ALL word n-grams (repeats kept) as an array column — the repetition
    * family needs occurrence counts, where [[shingles]] dedups for set
    * similarity. Same UDF-loop rationale as [[shingles]]: HOF lambdas
    * are interpreted per element.
    */
  def ngramsAll(tokens: Column, n: Int): Column = {
    val f = udf { toks: Seq[String] =>
      if (toks == null || toks.length < n) Array.empty[String]
      else {
        val out = new Array[String](toks.length - n + 1)
        val sb = new java.lang.StringBuilder()
        var i = 0
        while (i < out.length) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          out(i) = sb.toString
          i += 1
        }
        out
      }
    }
    f(tokens)
  }

  /** Gopher-style repetition signal: the most frequent word n-gram per
    * document and the fraction of the document's n-gram occurrences it
    * accounts for (a high top-bigram fraction marks boilerplate/looping
    * text; the standard repetitive-content filter family). Ties resolve
    * to the lexicographically smallest gram, so results are
    * deterministic and engine-replayable. Two shuffles, both keyed —
    * (doc, gram) count then per-doc argmax — no corpus-wide state;
    * documents shorter than n tokens yield no row.
    * Output: (id, top_gram, top_n, n_grams, top_frac).
    */
  def repetitionMetrics(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 2): DataFrame = {
    val grams = docs.select(col(idCol).as("id"),
      explode(ngramsAll(whitespaceTokens(col(textCol)), n)).as("gram"))
    val counts = grams.groupBy(col("id"), col("gram"))
      .agg(count(lit(1)).as("n"))
    // min(struct(-n, gram)) = argmax by count, smallest gram on ties —
    // one hash aggregate, no per-doc sort or window
    counts.groupBy(col("id"))
      .agg(min(struct((-col("n")).as("neg"), col("gram").as("gram")))
        .as("top"),
        sum(col("n")).as("n_grams"))
      .select(col("id"), col("top.gram").as("top_gram"),
        (-col("top.neg")).as("top_n"), col("n_grams"),
        round((-col("top.neg")).cast("double") / col("n_grams"), 6)
          .as("top_frac"))
  }

  /** Distinct word n-gram shingles as an array column. Documents shorter
    * than n tokens yield no shingles (guard: Spark's `sequence(0,-1)`
    * would count DOWN, not produce an empty array).
    */
  def shingles(tokens: Column, n: Int): Column = {
    // a UDF loop, not transform(sequence(...), slice+concat): HOF lambdas
    // are interpreted per element and dominated the dedup pipelines
    // (order matches array_distinct: first occurrence wins)
    val f = udf { toks: Seq[String] =>
      if (toks == null || toks.length < n) Array.empty[String]
      else {
        val seen = new java.util.LinkedHashSet[String]()
        val sb = new java.lang.StringBuilder()
        var i = 0
        val last = toks.length - n
        while (i <= last) {
          sb.setLength(0)
          var j = 0
          while (j < n) {
            if (j > 0) sb.append(' ')
            sb.append(toks(i + j))
            j += 1
          }
          seen.add(sb.toString)
          i += 1
        }
        val out = new Array[String](seen.size)
        seen.toArray(out)
        out
      }
    }
    f(tokens)
  }

  /** Vocabulary coverage curve: the smallest frequency-ranked
    * vocabulary that covers `pct`% of all token occurrences — the
    * number a tokenizer design reads off before fixing its vocab size.
    *
    * The naive form (sort the whole vocabulary by frequency, one global
    * running share) needs a data-scale global window. This computes the
    * identical answer with NO per-token ordering at all: group the
    * vocabulary by its count value c → (c, k_c) pairs (bounded by
    * O(√total_tokens) rows — distinct count values, not tokens), run
    * the cumulative mass/vocab prefix over THAT tiny table descending
    * by c, and resolve each threshold inside its crossing group
    * arithmetically: every token in a group contributes exactly c, so
    * vocab_size = V_prev + ⌈(target − M_prev) / c⌉. Frequency ties
    * (token-name order) cannot change the SIZE — any tie order crosses
    * the target after the same number of tokens. All integer
    * arithmetic; no float anywhere.
    *
    * Output: (pct, total_tokens, vocab_size, covered_tokens), one row
    * per requested threshold.
    */
  /** Flesch reading-ease score per document, with its ingredient
    * counts: words (whitespace tokens), sentences (maximal [.!?]+
    * runs, floored at 1), syllables (maximal vowel-group runs — the
    * standard cheap approximation). One codegen'd scan stage, no
    * shuffle; the two regex counts use RE2∩Java-safe patterns so any
    * engine counts the same runs. 206.835 − 1.015·(w/s) − 84.6·(sy/w),
    * ROUND(6); an empty document NULLs via its zero word count.
    *
    * Output: (idCol, n_words, n_sentences, n_syllables, flesch).
    */
  def readability(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val words = size(whitespaceTokens(col(textCol)))
    val sentences = greatest(lit(1L),
      regexp_count(col(textCol), lit("[.!?]+")))
    val syllables = regexp_count(lower(col(textCol)), lit("[aeiouy]+"))
    docs.select(col(idCol),
        words.cast("long").as("n_words"),
        sentences.cast("long").as("n_sentences"),
        syllables.cast("long").as("n_syllables"))
      .withColumn("flesch", round(
        lit(206.835) -
          lit(1.015) * expr("try_divide(CAST(n_words AS DOUBLE)," +
            " CAST(n_sentences AS DOUBLE))") -
          lit(84.6) * expr("try_divide(CAST(n_syllables AS DOUBLE)," +
            " CAST(n_words AS DOUBLE))"), 6))
  }

  /** Source-concentration report: the Herfindahl–Hirschman index of
    * token mass across sources — "is this corpus really diverse, or is
    * it 80% one crawl?" HHI = Σ(cᵢ/T)² = (Σcᵢ²)/T², so the whole
    * statistic is exact integer arithmetic (per-source token totals
    * via one sum of token COUNTS — no explode — then one
    * |sources|-bounded reduce) with two IEEE ops at the top.
    * effective_sources = 1/HHI, the equivalent count of equal-mass
    * sources.
    *
    * Output: one row (n_sources, total_tokens, hhi, effective_sources).
    */
  def sourceConcentration(
      docs: DataFrame, textCol: String, srcCol: String): DataFrame = {
    val perSource = docs
      .groupBy(col(srcCol))
      .agg(sum(size(whitespaceTokens(lower(col(textCol))))
        .cast("long")).as("__t"))
    perSource.agg(
        count(lit(1)).as("n_sources"),
        sum(col("__t")).as("total_tokens"),
        sum(col("__t").cast("decimal(19,0)") * col("__t"))
          .cast("double").as("__sq"))
      .select(col("n_sources"), col("total_tokens"),
        round(col("__sq") / (col("total_tokens").cast("double") *
          col("total_tokens").cast("double")), 6).as("hhi"),
        round((col("total_tokens").cast("double") *
          col("total_tokens").cast("double")) / col("__sq"), 6)
          .as("effective_sources"))
  }

  /** Number-masked template clusters: documents identical after every
    * digit run collapses to '#' — the generated-boilerplate detector
    * (log lines, receipts, SEO spam) that exact dedup misses because
    * the numbers differ. One masked-hash aggregate; clusters keep
    * their smallest doc id as a stable representative. Groups that are
    * exact duplicates anyway (one distinct raw text) are excluded —
    * those belong to the exact-dedup pass.
    *
    * Output: (template_id, n_docs, n_variants) for clusters with > 1
    * doc and > 1 raw variant.
    */
  def templateClusters(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val masked = regexp_replace(col(textCol), "[0-9]+", "#")
    docs
      .select(col(idCol), col(textCol), md5(masked).as("__h"))
      .groupBy(col("__h"))
      .agg(min(col(idCol)).as("template_id"),
        count(lit(1)).as("n_docs"),
        countDistinct(col(textCol)).as("n_variants"))
      .filter(col("n_docs") > 1 && col("n_variants") > 1)
      .select(col("template_id"), col("n_docs"), col("n_variants"))
  }

  /** Length-bucket mix report: documents bucketed by the power-of-two
    * range of their token count, with document and token shares per
    * bucket — the batch-shape planning input for sequence packing
    * (which context lengths dominate, where the padding waste will
    * be). Buckets come from a descending integer CASE chain (see
    * [[pow2BucketSql]] — never a float log); all counts integer,
    * shares single divisions, ROUND(6).
    *
    * Output: (len_bucket_lo, n_docs, total_tokens, doc_share,
    * token_share) — bucket [2^k, 2^{k+1}) keyed by its lower edge.
    */
  /** Lower power-of-two edge of n's bucket as a pure integer CASE
    * chain over descending edges — float log2 is NOT exact at powers
    * of two on every engine (ln(x)/ln(2) lands at k−ulp), so the
    * boundary stays in integer comparisons. `maxExp` bounds the chain.
    */
  private[graft] def pow2BucketSql(
      nExpr: String, maxExp: Int = 30): String =
    (maxExp to 1 by -1)
      .map(k => s"WHEN $nExpr >= ${1L << k} THEN ${1L << k}L")
      .mkString("CASE ", " ", " ELSE 1L END")

  def lengthBucketMix(
      docs: DataFrame, textCol: String): DataFrame = {
    val n = size(whitespaceTokens(lower(col(textCol)))).cast("long")
    docs.select(n.as("__n")).filter(col("__n") > 0)
      .withColumn("__b", expr(pow2BucketSql("__n")))
      .groupBy(col("__b").as("len_bucket_lo"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("total_tokens"))
      .crossJoin(broadcast(
        docs.select(n.as("__n2")).filter(col("__n2") > 0)
          .agg(count(lit(1)).as("__td"), sum(col("__n2")).as("__tt"))))
      .select(col("len_bucket_lo"), col("n_docs"), col("total_tokens"),
        round(col("n_docs").cast("double") / col("__td").cast("double"),
          6).as("doc_share"),
        round(col("total_tokens").cast("double") /
          col("__tt").cast("double"), 6).as("token_share"))
  }

  /** Per-document sentence-length statistics: sentence count, mean and
    * max words per sentence — the run-on/fragment detector that
    * complements [[readability]]'s single score. Sentences split on
    * maximal [.!?]+ runs (RE2∩Java-safe); blank segments (leading
    * punctuation, trailing terminator) drop. Relational shape: one
    * sentence explode, one (doc, sentence) word count, one doc
    * aggregate — integer counts, one division, ROUND(6).
    *
    * Output: (idCol, n_sentences, avg_words, max_words).
    */
  def sentenceStats(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val sentences = docs.select(col(idCol),
        explode(split(col(textCol), "[.!?]+")).as("__s"))
      .filter(length(trim(col("__s"))) > 0)
      .select(col(idCol),
        size(whitespaceTokens(col("__s"))).cast("long").as("__w"))
    sentences.groupBy(col(idCol))
      .agg(count(lit(1)).as("n_sentences"),
        round(sum(col("__w")).cast("double") /
          count(lit(1)).cast("double"), 6).as("avg_words"),
        max(col("__w")).as("max_words"))
  }

  /** Source language-consistency report: per source, the majority
    * language's share and the language count — the curation check
    * that catches a mislabelled or mixed crawl before stratifying on
    * either column. One (source, lang) contingency aggregate, per-
    * source argmax via min-struct (count desc, lang asc), one
    * division.
    *
    * Output: (srcCol, n_docs, n_langs, majority_lang, majority_share).
    */
  def sourceLangConsistency(
      docs: DataFrame, srcCol: String, langCol: String): DataFrame = {
    val cells = docs.groupBy(col(srcCol), col(langCol).as("__lang"))
      .agg(count(lit(1)).as("__c"))
    cells.groupBy(col(srcCol))
      .agg(sum(col("__c")).as("n_docs"),
        count(lit(1)).as("n_langs"),
        min(struct((-col("__c")).as("__nc"), col("__lang")))
          .as("__best"))
      .select(col(srcCol), col("n_docs"), col("n_langs"),
        col("__best.__lang").as("majority_lang"),
        round((-col("__best.__nc")).cast("double") /
          col("n_docs").cast("double"), 6).as("majority_share"))
  }

  /** Hapax density per document: the fraction of a document's tokens
    * that occur exactly once in the WHOLE corpus — high density flags
    * OCR noise, codes/hashes, or genuinely novel text; near-zero flags
    * boilerplate. A corpus-level quality signal no per-document
    * statistic can fake.
    *
    * Scale shape: one token-count aggregate (map-side combined to one
    * row per distinct token), one token-keyed join back onto the
    * exploded tokens, one doc-keyed aggregate. A corpus hapax occurs
    * once globally, so its document's counter increments by exactly
    * that occurrence. Integer counts, one final division ROUND(6).
    *
    * Output: (idCol, n_tokens, n_hapax, hapax_ratio).
    */
  def hapaxDensity(
      docs: DataFrame, textCol: String, idCol: String): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(whitespaceTokens(lower(col(textCol)))).as("token"))
    val counts = toks.groupBy(col("token"))
      .agg(count(lit(1)).as("__cc"))
    toks.join(counts, "token")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum((col("__cc") === 1L).cast("long")).as("n_hapax"))
      .select(col(idCol), col("n_tokens"), col("n_hapax"),
        round(col("n_hapax").cast("double") /
          col("n_tokens").cast("double"), 6).as("hapax_ratio"))
  }

  /** [[hapaxDensity]] over the persisted [[TextArtifacts]] layout: the
    * corpus-count aggregate AND the count join-back both ride the
    * token bucketing (zero Exchange on either side — the tf table is
    * already one row per (doc, token)), leaving the per-document
    * aggregate as the query's only shuffle — and it moves the
    * (doc, token) tf rows, not the raw token explosion. Bit-identical
    * to the inline path: every published number is an integer count
    * (the corpus count of a token is Σ tf; a document's hapax
    * instances are Σ tf over its corpus-count-1 tokens, each
    * necessarily tf = 1) plus one fixed-shape division — order-free
    * by the eligibility rule in the [[TextArtifacts]] header.
    */
  def hapaxDensityShared(
      docs: DataFrame, textCol: String, idCol: String,
      corpusKey: String): DataFrame = {
    val tf = TextArtifacts.termFreq(docs, idCol, textCol, corpusKey)
    val counts = tf.groupBy(col("token"))
      .agg(sum(col("tf")).as("__cc"))
    tf.join(counts, "token")
      .groupBy(col("id"))
      .agg(sum(col("tf")).as("n_tokens"),
        sum(when(col("__cc") === 1L, col("tf")).otherwise(0L))
          .as("n_hapax"))
      .select(col("id").as(idCol), col("n_tokens"), col("n_hapax"),
        round(col("n_hapax").cast("double") /
          col("n_tokens").cast("double"), 6).as("hapax_ratio"))
  }

  def vocabCoverage(
      docs: DataFrame, textCol: String,
      thresholds: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    val counts = docs
      .select(explode(whitespaceTokens(lower(col(textCol)))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("c"))
    coverageFromCounts(docs.sparkSession, counts, thresholds)
  }

  /** [[vocabCoverage]] over the persisted [[TextArtifacts]] layout:
    * the corpus token-count aggregate rides the token bucketing (zero
    * Exchange — sum(tf) per token over an already-(doc, token)-unique
    * table), and everything downstream operates on the O(√tokens)
    * count-of-counts rollup exactly as the inline path does.
    * Bit-identical: pure integer arithmetic end to end.
    */
  def vocabCoverageShared(
      docs: DataFrame, idCol: String, textCol: String,
      corpusKey: String,
      thresholds: Seq[Int] = Seq(50, 90, 95, 99)): DataFrame = {
    val counts = TextArtifacts.termFreq(docs, idCol, textCol, corpusKey)
      .groupBy(col("token")).agg(sum(col("tf")).as("c"))
    coverageFromCounts(docs.sparkSession, counts, thresholds)
  }

  /** Shared tail of the coverage paths: thresholds resolve inside
    * their crossing count-group arithmetically — no per-token ordering
    * anywhere (see q202's scaladoc in Queries).
    */
  private def coverageFromCounts(
      spark0: SparkSession, counts: DataFrame,
      thresholds: Seq[Int]): DataFrame = {
    require(thresholds.nonEmpty && thresholds.forall(p => p >= 1 && p <= 100),
      "thresholds are integer percentages in 1..100")
    val groups = counts.groupBy(col("c")).agg(count(lit(1)).as("k"))
    val wDesc = Window.orderBy(col("c").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val r = groups
      .withColumn("cum_mass", sum(col("c") * col("k")).over(wDesc))
      .withColumn("cum_vocab", sum(col("k")).over(wDesc))
    val tot = broadcast(groups.agg(
      sum(col("c") * col("k")).as("total")))
    import spark0.implicits._
    val th = broadcast(thresholds.toDF("pct"))
    r.crossJoin(tot).crossJoin(th)
      .withColumn("target", expr("(total * pct + 99) div 100"))
      .filter(col("cum_mass") >= col("target") &&
        col("cum_mass") - col("c") * col("k") < col("target"))
      .select(col("pct"), col("total").as("total_tokens"),
        (col("cum_vocab") - col("k") +
          expr("(target - (cum_mass - c * k) + c - 1) div c"))
          .as("vocab_size"),
        (col("cum_mass") - col("c") * col("k") +
          expr("((target - (cum_mass - c * k) + c - 1) div c) * c"))
          .as("covered_tokens"))
  }

  /** RAG-prep token-window chunking: each document splits into
    * overlapping windows of `size` tokens advancing by `stride`
    * (overlap = size − stride) — the retrieval-index unit every
    * embedding pipeline cuts before encoding. Chunk count is
    * ceil((n − size)/stride) + 1 (one chunk when n ≤ size), so the
    * tail is always covered and never emitted twice.
    *
    * Output: (idCol, chunk_idx, start_tok, n_tok, chunk_text).
    *
    * Scale shape: a pure scan-stage explode — no shuffle, no window;
    * the per-row fan-out is n/stride chunks and each output row carries
    * only its own slice. Exact integer chunk arithmetic (div-based)
    * replays verbatim in the oracle.
    */
  def tokenWindowChunks(
      docs: DataFrame, idCol: String, textCol: String,
      size: Int, stride: Int): DataFrame = {
    require(size >= 1, s"chunk size must be positive: $size")
    require(stride >= 1 && stride <= size,
      s"stride must be in [1, size]: $stride")
    docs
      // split(trim(''), '\s+') is [''] in both engines — empty and
      // whitespace-only docs must be dropped BEFORE tokenizing
      .filter(trim(col(textCol)) =!= "")
      .select(col(idCol), whitespaceTokens(col(textCol)).as("__toks"))
      .withColumn("__n", size_(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__k", expr(
        s"CASE WHEN __n <= $size THEN 1 " +
          s"ELSE (__n - $size + ${stride - 1}) div $stride + 1 END"))
      .select(col(idCol),
        explode(expr("sequence(0, CAST(__k - 1 AS INT))")).as("chunk_idx"),
        col("__toks"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .select(col(idCol), col("chunk_idx").cast("long"),
        col("start_tok").cast("long"),
        size_(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(size)))
          .cast("long").as("n_tok"),
        array_join(slice(col("__toks"),
          (col("chunk_idx") * stride + 1).cast("int"), lit(size)), " ")
          .as("chunk_text"))
  }

  // functions.size shadowed by the param name in some scopes — local alias
  /** Boilerplate-prefix detection (the CCNet/RefinedWeb cleanup step):
    * documents from one source sharing an identical normalized prefix
    * are template artifacts — cookie banners, licence headers, feed
    * frames. Per source: docs total, prefix groups with ≥ minDocs
    * members, docs inside those groups, and the boilerplate rate. Two
    * stacked hash aggregates — (source, prefix) then source — both
    * map-side combined; the prefix is a fixed-width substring so the
    * first shuffle key is bounded regardless of document length. All
    * counts integer; the rate is one IEEE division.
    */
  def boilerplatePrefixes(
      docs: DataFrame,
      textCol: String,
      sourceCol: String,
      prefixLen: Int = 10,
      minDocs: Int = 2): DataFrame = {
    require(prefixLen >= 1 && minDocs >= 2,
      "need prefixLen >= 1 and minDocs >= 2")
    docs
      .select(col(sourceCol).as("source"),
        substring(trim(lower(col(textCol))), 1, prefixLen).as("__p"))
      .groupBy(col("source"), col("__p"))
      .agg(count(lit(1)).as("__n"))
      .groupBy(col("source"))
      .agg(sum(col("__n")).cast("long").as("n_docs"),
        count(when(col("__n") >= minDocs, lit(1))).as("n_groups"),
        coalesce(sum(when(col("__n") >= minDocs, col("__n"))), lit(0L))
          .cast("long").as("n_boiler_docs"))
      .select(col("source"), col("n_docs"), col("n_groups"),
        col("n_boiler_docs"),
        (col("n_boiler_docs").cast("double") /
          col("n_docs").cast("double")).as("boiler_rate"))
      .orderBy("source")
  }

  /** Feature hashing (the "hashing trick", Weinberger et al.,
    * ICML'09): tokens map to a fixed K-bucket index via a salted
    * 60-bit md5 hash — bucket = (h≫1) mod K, sign = ± from the low
    * bit (the signed variant that makes collisions unbiased) — giving
    * every document a fixed-width sparse vector with NO vocabulary
    * pass: no dictionary shuffle, no broadcast, no OOV handling, the
    * property that makes it the default featurizer at corpus scale.
    * Output is the sparse form (doc_id, bucket, fval): one explode
    * (generate — no shuffle) + one (doc, bucket) hash aggregate with
    * map-side combine. The md5 construction replays verbatim
    * off-engine (same contract as Sampling.hash60).
    */
  def featureHash(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      buckets: Int,
      salt: String = "fh:"): DataFrame = {
    require(buckets >= 2, "need at least two hash buckets")
    val h = graft.pipeline.Sampling.hash60(col("token"), salt)
    docs
      .select(col(idCol).as("doc_id"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .select(col("doc_id"),
        (shiftright(h, 1) % buckets).as("bucket"),
        when(h % 2 === 1, lit(1L)).otherwise(lit(-1L)).as("__sign"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(sum(col("__sign")).cast("long").as("fval"))
      .orderBy("doc_id", "bucket")
  }

  private def size_(c: Column): Column =
    org.apache.spark.sql.functions.size(c)

  /** Chao1 species-richness estimate of the UNSEEN vocabulary per
    * group: chao1 = V + F₁²/(2F₂) (F₂ > 0), else the bias-corrected
    * V + F₁(F₁−1)/2 — "how much vocabulary does this source have that
    * the sample hasn't shown yet", the capture–recapture companion to
    * the q243 discovery curve.
    *
    * Exactness: V/F₁/F₂ are exact integer counts off one token-
    * frequency aggregate; the estimate is one fixed IEEE shape,
    * ROUND(6).
    *
    * Scale shape: (group, token) count → frequency-of-frequency
    * rollup — two map-side-combined aggregates, nothing row-sized
    * past the first.
    */
  def chao1Richness(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("__g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("__g"), col("token"))
      .agg(count(lit(1)).as("__c"))
    chao1FromGroupCounts(tf, groupCol)
  }

  /** [[chao1Richness]] over the persisted [[TextArtifacts]] layout:
    * the token explosion and the (doc, token) aggregate are served
    * from the warehouse table; the query attaches the doc→group dim
    * and rolls tf up to (group, token). Bit-identical: the group
    * count of a token is Σ tf over the group's documents — integer
    * sums only, then the shared fixed-IEEE-shape estimate.
    *
    * WHEN TO USE (measured): unlike the pure-token consumers, this
    * one needs an id-keyed join back to the corpus dim that the
    * token bucketing cannot serve — at small scale the join costs
    * more than the explode it saves (gate-SF bench: 0.21 s inline
    * vs 0.48 s here), because inline map-side combine collapses the
    * token stream to |groups|×|vocab| before any shuffle. Prefer
    * this path only when the raw corpus scan dominates (long
    * documents ⇒ tf table ≪ token stream); the registry's q329 uses
    * the inline path for exactly this reason.
    */
  def chao1RichnessShared(
      docs: DataFrame, idCol: String, groupCol: String, textCol: String,
      corpusKey: String): DataFrame = {
    val tf = TextArtifacts.termFreq(docs, idCol, textCol, corpusKey)
      .filter(length(col("token")) > 0)
    val dims = docs.select(col(idCol).as("id"), col(groupCol).as("__g"))
    val gtf = tf.join(dims, "id")
      .groupBy(col("__g"), col("token"))
      .agg(sum(col("tf")).as("__c"))
    chao1FromGroupCounts(gtf, groupCol)
  }

  /** Token-level OOV rate of eval splits against the train-split
    * vocabulary, over the persisted [[TextArtifacts]] layout — the
    * tokenizer-coverage check run before committing a vocab (q122).
    * The deterministic split is a hash of the document id
    * ([[Sampling.splitAssign]]), so it applies directly to the tf
    * table's id column — no join back to the corpus at all; the
    * per-token rollup (train membership + one instance count per
    * LITERAL eval split) rides the token bucketing with zero Exchange,
    * leaving one global scalar aggregate as the only data movement.
    * Bit-identical to the inline explode/anti-join shape: every cell
    * is an integer sum, the rate one fixed-shape division.
    *
    * Output: (split, n_tokens, n_oov, oov_rate) — one row per eval
    * split that has at least one token instance (matching the inline
    * group-by, which cannot emit empty groups).
    */
  def vocabOovShared(
      docs: DataFrame, idCol: String, textCol: String,
      corpusKey: String, splits: Seq[(String, Double)],
      trainSplit: String): DataFrame = {
    require(splits.exists(_._1 == trainSplit),
      s"train split '$trainSplit' must be one of the splits")
    val evalNames = splits.map(_._1).filter(_ != trainSplit)
    require(evalNames.nonEmpty, "need at least one eval split")
    val tf = Sampling.splitAssign(
      TextArtifacts.termFreq(docs, idCol, textCol, corpusKey),
      "id", splits)
    val evalCols = evalNames.map(n =>
      sum(when(col("split") === n, col("tf"))).as(s"__n_$n"))
    val perTok = tf.groupBy(col("token"))
      .agg(max(col("split") === trainSplit).as("__in"), evalCols: _*)
    val aggCols = evalNames.flatMap { n =>
      Seq(sum(coalesce(col(s"__n_$n"), lit(0L))).as(s"__tok_$n"),
        sum(when(!col("__in"), coalesce(col(s"__n_$n"), lit(0L)))
          .otherwise(0L)).as(s"__oov_$n"))
    }
    val one = perTok.agg(aggCols.head, aggCols.drop(1): _*)
    val stackArgs = evalNames
      .map(n => s"'$n', __tok_$n, __oov_$n").mkString(", ")
    one.select(expr(s"stack(${evalNames.size}, $stackArgs)")
        .as(Seq("split", "n_tokens", "n_oov")))
      .filter(col("n_tokens") > 0)
      .withColumn("oov_rate", round(col("n_oov").cast("double") /
        col("n_tokens").cast("double"), 6))
  }

  /** Shared estimate tail of the Chao1 paths: `tf` is
    * (__g, token, __c) group-level token counts. */
  private def chao1FromGroupCounts(
      tf: DataFrame, groupCol: String): DataFrame = {
    val f = tf.groupBy(col("__g"))
      .agg(count(lit(1)).as("vocab"),
        count(when(col("__c") === 1, lit(1))).as("f1"),
        count(when(col("__c") === 2, lit(1))).as("f2"))
    val f1d = col("f1").cast("double")
    val f2d = col("f2").cast("double")
    val vd = col("vocab").cast("double")
    f.select(col("__g").as(groupCol), col("vocab"), col("f1"),
      col("f2"),
      round(when(col("f2") > 0, vd + f1d * f1d / (lit(2.0) * f2d))
        .otherwise(vd + f1d * (f1d - lit(1.0)) / lit(2.0)), 6)
        .as("chao1"))
  }

  /** Jensen–Shannon divergence between every pair of groups' token
    * distributions — the symmetric, bounded (≤ ln 2) "how different
    * are these two sources' vocabularies", where KL alone explodes on
    * disjoint support. JSD = ½Σ p·ln(p/m) + ½Σ q·ln(q/m), m=(p+q)/2.
    *
    * Exactness: per-token probabilities are exact-integer ratios
    * computed as ONE fixed shape each; ln is libm, so each token's
    * two contribution terms are DECIMAL(28,12)-quantized before the
    * order-free per-pair sum (q267 discipline) and the output ships
    * ROUND(6). Tokens absent from one side contribute p·ln 2 via the
    * same expression with q = 0 (coalesced count), never a special
    * case.
    *
    * Scale shape: one (group, token) aggregate; the pair stage is a
    * token-keyed self-join of the bounded histogram fanned per group
    * pair — posting-list bounded, never row².
    */
  def jsdBetweenGroups(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val tf = docs
      .select(col(groupCol).as("__g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("__g"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val n = tf.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("__n"))
    val h = tf.join(n, "__g")
    val a = h.select(col("__g").as("g_a"), col("token"),
      col("__c").as("__ca"), col("__n").as("__na"))
    val b = h.select(col("__g").as("g_b"), col("token"),
      col("__c").as("__cb"), col("__n").as("__nb"))
    val na = broadcast(n.select(col("__g").as("g_a"),
      col("__n").as("__na2")))
    val nb = broadcast(n.select(col("__g").as("g_b"),
      col("__n").as("__nb2")))
    pairedCounts(a, b, na, nb)
  }

  /** Character-level Shannon entropy per group (bits/char) — the
    * compressibility proxy: a source whose text runs ~1–2 bits/char
    * is boilerplate or repetition; natural prose sits ~4. The
    * char-level companion to the token-entropy family.
    *
    * Exactness: character counts are exact integers (one explode of
    * the 1..len index grid — the q175 construction, identical on both
    * engines); each char's −p·log2(p) term is one fixed IEEE shape
    * DECIMAL(28,12)-quantized before the order-free sum, ROUND(6).
    *
    * Scale shape: one (group, char) aggregate over the exploded
    * corpus; everything after runs on the bounded alphabet table.
    */
  def charEntropy(
      docs: DataFrame, groupCol: String, textCol: String): DataFrame = {
    // one-pass char explode: split("") yields the code-point array in
    // O(L); the previous positional substring probe re-scanned the
    // string per character (O(L²) per doc on multi-byte text)
    val chars = docs
      .filter(length(col(textCol)) >= 1)
      .select(col(groupCol).as("__g"),
        explode(split(col(textCol), "")).as("__c"))
    val counts = chars.groupBy(col("__g"), col("__c"))
      .agg(count(lit(1)).as("__k"))
    val totals = counts.groupBy(col("__g"))
      .agg(sum(col("__k")).cast("long").as("__n"),
        count(lit(1)).as("distinct_chars"))
    val p = col("__k").cast("double") / col("__n").cast("double")
    counts.join(totals, "__g")
      .select(col("__g"), col("__n"), col("distinct_chars"),
        (-p * log2(p)).cast("decimal(28,12)").as("__h"))
      .groupBy(col("__g"))
      .agg(max(col("__n")).as("n_chars"),
        max(col("distinct_chars")).as("distinct_chars"),
        round(sum(col("__h")).cast("double"), 6).as("entropy_bits"))
      .withColumnRenamed("__g", groupCol)
  }

  /** The stopword list RAKE splits candidate phrases on — a small
    * LITERAL vocabulary shared verbatim with the oracle.
    */
  val RakeStopwords: Seq[String] = Seq(
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "at", "by", "be", "this", "that",
    "are", "was", "from", "but", "not", "have", "has")

  /** RAKE keyphrase extraction (Rose et al. 2010): candidate phrases
    * are maximal runs of non-stopword tokens (capped at `maxLen`
    * words); each word scores degree/frequency (degree = Σ phrase
    * length over its occurrences — co-occurrence including self), and
    * a phrase scores the sum of its words' scores. The canonical
    * unsupervised keyword extractor for corpus summarization.
    *
    * Exactness: freq/degree are exact integer counts; each word's
    * score is ONE division, quantized DECIMAL(28,12); a phrase sums
    * ≤ maxLen quantized scores (exact decimal adds); the top-k cut
    * orders by the ROUNDED score with a phrase-text tie-break.
    *
    * Scale shape: tokenize → phrase-id by stopword cumsum (one
    * doc-keyed window) → word and phrase aggregates — token-keyed
    * shuffles throughout; the phrase→word rejoin runs on the bounded
    * distinct-phrase table.
    */
  def rakeKeyphrases(
      docs: DataFrame, idCol: String, textCol: String,
      topK: Int = 20, maxLen: Int = 4): DataFrame = {
    require(topK >= 1 && maxLen >= 1, "need topK, maxLen >= 1")
    import org.apache.spark.sql.expressions.Window
    val toks = docs
      .select(col(idCol).as("__d"),
        posexplode(split(lower(col(textCol)), "[^a-z0-9]+"))
          .as(Seq("__pos", "__w")))
      .filter(length(col("__w")) > 0)
      .withColumn("__stop",
        col("__w").isin(RakeStopwords: _*).cast("int"))
    val wSeq = Window.partitionBy(col("__d")).orderBy(col("__pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val members = toks
      .withColumn("__pid", sum(col("__stop")).over(wSeq))
      .filter(col("__stop") === 0)
    val phrases = members
      .groupBy(col("__d"), col("__pid"))
      .agg(count(lit(1)).as("__len"),
        concat_ws(" ", transform(sort_array(collect_list(
          struct(col("__pos"), col("__w")))), x => x.getField("__w")))
          .as("phrase"))
      .filter(col("__len") <= maxLen)
    val wordStats = members
      .join(phrases.select(col("__d"), col("__pid"), col("__len")),
        Seq("__d", "__pid"))
      .groupBy(col("__w"))
      .agg(count(lit(1)).as("__freq"),
        sum(col("__len")).cast("long").as("__deg"))
      .select(col("__w"),
        (col("__deg").cast("double") / col("__freq").cast("double"))
          .cast("decimal(28,12)").as("__score"))
    val phraseCounts = phrases.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occurrences"))
    phraseCounts
      .select(col("phrase"), col("n_occurrences"),
        explode(split(col("phrase"), " ")).as("__w"))
      .join(wordStats, "__w")
      .groupBy(col("phrase"), col("n_occurrences"))
      .agg(round(sum(col("__score")).cast("double"), 6).as("score"))
      .orderBy(col("score").desc, col("phrase"))
      .limit(topK)
  }

  /** Class-based TF-IDF (the BERTopic c-TF-IDF): per (class, token),
    * score = (c_{s,w}/n_s) · ln(1 + A/f_w) with A the mean class
    * token count and f_w the corpus frequency — "which tokens
    * CHARACTERIZE this source", where plain TF-IDF characterizes
    * documents. Top `topK` tokens per class.
    *
    * Exactness: every input is an exact integer count; the score is
    * one fixed IEEE shape per (class, token) row, ROUND(6); the
    * per-class cut ranks on (rounded score desc, token asc).
    *
    * Scale shape: one (class, token) aggregate, token-keyed corpus
    * rollup joined back, per-class rank window over the class's
    * vocabulary.
    */
  def classTfIdf(
      docs: DataFrame, classCol: String, textCol: String,
      topK: Int = 10): DataFrame = {
    require(topK >= 1, "topK must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(classCol).as("__g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("__g"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val perClass = tf.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("__n"))
    val corpus = tf.groupBy(col("token"))
      .agg(sum(col("__c")).cast("long").as("__f"))
    val avgSz = broadcast(perClass.agg(
      sum(col("__n")).cast("long").as("__tot"),
      count(lit(1)).as("__k")))
    val scored = tf.join(perClass, "__g").join(corpus, "token")
      .crossJoin(avgSz)
      .select(col("__g"), col("token"), col("__c"),
        round((col("__c").cast("double") / col("__n").cast("double"))
          * log(lit(1.0) +
            (col("__tot").cast("double") / col("__k").cast("double"))
              / col("__f").cast("double")), 6).as("score"))
    val w = Window.partitionBy(col("__g"))
      .orderBy(col("score").desc, col("token").asc)
    scored.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= topK)
      .select(col("__g").as(classCol), col("token"),
        col("__c").as("tf"), col("score"), col("__rk").as("rank"))
  }

  /** Burrows' Delta stylometric distance between every class pair:
    * z-score each class's relative frequency of the corpus's top-N
    * tokens, Delta = mean |z_a − z_b| — the classic authorship/
    * register distance (function-word profile, not topic).
    *
    * Exactness: relative frequencies are one exact-integer division
    * each, DECIMAL(28,12)-quantized before the cross-class mean/var
    * sums (class sets are data-ordered); z and |Δz| are fixed IEEE
    * shapes on those quantized values; per-pair |Δz| terms quantize
    * again before the order-free mean. The top-N token cut is
    * deterministic (corpus freq desc, token asc).
    *
    * Scale shape: everything beyond the one (class, token) aggregate
    * runs on the |classes|·N bounded profile table.
    */
  def burrowsDelta(
      docs: DataFrame, classCol: String, textCol: String,
      topN: Int = 50): DataFrame = {
    require(topN >= 1, "topN must be positive")
    import org.apache.spark.sql.expressions.Window
    val tf = docs
      .select(col(classCol).as("__g"),
        explode(split(trim(lower(col(textCol))), "\\s+")).as("token"))
      .filter(length(col("token")) > 0)
      .groupBy(col("__g"), col("token"))
      .agg(count(lit(1)).as("__c"))
    val perClass = tf.groupBy(col("__g"))
      .agg(sum(col("__c")).cast("long").as("__n"))
    val top = tf.groupBy(col("token"))
      .agg(sum(col("__c")).cast("long").as("__f"))
      .orderBy(col("__f").desc, col("token").asc)
      .limit(topN)
      .select(col("token"))
    val grid = perClass.crossJoin(broadcast(top))
      .join(tf, Seq("__g", "token"), "left")
      .na.fill(0L, Seq("__c"))
      .select(col("__g"), col("token"),
        (col("__c").cast("double") / col("__n").cast("double"))
          .cast("decimal(28,12)").as("__r"))
    // r² in DOUBLE then re-quantized: a decimal×decimal at scale 12
    // exceeds precision 38 and the engines round it differently
    val stats = grid.groupBy(col("token"))
      .agg(count(lit(1)).as("__s"),
        sum(col("__r")).as("__sr"),
        sum((col("__r").cast("double") * col("__r").cast("double"))
          .cast("decimal(28,12)")).as("__srr"))
    val sd = col("__s").cast("double")
    val mu = col("__sr").cast("double") / sd
    val varP = col("__srr").cast("double") / sd - mu * mu
    // zero-variance tokens (identical relative frequency in every
    // class) are dropped on BOTH engines — ANSI double/0 would throw
    val z = grid.join(broadcast(stats), "token")
      .filter(varP > 0)
      .select(col("__g"), col("token"),
        ((col("__r").cast("double") - mu) / sqrt(varP)).as("__z"))
    val za = z.select(col("__g").as("g_a"), col("token"),
      col("__z").as("__za"))
    val zb = z.select(col("__g").as("g_b"), col("token"),
      col("__z").as("__zb"))
    za.join(zb, Seq("token"))
      .filter(col("g_a") < col("g_b"))
      .select(col("g_a"), col("g_b"),
        abs(col("__za") - col("__zb")).cast("decimal(28,12)")
          .as("__d"))
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_tokens"),
        round(sum(col("__d")).cast("double") /
          count(lit(1)).cast("double"), 6).as("delta"))
  }

  /** All (g_a < g_b, token) rows with both sides' counts, zeros
    * filled: tokens present in either group appear exactly once per
    * pair. Built as present-in-A ∪ (present-in-B ∖ A) against the
    * group list — no token-only cross join.
    */
  private def pairedCounts(
      a: DataFrame, b: DataFrame,
      na: DataFrame, nb: DataFrame): DataFrame = {
    val withB = a.crossJoin(broadcast(nb.select(col("g_b")).distinct()))
      .filter(col("g_a") < col("g_b"))
      .join(b, Seq("token", "g_b"), "left")
      .na.fill(0L, Seq("__cb"))
      .join(nb, Seq("g_b"))
      .select(col("g_a"), col("g_b"), col("token"),
        col("__ca"), col("__na"), col("__cb"),
        col("__nb2").as("__nb"))
    val onlyB = b.crossJoin(broadcast(na.select(col("g_a")).distinct()))
      .filter(col("g_a") < col("g_b"))
      .join(a.select(col("token"), col("g_a"))
        .withColumn("__present", lit(1)), Seq("token", "g_a"), "left")
      .filter(col("__present").isNull)
      .join(na, Seq("g_a"))
      .select(col("g_a"), col("g_b"), col("token"),
        lit(0L).as("__ca"), col("__na2").as("__na"),
        col("__cb"), col("__nb"))
    val rows = withB.union(onlyB)
    val pa = col("__ca").cast("double") / col("__na").cast("double")
    val pb = col("__cb").cast("double") / col("__nb").cast("double")
    val m = (pa + pb) / lit(2.0)
    val termA = when(col("__ca") > 0, pa * log(pa / m))
      .otherwise(lit(0.0)).cast("decimal(28,12)")
    val termB = when(col("__cb") > 0, pb * log(pb / m))
      .otherwise(lit(0.0)).cast("decimal(28,12)")
    rows
      .groupBy(col("g_a"), col("g_b"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(termA).as("__sa"), sum(termB).as("__sb"))
      .select(col("g_a"), col("g_b"), col("n_tokens"),
        round((col("__sa").cast("double") +
          col("__sb").cast("double")) / lit(2.0), 6).as("jsd"))
  }
}
