#!/usr/bin/env python3
"""Split Queries.scala's 370-entry registry Seq into family files.

Phase 1 (analyze): tokenize the registry literal, find element
boundaries at depth-1 commas (string/comment aware), classify each
element by query name, print the plan.
Phase 2 (write, --write): emit graft/queries/*.scala family files, the
shared helpers object, and the slimmed Queries.scala.
"""
import re
import sys

SRC = "src/main/scala/graft/Queries.scala"


def read():
    with open(SRC) as f:
        return f.read()


def registry_span(text):
    """Return (start_idx, end_idx) of the chars of the Seq(...) element
    region: after 'Seq(' of the registry decl, before its closing ')'."""
    m = re.search(r"private val registry: Seq\[Q\] = Seq\(", text)
    start = m.end()
    # scan to matching close paren, string/comment aware
    i = start
    depth = 1
    n = len(text)
    while i < n:
        c = text[i]
        if text.startswith('"""', i):
            j = text.find('"""', i + 3)
            # scala triple quotes: closing may be followed by extra quotes
            while j + 3 < n and text[j + 3] == '"':
                j += 1
            i = j + 3
            continue
        if c == '"':
            i += 1
            while text[i] != '"':
                if text[i] == "\\":
                    i += 1
                i += 1
            i += 1
            continue
        if text.startswith("//", i):
            i = text.find("\n", i)
            continue
        if text.startswith("/*", i):
            i = text.find("*/", i) + 2
            continue
        if c == "'":
            # char literal or symbol; treat '\'' and 'x'
            if i + 2 < n and text[i + 2] == "'":
                i += 3
                continue
            if i + 3 < n and text[i + 1] == "\\" and text[i + 3] == "'":
                i += 4
                continue
            i += 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
            if depth == 0:
                return start, i
        i += 1
    raise RuntimeError("unbalanced")


def split_elements(text, start, end):
    """Split the element region into top-level elements at depth-0
    commas (relative to region)."""
    elems = []
    depth = 0
    i = start
    elem_start = start
    n = end
    while i < n:
        c = text[i]
        if text.startswith('"""', i):
            j = text.find('"""', i + 3)
            while j + 3 < len(text) and text[j + 3] == '"':
                j += 1
            i = j + 3
            continue
        if c == '"':
            i += 1
            while text[i] != '"':
                if text[i] == "\\":
                    i += 1
                i += 1
            i += 1
            continue
        if text.startswith("//", i):
            i = text.find("\n", i)
            continue
        if text.startswith("/*", i):
            i = text.find("*/", i) + 2
            continue
        if c == "'":
            if i + 2 < len(text) and text[i + 2] == "'":
                i += 3
                continue
            if i + 3 < len(text) and text[i + 1] == "\\" and text[i + 3] == "'":
                i += 4
                continue
            i += 1
            continue
        if c in "([{":
            depth += 1
        elif c in ")]}":
            depth -= 1
        elif c == "," and depth == 0:
            elems.append(text[elem_start:i])
            elem_start = i + 1
        i += 1
    tail = text[elem_start:end].strip()
    if tail:
        elems.append(text[elem_start:end])
    return elems


FAMILIES = [
    # (family, regex over query name) — first match wins
    ("Promql", r"promql|atan2|mad\b"),
    ("Streaming", r"stream|cusum|session_windows|late_data|watermark"),
    ("Dedup", r"dedup|minhash|simhash|jaccard|winnow|shingl|contamin|leak|"
              r"golden|connected|cluster_assign|exact_dup|near_dup|cross_source"),
    ("Similarity", r"_ann_|_knn|_ivf|_lsh|_pq_|_pq$|cosine|semdedup|kmeans|"
                   r"centroid|embed|vector|_margin|recall|matryoshka|gram_matrix|"
                   r"feature_hash|_jl_|jl_dist|linear_cka"),
    ("Multimodal", r"multimodal|media_|audio_|dhash|frame_sample"),
    ("Text", r"token|tfidf|bm25|bigram|unigram|vocab|lang|quality|gopher|pii|"
             r"readab|zipf|hapax|keyword|ngram|bpe|fertility|rake|text|"
             r"redaction|repetition|repeat_scrub|char_|boilerplate|sentence|"
             r"templates|typo|phrase|pmi|corpus|burrows|edit_verified"),
    ("Sampling", r"sample|split|stratif|weighted_draw|pps|reservoir|negative|"
                 r"downsample|_resample|sequence_pack|mmr_rerank|budget_mix|"
                 r"temperature_mix|importance_weight"),
    ("Graph", r"triangle|pagerank|k_core|kcore|label_prop|adamic|graph|"
              r"component|cooccurrence|record_linkage"),
    ("Sketch", r"hll|bloom|count_min|cms_|kmv|misra|bitmap|sketch|theta|"
               r"heavy_hitters|chao1|lincoln"),
    ("Profiling", r"profile|drift|psi_|_ks_|ks_drift|wasserstein|benford|"
                  r"expectation|histogram|quantile|outlier|anomal|zscore|"
                  r"mahalanobis|scorecard|winsorized|moments|contract_audit|"
                  r"validity|json_props|availability|cardinality|fd_profile"),
    ("Sensor", r"gorilla|sensor|senml|influx|arrow|csv|export|matcher|catalog|"
               r"remote|xor|vacuum|store|asof|as_of|gap_|deadband|blob|"
               r"agg$|range_scan|time_bucket|topk|join_broadcast|semi_join|"
               r"anti_join|rollup$|union|composite|location|label_match|"
               r"metrics_summary|per_sensor"),
    ("Behavior", r"funnel|retention|_dau|attribution|concurrency|audience|"
                 r"user_|cuped|lift|paths|revenue|hhi$|_hhi|streak|rfm|"
                 r"leadtime|price|brand|abc_parts|churn|ltv|new_vs|movers|"
                 r"order_size|daily_mix|conversion|error_breach|reengaged|"
                 r"segment|nation|pivot|star_join|diff_in_diff|matched_att|"
                 r"entry_exit|topn_other|mix_rate|interarrival|source_|"
                 r"session|discount|url_|psl_|domains"),
]


def classify(name):
    for fam, pat in FAMILIES:
        if re.search(pat, name):
            return fam
    return "Stats"


IMPORTS = """
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.adapters.EventsAdapter
import graft.exporters.Exporters
import graft.operators.{AsOfJoin, LabelMatcher, Matchers, SensorOps}
import graft.pipeline.{Dedup, Multimodal, Similarity, TextAnalysis}
import graft.prometheus.{PrometheusRemote, XorChunk}
import graft.promql.SimplePromQL
import graft.sources.{CsvImporter, InfluxLineProtocol, SenML}
import QueryHelpers._
""".lstrip("\n")

FAMILY_DOC = {
    "Sensor": "Reference-surface queries: sensor store scans, joins, "
              "imports/exports, catalog, as-of joins (SURVEY §2.1–§2.10).",
    "Promql": "PromQL engine queries: instant/range selectors, rate/delta, "
              "aggregations, binary ops, subqueries (SURVEY §2.11 PromQL family).",
    "Dedup": "Deduplication pipeline: exact/MinHash/SimHash/Jaccard/winnowing, "
             "clusters, contamination, cross-source leakage.",
    "Similarity": "Embedding similarity: ANN (brute/LSH/IVF/PQ), k-means, "
                  "centroids, recall evals, projection diagnostics.",
    "Multimodal": "Multimodal lanes: image decode/resize/dHash, audio energy, "
                  "frame sampling (binary columns + typed metadata).",
    "Text": "Text analysis: language-ID, quality scoring, token/BPE stats, "
            "TF-IDF/BM25, vocabulary, readability, PII.",
    "Sampling": "Sampling suite: deterministic/stratified/weighted/PPS/exact-k, "
                "splits, downsampling, resampling grids.",
    "Graph": "Graph analytics: triangles, k-core, PageRank, label propagation, "
             "link prediction, co-occurrence.",
    "Sketch": "Mergeable sketches: HLL, Bloom, Count-Min, KMV, bitmaps, "
              "heavy hitters, capture-recapture estimators.",
    "Profiling": "Data profiling and drift: one-pass profiles, PSI/KS/Wasserstein, "
                 "Benford, expectations, outlier screens.",
    "Streaming": "Structured Streaming queries: windows, sessions, interval "
                 "joins, streaming dedup/CUSUM/HLL, output-mode pins.",
    "Behavior": "Behavioral/business analytics over events + TPC-H tables: "
                "funnels, retention, revenue, attribution, cohort mixes.",
    "Stats": "Statistics/eval library: hypothesis tests, correlations, "
             "survival, calibration, ranking metrics, estimators.",
}

# Composition order in the slim Queries.scala (stable, documented)
FAMILY_ORDER = ["Sensor", "Promql", "Dedup", "Similarity", "Multimodal",
                "Text", "Sampling", "Graph", "Sketch", "Profiling",
                "Streaming", "Behavior", "Stats"]


def write_files(text, start, end, names, elems, fam_of):
    import os
    from collections import defaultdict
    byfam = defaultdict(list)
    for n, e in zip(names, elems):
        byfam[fam_of[n]].append(e)
    os.makedirs("src/main/scala/graft/queries", exist_ok=True)
    for fam in FAMILY_ORDER:
        body = ",".join(byfam[fam])
        content = (
            "package graft\npackage queries\n\n" + IMPORTS +
            f"\n/** {FAMILY_DOC[fam]}\n"
            "  *\n"
            "  * One of the family registries composed into "
            "[[graft.Queries]];\n"
            "  * oracle/alias conventions are documented there.\n"
            "  */\n"
            f"private[graft] object {fam}Queries {{\n\n"
            f"  val registry: Seq[Q] = Seq({body}\n  )\n}}\n")
        path = f"src/main/scala/graft/queries/{fam}Queries.scala"
        with open(path, "w") as f:
            f.write(content)
        print(f"wrote {path}: {content.count(chr(10))} lines,"
              f" {len(byfam[fam])} queries")

    lines = text.split("\n")
    # helper block 1: Q / q / qNoOracle / dsum / lshOracleSql — from the
    # line of 'private case class Q(' to the line before
    # 'private val registry'
    def line_idx(pat):
        for i, l in enumerate(lines):
            if re.search(pat, l):
                return i
        raise RuntimeError(pat)
    h1a = line_idx(r"private case class Q\(")
    # include the scaladoc above Q (walk back over comment lines)
    while lines[h1a - 1].strip().startswith(("/**", "*", "//")) or \
            not lines[h1a - 1].strip():
        h1a -= 1
        if lines[h1a].strip().startswith("/**"):
            break
    h1b = line_idx(r"private val registry: Seq\[Q\] = Seq\(")
    # helper block 2: after the registry's closing '  )' to before
    # 'lazy val all'
    reg_close_line = text[:end].count("\n") + 1  # 1-based line of ')'
    h2a = reg_close_line  # 0-based index of the line AFTER '  )'
    h2b = line_idx(r"^  lazy val all: Map\[String")
    # strip trailing blanks
    while not lines[h2b - 1].strip():
        h2b -= 1

    def strip_private(ls):
        out = []
        for l in ls:
            if l.startswith("  private "):
                out.append("  " + l[len("  private "):])
            else:
                out.append(l)
        return out

    helpers = (
        "package graft\npackage queries\n\n" + IMPORTS +
        "\n/** Shared definitions for the family query registries: the Q\n"
        "  * record, the q/qNoOracle constructors, the exact-decimal sum\n"
        "  * helper, and every cross-query oracle-SQL builder / scoped\n"
        "  * streaming-session holder the registries reference. Split out\n"
        "  * of the former monolithic Queries.scala (r13); semantics are\n"
        "  * unchanged — these were its private members.\n"
        "  */\n"
        "private[graft] object QueryHelpers {\n\n" +
        "\n".join(strip_private(lines[h1a:h1b])).rstrip() + "\n\n" +
        "\n".join(strip_private(lines[h2a:h2b])).rstrip() +
        "\n}\n")
    with open("src/main/scala/graft/queries/QueryHelpers.scala", "w") as f:
        f.write(helpers)
    print(f"wrote QueryHelpers.scala: {helpers.count(chr(10))} lines")

    # slim Queries.scala: keep the original file-top scaladoc
    doc_start = line_idx(r"^/\*\* Registry of driver-checked queries")
    doc_end = line_idx(r"^object Queries \{")
    comp = " ++\n    ".join(f"{fam}Queries.registry" for fam in FAMILY_ORDER)
    slim = (
        "package graft\n\n"
        "import org.apache.spark.sql.{DataFrame, SparkSession}\n"
        "import graft.queries._\n"
        "import graft.queries.QueryHelpers.Q\n\n" +
        "\n".join(lines[doc_start:doc_end]) +
        "object Queries {\n\n"
        "  /** The full registry: family files under graft/queries/ (split\n"
        "    * r13 from the former 14k-line monolith), composed here. Family\n"
        "    * membership is organizational only — ids stay globally unique\n"
        "    * (checked below) and the driver surface (all/oracles) is\n"
        "    * unchanged.\n"
        "    */\n"
        f"  private val registry: Seq[Q] =\n    {comp}\n\n"
        "  require(registry.map(_.name).distinct.length == registry.length,\n"
        "    \"duplicate query ids across family registries\")\n\n"
        "  lazy val all: Map[String, (SparkSession, String) => DataFrame] =\n"
        "    registry.map(x => x.name -> x.fn).toMap\n\n"
        "  lazy val oracles: Map[String, String] =\n"
        "    registry.flatMap(x => x.oracle.map(x.name -> _)).toMap\n"
        "}\n")
    with open(SRC, "w") as f:
        f.write(slim)
    print(f"wrote slim {SRC}: {slim.count(chr(10))} lines")


def main():
    text = read()
    start, end = registry_span(text)
    elems = split_elements(text, start, end)
    names = []
    for e in elems:
        m = re.search(r'(?:q|qNoOracle)\(\s*\n?\s*"([^"]+)"', e)
        if not m:
            print("UNNAMED ELEMENT:", e[:200], file=sys.stderr)
            sys.exit(1)
        names.append(m.group(1))
    assert len(names) == len(set(names)), "duplicate names"
    print(f"registry region lines "
          f"{text[:start].count(chr(10))+1}..{text[:end].count(chr(10))+1}")
    print(f"{len(elems)} elements")
    fam_of = {}
    for n, e in zip(names, elems):
        fam_of[n] = classify(n)
    from collections import defaultdict
    byfam = defaultdict(list)
    for n, e in zip(names, elems):
        byfam[fam_of[n]].append((n, e.count("\n") + 1))
    for fam in sorted(byfam):
        nl = sum(l for _, l in byfam[fam])
        print(f"\n== {fam}: {len(byfam[fam])} queries, {nl} lines")
        print("   " + " ".join(n for n, _ in byfam[fam]))
    if "--write" in sys.argv:
        write_files(text, start, end, names, elems, fam_of)


if __name__ == "__main__":
    main()
