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
    from collections import Counter, defaultdict
    byfam = defaultdict(list)
    for n, e in zip(names, elems):
        byfam[fam_of[n]].append((n, e.count("\n") + 1))
    for fam in sorted(byfam):
        lines = sum(l for _, l in byfam[fam])
        print(f"\n== {fam}: {len(byfam[fam])} queries, {lines} lines")
        print("   " + " ".join(n for n, _ in byfam[fam]))


if __name__ == "__main__":
    main()
