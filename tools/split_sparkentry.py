#!/usr/bin/env python3
"""One-shot refactor: split SparkEntry.scala's 199-entry queries/oracleSql
maps into per-family registry files (package graft, graft/registry/ dir),
leaving SparkEntry as the thin composition that preserves the driver
contract. Run from /root/repo; idempotent only on the ORIGINAL file."""
import re, os, sys

SRC = "src/main/scala/graft/SparkEntry.scala"
OUT = "src/main/scala/graft/registry"

lines = open(SRC).read().split("\n")

# --- region boundaries (exact-format anchors, fail loudly if drifted) ---
q_start = next(i for i, l in enumerate(lines)
               if l.startswith("  def queries: Map[String,"))
q_end = next(i for i in range(q_start, len(lines)) if lines[i] == "  )")
o_start = next(i for i, l in enumerate(lines)
               if l.startswith("  def oracleSql: Map[String, String] = Map("))
o_end = next(i for i in range(o_start, len(lines)) if lines[i] == "  )")
shared = lines[q_end + 1:o_start]   # shared private vals + doc comments

def chunks(body):
    """Split map-body lines into per-entry chunks; leading comments attach
    to the entry that follows them."""
    idx = [i for i, l in enumerate(body) if re.match(r'^    "q\d', l)]
    assert idx, "no entries found"
    out = []
    for n, i in enumerate(idx):
        j = idx[n + 1] if n + 1 < len(idx) else len(body)
        out.append(body[i:j])
    # move trailing comment lines of each chunk to the start of the next
    for n in range(len(out) - 1):
        while out[n] and re.match(r'^\s*//', out[n][-1]):
            out[n + 1].insert(0, out[n].pop())
    # leading comments before the first entry stay with it (already are)
    head = body[:idx[0]]
    out[0] = head + out[0]
    return out

def key_of(chunk):
    for l in chunk:
        m = re.match(r'^    "(q\d+[a-z0-9_]*)"', l)
        if m:
            return m.group(1)
    raise AssertionError(chunk)

def qnum(key):
    return int(re.match(r'q(\d+)', key).group(1))

PARITY = {1,2,3,4,5,6,7,8,9,28,87,88,91,100,159}
STREAMING = {23,82,134,153,157,162,176}
SIMILARITY = {37,38,39,40,41,42,43,47,51,98,99,140,141,142,149,151,152,161,
              166,170,173,174,179}
TEXT = {30,31,32,33,34,35,36,52,58,62,79,80,81,86,112,121,132,139,143,
        144,145,150,156,163,164,165,182,183,184,185,186}
CORPUS = {93,94,95,96,97,114,115,116,120,125,154,155,158,167,168,169,171,
          172,175,177,178,180,181,187,189,190,197,198,199,200}
EVENTS = {22,24,60,61,73,78,119,123,128,129,130,133,135,138,160,188,191,192,
          193,194,195,196}

def family(key):
    n = qnum(key)
    if n in PARITY: return "Parity"
    if n in STREAMING: return "Streaming"
    if n in SIMILARITY: return "Similarity"
    if n in TEXT: return "Text"
    if n in CORPUS: return "Corpus"
    if n in EVENTS: return "Events"
    return "Relational"

SHARED_NAMES = ["rangeJoinOracleSql", "sessionsOracleSql", "q34OracleRef",
                "KmeansOracleSql"]

def requalify(text):
    for n in SHARED_NAMES:
        text = re.sub(r'(?<![.\w])' + n + r'(?![\w])',
                      "SharedOracleSql." + n, text)
    return text

qchunks = chunks(lines[q_start + 1:q_end])
ochunks = chunks(lines[o_start + 1:o_end])
qkeys = {key_of(c) for c in qchunks}
okeys = {key_of(c) for c in ochunks}
assert okeys <= qkeys, okeys - qkeys
print(f"{len(qchunks)} query entries, {len(ochunks)} oracle entries")

fams = ["Parity", "Relational", "Events", "Text", "Corpus", "Similarity", "Streaming"]
byfam_q = {f: [] for f in fams}
byfam_o = {f: [] for f in fams}
for c in qchunks:
    byfam_q[family(key_of(c))].append(c)
for c in ochunks:
    byfam_o[family(key_of(c))].append(c)

IMPORTS = """import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{Advanced, Analytics, EventAnalytics, Extra, Flagship, Parity}
import graft.ext.{Bpe, Corpus, Dedup, IvfPq, KMeans, Multimodal, Pq, SemDedup, Similarity, TextAnalysis}
import graft.streaming.EventsStream"""

DESC = {
    "Parity": "reference-ETL parity, file-format round-trips, upsert/CDC sinks",
    "Relational": "joins, aggregations, windows, sorts, set ops, scalar functions, graph kernels",
    "Events": "event-stream analytics: sessions, funnels, attribution, experiment readouts",
    "Text": "text analysis and the dedup families: exact/MinHash/SimHash/set-similarity/span dedup",
    "Corpus": "corpus curation: retrieval, mixtures/selection, tokenizers, quality/eval, release",
    "Similarity": "embeddings: ANN/k-means/similarity search and multimodal codecs",
    "Streaming": "Structured Streaming pipelines (file streams, watermarks, foreachBatch)",
}

os.makedirs(OUT, exist_ok=True)

for f in fams:
    qs = byfam_q[f]
    os_ = byfam_o[f]
    body = []
    body.append("package graft")
    body.append("")
    body.append(IMPORTS)
    body.append("")
    body.append(f"/** {f} slice of the driver registry ({DESC[f]}) —")
    body.append("  * composed into [[SparkEntry.queries]]/[[SparkEntry.oracleSql]]. The")
    body.append("  * per-family split keeps each registry file reviewable; the driver")
    body.append("  * contract (one flat map) is unchanged. */")
    body.append(f"object {f}Registry {{")
    body.append("")
    body.append("  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(")
    for c in qs:
        body.extend(requalify("\n".join(c)).split("\n"))
    body.append("  )")
    body.append("")
    body.append("  val oracleSql: Map[String, String] = Map(")
    for c in os_:
        body.extend(requalify("\n".join(c)).split("\n"))
    body.append("  )")
    body.append("}")
    path = os.path.join(OUT, f"{f}Registry.scala")
    open(path, "w").write("\n".join(body) + "\n")
    print(f"{path}: {len(body)} lines ({len(qs)} queries, {len(os_)} oracles)")

# SharedOracleSql: the cross-family oracle strings, de-privatized.
sh = ["package graft", ""]
sh.append("/** Oracle SQL shared across registry families (one semantics, one")
sh.append("  * oracle): q18/q84 range join, q24/q82 sessions, q34/q143 MinHash")
sh.append("  * window scan, q166/q176 k-means. */")
sh.append("object SharedOracleSql {")
# drop the stray "For each key in queries" doc block (it documented
# oracleSql itself and is restated in the rewritten SparkEntry).
kept, skip = [], False
for l in shared:
    if l.strip().startswith("/** For each key in queries"):
        skip = True
    if not skip:
        kept.append(l)
    if skip and l.rstrip().endswith("*/"):
        skip = False
shared_txt = "\n".join(kept).replace("private val ", "val ")
sh.append(shared_txt)
sh.append("}")
open(os.path.join(OUT, "SharedOracleSql.scala"), "w").write("\n".join(sh) + "\n")
print(f"{OUT}/SharedOracleSql.scala written")

# Rewritten SparkEntry: header + entry + composition.
entry = lines[:q_start]  # header through the scaladoc above queries
new = entry + [
    "  def queries: Map[String, (SparkSession, String) => DataFrame] =",
    "    ParityRegistry.queries ++ RelationalRegistry.queries ++",
    "      EventsRegistry.queries ++ TextRegistry.queries ++",
    "      CorpusRegistry.queries ++ SimilarityRegistry.queries ++",
    "      StreamingRegistry.queries",
    "",
    "  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on",
    "    * the same parquet tables. Omitted for non-SQL-expressible ops. */",
    "  def oracleSql: Map[String, String] =",
    "    ParityRegistry.oracleSql ++ RelationalRegistry.oracleSql ++",
    "      EventsRegistry.oracleSql ++ TextRegistry.oracleSql ++",
    "      CorpusRegistry.oracleSql ++ SimilarityRegistry.oracleSql ++",
    "      StreamingRegistry.oracleSql",
    "}",
]
open(SRC, "w").write("\n".join(new) + "\n")
print(f"{SRC} rewritten: {len(new)} lines")
