#!/usr/bin/env python3
"""One-shot refactoring tool: split SparkEntry.scala's two giant Map
literals into domain trait files mixed back into SparkEntry.

Entry = optional contiguous comment block + `    "name" -> ...` up to the
next entry start (or the map's closing `  )`). Bodies are moved verbatim;
shared helpers stay in SparkEntry widened to private[graft].
"""
import re, sys, collections

SRC = "/root/repo/src/main/scala/graft/SparkEntry.scala"
OUT = "/root/repo/src/main/scala/graft/queries"

FAMILIES = [  # (trait name, regex over query name) — first match wins
    ("QueriesStream",      r"^stream_"),
    ("QueriesDedup",       r"^(dedup_|bloom_)"),
    ("QueriesSim",         r"^(sim_|emb_|rank_)"),
    ("QueriesText",        r"^(text_|bpe_|url_)"),
    ("QueriesGraphEvents", r"^(graph_|hier_|ts_|attr_|funnel_|cohort_|ab_|mine_|w\d)"),
    ("QueriesPipeline",    r"^(dq_|sample_|split_|shard_|pack_|incr_|upsert_|sketch_|mm_)"),
    ("QueriesRelational",  r"."),
]

def family(name):
    for fam, rx in FAMILIES:
        if re.search(rx, name):
            return fam
    raise AssertionError(name)

lines = open(SRC).read().split("\n")

def find_map(defline_rx):
    start = next(i for i, l in enumerate(lines) if re.match(defline_rx, l))
    # body runs from start+1 to the closing "  )" at indent 2
    end = next(i for i in range(start + 1, len(lines)) if lines[i] == "  )")
    return start, end

q_start, q_end = find_map(r"^  def queries: Map")
o_start, o_end = find_map(r"^  def oracleSql: Map")

ENTRY_RX = re.compile(r'^    "([a-z0-9_]+)" ->')

def split_entries(body_lines):
    """-> list of (name, [lines]) with leading comments attached."""
    entries, cur, cur_name, pending = [], [], None, []
    for l in body_lines:
        m = ENTRY_RX.match(l)
        if m:
            if cur_name is not None:
                entries.append((cur_name, cur))
            cur_name, cur = m.group(1), pending + [l]
            pending = []
        elif cur_name is None or (l.strip().startswith("//") or l.strip() == "") and _tail_blank_or_comment(cur):
            # comment/blank run: could belong to the NEXT entry
            pending.append(l)
        else:
            cur.extend(pending); pending = []
            cur.append(l)
    if cur_name is not None:
        cur.extend(pending)
        entries.append((cur_name, cur))
    return entries

def _tail_blank_or_comment(cur):
    # once we're past the closing of the previous entry's value, trailing
    # comment/blank lines belong to the next entry. Heuristic: previous
    # line ends the entry if it ends with "),", "},", '",', or similar.
    if not cur:
        return True
    last = next((x for x in reversed(cur) if x.strip()), "")
    return last.rstrip().endswith((")," , "},", '",', '".stripMargin,', ".stripMargin,"))

q_entries = split_entries(lines[q_start + 1:q_end])
o_entries = split_entries(lines[o_start + 1:o_end])

qn = {n for n, _ in q_entries}
on = {n for n, _ in o_entries}
print(f"query entries: {len(q_entries)}  oracle entries: {len(o_entries)}")
print("oracle-only:", sorted(on - qn))
print("query-only (rows-only checks):", sorted(qn - on))

groups = collections.defaultdict(lambda: ([], []))
for n, body in q_entries:
    groups[family(n)][0].append((n, body))
for n, body in o_entries:
    groups[family(n)][1].append((n, body))

header = """package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.core.Graft
import graft.functions.{Cleaning, Norm, StableHash, Text, Urls, Vectors}
import graft.metrics.StaffingMetrics
import graft.ops.{Dedup, Multimodal, Regression, Similarity, Sketches, TextAnalysis}
import graft.quality.DataQuality
"""

if "--dry" in sys.argv:
    for fam in groups:
        ql = sum(len(b) for _, b in groups[fam][0])
        ol = sum(len(b) for _, b in groups[fam][1])
        print(f"{fam:22s} queries={len(groups[fam][0]):4d} ({ql:5d} ln) "
              f"oracles={len(groups[fam][1]):4d} ({ol:5d} ln) total={ql+ol}")
    sys.exit(0)

import os
os.makedirs(OUT, exist_ok=True)
mixins = []
for fam, _ in FAMILIES:
    qs, os_ = groups[fam]
    if not qs and not os_:
        continue
    mixins.append(fam)
    low = fam[7:8].lower() + fam[8:]  # Dedup -> dedup
    with open(f"{OUT}/{fam}.scala", "w") as f:
        f.write(header)
        f.write(f"\n/** {fam[7:]} slice of the SparkEntry corpus "
                "(see SparkEntry's scaladoc for the cross-engine\n"
                "  * determinism rules every entry follows). Bodies moved "
                "verbatim from the\n  * round-6 SparkEntry map literals; "
                "shared helpers live on SparkEntry\n  * (private[graft])."
                "\n  */\n")
        f.write(f"private[graft] trait {fam} {{ this: SparkEntry.type =>\n\n")
        f.write(f"  protected def {low}Queries: Map[String, (SparkSession, String) => DataFrame] = Map(\n")
        f.write("\n".join("\n".join(b).rstrip().rstrip(",") + ","
                          for _, b in qs).rstrip(","))
        f.write("\n  )\n\n")
        f.write(f"  protected def {low}Oracles: Map[String, String] = Map(\n")
        f.write("\n".join("\n".join(b).rstrip().rstrip(",") + ","
                          for _, b in os_).rstrip(","))
        f.write("\n  )\n}\n")

# rewrite SparkEntry: drop the two map bodies, mix in traits, widen private
new = []
i = 0
while i < len(lines):
    if i == q_start:
        new.append("  def queries: Map[String, (SparkSession, String) => DataFrame] =")
        new.append("    " + " ++ ".join(m[7:8].lower() + m[8:] + "Queries" for m in mixins))
        i = q_end + 1
        continue
    if i == o_start:
        new.append("  def oracleSql: Map[String, String] =")
        new.append("    " + " ++ ".join(m[7:8].lower() + m[8:] + "Oracles" for m in mixins))
        i = o_end + 1
        continue
    l = lines[i]
    if l.startswith("object SparkEntry {"):
        l = ("object SparkEntry\n  extends "
             + "\n  with ".join(mixins) + " {")
    l = re.sub(r"^(\s*)private (def|val|lazy val)", r"\1private[graft] \2", l)
    new.append(l)
    i += 1

open(SRC, "w").write("\n".join(new))
print("wrote", len(mixins), "trait files; SparkEntry now",
      len(new), "lines")
