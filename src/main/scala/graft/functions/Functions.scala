package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Scalar/cleaning functions re-expressing the reference's element-wise
  * Python helpers as Catalyst built-in compositions (all codegen'd; zero
  * UDFs). Each cites the reference behavior it reproduces.
  */
object Norm {

  /** Identifier normalization — plan-time (applied to column NAMES).
    * Reference: build.py:7-8 `re.sub(r'[^0-9a-zA-Z]+', '_', s.lower()).strip('_')`
    * e.g. "CMS Certification Number (CCN)" -> "cms_certification_number_ccn".
    */
  def normIdentifier(s: String): String =
    "[^0-9a-zA-Z]+".r.replaceAllIn(s.toLowerCase, "_")
      .replaceAll("_+", "_").stripPrefix("_").stripSuffix("_")

  /** Same normalization as a data-level Column (for catalog-style queries). */
  def normIdentifierCol(c: Column): Column = {
    val u = regexp_replace(lower(c), "[^0-9a-z]+", "_")
    regexp_replace(regexp_replace(regexp_replace(u, "_+", "_"), "^_", ""), "_$", "")
  }

  /** Filename -> table name. Reference: load_nursing_home_data.py:9-17.
    * The reference uses `rstrip(".csv")` (a char-set strip bug); we strip the
    * extension by intent, as SURVEY.md X2 documents.
    */
  def tableNameFromFile(fileName: String): String = {
    val stem = fileName.replaceAll("\\.[cC][sS][vV]$", "")
    normIdentifier(stem)
  }

  /** Quarter normalization. Reference: calculate_metrics.py:28-36 —
    * regex `(20\d{2}).*?(\d)` over the stringified value; no match or null
    * -> NULL; else "YYYY-Qn".
    */
  def normalizeQuarter(c: Column): Column = {
    val s = c.cast("string")
    val year = regexp_extract(s, "(20\\d{2}).*?(\\d)", 1)
    val q    = regexp_extract(s, "(20\\d{2}).*?(\\d)", 2)
    when(year === "" || q === "", lit(null).cast("string"))
      .otherwise(concat(year, lit("-Q"), q))
  }
}

object Cleaning {

  /** Null-safe horizontal sum. Reference: calculate_metrics.py:119-121 —
    * pandas `sum(axis=1)` skips NaN (null treated as 0; all-null row -> 0).
    */
  def horizontalSum(cols: Seq[Column]): Column =
    cols.map(c => coalesce(c, lit(0.0))).reduce(_ + _)

  /** Row-wise zero-sentinel nulling over a critical column set.
    * Reference: calculate_metrics.py:92-98 — when ANY critical column is 0,
    * ALL critical columns on that row become NULL (not per-column).
    */
  def zeroSentinelNull(df: DataFrame, criticalCols: Seq[String]): DataFrame = {
    // Single select so every predicate sees the ORIGINAL columns — a
    // withColumn fold would re-evaluate anyZero against already-nulled
    // columns and miss rows (the exact trap SURVEY.md §7.4.2 warns about).
    val anyZero = criticalCols.map(c => col(c) === 0).reduce(_ || _)
    val out = df.columns.map { c =>
      if (criticalCols.contains(c)) when(anyZero, lit(null)).otherwise(col(c)).as(c)
      else col(c)
    }
    df.select(out.toIndexedSeq: _*)
  }

  /** Per-column zero -> NULL (denominator guard).
    * Reference: calculate_metrics.py:132-140. */
  def zeroToNull(c: Column): Column = when(c === 0, lit(null)).otherwise(c)

  /** String -> double, failure -> NULL (requires ANSI off, which
    * [[graft.core.Graft.tune]] guarantees). Reference: build.py:31-32. */
  def coerceNumeric(c: Column): Column = c.cast("double")

  /** Flexible date parse, failure -> NULL. Reference: build.py:29-30; CMS
    * files use MM/dd/yyyy. */
  def coerceDate(c: Column, fmt: String = "MM/dd/yyyy"): Column =
    coalesce(to_date(c, fmt), to_date(c))

  /** To trimmed string. Reference: build.py:36-37. */
  def toTrimmedString(c: Column): Column = trim(c.cast("string"))
}

/** Deterministic 64-bit-ish hashing shared by dedup/fingerprint operators.
  * Built on md5 so the DuckDB oracle can reproduce it exactly
  * (`('0x'||substr(md5(x),1,15))::BIGINT`); engine-native hash functions
  * (xxhash64 etc.) differ across engines and would break oracle parity.
  * 15 hex digits = 60 bits, always a non-negative Long.
  */
object StableHash {
  /** Native codegen'd implementation (graft.plans.Hash60); value-identical
    * to `conv(substr(md5(c),1,15),16,10)` which the oracle replays.
    */
  def hash60(c: Column): Column = graft.plans.Hash60(c.cast("string"))

  /** Seeded variant: prefix the value with the seed before hashing. */
  def hash60(c: Column, seed: Int): Column =
    hash60(concat(lit(seed.toString), lit(":"), c))
}
