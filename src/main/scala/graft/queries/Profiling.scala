package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** Data profiling — the `ANALYZE TABLE`-shaped operator every ingest
  * pipeline runs before touching a new drop: per-column null counts,
  * exact distinct cardinality, and min/max, emitted as one narrow
  * (column, stats) relation.
  */
object Profiling {

  private val Cols = Seq("doc_id", "lang", "source", "n_chars", "text")

  /** q101 — ONE-PASS column profile of `documents`: every per-column
    * statistic is an aggregate column of a SINGLE aggregation over a
    * single scan (Catalyst plans the multiple exact count-distincts via
    * one Expand), and the 1-row result pivots to long form with `stack`
    * — row-count work never repeats per column, where the naive
    * per-column loop would scan the table five times. At 100 TB the
    * exact distincts swap for `approx_count_distinct` (q19's HLL++
    * sketch) and the Expand disappears — that variant is REGISTERED as
    * q105 below; min/max/null counts are already
    * plain single-pass aggregates. Min/max surface as strings so one
    * schema covers every column type; numeric casts are engine-portable
    * (integer-to-string only).
    */
  val profile = Q(
    "q101_profile",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val aggs = Cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
          countDistinct(col(c)).as(s"dist_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"))
      } :+ count(lit(1)).as("n_rows")
      val one = docs.agg(aggs.head, aggs.tail: _*)
      one.select(
        expr(s"""stack(${Cols.size},
                 ${Cols.map(c => s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ")})
                 AS (col_name, n_null, n_distinct, min_str, max_str)"""),
        col("n_rows"))
    },
    Some {
      val selects = Cols.map { c =>
        s"""SELECT '$c' AS col_name,
                   CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                   count(DISTINCT $c) AS n_distinct,
                   CAST(min($c) AS VARCHAR) AS min_str,
                   CAST(max($c) AS VARCHAR) AS max_str,
                   count(*) AS n_rows
            FROM documents"""
      }
      selects.mkString("\n UNION ALL \n")
    }
  )

  /** q105 — the 100 TB variant q101's scaladoc promises: the SAME
    * one-pass long-form profile with the exact count-distincts swapped
    * for `approx_count_distinct` (HLL++, the q19 sketch). The Expand
    * that exact multi-column DISTINCT needs disappears — every statistic
    * is now a plain streaming aggregate, so the profile is one true scan
    * with no row multiplication at any corpus size. Approximate by
    * definition ⇒ rows-only at the driver (like q19/q49); the error is
    * spec-bounded instead: `ProfilingHllSpec` checks every column's HLL
    * estimate against q101's exact distinct within the sketch's
    * documented accuracy (default rsd 5%, asserted at ≤ 15% for slack),
    * and that the non-approximate columns (nulls/min/max/row count)
    * remain EXACTLY equal to q101's.
    */
  val profileHll = Q(
    "q105_profile_hll",
    (s, d) => {
      val docs = Tables.documents(s, d)
      val aggs = Cols.flatMap { c =>
        Seq(
          sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"null_$c"),
          approx_count_distinct(col(c)).as(s"dist_$c"),
          min(col(c)).cast("string").as(s"min_$c"),
          max(col(c)).cast("string").as(s"max_$c"))
      } :+ count(lit(1)).as("n_rows")
      val one = docs.agg(aggs.head, aggs.tail: _*)
      one.select(
        expr(s"""stack(${Cols.size},
                 ${Cols.map(c => s"'$c', null_$c, dist_$c, min_$c, max_$c").mkString(", ")})
                 AS (col_name, n_null, n_distinct_approx, min_str, max_str)"""),
        col("n_rows"))
    },
    None // HLL estimates are engine-specific; bounds in ProfilingHllSpec
  )

  /** q129 — MATERIALIZED-AGGREGATE MAINTENANCE: refresh per-source
    * corpus statistics from a stored base aggregate plus a delta batch,
    * WITHOUT rescanning the base corpus — the daily-stats-refresh shape
    * of a living 100 TB dataset (q101 profiles a drop from scratch; q129
    * keeps the profile current as drops arrive). The base partition
    * (doc_id % 10 ≠ 0, "yesterday's corpus") is aggregated ONCE and
    * written to scratch parquet (the materialized view — q76/q99's
    * train-once discipline); the refresh reads that artifact, aggregates
    * only the DELTA (doc_id % 10 = 0), and MERGES by summing partials —
    * sound because count/sum are algebraic (partials compose), which is
    * the same property map-side combine rests on. The oracle recomputes
    * from the full table: equality proves the merge is exact, not
    * approximately right.
    *
    * Scale shape: the refresh touches |delta| rows + a source-cardinality
    * artifact; nothing else. Token counts are integers (the q127
    * counter); null sources coalesce (q94's rule) so the merge join
    * never drops a group.
    */
  val statsMaintenance = Q(
    "q129_stats_maintenance",
    (s, d) => {
      def partials(df: org.apache.spark.sql.DataFrame) = df
        .select(coalesce(col("source"), lit("unknown")).as("source"),
          size(filter(split(col("text"), " "), t => t =!= ""))
            .cast("long").as("n_tokens"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("total_tokens"))
      val docs = Tables.documents(s, d)
      val out = _root_.graft.sources.Sources.scratchLeaf(d, "stats_base")
      partials(docs.where(col("doc_id") % 10 =!= 0))
        .write.mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(out)
      val base = s.read.parquet(out)
      base.unionAll(partials(docs.where(col("doc_id") % 10 === 0)))
        .groupBy("source")
        .agg(sum("n_docs").as("n_docs"), sum("total_tokens").as("total_tokens"))
    },
    Some("""SELECT coalesce(source, 'unknown') AS source,
                   count(*) AS n_docs,
                   CAST(sum(len(list_filter(string_split(text, ' '), w -> w <> '')))
                        AS BIGINT) AS total_tokens
            FROM documents GROUP BY coalesce(source, 'unknown')""")
  )

  val all: Seq[Q] = Seq(profile, profileHll, statsMaintenance)
}
