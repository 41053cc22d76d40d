package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-behavior analytics over the `events` stream table: the ordered
  * multi-stage funnel and the cohort-retention matrix — the two product-
  * analytics shapes every event warehouse serves daily, and the two the
  * suite lacked (q36/q47 sessionize, q66 gap-fills, q15/q58 rank within
  * a window; neither expresses "B strictly after A per user" or "activity
  * relative to first-seen").
  *
  * Reference frame: both are map/emit → shuffle-by-user → whole-group
  * reduce pipelines (MapReduceFramework.cpp:118-248); the funnel's
  * sequential stage dependency is what the reference would express as
  * three chained jobs (SURVEY §2b multi-round chaining, q01's shape).
  */
object Behavior {

  private def ev(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d).select(col("user_id"), col("event_type"), col("ts"))

  /** q139 — ORDERED FUNNEL: per user, the first 'view', the first 'click'
    * STRICTLY AFTER that view, and the first 'purchase' strictly after
    * that click — conversion attribution with the ordering constraint
    * that distinguishes a funnel from three independent mins (a click
    * that precedes every view must NOT count, even though min(click_ts)
    * exists). `stage` is how far the user got (1–3).
    *
    * Scale design: each stage is filter-on-type (pushed to the parquet
    * scan) → join against the previous stage's per-user row → per-user
    * min aggregation — every shuffle is keyed by user_id, map-side
    * combined, and the stage relations SHRINK monotonically (stage k+1
    * joins stage k's survivors only). No window function anywhere: a
    * window over (user ORDER BY ts) would sort every user's full event
    * history; the min-after-join form reduces each stage to one partial
    * aggregate. At 100 TB the three user-keyed exchanges hash-align, so
    * AQE plans the stage-k+1 join shuffle-free on the stage-k side.
    */
  /** The funnel composition over any (user_id, event_type, ts) relation —
    * factored out so the spec can drive it with a fixture where users
    * STOP at each stage (the synthetic corpus is dense enough that every
    * user converts at every SF, so the registered query alone never
    * exercises the partial-funnel paths).
    */
  def funnelOf(events: DataFrame): DataFrame = {
    def firstAfter(stage: String, prev: DataFrame, prevTs: String, outTs: String) =
      events.where(col("event_type") === stage)
        .join(prev.select("user_id", prevTs), "user_id")
        .where(col("ts") > col(prevTs))
        .groupBy("user_id").agg(min(col("ts")).as(outTs))
    val views = events.where(col("event_type") === "view")
      .groupBy("user_id").agg(min(col("ts")).as("view_ts"))
    val clicks = firstAfter("click", views, "view_ts", "click_ts")
    val buys = firstAfter("purchase", clicks, "click_ts", "purchase_ts")
    views.join(clicks, Seq("user_id"), "left")
      .join(buys, Seq("user_id"), "left")
      .select(col("user_id"), col("view_ts"), col("click_ts"), col("purchase_ts"),
        (lit(1)
          + when(col("click_ts").isNotNull, 1).otherwise(0)
          + when(col("purchase_ts").isNotNull, 1).otherwise(0)).cast("long").as("stage"))
  }

  val funnel = Q(
    "q139_funnel",
    (s, d) => funnelOf(ev(s, d)),
    Some("""WITH v AS (SELECT user_id, min(ts) AS view_ts
                       FROM events WHERE event_type = 'view' GROUP BY 1),
            c AS (SELECT e.user_id, min(e.ts) AS click_ts
                  FROM events e JOIN v ON v.user_id = e.user_id
                  WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
            p AS (SELECT e.user_id, min(e.ts) AS purchase_ts
                  FROM events e JOIN c ON c.user_id = e.user_id
                  WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
            SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
                   CAST(1 + CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END
                          + CASE WHEN p.user_id IS NULL THEN 0 ELSE 1 END
                        AS BIGINT) AS stage
            FROM v LEFT JOIN c ON c.user_id = v.user_id
                   LEFT JOIN p ON p.user_id = v.user_id""")
  )

  /** q140 — COHORT RETENTION: users grouped by first-seen day (their
    * cohort), counted per day-offset of later activity — the retention
    * triangle a growth dashboard renders. Two aggregations, zero
    * windows: per-user first day (map-side-combined min), distinct
    * (user, day) activity, then a count-distinct keyed by the BOUNDED
    * (cohort_day, offset) pair.
    *
    * Scale design: the distinct-activity pass and the first-day pass both
    * shuffle by user_id (hash-aligned, exchange-reusable); the final
    * aggregation's key space is days × days — thousands of groups at any
    * corpus size, so the last shuffle is trivially small. countDistinct
    * expands to a two-level aggregate (partial distinct per partition
    * before the merge), so no user list ever concentrates on one task.
    */
  val cohortRetention = Q(
    "q140_cohort_retention",
    (s, d) => {
      val events = ev(s, d)
      val firstDay = events.groupBy("user_id")
        .agg(to_date(min(col("ts"))).as("cohort_day"))
      val activity = events
        .select(col("user_id"), to_date(col("ts")).as("day")).distinct()
      activity.join(firstDay, "user_id")
        .groupBy(col("cohort_day"),
          datediff(col("day"), col("cohort_day")).cast("long").as("day_offset"))
        .agg(countDistinct(col("user_id")).as("active_users"))
    },
    Some("""WITH f AS (SELECT user_id, CAST(min(ts) AS DATE) AS cohort_day
                       FROM events GROUP BY 1),
            a AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
            SELECT f.cohort_day,
                   date_diff('day', f.cohort_day, a.day) AS day_offset,
                   CAST(count(DISTINCT a.user_id) AS BIGINT) AS active_users
            FROM a JOIN f ON f.user_id = a.user_id
            GROUP BY 1, 2""")
  )

  val all: Seq[Q] = Seq(funnel, cohortRetention)
}
