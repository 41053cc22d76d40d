package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One cell of a quantile-sketch histogram: a log-scale bucket index and
  * how many values fell in it.
  */
final case class BucketCount(bucket: Int, cnt: Long)

/** Deterministic MERGEABLE quantile sketch: an HdrHistogram-style
  * log-bucketed histogram over positive doubles (q181).
  *
  * Bucketing exploits IEEE-754 ordering: for positive doubles,
  * `doubleToLongBits` is monotone, so the top `11 + SubBucketBits` bits
  * (exponent + the leading mantissa bits) are a monotone, fixed bucket
  * index — no data-dependent boundaries, no training pass. Each binade
  * splits into 2^SubBucketBits sub-buckets, so a bucket's width relative
  * to its lower edge is exactly 2^-SubBucketBits — and therefore any
  * served quantile (the bucket's geometric representative) lies within
  * that RELATIVE band of the true order statistic, because the cumulative
  * bucket counts locate the bucket CONTAINING the exact rank-r element
  * (counts are exact; only within-bucket position is approximated).
  *
  * Why this shape for the store: the sketch is a sparse (bucket → count)
  * vector, so MERGE IS CELL-WISE LONG ADDITION — exactly associative and
  * commutative. Two-level merges (shard sketches → day sketch → range
  * answer) equal the flat merge bit-for-bit, which is the property that
  * makes a 100 TB store of per-shard summaries trustworthy: no merge
  * tree shape can change an answer. Size is bounded by occupied buckets
  * (≤ 2^SubBucketBits per binade of the data's dynamic range — ~KB),
  * independent of row count. Contrast q49's `approx_percentile`: its
  * KLL-style summary has rank-error guarantees but is rebuilt per query;
  * this is the STORED artifact the percentile dashboard reads forever.
  *
  * Values ≤ 0 (or NaN) collapse to bucket 0 with representative 0.0 —
  * a defined total behavior the positive-domain contract documents
  * (event values here are positive; a production deployment would store
  * a parallel negative-side histogram, same machinery mirrored).
  */
object QuantileSketch {
  /** Sub-bucket precision: each binade splits into 2^7 = 128 buckets, so
    * every served quantile is within 1/128 (≈0.8%) of the exact order
    * statistic, relatively. `SketchSpec` asserts the band on every
    * prefix range.
    */
  val SubBucketBits = 7
  val RelErrBound: Double = 1.0 / (1 << SubBucketBits)

  private val Shift = 52 - SubBucketBits

  def bucketOf(v: Double): Int =
    if (!(v > 0.0)) 0 // negatives, zero, NaN: the defined degenerate cell
    else (java.lang.Double.doubleToLongBits(v) >>> Shift).toInt

  /** The bucket's representative: its lower edge plus half a sub-bucket
    * of mantissa — the geometric midpoint, reconstructed bit-exactly.
    */
  def bucketMid(b: Int): Double =
    if (b == 0) 0.0
    else java.lang.Double.longBitsToDouble(
      (b.toLong << Shift) | (1L << (Shift - 1)))

  /** Serve quantile `q` from a merged histogram: walk buckets in index
    * (= value) order to the 1-based target rank ⌈q·n⌉ and return that
    * bucket's representative. Driver-side over bounded metadata — the
    * histogram never exceeds the occupied-bucket count regardless of N.
    */
  def quantile(hist: Seq[BucketCount], q: Double): Double = {
    require(hist.nonEmpty, "quantile of an empty histogram")
    val sorted = hist.sortBy(_.bucket)
    val n = sorted.iterator.map(_.cnt).sum
    val target = math.max(1L, math.ceil(q * n).toLong)
    var cum = 0L
    sorted.foreach { bc =>
      cum += bc.cnt
      if (cum >= target) return bucketMid(bc.bucket)
    }
    bucketMid(sorted.last.bucket)
  }
}

/** Typed mergeable UDAF building one sketch per group (per day in the
  * q181 store). Buffer is a sparse immutable map; partial aggregation
  * ships at most the occupied-bucket count per map task — the shuffle
  * carries KB-size summaries, never values (the TopKAggregator
  * discipline). Output is the sorted (bucket, cnt) array the store
  * persists as a parquet `array<struct>` column.
  */
class QuantileSketchAggregator(implicit
    bufEnc: Encoder[Map[Int, Long]], outEnc: Encoder[Seq[BucketCount]])
    extends Aggregator[Double, Map[Int, Long], Seq[BucketCount]] {

  override def zero: Map[Int, Long] = Map.empty

  override def reduce(m: Map[Int, Long], v: Double): Map[Int, Long] = {
    val b = QuantileSketch.bucketOf(v)
    m.updated(b, m.getOrElse(b, 0L) + 1L)
  }

  override def merge(a: Map[Int, Long], b: Map[Int, Long]): Map[Int, Long] =
    b.foldLeft(a) { case (m, (k, v)) => m.updated(k, m.getOrElse(k, 0L) + v) }

  override def finish(m: Map[Int, Long]): Seq[BucketCount] =
    m.toSeq.sortBy(_._1).map { case (k, v) => BucketCount(k, v) }

  override def bufferEncoder: Encoder[Map[Int, Long]] = bufEnc
  override def outputEncoder: Encoder[Seq[BucketCount]] = outEnc
}
