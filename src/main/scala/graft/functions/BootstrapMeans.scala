package graft.functions

import java.math.{BigDecimal => JBigDecimal, RoundingMode}

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** One input row for the bootstrap aggregator: the deterministic draw
  * key and the measured value.
  */
final case class IdValue(id: Long, value: Double)

/** The B-replicate accumulator: per replicate b, the exact decimal sum
  * of `value * w_b` in CENTS and the weight total — 2·B longs per
  * group, mergeable by element-wise addition.
  */
final case class BootstrapBuf(cents: Array[Long], ws: Array[Long])

/** Single-pass Poisson-bootstrap replicate means (q152).
  *
  * The naive distributed bootstrap explodes each row ×B so a plain
  * groupBy(type, b) can aggregate — B× the aggregation-input rows, the
  * round-10 driver-bench tail (13.6 s under ambient multipliers). This
  * aggregator deletes the blowup: each row is touched ONCE and fans out
  * internally to B = 32 accumulator slots (the
  * [[QuantileSketchAggregator]] array-buffer precedent), so the corpus
  * scan, the hash-aggregate input, and the shuffle all stay 1×; the
  * shuffle carries one 2·B-long buffer per (group × task).
  *
  * Bit-parity contract with the unchanged DuckDB oracle (and the
  * previous explode formulation):
  *  - w_b = [[PoissonDraw.weight]](b, id) — the 60-bit-md5 Poisson(1)
  *    pmf thresholds, identical to the oracle's portable SQL chain;
  *    drawn two-per-digest via [[PoissonDraw.weightPair]] (replicates
  *    2p and 2p+1 read the two halves of md5("p|id")), so the per-row
  *    digest count is B/2, not B;
  *  - each term replays `CAST(value * w AS DECIMAL(18,2))` exactly:
  *    the product in DOUBLE first, then half-up decimal quantization
  *    (`JBigDecimal.valueOf` is Double.toString-based, the same path
  *    Spark's double→decimal cast takes), accumulated as exact cents;
  *  - the replicate mean is `CAST(sum AS DOUBLE) / CAST(sum_w AS
  *    DOUBLE)`: cents < 2^53 so `cents.toDouble / 100.0` is the
  *    correctly-rounded decimal→double conversion, then ONE division;
  *  - `finish` sorts the B means ascending — the `sort_array` the rank
  *    -selected CI bounds index into.
  */
class BootstrapMeansAggregator(b: Int)(implicit
    bufEnc: Encoder[BootstrapBuf], outEnc: Encoder[Seq[Double]])
    extends Aggregator[IdValue, BootstrapBuf, Seq[Double]] {

  override def zero: BootstrapBuf =
    BootstrapBuf(new Array[Long](b), new Array[Long](b))

  override def reduce(buf: BootstrapBuf, in: IdValue): BootstrapBuf = {
    // one md5 per replicate PAIR (PoissonDraw.weightPair): 2 draws per
    // digest → B/2 digests per row, half the round-10 kernel's cost
    @inline def add(i: Int, w: Long): Unit = if (w > 0L) {
      val cents = JBigDecimal.valueOf(in.value * w)
        .setScale(2, RoundingMode.HALF_UP)
        .unscaledValue().longValueExact()
      buf.cents(i) += cents
      buf.ws(i) += w
    }
    var p = 0
    while (p < b / 2) {
      val packed = PoissonDraw.weightPair(p.toLong, in.id)
      add(2 * p, packed >>> 3)
      add(2 * p + 1, packed & 7L)
      p += 1
    }
    // odd B: the unpaired last replicate draws solo (B = 32 here, but
    // the aggregator's contract doesn't require even B)
    if ((b & 1) == 1) add(b - 1, PoissonDraw.weight((b - 1).toLong, in.id))
    buf
  }

  override def merge(a: BootstrapBuf, c: BootstrapBuf): BootstrapBuf = {
    var i = 0
    while (i < b) {
      a.cents(i) += c.cents(i)
      a.ws(i) += c.ws(i)
      i += 1
    }
    a
  }

  override def finish(buf: BootstrapBuf): Seq[Double] = {
    val ms = Array.tabulate(b) { i =>
      // a replicate that drew weight 0 on EVERY row of a tiny group is
      // an empty resample: 0/0 would be NaN here but NULL in the SQL
      // oracle — pin the degenerate cell to 0.0 on BOTH engines (the
      // suite's NaN-never-reaches-an-output rule)
      if (buf.ws(i) == 0L) 0.0
      else (buf.cents(i).toDouble / 100.0) / buf.ws(i).toDouble
    }
    java.util.Arrays.sort(ms)
    ms.toSeq
  }

  override def bufferEncoder: Encoder[BootstrapBuf] = bufEnc
  override def outputEncoder: Encoder[Seq[Double]] = outEnc
}
