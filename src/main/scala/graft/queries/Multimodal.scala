package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** One ingested media record: an opaque binary payload plus typed
  * metadata. In a real pipeline `payload` holds image/audio/video bytes;
  * here it is the document's UTF-8 bytes, standing in for media content
  * the container has no codecs for.
  */
final case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])

/** Features extracted from one media record by the (stubbed) decoder. */
final case class MediaFeatures(
    doc_id: Long,
    format: String,
    n_bytes: Long,
    sum_bytes: Long,
    mean_byte: Double,
    head_b64: String,
    n_frames: Long,
    n_sampled: Long,
    resize_n: Long,
    resize_fp: String)

/** Multimodal-column suite: image/audio/video as opaque `binary` columns
  * with typed metadata, processed by a typed `mapPartitions` pipeline.
  *
  * The decode step is a STUB (no media codecs in this container): it
  * deterministically derives features from the raw bytes — byte count and
  * sum, base64 of the head, and a fake frame-sampler (16-byte "frames",
  * every 4th sampled). The Spark-side plumbing is real: binary-typed
  * Dataset, case-class Encoders, partition-local batch processing — the
  * exact shape a JNI/FFmpeg decoder would plug into, one partition per
  * decoder instance.
  *
  * Scale design (100 TB): `mapPartitions` keeps decoder init per-partition
  * (not per-row); payloads never shuffle — features are extracted before
  * any wide operation; the output is a narrow projection of the scan.
  */
object Multimodal {

  val mediaFeatures = Q(
    "q33_multimodal_features",
    (s, d) => {
      import s.implicits._
      Tables.documents(s, d)
        // contract guards, enforced identically in the oracle: empty
        // payloads would divide by zero (mean) and vanish from the
        // generate_series join; non-ASCII text would make the byte-based
        // Spark resize disagree with the character-based SQL mirror
        .where(length(col("text")) > 0 && !col("text").rlike("[^\\x00-\\x7F]"))
        .select(col("doc_id"), col("source").as("format"), col("text").cast("binary").as("payload"))
        .as[MediaRecord]
        .mapPartitions { it =>
          // decoder init would go here, once per partition
          val md = java.security.MessageDigest.getInstance("MD5")
          it.map { r =>
            val n = r.payload.length.toLong
            var sum = 0L
            var i = 0
            while (i < r.payload.length) { sum += (r.payload(i) & 0xff); i += 1 }
            val frames = (n + 15) / 16
            // "resize": stride-subsample the payload down to ~32 bytes —
            // the stub for a thumbnail/downsample step; fingerprint it
            val stride = math.max(1L, n / 32).toInt
            val resized = Iterator.range(0, r.payload.length, stride)
              .map(r.payload(_)).toArray
            md.reset()
            val fp = md.digest(resized).map("%02x".format(_)).mkString
            MediaFeatures(
              r.doc_id, r.format, n, sum,
              sum.toDouble / n.toDouble,
              java.util.Base64.getEncoder.encodeToString(r.payload.take(8)),
              frames, (frames + 3) / 4,
              resized.length.toLong, fp)
          }
        }
        .toDF()
    },
    Some("""WITH resized AS (
              SELECT doc_id,
                     string_agg(substr(text, i, 1), '' ORDER BY i) AS rs
              FROM (
                SELECT doc_id, text,
                       unnest(generate_series(1, length(text),
                              greatest(1, length(text) // 32))) AS i
                FROM documents) t
              GROUP BY doc_id)
            SELECT d.doc_id, d.source AS format,
            CAST(length(d.text) AS BIGINT) AS n_bytes,
            CAST(list_aggregate(list_transform(string_split(d.text, ''), c -> ord(c)), 'sum') AS BIGINT)
              AS sum_bytes,
            CAST(list_aggregate(list_transform(string_split(d.text, ''), c -> ord(c)), 'sum') AS DOUBLE)
              / length(d.text) AS mean_byte,
            to_base64(substr(d.text, 1, 8)::BLOB) AS head_b64,
            CAST(ceil(length(d.text) / 16.0) AS BIGINT) AS n_frames,
            CAST(ceil(ceil(length(d.text) / 16.0) / 4.0) AS BIGINT) AS n_sampled,
            CAST(length(r.rs) AS BIGINT) AS resize_n,
            md5(r.rs) AS resize_fp
            FROM documents d JOIN resized r ON r.doc_id = d.doc_id
            WHERE length(d.text) > 0 AND NOT d.text ~ '[^\x00-\x7F]'""")
  )

  val all: Seq[Q] = Seq(mediaFeatures)
}
