package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns next to typed metadata; decode /
  * feature-extraction runs per-partition so a real codec would be
  * initialized once per task, not once per row.
  *
  * ==STUB NOTICE==
  * This container ships no image/audio codecs, so `decodeFeatures`
  * computes a DETERMINISTIC FAKE decode (dimensions derived from the
  * payload bytes). The Spark-side contract — schema, partitioning,
  * per-partition batching, typed output — is real and tested; a
  * production deployment replaces only the marked block with e.g.
  * javax.imageio / ffmpeg calls.
  */
object Multimodal {

  case class MediaRow(id: Long, modality: String, blob: Array[Byte])

  case class MediaFeature(id: Long, modality: String, byte_len: Int,
                          width: Int, height: Int, duration_ms: Int,
                          content_hash: String)

  /** Attach a binary payload column built from a string column (the
    * ingest path when payloads arrive base64/utf-8 encoded in a lake
    * table). */
  def withBlob(df: DataFrame, srcCol: String, blobCol: String = "blob"): DataFrame =
    df.withColumn(blobCol, encode(col(srcCol), "UTF-8"))

  /** Per-partition decode → typed features. `parallelism` repartitions
    * first so decode saturates the cluster independent of upstream
    * layout (decode is CPU-bound, not data-locality-bound). */
  def decodeFeatures(ds: Dataset[MediaRow], parallelism: Int = 0): Dataset[MediaFeature] = {
    import ds.sparkSession.implicits._
    val in = if (parallelism > 0) ds.repartition(parallelism) else ds
    in.mapPartitions { rows =>
      // --- per-task init would go here (codec contexts, model handles) ---
      rows.map { r =>
        val len = r.blob.length
        // vvv STUB decode: deterministic fake dimensions from payload vvv
        val h = java.util.Arrays.hashCode(r.blob)
        val width = math.floorMod(h, 640) + 32
        val height = math.floorMod(h / 640, 480) + 32
        val durationMs = if (r.modality == "video" || r.modality == "audio")
          math.floorMod(h, 60000) else 0
        // ^^^ replace with real codec calls in production ^^^
        val hash = java.security.MessageDigest.getInstance("MD5")
          .digest(r.blob).map("%02x".format(_)).mkString
        MediaFeature(r.id, r.modality, len, width, height, durationMs, hash)
      }
    }
  }
}
