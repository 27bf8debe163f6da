package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Persistence for trained vector quantizers — the production
  * decoupling of training from serving: at 100 TB you train the
  * coarse anchors and PQ codebooks ONCE (on a sample — see the
  * `ann_ivfpq_sampled` query), persist them, and every subsequent
  * ingest/search job RELOADS them instead of re-running Lloyd chains
  * in-query. Both frames are broadcast-sized (cells × dim and
  * m × k × subDim doubles), so a reload is one tiny scan, and the
  * 6-dp-rounded training doubles round-trip parquet bit-exactly —
  * a reloaded quantizer reproduces routing, residual encoding and
  * ADC ranking identically (QuantizerStoreSpec pins search-result
  * equality through the round trip).
  *
  * Layout: `path/anchors` = [[Ann.kmeansAnchors]] output
  * (vec_id, embedding); `path/codebooks` = [[Pq.codebooks]] output
  * (s, code, cw).
  */
object QuantizerStore {

  def save(anchors: DataFrame, codebooks: DataFrame, path: String): Unit = {
    anchors.write.mode(SaveMode.Overwrite).parquet(s"$path/anchors")
    codebooks.write.mode(SaveMode.Overwrite).parquet(s"$path/codebooks")
  }

  def loadAnchors(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/anchors")

  def loadCodebooks(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(s"$path/codebooks")
}
