package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Product output contract — the Spark-first analogue of the reference's
  * COG + metadata-YAML writes (SURVEY §2.1 sink row): the raster becomes
  * partitioned parquet (partition column ~ tile), the YAML sidecar becomes
  * an eo3-shaped JSON dataset document with product name, measurements
  * (column name + dtype, the band list analogue), per-partition-key value
  * extents (the geo bounding-box analogue), lineage (the input the product
  * was derived from) and row count, so a catalog (the ODC-index analogue)
  * can register the product and later prune partitions at the scan.
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
      measurements: Seq[(String, String)],
      extents: Map[String, (String, String)],
      lineage: Option[String],
      rows: Long,
      writtenAtEpochMs: Long)

  /** Writes df as a partitioned-parquet "product" plus _manifest.json.
    * Returns the manifest. */
  def write(
      df: DataFrame,
      product: String,
      outDir: String,
      partitionKeys: Seq[String],
      lineage: Option[String] = None): Manifest = {
    val path = s"$outDir/$product"
    val writer = df.write.mode(SaveMode.Overwrite)
    val parted =
      if (partitionKeys.nonEmpty) writer.partitionBy(partitionKeys: _*) else writer
    parted.parquet(path)

    // measured AFTER commit, from the committed files — the manifest
    // documents what a reader will actually see
    val committed = df.sparkSession.read.parquet(path)
    val rows = committed.count()
    // one distributed pass for all partition-key extents (bbox analogue)
    val extents: Map[String, (String, String)] =
      if (partitionKeys.isEmpty) Map.empty
      else {
        val aggs = partitionKeys.flatMap(k => Seq(
          min(col(k).cast("string")).as(s"min_$k"),
          max(col(k).cast("string")).as(s"max_$k")))
        val r = committed.agg(aggs.head, aggs.tail: _*).head()
        partitionKeys.map(k => k ->
          (String.valueOf(r.getAs[Any](s"min_$k")),
            String.valueOf(r.getAs[Any](s"max_$k")))).toMap
      }
    val m = Manifest(product, path, partitionKeys, df.schema.toDDL,
      df.schema.fields.map(f => f.name -> f.dataType.simpleString).toSeq,
      extents, lineage, rows, System.currentTimeMillis())
    def q(s: String) = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
    val json =
      s"""{"product": ${q(m.product)}, "path": ${q(m.path)}, """ +
        s""""partition_keys": [${m.partitionKeys.map(q).mkString(", ")}], """ +
        s""""schema": ${q(m.schemaDdl)}, """ +
        s""""measurements": {${m.measurements.map { case (n, t) => s"${q(n)}: ${q(t)}" }.mkString(", ")}}, """ +
        s""""extents": {${m.extents.toSeq.sortBy(_._1).map { case (k, (lo, hi)) =>
          s"${q(k)}: {${q("min")}: ${q(lo)}, ${q("max")}: ${q(hi)}}" }.mkString(", ")}}, """ +
        s""""lineage": ${m.lineage.map(q).getOrElse("null")}, """ +
        s""""rows": ${m.rows}, """ +
        s""""written_at_epoch_ms": ${m.writtenAtEpochMs}}"""
    Files.writeString(Paths.get(path, "_manifest.json"), json)
    m
  }

  /** [[write]] plus one eo3-shaped dataset document per written tile — the
    * per-scene metadata-YAML sidecar analogue (the reference writes COG +
    * YAML per dataset and indexes it; SURVEY §2.1 sink row). Documents are
    * derived DISTRIBUTEDLY from the committed files (no driver loop), one
    * JSON line per (tile_x, tile_y) in exactly the shape
    * [[SceneCatalog.parse]] ingests: write side and catalog side of the
    * loop meet in one schema. Each document's `path` points at that tile's
    * partition directory, so a catalog consumer reads ONLY the tiles its
    * index query selected — partition pruning driven by the catalog. */
  def writeWithDatasets(
      df: DataFrame,
      product: String,
      outDir: String,
      tileXCol: String,
      tileYCol: String,
      timeCol: String,
      lineage: Option[String] = None): Manifest = {
    val m = write(df, product, outDir, Seq(tileXCol, tileYCol), lineage)
    val committed = df.sparkSession.read.parquet(m.path)
    committed
      .groupBy(
        col(tileXCol).cast("int").as("tile_x"),
        col(tileYCol).cast("int").as("tile_y"))
      .agg(
        min(col(timeCol)).cast("timestamp").as("time"),
        count(lit(1)).as("n"))
      .select(to_json(struct(
        lit(product).as("product"),
        col("tile_x"), col("tile_y"), col("time"),
        concat(lit(s"${m.path}/$tileXCol="), col("tile_x"),
          lit(s"/$tileYCol="), col("tile_y")).as("path"),
        map(lit("rows"), col("n").cast("string"),
          lit("lineage"), lit(lineage.getOrElse("none"))).as("props"),
        // fresh product writes register as live version 0; a reprocessing
        // run would bump the version and archive the superseded documents
        // (SceneCatalog.latestNonArchived is the load-side pick)
        lit(0).as("version"), lit(false).as("archived"))).as("doc"))
      .write.mode(SaveMode.Overwrite).text(s"${m.path}/_datasets")
    m
  }

  /** The catalog side of [[writeWithDatasets]]: parse the product's
    * dataset documents into a [[SceneCatalog]] frame — the register-into-
    * the-index step of a product pipeline, ready for
    * [[SceneCatalog.query]] pruning. */
  def catalog(spark: SparkSession, outDir: String, product: String): DataFrame =
    SceneCatalog.parse(spark.read.textFile(s"$outDir/$product/_datasets"))

  /** Catalog-side read of a product written by [[write]]: the column set
    * recorded in _manifest.json is asserted against what the parquet
    * footers actually expose (a schema drift between sidecar and data is
    * the classic silent-corruption mode of sidecar catalogs), and filters
    * on the partition keys prune directories (measured in EngineSpec). */
  def read(spark: SparkSession, outDir: String, product: String): DataFrame = {
    val df = spark.read.parquet(s"$outDir/$product")
    // current name first, then the pre-r5 legacy name (manifest.json without
    // the underscore) so products written by earlier rounds keep their
    // drift guard; a product with NEITHER manifest fails loudly rather than
    // silently skipping the check (ADVICE r5)
    val manifestPath = Seq("_manifest.json", "manifest.json")
      .map(n => Paths.get(s"$outDir/$product", n))
      .find(Files.exists(_))
      .getOrElse(throw new IllegalStateException(
        s"product $product: no _manifest.json (or legacy manifest.json) — " +
          "refusing to read an unmanifested product"))
    locally {
      val manifest = Files.readString(manifestPath)
      // measurement names are the JSON keys of the "measurements" object
      val declared = "\"measurements\": \\{([^}]*)\\}".r
        .findFirstMatchIn(manifest)
        .map(_.group(1).split(",").map(_.split(":")(0).trim.stripPrefix("\"")
          .stripSuffix("\"")).toSet)
        .getOrElse(Set.empty)
      val actual = df.schema.fieldNames.toSet
      require(declared == actual,
        s"product $product: manifest/footers schema drift — " +
          s"manifest ${declared.toSeq.sorted}, footers ${actual.toSeq.sorted}")
    }
    df
  }
}
