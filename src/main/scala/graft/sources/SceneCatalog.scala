package graft.sources

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** The ODC-index analogue (SURVEY §2.1 row 1, §8.4 mapping): dataset
  * documents — one JSON per ingested scene with product, tile, acquisition
  * time, payload path, free-form properties — parsed into a typed catalog
  * DataFrame that spatial/temporal queries prune BEFORE any payload I/O.
  *
  * The reference resolves `dc.load(product, time=(a,b), extent)` through a
  * PostgreSQL index; here the same query is a filter on this catalog (at
  * scale: a parquet table partitioned by product/time, so catalog queries
  * are themselves partition-pruned scans), followed by a join to the data.
  */
object SceneCatalog {

  val documentSchema: StructType = StructType(Seq(
    StructField("product", StringType),
    StructField("tile_x", IntegerType),
    StructField("tile_y", IntegerType),
    StructField("time", TimestampType),
    StructField("path", StringType),
    StructField("props", MapType(StringType, StringType)),
    // dataset lineage/archiving fields (round 8): a reprocessed scene is a
    // NEW dataset document with a higher version; superseded/withdrawn
    // documents are archived, not deleted — the ODC index keeps them for
    // provenance but dc.load must never return them [PK datacube dataset
    // archiving]. Absent in older documents -> null (treated as live v0).
    StructField("version", IntegerType),
    StructField("archived", BooleanType)))

  /** Parse raw dataset-document JSON strings into the catalog. Documents
    * that fail to parse surface as all-null rows -> filtered, counted by
    * the caller if ingest QA wants them. */
  def parse(docs: Dataset[String]): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.toDF("doc")
      .select(from_json(col("doc"), documentSchema).as("d"))
      .select(col("d.*"))
      .where(col("product").isNotNull)
  }

  /** The dc.load-shaped index query: product + time range + tile bounding
    * box -> matching scenes, pruned in the catalog scan. */
  def query(
      catalog: DataFrame,
      product: String,
      timeFrom: String,
      timeTo: String,
      bbox: (Int, Int, Int, Int)): DataFrame = {
    val (x0, y0, x1, y1) = bbox
    catalog
      .where(col("product") === product)
      .where(col("time") >= lit(timeFrom).cast("timestamp") &&
        col("time") < lit(timeTo).cast("timestamp"))
      .where(col("tile_x").between(x0, x1) && col("tile_y").between(y0, y1))
  }

  /** Dataset-archiving load semantics (round 8, VERDICT r7 "next" #6): a
    * reprocessing user's first surprise — within each (product, tile,
    * solar-day) observation group, the HIGHEST-VERSION non-archived
    * dataset wins and archived datasets never load; a group whose every
    * dataset is archived loads nothing. `tieBreak` orders datasets of
    * equal version (a real index breaks ties on ingest time / dataset id).
    * One bounded window per observation group — at scale this shuffles
    * catalog rows only (datasets-per-group is small), never payloads,
    * and the pick happens BEFORE any payload IO. Null version/archived
    * (pre-versioning documents) count as live version 0. */
  def latestNonArchived(scenes: DataFrame, tieBreak: Seq[Column]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("product"), col("tile_x"), col("tile_y"), to_date(col("time")))
      .orderBy(coalesce(col("version"), lit(0)).desc +: tieBreak: _*)
    scenes
      .where(!coalesce(col("archived"), lit(false)))
      .withColumn("_rn", row_number().over(w))
      .where(col("_rn") === 1)
      .drop("_rn")
  }

  /** Group scenes into solar-day observation groups (the reference's
    * `group_by="solar_day"` load semantics): one row per (tile, day). */
  def groupBySolarDay(scenes: DataFrame): DataFrame =
    scenes
      .groupBy(col("tile_x"), col("tile_y"), to_date(col("time")).as("day"))
      .agg(
        count(lit(1)).as("n_scenes"),
        sort_array(collect_list(col("path"))).as("paths"))

  /** GRADED key (round 7, VERDICT r6 "next" #5): the full catalog loop —
    * dataset-doc JSON parse → typed catalog → dc.load-shaped index query
    * (product + time range + tile bbox) → payload resolution (scene path
    * → event row, the load step a real deployment does against object
    * storage) → solar-day observation groups with an order-free scaled
    * value sum. The DuckDB oracle applies the SAME predicates directly
    * over the events table (the doc generator is deterministic field
    * arithmetic, so catalog fields == oracle expressions; the JSON
    * round-trip itself is what the Spark side additionally exercises).
    * At scale the catalog is a parquet table partitioned by product/time
    * — this exact query shape becomes a partition-pruned scan, and the
    * payload join touches only matching paths (see object scaladoc).
    *
    * Corpus contract (like Multimodal's): demoDocs hand-concatenates JSON
    * and extracts the prop with an anchored digit regexp, so it assumes
    * every events.props carries key "k" with an INTEGER value — a props
    * violating that extracts as an empty string and the doc is KEPT with
    * an empty prop (it would still parse), silently diverging from a real
    * document's content; a props field that broke the JSON structure
    * itself would instead null out of from_json and DROP the scene while
    * the oracle (reading events directly) keeps the row. The driver
    * corpora satisfy the contract ({"k": <int>}); a real deployment
    * parses real dataset documents and the generator disappears. */
  val all: Seq[graft.Q] = Seq(
    graft.Q("eo_catalog_pruned_load", Some(
      "WITH cat AS (SELECT 'ndvi_' || event_type AS product, " +
        "CAST(user_id % 8 AS INTEGER) AS tile_x, CAST(user_id % 5 AS INTEGER) AS tile_y, " +
        "ts AS time, event_id, value FROM events), " +
        "sc AS (SELECT * FROM cat WHERE product = 'ndvi_click' " +
        "AND time >= TIMESTAMP '2024-01-08 00:00:00' AND time < TIMESTAMP '2024-01-22 00:00:00' " +
        "AND tile_x BETWEEN 0 AND 5 AND tile_y BETWEEN 0 AND 3) " +
        "SELECT tile_x, tile_y, CAST(time AS DATE) AS day, " +
        "CAST(COUNT(*) AS BIGINT) AS n_scenes, " +
        "CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_v6 " +
        "FROM sc GROUP BY tile_x, tile_y, day ORDER BY tile_x, tile_y, day"),
      (s, d) => {
        val catalog = parse(demoDocs(s, d))
        val scenes = query(catalog, "ndvi_click",
          "2024-01-08 00:00:00", "2024-01-22 00:00:00", (0, 0, 5, 3))
        // load: scene path -> payload row (the catalog only knows paths)
        val withId = scenes.withColumn("event_id",
          regexp_extract(col("path"), "/scenes/(\\d+)\\.tif", 1).cast("long"))
        val payload = graft.Tables.events(s, d).select(col("event_id"), col("value"))
        withId.join(payload, "event_id")
          .groupBy(col("tile_x"), col("tile_y"), to_date(col("time")).as("day"))
          .agg(count(lit(1)).as("n_scenes"),
            graft.Det.sum6(col("value")).as("sum_v6"))
          .orderBy("tile_x", "tile_y", "day")
      }),

    /** Archiving semantics graded end-to-end (see [[latestNonArchived]]):
      * per (product, tile, solar-day) group, pick the latest non-archived
      * dataset (version desc, then time/dataset-id desc) and count the
      * group's dataset/archived totals. The oracle applies the same
      * predicates directly over events (version/archived are the doc
      * generator's deterministic field arithmetic); fully-archived groups
      * drop on both sides (inner join from the pick). */
    graft.Q("eo_catalog_latest_version", Some(
      "WITH cat AS (SELECT 'ndvi_' || event_type AS product, " +
        "CAST(user_id % 8 AS INTEGER) AS tile_x, CAST(user_id % 5 AS INTEGER) AS tile_y, " +
        "CAST(ts AS DATE) AS day, ts, event_id, " +
        "CAST(event_id % 3 AS INTEGER) AS version, (event_id % 7 = 0) AS archived FROM events), " +
        "pick AS (SELECT product, tile_x, tile_y, day, event_id, version, " +
        "ROW_NUMBER() OVER (PARTITION BY product, tile_x, tile_y, day " +
        "ORDER BY version DESC, ts DESC, event_id DESC) AS rn FROM cat WHERE NOT archived), " +
        "tot AS (SELECT product, tile_x, tile_y, day, CAST(COUNT(*) AS BIGINT) AS n_datasets, " +
        "CAST(SUM(CASE WHEN archived THEN 1 ELSE 0 END) AS BIGINT) AS n_archived " +
        "FROM cat GROUP BY product, tile_x, tile_y, day) " +
        "SELECT p.product, p.tile_x, p.tile_y, p.day, " +
        "p.event_id AS chosen_id, p.version AS chosen_version, t.n_datasets, t.n_archived " +
        "FROM pick p JOIN tot t USING (product, tile_x, tile_y, day) WHERE p.rn = 1 " +
        "ORDER BY product, tile_x, tile_y, day"),
      (s, d) => {
        // persisted: BOTH the version pick and the per-day totals consume
        // the doc-build + JSON-parse subtree — unpersisted it executes
        // twice (the multi-consumer signature rule; measured ~0.9 s of
        // this key's ~2.6 s steady state at sf0.1)
        val catalog = parse(demoDocs(s, d))
          .withColumn("event_id",
            regexp_extract(col("path"), "/scenes/(\\d+)\\.tif", 1).cast("long"))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val day = to_date(col("time"))
        val picked = latestNonArchived(catalog,
            Seq(col("time").desc, col("event_id").desc))
          .select(col("product"), col("tile_x"), col("tile_y"), day.as("day"),
            col("event_id").as("chosen_id"), col("version").as("chosen_version"))
        val totals = catalog
          .groupBy(col("product"), col("tile_x"), col("tile_y"), day.as("day"))
          .agg(count(lit(1)).as("n_datasets"),
            sum(when(col("archived"), 1L).otherwise(0L)).as("n_archived"))
        picked.join(totals, Seq("product", "tile_x", "tile_y", "day"))
          .orderBy("product", "tile_x", "tile_y", "day")
      }),

    /** Polygon-extent load (round 10, VERDICT r9 "missing" #2): the
      * dc.load(geopolygon=...) shape — scenes whose TILE CENTER (in
      * quantized 16-unit tile coordinates, center = tile·16 + 8) falls
      * inside a CONCAVE "C" polygon, via graft.functions.Geometry's
      * integer ray-casting; the polygon's bbox runs first as the coarse
      * prefilter (the predicate partition pruning would use at scale),
      * then the exact crossing-parity test. The notch (y 36..52 at
      * x > 52) excludes tiles a bbox query would wrongly load — the
      * graded rows prove the concavity is honored. Same parse → query →
      * payload-join → solar-day rollup loop as eo_catalog_pruned_load;
      * the oracle applies the identical integer arithmetic (one shared
      * vertex list generates both sides). */
    {
      import graft.functions.Geometry
      val poly = Seq[(Long, Long)](
        (4L, 4L), (124L, 4L), (124L, 36L), (52L, 36L),
        (52L, 52L), (124L, 52L), (124L, 76L), (4L, 76L))
      val (bx0, by0, bx1, by1) = Geometry.bbox(poly)
      graft.Q("eo_catalog_polygon_load", Some(
        "WITH cat AS (SELECT 'ndvi_' || event_type AS product, " +
          "CAST(user_id % 8 AS INTEGER) AS tile_x, CAST(user_id % 5 AS INTEGER) AS tile_y, " +
          "ts AS time, event_id, value FROM events), " +
          "cc AS (SELECT *, CAST(tile_x AS BIGINT) * 16 + 8 AS cx, " +
          "CAST(tile_y AS BIGINT) * 16 + 8 AS cy FROM cat WHERE product = 'ndvi_click'), " +
          s"bb AS (SELECT * FROM cc WHERE cx BETWEEN $bx0 AND $bx1 AND cy BETWEEN $by0 AND $by1), " +
          "sc AS (SELECT * FROM bb WHERE " +
          Geometry.sqlPointInPolygon("cx", "cy", poly) + ") " +
          "SELECT tile_x, tile_y, CAST(time AS DATE) AS day, " +
          "CAST(COUNT(*) AS BIGINT) AS n_scenes, " +
          "CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_v6 " +
          "FROM sc GROUP BY tile_x, tile_y, day ORDER BY tile_x, tile_y, day"),
        (s, d) => {
          val catalog = parse(demoDocs(s, d))
            .where(col("product") === "ndvi_click")
          val cx = col("tile_x").cast("long") * 16 + 8
          val cy = col("tile_y").cast("long") * 16 + 8
          val scenes = catalog
            .withColumn("cx", cx).withColumn("cy", cy)
            .where(col("cx").between(bx0, bx1) && col("cy").between(by0, by1))
            .where(Geometry.pointInPolygon(col("cx"), col("cy"), poly))
          val withId = scenes.withColumn("event_id",
            regexp_extract(col("path"), "/scenes/(\\d+)\\.tif", 1).cast("long"))
          val payload = graft.Tables.events(s, d).select(col("event_id"), col("value"))
          withId.join(payload, "event_id")
            .groupBy(col("tile_x"), col("tile_y"), to_date(col("time")).as("day"))
            .agg(count(lit(1)).as("n_scenes"),
              graft.Det.sum6(col("value")).as("sum_v6"))
            .orderBy("tile_x", "tile_y", "day")
        })
    },

    // Antimeridian-wrapped AOI query (round 10, fifth wave) — the ±180°
    // corner case every global catalog hits (Fiji/Aleutians/NZ scenes):
    // an AOI [150°E, 150°W) CROSSES the dateline, so a naive
    // lon BETWEEN min AND max matches nothing. The Spark side uses the
    // branch-free MODULAR membership test
    // (lon − lonMin + 360) mod 360 < (lonMax − lonMin + 360) mod 360 —
    // one codegen'd comparison, partition-prunable after a mod-bucket
    // layout — while the oracle spells the split two-range union
    // (lon >= 150 OR lon < −150); their equality on the wrapped range
    // IS the graded claim. Scene lon/lat cells derive deterministically
    // from the corpus (10° cells covering the full globe), and both
    // AOI edges land ON cell boundaries so the half-open convention is
    // exercised, not dodged.
    graft.Q("eo_catalog_antimeridian", Some(
      "WITH cat AS (SELECT CAST(event_id % 36 AS INTEGER) * 10 - 180 AS lon, " +
        "CAST((event_id // 36) % 18 AS INTEGER) * 10 - 90 AS lat, event_id, value FROM events), " +
        "sc AS (SELECT * FROM cat WHERE (lon >= 150 OR lon < -150) " +
        "AND lat BETWEEN -30 AND 30) " +
        "SELECT lon, lat, CAST(COUNT(*) AS BIGINT) AS n_scenes, " +
        "CAST(SUM(CAST(FLOOR(value * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sum_v6 " +
        "FROM sc GROUP BY lon, lat ORDER BY lon, lat"),
      (s, d) => {
        val lon = (col("event_id") % 36).cast("int") * 10 - 180
        val lat = ((col("event_id") / 36).cast("long") % 18).cast("int") * 10 - 90
        val lonMin = 150
        val lonMax = -150
        val width = java.lang.Math.floorMod(lonMax - lonMin + 360, 360)
        graft.Tables.events(s, d)
          .select(lon.as("lon"), lat.as("lat"), col("event_id"), col("value"))
          .where(pmod(col("lon") - lonMin + 360, lit(360)) < width &&
            col("lat").between(-30, 30))
          .groupBy("lon", "lat")
          .agg(count(lit(1)).as("n_scenes"),
            graft.Det.sum6(col("value")).as("sum_v6"))
          .orderBy("lon", "lat")
      }))

  /** Demo catalog synthesized from the corpus (no scene fixtures exist):
    * events become "scenes" — deterministic, used by SceneCatalogSpec. */
  def demoDocs(spark: SparkSession, d: String): Dataset[String] = {
    import spark.implicits._
    graft.Tables.events(spark, d)
      .select(concat(
        lit("""{"product": "ndvi_"""), col("event_type"),
        lit("""", "tile_x": """), (col("user_id") % 8).cast("string"),
        lit(""", "tile_y": """), (col("user_id") % 5).cast("string"),
        lit(""", "time": """"), date_format(col("ts"), "yyyy-MM-dd HH:mm:ss"),
        lit("""", "path": "file:///scenes/"""), col("event_id").cast("string"),
        // deterministic version/archived fields: reprocessing runs produce
        // versions 0..2 per scene family; every 7th dataset is archived
        lit(""".tif", "version": """), (col("event_id") % 3).cast("string"),
        lit(""", "archived": """),
        when(col("event_id") % 7 === 0, lit("true")).otherwise(lit("false")),
        // regexp beats get_json_object here: Jackson spins up a parser
        // per row for a 10-char payload (measured on the graded key)
        lit(""", "props": {"k": """"), regexp_extract(col("props"), "\"k\":\\s*(\\d+)", 1),
        lit(""""}}""")).as("doc"))
      .as[String]
  }
}
