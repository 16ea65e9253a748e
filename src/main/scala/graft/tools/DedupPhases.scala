package graft.tools

import org.apache.spark.sql.SparkSession

/** Throwaway phase-timer for llm_dedup_pipeline (VERDICT r6 "what's wrong"
  * #1: 28.7 s driver vs 3.9 s local). Times each sub-phase of the funnel
  * as its own action so the expensive stage is visible, plus a cold vs
  * warm split of the full key (codegen/JIT vs steady-state).
  *
  * NOTE: this deliberately snapshots the ROUND-6 plan under investigation
  * — e.g. rdocs builds its own broadcast(pivots.select(...)) where the
  * shipped key now reuses one broadcast(pivots) exchange. Phase numbers
  * here attribute the r6 outlier; re-sync the copy before using it to
  * profile the current key.
  */
object DedupPhases {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").count()
    import org.apache.spark.sql.functions._
    import graft.{Tables => T}

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val docs = T.documents(spark, sfDir)
    val exactCanon = docs.where(size(split(col("text"), " ")) >= 20)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val cdocs = docs.join(exactCanon, "doc_id")
      .select(col("doc_id"), col("lang"),
        array_sort(array_distinct(split(col("text"), " "))).as("toks"))
      .withColumn("n", size(col("toks")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("cdocs materialize")(cdocs.count())
    val jac = col("i").cast("double") / (col("n1") + col("n2") - col("i")).cast("double")
    val pivots = cdocs.groupBy("lang").agg(
      min(col("doc_id")).as("pdoc"),
      min_by(col("toks"), col("doc_id")).as("ptoks"),
      min_by(col("n"), col("doc_id")).as("n1"))
    val losersA = cdocs.join(broadcast(pivots), Seq("lang"))
      .where(col("doc_id") =!= col("pdoc"))
      .withColumn("i", size(array_intersect(col("toks"), col("ptoks"))))
      .withColumnRenamed("n", "n2")
      .where(jac >= 0.5)
      .select("doc_id")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("phase A losers")(println("  losersA=" + losersA.count()))
    val prefixed = (df: org.apache.spark.sql.DataFrame, idAs: String) => df.select(
      col("doc_id").as(idAs), col("lang"),
      explode(slice(col("toks"), lit(1),
        (floor(col("n") / 2) + 1).cast("int"))).as("tok"))
    val rdocs = cdocs.join(broadcast(pivots.select("lang", "pdoc")), Seq("lang"))
      .where(col("doc_id") =!= col("pdoc"))
      .join(losersA, Seq("doc_id"), "left_anti")
    t("rdocs count")(println("  rdocs=" + rdocs.count()))
    val cand = prefixed(cdocs, "d1")
      .join(prefixed(rdocs, "d2"), Seq("lang", "tok"))
      .where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
    t("phase B candidates")(println("  cand=" + cand.count()))
    val byId = cdocs.select(col("doc_id"), col("toks"), col("n"))
    val losersB = cand
      .join(byId.select(col("doc_id").as("d1"), col("toks").as("ta"), col("n").as("n1")), "d1")
      .join(byId.select(col("doc_id").as("d2"), col("toks").as("tb"), col("n").as("n2")), "d2")
      .withColumn("i", size(array_intersect(col("ta"), col("tb"))))
      .where(jac >= 0.5)
      .select(col("d2").as("doc_id")).distinct()
    t("phase B verify")(println("  losersB=" + losersB.count()))
    val fin = cdocs.select("doc_id", "lang")
      .join(losersA.union(losersB), Seq("doc_id"), "left_anti")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_survivors"), min(col("doc_id")).as("first_doc"))
      .orderBy("lang")
    t("survivor rollup")(fin.count())
    spark.catalog.clearCache()
    // full-key cold vs warm in the same JVM
    (1 to 3).foreach { r =>
      t(s"full key rep$r") {
        graft.SparkEntry.queries("llm_dedup_pipeline")(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
