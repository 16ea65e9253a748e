package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timer for llm_dedup_cluster (VERDICT r7 "next" #3: 10.2 s driver
  * vs 3.8-4.4 s local — the largest driver/local spread in the r7 suite).
  * Times each sub-phase as its own action: mask build, the guarded exact
  * pair join, star contraction, remainder contraction, each propagation
  * round, final rollup — then cold-vs-warm full-key reps in the same JVM.
  *
  * NOTE (the DedupPhases caveat): the contraction/propagation section
  * below SNAPSHOTS Llm.componentLabels' round-8 body with timers wedged
  * in; re-sync the copy before trusting phase numbers against a future
  * plan.
  */
object ClusterPhases {
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

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[phase] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
      r
    }

    val m = graft.operators.Llm.docMasks(spark, sfDir)
    t("masks materialize")(println("  masks=" + m.count()))

    val a = m.select(col("doc_id").as("d1"), col("lang").as("la"), col("mask").as("ma"))
    val b = m.select(col("doc_id").as("d2"), col("lang").as("lb"), col("mask").as("mb"))
    val inter = bit_count(col("ma").bitwiseAND(col("mb"))).cast("double")
    val uni = bit_count(col("ma").bitwiseOR(col("mb"))).cast("double")
    val pairs = a.join(b, col("la") === col("lb") && col("d1") < col("d2"))
      .where(inter / uni >= 0.5)
      .select("d1", "d2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    t("exact pair join")(println("  edges=" + pairs.count()))

    // ---- componentLabels copy with timers (see scaladoc note) ----
    val nodes = m.select("doc_id")
    val nbr1 = pairs.groupBy("d2").agg(min(col("d1")).as("mn"))
      .select(col("d2").as("doc_id"), col("mn"))
    val l1 = t("star contraction (l1 checkpoint)") {
      nodes.join(nbr1, Seq("doc_id"), "left")
        .select(col("doc_id"),
          least(col("doc_id"), coalesce(col("mn"), col("doc_id"))).as("l1"))
        .localCheckpoint()
    }
    val r2 = t("remainder contraction (r2 checkpoint)") {
      pairs
        .join(broadcast(l1.select(col("doc_id").as("d1"), col("l1").as("a"))), "d1")
        .join(broadcast(l1.select(col("doc_id").as("d2"), col("l1").as("b"))), "d2")
        .where(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
        .distinct()
        .localCheckpoint()
    }
    val nRem = t("remainder count (checkpointed)")(r2.count())
    println("  remainder edges=" + nRem)
    pairs.unpersist()
    // round-8 plan: size-gated local union-find finisher (the shipped
    // key's path whenever the remainder fits the budget)
    val labels = t("local union-find finisher") {
      val parent = scala.collection.mutable.HashMap.empty[Long, Long]
      def find(x: Long): Long = {
        var r = x
        while (parent.getOrElse(r, r) != r) r = parent(r)
        var c = x
        while (parent.getOrElse(c, c) != c) { val n = parent(c); parent(c) = r; c = n }
        r
      }
      r2.collect().foreach { row =>
        val (ra, rb) = (find(row.getLong(0)), find(row.getLong(1)))
        if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
      }
      import spark.implicits._
      broadcast(parent.keys.toSeq.map(k => (k, find(k))).toDF("_l1k", "cluster"))
    }
    t("compose + rollup") {
      val lab = l1.join(labels, l1("l1") === col("_l1k"), "left")
        .select(col("doc_id"), coalesce(col("cluster"), col("l1")).as("cluster"))
      lab.groupBy("cluster")
        .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
        .orderBy("cluster").count()
    }
    spark.catalog.clearCache()

    // full-key cold vs warm in the same JVM
    (1 to 3).foreach { r =>
      t(s"full key rep$r") {
        graft.SparkEntry.queries("llm_dedup_cluster")(spark, sfDir).count()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
