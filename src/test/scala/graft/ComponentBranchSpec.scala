package graft

import org.apache.spark.storage.StorageLevel

import graft.operators.Llm

/** The two contracted-remainder branches of Llm.componentLabels (local
  * union-find finisher vs distributed min-label propagation) must compute
  * the same fixpoint: cluster = MIN reachable id. A long chain graph
  * maximizes propagation rounds, so it exercises the loop for real. */
class ComponentBranchSpec extends SparkSpec {

  // chain 1..8, triangle 20-21-22, cross edge 30-40, isolates 50, 51
  private val nodeIds: Seq[Long] =
    (1L to 8L) ++ Seq(20L, 21L, 22L, 30L, 40L, 50L, 51L)
  private val edges: Seq[(Long, Long)] =
    (1L to 7L).map(i => (i, i + 1)) ++
      Seq((20L, 21L), (21L, 22L), (20L, 22L), (30L, 40L))
  private val want: Map[Long, Long] =
    ((1L to 8L).map(_ -> 1L) ++ Seq(20L, 21L, 22L).map(_ -> 20L) ++
      Seq(30L -> 30L, 40L -> 30L, 50L -> 50L, 51L -> 51L)).toMap

  private def run(): Map[Long, Long] = {
    import spark.implicits._
    val nodes = nodeIds.toDF("doc_id")
    val pairs = edges.toDF("d1", "d2")
      .persist(StorageLevel.MEMORY_AND_DISK)
    Llm.componentLabels(nodes, pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("local union-find finisher computes the min-id fixpoint") {
    spark.conf.unset(Llm.FinishLocalConf)
    assert(run() == want)
  }

  test("distributed propagation branch computes the same fixpoint") {
    spark.conf.set(Llm.FinishLocalConf, "0")
    try assert(run() == want)
    finally spark.conf.unset(Llm.FinishLocalConf)
  }

  test("malformed budget conf fails naming the key") {
    spark.conf.set(Llm.FinishLocalConf, "lots")
    try {
      val e = intercept[IllegalArgumentException](run())
      assert(e.getMessage.contains(Llm.FinishLocalConf))
    } finally spark.conf.unset(Llm.FinishLocalConf)
  }
}
