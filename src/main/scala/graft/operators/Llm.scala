package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** SURVEY.md §3.10: LLM-training-data pipeline operators over `documents`
  * and `embeddings` (BASELINE.json north star).
  *
  * Scale design:
  *  - Exact near-dup (`llm_dedup_near`) encodes each doc's distinct-token
  *    set as a 64-bit mask over a dense token dictionary (the corpus
  *    vocabulary is tiny), so a candidate pair costs two bit ops instead of
  *    a token self-join; pairs are blocked by language. At open-vocabulary
  *    100 TB scale the dictionary no longer fits one word — the scale path
  *    is `llm_minhash` (LSH banding: candidates only within equal band
  *    buckets, linear in corpus + bucket collisions).
  *  - Cosine top-k broadcasts the query positions; dot products accumulate
  *    as scaled 64-bit integers (FLOOR(x*y*1e14+0.5) long sums — exact,
  *    order-free, whole-stage codegen'd). The IVF-style scale path for many
  *    queries is the centroid assignment of `llm_knn_centroid` reused as a
  *    router (probe only the nearest cells).
  */
object Llm {

  /** Carter-Wegman constants for the minhash family: a_i*h + b_i mod P
    * over the portable 32-bit base hash. a_i < 2^30 keeps a*h+b inside
    * signed 64 bits for any h < 2^32; fixed seed so the Spark columns and
    * the interpolated oracle literals are the same numbers forever. */
  private[graft] val MinhashP = 4294967311L
  private[graft] val MinhashAB: Seq[(Long, Long)] = {
    val r = new scala.util.Random(20240612L)
    Seq.fill(16)((1L + r.nextInt((1 << 30) - 1).toLong, r.nextInt(1 << 30).toLong))
  }

  /** (doc_id, lang, 64-bit distinct-token-set mask) via a dense token
    * dictionary (zipWithIndex ids — partition-parallel, no single-partition
    * window sort; see [[TextOps.denseIds]]: the Jaccard output is invariant
    * to the id permutation) broadcast-joined back to the corpus. */
  private[graft] def docMasks(s: SparkSession, d: String): DataFrame =
    docMasksWithToks(s, d)._1

  /** (masks, persisted toks) — keys that need BOTH the mask table and the
    * minhash band rows (recall evals, banded clustering) take the toks
    * frame from here so the corpus explode runs ONCE per invocation
    * instead of once under masks and again under [[sigRows]] (round 17,
    * guide §1.2 step 1 "don't compute things twice"). */
  private[graft] def docMasksWithToks(s: SparkSession, d: String): (DataFrame, DataFrame) = {
    // persisted: consumed by the dict's eager id job AND the mask build
    val toks = T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("tok"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dict = TextOps.denseIds(toks.select("tok").distinct(), "tok_id")
    // Fail LOUDLY (both engines, lazily) if the vocabulary outgrows one
    // 63-bit word — a silent Spark shift-wrap would corrupt Jaccards and
    // diverge from DuckDB's range-checked shift. The open-vocab paths are
    // llm_ngram_jaccard's multiword masks and llm_minhash.
    // persisted: both sides of the pair self-join consume it (see
    // llm_dedup_pipeline's masks comment)
    val masks = toks.join(broadcast(dict), "tok")
      .groupBy("doc_id", "lang")
      .agg(sum(expr(
        "CASE WHEN tok_id > 62 THEN raise_error('llm_dedup_near: vocabulary " +
          "exceeds 63 tokens; use multiword masks or llm_minhash') " +
          "ELSE shiftleft(CAST(1 AS BIGINT), tok_id) END")).as("mask"))
      // (the error message's "multiword masks" escape hatch now lives in
      // llm_dedup_pipeline's packed-array tiers; ngram_jaccard verifies
      // via integer array_intersect — both open-vocabulary safe)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    (masks, toks)
  }

  private val toksSql: String =
    "toks AS (SELECT doc_id, lang, UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS tok FROM documents)"

  private val docMasksSql: String =
    s"WITH $toksSql, " +
      "dict AS (SELECT tok, CAST(DENSE_RANK() OVER (ORDER BY tok) - 1 AS INT) AS tok_id " +
      "FROM (SELECT DISTINCT tok FROM toks)), " +
      "masks AS (SELECT doc_id, lang, SUM(CASE WHEN tok_id > 62 THEN ERROR('vocabulary exceeds 63 tokens') " +
      "ELSE CAST(1 AS BIGINT) << tok_id END) AS mask " +
      "FROM toks JOIN dict USING (tok) GROUP BY doc_id, lang) "

  /** Minhash band CTEs (continuation of a `toks` CTE): the Carter-Wegman
    * signature + 4-band rows of llm_minhash, shared with
    * llm_dedup_cluster_banded's oracle so both spell identical banding. */
  private val minhashBandsSql: String = {
    val hs = MinhashAB.zipWithIndex.map { case ((a, b), i) =>
      s"MIN(($a * h + $b) % $MinhashP) AS h$i" }.mkString(", ")
    val bandSelects = (0 until 4).map(bnd =>
      s"SELECT doc_id, lang, $bnd AS band, CONCAT_WS(','," +
        (bnd * 4 until bnd * 4 + 4).map(i => s" h$i").mkString(",") +
        ") AS sig FROM sigs").mkString(" UNION ALL ")
    ", hb AS (SELECT doc_id, lang, " + sqlHash32("tok") + " AS h FROM toks), " +
      s"sigs AS (SELECT doc_id, lang, $hs FROM hb GROUP BY doc_id, lang), " +
      s"bands AS ($bandSelects)"
  }

  /** Transitive-closure + rollup CTEs shared by the exact and banded
    * cluster oracles — expects `masks` (the node set) and `pairs`
    * (d1 < d2 edges) to exist. Fixpoint semantics: cluster = MIN
    * reachable id, identical to the contraction+propagation limit. */
  private val clusterClosureCtes: String =
    ", edges AS (SELECT d1, d2 FROM pairs UNION ALL SELECT d2, d1 FROM pairs), " +
      "reach AS (SELECT doc_id AS a, doc_id AS b FROM masks " +
      "UNION SELECT r.a, e.d2 FROM reach r JOIN edges e ON r.b = e.d1), " +
      "cl AS (SELECT a AS doc_id, MIN(b) AS cluster FROM reach GROUP BY a)"

  private val clusterClosureSql: String =
    clusterClosureCtes +
      " SELECT cluster, CAST(COUNT(*) AS BIGINT) AS n_members, " +
      "MAX(doc_id) AS max_member FROM cl GROUP BY cluster ORDER BY cluster"

  /** Fold modulus for llm_dedup_recall_fold: keep docs with
    * hash32(doc_id) ≡ 0 (mod K). K=4 keeps ~25% of docs and ~6% of
    * truth pairs — the knob a 100 TB run raises until the truth join
    * fits its budget (the CI column prices the precision lost). */
  private val RecallFoldK = 4

  /** Shared builder for the fold-sampled recall eval (the key runs K =
    * [[RecallFoldK]]; LlmPipelineSpec runs K = 1, where the fold is the
    * whole corpus, and pins equality with llm_dedup_recall_eval). */
  private[graft] def recallOnFold(s: SparkSession, d: String, k: Int): DataFrame = {
    // shared toks explode + persisted candidate set — the
    // llm_dedup_recall_eval treatment (round 17, guide §1.2 step 1)
    val (m, toks) = docMasksWithToks(s, d)
    val fold = m.where(Det.hash32(col("doc_id").cast("string")) % k === 0)
    val truth = exactMaskPairs(fold)
    val fb = bandRowsFromToks(toks).join(fold.select("doc_id"), "doc_id")
    val cand = fb.select(col("doc_id").as("d1"), col("lang"), col("band"), col("sig"))
      .join(fb.select(col("doc_id").as("d2"), col("lang"), col("band"), col("sig")),
        Seq("lang", "band", "sig"))
      .where(col("d1") < col("d2"))
      .select("d1", "d2").distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nT = truth.agg(count(lit(1)).as("n_truth"))
    val nC = cand.agg(count(lit(1)).as("n_cand"))
    val nH = truth.join(cand, Seq("d1", "d2")).agg(count(lit(1)).as("n_hit"))
    val p = col("n_hit").cast("double") / col("n_truth").cast("double")
    nT.crossJoin(nC).crossJoin(nH)
      .select(col("n_truth"), col("n_cand"), col("n_hit"),
        when(col("n_truth") === 0, 1000000L)
          .otherwise(s6(p)).as("recall6"),
        when(col("n_truth") === 0, 0L)
          .otherwise(s6(lit(1.96) * sqrt(p * (lit(1.0) - p) /
            col("n_truth").cast("double")))).as("ci_hw6"))
  }

  /** The exact j >= 0.5 mask-Jaccard pair CTE (expects `masks`) — shared
    * by the cluster and dedup-apply oracles. */
  private val exactPairsSql: String =
    ", pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2 " +
      "FROM masks a JOIN masks b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
      "WHERE CAST(BIT_COUNT(a.mask & b.mask) AS DOUBLE) / " +
      "CAST(BIT_COUNT(a.mask | b.mask) AS DOUBLE) >= 0.5)"

  /** Exact per-lang all-pairs j >= 0.5 edges over a mask table — the
    * quadratic semantics anchor shared by llm_dedup_cluster and
    * llm_dedup_apply. Returned PERSISTED (componentLabels reads it twice
    * and unpersists it); callers guardPairBudget first. */
  /** EXPLICIT corpus budget for the quadratic exact-truth side (VERDICT
    * r11): the per-lang pair join is n²/2 per language BY DESIGN (it is
    * the semantics anchor the banding-recall evals grade against), so it
    * must fail LOUD — not silently run a cluster-sized pair join — the
    * day someone points it at an unbounded corpus. 10k docs/lang ≈ 50M
    * pairs/lang, the most a single-box eval should ever pay; beyond it
    * the graded scale path is llm_dedup_recall_fold (hash-fold sample). */
  private val ExactPairBudgetPerLang = 10000L

  private def exactMaskPairs(m: DataFrame): DataFrame = {
    val maxLang = m.groupBy("lang").count().agg(max("count")).head.getLong(0)
    require(maxLang <= ExactPairBudgetPerLang,
      s"exact-truth pair join over $maxLang docs in one lang exceeds the " +
        s"$ExactPairBudgetPerLang/lang budget - use llm_dedup_recall_fold at this scale")
    val a = m.select(col("doc_id").as("d1"), col("lang").as("la"), col("mask").as("ma"))
    val b = m.select(col("doc_id").as("d2"), col("lang").as("lb"), col("mask").as("mb"))
    val inter = bit_count(col("ma").bitwiseAND(col("mb"))).cast("double")
    val uni = bit_count(col("ma").bitwiseOR(col("mb"))).cast("double")
    a.join(b, col("la") === col("lb") && col("d1") < col("d2"))
      .where(inter / uni >= 0.5)
      .select("d1", "d2")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
  }

  /** (doc_id, lang, h0..h15) Carter-Wegman minhash signature rows — the
    * corpus explode + 16 per-token hash mins shared by the band machinery
    * and the estimator key. Not persisted here; callers that fan the
    * subtree out persist at their own join point. */
  private[operators] def sigRows(s: SparkSession, d: String): DataFrame =
    sigRowsFromToks(T.documents(s, d)
      .select(col("doc_id"), col("lang"),
        explode(array_distinct(split(col("text"), " "))).as("tok")))

  /** Signature rows over an existing (doc_id, lang, tok) frame — lets
    * masks+bands keys reuse [[docMasksWithToks]]'s persisted explode. */
  private[operators] def sigRowsFromToks(toks: DataFrame): DataFrame = {
    val hb = toks.withColumn("hb", hash32(col("tok")))
    val hashCols = MinhashAB.zipWithIndex.map { case ((a, b), i) =>
      ((lit(a) * col("hb") + lit(b)) % lit(MinhashP)).as(s"c$i") }
    val minCols = MinhashAB.indices.map(i => min(col(s"c$i")).as(s"h$i"))
    hb.select(Seq(col("doc_id"), col("lang")) ++ hashCols: _*)
      .groupBy("doc_id", "lang")
      .agg(minCols.head, minCols.tail: _*)
  }

  /** (doc_id, lang, band, sig) 4×4 band rows from a signature table. */
  private def bandsFromSigs(sigs: DataFrame): DataFrame = {
    val bandStructs = (0 until 4).map(bnd => struct(lit(bnd).as("band"),
      concat_ws(",", (bnd * 4 until bnd * 4 + 4).map(i => col(s"h$i")): _*).as("sig")))
    sigs
      .select(col("doc_id"), col("lang"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("lang"), col("b.band").as("band"), col("b.sig").as("sig"))
  }

  /** (doc_id, lang, band, sig) minhash-LSH band rows — the llm_minhash
    * candidate machinery (4 bands x 4 Carter-Wegman hashes; see
    * llm_minhash's key comment for the shape history). Returned PERSISTED:
    * the signature subtree feeds both sides of every band self-join.
    * Shared by llm_minhash and llm_dedup_cluster_banded. */
  private[operators] def bandRows(s: SparkSession, d: String): DataFrame =
    bandsFromSigs(sigRows(s, d))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Persisted band rows over a shared toks frame (see
    * [[docMasksWithToks]]). */
  private[operators] def bandRowsFromToks(toks: DataFrame): DataFrame =
    bandsFromSigs(sigRowsFromToks(toks))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

  /** Largest contracted-remainder edge count the local union-find
    * finisher in [[componentLabels]] will collect (default 1 M edges =
    * two long columns ~ 16 MB on the driver; the distributed loop takes
    * over above it). Session-overridable so a bigger driver can raise it
    * — and so ComponentBranchSpec can force the distributed branch. */
  private[graft] val FinishLocalConf = "spark.graft.cc.localFinishMax"
  private val FinishLocalEdgeDefault = 1000000L

  /** Per-doc connected-component label over a (d1 < d2) pair list: star
    * contraction, then the contracted remainder resolves through a
    * SIZE-GATED local union-find finisher (remainders are minuscule on
    * dup-dense graphs) or, above [[FinishLocalEdgeMax]], distributed
    * min-label propagation to the fixpoint (see llm_dedup_cluster's key
    * comment for the full design note and the Kiveris 2014 citation —
    * two-phase contract-then-finish is that paper's shape). All three
    * branches compute the same fixpoint: cluster = MIN reachable id.
    * `nodes` = one `doc_id` row per element; `pairs` must arrive
    * PERSISTED (it is read by the contraction agg and the remainder map)
    * and is unpersisted here once the checkpointed remainder exists.
    * Returns (doc_id, cluster). */
  private[graft] def componentLabels(nodes: DataFrame, pairs: DataFrame): DataFrame = {
    // ---- phase 1: star contraction — pair set touched ONCE ----
    // With d1 < d2 by construction, l1(x) = min(x, min d1 over pairs
    // whose d2 = x): the minimum SMALLER-id neighbor. If x has any
    // smaller neighbor, that minimum beats x and becomes l1(x); if it
    // has only larger neighbors, x stays its own class. Either way
    // the merge target is adjacent-or-self, so components are
    // preserved, and the directed pair list never needs the 2x
    // symmetric-union materialization.
    val nbr1 = pairs.groupBy("d2").agg(min(col("d1")).as("mn"))
      .select(col("d2").as("doc_id"), col("mn"))
    val l1 = nodes
      .join(nbr1, Seq("doc_id"), "left")
      .select(col("doc_id"),
        least(col("doc_id"), coalesce(col("mn"), col("doc_id"))).as("l1"))
      .localCheckpoint()
    // contracted remainder: pairs between DIFFERENT l1 classes (the
    // label table is node-count-sized -> broadcast map-side joins);
    // symmetrized only AFTER contraction, when it is small
    // checkpointed BEFORE the symmetric union below reads it twice
    val r2 = pairs
      .join(broadcast(l1.select(col("doc_id").as("d1"), col("l1").as("a"))), "d1")
      .join(broadcast(l1.select(col("doc_id").as("d2"), col("l1").as("b"))), "d2")
      .where(col("a") =!= col("b"))
      // canonical orientation BEFORE distinct: class pairs can arrive
      // in either order ((1,4)->(1,2) vs (2,3)->(2,1)) and would
      // otherwise survive dedup twice, doubling every loop round
      .select(least(col("a"), col("b")).as("a"), greatest(col("a"), col("b")).as("b"))
      .distinct()
      .localCheckpoint()
    pairs.unpersist()
    // ---- phase 2: resolve the contracted remainder ----
    // r2 is checkpointed, so this count reads cached blocks. On a dense
    // dup graph contraction is brutal (sf0.1: 2.29 M edges -> 793), so
    // the remainder usually fits the local finisher budget below.
    val nRem = r2.count()
    val finishLocalMax = r2.sparkSession.conf.getOption(FinishLocalConf)
      .map { v =>
        try v.trim.toLong
        catch {
          case _: NumberFormatException => throw new IllegalArgumentException(
            s"$FinishLocalConf must be a long edge count, got '$v'")
        }
      }.getOrElse(FinishLocalEdgeDefault)
    if (nRem == 0) {
      // every component collapsed in one star round: l1 IS the label
      l1.select(col("doc_id"), col("l1").as("cluster"))
    } else if (nRem <= finishLocalMax) {
      // LOCAL FINISHER (the two-phase CC shape of the MapReduce CC
      // literature: contract distributed until the core fits one
      // machine, then solve it exactly). Union-find with min-id roots
      // over the collected remainder — O(nRem α(nRem)) driver work, a
      // few ms — replaces O(diameter) distributed rounds that were pure
      // job-scheduling overhead at this size (ClusterPhases r8: 4
      // rounds x ~2 jobs over <1k rows = ~2-4 s of the key's ~6-9 s).
      // The size gate keeps the 100 TB story honest: a remainder bigger
      // than the budget (~tens of MB collected) falls through to the
      // distributed propagation loop unchanged.
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
        if (ra != rb) { // min id becomes the root: the fixpoint label
          if (ra < rb) parent(rb) = ra else parent(ra) = rb
        }
      }
      val resolved = parent.keys.toSeq.map(k => (k, find(k)))
      val spark = r2.sparkSession
      import spark.implicits._
      val lbl = broadcast(resolved.toDF("_l1k", "cluster"))
      // classes untouched by the remainder keep their own id
      l1.join(lbl, l1("l1") === col("_l1k"), "left")
        .select(col("doc_id"),
          coalesce(col("cluster"), col("l1")).as("cluster"))
    } else {
      // distributed min-label propagation to the fixpoint
      val e2 = r2.select(col("a").as("d1"), col("b").as("d2"))
        .union(r2.select(col("b").as("d1"), col("a").as("d2")))
      var labels = l1.select(col("l1").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("cluster")).localCheckpoint()
      var converged = false
      while (!converged) {
        val nbrMin = e2
          .join(labels.select(col("doc_id").as("d2"), col("cluster").as("nc")), "d2")
          .groupBy(col("d1")).agg(min(col("nc")).as("nmin"))
          .select(col("d1").as("doc_id"), col("nmin"))
        // convergence rides the checkpointed row as a `changed` flag, so
        // the probe is one scan of the label table — not a second
        // labels-vs-next join per round (ClusterPhases r8: the probe join
        // was ~0.15 s of every ~0.5 s round)
        val next = labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("cluster"), coalesce(col("nmin"), col("cluster"))).as("cluster"),
            (coalesce(col("nmin"), col("cluster")) < col("cluster")).as("changed"))
          .localCheckpoint()
        converged = next.where(col("changed")).isEmpty
        labels = next.select("doc_id", "cluster")
      }
      // compose: cluster(doc) = root(l1(doc))
      l1.join(labels.select(col("doc_id").as("_l1k"), col("cluster")),
          l1("l1") === col("_l1k"))
        .select(col("doc_id"), col("cluster"))
    }
  }

  /** The graded (cluster, n_members, max_member) rollup over
    * [[componentLabels]]. */
  private def componentRollup(nodes: DataFrame, pairs: DataFrame): DataFrame =
    componentLabels(nodes, pairs)
      .groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), max(col("doc_id")).as("max_member"))
      .orderBy("cluster")

  /** Per-(vec, position) exploded doubles — the relational layout for
    * vector math that has to survive arbitrary dimension counts. */
  /** Lloyd rounds for llm_kmeans_lloyd (fixed K both engines; the
    * CcRounds contract — LlmClusterBandedSpec-style convergence is
    * covered by the graded n_moved column). Declared before `all`. */
  private val KmeansRounds = 3

  private def vecPos(s: SparkSession, d: String): DataFrame =
    T.embeddings(s, d)
      .select(col("vec_id"), col("label"),
        posexplode(col("embedding")).as(Seq("pos", "xf")))
      .withColumn("x", col("xf").cast("double")).drop("xf")

  /** The [[KmeansRounds]]-deep Lloyd loop shared by llm_kmeans_lloyd and
    * llm_semdedup (round 16): per round one broadcast of the k×dim
    * quantized centroids, one map-only codegen'd scaled-long assignment,
    * one (cluster, pos) partial agg — the iterate-quantize induction
    * that makes the chain hash-matchable. Returns (final assignment,
    * previous round's assignment, final per-(ck, pos) centroid grid). */
  private def lloydChain(s: SparkSession, d: String)
      : (DataFrame, DataFrame, DataFrame) = {
    graft.functions.VectorExprs.register(s)
    import graft.functions.VectorExprs.sl2
    val vecs = T.embeddings(s, d).select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("dvec"))
    val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("ck"))
    var centArr = T.embeddings(s, d).where(col("vec_id") < 8)
      .select(col("vec_id").as("ck"),
        transform(col("embedding"), x => x.cast("double")).as("cvec"))
    var asgPrev: DataFrame = null
    var asg: DataFrame = null
    var cent: DataFrame = null
    for (_ <- 1 to KmeansRounds) {
      asgPrev = asg
      asg = vecs.crossJoin(broadcast(centArr))
        .select(col("vec_id"), col("ck"),
          sl2(col("dvec"), col("cvec")).as("d2"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") === 1)
        .select("vec_id", "ck")
        .localCheckpoint()
      cent = vecPos(s, d).join(asg, "vec_id")
        .groupBy(col("ck"), col("pos"))
        .agg(mean6(col("x")).as("c6"))
        .localCheckpoint()
      centArr = cent
        .groupBy("ck")
        .agg(transform(array_sort(collect_list(struct(col("pos"),
          (col("c6").cast("double") / lit(1e6)).as("c")))),
          e => e.getField("c")).as("cvec"))
    }
    (asg, asgPrev, cent)
  }

  /** Oracle twin of [[lloydChain]]'s rounds — the llm_kmeans_lloyd CTE
    * chain, shared verbatim by llm_semdedup. */
  private def lloydSqlRounds: String =
    (1 to KmeansRounds).map { r =>
      val centJoin =
        if (r == 1) "seeds s ON u.pos = s.pos"
        else s"(SELECT ck, pos, CAST(c6 AS DOUBLE) / 1e6 AS c FROM cent${r - 1}) s ON u.pos = s.pos"
      s"dist$r AS MATERIALIZED (SELECT u.vec_id, s.ck, " +
        "CAST(SUM(CAST(FLOOR((u.x - s.c) * (u.x - s.c) * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS d2 " +
        s"FROM ux u JOIN $centJoin GROUP BY u.vec_id, s.ck), " +
        s"asg$r AS MATERIALIZED (SELECT vec_id, ck FROM (SELECT vec_id, ck, " +
        s"ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, ck) AS rn FROM dist$r) WHERE rn = 1), " +
        s"cent$r AS MATERIALIZED (SELECT a.ck, u.pos, " + sqlMean6("u.x") + " AS c6 " +
        s"FROM ux u JOIN asg$r a ON a.vec_id = u.vec_id GROUP BY a.ck, u.pos)"
    }.mkString(", ")

  /** llm_semdedup's within-cluster similarity threshold: measured on
    * this corpus (sf0.01 within-cluster cosine max 0.513, p99.9 0.417),
    * 0.4 fires the dropped lane with 19-27 vectors at the graded SFs
    * while keeping > 90% of every cluster — the honest analogue of the
    * paper's ~0.95 on a real near-dup corpus. */
  private val SemDedupTau = 0.4

  private val vecPosSql: String =
    "SELECT vec_id, label, UNNEST(RANGE(0, LEN(embedding))) AS pos, " +
      "CAST(UNNEST(embedding) AS DOUBLE) AS x FROM embeddings"

  val all: Seq[Q] = Seq(

    Q("llm_dedup_exact", Some(
      "SELECT MD5(text) AS content_hash, CAST(COUNT(*) AS BIGINT) AS dup_count, " +
        "MIN(doc_id) AS canonical_id FROM documents " +
        "GROUP BY content_hash ORDER BY content_hash"),
      // thin instantiation of the user-facing API (round 10)
      (s, d) => graft.analytics.Dedup
        .exactGroups(T.documents(s, d), "doc_id", "text")
        .orderBy("content_hash")),

    // Exact token-set Jaccard >= 0.5 pairs, blocked by lang; O(1) per pair
    // via the 64-bit mask (see object scaladoc for the open-vocab path).
    Q("llm_dedup_near", Some(
      docMasksSql +
        "SELECT a.doc_id AS d1, b.doc_id AS d2, " +
        sqlS6("CAST(BIT_COUNT(a.mask & b.mask) AS DOUBLE) / " +
          "CAST(BIT_COUNT(a.mask | b.mask) AS DOUBLE)") + " AS jaccard " +
        "FROM masks a JOIN masks b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
        "WHERE CAST(BIT_COUNT(a.mask & b.mask) AS DOUBLE) / " +
        "CAST(BIT_COUNT(a.mask | b.mask) AS DOUBLE) >= 0.5 " +
        "ORDER BY d1, d2"),
      (s, d) => {
        val m = docMasks(s, d)
        // enforced scale caveat: this key is quadratic per lang block BY
        // DESIGN (the oracle-graded semantics anchor); above the pair
        // budget it refuses to run and points at the bucketed paths
        TextOps.guardPairBudget(m, Seq("lang"), "llm_dedup_near",
          "use llm_minhash (banded candidates) or llm_dedup_pipeline " +
            "phase B (prefix-filtered) at corpus scale")
        val a = m.select(col("doc_id").as("d1"), col("lang").as("lang_a"), col("mask").as("mask_a"))
        val b = m.select(col("doc_id").as("d2"), col("lang").as("lang_b"), col("mask").as("mask_b"))
        val inter = bit_count(col("mask_a").bitwiseAND(col("mask_b"))).cast("double")
        val union = bit_count(col("mask_a").bitwiseOR(col("mask_b"))).cast("double")
        a.join(b, col("lang_a") === col("lang_b") && col("d1") < col("d2"))
          .where(inter / union >= 0.5)
          .select(col("d1"), col("d2"), s6(inter / union).as("jaccard"))
          .orderBy("d1", "d2")
      }),

    // Near-dup CLUSTERS (round 7): connected components over the
    // j >= 0.5 same-lang pair graph — the step that turns llm_dedup_near's
    // pair list into dedup GROUPS (one canonical doc per component, the
    // shape a dedup funnel actually consumes; a pair list alone
    // under-removes transitive chains a~b~c). Two phases, because a
    // dup-heavy corpus makes this graph DENSE (4.58 M edges over 5 k docs
    // at sf0.1 — avg degree ~900):
    //   1. STAR CONTRACTION (one pass): every node merges into
    //      min(self, min neighbor). Valid coarsening — a node is adjacent
    //      to its min neighbor, so components are preserved — and on a
    //      dense graph it collapses almost everything: the full edge set
    //      is touched ONCE (an agg + two broadcast label joins), then
    //      shrinks to the contracted remainder (Kiveris et al. 2014,
    //      "Connected Components in MapReduce and Beyond", the star
    //      operation).
    //   2. Min-label propagation over the contracted remainder to a
    //      fixpoint — O(contracted diameter) tiny rounds, lineage cut per
    //      round (localCheckpoint, the eo_geomedian pattern); the driver
    //      loop only evaluates an isEmpty convergence probe.
    //      (Pointer-jumping was measured a net LOSS here: rounds 5 -> 4
    //      but +1 self-join and +1 checkpoint per round on a loop whose
    //      cost is per-round edge volume, not round count.)
    // At 100 TB: same plan with minhash-banded candidate edges instead of
    // the exact pair join (the guard below enforces that switch) and
    // repeated contraction rounds if the remainder stays large.
    // Oracle: transitive closure by recursive CTE, cluster =
    // MIN(reachable id) — fixpoint semantics, identical to the
    // contraction+propagation limit regardless of round structure.
    Q("llm_dedup_cluster", Some(
      docMasksSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        exactPairsSql + clusterClosureSql),
      (s, d) => {
        val m = docMasks(s, d)
        TextOps.guardPairBudget(m, Seq("lang"), "llm_dedup_cluster",
          "use llm_dedup_cluster_banded (minhash-banded candidate edges " +
            "into the same contraction) at corpus scale; the component " +
            "propagation itself is linear")
        componentRollup(m.select("doc_id"), exactMaskPairs(m))
      }),

    // APPLY the dedup decision — the step that actually produces the
    // deduplicated corpus (the published recipe keeps ONE representative
    // per near-dup cluster, e.g. Lee et al. 2022 "Deduplicating Training
    // Data Makes Language Models Better"): per component, keep the
    // LONGEST document (ties -> smallest doc_id; the longest member is
    // the standard pick — it dominates its near-dups' content). Output =
    // the kept doc per cluster with its cluster size; singletons keep
    // themselves, so output rows = number of components and the kept set
    // IS the surviving corpus. At 100 TB: labels are the linear
    // componentLabels output, the length join is doc-count-sized, and the
    // pick is one window over partitions bounded by CLUSTER size — no
    // stage touches all-pairs beyond the shared (budget-guarded) edge
    // source the cluster family already anchors on.
    Q("llm_dedup_apply", Some(
      docMasksSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        exactPairsSql + clusterClosureCtes +
        ", ranked AS (SELECT cl.doc_id, cl.cluster, " +
        "ROW_NUMBER() OVER (PARTITION BY cl.cluster ORDER BY LEN(dd.text) DESC, cl.doc_id) AS rn, " +
        "COUNT(*) OVER (PARTITION BY cl.cluster) AS n_members " +
        "FROM cl JOIN documents dd ON dd.doc_id = cl.doc_id) " +
        "SELECT doc_id AS kept_id, cluster, CAST(n_members AS BIGINT) AS n_members " +
        "FROM ranked WHERE rn = 1 ORDER BY cluster"),
      (s, d) => {
        val m = docMasks(s, d)
        TextOps.guardPairBudget(m, Seq("lang"), "llm_dedup_apply",
          "swap the edge source for llm_dedup_cluster_banded's banded " +
            "candidates at corpus scale; the keep-longest pick is linear")
        val labels = componentLabels(m.select("doc_id"), exactMaskPairs(m))
        // thin instantiation of the user-facing API (round 10): the
        // keep-longest pick lives in analytics.Dedup.keepLongest
        graft.analytics.Dedup
          .keepLongest(labels, T.documents(s, d), "doc_id", "text")
          .orderBy("cluster")
      }),

    // The SCALE path for near-dup clustering (round 8, VERDICT r7 "next"
    // #1): the SAME star-contraction + propagation, fed by minhash-BANDED
    // candidate edges (llm_minhash's Carter-Wegman banding via bandRows)
    // instead of the exact all-pairs join — the switch llm_dedup_cluster's
    // budget guard names, now graded end-to-end. Candidates are verified
    // against the exact mask Jaccard before entering the graph, so every
    // banded edge IS a true j >= 0.5 edge; what banding changes is RECALL
    // (a true pair surfaces only if some band's 4 signature hashes all
    // agree — probability 1-(1-j^4)^4, = 1 at j = 1). The oracle is the
    // same recursive-CTE closure over the same banded+verified edge set
    // (identical Carter-Wegman numbers via the portable base hash), so the
    // key grades the banded plan's OWN fixpoint semantics deterministically
    // on any corpus; LlmClusterBandedSpec then pins banded == exact cluster
    // rollups on a threshold-separated corpus (within-group j = 1, across
    // j < 0.5) where banding is provably complete, and subset-refinement
    // properties on the dup-dense graded corpus. At 100 TB: every stage is
    // bucketed or linear — band self-join on (lang, band, sig), verify on
    // candidate pairs only, contraction touches the edge set once.
    Q("llm_dedup_cluster_banded", Some(
      docMasksSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        minhashBandsSql +
        ", cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a " +
        "JOIN bands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
        "pairs AS (SELECT c.d1, c.d2 FROM cand c " +
        "JOIN masks a ON c.d1 = a.doc_id JOIN masks b ON c.d2 = b.doc_id " +
        "WHERE CAST(BIT_COUNT(a.mask & b.mask) AS DOUBLE) / " +
        "CAST(BIT_COUNT(a.mask | b.mask) AS DOUBLE) >= 0.5)" +
        clusterClosureSql),
      (s, d) => {
        // masks + band rows share one persisted corpus explode (round 17)
        val (m, toks) = docMasksWithToks(s, d)
        val br = bandRowsFromToks(toks)
        val cand = br.select(col("doc_id").as("d1"), col("lang"), col("band"), col("sig"))
          .join(br.select(col("doc_id").as("d2"), col("lang"), col("band"), col("sig")),
            Seq("lang", "band", "sig"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        val inter = bit_count(col("ma").bitwiseAND(col("mb"))).cast("double")
        val uni = bit_count(col("ma").bitwiseOR(col("mb"))).cast("double")
        // exact verify of CANDIDATES only (mask table is node-count-sized;
        // at broadcast-unfriendly scale these become shuffled equi-joins
        // on the candidate ids — still linear in candidates)
        val pairs = cand
          .join(m.select(col("doc_id").as("d1"), col("mask").as("ma")), "d1")
          .join(m.select(col("doc_id").as("d2"), col("mask").as("mb")), "d2")
          .where(inter / uni >= 0.5)
          .select("d1", "d2")
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        componentRollup(m.select("doc_id"), pairs)
      }),

    // Banded-candidate RECALL evaluation (round 10, fifth wave) — the
    // dedup counterpart of llm_ann_recall_eval: grades the LSH banding
    // law itself by comparing the band-bucket candidate set against the
    // exact mask-Jaccard ≥ 0.5 truth. n_hit/n_truth is the candidate
    // recall the S-curve (1-(1-s^r)^b, r=4, b=4) predicts; n_cand vs
    // n_truth is the precision cost. This is THE number an operator
    // tunes bands/rows against before a 100 TB dedup run — graded here
    // so the banding can't silently rot. Shapes: truth = the per-lang
    // pair join (quadratic semantics anchor, budget-bounded corpus);
    // cand = the one band self-join; hit = an equi join of two pair
    // sets. BUILD-TIME SIDE EFFECT: truth arrives persisted
    // (exactMaskPairs contract) and is released by the harness's
    // per-key clearCache (the win_ntile note).
    Q("llm_dedup_recall_eval", Some(
      docMasksSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        minhashBandsSql +
        ", cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a " +
        "JOIN bands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)" +
        exactPairsSql +
        " SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_truth, " +
        "CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand, " +
        "CAST((SELECT COUNT(*) FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2) AS BIGINT) AS n_hit, " +
        "CASE WHEN (SELECT COUNT(*) FROM pairs) = 0 THEN CAST(1000000 AS BIGINT) ELSE " +
        "CAST(FLOOR(CAST((SELECT COUNT(*) FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2) AS DOUBLE) / " +
        "(SELECT COUNT(*) FROM pairs) * 1e6 + 0.5) AS BIGINT) END AS recall6"),
      (s, d) => {
        // round 17 (guide §1.2 step 1): masks and band rows share ONE
        // persisted corpus explode (docMasksWithToks), and the band
        // self-join's candidate set is persisted so n_cand and n_hit
        // read it once instead of executing the self-join twice
        val (m, toks) = docMasksWithToks(s, d)
        val truth = exactMaskPairs(m)
        val br = bandRowsFromToks(toks)
        val cand = br.select(col("doc_id").as("d1"), col("lang"), col("band"), col("sig"))
          .join(br.select(col("doc_id").as("d2"), col("lang"), col("band"), col("sig")),
            Seq("lang", "band", "sig"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2").distinct()
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val nT = truth.agg(count(lit(1)).as("n_truth"))
        val nC = cand.agg(count(lit(1)).as("n_cand"))
        val nH = truth.join(cand, Seq("d1", "d2")).agg(count(lit(1)).as("n_hit"))
        nT.crossJoin(nC).crossJoin(nH)
          .select(col("n_truth"), col("n_cand"), col("n_hit"),
            when(col("n_truth") === 0, 1000000L)
              .otherwise(s6(col("n_hit").cast("double") / col("n_truth").cast("double")))
              .as("recall6"))
      }),

    // Hash-fold sampled banding-recall evaluation (round 11, VERDICT r10
    // next-round #4) — llm_dedup_recall_eval's exact-Jaccard truth side is
    // quadratic BY DESIGN (it anchors the LSH semantics), which caps the
    // eval at a budget-bounded corpus. This key is the 100 TB-runnable
    // form: fold the doc set to the ~1/K of documents whose portable
    // Det.hash32(doc_id) ≡ 0 (mod K=4) — a uniform, deterministic,
    // engine-portable sample — and grade recall on truth pairs whose BOTH
    // endpoints fall in the fold (pair cost drops ~K², here 16×). The
    // estimator is unbiased for pair-level recall (every truth pair is
    // sampled with equal probability 1/K²; LlmPipelineSpec pins the K=1
    // degenerate fold equal to the exact key), and the normal-approx 95%
    // CI half-width 1.96·√(p(1−p)/n) is one fixed IEEE sequence over
    // exact integers (÷ and √ are correctly rounded — Det rule 2).
    Q("llm_dedup_recall_fold", Some(
      docMasksSql.replaceFirst("WITH ", "WITH RECURSIVE ") +
        minhashBandsSql +
        s", fold AS (SELECT doc_id FROM masks WHERE (${Det.sqlHash32("CAST(doc_id AS VARCHAR)")}) % $RecallFoldK = 0)" +
        ", fmasks AS (SELECT m.* FROM masks m JOIN fold USING (doc_id))" +
        ", fbands AS (SELECT b.* FROM bands b JOIN fold USING (doc_id))" +
        ", cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM fbands a " +
        "JOIN fbands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id)" +
        ", pairs AS (SELECT a.doc_id AS d1, b.doc_id AS d2 " +
        "FROM fmasks a JOIN fmasks b ON a.lang = b.lang AND a.doc_id < b.doc_id " +
        "WHERE CAST(BIT_COUNT(a.mask & b.mask) AS DOUBLE) / " +
        "CAST(BIT_COUNT(a.mask | b.mask) AS DOUBLE) >= 0.5)" +
        ", k AS (SELECT CAST((SELECT COUNT(*) FROM pairs) AS BIGINT) AS n_truth, " +
        "CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_cand, " +
        "CAST((SELECT COUNT(*) FROM pairs p JOIN cand c ON c.d1 = p.d1 AND c.d2 = p.d2) AS BIGINT) AS n_hit) " +
        "SELECT n_truth, n_cand, n_hit, " +
        "CASE WHEN n_truth = 0 THEN CAST(1000000 AS BIGINT) ELSE " +
        sqlS6("CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)") + " END AS recall6, " +
        "CASE WHEN n_truth = 0 THEN CAST(0 AS BIGINT) ELSE " +
        sqlS6("1.96 * SQRT((CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)) * " +
          "(1.0 - CAST(n_hit AS DOUBLE) / CAST(n_truth AS DOUBLE)) / CAST(n_truth AS DOUBLE))") +
        " END AS ci_hw6 FROM k"),
      (s, d) => recallOnFold(s, d, RecallFoldK)),

    // MinHash-LSH candidate generation (4 bands x 4 hashes; Broder 1997,
    // "On the resemblance and containment of documents"). Round 6: the 16
    // per-seed hashes are a Carter-Wegman family (a_i*h + b_i mod P,
    // P prime > 2^32, constants fixed at build) over ONE portable base
    // hash (Det.hash32 — md5-derived, bit-identical to DuckDB's masked
    // md5_number_upper), so the whole candidate pipeline — mins, band
    // signatures, bucket self-join — is ORACLE-GRADED, while staying
    // cheaper than the 16 crc32 calls it replaces (one md5 + 16 integer
    // ops per token row; a_i < 2^30 and h < 2^32 keep a*h+b inside the
    // signed-64 range on both engines). Reduced with 16 columnar partial
    // MINs; the 4 bands explode into rows of ONE self-join keyed
    // (lang, band, sig) — bucketed, never all-pairs.
    // (History: token×seed explode cost 4.5 s at sf0.1; a broadcast-dict
    // join + 4 separate band self-joins cost 3.0 s; this shape is the
    // minimum-shuffle form: one partial-agg shuffle + one join + distinct.)
    // Recall vs exact Jaccard stays property-tested in SketchSpec.
    Q("llm_minhash", Some(
      s"WITH $toksSql" + minhashBandsSql +
        " SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a " +
        "JOIN bands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id " +
        "ORDER BY d1, d2"),
      (s, d) => {
        val br = bandRows(s, d)
        br.select(col("doc_id").as("d1"), col("lang"), col("band"), col("sig"))
          .join(br.select(col("doc_id").as("d2"), col("lang"), col("band"), col("sig")),
            Seq("lang", "band", "sig"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2").distinct()
          .orderBy("d1", "d2")
      }),

    // The minhash ESTIMATOR itself, graded (Broder 1997: P[min_i(A) =
    // min_i(B)] = J(A,B), so the matching-component fraction is an
    // unbiased Jaccard estimate with sd sqrt(j(1-j)/16)): for every
    // banded candidate pair, count agreeing signature components and emit
    // n_match/16 on the s6 grid (exact dyadic — n/16 then ×1e6 floor is
    // bit-identical on both engines). This is the number a 100-TB dedup
    // funnel thresholds on INSTEAD of exact verification when the doc
    // bodies are too big to re-tokenize at pair time — llm_minhash grades
    // the candidates, this key grades the decision value; accuracy vs
    // exact Jaccard is property-tested in SketchSpec. Signature table is
    // sketch-sized (16 longs/doc), so both pair-side joins shuffle
    // sketches, never documents.
    Q("llm_minhash_est", Some(
      s"WITH $toksSql" + minhashBandsSql + ", " +
        "pairs AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2 FROM bands a " +
        "JOIN bands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
        "m AS (SELECT p.d1, p.d2, " +
        (0 until 16).map(i => s"(CASE WHEN x.h$i = y.h$i THEN 1 ELSE 0 END)").mkString(" + ") +
        " AS n_match FROM pairs p JOIN sigs x ON x.doc_id = p.d1 JOIN sigs y ON y.doc_id = p.d2) " +
        "SELECT d1, d2, CAST(n_match AS BIGINT) AS n_match, " +
        sqlS6("n_match / 16.0") + " AS est_j6 FROM m ORDER BY d1, d2"),
      (s, d) => {
        // one signature build feeds the band join AND both pair sides;
        // BUILD-TIME SIDE EFFECT: persisted for the three consumers —
        // harness clears the cache per key, long-lived sessions should
        // clearCache (the win_ntile note)
        val sigs = sigRows(s, d)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        val bands = bandsFromSigs(sigs)
        val pairs = bands.select(col("doc_id").as("d1"), col("lang"), col("band"), col("sig"))
          .join(bands.select(col("doc_id").as("d2"), col("lang"), col("band"), col("sig")),
            Seq("lang", "band", "sig"))
          .where(col("d1") < col("d2"))
          .select("d1", "d2").distinct()
        val x = sigs.select(col("doc_id").as("d1") +:
          (0 until 16).map(i => col(s"h$i").as(s"x$i")): _*)
        val y = sigs.select(col("doc_id").as("d2") +:
          (0 until 16).map(i => col(s"h$i").as(s"y$i")): _*)
        val nMatch = (0 until 16).map(i =>
          when(col(s"x$i") === col(s"y$i"), 1).otherwise(0)).reduce(_ + _)
        pairs.join(x, "d1").join(y, "d2")
          .withColumn("n_match", nMatch)
          .select(col("d1"), col("d2"), col("n_match").cast("long").as("n_match"),
            s6(col("n_match") / 16.0).as("est_j6"))
          .orderBy("d1", "d2")
      }),

    // Brute-force cosine top-10 vs the query vector (vec_id=0).
    // Scaled-integer accumulation (FLOOR(x*y*1e14+0.5) -> long sums): the
    // per-term double math is bit-identical in both engines and the long
    // sum is exact, order-free, and codegen'd (same pattern as
    // llm_embed_neardup; the interpreted decimal fold cost seconds).
    Q("llm_cosine_topk", Some(
      "WITH ux AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x, " +
        "UNNEST(RANGE(1, LEN(embedding) + 1)) AS i FROM embeddings), " +
        "q AS (SELECT i, x FROM ux WHERE vec_id = 0), " +
        "dots AS (SELECT u.vec_id, " +
        "CAST(SUM(CAST(FLOOR(u.x * q.x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS dotl, " +
        "CAST(SUM(CAST(FLOOR(u.x * u.x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS nal " +
        "FROM ux u JOIN q ON u.i = q.i WHERE u.vec_id <> 0 GROUP BY u.vec_id), " +
        "nb AS (SELECT CAST(SUM(CAST(FLOOR(x * x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS v FROM q), " +
        "cos AS (SELECT vec_id, (CAST(dotl AS DOUBLE) / 1e14) / " +
        "(SQRT(CAST(nal AS DOUBLE) / 1e14) * SQRT(CAST((SELECT v FROM nb) AS DOUBLE) / 1e14)) AS c " +
        "FROM dots) " +
        "SELECT vec_id, " + sqlS6("c") + " AS cos_sim FROM cos " +
        "ORDER BY c DESC, vec_id LIMIT 10"),
      (s, d) =>
        // thin instantiation of the user-facing API (round 10): the
        // codegen'd FloatVecScaledDotL ranking lives in
        // analytics.Similarity.cosineTopK — the per-element FLOOR terms
        // are the oracle's exact twins, so the unchanged oracle matches.
        graft.analytics.Similarity.cosineTopK(
            T.embeddings(s, d).where(col("vec_id") =!= 0),
            T.embeddings(s, d).where(col("vec_id") === 0),
            "embedding", "vec_id", 10)
          .select(col("vec_id"), s6(col("c")).as("cos_sim"))),

    // Per-label mean vector -> nearest-centroid assignment -> confusion
    // counts. Fully relational (posexplode layout); distances accumulate as
    // scaled integers (exact, order-free, codegen'd).
    Q("llm_knn_centroid", Some(
      "WITH ux AS (" + vecPosSql + "), " +
        "cent AS (SELECT label AS clabel, pos, " +
        "CAST(" + sqlMean6("x") + " AS DOUBLE) / 1e6 AS c FROM ux GROUP BY clabel, pos), " +
        "dist AS (SELECT u.vec_id, u.label, c.clabel, " +
        "CAST(SUM(CAST(FLOOR((u.x - c.c) * (u.x - c.c) * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS d2 " +
        "FROM ux u JOIN cent c ON u.pos = c.pos GROUP BY u.vec_id, u.label, c.clabel), " +
        "best AS (SELECT vec_id, label, clabel, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, clabel) AS rn FROM dist) " +
        "SELECT label, clabel AS assigned, CAST(COUNT(*) AS BIGINT) AS n " +
        "FROM best WHERE rn = 1 GROUP BY label, assigned ORDER BY label, assigned"),
      (s, d) => {
        // Centroids pack into one double array per label (pos-sorted), and
        // DoubleVecScaledL2 computes each (vector, centroid) distance in
        // one codegen'd loop — the posexplode layout shuffled dim× rows
        // through the distance hash-agg; this broadcasts #labels rows and
        // shuffles none. Per-element arithmetic is the oracle's exact twin.
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sl2
        val ux = vecPos(s, d)
        val cent = ux.groupBy(col("label").as("clabel"), col("pos"))
          .agg((mean6(col("x")).cast("double") / lit(1e6)).as("c"))
        val centArr = cent.groupBy("clabel")
          .agg(transform(array_sort(collect_list(struct(col("pos"), col("c")))),
            e => e.getField("c")).as("cvec"))
        val vecs = T.embeddings(s, d).select(col("vec_id"), col("label"),
          transform(col("embedding"), x => x.cast("double")).as("dvec"))
        val dist = vecs.crossJoin(broadcast(centArr))
          .select(col("vec_id"), col("label"), col("clabel"),
            sl2(col("dvec"), col("cvec")).as("d2"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("clabel"))
        dist.withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .groupBy(col("label"), col("clabel").as("assigned"))
          .agg(count(lit(1)).as("n"))
          .orderBy("label", "assigned")
      }),

    // One Lloyd iteration of k-means over the embedding corpus (round 9,
    // seventh wave) — the update step SemDeDup-style semantic dedup and
    // corpus clustering iterate (k=8 deterministic seeds = vec_ids 0..7;
    // real pipelines seed by hash or k-means‖, equally deterministic):
    // ASSIGN each vector to its nearest seed by the scaled-long L2 the
    // ANN family established (exact, order-free, codegen'd via
    // DoubleVecScaledL2 against 8 broadcast seed arrays — map-only), then
    // UPDATE every centroid coordinate as the 6-dp-grid mean of its
    // members (one (cluster, pos) partial-agg shuffle of the posexploded
    // members). Output = the full updated k×dim centroid matrix with
    // member counts — the state a driver loop would feed into round 2.
    // Ties in the assignment break by cluster id on both engines.
    Q("llm_kmeans_round", Some(
      "WITH ux AS (" + vecPosSql + "), " +
        "seeds AS (SELECT vec_id AS ck, pos, x AS c FROM ux WHERE vec_id < 8), " +
        "dist AS (SELECT u.vec_id, s.ck, " +
        "CAST(SUM(CAST(FLOOR((u.x - s.c) * (u.x - s.c) * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS d2 " +
        "FROM ux u JOIN seeds s ON u.pos = s.pos GROUP BY u.vec_id, s.ck), " +
        "asg AS (SELECT vec_id, ck FROM (SELECT vec_id, ck, " +
        "ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2, ck) AS rn FROM dist) WHERE rn = 1), " +
        "nm AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_members FROM asg GROUP BY ck), " +
        "upd AS (SELECT a.ck, u.pos, " + sqlMean6("u.x") + " AS c6 " +
        "FROM ux u JOIN asg a ON a.vec_id = u.vec_id GROUP BY a.ck, u.pos) " +
        "SELECT upd.ck AS cluster, upd.pos, upd.c6, nm.n_members " +
        "FROM upd JOIN nm ON nm.ck = upd.ck ORDER BY cluster, pos"),
      (s, d) => {
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sl2
        val seedArr = T.embeddings(s, d).where(col("vec_id") < 8)
          .select(col("vec_id").as("ck"),
            transform(col("embedding"), x => x.cast("double")).as("cvec"))
        val vecs = T.embeddings(s, d).select(col("vec_id"),
          transform(col("embedding"), x => x.cast("double")).as("dvec"))
        val w = Window.partitionBy("vec_id").orderBy(col("d2"), col("ck"))
        val asg = vecs.crossJoin(broadcast(seedArr))
          .select(col("vec_id"), col("ck"), sl2(col("dvec"), col("cvec")).as("d2"))
          .withColumn("rn", row_number().over(w))
          .where(col("rn") === 1)
          .select("vec_id", "ck")
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val nm = asg.groupBy("ck").agg(count(lit(1)).as("n_members"))
        val upd = vecPos(s, d).join(asg, "vec_id")
          .groupBy(col("ck"), col("pos"))
          .agg(mean6(col("x")).as("c6"))
        upd.join(broadcast(nm), "ck")
          .select(col("ck").as("cluster"), col("pos"), col("c6"), col("n_members"))
          .orderBy("cluster", "pos")
      }),

    // Full Lloyd k-means, K=3 rounds (round 11) — the DRIVER LOOP
    // llm_kmeans_round's single iteration promised, run to depth 3 with
    // the iterate-QUANTIZE discipline that makes an iterative float
    // solver hash-matchable (the eo_geomedian precedent): each round's
    // centroids land on the 1e-6 grid (mean6), and the NEXT round's
    // scaled-long L2 consumes exactly those quantized doubles — so
    // every round's inputs are bit-identical on both engines and the
    // unrolled MATERIALIZED-CTE oracle matches by induction. Output:
    // the round-3 centroid matrix + member counts + how many vectors
    // MOVED between rounds 2 and 3 (the convergence signal a driver
    // loop stops on). Per round: one broadcast of k×dim doubles, one
    // map-only codegen'd assignment, one (cluster, pos) partial agg —
    // the textbook distributed-Lloyd shape at any scale.
    Q("llm_kmeans_lloyd", Some {
      "WITH ux AS (" + vecPosSql + "), " +
        "seeds AS (SELECT vec_id AS ck, pos, x AS c FROM ux WHERE vec_id < 8), " +
        lloydSqlRounds + ", " +
        s"nm AS (SELECT ck, CAST(COUNT(*) AS BIGINT) AS n_members FROM asg$KmeansRounds GROUP BY ck), " +
        s"mv AS (SELECT a3.ck, CAST(SUM(CASE WHEN a3.ck <> a2.ck THEN 1 ELSE 0 END) AS BIGINT) AS n_moved " +
        s"FROM asg$KmeansRounds a3 JOIN asg${KmeansRounds - 1} a2 ON a2.vec_id = a3.vec_id GROUP BY a3.ck) " +
        s"SELECT c.ck AS cluster, c.pos, c.c6, nm.n_members, mv.n_moved " +
        s"FROM cent$KmeansRounds c JOIN nm ON nm.ck = c.ck JOIN mv ON mv.ck = c.ck " +
        "ORDER BY cluster, pos"
    },
      (s, d) => {
        val (asg, asgPrev, cent) = lloydChain(s, d)
        val nm = asg.groupBy("ck").agg(count(lit(1)).as("n_members"))
        val mv = asg
          .join(asgPrev.select(col("vec_id"), col("ck").as("ck2")), "vec_id")
          .groupBy("ck")
          .agg(sum(when(col("ck") =!= col("ck2"), 1L).otherwise(0L)).as("n_moved"))
        cent.join(broadcast(nm), "ck").join(broadcast(mv), "ck")
          .select(col("ck").as("cluster"), col("pos"), col("c6"),
            col("n_members"), col("n_moved"))
          .orderBy("cluster", "pos")
      }),

    // SemDeDup — the TRAINED-cluster composition (round 16, VERDICT r15
    // missing #2) [Abbas et al. 2023, "SemDeDup: Data-efficient learning
    // at web-scale through semantic deduplication", PK]: cluster the
    // corpus with k-means, then remove SEMANTIC duplicates within each
    // cluster by cosine threshold, keeping one representative. This is
    // the form production pretraining pipelines actually run — distinct
    // from llm_dedup_semantic (label-blocked pairs + connected
    // components + keep-highest-norm): here the blocking is the TRAINED
    // quantizer ([[lloydChain]], the llm_kmeans_lloyd rounds verbatim)
    // and the keep rule is the paper's greedy keep-lowest-id — a vector
    // is dropped iff an earlier-id member of ITS OWN cluster is within
    // the threshold (the transitive-closure variant is the components
    // machinery, already graded). Threshold at [[SemDedupTau]] (measured
    // honest lane). Graded per dropped vector: its cluster, the
    // LOWEST-id similar keeper, the exact s6 cosine to that keeper, and
    // the cluster's kept census. Scale shape: pairs are CLUSTER-BOUNDED
    // equi-joins (never all-pairs — K grows with the corpus so cluster
    // population stays bounded, the paper's sharding), assignment is the
    // broadcast-quantizer map-only pass, and the pair stage streams
    // whole embedding rows through one join on ck (the
    // llm_embed_neardup layout — dim× fewer shuffled rows than
    // posexplode).
    Q("llm_semdedup", Some {
      "WITH ux AS (" + vecPosSql + "), " +
        "seeds AS (SELECT vec_id AS ck, pos, x AS c FROM ux WHERE vec_id < 8), " +
        lloydSqlRounds + ", " +
        "norms AS (SELECT vec_id, CAST(SUM(CAST(FLOOR(x * x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS nl " +
        "FROM ux GROUP BY vec_id), " +
        s"pairs AS MATERIALIZED (SELECT ca.ck, a.vec_id AS v1, b.vec_id AS v2, " +
        "CAST(SUM(CAST(FLOOR(a.x * b.x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS dotl " +
        s"FROM ux a JOIN asg$KmeansRounds ca ON ca.vec_id = a.vec_id " +
        "JOIN ux b ON b.pos = a.pos AND a.vec_id < b.vec_id " +
        s"JOIN asg$KmeansRounds cb ON cb.vec_id = b.vec_id AND cb.ck = ca.ck " +
        "GROUP BY ca.ck, v1, v2), " +
        "cosp AS (SELECT ck, v1, v2, (CAST(dotl AS DOUBLE) / 1e14) / " +
        "(SQRT(CAST(na.nl AS DOUBLE) / 1e14) * SQRT(CAST(nb.nl AS DOUBLE) / 1e14)) AS c " +
        "FROM pairs JOIN norms na ON na.vec_id = v1 JOIN norms nb ON nb.vec_id = v2), " +
        s"sim AS (SELECT ck, v1, v2, c FROM cosp WHERE c >= $SemDedupTau), " +
        "drp AS (SELECT ck, v1, v2, c FROM (SELECT ck, v1, v2, c, " +
        "ROW_NUMBER() OVER (PARTITION BY v2 ORDER BY v1) AS rn FROM sim) WHERE rn = 1), " +
        s"nk AS (SELECT a.ck, CAST(COUNT(*) - COUNT(dd.v2) AS BIGINT) AS n_kept " +
        s"FROM asg$KmeansRounds a LEFT JOIN (SELECT DISTINCT v2 FROM sim) dd " +
        "ON dd.v2 = a.vec_id GROUP BY a.ck) " +
        "SELECT drp.v2 AS vec_id, drp.ck AS cluster, drp.v1 AS keeper, " +
        sqlS6("drp.c") + " AS cos_sim, nk.n_kept " +
        "FROM drp JOIN nk ON nk.ck = drp.ck ORDER BY vec_id"
    },
      (s, d) => {
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sdotl
        val asg = lloydChain(s, d)._1
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val withNorm = T.embeddings(s, d)
          .select(col("vec_id"), col("embedding"),
            sdotl(col("embedding"), col("embedding")).as("nl"))
          .join(asg, "vec_id")
        val a = withNorm.select(col("vec_id").as("v1"), col("ck"),
          col("embedding").as("ea"), col("nl").as("nla"))
        val b = withNorm.select(col("vec_id").as("v2"), col("ck"),
          col("embedding").as("eb"), col("nl").as("nlb"))
        val cos = (sdotl(col("ea"), col("eb")).cast("double") / lit(1e14)) /
          (sqrt(col("nla").cast("double") / lit(1e14)) *
            sqrt(col("nlb").cast("double") / lit(1e14)))
        val sim = a.join(b, Seq("ck"))
          .where(col("v1") < col("v2"))
          .withColumn("c", cos)
          .where(col("c") >= SemDedupTau)
          .select(col("ck"), col("v1"), col("v2"), col("c"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val drp = sim.withColumn("rn",
            row_number().over(Window.partitionBy("v2").orderBy("v1")))
          .where(col("rn") === 1)
        val nk = asg
          .join(sim.select(col("v2").as("vec_id")).distinct()
            .withColumn("dr", lit(1L)), Seq("vec_id"), "left")
          .groupBy("ck")
          .agg((count(lit(1)) - sum(coalesce(col("dr"), lit(0L)))).as("n_kept"))
        drp.join(broadcast(nk), "ck")
          .select(col("v2").as("vec_id"), col("ck").as("cluster"),
            col("v1").as("keeper"), s6(col("c")).as("cos_sim"), col("n_kept"))
          .orderBy("vec_id")
      }),

    // Incremental banded dedup (round 16) — the maintenance form of the
    // MinHash family, completing the upsert trilogy (llm_ann_ivf_upsert
    // grades the quantizer index, llm_ann_hnsw_upsert the graph index;
    // this grades the DEDUP index): a production pipeline dedups its
    // daily INCREMENT against the frozen banded index of the existing
    // corpus — it never re-dedups the base [PK: the add-only LSH-index
    // discipline of Lee et al. 2022-scale pipelines]. The corpus splits
    // by the upsert hash (~25% delta); the increment's band rows probe
    // the base index by ONE equi-join on (lang, band, sig) and
    // self-join for delta-internal duplicates; candidates verify with
    // the exact mask-Jaccard ≥ 0.5 predicate only (candidate-verify-
    // only, the family discipline). Graded per lang: the base/delta
    // census, the three candidate-pair counts, the exactness law
    // census_match — cand(all) == cand(base²) ∪ cand(base×delta) ∪
    // cand(delta²), constant 1 BY LAW because banding is per-doc
    // independent (the ivf_upsert precedent; an engine diverging on any
    // signature breaks it; the rebuilt lane exists only to grade the
    // equality) — and the VERIFIED duplicate counts on the cross and
    // delta lanes (the increment's actual dedup decisions). Scale
    // shape: upsert cost is the delta's signature pass + two bounded
    // equi-joins against the (memoizable) base index; no all-pairs
    // stage anywhere.
    Q("llm_dedup_upsert", Some(
      docMasksSql.trim + minhashBandsSql + ", " +
        "flags AS (SELECT doc_id, CASE WHEN " +
        sqlHash32("'upsert:' || CAST(doc_id AS VARCHAR)") +
        " % 4 = 0 THEN 1 ELSE 0 END AS is_delta FROM masks), " +
        "bb AS (SELECT b.doc_id, b.lang, b.band, b.sig FROM bands b " +
        "JOIN flags f ON f.doc_id = b.doc_id AND f.is_delta = 0), " +
        "bd AS (SELECT b.doc_id, b.lang, b.band, b.sig FROM bands b " +
        "JOIN flags f ON f.doc_id = b.doc_id AND f.is_delta = 1), " +
        "cb AS (SELECT DISTINCT a.lang, a.doc_id AS d1, b.doc_id AS d2 FROM bb a " +
        "JOIN bb b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
        "cx AS (SELECT DISTINCT a.lang, LEAST(a.doc_id, b.doc_id) AS d1, " +
        "GREATEST(a.doc_id, b.doc_id) AS d2 FROM bb a " +
        "JOIN bd b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig), " +
        "cd AS (SELECT DISTINCT a.lang, a.doc_id AS d1, b.doc_id AS d2 FROM bd a " +
        "JOIN bd b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
        "cf AS (SELECT DISTINCT a.lang, a.doc_id AS d1, b.doc_id AS d2 FROM bands a " +
        "JOIN bands b ON a.lang = b.lang AND a.band = b.band AND a.sig = b.sig AND a.doc_id < b.doc_id), " +
        "vx AS (SELECT c.lang, CAST(COUNT(*) AS BIGINT) AS n FROM cx c " +
        "JOIN masks m1 ON m1.doc_id = c.d1 JOIN masks m2 ON m2.doc_id = c.d2 " +
        "WHERE CAST(BIT_COUNT(m1.mask & m2.mask) AS DOUBLE) / " +
        "CAST(BIT_COUNT(m1.mask | m2.mask) AS DOUBLE) >= 0.5 GROUP BY c.lang), " +
        "vd AS (SELECT c.lang, CAST(COUNT(*) AS BIGINT) AS n FROM cd c " +
        "JOIN masks m1 ON m1.doc_id = c.d1 JOIN masks m2 ON m2.doc_id = c.d2 " +
        "WHERE CAST(BIT_COUNT(m1.mask & m2.mask) AS DOUBLE) / " +
        "CAST(BIT_COUNT(m1.mask | m2.mask) AS DOUBLE) >= 0.5 GROUP BY c.lang), " +
        "st AS (SELECT m.lang, CAST(SUM(1 - f.is_delta) AS BIGINT) AS n_base, " +
        "CAST(SUM(f.is_delta) AS BIGINT) AS n_delta " +
        "FROM masks m JOIN flags f ON f.doc_id = m.doc_id GROUP BY m.lang), " +
        "nb AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM cb GROUP BY lang), " +
        "nx AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM cx GROUP BY lang), " +
        "nd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM cd GROUP BY lang), " +
        "nf AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n FROM cf GROUP BY lang) " +
        "SELECT st.lang, st.n_base, st.n_delta, " +
        "COALESCE(nb.n, 0) AS n_cand_base, COALESCE(nx.n, 0) AS n_cand_cross, " +
        "COALESCE(nd.n, 0) AS n_cand_delta, " +
        "CAST(CASE WHEN COALESCE(nf.n, 0) = COALESCE(nb.n, 0) + COALESCE(nx.n, 0) + COALESCE(nd.n, 0) " +
        "THEN 1 ELSE 0 END AS BIGINT) AS census_match, " +
        "COALESCE(vx.n, 0) AS n_dup_cross, COALESCE(vd.n, 0) AS n_dup_delta " +
        "FROM st LEFT JOIN nb ON nb.lang = st.lang LEFT JOIN nx ON nx.lang = st.lang " +
        "LEFT JOIN nd ON nd.lang = st.lang LEFT JOIN nf ON nf.lang = st.lang " +
        "LEFT JOIN vx ON vx.lang = st.lang LEFT JOIN vd ON vd.lang = st.lang " +
        "ORDER BY st.lang"),
      (s, d) => {
        // masks + band rows share one persisted corpus explode (round 17)
        val (masks, toks) = docMasksWithToks(s, d)
        val bands = bandRowsFromToks(toks)
        val isDelta = when(hash32(concat(lit("upsert:"),
          col("doc_id").cast("string"))) % 4 === 0, 1L).otherwise(0L)
        val flags = masks.select(col("doc_id"), isDelta.as("is_delta"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        def side(deltaFlag: Long): DataFrame = bands
          .join(flags.where(col("is_delta") === deltaFlag).select("doc_id"), "doc_id")
          .select("doc_id", "lang", "band", "sig")
        val bb = side(0L).transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val bd = side(1L).transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        def cand(a: DataFrame, b: DataFrame): DataFrame =
          a.select(col("doc_id").as("da"), col("lang"), col("band"), col("sig"))
            .join(b.select(col("doc_id").as("db"), col("lang"), col("band"), col("sig")),
              Seq("lang", "band", "sig"))
        val cb = cand(bb, bb).where(col("da") < col("db"))
          .select(col("lang"), col("da").as("d1"), col("db").as("d2")).distinct()
        val cx = cand(bb, bd)
          .select(col("lang"), least(col("da"), col("db")).as("d1"),
            greatest(col("da"), col("db")).as("d2")).distinct()
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val cd = cand(bd, bd).where(col("da") < col("db"))
          .select(col("lang"), col("da").as("d1"), col("db").as("d2")).distinct()
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val cf = cand(bands, bands).where(col("da") < col("db"))
          .select(col("lang"), col("da").as("d1"), col("db").as("d2")).distinct()
        def verified(c: DataFrame): DataFrame = {
          val inter = bit_count(col("ma").bitwiseAND(col("mb"))).cast("double")
          val uni = bit_count(col("ma").bitwiseOR(col("mb"))).cast("double")
          c.join(masks.select(col("doc_id").as("d1"), col("mask").as("ma")), "d1")
            .join(masks.select(col("doc_id").as("d2"), col("mask").as("mb")), "d2")
            .where(inter / uni >= 0.5)
            .groupBy("lang").agg(count(lit(1)).as("n"))
        }
        def counted(c: DataFrame): DataFrame =
          c.groupBy("lang").agg(count(lit(1)).as("n"))
        val st = masks.join(flags, "doc_id")
          .groupBy("lang")
          .agg(sum(lit(1L) - col("is_delta")).as("n_base"),
            sum(col("is_delta")).as("n_delta"))
        st
          .join(broadcast(counted(cb).withColumnRenamed("n", "nb")), Seq("lang"), "left")
          .join(broadcast(counted(cx).withColumnRenamed("n", "nx")), Seq("lang"), "left")
          .join(broadcast(counted(cd).withColumnRenamed("n", "nd")), Seq("lang"), "left")
          .join(broadcast(counted(cf).withColumnRenamed("n", "nf")), Seq("lang"), "left")
          .join(broadcast(verified(cx).withColumnRenamed("n", "vx")), Seq("lang"), "left")
          .join(broadcast(verified(cd).withColumnRenamed("n", "vd")), Seq("lang"), "left")
          .select(col("lang"), col("n_base"), col("n_delta"),
            coalesce(col("nb"), lit(0L)).as("n_cand_base"),
            coalesce(col("nx"), lit(0L)).as("n_cand_cross"),
            coalesce(col("nd"), lit(0L)).as("n_cand_delta"),
            when(coalesce(col("nf"), lit(0L)) ===
              coalesce(col("nb"), lit(0L)) + coalesce(col("nx"), lit(0L)) +
                coalesce(col("nd"), lit(0L)), 1L).otherwise(0L).as("census_match"),
            coalesce(col("vx"), lit(0L)).as("n_dup_cross"),
            coalesce(col("vd"), lit(0L)).as("n_dup_delta"))
          .orderBy("lang")
      }),

    Q("llm_text_stats", Some(
      "SELECT lang, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_docs, " +
        "CAST(COUNT(*) AS BIGINT) AS n_tokens, " +
        sqlMean6("CAST(LENGTH(tok) AS DOUBLE)") + " AS avg_tok_len, " +
        sqlS6("CAST(COUNT(DISTINCT tok) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)") + " AS distinct_ratio " +
        "FROM (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents) " +
        "GROUP BY lang ORDER BY lang"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
          .groupBy("lang")
          .agg(
            countDistinct(col("doc_id")).as("n_docs"),
            count(lit(1)).as("n_tokens"),
            mean6(length(col("tok")).cast("double")).as("avg_tok_len"),
            s6(countDistinct(col("tok")).cast("double") / count(lit(1)).cast("double"))
              .as("distinct_ratio"))
          .orderBy("lang")),

    // tf-idf: tf per (lang, term), df per term over docs, idf = ln((N+1)/(df+1))
    // via the round-10 portable lnRatio (no libm);
    // top-5 terms per lang ranked on the raw score, ties broken by term.
    Q("llm_tfidf_top", Some(
      "WITH toks AS (SELECT doc_id, lang, UNNEST(STRING_SPLIT(text, ' ')) AS tok FROM documents), " +
        "n AS (SELECT CAST(COUNT(*) AS BIGINT) + 1 AS ndp FROM documents), " +
        "tf AS (SELECT lang, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM toks GROUP BY lang, tok), " +
        "df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM toks GROUP BY tok), " +
        "df2 AS (SELECT tok, df + 1 AS dfp FROM df), " +
        "scored AS (SELECT lang, tok, tf, " +
        "CAST(tf AS DOUBLE) * " +
        sqlLnRatio("(SELECT ndp FROM n)", "dfp") +
        " AS score FROM tf JOIN df2 USING (tok)), " +
        "ranked AS (SELECT lang, tok, score, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY score DESC, tok) AS rn FROM scored) " +
        "SELECT lang, tok, " + sqlS6("score") + " AS tfidf, CAST(rn AS INT) AS rn " +
        "FROM ranked WHERE rn <= 5 ORDER BY lang, rn"),
      (s, d) => {
        val toks = T.documents(s, d)
          .select(col("doc_id"), col("lang"), explode(split(col("text"), " ")).as("tok"))
        // N as a lazy broadcast scalar — no driver-side count() at plan
        // construction (SCALING.md principle 3)
        val nDocs = T.documents(s, d).agg((count(lit(1)) + 1).as("ndp"))
        // tf and df each map-side partial-aggregate the exploded stream
        // before their single shuffle (a shared (doc,lang,tok) pre-agg was
        // tried and measured WORSE: column pruning makes the two subtrees
        // non-identical so ReusedExchange never fires, and it just adds an
        // exchange per branch)
        val tf = toks.groupBy("lang", "tok").agg(count(lit(1)).as("tf"))
        val df = toks.groupBy("tok").agg(countDistinct(col("doc_id")).as("df"))
        val scored = tf.join(broadcast(df), "tok")
          .crossJoin(broadcast(nDocs))
          .withColumn("score",
            col("tf").cast("double") * lnRatio(col("ndp"), col("df") + 1))
        val w = Window.partitionBy("lang").orderBy(col("score").desc, col("tok"))
        scored.withColumn("rn", row_number().over(w))
          .where(col("rn") <= 5)
          .select(col("lang"), col("tok"), s6(col("score")).as("tfidf"), col("rn"))
          .orderBy("lang", "rn")
      }),

    // Word bigrams per lang (token zipped with its successor).
    Q("llm_ngram", Some(
      "SELECT lang, bigram, CAST(COUNT(*) AS BIGINT) AS cnt FROM (" +
        "SELECT lang, UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)), i -> toks[i] || ' ' || toks[i+1])) AS bigram " +
        "FROM (SELECT lang, STRING_SPLIT(text, ' ') AS toks FROM documents) WHERE LEN(toks) >= 2) " +
        "GROUP BY lang, bigram ORDER BY lang, bigram"),
      (s, d) =>
        TextOps.bigrams(T.documents(s, d), "lang")
          .groupBy("lang", "bigram")
          .agg(count(lit(1)).as("cnt"))
          .orderBy("lang", "bigram")),

    // Maximal Marginal Relevance selection (round 10) — the
    // diversity-aware top-k every RAG retriever and data-selection
    // pipeline runs after similarity search [Carbonell & Goldstein
    // 1998]: greedily pick K=5 documents maximizing
    // λ·rel(i) − (1−λ)·max_{j∈S} sim(i,j), λ = 0.7 — relevance to the
    // query (vec_id 0) traded against redundancy with what's already
    // selected. Scale shape: relevance is llm_cosine_topk's map-only
    // scaled-long cosine pass, the candidate POOL is its top-50 (the
    // ANN-then-rerank contract — MMR never sees the corpus), and the
    // O(pool²) pairwise sim matrix + the K greedy rounds run over
    // ≤50-row broadcast tables. Cosines are the established exact
    // machinery (FloorScaledDot terms = the oracle's per-element twins,
    // √/÷ one shared IEEE sequence), the greedy argmax rides
    // (score DESC, vec_id) on bit-identical doubles, and the oracle
    // unrolls the SAME 5 rounds as CTE layers. rel6/score6 are the
    // s6-floored graded surfaces; pick 1's redundancy term is 0 by
    // definition on both engines.
    Q("llm_mmr_select", Some {
      val rounds = (2 to 5).map { k =>
        val prev = s"sel${k - 1}"
        s"sc$k AS (SELECT p.vec_id, p.r, MAX(ps.s) AS ms FROM pool p " +
          s"JOIN psim ps ON ps.i = p.vec_id JOIN $prev sl ON ps.j = sl.vec_id " +
          s"WHERE p.vec_id NOT IN (SELECT vec_id FROM $prev) GROUP BY p.vec_id, p.r), " +
          s"s$k AS (SELECT vec_id, r, ms FROM (SELECT vec_id, r, ms, " +
          s"ROW_NUMBER() OVER (ORDER BY 0.7 * r - 0.3 * ms DESC, vec_id) AS rn FROM sc$k) z$k " +
          "WHERE rn = 1), " +
          s"sel$k AS (SELECT vec_id FROM $prev UNION ALL SELECT vec_id FROM s$k)"
      }.mkString(", ")
      "WITH ux AS (SELECT vec_id, CAST(UNNEST(embedding) AS DOUBLE) AS x, " +
        "UNNEST(RANGE(1, LEN(embedding) + 1)) AS i FROM embeddings), " +
        "nrm AS (SELECT vec_id, " +
        "CAST(SUM(CAST(FLOOR(x * x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS nl " +
        "FROM ux GROUP BY vec_id), " +
        "q AS (SELECT i, x FROM ux WHERE vec_id = 0), " +
        "dots AS (SELECT u.vec_id, " +
        "CAST(SUM(CAST(FLOOR(u.x * q.x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS dotl " +
        "FROM ux u JOIN q ON u.i = q.i WHERE u.vec_id <> 0 GROUP BY u.vec_id), " +
        "relc AS (SELECT d.vec_id, (CAST(d.dotl AS DOUBLE) / 1e14) / " +
        "(SQRT(CAST(n.nl AS DOUBLE) / 1e14) * " +
        "SQRT(CAST((SELECT nl FROM nrm WHERE vec_id = 0) AS DOUBLE) / 1e14)) AS r " +
        "FROM dots d JOIN nrm n ON n.vec_id = d.vec_id), " +
        "pool AS (SELECT vec_id, r FROM (SELECT vec_id, r, " +
        "ROW_NUMBER() OVER (ORDER BY r DESC, vec_id) AS rn FROM relc) pr WHERE rn <= 50), " +
        "pd AS (SELECT a.vec_id AS i, b.vec_id AS j, " +
        "CAST(SUM(CAST(FLOOR(a.x * b.x * 1e14 + 0.5) AS BIGINT)) AS BIGINT) AS dl " +
        "FROM ux a JOIN ux b ON a.i = b.i " +
        "JOIN pool pa ON pa.vec_id = a.vec_id JOIN pool pb ON pb.vec_id = b.vec_id " +
        "WHERE a.vec_id <> b.vec_id GROUP BY a.vec_id, b.vec_id), " +
        "psim AS (SELECT pd.i, pd.j, (CAST(pd.dl AS DOUBLE) / 1e14) / " +
        "(SQRT(CAST(na.nl AS DOUBLE) / 1e14) * SQRT(CAST(nb.nl AS DOUBLE) / 1e14)) AS s " +
        "FROM pd JOIN nrm na ON na.vec_id = pd.i JOIN nrm nb ON nb.vec_id = pd.j), " +
        "s1 AS (SELECT vec_id, r, CAST(0.0 AS DOUBLE) AS ms FROM (SELECT vec_id, r, " +
        "ROW_NUMBER() OVER (ORDER BY r DESC, vec_id) AS rn FROM pool) p1 WHERE rn = 1), " +
        "sel1 AS (SELECT vec_id FROM s1), " + rounds + " " +
        (1 to 5).map(k => s"SELECT $k AS pick, vec_id, " +
          Det.sqlS6("r") + " AS rel6, " +
          Det.sqlS6("0.7 * r - 0.3 * ms") + s" AS score6 FROM s$k")
          .mkString("", " UNION ALL ", " ORDER BY pick")
    },
      (s, d) => {
        graft.functions.VectorExprs.register(s)
        import graft.functions.VectorExprs.sdotl
        def cosOf(a: Column, b: Column): Column =
          (sdotl(a, b).cast("double") / lit(1e14)) /
            (sqrt(sdotl(a, a).cast("double") / lit(1e14)) *
              sqrt(sdotl(b, b).cast("double") / lit(1e14)))
        val emb = T.embeddings(s, d).select(col("vec_id"), col("embedding"))
        val q = emb.where(col("vec_id") === 0).select(col("embedding").as("qe"))
        val pool = emb.where(col("vec_id") =!= 0)
          .crossJoin(broadcast(q))
          .select(col("vec_id"), col("embedding"), cosOf(col("embedding"), col("qe")).as("r"))
          .orderBy(col("r").desc, col("vec_id")).limit(50)
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        val psim = pool.select(col("vec_id").as("i"), col("embedding").as("ei"))
          .join(broadcast(pool.select(col("vec_id").as("j"), col("embedding").as("ej"))),
            col("i") =!= col("j"))
          .select(col("i"), col("j"), cosOf(col("ei"), col("ej")).as("s"))
          .transform(Cached(_)) // multi-consumer cache; lifecycle: Cached scaladoc
        var sel = pool.orderBy(col("r").desc, col("vec_id")).limit(1)
          .select(lit(1).as("pick"), col("vec_id"), col("r"),
            lit(0.0).cast("double").as("ms"))
        for (k <- 2 to 5) {
          val ms = psim
            .join(broadcast(sel.select(col("vec_id").as("j"))), "j")
            .groupBy(col("i")).agg(max(col("s")).as("ms"))
          val pick = pool
            .join(broadcast(sel.select(col("vec_id"))), Seq("vec_id"), "left_anti")
            .join(ms, col("vec_id") === col("i"))
            .orderBy((lit(0.7) * col("r") - lit(0.3) * col("ms")).desc, col("vec_id"))
            .limit(1)
            .select(lit(k).as("pick"), col("vec_id"), col("r"), col("ms"))
          sel = sel.unionAll(pick).localCheckpoint()
        }
        sel.select(col("pick"), col("vec_id"), s6(col("r")).as("rel6"),
          s6(lit(0.7) * col("r") - lit(0.3) * col("ms")).as("score6"))
          .orderBy("pick")
      }))
}
