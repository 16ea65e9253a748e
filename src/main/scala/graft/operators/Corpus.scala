package graft.operators

import org.apache.spark.sql.functions._

import graft.{Det, Q, Tables => T}
import Det._

/** Corpus-assembly operators for the training-data funnel (the step AFTER
  * dedup/quality): reproducible stratified sampling and mixture-weight
  * accounting. Both are map-only or single-shuffle linear plans.
  *
  * Sampling is HASH-GATED, not RNG-driven — the standard corpus-pipeline
  * discipline: keep(doc) = hash(doc_id, lang) mod 1000 < rate(lang). The
  * decision is a pure function of the row, so re-runs, incremental runs,
  * and per-partition re-shuffles keep every decision stable (a seeded
  * `rand()` is partition-order-dependent in Spark and irreproducible
  * across engines), and the filter pushes to the scan — at 100 TB the
  * sample is a map-only pass with NO shuffle. Portable across engines via
  * [[Det.hash32]] (md5-derived; DuckDB twin = masked md5_number_upper).
  */
object Corpus {

  val all: Seq[Q] = Seq(

    // Reproducible per-lang stratified sample: each lang gets a
    // deterministic keep-rate (permille in [100, 900), itself derived
    // from the lang name so the oracle needs no rate table), and each
    // doc's keep decision is the hash gate above. Output = the sampled
    // rows themselves (content-graded), not just counts.
    Q("llm_sample_stratified", Some(
      "WITH p AS (SELECT doc_id, lang, " +
        "CAST(100 + " + sqlHash32("lang") + " % 800 AS BIGINT) AS permille " +
        "FROM documents) " +
        "SELECT doc_id, lang, permille FROM p " +
        "WHERE " + sqlHash32("CAST(doc_id AS VARCHAR) || ':' || lang") + " % 1000 < permille " +
        "ORDER BY doc_id"),
      (s, d) =>
        T.documents(s, d)
          .select(col("doc_id"), col("lang"),
            (lit(100L) + Det.hash32(col("lang")) % 800).as("permille"))
          .where(Det.hash32(concat(col("doc_id").cast("string"), lit(":"), col("lang")))
            % 1000 < col("permille"))
          .orderBy("doc_id")),

    // Mixture-weight accounting per (source, lang): doc/token counts and
    // the two shares a mixture designer needs — share of the whole corpus
    // and share within the lang (the upsampling denominator). Exact
    // integer token sums; each share is ONE IEEE division of exact longs
    // on the s6 grid (Det rule 3). Linear: one partial-agg shuffle, the
    // lang totals re-aggregate from the 100-group result, total is a
    // broadcast scalar.
    Q("llm_mix_weights", Some(
      "WITH t AS (SELECT source, lang, LEN(STRING_SPLIT(text, ' ')) AS ntok FROM documents), " +
        "g AS (SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n_docs, " +
        "CAST(SUM(ntok) AS BIGINT) AS n_tokens FROM t GROUP BY source, lang), " +
        "lt AS (SELECT lang, CAST(SUM(n_tokens) AS BIGINT) AS lang_tokens FROM g GROUP BY lang), " +
        "tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM g) " +
        "SELECT g.source, g.lang, g.n_docs, g.n_tokens, " +
        sqlS6("CAST(g.n_tokens AS DOUBLE) / CAST(tot.total AS DOUBLE)") + " AS corpus_share6, " +
        sqlS6("CAST(g.n_tokens AS DOUBLE) / CAST(lt.lang_tokens AS DOUBLE)") + " AS lang_share6 " +
        "FROM g JOIN lt USING (lang) CROSS JOIN tot ORDER BY g.source, g.lang"),
      (s, d) => {
        val t = T.documents(s, d).select(col("source"), col("lang"),
          size(split(col("text"), " ")).cast("long").as("ntok"))
        val g = t.groupBy("source", "lang")
          .agg(count(lit(1)).as("n_docs"), sum(col("ntok")).as("n_tokens"))
        val lt = g.groupBy("lang").agg(sum(col("n_tokens")).as("lang_tokens"))
        val tot = g.agg(sum(col("n_tokens")).as("total"))
        g.join(broadcast(lt), "lang")
          .crossJoin(broadcast(tot))
          .select(col("source"), col("lang"), col("n_docs"), col("n_tokens"),
            s6(col("n_tokens").cast("double") / col("total").cast("double")).as("corpus_share6"),
            s6(col("n_tokens").cast("double") / col("lang_tokens").cast("double")).as("lang_share6"))
          .orderBy("source", "lang")
      }))
}
