package graft

/** Independent driver-side mirror of the llm_bpe_apply training loop
  * (the Round*OpsSpec discipline: never the oracle's arithmetic path).
  * The mirror works on SYMBOL LISTS with an explicit greedy
  * left-to-right merge — no ␟-wrapped strings, no REPLACE — so it
  * re-derives the semantics the string encoding is claimed to
  * implement: if the wrap trick ever matched a partial symbol or
  * mis-ordered a tie, the two paths would disagree.
  */
class LlmBpeSpec extends SparkSpec {

  private val Sep = "\u001f"

  test("llm_bpe_apply equals a symbol-list Scala mirror (merge table + final encoding)") {
    val k = 6
    val got = operators.LlmExtras.bpeApply(spark, sfDir, k).collect()
      .map(r => (r.getString(0), r.getLong(1)) ->
        ((r.getString(2), r.getLong(3), r.getLong(4)))).toMap

    // vocabulary with frequencies, straight from parquet
    val vocab0: Map[String, Map[List[String], Long]] =
      Tables.documents(spark, sfDir).select("lang", "text").collect()
        .flatMap(r => r.getString(1).split(" ").map(t => (r.getString(0), t)))
        .groupBy(_._1)
        .map { case (lang, ts) =>
          lang -> ts.groupBy(_._2).map { case (t, xs) =>
            t.split("").toList -> xs.length.toLong
          }
        }

    def greedyMerge(syms: List[String], a: String, b: String): List[String] = {
      val out = List.newBuilder[String]
      var rest = syms
      while (rest.nonEmpty) rest match {
        case x :: y :: tail if x == a && y == b =>
          out += (a + b); rest = tail
        case x :: tail => out += x; rest = tail
        case Nil => ()
      }
      out.result()
    }

    val expect = collection.mutable.Map.empty[(String, Long), (String, Long, Long)]
    val finalVocab = vocab0.map { case (lang, v0) =>
      var v = v0
      (1 to k).foreach { r =>
        val counts = collection.mutable.Map.empty[(String, String), Long]
        v.foreach { case (syms, freq) =>
          syms.zip(syms.drop(1)).foreach(p =>
            counts(p) = counts.getOrElse(p, 0L) + freq)
        }
        if (counts.nonEmpty) {
          // tie rule: highest count, then lexicographically smallest
          // WRAPPED pair string (the key's ORDER BY n DESC, pair)
          val ((a, b), n) = counts.minBy { case ((a1, b1), n1) =>
            (-n1, Sep + a1 + Sep + Sep + b1 + Sep)
          }
          expect((lang, r.toLong)) = (a + b, n, 0L)
          v = v.toSeq.map { case (syms, freq) =>
            greedyMerge(syms, a, b) -> freq
          }.groupBy(_._1).map { case (sy, xs) => sy -> xs.map(_._2).sum }
        }
      }
      lang -> v
    }
    val finals = finalVocab.map { case (lang, v) =>
      lang -> v.map { case (syms, freq) => syms.length * freq }.sum
    }
    val expectFull = expect.map { case ((lang, r), (m, n, _)) =>
      (lang, r) -> ((m, n, finals(lang)))
    }.toMap
    assert(got.nonEmpty && got.keySet == expectFull.keySet, "merge-table keys")
    got.foreach { case (key2, v) =>
      assert(v == expectFull(key2), s"$key2: got $v expected ${expectFull(key2)}")
    }
    // the merges actually compress: final encoding is shorter than chars
    val chars0 = vocab0.map { case (lang, v) =>
      lang -> v.map { case (s, f) => s.length * f }.sum
    }
    finals.foreach { case (lang, n) =>
      assert(n < chars0(lang), s"$lang: BPE did not compress")
    }
  }
}
