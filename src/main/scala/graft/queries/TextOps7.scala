package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables.t
import graft.classify.TextClassify
import graft.curation.Sampling

/** Seventh batch: decision-closing operators — the multi-signal
  * quality gate with per-signal attribution (scoring → selection with
  * a "why was this doc dropped" reasons bitmap) and embedding-cluster
  * balanced sampling (topic balance, the embedding-space twin of
  * source mixing).
  *
  * Reproducibility contracts: every threshold comparison runs over
  * engine-exact values (decimal-pinned log terms cast to double,
  * integer cross-multiplication, rounded cosines), so the keep/drop
  * bits — the actual product of these operators — are deterministic
  * across engines.
  */
object TextOps7 {

  private def q(name: String)(fn: (SparkSession, String) => DataFrame,
                              sql: String): (String, ((SparkSession, String) => DataFrame, String)) =
    name -> ((fn, sql))

  private val cosineSqlBody =
    """list_sum(list_transform(generate_series(1, len(@B@)), i -> CAST(@A@[i] AS DOUBLE) * CAST(@B@[i] AS DOUBLE)))
      | / (sqrt(list_sum(list_transform(@A@, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))
      |   * sqrt(list_sum(list_transform(@B@, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))))""".stripMargin

  private def cosineSql(a: String, b: String): String =
    s"round(${cosineSqlBody.replace("@A@", a).replace("@B@", b)}, 6)"

  private val defs: Seq[(String, ((SparkSession, String) => DataFrame, String))] = Seq(

    // Multi-signal quality gate: entropy + repetition + language +
    // reference-LM bigram likelihood combine into one weighted keep
    // decision with a per-signal reasons bitmap — the funnel's final
    // verdict WITH attribution. Thresholds sit inside the sf corpus's
    // signal distributions so every branch fires. See
    // [[graft.classify.TextClassify.qualityGateMulti]] for the
    // weights/bitmap contract.
    q("q_quality_gate_multi")(
      (s, d) => {
        val docs = t(s, d, "documents")
        TextClassify.qualityGateMulti(docs, docs.filter(col("lang") === "en"),
            minEntropy = 2.75, maxRepPct = 66, minAvgLl = -3.5)
          .orderBy(col("doc_id"))
      },
      """WITH ch AS (SELECT doc_id, unnest(string_split_regex(text, '')) AS c
        |  FROM documents),
        |pc AS (SELECT doc_id, c, CAST(COUNT(*) AS BIGINT) AS n_c
        |  FROM ch WHERE c <> '' GROUP BY 1, 2),
        |eagg AS (SELECT doc_id, CAST(SUM(n_c) AS BIGINT) AS len,
        |  CAST(SUM(CAST(n_c AS DECIMAL(10,0)) *
        |    CAST(round(ln(n_c), 9) AS DECIMAL(18,9))) AS DECIMAL(28,9)) AS ent_num
        |  FROM pc GROUP BY 1),
        |ent AS (SELECT doc_id,
        |  CAST(CAST(round(ln(len), 9) AS DECIMAL(18,9)) * CAST(len AS DECIMAL(10,0))
        |    - ent_num AS DOUBLE) / len AS entropy
        |  FROM eagg),
        |rep AS (SELECT doc_id,
        |  CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens,
        |  CAST(len(list_distinct(string_split_regex(trim(text), '\s+'))) AS BIGINT) AS n_distinct,
        |  CASE WHEN len(regexp_extract_all(lower(text), '\b(the|a|and|of|to|in|is)\b'))
        |    >= len(regexp_extract_all(lower(text), '\b(el|la|de|los|y|en|que)\b'))
        |  THEN 'en' ELSE 'es' END AS lang_pred
        |  FROM documents),
        |toks AS (SELECT doc_id, lang, string_split_regex(trim(text), '\s+') AS tk
        |  FROM documents WHERE trim(text) <> ''),
        |bi AS (SELECT doc_id, lang,
        |  unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i])) AS w1,
        |  unnest(list_transform(generate_series(1, len(tk) - 1), i -> tk[i+1])) AS w2
        |  FROM toks WHERE len(tk) >= 2),
        |c12 AS (SELECT w1, w2, COUNT(*) AS c12 FROM bi WHERE lang = 'en' GROUP BY 1, 2),
        |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi WHERE lang = 'en' GROUP BY 1),
        |vsz AS (SELECT COUNT(DISTINCT tok) AS v FROM (
        |  SELECT unnest(tk) AS tok FROM toks WHERE lang = 'en')),
        |terms AS (SELECT bi.doc_id,
        |  CAST(round(ln(CAST(coalesce(c12.c12, 0) + 1 AS DOUBLE)
        |    / (coalesce(c1.c1, 0) + vsz.v)), 9) AS DECIMAL(18,9)) AS term
        |  FROM bi CROSS JOIN vsz
        |  LEFT JOIN c12 ON c12.w1 = bi.w1 AND c12.w2 = bi.w2
        |  LEFT JOIN c1 ON c1.w1 = bi.w1),
        |ppl AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
        |  CAST(SUM(term) AS DOUBLE) AS ll FROM terms GROUP BY 1),
        |f AS (SELECT ent.doc_id, ent.entropy, rep.n_tokens, rep.n_distinct,
        |  rep.lang_pred, ppl.n_bigrams, ppl.ll,
        |  (ent.entropy < CAST(2.75 AS DOUBLE)) AS f_ent,
        |  ((rep.n_tokens - rep.n_distinct) * 100 > 66 * rep.n_tokens) AS f_rep,
        |  (rep.lang_pred <> 'en') AS f_lang,
        |  coalesce(ppl.ll < CAST(-3.5 AS DOUBLE) * ppl.n_bigrams, FALSE) AS f_ppl
        |  FROM ent JOIN rep USING (doc_id) LEFT JOIN ppl USING (doc_id)),
        |sc AS (SELECT *,
        |  CAST(CASE WHEN f_ent THEN 1 ELSE 0 END + CASE WHEN f_rep THEN 2 ELSE 0 END
        |    + CASE WHEN f_lang THEN 4 ELSE 0 END
        |    + CASE WHEN f_ppl THEN 8 ELSE 0 END AS BIGINT) AS reasons,
        |  CAST(CASE WHEN f_ent THEN 4 ELSE 0 END + CASE WHEN f_rep THEN 2 ELSE 0 END
        |    + CASE WHEN f_lang THEN 1 ELSE 0 END
        |    + CASE WHEN f_ppl THEN 3 ELSE 0 END AS BIGINT) AS fail_score
        |  FROM f)
        |SELECT doc_id, entropy, n_tokens, n_distinct, lang_pred, n_bigrams, ll,
        |  reasons, fail_score, (fail_score < 4) AS keep
        |FROM sc ORDER BY doc_id""".stripMargin),

    // Embedding-cluster balanced sampling: nearest-centroid assignment
    // (8 fixed probe centroids, broadcast), exact water-fill of a 75%
    // budget across the cluster-count frame, lowest-id-first admission
    // within each cluster. See
    // [[graft.curation.Sampling.clusterBalance]].
    q("q_cluster_balance")(
      (s, d) => {
        import s.implicits._
        val e = t(s, d, "embeddings")
        Sampling.clusterBalance(e, e.filter($"vec_id" < 8),
            "vec_id", "embedding", num = 3, den = 4)
          .select($"id".as("vec_id"), $"centroid_id", $"sim", $"rank",
            $"alloc", $"keep")
          .orderBy($"vec_id")
      },
      s"""WITH z AS (SELECT vec_id AS centroid_id, embedding AS cv
        |  FROM embeddings WHERE vec_id < 8),
        |scored AS (SELECT e.vec_id AS id, z.centroid_id,
        |  ${cosineSql("e.embedding", "z.cv")} AS sim FROM embeddings e, z),
        |assigned AS (SELECT id, centroid_id, sim FROM (
        |  SELECT id, centroid_id, sim,
        |    row_number() OVER (PARTITION BY id ORDER BY sim DESC, centroid_id) AS rn
        |  FROM scored) WHERE rn = 1),
        |c AS (SELECT centroid_id, CAST(COUNT(*) AS BIGINT) AS n
        |  FROM assigned GROUP BY 1),
        |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total, CAST(COUNT(*) AS BIGINT) AS s,
        |  CAST(SUM(n) * 3 // 4 AS BIGINT) AS b FROM c),
        |r AS (SELECT centroid_id, n,
        |  CAST(row_number() OVER (ORDER BY n, centroid_id) AS BIGINT) AS k,
        |  CAST(SUM(n) OVER (ORDER BY n, centroid_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
        |  FROM c),
        |pv AS (SELECT MIN(k) AS kstar, MIN(cum - n) AS prefix, MIN(cnt) AS cnt FROM (
        |  SELECT r.k, r.cum, r.n, tot.s - r.k + 1 AS cnt FROM r, tot
        |  WHERE r.cum + (tot.s - r.k) * r.n >= tot.b ORDER BY r.k LIMIT 1)),
        |j AS (SELECT r.centroid_id, r.n, r.k, pv.kstar, pv.cnt,
        |  tot.b - pv.prefix AS d FROM r, tot, pv),
        |unc AS (SELECT centroid_id, (d - (d % cnt)) // cnt + CASE WHEN
        |    row_number() OVER (ORDER BY centroid_id) <= d % cnt THEN 1 ELSE 0 END AS alloc
        |  FROM j WHERE k >= kstar),
        |cap AS (SELECT centroid_id, n AS alloc FROM j WHERE kstar IS NULL OR k < kstar),
        |al AS (SELECT centroid_id, CAST(alloc AS BIGINT) AS alloc FROM
        |  (SELECT * FROM cap UNION ALL SELECT * FROM unc)),
        |rk AS (SELECT id, centroid_id, sim,
        |  CAST(row_number() OVER (PARTITION BY centroid_id ORDER BY id) AS BIGINT) AS rank
        |  FROM assigned)
        |SELECT rk.id AS vec_id, rk.centroid_id, rk.sim, rk.rank, al.alloc,
        |  (rk.rank <= al.alloc) AS keep
        |FROM rk JOIN al USING (centroid_id)
        |ORDER BY vec_id""".stripMargin))

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    defs.map { case (n, (fn, _)) => n -> fn }.toMap

  def oracles: Map[String, String] =
    defs.map { case (n, (_, sql)) => n -> sql }.toMap
}
