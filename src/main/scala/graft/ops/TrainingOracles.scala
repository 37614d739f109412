package graft.ops

import CrossHash._

/** DuckDB-dialect oracle SQL for the training-data ops, generated from
  * the same constants ([[CrossHash.MinhashPerms]], moduli, plane
  * formula) as the Spark implementations — one source of truth, so the
  * two sides cannot drift.
  */
object TrainingOracles {

  private val toks = ddbTokensArray("text")

  private def dot(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))), " +
      s"(acc, v) -> acc + v)"

  private def cos(a: String, b: String): String =
    s"${dot(a, b)} / (sqrt(${dot(a, a)}) * sqrt(${dot(b, b)}))"

  /** Dynamic-k FLAT argmax cell assignment over `src` (a relation with
    * vec_id + embedding) — CTE chain ending in
    * `cells(vec_id, embedding, cell)`. Mirrors
    * [[Similarity.semDedupCells]]: seeds are vec_id < k, k = n/128
    * clamped at [[Similarity.IvfCentroids]]. */
  private def flatCellCtes(src: String): String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cvec FROM $src
              WHERE vec_id < (SELECT greatest(${Similarity.IvfCentroids},
                CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT))
                FROM $src)),
       a AS (SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
             FROM $src e CROSS JOIN c),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1)"""

  /** Dynamic-k COARSE (two-level) cell assignment over `src` — argmax
    * over every-B-th seed (block leaders), then within the winning
    * ⌈√k⌉-wide seed block; ends in `cells(vec_id, embedding, cell)`.
    * Mirrors [[Similarity.assignCellsCoarse]] exactly (both levels
    * (cos desc, cid asc)). */
  private def coarseCellCtes(src: String): String =
    s"""kk AS (SELECT greatest(${Similarity.IvfCentroids},
              CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT)) AS k,
              CAST(ceil(sqrt(greatest(${Similarity.IvfCentroids},
                CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT)))) AS BIGINT) AS b
            FROM $src),
       s AS (SELECT vec_id AS cid, embedding AS cvec, vec_id // b AS blk
             FROM $src CROSS JOIN kk WHERE vec_id < k),
       ld AS (SELECT s.* FROM s CROSS JOIN kk WHERE cid % b = 0),
       a0 AS (SELECT e.vec_id, e.embedding, ld.blk,
                     row_number() OVER (PARTITION BY e.vec_id
                       ORDER BY ${cos("e.embedding", "ld.cvec")} DESC, ld.cid) AS rn
              FROM $src e CROSS JOIN ld),
       r0 AS (SELECT vec_id, embedding, blk FROM a0 WHERE rn = 1),
       a1 AS (SELECT r0.vec_id, r0.embedding, s.cid,
                     row_number() OVER (PARTITION BY r0.vec_id
                       ORDER BY ${cos("r0.embedding", "s.cvec")} DESC, s.cid) AS rn
              FROM r0 JOIN s ON r0.blk = s.blk),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a1 WHERE rn = 1)"""

  /** The negatives probe chain over a preceding `cells` CTE — affine
    * probes mod n, self/same-cell rejection, first-probe dedup, probe
    * -order ranking; ends in `r(vec_id, cand, neg_rank)`. Mirrors
    * [[Similarity.negativesFromCells]]. */
  private def negativesTail(src: String): String = {
    val probes = Similarity.NegativeCoeffs.zipWithIndex
      .map { case ((a, b), i) =>
        s"SELECT vec_id, $i AS p, (vec_id * $a + $b) % n AS cand " +
          "FROM cells CROSS JOIN nn" }
      .mkString(" UNION ALL ")
    s"""nn AS (SELECT count(*) AS n FROM $src),
       pr AS ($probes),
       j AS (SELECT pr.vec_id, pr.p, pr.cand
             FROM pr
             JOIN cells x ON pr.vec_id = x.vec_id
             JOIN cells y ON pr.cand = y.vec_id
             WHERE pr.cand <> pr.vec_id AND y.cell <> x.cell),
       d AS (SELECT vec_id, cand, min(p) AS p FROM j GROUP BY 1, 2),
       r AS (SELECT vec_id, cand,
                    row_number() OVER (PARTITION BY vec_id
                      ORDER BY p, cand) AS neg_rank
             FROM d)"""
  }

  /** Shared CTE chain ending in `kept` = the lang/quality-gated corpus
    * (doc_id, stop_ratio, n_tokens, alnum_ratio) — mirrors
    * [[TextAnalysis.filterApply]]. */
  private val filterKeptCtes =
    s"""tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
       lid AS (SELECT doc_id,
                      round(sum(CASE WHEN term IN (${TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(", ")}) THEN 1 ELSE 0 END)
                            / CAST(count(*) AS DOUBLE), 4) AS stop_ratio
               FROM tok GROUP BY doc_id),
       q AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw, $toks AS toks
             FROM documents),
       qual AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                       round(CAST(length(array_to_string(toks, ' ')) + 1 AS DOUBLE) / (n_chars_raw + 1), 4) AS alnum_ratio
                FROM q),
       kept AS (SELECT lid.doc_id AS doc_id, stop_ratio, n_tokens, alnum_ratio
                FROM lid JOIN qual ON lid.doc_id = qual.doc_id
                WHERE stop_ratio >= 0.03 AND n_tokens BETWEEN 20 AND 1000
                  AND alnum_ratio >= 0.7)"""

  /** Shared CTE chain for the span-dedup pair, ending in `isl` = the
    * removable (non-canonical, duplicated) window instances with island
    * ids per doc — mirrors [[Dedup.spanDedup]]'s stages exactly. */
  private val spanIslandCtes: String = {
    val w = Dedup.SpanWidthDefault
    s"""t AS (SELECT doc_id, $toks AS l FROM documents),
       w AS (SELECT doc_id, unnest(range(1, len(l) - $w + 2)) AS i, l FROM t),
       g AS (SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
                    array_to_string(list_slice(l, i, i + $w - 1), ' ') AS gram FROM w),
       m AS (SELECT doc_id, pos, count(*) OVER (PARTITION BY gram) AS n_occ,
                    row_number() OVER (PARTITION BY gram ORDER BY doc_id, pos) AS rn
             FROM g),
       dup AS (SELECT doc_id, pos, pos + ${w - 1} AS e FROM m WHERE n_occ >= 2 AND rn > 1),
       gi AS (SELECT doc_id, pos, e,
                    max(e) OVER (PARTITION BY doc_id ORDER BY pos ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pme
              FROM dup),
       isl AS (SELECT doc_id, pos, e,
                    sum(CASE WHEN pme IS NULL OR pos > pme + 1 THEN 1 ELSE 0 END)
                      OVER (PARTITION BY doc_id ORDER BY pos ROWS UNBOUNDED PRECEDING) AS iid
               FROM gi)"""
  }

  private val docShingles =
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       sh AS (SELECT doc_id, unnest(list_distinct(${ddbShingles3("toks")})) AS shingle FROM d)"""

  /** The decontamination-apply SQL, shared verbatim by the batch
    * entry (q27_decontaminate) and the streaming gate
    * (q29_decontam_stream) — the stream admits exactly the batch
    * keep-set, so one oracle pins both. */
  private def decontaminateSql: String =
    s"""$docShingles,
       bench AS (SELECT DISTINCT shingle FROM sh
                 WHERE doc_id % ${TextAnalysis.ContamMod} = 0),
       train AS (SELECT * FROM sh
                 WHERE doc_id % ${TextAnalysis.ContamMod} <> 0),
       tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams
               FROM train GROUP BY doc_id),
       hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
               FROM train JOIN bench USING (shingle) GROUP BY doc_id),
       f AS (SELECT tot.doc_id, n_trigrams,
                    coalesce(n_shared, 0) AS n_shared,
                    round(CAST(coalesce(n_shared, 0) AS DOUBLE)
                      / n_trigrams, 4) AS contam_ratio
             FROM tot LEFT JOIN hit USING (doc_id))
       SELECT doc_id, n_trigrams, CAST(n_shared AS BIGINT) AS n_shared,
              contam_ratio
       FROM f WHERE contam_ratio < ${TextAnalysis.ContamDropThreshold}
       ORDER BY doc_id"""

  /** Filtered-ANN SQL, shared by the standalone entries and the
    * recall panel (arm definitions can never drift). */
  private def annFilteredSql: String =
    s"""WITH f AS (SELECT doc_id AS vec_id FROM documents
                   WHERE lang = '${Similarity.FilterLang}'
                     AND n_chars >= ${Similarity.FilterMinChars}),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       s AS (SELECT e.vec_id, ${cos("e.embedding", "qv")} AS c
             FROM embeddings e JOIN f USING (vec_id) CROSS JOIN q
             WHERE e.vec_id <> 0)
       SELECT vec_id, round(c, 4) AS cos FROM s
       ORDER BY c DESC, vec_id LIMIT 10"""

  /** The ADAPTIVE filtered probe's SQL — the escalation RULE itself
    * replicated (mirrors [[Similarity.annIvfFilteredAuto]]): rank the
    * cells against the query, compute cumulative filter-survivor
    * counts along the cell ranking, choose the smallest rung of the
    * doubling ladder (capped at the cell count) whose prefix holds
    * `oversample × k` survivors (else the cap), rank inside the
    * chosen prefix. Hash-checking this checks the escalation CHOICE,
    * not just a fixed-nProbe ranking. `k` threads through to BOTH the
    * survivor target (oversample × k) and the final LIMIT, so the
    * oracle can never check a different escalation rule than the
    * entry's [[Similarity.annIvfFilteredAuto]] call runs. */
  private[graft] def annIvfFilteredAutoSql(k: Int = 10): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                   WHERE vec_id < ${Similarity.IvfCentroids}),
       a AS (SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN c),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
       f AS (SELECT doc_id AS vec_id FROM documents
             WHERE lang = '${Similarity.FilterLang}'
               AND n_chars >= ${Similarity.FilterMinChars}),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       qrank AS (SELECT c.cid,
                        row_number() OVER (
                          ORDER BY ${cos("q.qv", "c.cvec")} DESC, c.cid) AS crank
                 FROM c CROSS JOIN q),
       surv AS (SELECT qr.crank, count(*) AS cnt
                FROM cells x JOIN f ON x.vec_id = f.vec_id
                     JOIN qrank qr ON x.cell = qr.cid
                WHERE x.vec_id <> 0 GROUP BY qr.crank),
       lad AS (SELECT DISTINCT
                      least(CAST(pow(2, i) AS BIGINT),
                            (SELECT count(*) FROM c)) AS np
               FROM range(0, 30) t(i)),
       cum AS (SELECT lad.np, coalesce(sum(s.cnt), 0) AS cum
               FROM lad LEFT JOIN surv s ON s.crank <= lad.np
               GROUP BY lad.np),
       chosen AS (SELECT coalesce(min(np), (SELECT count(*) FROM c)) AS np
                  FROM cum
                  WHERE cum >= ${Similarity.FilteredAutoOversample * k}),
       s AS (SELECT x.vec_id, ${cos("x.embedding", "q.qv")} AS c
             FROM cells x JOIN f ON x.vec_id = f.vec_id
                  JOIN qrank qr ON x.cell = qr.cid
                  CROSS JOIN q CROSS JOIN chosen
             WHERE x.vec_id <> 0 AND qr.crank <= chosen.np)
       SELECT vec_id, round(c, 4) AS cos FROM s
       ORDER BY c DESC, vec_id LIMIT $k"""

  /** [[annIvfFilteredAutoSql]] WITHOUT the metadata filter — the
    * ladder rule of [[Similarity.annIvfAuto]] replicated: survivors
    * are ALL corpus vectors (query excluded), so the cumulative walk
    * escalates only out of small cells. Shared by the standalone
    * q25_ann_ivf_auto entry and the q37_hybrid_rrf_auto fusion. */
  private[graft] def annIvfAutoSql(k: Int = 10): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                   WHERE vec_id < ${Similarity.IvfCentroids}),
       a AS (SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN c),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       qrank AS (SELECT c.cid,
                        row_number() OVER (
                          ORDER BY ${cos("q.qv", "c.cvec")} DESC, c.cid) AS crank
                 FROM c CROSS JOIN q),
       surv AS (SELECT qr.crank, count(*) AS cnt
                FROM cells x JOIN qrank qr ON x.cell = qr.cid
                WHERE x.vec_id <> 0 GROUP BY qr.crank),
       lad AS (SELECT DISTINCT
                      least(CAST(pow(2, i) AS BIGINT),
                            (SELECT count(*) FROM c)) AS np
               FROM range(0, 30) t(i)),
       cum AS (SELECT lad.np, coalesce(sum(s.cnt), 0) AS cum
               FROM lad LEFT JOIN surv s ON s.crank <= lad.np
               GROUP BY lad.np),
       chosen AS (SELECT coalesce(min(np), (SELECT count(*) FROM c)) AS np
                  FROM cum
                  WHERE cum >= ${Similarity.FilteredAutoOversample * k}),
       s AS (SELECT x.vec_id, ${cos("x.embedding", "q.qv")} AS c
             FROM cells x JOIN qrank qr ON x.cell = qr.cid
                  CROSS JOIN q CROSS JOIN chosen
             WHERE x.vec_id <> 0 AND qr.crank <= chosen.np)
       SELECT vec_id, round(c, 4) AS cos FROM s
       ORDER BY c DESC, vec_id LIMIT $k"""

  private def annIvfFilteredSql(nProbe: Int): String =
    s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                   WHERE vec_id < ${Similarity.IvfCentroids}),
       a AS (SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN c),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
       f AS (SELECT doc_id AS vec_id FROM documents
             WHERE lang = '${Similarity.FilterLang}'
               AND n_chars >= ${Similarity.FilterMinChars}),
       q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
       qc AS (SELECT c.cid FROM c CROSS JOIN q
              ORDER BY ${cos("q.qv", "c.cvec")} DESC, c.cid LIMIT $nProbe),
       s AS (SELECT x.vec_id, ${cos("x.embedding", "q.qv")} AS c
             FROM cells x JOIN qc ON x.cell = qc.cid
                    JOIN f ON x.vec_id = f.vec_id
                    CROSS JOIN q
             WHERE x.vec_id <> 0)
       SELECT vec_id, round(c, 4) AS cos FROM s
       ORDER BY c DESC, vec_id LIMIT 10"""

  /** The five-gate funnel's per-doc flags as a WITH chain ending at
    * `fl(doc_id, g1..g5)` — ONE generator feeding q27_funnel (counts)
    * and both q27_funnel_apply arms (kept sets), so the gate
    * definitions can't drift across the three entries. `keepLongest`
    * swaps the near-dup drop-set rule exactly as
    * [[TextAnalysis.curationFunnelFlags]] does: default = the larger
    * id of any banded candidate pair drops (first-arrival); longest =
    * each pair's loser by (n_tokens desc, doc_id asc) drops. */
  private def funnelFlagsCtes(keepLongest: Boolean): String = {
    val nd =
      if (!keepLongest)
        s"""nd AS (SELECT DISTINCT y.doc_id
                FROM bands x JOIN bands y
                ON x.band = y.band AND x.bkey = y.bkey
               AND x.doc_id < y.doc_id)"""
      else
        s"""ndp AS (SELECT DISTINCT x.doc_id AS a, y.doc_id AS b
                 FROM bands x JOIN bands y
                 ON x.band = y.band AND x.bkey = y.bkey
                AND x.doc_id < y.doc_id),
         nd AS (SELECT DISTINCT
                       CASE WHEN qa.n_tokens > qb.n_tokens
                              OR (qa.n_tokens = qb.n_tokens AND a < b)
                            THEN b ELSE a END AS doc_id
                FROM ndp JOIN qual qa ON qa.doc_id = ndp.a
                     JOIN qual qb ON qb.doc_id = ndp.b)"""
    s"""$docShingles,
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         q2 AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw,
                       $toks AS toks2
                FROM documents),
         qual AS (SELECT doc_id, CAST(len(toks2) AS BIGINT) AS n_tokens,
                         round(CAST(length(array_to_string(toks2, ' ')) + 1 AS DOUBLE)
                               / (n_chars_raw + 1), 4) AS alnum_ratio
                  FROM q2),
         $nd,
         bench AS (SELECT DISTINCT shingle FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} = 0),
         train AS (SELECT * FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} <> 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams
                 FROM train GROUP BY doc_id),
         hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
                 FROM train JOIN bench USING (shingle) GROUP BY doc_id),
         dec AS (SELECT tot.doc_id FROM tot LEFT JOIN hit USING (doc_id)
                 WHERE round(CAST(coalesce(n_shared, 0) AS DOUBLE)
                         / n_trigrams, 4)
                       < ${TextAnalysis.ContamDropThreshold}),
         tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         lid AS (SELECT doc_id,
                        round(sum(CASE WHEN term IN (${TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(", ")}) THEN 1 ELSE 0 END)
                              / CAST(count(*) AS DOUBLE), 4) AS stop_ratio
                 FROM tok GROUP BY doc_id),
         keep AS (SELECT min(doc_id) AS doc_id FROM documents
                  GROUP BY md5(text)),
         fl AS (SELECT lid.doc_id,
                       (stop_ratio >= 0.03) AS g1,
                       (n_tokens BETWEEN 20 AND 1000
                        AND alnum_ratio >= 0.7) AS g2,
                       (keep.doc_id IS NOT NULL) AS g3,
                       (nd.doc_id IS NULL) AS g4,
                       (dec.doc_id IS NOT NULL) AS g5
                FROM lid JOIN qual ON lid.doc_id = qual.doc_id
                LEFT JOIN keep ON lid.doc_id = keep.doc_id
                LEFT JOIN nd ON lid.doc_id = nd.doc_id
                LEFT JOIN dec ON lid.doc_id = dec.doc_id)"""
  }

  /** The occupancy-BALANCED k-NN graph SQL over any cell-assignment
    * CTE block (flat or coarse) — mirrors
    * [[Similarity.balancedCellsOf]] + the shared top-3 contract:
    * cells past [[Similarity.BalancedCellCap]] re-seed on their m
    * smallest vec_ids (sub-seed id = id rank - 1) and re-argmax with
    * the family (cos desc, sid asc) tie rule; under-cap cells keep
    * sub = 0. ONE generator feeds q25_knn_graph (the default entry),
    * q25_knn_graph_balanced, and q25_knn_graph_coarse, so the three
    * arms can't drift from each other. */
  /** The occupancy-balanced re-split chain, `cells(vec_id, embedding,
    * cell)` → `c2(vec_id, embedding, cell, sub)` — mirrors
    * [[Similarity.balancedCellsOf]] and is shared by the k-NN graph
    * and semdedup-pair oracle families (one definition, no drift). */
  private lazy val balancedC2Ctes: String =
    s"""occ AS (SELECT cell, count(*) AS occ FROM cells GROUP BY cell),
       big AS (SELECT cell,
                      CAST(ceil(occ / ${Similarity.SemDedupCellSize}.0) AS BIGINT) AS m
               FROM occ WHERE occ > ${Similarity.BalancedCellCap}),
       small AS (SELECT vec_id, embedding, cell, CAST(0 AS BIGINT) AS sub
                 FROM cells WHERE cell NOT IN (SELECT cell FROM big)),
       bv AS (SELECT cells.vec_id, cells.embedding, cells.cell, big.m
              FROM cells JOIN big USING (cell)),
       ss AS (SELECT cell, svec, sid FROM (
                SELECT cell, embedding AS svec, m,
                       CAST(row_number() OVER (PARTITION BY cell
                         ORDER BY vec_id) - 1 AS BIGINT) AS sid
                FROM bv)
              WHERE sid < m),
       asg AS (SELECT bv.vec_id, bv.embedding, bv.cell, ss.sid,
                      row_number() OVER (PARTITION BY bv.vec_id
                        ORDER BY ${cos("bv.embedding", "ss.svec")} DESC,
                                 ss.sid) AS rn
               FROM bv JOIN ss USING (cell)),
       bigc AS (SELECT vec_id, embedding, cell, sid AS sub
                FROM asg WHERE rn = 1),
       c2 AS (SELECT * FROM small UNION ALL SELECT * FROM bigc)"""

  /** The balanced SemDeDup candidate-pair chain over any cell CTE
    * block — ends in `p(vec_a, vec_b, c)`; mirrors
    * [[Similarity.semDedupPairs]]' (cell, sub) bucket join. */
  private def balancedPairCtes(cellCtes: String): String =
    s"""$cellCtes,
       $balancedC2Ctes,
       p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                    ${cos("x.embedding", "y.embedding")} AS c
             FROM c2 x JOIN c2 y
               ON x.cell = y.cell AND x.sub = y.sub
              AND x.vec_id < y.vec_id)"""

  private def knnGraphBalancedSqlOver(cellCtes: String): String =
    s"""WITH $cellCtes,
       $balancedC2Ctes,
       p AS (SELECT x.vec_id AS src, y.vec_id AS nbr,
                    ${cos("x.embedding", "y.embedding")} AS c
             FROM c2 x JOIN c2 y
               ON x.cell = y.cell AND x.sub = y.sub
              AND x.vec_id <> y.vec_id),
       r AS (SELECT src, nbr, c,
                    row_number() OVER (PARTITION BY src
                      ORDER BY c DESC, nbr) AS rn
             FROM p)
       SELECT src AS vec_id, CAST(rn AS BIGINT) AS rn, nbr,
              round(c, 4) AS cos
       FROM r WHERE rn <= 3 ORDER BY vec_id, rn"""

  private val oracleMain: Map[String, String] = Map(
    "q24_dedup_exact" ->
      """SELECT md5(text) AS digest, count(*) AS n_dups, min(doc_id) AS keeper
         FROM documents GROUP BY 1 ORDER BY digest""",

    // sub-document exact dedup over fixed token windows; only digests
    // seen more than once survive; counts cast BIGINT (HUGEINT rule)
    "q24_dedup_chunks" ->
      s"""WITH t AS (SELECT doc_id, $toks AS l FROM documents),
         c AS (SELECT doc_id,
                      unnest(list_transform(range(0, (len(l)-1)//${Dedup.ChunkWidthDefault} + 1),
                        i -> array_to_string(list_slice(l, i*${Dedup.ChunkWidthDefault}+1, i*${Dedup.ChunkWidthDefault}+${Dedup.ChunkWidthDefault}), ' '))) AS chunk
               FROM t WHERE len(l) > 0)
         SELECT md5(chunk) AS digest,
                CAST(count(*) AS BIGINT) AS n_occurrences,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                min(doc_id) AS keeper
         FROM c GROUP BY 1 HAVING count(*) > 1 ORDER BY digest""",

    // content-defined chunking: boundaries where the rolling 4-token
    // hash divides — the shift-robust chunker; same output contract as
    // q24_dedup_chunks
    "q24_cdc_chunks" -> {
      val w = Dedup.CdcWindow
      val gram = s"array_to_string(list_slice(l, e - ${w - 1}, e), ' ')"
      s"""WITH t AS (SELECT doc_id, $toks AS l FROM documents
                     WHERE len($toks) > 0),
         g AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
                 list_filter(
                   list_transform(range(1, len(l) - ${w - 1} + 1), i -> i + ${w - 1}),
                   e -> ${ddbPolyHash(gram)} % ${Dedup.CdcDivisor} = 0
                        AND e < len(l)) AS cuts
               FROM t),
         b AS (SELECT doc_id, l,
                 list_concat(list_concat([CAST(0 AS BIGINT)], cuts), [n]) AS bounds
               FROM g),
         sp AS (SELECT b.doc_id AS doc_id,
                  array_to_string(list_slice(b.l, b.bounds[u.j] + 1, b.bounds[u.j + 1]), ' ') AS chunk
                FROM b, LATERAL (SELECT unnest(range(1, len(b.bounds))) AS j) u)
         SELECT md5(chunk) AS digest,
                CAST(count(*) AS BIGINT) AS n_occurrences,
                CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
                min(doc_id) AS keeper
         FROM sp GROUP BY 1 HAVING count(*) > 1 ORDER BY digest"""
    },

    // CDC APPLY: same span chain, then canonical-first removal (the
    // q24_span_apply semantics at content-defined boundaries) — each
    // repeated chunk digest keeps its smallest-(doc_id, start)
    // instance, every other instance's token interval is stripped
    "q24_cdc_apply" -> {
      val w = Dedup.CdcWindow
      val gram = s"array_to_string(list_slice(l, e - ${w - 1}, e), ' ')"
      s"""WITH tall AS (SELECT doc_id, $toks AS l FROM documents),
         t AS (SELECT doc_id, l FROM tall WHERE len(l) > 0),
         g AS (SELECT doc_id, l, CAST(len(l) AS BIGINT) AS n,
                 list_filter(
                   list_transform(range(1, len(l) - ${w - 1} + 1), i -> i + ${w - 1}),
                   e -> ${ddbPolyHash(gram)} % ${Dedup.CdcDivisor} = 0
                        AND e < len(l)) AS cuts
               FROM t),
         b AS (SELECT doc_id, l,
                 list_concat(list_concat([CAST(0 AS BIGINT)], cuts), [n]) AS bounds
               FROM g),
         sp AS (SELECT b.doc_id AS doc_id,
                  b.bounds[u.j] + 1 AS s, b.bounds[u.j + 1] AS e,
                  md5(array_to_string(list_slice(b.l, b.bounds[u.j] + 1, b.bounds[u.j + 1]), ' ')) AS digest
                FROM b, LATERAL (SELECT unnest(range(1, len(b.bounds))) AS j) u),
         m AS (SELECT doc_id, s, e,
                      count(*) OVER (PARTITION BY digest) AS n_occ,
                      row_number() OVER (PARTITION BY digest ORDER BY doc_id, s) AS rn
               FROM sp),
         rem AS (SELECT doc_id, s - 1 AS s0, e - 1 AS e0 FROM m
                 WHERE n_occ >= 2 AND rn > 1),
         tokpos AS (SELECT doc_id, unnest(l) AS tok,
                           generate_subscripts(l, 1) - 1 AS p FROM tall),
         kept AS (SELECT tp.doc_id, tp.tok, tp.p FROM tokpos tp
                  WHERE NOT EXISTS (SELECT 1 FROM rem
                                    WHERE rem.doc_id = tp.doc_id
                                      AND tp.p BETWEEN rem.s0 AND rem.e0))
         SELECT tall.doc_id AS doc_id,
                CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(k.clean_text, '') AS clean_text
         FROM tall LEFT JOIN (SELECT doc_id, count(*) AS n_kept,
                                     string_agg(tok, ' ' ORDER BY p) AS clean_text
                              FROM kept GROUP BY doc_id) k
              ON tall.doc_id = k.doc_id
         ORDER BY doc_id"""
    },

    // duplicated-SPAN detection over overlapping token windows: the
    // window grouping is rebuilt relationally (range → list_slice),
    // canonical-first semantics via row_number over (doc_id, pos), the
    // per-doc interval union via the same gaps-and-islands the engine
    // runs — all-integer output, so the hash compare is exact
    "q24_span_dedup" ->
      s"""WITH $spanIslandCtes,
         cov AS (SELECT doc_id, sum(tk) AS dup_tokens FROM
                   (SELECT doc_id, iid, max(e) - min(pos) + 1 AS tk FROM isl GROUP BY doc_id, iid)
                 GROUP BY doc_id),
         ndw AS (SELECT doc_id, count(*) AS n_dup_windows FROM dup GROUP BY doc_id)
         SELECT t.doc_id AS doc_id, CAST(len(l) AS BIGINT) AS n_tokens,
                CAST(greatest(len(l) - ${Dedup.SpanWidthDefault - 1}, 0) AS BIGINT) AS n_windows,
                CAST(coalesce(n_dup_windows, 0) AS BIGINT) AS n_dup_windows,
                CAST(coalesce(dup_tokens, 0) AS BIGINT) AS dup_tokens
         FROM t LEFT JOIN ndw ON t.doc_id = ndw.doc_id
                LEFT JOIN cov ON t.doc_id = cov.doc_id
         ORDER BY doc_id""",

    // span-dedup APPLY: token positions inside any merged removal
    // interval are dropped, the rest re-joined ordered by position —
    // the NOT EXISTS probe is per-doc against that doc's few intervals
    "q24_span_apply" ->
      s"""WITH $spanIslandCtes,
         iv AS (SELECT doc_id, iid, min(pos) AS s, max(e) AS e FROM isl GROUP BY doc_id, iid),
         tokpos AS (SELECT doc_id, unnest(l) AS tok, generate_subscripts(l, 1) - 1 AS p FROM t),
         kept AS (SELECT tp.doc_id, tp.tok, tp.p FROM tokpos tp
                  WHERE NOT EXISTS (SELECT 1 FROM iv
                                    WHERE iv.doc_id = tp.doc_id AND tp.p BETWEEN iv.s AND iv.e))
         SELECT t.doc_id AS doc_id,
                CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
                coalesce(k.clean_text, '') AS clean_text
         FROM t LEFT JOIN (SELECT doc_id, count(*) AS n_kept,
                                  string_agg(tok, ' ' ORDER BY p) AS clean_text
                           FROM kept GROUP BY doc_id) k ON t.doc_id = k.doc_id
         ORDER BY doc_id""",

    // dedup APPLY: the kept corpus (one doc per digest, min-id keeper)
    "q24_dedup_apply" ->
      """SELECT doc_id, lang, n_chars FROM documents
         WHERE doc_id IN (SELECT min(doc_id) FROM documents GROUP BY md5(text))
         ORDER BY doc_id""",

    // delta-vs-base incremental dedup: digest probe, no base self-join
    "q24_dedup_delta" ->
      """WITH h AS (SELECT count(*) // 2 AS half FROM documents),
         base AS (SELECT DISTINCT md5(text) AS digest
                  FROM documents CROSS JOIN h WHERE doc_id < half)
         SELECT doc_id,
                md5(text) IN (SELECT digest FROM base) AS dup_in_base
         FROM documents CROSS JOIN h WHERE doc_id >= half
         ORDER BY doc_id""",

    // Bloom delta probe: exact membership (the verification side) plus
    // the checked no-false-negative guarantee of the sketch — the same
    // exact-value-plus-bound-flag contract as the HLL/GK oracles
    "q24_bloom_probe" ->
      """WITH h AS (SELECT count(*) // 2 AS half FROM documents),
         base AS (SELECT DISTINCT md5(text) AS digest
                  FROM documents CROSS JOIN h WHERE doc_id < half)
         SELECT doc_id,
                md5(text) IN (SELECT digest FROM base) AS dup_in_base,
                true AS no_false_neg
         FROM documents CROSS JOIN h WHERE doc_id >= half
         ORDER BY doc_id""",

    // trained n-gram lang-ID: per-language char-trigram profiles over
    // the normalized token string, add-one smoothing over the global
    // trigram vocab, fixed-point log-likelihood argmax (ties to the
    // smallest language) — the window formulation here equals the
    // engine's min(struct(-score, lang)) agg
    "q27_langid_ngram" ->
      s"""WITH t AS (SELECT doc_id, lang, array_to_string($toks, ' ') AS s FROM documents),
         inst AS (SELECT doc_id, lang, substring(s, i, 3) AS g
                  FROM (SELECT doc_id, lang, s, unnest(range(1, length(s) - 1)) AS i
                        FROM t WHERE length(s) >= 3)),
         prof AS (SELECT lang AS plang, g, count(*) AS c FROM inst GROUP BY 1, 2),
         tot AS (SELECT lang AS plang, count(*) AS t FROM inst GROUP BY 1),
         v AS (SELECT count(DISTINCT g) AS vs FROM inst),
         scored AS (SELECT i.doc_id AS doc_id, i.lang AS lang, l.plang AS plang,
                           sum(CAST(round(ln((coalesce(p.c, 0) + 1.0) / (l.t + v.vs)) * 1e6, 0) AS BIGINT)) AS score
                    FROM inst i CROSS JOIN tot l CROSS JOIN v
                         LEFT JOIN prof p ON p.plang = l.plang AND p.g = i.g
                    GROUP BY 1, 2, 3),
         pick AS (SELECT doc_id, lang, plang,
                         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, plang) AS rn
                  FROM scored)
         SELECT doc_id, lang, plang AS pred_lang, plang = lang AS match
         FROM pick WHERE rn = 1 ORDER BY doc_id""",

    // vocabulary induction + coverage: top-V terms by occurrence count
    // (count desc, term asc — the engine's exact tie-break), per-doc
    // in-vocab occurrences and OOV rate
    "q27_vocab" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         v AS (SELECT term FROM (SELECT term, count(*) AS c FROM tok GROUP BY term
                                 ORDER BY c DESC, term LIMIT ${TextAnalysis.VocabSize})),
         d AS (SELECT doc_id, count(*) AS n_tokens,
                      sum(CASE WHEN term IN (SELECT term FROM v) THEN 1 ELSE 0 END) AS in_vocab
               FROM tok GROUP BY doc_id)
         SELECT documents.doc_id AS doc_id,
                CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
                CAST(coalesce(in_vocab, 0) AS BIGINT) AS in_vocab,
                CASE WHEN coalesce(n_tokens, 0) = 0 THEN 0.0
                     ELSE round(1.0 - in_vocab / CAST(n_tokens AS DOUBLE), 4) END AS oov_rate
         FROM documents LEFT JOIN d ON documents.doc_id = d.doc_id
         ORDER BY doc_id""",

    // BPE training — the merge loop unrolled to Bpe.Merges CTE
    // triplets (pairs → argmax → rewrite); merge application is the
    // same two-pass left-to-right replace the engine runs (shared
    // semantics of Java String.replace / DuckDB replace — see the
    // Bpe class doc), so sequences stay engine-identical through
    // every iteration
    "q27_bpe_train" -> {
      val sel = (1 to Bpe.Merges)
        .map(i => s"SELECT $i AS rank, lhs, rhs, lhs||rhs AS merged, pc FROM m$i")
        .mkString(" UNION ALL ")
      s"""WITH $bpeCtes
         SELECT * FROM ($sel) ORDER BY rank"""
    },

    // BPE-tokenized packing layout: q27_packing's hash-ordered cumsum
    // with per-doc SUBWORD counts (from the trained sequences) as the
    // weights
    "q27_bpe_pack" ->
      s"""WITH $bpeCtes,
         bpc AS (SELECT t.doc_id AS doc_id,
                        CAST(sum(len(string_split(s.seq, '|')) - 2) AS BIGINT) AS n
                 FROM tok t JOIN s${Bpe.Merges} s USING (word)
                 GROUP BY t.doc_id),
         wt AS (SELECT d.doc_id AS doc_id, bpc.n AS n, ${ddbPolyHash("d.text")} AS h
                FROM documents d JOIN bpc ON d.doc_id = bpc.doc_id
                WHERE bpc.n > 0),
         o AS (SELECT doc_id, n,
                      sum(n) OVER (ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM wt)
         SELECT doc_id, CAST(cum - n AS BIGINT) AS start_tok, n AS n_tokens,
                CAST((cum - n) // 512 AS BIGINT) AS first_bin,
                CAST((cum - 1) // 512 AS BIGINT) AS last_bin
         FROM o ORDER BY doc_id""",

    // BPE application: per-doc subword counts; the oracle joins each
    // corpus word to its trained final sequence (sN) — the engine's
    // map-side replace chain equals that join by construction
    "q27_bpe_apply" ->
      s"""WITH $bpeCtes
         SELECT t.doc_id, CAST(count(*) AS BIGINT) AS n_words,
                CAST(sum(len(string_split(s.seq, '|')) - 2) AS BIGINT) AS bpe_tokens
         FROM tok t JOIN s${Bpe.Merges} s USING (word)
         GROUP BY t.doc_id ORDER BY t.doc_id""",

    // DSIR data selection: hashed-bigram log-likelihood ratio of the
    // quality-kept target distribution vs the whole corpus, Laplace-
    // smoothed, 1e6 fixed-point sums, deterministic top-k
    "q27_dsir" ->
      s"""WITH $filterKeptCtes,
         ptok AS (SELECT doc_id, generate_subscripts(l, 1) AS pos, unnest(l) AS term
                  FROM (SELECT doc_id, $toks AS l FROM documents)),
         big AS (SELECT a.doc_id AS doc_id, a.term || ' ' || b.term AS g
                 FROM ptok a JOIN ptok b ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         inst AS (SELECT big.doc_id AS doc_id,
                         CASE WHEN kept.doc_id IS NOT NULL THEN 1 ELSE 0 END AS is_t,
                         ${ddbPolyHash("g", P)} % ${TextAnalysis.DsirBuckets} AS h
                  FROM big LEFT JOIN kept ON big.doc_id = kept.doc_id),
         bkt AS (SELECT h, CAST(sum(is_t) AS BIGINT) AS ct,
                        CAST(count(*) AS BIGINT) AS cs
                 FROM inst GROUP BY h),
         tots AS (SELECT CAST(sum(ct) AS BIGINT) AS t,
                         CAST(sum(cs) AS BIGINT) AS s FROM bkt),
         lr AS (SELECT h,
                       CAST(round((ln((ct + 1.0) / (t + ${TextAnalysis.DsirBuckets}))
                                 - ln((cs + 1.0) / (s + ${TextAnalysis.DsirBuckets}))) * 1e6, 0) AS BIGINT) AS lr
                FROM bkt CROSS JOIN tots),
         sc AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_feats,
                       CAST(sum(lr) AS BIGINT) AS sfp
                FROM inst JOIN lr USING (h) GROUP BY doc_id)
         SELECT doc_id, n_feats,
                round(CAST(sfp AS DOUBLE) / 1e6 / n_feats, 4) + 0.0 AS dsir_score
         FROM sc ORDER BY dsir_score DESC, doc_id LIMIT ${TextAnalysis.DsirKeep}""",

    // product quantization: the per-subspace code assignment of every
    // vector (the compact ANN store)
    "q25_pq_codes" -> {
      val joins = (0 until Pq.Subspaces)
        .map(s => s"JOIN code_$s ON code_$s.vec_id = e.vec_id")
        .mkString(" ")
      val cols = (0 until Pq.Subspaces)
        .map(s => s"code_$s.cid AS c$s").mkString(", ")
      s"""WITH $pqCtes
         SELECT e.vec_id, $cols FROM e $joins ORDER BY e.vec_id"""
    },

    // PQ ADC top-k: per-candidate distance = sum of the query's
    // per-subspace distance-table lookups (left-assoc, subspace order)
    "q25_ann_pq" -> {
      val joins = (0 until Pq.Subspaces).map(s =>
        s"JOIN code_$s ON code_$s.vec_id = e.vec_id " +
          s"JOIN qd_$s ON qd_$s.cid = code_$s.cid").mkString(" ")
      val total = (0 until Pq.Subspaces).map(s => s"qd_$s.d").mkString(" + ")
      s"""WITH $pqCtes
         SELECT e.vec_id, round($total, 4) + 0.0 AS pq_dist
         FROM e $joins
         WHERE e.vec_id <> 0
         ORDER BY $total, e.vec_id LIMIT ${Pq.TopK}"""
    },

    // IVF-PQ composition: coarse argmax-cosine routing to the query's
    // top-2 cells, then ADC scoring only over those cells' candidates
    "q25_ann_ivfpq" -> annIvfPqSql(filtered = false),

    // the coded probe over a takedown'd store == the ADC ranking of a
    // corpus that never held the ids (codebooks + routing unchanged —
    // they live in the embeddings table, not the store's rows);
    // q25_ann_ivfpq_deleted_compacted shares this SQL
    "q25_ann_ivfpq_deleted" ->
      annIvfPqSql(filtered = false, deleted = true),

    // the coded probe over a store whose re-crawl set was UPDATED in
    // place: codes and cells of the updated ids re-derive from their
    // NEW vectors under the FROZEN (original-table) codebooks and
    // seeds — the sidecar-encode semantics of Pq.updatePqVectors
    "q25_ann_ivfpq_updated" ->
      annIvfPqSql(filtered = false, updated = true),

    // the WHERE-clause IVF-PQ: same routing/codes/distance table with
    // the metadata pre-filter joined into the probed candidates
    // (mirrors Pq.annIvfPqFiltered; shared by the loaded entry)
    "q25_ann_ivfpq_filtered" -> annIvfPqSql(filtered = true),

    // the ADAPTIVE coded probe: the annIvfFilteredAutoSql ladder rule
    // verbatim over the PQ candidate path — escalation choice AND the
    // ADC ranking both hash-checked
    "q25_ann_ivfpq_filtered_auto" ->
      annIvfPqSql(filtered = true, auto = true),

    // heavy hitters: exact top-k terms + the two checked CMS bounds
    "q14_heavy_hitters" ->
      s"""WITH tok AS (SELECT unnest($toks) AS term FROM documents)
         SELECT term, CAST(count(*) AS BIGINT) AS cnt,
                true AS cms_lower_ok, true AS cms_upper_ok
         FROM tok GROUP BY term
         ORDER BY cnt DESC, term LIMIT ${TextAnalysis.HeavyHittersK}""",

    // bigram LM score: add-one-smoothed log-probs, fixed-point 1e-6
    // quantization before the per-doc sum (order-insensitive on both
    // engines); positions from the same filtered token list, so the
    // 0-vs-1-based offset cancels in the adjacency join
    "q27_lm_score" ->
      s"""WITH tok AS (SELECT doc_id, generate_subscripts(l, 1) AS pos,
                              unnest(l) AS term
                       FROM (SELECT doc_id, $toks AS l FROM documents)),
         inst AS (SELECT a.doc_id AS doc_id, a.term AS w1, b.term AS w2
                  FROM tok a JOIN tok b
                  ON a.doc_id = b.doc_id AND b.pos = a.pos + 1),
         uni AS (SELECT term AS w1, count(*) AS cu FROM tok GROUP BY 1),
         v AS (SELECT count(DISTINCT term) AS vs FROM tok),
         bic AS (SELECT w1, w2, count(*) AS cb FROM inst GROUP BY 1, 2),
         q AS (SELECT i.doc_id AS doc_id,
                      CAST(round(ln((cb + 1.0) / (cu + vs)) * 1e6, 0) AS BIGINT) AS q
               FROM inst i JOIN bic USING (w1, w2) JOIN uni USING (w1)
                    CROSS JOIN v)
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_pairs,
                round(CAST(sum(q) AS DOUBLE) / 1e6 / count(*), 4) + 0.0 AS avg_logp
         FROM q GROUP BY doc_id ORDER BY doc_id""",

    // PageRank: the identical fixed-point integer recurrence unrolled
    // ten levels deep — every division is integer division, so the
    // ranks are bit-exact across engines and summation orders
    "q33_pagerank" -> {
      val rounds = (1 to Graph.DefaultIters).map { i =>
        s"""r$i AS (SELECT n.node AS node,
                  CAST(${Graph.Teleport} + ${Graph.DampNum} * (coalesce(s.s, 0) // ${Graph.DampDen}) AS BIGINT) AS r
           FROM nodes n LEFT JOIN (
             SELECT e.dst AS node, sum(p.r // e.deg) AS s
             FROM ed e JOIN r${i - 1} p ON e.src = p.node
             GROUP BY e.dst) s ON n.node = s.node)"""
      }.mkString(",\n         ")
      s"""WITH $linkEdgeCtes,
         deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY src),
         ed AS (SELECT e.src, e.dst, d.deg
                FROM edges e JOIN deg d ON e.src = d.src),
         nodes AS (SELECT DISTINCT node FROM
                     (SELECT src AS node FROM edges
                      UNION ALL SELECT dst FROM edges)),
         r0 AS (SELECT node, CAST(${Graph.RankOne} AS BIGINT) AS r FROM nodes),
         $rounds
         SELECT node, r FROM r${Graph.DefaultIters} ORDER BY r DESC, node"""
    },

    // per-node triangle counts; the oracle enumerates each triangle
    // once in id-canonical form (x<y<z with all three edges present) —
    // output-identical to the engine's degree-ordered enumeration
    "q33_triangles" ->
      s"""WITH $linkEdgeCtes,
         und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                 FROM edges),
         tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
                 FROM und a JOIN und b ON a.v = b.u
                            JOIN und c ON c.u = a.u AND c.v = b.v),
         n3 AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri)
         SELECT node, CAST(count(*) AS BIGINT) AS n_tri
         FROM n3 GROUP BY node ORDER BY node""",

    // local clustering coefficient: triangles over wedge capacity per
    // node (triangle members only, so deg >= 2 always)
    "q33_clustering" ->
      s"""WITH $linkEdgeCtes,
         und AS (SELECT DISTINCT least(src, dst) AS u, greatest(src, dst) AS v
                 FROM edges),
         degs AS (SELECT node, CAST(count(*) AS BIGINT) AS deg FROM
                    (SELECT u AS node FROM und
                     UNION ALL SELECT v FROM und) GROUP BY node),
         tri AS (SELECT a.u AS x, a.v AS y, b.v AS z
                 FROM und a JOIN und b ON a.v = b.u
                            JOIN und c ON c.u = a.u AND c.v = b.v),
         n3 AS (SELECT x AS node FROM tri
                UNION ALL SELECT y FROM tri
                UNION ALL SELECT z FROM tri),
         tc AS (SELECT node, CAST(count(*) AS BIGINT) AS n_tri
                FROM n3 GROUP BY node)
         SELECT node, n_tri, deg,
                round(2.0 * n_tri / (deg * (deg - 1)), 4) AS cc
         FROM tc JOIN degs USING (node) ORDER BY node""",

    // joint gate: exact-dup keeper AND not a semantic-cluster member
    // dropped by SemDeDup (recursive CTE over the cosine>=0.35 graph)
    "q25_joint_dedup" ->
      s"""WITH RECURSIVE em AS (SELECT vec_id, embedding FROM embeddings
                                WHERE vec_id < 200),
         p AS (SELECT a.vec_id AS u0, b.vec_id AS v0
               FROM em a JOIN em b ON a.vec_id < b.vec_id
               WHERE ${cos("a.embedding", "b.embedding")} >= 0.35),
         e AS (SELECT u0 AS u, v0 AS v FROM p
               UNION ALL SELECT v0, u0 FROM p),
         nodes AS (SELECT DISTINCT u AS node FROM e),
         r AS (SELECT node, node AS m FROM nodes
               UNION
               SELECT r.node, e.v FROM r JOIN e ON r.m = e.u),
         semdrop AS (SELECT node AS doc_id FROM r GROUP BY node
                     HAVING min(m) <> node),
         lex AS (SELECT min(doc_id) AS doc_id FROM documents
                 GROUP BY md5(text))
         SELECT d.doc_id, d.lang, d.n_chars FROM documents d
         WHERE d.doc_id IN (SELECT doc_id FROM lex)
           AND d.doc_id NOT IN (SELECT doc_id FROM semdrop)
         ORDER BY d.doc_id""",

    // sequence packing: hash-shuffled order, windowed cumsum (the
    // oracle's single window ≡ the engine's two-phase scalable cumsum)
    "q27_packing" ->
      s"""WITH t AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n,
                            ${ddbPolyHash("text")} AS h
                     FROM documents),
         f AS (SELECT * FROM t WHERE n > 0),
         o AS (SELECT doc_id, n,
                      sum(n) OVER (ORDER BY h, doc_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM f)
         SELECT doc_id, CAST(cum - n AS BIGINT) AS start_tok, n AS n_tokens,
                CAST((cum - n) // 512 AS BIGINT) AS first_bin,
                CAST((cum - 1) // 512 AS BIGINT) AS last_bin
         FROM o ORDER BY doc_id""",

    // one-row corpus report
    "q27_corpus_stats" ->
      s"""WITH t AS (SELECT doc_id, text, $toks AS toks FROM documents),
         v AS (SELECT count(DISTINCT term) AS vocab
               FROM (SELECT unnest(toks) AS term FROM t)),
         s AS (SELECT CAST(count(*) AS BIGINT) AS n_docs,
                      CAST(sum(len(toks)) AS BIGINT) AS total_tokens,
                      CAST(count(DISTINCT md5(text)) AS BIGINT) AS n_distinct
               FROM t)
         SELECT n_docs, total_tokens, CAST(vocab AS BIGINT) AS vocab,
                round(CAST(total_tokens AS DOUBLE) / n_docs, 4) AS avg_doc_tokens,
                round(1.0 - CAST(n_distinct AS DOUBLE) / n_docs, 4) AS dup_rate
         FROM s CROSS JOIN v""",

    // stratified deterministic sampling: k smallest content hashes
    // per lang (ties by doc_id) — the WINDOW form, so the compare
    // proves the engine's bounded-heap aggregate == row_number()
    "q24_sample_stratified" ->
      s"""WITH h AS (SELECT lang, doc_id,
                            ${ddbPolyHash("coalesce(text, '')")} AS hv
                     FROM documents),
         r AS (SELECT lang, doc_id, hv,
                      row_number() OVER (PARTITION BY lang
                        ORDER BY hv, doc_id) AS rank
               FROM h)
         SELECT lang, CAST(rank AS BIGINT) AS rank, doc_id,
                CAST(hv AS BIGINT) AS hash_val
         FROM r WHERE rank <= 50 ORDER BY lang, rank""",

    // deterministic hash-bucket sampling: stable function of content
    "q24_sample" ->
      s"""WITH h AS (SELECT doc_id, lang, n_chars,
                            ${ddbPolyHash("text")} % 10 AS bucket
                     FROM documents)
         SELECT doc_id, lang, n_chars, bucket FROM h
         WHERE bucket < 3 ORDER BY doc_id""",

    "q24_dedup_jaccard" ->
      s"""$docShingles,
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2)
         SELECT doc_a, doc_b, round(i / (x.n + y.n - i), 4) AS jaccard
         FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
         WHERE i / (x.n + y.n - i) >= 0.5
         ORDER BY doc_a, doc_b""",

    "q24_dedup_minhash" ->
      s"""$docShingles,
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id)
         SELECT c.doc_a, c.doc_b,
                round(sum(CASE WHEN s1.mh = s2.mh THEN 1 ELSE 0 END) / ${MinhashPerms.size}.0, 4) AS est_jaccard
         FROM cand c JOIN sig s1 ON c.doc_a = s1.doc_id
                     JOIN sig s2 ON c.doc_b = s2.doc_id AND s1.i = s2.i
         GROUP BY 1, 2 ORDER BY doc_a, doc_b""",

    // dedup quality evaluation: LSH candidate pairs vs exact-Jaccard
    // >= 0.5 ground truth — the precision/recall panel bands/rows get
    // tuned against (same CTEs as q24_dedup_minhash / q24_dedup_jaccard)
    "q24_dedup_eval" ->
      s"""$docShingles,
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         truth AS (SELECT doc_a, doc_b
                   FROM inter JOIN sz x ON doc_a = x.doc_id
                              JOIN sz y ON doc_b = y.doc_id
                   WHERE i / (x.n + y.n - i) >= 0.5),
         m AS (SELECT (SELECT count(*) FROM cand) AS nl,
                      (SELECT count(*) FROM truth) AS nt,
                      (SELECT count(*) FROM cand
                       JOIN truth USING (doc_a, doc_b)) AS nh)
         SELECT CAST(nl AS BIGINT) AS n_candidates,
                CAST(nt AS BIGINT) AS n_true,
                CAST(nh AS BIGINT) AS n_hit,
                round(CAST(nh AS DOUBLE) / nl, 4) AS lsh_precision,
                round(CAST(nh AS DOUBLE) / nt, 4) AS lsh_recall
         FROM m""",

    // sampled-truth dedup monitoring: the q24_dedup_eval panel with
    // BOTH arms restricted to pairs touching a deterministic
    // FIXED-SIZE content-hash sample (~target docs: hash % 10000
    // under a count-derived integer-ceil threshold — the q27_split
    // stable-hash discipline); mirrors Dedup.dedupEvalSampled
    "q24_dedup_eval_sampled" ->
      s"""$docShingles,
         smp AS (SELECT doc_id FROM documents
                 WHERE ${ddbPolyHash("text", P)} % 10000
                       < least(10000,
                           (${Dedup.DedupEvalSampleTarget} * 10000
                            + (SELECT count(*) FROM documents) - 1)
                           // (SELECT count(*) FROM documents))),
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         cand AS (SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
                  FROM bands x JOIN bands y
                  ON x.band = y.band AND x.bkey = y.bkey AND x.doc_id < y.doc_id
                  WHERE x.doc_id IN (SELECT doc_id FROM smp)
                     OR y.doc_id IN (SELECT doc_id FROM smp)),
         sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                   FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                   GROUP BY 1, 2),
         truth AS (SELECT doc_a, doc_b
                   FROM inter JOIN sz x ON doc_a = x.doc_id
                              JOIN sz y ON doc_b = y.doc_id
                   WHERE i / (x.n + y.n - i) >= 0.5
                     AND (doc_a IN (SELECT doc_id FROM smp)
                          OR doc_b IN (SELECT doc_id FROM smp))),
         m AS (SELECT (SELECT count(*) FROM smp) AS ns,
                      (SELECT count(*) FROM cand) AS nl,
                      (SELECT count(*) FROM truth) AS nt,
                      (SELECT count(*) FROM cand
                       JOIN truth USING (doc_a, doc_b)) AS nh)
         SELECT CAST(ns AS BIGINT) AS n_sample,
                CAST(nl AS BIGINT) AS n_candidates,
                CAST(nt AS BIGINT) AS n_true,
                CAST(nh AS BIGINT) AS n_hit,
                round(CAST(nh AS DOUBLE) / nl, 4) AS lsh_precision,
                round(CAST(nh AS DOUBLE) / nt, 4) AS lsh_recall
         FROM m""",

    // near-dup DELTA probe: delta band keys joined into the base's
    // banded signature table (same half split as q24_dedup_delta,
    // same banding as q24_dedup_minhash)
    "q24_neardup_probe" ->
      s"""$docShingles,
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         hl AS (SELECT count(*) // 2 AS half FROM documents),
         cand AS (SELECT DISTINCT y.doc_id AS delta_doc, x.doc_id AS base_doc
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bkey = y.bkey
                  CROSS JOIN hl
                  WHERE x.doc_id < half AND y.doc_id >= half)
         SELECT c.delta_doc, c.base_doc,
                round(sum(CASE WHEN s1.mh = s2.mh THEN 1 ELSE 0 END) / ${MinhashPerms.size}.0, 4) AS est_jaccard
         FROM cand c JOIN sig s1 ON c.delta_doc = s1.doc_id
                     JOIN sig s2 ON c.base_doc = s2.doc_id AND s1.i = s2.i
         GROUP BY 1, 2 ORDER BY delta_doc, base_doc""",

    // streaming near-dup ingest gate: docs arrive in chunk order
    // doc_id % 3; each batch probes the band index accumulated from
    // EARLIER chunks — so a pair reports iff it band-collides and the
    // base's chunk precedes the delta's
    "q29_neardup_stream" ->
      s"""$docShingles,
         hh AS (SELECT doc_id, ${ddbPolyHash("shingle", PM)} AS h FROM sh),
         sig AS (SELECT doc_id, i, min((a * h + b) % $PM) AS mh
                 FROM hh CROSS JOIN $ddbPermValues GROUP BY doc_id, i),
         bands AS (SELECT doc_id, i // $RowsPerBand AS band,
                          string_agg(CAST(mh AS VARCHAR), ',' ORDER BY i) AS bkey
                   FROM sig GROUP BY doc_id, i // $RowsPerBand),
         cand AS (SELECT DISTINCT y.doc_id AS delta_doc, x.doc_id AS base_doc
                  FROM bands x JOIN bands y
                    ON x.band = y.band AND x.bkey = y.bkey
                  WHERE x.doc_id % 3 < y.doc_id % 3)
         SELECT c.delta_doc, c.base_doc,
                round(sum(CASE WHEN s1.mh = s2.mh THEN 1 ELSE 0 END) / ${MinhashPerms.size}.0, 4) AS est_jaccard
         FROM cand c JOIN sig s1 ON c.delta_doc = s1.doc_id
                     JOIN sig s2 ON c.base_doc = s2.doc_id AND s1.i = s2.i
         GROUP BY 1, 2 ORDER BY delta_doc, base_doc""",

    // ANN recall evaluation: IVF single-cell ranking vs brute-force
    // ground truth over the identical candidate pool, recall@10 per
    // query — both arms' top-k as row_number windows vs the engine's
    // bounded heaps
    "q25_ann_recall" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                     WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM embeddings e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         q AS (SELECT vec_id AS qid, embedding AS qv, cell AS qcell
               FROM cells WHERE vec_id < 4),
         s AS (SELECT q.qid, q.qcell, x.vec_id, x.cell,
                      ${cos("x.embedding", "q.qv")} AS c
               FROM cells x CROSS JOIN q WHERE x.vec_id >= 4),
         b AS (SELECT qid, vec_id FROM (
                 SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                   ORDER BY c DESC, vec_id) AS rn FROM s) WHERE rn <= 10),
         i AS (SELECT qid, vec_id FROM (
                 SELECT qid, vec_id, row_number() OVER (PARTITION BY qid
                   ORDER BY c DESC, vec_id) AS rn FROM s
                 WHERE cell = qcell) WHERE rn <= 10),
         h AS (SELECT b.qid, CAST(count(*) AS BIGINT) AS hits
               FROM b JOIN i ON b.qid = i.qid AND b.vec_id = i.vec_id
               GROUP BY b.qid)
         SELECT q.qid, coalesce(h.hits, 0) AS hits,
                round(coalesce(h.hits, 0) / 10.0, 4) AS recall10
         FROM q LEFT JOIN h ON q.qid = h.qid ORDER BY q.qid""",

    // contrastive negative sampling: fixed affine probes, same-cell
    // candidates rejected, first-k by probe order (the heap's
    // score=-p vs this window — a fourth heap==row_number re-proof)
    "q25_negatives" ->
      s"""WITH ${flatCellCtes("embeddings")},
         ${negativesTail("embeddings")}
         SELECT vec_id, CAST(neg_rank AS BIGINT) AS neg_rank,
                cand AS neg_id
         FROM r WHERE neg_rank <= 3 ORDER BY vec_id, neg_rank""",

    // negatives with the cell assignment routed through the COARSE
    // two-level argmax (block leaders, then the winning block) — the
    // past-crossover production shape; same probe/rejection/first-k
    // contract over the coarse cells
    "q25_negatives_coarse" ->
      s"""WITH ${coarseCellCtes("embeddings")},
         ${negativesTail("embeddings")}
         SELECT vec_id, CAST(neg_rank AS BIGINT) AS neg_rank,
                cand AS neg_id
         FROM r WHERE neg_rank <= 3 ORDER BY vec_id, neg_rank""",

    // negatives over the DENSELY REMAPPED id space (rank-by-vec_id →
    // 0..n−1): the whole probe chain runs on dense ids, the output
    // maps back to original ids — mirrors Similarity.negativesDense;
    // on the (already dense) testdata this equals q25_negatives
    "q25_negatives_dense" ->
      s"""WITH dm AS (SELECT vec_id,
                row_number() OVER (ORDER BY vec_id) - 1 AS did
              FROM embeddings),
         de AS (SELECT dm.did AS vec_id, e.embedding
                FROM embeddings e JOIN dm ON e.vec_id = dm.vec_id),
         ${flatCellCtes("de")},
         ${negativesTail("de")}
         SELECT ma.vec_id, CAST(r.neg_rank AS BIGINT) AS neg_rank,
                mb.vec_id AS neg_id
         FROM r JOIN dm ma ON r.vec_id = ma.did
                JOIN dm mb ON r.cand = mb.did
         WHERE r.neg_rank <= 3 ORDER BY ma.vec_id, neg_rank""",

    // IR evaluation battery: rank by the q10 tf-idf dataflow, score
    // top-10 against the deterministic tf>=EvalRelMinTf qrels —
    // recall@10 / MRR / nDCG@10 per query; the row_number window here
    // re-proves the engine's bounded-heap top-k a third time
    "q39_ir_eval" -> {
      val terms = graft.queries.IrSql.EvalQueryTerms
        .map("'" + _ + "'").mkString(", ")
      val minTf = graft.queries.IrSql.EvalRelMinTf
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'), ' ')) AS term
                   FROM documents),
         tf AS (SELECT term, doc_id, count(*) AS tf FROM tok
                WHERE term IN ($terms) GROUP BY 1, 2),
         wdf AS (SELECT *, count(*) OVER (PARTITION BY term) AS df FROM tf),
         nn AS (SELECT count(*) AS n FROM documents),
         scored AS (SELECT term, doc_id,
                           round((1.0 + ln(tf)) * log10(CAST(n AS DOUBLE) / df), 4) AS score
                    FROM wdf CROSS JOIN nn),
         ranked AS (SELECT term, doc_id,
                           row_number() OVER (PARTITION BY term
                             ORDER BY score DESC, doc_id) AS rank
                    FROM scored),
         top AS (SELECT * FROM ranked WHERE rank <= 10),
         rel AS (SELECT term, doc_id FROM tf WHERE tf >= $minTf),
         nrel AS (SELECT term, CAST(count(*) AS BIGINT) AS n_rel
                  FROM rel GROUP BY term),
         h AS (SELECT t.term, t.rank,
                      CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END AS is_rel
               FROM top t LEFT JOIN rel r
                 ON t.term = r.term AND t.doc_id = r.doc_id),
         m AS (SELECT term, CAST(sum(is_rel) AS DOUBLE) AS hits,
                      max(CASE WHEN is_rel = 1 THEN 1.0 / rank ELSE 0.0 END) AS mrr0,
                      sum(CAST(is_rel AS DOUBLE) / log2(rank + 1.0)) AS dcg
               FROM h GROUP BY term)
         SELECT m.term, nrel.n_rel,
                round(m.hits / nrel.n_rel, 4) AS recall10,
                round(m.mrr0, 4) AS mrr,
                round(m.dcg / list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, CAST(least(10, nrel.n_rel) AS BIGINT) + 1),
                    i -> 1.0 / log2(CAST(i AS DOUBLE) + 1.0))),
                  (a, b) -> a + b), 4) AS ndcg10
         FROM m JOIN nrel ON m.term = nrel.term ORDER BY m.term"""
    },

    // Matryoshka truncated-dimension ANN: exact cosine over the first
    // 8 dims only (list_slice prefixes on both sides)
    "q25_ann_mrl" ->
      s"""WITH q AS (SELECT list_slice(embedding, 1, 8) AS qv
                     FROM embeddings WHERE vec_id = 0),
         s AS (SELECT vec_id,
                      ${cos("list_slice(embedding, 1, 8)", "qv")} AS c
               FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
         SELECT vec_id, round(c, 4) AS cos FROM s
         ORDER BY c DESC, vec_id LIMIT 10""",

    // PLAIN cell-bounded k-NN graph (the reference arm): the engine's
    // bounded-heap top-k per vector vs the WINDOW form over the same
    // same-cell candidates — the compare re-proves heap == row_number
    // on this shape. Cells use the DYNAMIC k (n/128, the semdedup
    // discipline) so the oracle stays correct at any SF
    "q25_knn_graph_plain" ->
      s"""WITH ${flatCellCtes("embeddings")},
         p AS (SELECT x.vec_id AS src, y.vec_id AS nbr,
                      ${cos("x.embedding", "y.embedding")} AS c
               FROM cells x JOIN cells y
                 ON x.cell = y.cell AND x.vec_id <> y.vec_id),
         r AS (SELECT src, nbr, c,
                      row_number() OVER (PARTITION BY src
                        ORDER BY c DESC, nbr) AS rn
               FROM p)
         SELECT src AS vec_id, CAST(rn AS BIGINT) AS rn, nbr,
                round(c, 4) AS cos
         FROM r WHERE rn <= 3 ORDER BY vec_id, rn""",

    // the DEFAULT k-NN graph now routes through the occupancy-
    // BALANCED assignment (r12 VERDICT: plain was super-linear under
    // skew) — the oracle replicates the balanced rule over the flat
    // cells, shared verbatim with q25_knn_graph_balanced so the two
    // entries cannot drift
    "q25_knn_graph" -> knnGraphBalancedSqlOver(flatCellCtes("embeddings")),

    // the k-NN graph over the occupancy-BALANCED assignment: cells
    // past the cap re-seed on their m smallest vec_ids (sub-seed id =
    // id rank - 1) and re-argmax with the family (cos desc, sid asc)
    // tie rule; under-cap cells keep sub = 0 — mirrors
    // Similarity.balancedCellsOf + knnGraphBalanced exactly
    "q25_knn_graph_balanced" ->
      knnGraphBalancedSqlOver(flatCellCtes("embeddings")),

    // the k-NN graph with the cell assignment routed through the
    // COARSE two-level argmax — the past-crossover production shape;
    // the balanced re-split applies over the coarse cells exactly as
    // the entry (knnGraph(coarse=true) routes balanced too)
    "q25_knn_graph_coarse" ->
      knnGraphBalancedSqlOver(coarseCellCtes("embeddings")),


    // streaming ANN ingest gate: vectors arrive in chunk order
    // vec_id % 3; a pair reports iff both land in the SAME IVF cell
    // (argmax assignment against the fixed seed centroids — the
    // q25_ann_ivf cells CTE), exact cosine >= AnnStreamTau, and the
    // base's chunk precedes the delta's
    "q29_ann_stream" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                     WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM embeddings e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         p AS (SELECT y.vec_id AS delta_vec, x.vec_id AS base_vec,
                      ${cos("x.embedding", "y.embedding")} AS c
               FROM cells x JOIN cells y
                 ON x.cell = y.cell AND x.vec_id % 3 < y.vec_id % 3)
         SELECT delta_vec, base_vec, round(c, 4) AS cos FROM p
         WHERE c >= ${graft.queries.IrEngine.AnnStreamTau}
         ORDER BY delta_vec, base_vec""",

    // sliding-window chunking: geometry generated from the engine's
    // ChunkTokens/ChunkStride constants; the last chunk_id is
    // ceil((n - w) / s) so a trailing window wholly contained in the
    // previous one is suppressed (mirrors TextAnalysis.chunk)
    "q27_chunk" -> {
      val w = TextAnalysis.ChunkTokens
      val s = TextAnalysis.ChunkStride
      s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
         f AS (SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS n
               FROM t WHERE len(toks) > 0),
         cx AS (SELECT doc_id, toks, n,
                       unnest(range(0, CASE WHEN n <= $w THEN 1
                         ELSE (n - $w + $s - 1) // $s + 1 END)) AS chunk_id
                FROM f)
         SELECT doc_id, CAST(chunk_id AS BIGINT) AS chunk_id,
                CAST(chunk_id * $s AS BIGINT) AS start_tok,
                CAST(least($w, n - chunk_id * $s) AS BIGINT) AS n_tokens,
                array_to_string(
                  list_slice(toks, chunk_id * $s + 1, chunk_id * $s + $w),
                  ' ') AS chunk_text
         FROM cx ORDER BY doc_id, chunk_id"""
    },

    // epoch-weighted upsampling: the per-lang CASE chains are
    // generated from UpsampleWeights (one definition)
    "q27_upsample" -> {
      val baseCase = TextAnalysis.UpsampleWeights
        .map { case (l, b, _) => s"WHEN lang = '$l' THEN $b" }
        .mkString("CASE ", " ", s" ELSE ${TextAnalysis.UpsampleDefault._1} END")
      val pctCase = TextAnalysis.UpsampleWeights
        .map { case (l, _, e) => s"WHEN lang = '$l' THEN $e" }
        .mkString("CASE ", " ", s" ELSE ${TextAnalysis.UpsampleDefault._2} END")
      s"""WITH h AS (SELECT doc_id, lang,
                            ${ddbPolyHash("text")} % 100 AS hv
                     FROM documents),
         w AS (SELECT doc_id, lang,
                      ($baseCase) +
                      (CASE WHEN hv < ($pctCase) THEN 1 ELSE 0 END) AS copies
               FROM h),
         cx AS (SELECT doc_id, lang,
                       unnest(range(1, copies + 1)) AS copy
                FROM w WHERE copies > 0)
         SELECT doc_id, CAST(copy AS BIGINT) AS copy, lang
         FROM cx ORDER BY doc_id, copy"""
    },

    // same pair generation as q24_dedup_jaccard, then connected
    // components via a recursive reachability CTE (UNION dedup
    // terminates the recursion); cluster = min reachable doc_id
    "q24_dedup_clusters" ->
      s"""$clusterCtes
         SELECT node AS doc_id, min(m) AS cluster,
                CASE WHEN min(m) = node THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS keeper
         FROM r GROUP BY node ORDER BY doc_id""",

    // quality-aware survivor per near-dup cluster: keep-longest (token
    // count), tie-broken by min doc_id — the window form here is
    // output-identical to the engine's single max(struct) aggregate
    "q24_dedup_survivors" ->
      s"""$clusterCtes,
         lab AS (SELECT node AS doc_id, min(m) AS cluster
                 FROM r GROUP BY node),
         tl AS (SELECT doc_id, CAST(len($toks) AS BIGINT) AS n_tokens
                FROM documents),
         j AS (SELECT cluster, lab.doc_id AS doc_id, n_tokens
               FROM lab JOIN tl ON lab.doc_id = tl.doc_id),
         sel AS (SELECT cluster, doc_id, n_tokens,
                        row_number() OVER (PARTITION BY cluster
                          ORDER BY n_tokens DESC, doc_id) AS rn,
                        count(*) OVER (PARTITION BY cluster) AS nm
                 FROM j)
         SELECT cluster, doc_id AS survivor, n_tokens AS survivor_tokens,
                CAST(nm AS BIGINT) AS n_members
         FROM sel WHERE rn = 1 ORDER BY cluster""",

    "q24_simhash" -> (simhashSql + " ORDER BY doc_id"),

    "q24_simhash_pairs" ->
      s"""WITH s AS ($simhashSql)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
                CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
         FROM s a JOIN s b ON a.doc_id < b.doc_id
         WHERE bit_count(xor(a.simhash, b.simhash)) <= 1
         ORDER BY doc_a, doc_b""",

    "q25_cosine_pairs" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 100)
         SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                round(${cos("a.embedding", "b.embedding")}, 4) + 0.0 AS cos
         FROM e a JOIN e b ON a.vec_id < b.vec_id
         ORDER BY vec_a, vec_b""",

    "q25_ann_topk" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         s AS (SELECT vec_id, ${cos("embedding", "qv")} AS c
               FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
         SELECT vec_id, round(c, 4) AS cos FROM s ORDER BY c DESC, vec_id LIMIT 20""",

    "q25_embed_neardup" ->
      s"""WITH e AS (SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200),
         p AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
                      ${cos("a.embedding", "b.embedding")} AS c
               FROM e a JOIN e b ON a.vec_id < b.vec_id)
         SELECT vec_a, vec_b, round(c, 4) AS cos FROM p
         WHERE c >= 0.35 ORDER BY vec_a, vec_b""",

    // k-NN join: per-query rank window over the broadcast query set
    "q25_knn_join" ->
      s"""WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
                     WHERE vec_id < 4),
         s AS (SELECT qid, vec_id, ${cos("embedding", "qv")} AS c,
                      row_number() OVER (PARTITION BY qid
                        ORDER BY ${cos("embedding", "qv")} DESC, vec_id) AS rn
               FROM embeddings CROSS JOIN q WHERE vec_id >= 4)
         SELECT qid, CAST(rn AS BIGINT) AS rn, vec_id,
                round(c, 4) + 0.0 AS cos
         FROM s WHERE rn <= 5 ORDER BY qid, rn""",

    // SemDeDup clusters: recursive reachability over the cosine≥0.35
    // pair graph (same CTE shape as q24_dedup_clusters)
    "q25_semantic_clusters" ->
      s"""WITH RECURSIVE em AS (SELECT vec_id, embedding FROM embeddings
                                WHERE vec_id < 200),
         p AS (SELECT a.vec_id AS u0, b.vec_id AS v0
               FROM em a JOIN em b ON a.vec_id < b.vec_id
               WHERE ${cos("a.embedding", "b.embedding")} >= 0.35),
         e AS (SELECT u0 AS u, v0 AS v FROM p
               UNION ALL SELECT v0, u0 FROM p),
         nodes AS (SELECT DISTINCT u AS node FROM e),
         r AS (SELECT node, node AS m FROM nodes
               UNION
               SELECT r.node, e.v FROM r JOIN e ON r.m = e.u)
         SELECT node AS vec_id, min(m) AS cluster,
                CASE WHEN min(m) = node THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS keeper
         FROM r GROUP BY node ORDER BY vec_id""",

    // corpus-scale SemDeDup candidate pairs: dynamic-k argmax-cosine
    // cells (k = max(IvfCentroids, ceil(n/SemDedupCellSize)), seeds =
    // first k vectors), exact cosine only WITHIN a cell — mirrors
    // Similarity.semDedupPairs over the ENTIRE table, no sample gate
    // the flat exact assignment as its own checked artifact
    "q25_semdedup_cells" ->
      s"""WITH $semDedupPairCtes
         SELECT vec_id, CAST(cell AS BIGINT) AS cell FROM cells
         ORDER BY vec_id""",

    // two-level coarse-routed assignment: argmax over every-B-th seed
    // (block leaders), then argmax within the winning ⌈√k⌉-wide seed
    // block — both levels (cos desc, cid asc), mirroring
    // Similarity.semDedupCellsCoarse exactly
    "q25_semdedup_cells_coarse" ->
      s"""WITH kk AS (SELECT greatest(${Similarity.IvfCentroids},
                CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT)) AS k,
                CAST(ceil(sqrt(greatest(${Similarity.IvfCentroids},
                  CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT)))) AS BIGINT) AS b
              FROM embeddings),
         s AS (SELECT vec_id AS cid, embedding AS cvec, vec_id // b AS blk
               FROM embeddings CROSS JOIN kk WHERE vec_id < k),
         ld AS (SELECT s.* FROM s CROSS JOIN kk WHERE cid % b = 0),
         a0 AS (SELECT e.vec_id, e.embedding, ld.blk,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY ${cos("e.embedding", "ld.cvec")} DESC, ld.cid) AS rn
                FROM embeddings e CROSS JOIN ld),
         r0 AS (SELECT vec_id, embedding, blk FROM a0 WHERE rn = 1),
         a1 AS (SELECT r0.vec_id, s.cid,
                       row_number() OVER (PARTITION BY r0.vec_id
                         ORDER BY ${cos("r0.embedding", "s.cvec")} DESC, s.cid) AS rn
                FROM r0 JOIN s ON r0.blk = s.blk)
         SELECT vec_id, CAST(cid AS BIGINT) AS cell FROM a1 WHERE rn = 1
         ORDER BY vec_id""",

    // the DEFAULT pairs now route through the occupancy-balanced
    // (cell, sub) buckets (the knnGraph decision applied to the pair
    // family); the plain cell-only shape stays pinned as its own arm
    "q25_semdedup_pairs" ->
      s"""WITH ${balancedPairCtes(flatCellCtes("embeddings"))}
         SELECT vec_a, vec_b, round(c, 4) AS cos FROM p
         WHERE c >= ${Similarity.SemDedupThreshold} ORDER BY vec_a, vec_b""",

    "q25_semdedup_pairs_plain" ->
      s"""WITH $semDedupPairCtes
         SELECT vec_a, vec_b, round(c, 4) AS cos FROM p
         WHERE c >= ${Similarity.SemDedupThreshold} ORDER BY vec_a, vec_b""",

    // SemDeDup recall eval: cell-bounded pairs vs exact all-pairs
    // truth on the vec_id<200 sample — the boundary-miss panel
    // (precision is structurally 1: cell pairs are exact-scored, a
    // subset of truth)
    "q25_semdedup_eval" ->
      s"""WITH ${balancedPairCtes(flatCellCtes("embeddings"))},
         cp AS (SELECT vec_a, vec_b FROM p
                WHERE c >= ${Similarity.SemDedupThreshold}
                  AND vec_a < 200 AND vec_b < 200),
         t AS (SELECT a.vec_id AS vec_a, b.vec_id AS vec_b
               FROM embeddings a JOIN embeddings b
                 ON a.vec_id < b.vec_id
               WHERE a.vec_id < 200 AND b.vec_id < 200
                 AND ${cos("a.embedding", "b.embedding")}
                   >= ${Similarity.SemDedupThreshold}),
         m AS (SELECT (SELECT count(*) FROM cp) AS nc,
                      (SELECT count(*) FROM t) AS nt,
                      (SELECT count(*) FROM cp
                       JOIN t USING (vec_a, vec_b)) AS nh)
         SELECT CAST(nc AS BIGINT) AS n_cell_pairs,
                CAST(nt AS BIGINT) AS n_true_pairs,
                CAST(nh AS BIGINT) AS n_hit,
                round(CAST(nh AS DOUBLE) / nt, 4) AS cell_recall
         FROM m""",

    // the SemDeDup pair stage with the COARSE-routed cells — the
    // knob hash-checked through the pipeline's candidate generation,
    // not just the assignment artifact
    "q25_semdedup_pairs_coarse" ->
      s"""WITH ${balancedPairCtes(coarseCellCtes("embeddings"))}
         SELECT vec_a, vec_b, round(c, 4) AS cos FROM p
         WHERE c >= ${Similarity.SemDedupThreshold} ORDER BY vec_a, vec_b""",

    // full-corpus SemDeDup: recursive reachability + keeper flag over
    // the cell-bounded pair graph (same cluster CTE shape as
    // q25_semantic_clusters; mirrors Similarity.semDedupFull)
    "q25_semdedup_full" ->
      s"""WITH RECURSIVE ${balancedPairCtes(flatCellCtes("embeddings"))},
         g AS (SELECT vec_a AS u0, vec_b AS v0 FROM p
               WHERE c >= ${Similarity.SemDedupThreshold}),
         e AS (SELECT u0 AS u, v0 AS v FROM g
               UNION ALL SELECT v0, u0 FROM g),
         nodes AS (SELECT DISTINCT u AS node FROM e),
         r AS (SELECT node, node AS m FROM nodes
               UNION
               SELECT r.node, e.v FROM r JOIN e ON r.m = e.u)
         SELECT node AS vec_id, min(m) AS cluster,
                CASE WHEN min(m) = node THEN CAST(1 AS BIGINT)
                     ELSE CAST(0 AS BIGINT) END AS keeper
         FROM r GROUP BY node ORDER BY vec_id""",

    // corpus-scale SemDeDup applied: docs surviving the semantic gate
    // (drop = non-keeper cluster members; vec_id aligns 1:1 with
    // doc_id in the testdata — mirrors Similarity.semDedupSurvivors)
    "q25_semdedup_survivors" ->
      s"""WITH RECURSIVE ${balancedPairCtes(flatCellCtes("embeddings"))},
         g AS (SELECT vec_a AS u0, vec_b AS v0 FROM p
               WHERE c >= ${Similarity.SemDedupThreshold}),
         e AS (SELECT u0 AS u, v0 AS v FROM g
               UNION ALL SELECT v0, u0 FROM g),
         nodes AS (SELECT DISTINCT u AS node FROM e),
         r AS (SELECT node, node AS m FROM nodes
               UNION
               SELECT r.node, e.v FROM r JOIN e ON r.m = e.u),
         dropset AS (SELECT node AS doc_id FROM r
                     GROUP BY node HAVING min(m) <> node)
         SELECT d.doc_id, d.lang, d.n_chars
         FROM documents d LEFT JOIN dropset USING (doc_id)
         WHERE dropset.doc_id IS NULL ORDER BY d.doc_id""",

    // int8-quantized brute-force ANN: scale = max|v|, codes =
    // floor(v*127/sc + 0.5); cosine over the integer codes (scale
    // cancels), integer sums exact in double folds
    "q25_ann_quantized" ->
      s"""WITH e AS (SELECT vec_id,
                       list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
         s AS (SELECT vec_id, v,
                      list_aggregate(list_transform(v, x -> abs(x)), 'max') AS sc
               FROM e),
         q8 AS (SELECT vec_id,
                       list_transform(v, x -> floor(x * 127 / sc + 0.5)) AS q
                FROM s WHERE sc > 0),
         qq AS (SELECT q AS qv FROM q8 WHERE vec_id = 0),
         sc2 AS (SELECT vec_id,
                        ${dot("q", "qv")} AS d,
                        ${dot("q", "q")} AS na,
                        ${dot("qv", "qv")} AS nb
                 FROM q8 CROSS JOIN qq WHERE vec_id <> 0)
         SELECT vec_id, round(d / (sqrt(na) * sqrt(nb)), 4) + 0.0 AS qcos
         FROM sc2 ORDER BY d / (sqrt(na) * sqrt(nb)) DESC, vec_id LIMIT 10""",

    // binary (sign-bit) ANN: Hamming pre-rank over the packed sign
    // codes (here unpacked per-dim — the COUNT is identical to
    // bit_count(xor) on the packed longs), deterministic candidate
    // cut, exact-cosine re-rank of the bounded list
    "q25_ann_binary" ->
      s"""WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         h AS (SELECT e.vec_id,
                 list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, len(e.embedding) + 1),
                     i -> CASE WHEN (e.embedding[i] >= 0) <> (qv[i] >= 0)
                          THEN CAST(1 AS BIGINT)
                          ELSE CAST(0 AS BIGINT) END)),
                   (acc, v) -> acc + v) AS hamming
               FROM embeddings e CROSS JOIN q WHERE e.vec_id <> 0),
         cand AS (SELECT vec_id, hamming FROM h
                  ORDER BY hamming, vec_id
                  LIMIT ${Similarity.BinaryCandidates}),
         rr AS (SELECT c.vec_id, c.hamming,
                       ${cos("e.embedding", "qv")} AS cs
                FROM cand c JOIN embeddings e ON e.vec_id = c.vec_id
                CROSS JOIN q)
         SELECT vec_id, hamming, round(cs, 4) + 0.0 AS cos
         FROM rr ORDER BY cs DESC, vec_id LIMIT 10""",

    "q25_ann_lsh" ->
      s"""WITH $lshBucketCtes
         SELECT bucket, count(*) AS n FROM b GROUP BY bucket ORDER BY bucket""",

    // multi-probe: query bucket + its 16 one-bit flips, broadcast-shaped
    // probe join, exact cosine re-rank (mirrors Similarity.annLshMultiProbe)
    "q25_ann_multiprobe" ->
      s"""WITH $lshBucketCtes,
         q AS (SELECT b.bucket AS qb, e.embedding AS qv
               FROM b JOIN embeddings e USING (vec_id) WHERE e.vec_id = 0),
         probes AS (SELECT qv,
                           unnest(list_prepend(qb,
                             list_transform(range(${Similarity.Planes}),
                               j -> xor(qb, CAST(1 AS BIGINT) << CAST(j AS INT))))) AS pb
                    FROM q),
         s AS (SELECT e.vec_id, ${cos("e.embedding", "p.qv")} AS c
               FROM b JOIN embeddings e USING (vec_id)
                      JOIN probes p ON b.bucket = p.pb
               WHERE e.vec_id <> 0)
         SELECT vec_id, round(c, 4) AS cos FROM s ORDER BY c DESC, vec_id LIMIT 10""",

    // 2^40 fixed-point quantization (exact power-of-two multiply on a
    // float), exact integer sum per (label, dim) — order-insensitive on
    // both engines; mirrors Similarity.labelCentroids step for step
    "q25_centroids" ->
      s"""WITH x AS (SELECT CAST(label AS BIGINT) AS label,
                            CAST(generate_subscripts(embedding, 1) AS BIGINT) AS dim,
                            CAST(round(CAST(unnest(embedding) AS DOUBLE) * ${Similarity.CentroidScale}) AS BIGINT) AS l
                     FROM embeddings)
         SELECT label, dim,
                round(CAST(sum(l) AS DOUBLE) / ${Similarity.CentroidScale} / count(*), 4) AS c,
                count(*) AS n
         FROM x GROUP BY label, dim ORDER BY label, dim""",

    "q25_ann_ivf" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                     WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM embeddings e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         q AS (SELECT cell AS qcell, embedding AS qv FROM cells WHERE vec_id = 0)
         SELECT x.vec_id, round(${cos("x.embedding", "qv")}, 4) AS cos
         FROM cells x JOIN q ON x.cell = q.qcell
         WHERE x.vec_id <> 0
         ORDER BY ${cos("x.embedding", "qv")} DESC, x.vec_id LIMIT 10""",

    // IVF probe over a store with the fixed takedown tombstoned
    // (Similarity.annIvfDeleted): results == the same probe over a
    // corpus that never held the deleted ids. Assignment is per-row
    // (independent of other rows), so the cells CTE is q25_ann_ivf's
    // verbatim — including DELETED seeds as coordinates (the
    // retained-coordinate rule) — and only the final ranking excludes
    // the takedown set. q25_ann_ivf_deleted_compacted shares this SQL:
    // physical reclaim must not change any answer.
    "q25_ann_ivf_deleted" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                     WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM embeddings e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         q AS (SELECT cell AS qcell, embedding AS qv FROM cells WHERE vec_id = 0)
         SELECT x.vec_id, round(${cos("x.embedding", "qv")}, 4) AS cos
         FROM cells x JOIN q ON x.cell = q.qcell
         WHERE x.vec_id <> 0
           AND x.vec_id % ${Similarity.DeletedVecsMod} <> ${Similarity.DeletedVecsRem}
         ORDER BY ${cos("x.embedding", "qv")} DESC, x.vec_id LIMIT 10""",

    // IVF probe over a store with the fixed re-crawl set UPDATED in
    // place (Similarity.annIvfUpdated): the probe computed over the
    // embeddings table with the update set's vectors REPLACED
    // (negated). One updated id (3) is a seed, so the coordinate
    // system itself re-derives — the seeds CTE reads the UPDATED
    // vectors, exactly what the entry's re-coordinate leg produces.
    "q25_ann_ivf_updated" ->
      s"""WITH emb2 AS (SELECT vec_id,
                CASE WHEN vec_id % ${Similarity.UpdatedVecsMod} = ${Similarity.UpdatedVecsRem}
                     THEN list_transform(embedding, v -> -v)
                     ELSE embedding END AS embedding
              FROM embeddings),
         c AS (SELECT vec_id AS cid, embedding AS cvec FROM emb2
               WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM emb2 e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         q AS (SELECT cell AS qcell, embedding AS qv FROM cells WHERE vec_id = 0)
         SELECT x.vec_id, round(${cos("x.embedding", "qv")}, 4) AS cos
         FROM cells x JOIN q ON x.cell = q.qcell
         WHERE x.vec_id <> 0
         ORDER BY ${cos("x.embedding", "qv")} DESC, x.vec_id LIMIT 10""",

    // filtered exact ANN: pre-filter semantics — rank only vectors
    // whose 1:1 document passes the metadata predicate (mirrors
    // Similarity.annFiltered; predicate constants shared)
    "q25_ann_filtered" -> annFilteredSql,

    // filtered IVF ANN: nProbe=2 cell routing as q25_ann_ivf_nprobe,
    // metadata filter applied inside the probed-cell candidate set
    // (mirrors Similarity.annIvfFiltered)
    "q25_ann_ivf_filtered" -> annIvfFilteredSql(2),

    // adaptive filtered probe: the escalation rule replicated in SQL
    // (ladder choice hash-checked, not just the final ranking)
    "q25_ann_filtered_auto" -> annIvfFilteredAutoSql(k = 10),

    // filtered-ANN recall panel: every arm wraps the SAME SQL the
    // standalone entries run (annIvfFilteredSql at nProbe 1 and 2,
    // plus the adaptive probe) against the exact pre-filtered truth —
    // mirrors Similarity.annFilteredRecallEval
    "q25_ann_filtered_recall" -> {
      val arms = (Seq(1, 2).map { np =>
        s"""SELECT 'nprobe$np' AS method,
              CAST((SELECT count(*)
                    FROM (${annIvfFilteredSql(np)}) m$np
                    JOIN truth USING (vec_id)) AS BIGINT) AS hits"""
      } ++ Seq(
        s"""SELECT 'auto' AS method,
              CAST((SELECT count(*)
                    FROM (${annIvfFilteredAutoSql(k = 10)}) ma
                    JOIN truth USING (vec_id)) AS BIGINT) AS hits""",
        // the coded adaptive arm wraps the SAME SQL the standalone
        // q25_ann_ivfpq_filtered_auto entry hash-checks
        s"""SELECT 'auto_pq' AS method,
              CAST((SELECT count(*)
                    FROM (${annIvfPqSql(filtered = true, auto = true)}) mq
                    JOIN truth USING (vec_id)) AS BIGINT) AS hits"""))
        .mkString(" UNION ALL ")
      s"""WITH truth AS (SELECT vec_id FROM ($annFilteredSql) tt),
         h AS ($arms)
         SELECT method, hits,
                round(CAST(hits AS DOUBLE) / 10, 4) AS recall10
         FROM h ORDER BY method"""
    },

    // IVF with nProbe=2: rank all centroids against the query, probe
    // the top two cells, exact re-rank (mirrors Similarity.annIvfProbe)
    "q25_ann_ivf_nprobe" ->
      s"""WITH c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
                     WHERE vec_id < ${Similarity.IvfCentroids}),
         a AS (SELECT e.vec_id, e.embedding, c.cid,
                      row_number() OVER (PARTITION BY e.vec_id
                        ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
               FROM embeddings e CROSS JOIN c),
         cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
         q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
         qc AS (SELECT c.cid FROM c CROSS JOIN q
                ORDER BY ${cos("q.qv", "c.cvec")} DESC, c.cid LIMIT 2),
         s AS (SELECT x.vec_id, ${cos("x.embedding", "q.qv")} AS c
               FROM cells x JOIN qc ON x.cell = qc.cid CROSS JOIN q
               WHERE x.vec_id <> 0)
         SELECT vec_id, round(c, 4) AS cos FROM s ORDER BY c DESC, vec_id LIMIT 10""",

    // Lloyd's k-means, 2 unrolled iterations: seed centroids =
    // vec_id < IvfCentroids, argmax-cosine assignment, 2^40 fixed-point
    // exact-sum means rounded to 4 decimals between iterations
    // (mirrors Similarity.kmeansCentroids step for step)
    "q25_kmeans" -> {
      def iter(i: Int, centsCte: String): String =
        s"""a$i AS (SELECT e.vec_id, e.v, c.cid,
                          row_number() OVER (PARTITION BY e.vec_id
                            ORDER BY ${cos("e.v", "c.cvec")} DESC, c.cid) AS rn
                   FROM e CROSS JOIN $centsCte c),
           x$i AS (SELECT cid, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
                          CAST(round(unnest(v) * ${Similarity.CentroidScale}) AS BIGINT) AS l
                   FROM a$i WHERE rn = 1),
           m$i AS (SELECT cid, dim,
                          round(CAST(sum(l) AS DOUBLE) / ${Similarity.CentroidScale} / count(*), 4) + 0.0 AS c,
                          CAST(count(*) AS BIGINT) AS n
                   FROM x$i GROUP BY cid, dim)"""
      s"""WITH e AS (SELECT vec_id,
                            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
                     FROM embeddings),
         c0 AS (SELECT vec_id AS cid, v AS cvec FROM e
                WHERE vec_id < ${Similarity.IvfCentroids}),
         ${iter(1, "c0")},
         c1 AS (SELECT cid, list(c ORDER BY dim) AS cvec FROM m1 GROUP BY cid),
         ${iter(2, "c1")}
         SELECT cid, dim, c, n FROM m2 ORDER BY cid, dim"""
    },

    "q27_langid" ->
      s"""WITH tok AS (SELECT doc_id, unnest($toks) AS term FROM documents),
         r AS (SELECT doc_id,
                      round(sum(CASE WHEN term IN (${TextAnalysis.EnStopwords.map("'" + _ + "'").mkString(", ")}) THEN 1 ELSE 0 END)
                            / CAST(count(*) AS DOUBLE), 4) AS stop_ratio
               FROM tok GROUP BY doc_id)
         SELECT doc_id, stop_ratio,
                CASE WHEN stop_ratio >= 0.03 THEN 'en' ELSE 'other' END AS lang_pred
         FROM r ORDER BY doc_id""",

    // filter apply: the lang/quality gate composed into the kept corpus
    "q27_filter_apply" ->
      s"""WITH $filterKeptCtes
         SELECT doc_id, stop_ratio, n_tokens, alnum_ratio FROM kept
         ORDER BY doc_id""",

    // the whole pipeline (dedup keepers → quality gate → hash sample)
    // as one statement — mirrors TextAnalysis.corpusPipeline
    "q27_pipeline" ->
      s"""WITH $filterKeptCtes,
         keepers AS (SELECT min(doc_id) AS doc_id FROM documents
                     GROUP BY md5(text)),
         samp AS (SELECT doc_id, ${ddbPolyHash("text")} % 10 AS bucket
                  FROM documents)
         SELECT kept.doc_id, n_tokens, bucket
         FROM kept JOIN keepers ON kept.doc_id = keepers.doc_id
                   JOIN samp ON kept.doc_id = samp.doc_id
         WHERE bucket < 8
         ORDER BY kept.doc_id""",

    // PII redaction over the deterministically-enriched corpus; the
    // regexes are shared Scala constants (same meaning in RE2/Java)
    "q27_redact" -> {
      // DuckDB standard strings don't process backslash escapes, so the
      // Scala regex value (containing literal `\.`) embeds verbatim
      val em = TextAnalysis.EmailRe
      val ph = TextAnalysis.PhoneRe
      s"""WITH e AS (SELECT doc_id,
                text || ' contact user' || doc_id || '@example.com or 555-0' ||
                printf('%03d', doc_id % 1000) || '-' ||
                printf('%04d', (doc_id * 7) % 10000) || '.' AS t
              FROM documents)
         SELECT doc_id,
                md5(regexp_replace(regexp_replace(t, '$em', '<EMAIL>', 'g'),
                                   '$ph', '<PHONE>', 'g')) AS clean_digest,
                CAST(len(regexp_extract_all(t, '$em')) AS BIGINT) AS n_emails,
                CAST(len(regexp_extract_all(t, '$ph')) AS BIGINT) AS n_phones
         FROM e ORDER BY doc_id"""
    },

    "q27_quality" ->
      s"""WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars_raw, $toks AS toks
                     FROM documents)
         SELECT doc_id, n_chars_raw, CAST(len(toks) AS BIGINT) AS n_tokens,
                round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(toks, t -> CAST(length(t) AS BIGINT))), (a, b) -> a + b) AS DOUBLE)
                      / len(toks), 4) AS avg_token_len,
                round(CAST(length(array_to_string(toks, ' ')) + 1 AS DOUBLE) / (n_chars_raw + 1), 4) AS alnum_ratio
         FROM d ORDER BY doc_id""",

    "q27_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_split_to_array(text, '\s+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9 ]')) AS BIGINT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",

    // per-domain quality quantile gate: mean token length scored per
    // doc, each source's p75 as its own bar (quantile_cont == Spark's
    // exact linear-interpolation percentile on the 4-rounded scores)
    "q27_domain_topq" ->
      s"""WITH s AS (SELECT doc_id, source,
                round(CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                        list_transform(toks, t -> CAST(length(t) AS BIGINT))),
                        (a, b) -> a + b) AS DOUBLE)
                      / len(toks), 4) AS score
              FROM (SELECT doc_id, source, $toks AS toks FROM documents)
              WHERE len(toks) > 0),
         th AS (SELECT source,
                       round(quantile_cont(score,
                         ${TextAnalysis.DomainQualityPct}), 4) AS thr
                FROM s GROUP BY source)
         SELECT s.doc_id, s.source, s.score, th.thr
         FROM s JOIN th USING (source)
         WHERE s.score >= th.thr ORDER BY doc_id""",

    // token-distribution drift panel: JS divergence (base 2) between
    // the even- and odd-doc_id halves' unigram distributions, summed
    // in 1e-9 fixed point so the total is summation-order-exact
    "q27_token_drift" ->
      s"""WITH tok AS (SELECT doc_id % 2 = 0 AS is_a, unnest($toks) AS term
                       FROM documents),
         c AS (SELECT term,
                 CAST(sum(CASE WHEN is_a THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(sum(CASE WHEN NOT is_a THEN 1 ELSE 0 END) AS BIGINT) AS cb
               FROM tok GROUP BY term),
         t AS (SELECT CAST(sum(ca) AS BIGINT) AS ta,
                      CAST(sum(cb) AS BIGINT) AS tb FROM c),
         k AS (SELECT ca, cb, ta, tb,
                 CAST(round((
                   (CASE WHEN ca > 0 THEN (CAST(ca AS DOUBLE) / ta) *
                      log2(2 * (CAST(ca AS DOUBLE) / ta) /
                        ((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb)))
                    ELSE 0 END) * 0.5 +
                   (CASE WHEN cb > 0 THEN (CAST(cb AS DOUBLE) / tb) *
                      log2(2 * (CAST(cb AS DOUBLE) / tb) /
                        ((CAST(ca AS DOUBLE) / ta) + (CAST(cb AS DOUBLE) / tb)))
                    ELSE 0 END) * 0.5) * ${TextAnalysis.DriftScale})
                   AS BIGINT) AS c9
               FROM c CROSS JOIN t)
         SELECT max(ta) AS n_tokens_a, max(tb) AS n_tokens_b,
                CAST(sum(CASE WHEN ca > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS vocab_a,
                CAST(sum(CASE WHEN cb > 0 THEN 1 ELSE 0 END) AS BIGINT)
                  AS vocab_b,
                CAST(sum(CASE WHEN ca > 0 AND cb > 0 THEN 1 ELSE 0 END)
                  AS BIGINT) AS vocab_shared,
                round(CAST(sum(c9) AS DOUBLE) /
                  ${TextAnalysis.DriftScale}, 4) AS jsd
         FROM k""",

    "q27_fingerprint" ->
      s"""SELECT doc_id, ${ddbPolyHash("array_to_string(toks, ' ')", P)} AS fp
         FROM (SELECT doc_id, $toks AS toks FROM documents) ORDER BY doc_id""",

    // Gopher-style repetition signals: top-bigram coverage and
    // duplicate-trigram fraction per doc (≥3-token docs only)
    "q27_repetition" ->
      s"""WITH d AS (SELECT doc_id, toks FROM
                       (SELECT doc_id, $toks AS toks FROM documents)
                     WHERE len(toks) >= 3),
         bi AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
                       unnest(list_transform(range(1, len(toks)),
                         i -> toks[i] || ' ' || toks[i+1])) AS g
                FROM d),
         bic AS (SELECT doc_id, n_tokens, g, count(*) AS c
                 FROM bi GROUP BY 1, 2, 3),
         bia AS (SELECT doc_id, n_tokens,
                        round(CAST(max(c) AS DOUBLE) * 2 / n_tokens, 4)
                          AS top_bigram_frac
                 FROM bic GROUP BY doc_id, n_tokens),
         tri AS (SELECT doc_id, unnest(${ddbShingles3("toks")}) AS g FROM d),
         tria AS (SELECT doc_id,
                         round(1.0 - CAST(count(DISTINCT g) AS DOUBLE)
                               / count(*), 4) AS dup_trigram_frac
                  FROM tri GROUP BY doc_id)
         SELECT bia.doc_id AS doc_id, n_tokens, top_bigram_frac,
                dup_trigram_frac
         FROM bia JOIN tria ON bia.doc_id = tria.doc_id
         ORDER BY doc_id""",

    // benchmark contamination: training docs sharing trigrams with the
    // doc_id % ContamMod == 0 benchmark slice
    "q27_contamination" ->
      s"""$docShingles,
         bench AS (SELECT DISTINCT shingle FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} = 0),
         train AS (SELECT * FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} <> 0),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams
                 FROM train GROUP BY doc_id),
         hit AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shared
                 FROM train JOIN bench USING (shingle) GROUP BY doc_id)
         SELECT doc_id, n_trigrams, n_shared,
                round(CAST(n_shared AS DOUBLE) / n_trigrams, 4)
                  AS contam_ratio
         FROM tot JOIN hit USING (doc_id) ORDER BY doc_id""",

    // decontamination APPLY: keep training docs under the threshold
    // (LEFT join so zero-overlap docs survive with explicit zeros);
    // threshold compares the ROUNDED ratio on both engines
    "q27_decontaminate" -> decontaminateSql,

    // the streaming gate admits exactly the docs the batch operator
    // keeps (per-doc decisions against a static benchmark set) — one
    // shared oracle proves the stream==batch parity cross-engine
    "q29_decontam_stream" -> decontaminateSql,

    // curation funnel: cumulative per-gate survivor counts (lang →
    // quality → dedup keeper → NEAR-dup representative →
    // decontamination) as one conditional aggregate — mirrors
    // TextAnalysis.curationFunnel flag for flag (near-dup drop set =
    // the larger id of every LSH band-collision pair, same banding as
    // q24_dedup_minhash)
    "q27_funnel" ->
      s"""${funnelFlagsCtes(keepLongest = false)}
         SELECT CAST(count(*) AS BIGINT) AS n_total,
                CAST(sum(CASE WHEN g1 THEN 1 ELSE 0 END) AS BIGINT) AS n_lang,
                CAST(sum(CASE WHEN g1 AND g2 THEN 1 ELSE 0 END) AS BIGINT) AS n_quality,
                CAST(sum(CASE WHEN g1 AND g2 AND g3 THEN 1 ELSE 0 END) AS BIGINT) AS n_dedup,
                CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 THEN 1 ELSE 0 END) AS BIGINT) AS n_neardup,
                CAST(sum(CASE WHEN g1 AND g2 AND g3 AND g4 AND g5 THEN 1 ELSE 0 END) AS BIGINT) AS n_final
         FROM fl""",

    // FUNNEL APPLY: the kept corpus under each survivor policy — the
    // same flags CTEs as q27_funnel (one generator, the arms cannot
    // drift), filtered to all-gates-pass
    "q27_funnel_apply" ->
      s"""${funnelFlagsCtes(keepLongest = false)}
         SELECT doc_id FROM fl
         WHERE g1 AND g2 AND g3 AND g4 AND g5 ORDER BY doc_id""",
    "q27_funnel_apply_longest" ->
      s"""${funnelFlagsCtes(keepLongest = true)}
         SELECT doc_id FROM fl
         WHERE g1 AND g2 AND g3 AND g4 AND g5 ORDER BY doc_id""",

    // multi-benchmark decontamination: one broadcast-suite join, a
    // conditional aggregate per benchmark, keep-if-ALL-below gate —
    // per-benchmark columns generated from MultiBenchIds
    "q27_decontaminate_multi" -> {
      val ids = TextAnalysis.MultiBenchIds
      val inList = ids.mkString(", ")
      val shareCols = ids.map(b =>
          s"CAST(sum(CASE WHEN bench_id = $b THEN 1 ELSE 0 END) AS BIGINT) AS n_shared_b$b")
        .mkString(", ")
      val fillCols = ids.map(b =>
          s"coalesce(n_shared_b$b, 0) AS n_shared_b$b, " +
            s"round(CAST(coalesce(n_shared_b$b, 0) AS DOUBLE) / n_trigrams, 4) AS ratio_b$b")
        .mkString(", ")
      val keep = ids
        .map(b => s"ratio_b$b < ${TextAnalysis.ContamDropThreshold}")
        .mkString(" AND ")
      val outCols = ids
        .map(b => s"CAST(n_shared_b$b AS BIGINT) AS n_shared_b$b, ratio_b$b")
        .mkString(", ")
      s"""$docShingles,
         bench AS (SELECT DISTINCT doc_id % ${TextAnalysis.ContamMod} AS bench_id,
                          shingle
                   FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} IN ($inList)),
         train AS (SELECT * FROM sh
                   WHERE doc_id % ${TextAnalysis.ContamMod} NOT IN ($inList)),
         tot AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams
                 FROM train GROUP BY doc_id),
         hit AS (SELECT doc_id, $shareCols
                 FROM train JOIN bench USING (shingle) GROUP BY doc_id),
         f AS (SELECT tot.doc_id, n_trigrams, $fillCols
               FROM tot LEFT JOIN hit USING (doc_id))
         SELECT doc_id, n_trigrams, $outCols
         FROM f WHERE $keep
         ORDER BY doc_id"""
    },

    // stable-hash train/val/test split, per-(lang, split) audit counts
    "q27_split" ->
      s"""WITH d AS (SELECT doc_id, lang,
                       ${ddbPolyHash("text", P)} % 100 AS h
                     FROM documents),
         s AS (SELECT doc_id, lang,
                      CASE WHEN h < 80 THEN 'train'
                           WHEN h < 90 THEN 'val'
                           ELSE 'test' END AS split
               FROM d)
         SELECT lang, split, count(*) AS n, min(doc_id) AS first_doc
         FROM s GROUP BY lang, split ORDER BY lang, split""",

    // temperature-scaled (α) mixing: empirical shares^α, weights
    // quantized to 1e-6 BIGINTs immediately after pow so both engines
    // ratio identical integers; expression order mirrors the Spark plan
    "q27_mixture_alpha" ->
      s"""WITH d AS (SELECT doc_id, lang,
                       ${ddbPolyHash("text", P)} % 10000 AS h
                     FROM documents),
         c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
               FROM d GROUP BY lang),
         n AS (SELECT CAST(sum(cnt) AS BIGINT) AS nd FROM c),
         wq AS (SELECT lang, cnt,
                       CAST(round(pow(CAST(cnt AS DOUBLE) / nd, ${TextAnalysis.MixAlpha}) * 1e6, 0) AS BIGINT) AS wq
                FROM c CROSS JOIN n),
         ws AS (SELECT CAST(sum(wq) AS BIGINT) AS ws FROM wq),
         sh AS (SELECT lang, cnt, CAST(wq AS DOUBLE) / ws AS s
                FROM wq CROSS JOIN ws),
         t AS (SELECT min(cnt / s) AS tt FROM sh),
         keep AS (SELECT lang, least(1.0, tt * s / cnt) AS keep_p
                  FROM sh CROSS JOIN t)
         SELECT doc_id, d.lang AS lang, h
         FROM d JOIN keep ON d.lang = keep.lang
         WHERE h < keep_p * 10000 ORDER BY doc_id""",

    // deterministic language-mix downsampling to the MixTargets weights
    "q27_mixture" -> {
      val wvals = TextAnalysis.MixTargets
        .map { case (l, w) => s"('$l', CAST($w AS DOUBLE))" }
        .mkString(", ")
      s"""WITH d AS (SELECT doc_id, lang,
                       ${ddbPolyHash("text", P)} % 10000 AS h
                     FROM documents),
         w(lang, w) AS (VALUES $wvals),
         c AS (SELECT lang, CAST(count(*) AS BIGINT) AS cnt
               FROM d GROUP BY lang),
         t AS (SELECT min(cnt / w) AS t_total FROM c JOIN w USING (lang)),
         keep AS (SELECT lang,
                         least(CAST(1.0 AS DOUBLE), t_total * w / cnt)
                           AS keep_p
                  FROM c JOIN w USING (lang) CROSS JOIN t)
         SELECT doc_id, d.lang AS lang, h
         FROM d JOIN keep ON d.lang = keep.lang
         WHERE h < keep_p * 10000 ORDER BY doc_id"""
    },
  )

  /** Shared corpus-scale SemDeDup CTE chain ending in `p` =
    * (vec_a, vec_b, c): dynamic-k seed centroids (k = max(IvfCentroids,
    * ceil(n / SemDedupCellSize)) — grows with the corpus so expected
    * cell size stays ~constant), argmax-cosine cell assignment
    * (row_number DESC ↔ Spark's max(struct): NaN ranks largest, ties →
    * smallest cid), exact cosine on within-cell pairs only — mirrors
    * [[Similarity.semDedupCells]]/[[Similarity.semDedupPairs]]. */
  private lazy val semDedupPairCtes: String =
    s"""c AS (SELECT vec_id AS cid, embedding AS cvec FROM embeddings
              WHERE vec_id < (SELECT greatest(${Similarity.IvfCentroids},
                CAST(ceil(count(*) / ${Similarity.SemDedupCellSize}.0) AS BIGINT))
                FROM embeddings)),
       a AS (SELECT e.vec_id, e.embedding, c.cid,
                    row_number() OVER (PARTITION BY e.vec_id
                      ORDER BY ${cos("e.embedding", "c.cvec")} DESC, c.cid) AS rn
             FROM embeddings e CROSS JOIN c),
       cells AS (SELECT vec_id, embedding, cid AS cell FROM a WHERE rn = 1),
       p AS (SELECT x.vec_id AS vec_a, y.vec_id AS vec_b,
                    ${cos("x.embedding", "y.embedding")} AS c
             FROM cells x JOIN cells y
               ON x.cell = y.cell AND x.vec_id < y.vec_id)"""

  /** Shared synthetic link-graph CTEs ending in `edges` — identical
    * affine maps to [[Graph.linkEdges]] (UNION ALL rather than unnest:
    * DuckDB's binder mishandles DISTINCT over unnest-derived columns). */
  private lazy val linkEdgeCtes: String = {
    val links = Graph.LinkCoeffs.map { case (a, b) =>
      s"SELECT doc_id AS src, (doc_id * $a + $b) % n AS dst FROM documents CROSS JOIN nn"
    }.mkString("\n                UNION ALL\n                ")
    s"""nn AS (SELECT count(*) AS n FROM documents),
       e0 AS ($links),
       edges AS (SELECT DISTINCT src, dst FROM e0 WHERE src <> dst)"""
  }

  /** Shared near-dup cluster CTE chain ending in `r` = the recursive
    * reachability relation over the Jaccard≥0.5 pair graph
    * (`min(m) GROUP BY node` = the component label) — the base of
    * q24_dedup_clusters and q24_dedup_survivors. */
  private lazy val clusterCtes: String =
    s"""${docShingles.replaceFirst("WITH ", "WITH RECURSIVE ")},
       sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       inter AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
                 FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
                 GROUP BY 1, 2),
       p AS (SELECT doc_a, doc_b
             FROM inter JOIN sz x ON doc_a = x.doc_id JOIN sz y ON doc_b = y.doc_id
             WHERE i / (x.n + y.n - i) >= 0.5),
       e AS (SELECT doc_a AS u, doc_b AS v FROM p
             UNION ALL SELECT doc_b, doc_a FROM p),
       nodes AS (SELECT DISTINCT u AS node FROM e),
       r AS (SELECT node, node AS m FROM nodes
             UNION
             SELECT r.node, e.v FROM r JOIN e ON r.m = e.u)"""

  /** Shared LSH bucket CTEs (`pr`, `b`) — the hyperplane projections +
    * sign-bit bucket of every vector, identical arithmetic to
    * [[Similarity.lshBuckets]]. */
  private lazy val lshBucketCtes: String =
    s"""pr AS (SELECT vec_id, j,
                list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                  list_transform(range(1, len(embedding) + 1),
                    i -> CAST(embedding[i] AS DOUBLE) *
                         (CAST((j * 1103515245 + (i - 1) * 12345) % 1001 - 500 AS DOUBLE) / 500.0))),
                  (acc, v) -> acc + v) AS proj
              FROM embeddings CROSS JOIN (SELECT unnest(range(${Similarity.Planes})) AS j) js),
         b AS (SELECT vec_id,
                      CAST(sum(CASE WHEN proj > 0 THEN (CAST(1 AS BIGINT) << CAST(j AS INT)) ELSE 0 END) AS BIGINT) AS bucket
               FROM pr GROUP BY vec_id)"""

  /** The merge-application replace chain, nested exactly
    * [[Bpe.ReplacePasses]] deep — GENERATED from the engine's
    * constant (ADVICE r8: a hardcoded two-level nest would silently
    * desync the oracle if the pass count ever changed). DuckDB
    * `replace` and Java `String.replace` share left-to-right
    * non-overlapping semantics, which is what makes the chain a
    * faithful mirror of [[Bpe]]'s fold. */
  private lazy val bpeReplaceChain: String =
    (1 to Bpe.ReplacePasses).foldLeft("seq") { (acc, _) =>
      s"replace($acc, '|'||lhs||'|'||rhs||'|', '|'||lhs||rhs||'|')"
    }

  /** BPE CTE chain: `tok` (corpus words), `s0` (word counts + initial
    * `'|'`-delimited char sequences), then per merge-iteration i:
    * `p_i` adjacent weighted pairs, `m_i` the argmax pair (count desc,
    * (lhs, rhs) asc — ASCII, so collations agree), `s_i` the rewritten
    * vocabulary. Mirrors [[Bpe.train]] step for step. */
  private lazy val bpeCtes: String = {
    def iter(i: Int): String =
      s"""p$i AS (
           SELECT s.cnt, s.sym[u.r] AS lhs, s.sym[u.r+1] AS rhs
           FROM (SELECT cnt, list_slice(string_split(seq, '|'), 2,
                          len(string_split(seq, '|')) - 1) AS sym
                 FROM s${i - 1}) s,
                LATERAL (SELECT unnest(range(1, len(s.sym))) AS r) u),
         m$i AS (SELECT lhs, rhs, CAST(sum(cnt) AS BIGINT) AS pc
                 FROM p$i GROUP BY lhs, rhs
                 ORDER BY pc DESC, lhs, rhs LIMIT 1),
         s$i AS (SELECT word, cnt,
                   $bpeReplaceChain AS seq
                 FROM s${i - 1} CROSS JOIN m$i)"""
    s"""tok AS (SELECT doc_id, unnest($toks) AS word FROM documents),
       s0 AS (SELECT word, CAST(count(*) AS BIGINT) AS cnt,
                     '|' || regexp_replace(word, '(.)', '\\1|', 'g') AS seq
              FROM tok GROUP BY word),
       ${(1 to Bpe.Merges).map(iter).mkString(",\n       ")}"""
  }

  /** Sequential-fold squared L2 between two double-list exprs — the
    * dimension-order running sum [[Pq]] uses. */
  private def ddbL2(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(range(1, len($a) + 1), " +
      s"i -> ($a[i] - $b[i]) * ($a[i] - $b[i]))), (acc, x) -> acc + x)"

  /** Product-quantization CTE chain — [[Pq]] unrolled: per subspace s,
    * the subvector view `e_s`, seed codebook `c0_s`, [[Pq.Iters]]
    * Lloyd iterations (argmin-L2 assignment + 2^40 fixed-point means),
    * final code assignment `code_s`, and the query's ADC distance
    * table `qd_s`. */
  /** The IVF-PQ probe SQL (mirrors [[Pq.annIvfPq]] /
    * [[Pq.annIvfPqFiltered]]): coarse routing + per-subspace ADC
    * joins; `filtered` adds the metadata pre-filter into the probed
    * candidate set. */
  private def annIvfPqSql(filtered: Boolean,
                          auto: Boolean = false,
                          deleted: Boolean = false,
                          updated: Boolean = false): String = {
    require(!auto || filtered, "the auto ladder is the filtered form")
    require(!deleted || (!filtered && !auto),
      "the deleted arm is the plain nProbe=2 form")
    require(!updated || (!filtered && !auto && !deleted),
      "the updated arm is the plain nProbe=2 form")
    // the takedown exclusion: candidates only — coarse routing and
    // codebooks derive from the full embeddings table (the PQ store's
    // coordinate system lives outside its rows)
    val delPred =
      if (deleted)
        s" AND cells.vec_id % ${Similarity.DeletedVecsMod} <> " +
          s"${Similarity.DeletedVecsRem}"
      else ""
    val joins = (0 until Pq.Subspaces).map(s =>
      s"JOIN code_$s ON code_$s.vec_id = cand.vec_id " +
        s"JOIN qd_$s ON qd_$s.cid = code_$s.cid").mkString(" ")
    val total = (0 until Pq.Subspaces).map(s => s"qd_$s.d").mkString(" + ")
    val fCte =
      if (filtered)
        s""",
         f AS (SELECT doc_id AS vec_id FROM documents
               WHERE lang = '${Similarity.FilterLang}'
                 AND n_chars >= ${Similarity.FilterMinChars})"""
      else ""
    val fJoin = if (filtered) " JOIN f ON cells.vec_id = f.vec_id" else ""
    // the candidate CTE: a fixed nProbe=2 prefix, or the adaptive
    // doubling-ladder choice (the annIvfFilteredAutoSql rule verbatim
    // over the coded path — escalation CHOICE hash-checked)
    val candCtes =
      if (!auto)
        s"""qc AS (SELECT co.ccid FROM co
                   CROSS JOIN (SELECT v FROM e WHERE vec_id = 0) q
              ORDER BY ${cos("q.v", "co.cvec")} DESC, co.ccid LIMIT 2)$fCte,
       cand AS (SELECT cells.vec_id AS vec_id FROM cells
                JOIN qc ON cells.cell = qc.ccid$fJoin
                WHERE cells.vec_id <> 0$delPred)"""
      else
        s"""qrank AS (SELECT co.ccid,
                      row_number() OVER (
                        ORDER BY ${cos("q.v", "co.cvec")} DESC, co.ccid) AS crank
               FROM co CROSS JOIN (SELECT v FROM e WHERE vec_id = 0) q)$fCte,
       surv AS (SELECT qr.crank, count(*) AS cnt
                FROM cells x JOIN f ON x.vec_id = f.vec_id
                     JOIN qrank qr ON x.cell = qr.ccid
                WHERE x.vec_id <> 0 GROUP BY qr.crank),
       lad AS (SELECT DISTINCT
                      least(CAST(pow(2, i) AS BIGINT),
                            (SELECT count(*) FROM co)) AS np
               FROM range(0, 30) t(i)),
       cum AS (SELECT lad.np, coalesce(sum(s.cnt), 0) AS cum
               FROM lad LEFT JOIN surv s ON s.crank <= lad.np
               GROUP BY lad.np),
       chosen AS (SELECT coalesce(min(np), (SELECT count(*) FROM co)) AS np
                  FROM cum
                  WHERE cum >= ${Similarity.FilteredAutoOversample * Pq.TopK}),
       cand AS (SELECT x.vec_id FROM cells x
                JOIN f ON x.vec_id = f.vec_id
                JOIN qrank qr ON x.cell = qr.ccid
                CROSS JOIN chosen
                WHERE x.vec_id <> 0 AND qr.crank <= chosen.np)"""
    s"""WITH ${pqCtesFor(updated)},
       co AS (SELECT vec_id AS ccid, v AS cvec FROM e
              WHERE vec_id < ${Similarity.IvfCentroids}),
       asg AS (SELECT e.vec_id, co.ccid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${cos("e.v", "co.cvec")} DESC, co.ccid) AS rn
               FROM ${if (updated) "e2" else "e"} e CROSS JOIN co),
       cells AS (SELECT vec_id, ccid AS cell FROM asg WHERE rn = 1),
       $candCtes
       SELECT cand.vec_id, round($total, 4) + 0.0 AS pq_dist
       FROM cand $joins
       ORDER BY $total, cand.vec_id LIMIT ${Pq.TopK}"""
  }

  /** The PQ training + coding CTE chain. `updated = true` adds the
    * re-crawl view `e2` (the fixed update set's vectors negated, ids
    * restricted ABOVE the coarse-seed range) and derives CODES and
    * cell assignments from it, while the codebooks, coarse seeds and
    * query keep training on the ORIGINAL `e` — the frozen-quantizer
    * semantics the store's update path implements (codes of new
    * versions encoded under build-time coordinates). */
  private def pqCtesFor(updated: Boolean): String = {
    val m = Pq.Subspaces
    val k = Pq.Codebook
    // which per-sub sliced view the FINAL code assignment reads
    def codeSrc(s: Int): String = if (updated) s"f2_$s" else s"e_$s"
    def sub(s: Int): String = {
      def iter(i: Int): String =
        s"""a${i}_$s AS (SELECT e.vec_id, e.v, c.cid,
                 row_number() OVER (PARTITION BY e.vec_id
                   ORDER BY ${ddbL2("e.v", "c.cvec")}, c.cid) AS rn
               FROM e_$s e CROSS JOIN c${i - 1}_$s c),
           x${i}_$s AS (SELECT cid, CAST(generate_subscripts(v, 1) AS BIGINT) AS dim,
                 CAST(round(unnest(v) * ${Similarity.CentroidScale}) AS BIGINT) AS l
               FROM a${i}_$s WHERE rn = 1),
           m${i}_$s AS (SELECT cid, dim,
                 round(CAST(sum(l) AS DOUBLE) / ${Similarity.CentroidScale} / count(*), 4) + 0.0 AS c
               FROM x${i}_$s GROUP BY cid, dim),
           c${i}_$s AS (SELECT cid, list(c ORDER BY dim) AS cvec FROM m${i}_$s GROUP BY cid)"""
      val f2 =
        if (updated)
          s""",
         f2_$s AS (SELECT vec_id,
               list_slice(v, $s * (len(v) // $m) + 1, ${s + 1} * (len(v) // $m)) AS v
             FROM e2)"""
        else ""
      s"""e_$s AS (SELECT vec_id,
               list_slice(v, $s * (len(v) // $m) + 1, ${s + 1} * (len(v) // $m)) AS v
             FROM e)$f2,
         c0_$s AS (SELECT vec_id AS cid, v AS cvec FROM e_$s WHERE vec_id < $k),
         ${(1 to Pq.Iters).map(iter).mkString(",\n         ")},
         code_$s AS (SELECT vec_id, cid FROM
               (SELECT e.vec_id, c.cid,
                       row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY ${ddbL2("e.v", "c.cvec")}, c.cid) AS rn
                FROM ${codeSrc(s)} e CROSS JOIN c${Pq.Iters}_$s c) WHERE rn = 1),
         qd_$s AS (SELECT c.cid, ${ddbL2("q.v", "c.cvec")} AS d
               FROM c${Pq.Iters}_$s c
                    CROSS JOIN (SELECT v FROM e_$s WHERE vec_id = 0) q)"""
    }
    val e2 =
      if (updated)
        s""",
       e2 AS (SELECT vec_id,
              CASE WHEN vec_id % ${Similarity.UpdatedVecsMod} = ${Similarity.UpdatedVecsRem}
                        AND vec_id >= ${Similarity.IvfCentroids}
                   THEN list_transform(v, x -> -x) ELSE v END AS v
            FROM e)"""
      else ""
    s"""e AS (SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings)$e2,
       ${(0 until m).map(sub).mkString(",\n       ")}"""
  }

  private lazy val pqCtes: String = pqCtesFor(updated = false)

  /** q25_quant_recall: the quantization-ladder recall panel, built by
    * WRAPPING the four already-hash-checked per-method oracles as
    * subqueries (DuckDB allows a full WITH query inside a derived
    * table) — the panel's arm definitions can never drift from the
    * standalone q25_ann_* entries, and `truth` is the exact-cosine
    * top-10 (the q25_ann_topk ranking at k=10). */
  private def quantRecallSql: String = {
    val arms = Seq(
      "binary" -> oracleMain("q25_ann_binary"),
      "int8" -> oracleMain("q25_ann_quantized"),
      "mrl8" -> oracleMain("q25_ann_mrl"),
      "pq_adc" -> oracleMain("q25_ann_pq"))
    val armCtes = arms.map { case (n, sel) =>
      s"m_$n AS (SELECT vec_id FROM ($sel) sub_$n)"
    }.mkString(",\n       ")
    val unions = arms.map { case (n, _) =>
      s"""SELECT '$n' AS method,
            CAST((SELECT count(*) FROM m_$n JOIN truth USING (vec_id))
              AS BIGINT) AS hits"""
    }.mkString(" UNION ALL ")
    s"""WITH truth AS (SELECT vec_id FROM (
           WITH q AS (SELECT embedding AS qv FROM embeddings
                      WHERE vec_id = 0),
           s AS (SELECT vec_id, ${cos("embedding", "qv")} AS c
                 FROM embeddings CROSS JOIN q WHERE vec_id <> 0)
           SELECT vec_id FROM s ORDER BY c DESC, vec_id LIMIT 10) tt),
       $armCtes,
       h AS ($unions)
       SELECT method, hits,
              round(CAST(hits AS DOUBLE) / 10, 4) AS recall10
       FROM h ORDER BY method"""
  }

  val oracle: Map[String, String] =
    oracleMain + ("q25_quant_recall" -> quantRecallSql)

  private lazy val simhashSql: String =
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       tf AS (SELECT doc_id, term, count(*) AS tf
              FROM (SELECT doc_id, unnest(toks) AS term FROM d) t GROUP BY 1, 2),
       th AS (SELECT doc_id, tf, ${ddbPolyHash("term", P)} AS h FROM tf),
       bits AS (SELECT doc_id, j,
                       CASE WHEN sum(tf * (2 * ((h >> j) & 1) - 1)) > 0 THEN 1 ELSE 0 END AS bit
                FROM th CROSS JOIN (SELECT unnest(range(${Dedup.SimhashBits})) AS j) js
                GROUP BY doc_id, j)
       SELECT doc_id, CAST(sum(CAST(bit AS BIGINT) << CAST(j AS INT)) AS BIGINT) AS simhash
       FROM bits GROUP BY doc_id"""
}
