package graft.queries

import graft.{QueryDef, Tables}
import graft.operators._
import graft.operators.PipelineParams._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data pipeline query surface (SURVEY.md §7 M6): text
  * analysis, exact/MinHash/SimHash/n-gram dedup, embedding similarity,
  * multimodal plumbing — each implemented Spark-first in
  * [[graft.operators]] and differentially verified against a DuckDB
  * oracle wherever the computation is portable.
  *
  * Portability contract: hashes are md5-derived 60-bit longs,
  * permutations are integer affine maps, and float folds run
  * left-to-right in both engines (`aggregate` ↔ `list_reduce`), so
  * oracle results are bit-identical — the differential is exact, not
  * tolerance-based. For the LSH operators the oracle is the BRUTE-FORCE
  * pair scan: the comparison therefore also proves candidate-generation
  * recall, not just the verification arithmetic.
  */
object Pipeline {

  // ---- DuckDB oracle snippet builders (dialect twins of TextOps) ----

  private val W = "string_split(lower(text), ' ')"

  private def duckShingles(ws: String, n: Int = ShingleN): String =
    s"""list_distinct(CASE WHEN len($ws) >= $n
       |  THEN list_transform(range(0, len($ws) - ${n - 1}),
       |         i -> array_to_string(($ws)[i+1:i+$n], ' '))
       |  ELSE []::VARCHAR[] END)""".stripMargin

  private def duckHash(e: String): String =
    s"('0x' || substring(md5($e), 1, 15))::BIGINT"

  private def duckHashAll(arr: String): String =
    s"list_transform($arr, s -> ${duckHash("s")})"

  /** Sequential left-fold dot product — order-identical to Spark's
    * `aggregate`, so the doubles match bit-for-bit.
    */
  private def duckDot(a: String, b: String): String =
    s"""list_reduce(list_transform(range(1, $EmbeddingDim + 1),
       |  i -> ($a)[i]::DOUBLE * ($b)[i]::DOUBLE), (x, y) -> x + y)""".stripMargin

  private def duckCos(a: String, b: String): String =
    s"(${duckDot(a, b)} / (sqrt(${duckDot(a, a)}) * sqrt(${duckDot(b, b)})))"

  private def duckSimhash(whs: String): String =
    (0 until SimhashBits).map { b =>
      s"""(CASE WHEN list_sum(list_transform($whs,
         |  h -> CASE WHEN ((h >> $b) & 1) = 1 THEN 1 ELSE -1 END)) >= 0
         |  THEN ${1L << b} ELSE 0 END)""".stripMargin
    }.mkString("(", " + ", ")")

  /** Hyperplane-LSH signature, dialect twin of [[Similarity.signature]]:
    * bit i = sign(v · plane_i) with the planes rendered as double
    * literals (Scala `Double.toString` is shortest-repr, so DuckDB
    * parses the identical IEEE-754 value) and the dot folded
    * left-to-right — the sign, hence the signature, matches bit-exactly.
    */
  private def duckSig(v: String): String =
    PipelineParams.hyperplanes.zipWithIndex.map { case (p, i) =>
      val lit = p.map(_.toString).mkString("[", ",", "]")
      s"(CASE WHEN ${duckDot(v, lit)} >= 0 THEN ${1L << i} ELSE 0 END)"
    }.mkString("(", " + ", ")")

  /** True iff two signatures agree on at least one LSH band — the exact
    * candidate rule of the banded join in [[Similarity.lshCosinePairs]]
    * / [[Similarity.lshTopK]], written as a brute-force predicate.
    */
  private def duckBandMatch(a: String, b: String): String =
    (0 until LshBands).map { j =>
      val shift = j * LshRowsPerBand
      val mask = (1L << LshRowsPerBand) - 1
      s"((($a >> $shift) & $mask) = (($b >> $shift) & $mask))"
    }.mkString("(", " OR ", ")")

  /** Per-band LSH key list at an arbitrary (bands × rowsPerBand)
    * shape — dialect twin of [[graft.functions.LshBandKeys]]: band j's
    * key packs the sign bits of planes j·r .. j·r+r−1 (bit i weighted
    * 2^i), planes from the same seed-7 prefix stream rendered as
    * double literals, dots folded left-to-right.
    */
  private def duckBandKeyList(v: String, bands: Int, rows: Int): String = {
    val planes = PipelineParams.hyperplanesN(bands * rows)
    (0 until bands).map { j =>
      (0 until rows).map { i =>
        val p = planes(j * rows + i)
        val plit = p.map(_.toString).mkString("[", ",", "]")
        s"(CASE WHEN ${duckDot(v, plit)} >= 0 THEN ${1L << i} ELSE 0 END)"
      }.mkString("(", " + ", ")")
    }.mkString("[", ",\n", "]")
  }

  /** ≥1 shared band between two key lists of `bands` entries. */
  private def duckBandListMatch(a: String, b: String, bands: Int): String =
    s"len(list_filter(range(1, ${bands + 1}), j -> ($a)[j] = ($b)[j])) > 0"

  private def duckStopRatio(ws: String, list: Seq[String]): String =
    s"len(list_filter($ws, w -> list_contains(${duckStringList(list)}, w)))::DOUBLE / len($ws)"

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "documents")

  /** The constructed-P6 media fixture shared by the image judged
    * queries (decode / resize / dHash): doc text bytes laid out as a
    * well-formed binary PPM with doc-dependent dimensions. ONE
    * builder — the oracles replay this rule, so it must not fork.
    */
  private def ppmDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).selectExpr("doc_id",
      """concat('P6
',
        |  cast(4 + doc_id % 5 as string), ' ',
        |  cast(3 + doc_id % 4 as string), '
255
',
        |  substring(repeat(text, 4), 1,
        |    cast((4 + doc_id % 5) * (3 + doc_id % 4) * 3 as int)))
        |  as ppm""".stripMargin)

  /** The constructed-WAV media fixture shared by the audio judged
    * queries (decode / fingerprint): text bytes as little-endian PCM16
    * inside a spec-correct 44-byte RIFF container.
    */
  private def wavDocs(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .selectExpr("doc_id",
        "least(length(text), 400) div 2 as ns",
        "substring(text, 1, (least(length(text), 400) div 2) * 2) as smp")
      .selectExpr("doc_id",
        """unhex(concat(
          |  '52494646',
          |  format_string('%02x%02x0000',
          |    (36 + ns * 2) % 256, ((36 + ns * 2) div 256) % 256),
          |  '57415645666d7420100000000100010040000000800000000200100064617461',
          |  format_string('%02x%02x0000',
          |    (ns * 2) % 256, ((ns * 2) div 256) % 256),
          |  hex(cast(smp as binary)))) as wav""".stripMargin)

  private def embs(s: SparkSession, dir: String): DataFrame =
    Tables.df(s, dir, "embeddings")

  /** The stride-rule IVF rebuild — oracle of BOTH q_sim_ivf (fresh
    * build) and q_sim_ivf_persisted (persisted index + incremental
    * append): the persisted path must produce identical rows.
    */
  private def ivfOracle: String =
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id % $IvfCentroidStride = 0
       |    AND vec_id < ${IvfCentroidStride.toLong * IvfCentroids}),
       |assign AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${duckCos("e.embedding", "c.cv")}, 6) DESC,
       |                 c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT q.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(${duckCos("q.embedding", "c.cv")}, 6) DESC,
       |                 c.cid) AS rn
       |    FROM embeddings q CROSS JOIN cent c
       |    WHERE q.vec_id < $NumQueryVectors) t WHERE rn <= $IvfNProbe)
       |SELECT query_id, neighbor_id, rank, cos FROM (
       |  SELECT p.query_id, a.neighbor_id,
       |    round(${duckCos("q.embedding", "n.embedding")}, 6) AS cos,
       |    row_number() OVER (PARTITION BY p.query_id
       |      ORDER BY round(${duckCos("q.embedding", "n.embedding")}, 6) DESC,
       |               a.neighbor_id) AS rank
       |  FROM probe p
       |  JOIN assign a ON a.cid = p.cid AND a.neighbor_id <> p.query_id
       |  JOIN embeddings q ON q.vec_id = p.query_id
       |  JOIN embeddings n ON n.vec_id = a.neighbor_id) t
       |WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin

  /** The stride-rule IVF-PQ rebuild — oracle of BOTH q_sim_ivfpq
    * (fresh build) and q_sim_ivfpq_persisted (persisted quantizers +
    * incremental append): codebooks re-derived, every argmin code
    * re-assigned, every ADC distance recomputed as the exact
    * DECIMAL(28,6) sum of round-6 slice distances.
    */
  private def ivfPqOracle: String = {
    val sub = EmbeddingDim / PqM
    def sliceL2(x: String, y: String, j: String): String =
      s"""list_reduce(list_transform(range(1, $sub + 1),
         |  i -> (($x)[$j * $sub + i]::DOUBLE - ($y)[$j * $sub + i]::DOUBLE)
         |     * (($x)[$j * $sub + i]::DOUBLE - ($y)[$j * $sub + i]::DOUBLE)),
         |  (x, y) -> x + y)""".stripMargin
    s"""WITH cent AS (
       |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
       |  WHERE vec_id % $IvfCentroidStride = 0
       |    AND vec_id < ${IvfCentroidStride.toLong * IvfCentroids}),
       |cb AS (
       |  SELECT CAST(vec_id // $PqStride AS INT) AS c, embedding AS cbv
       |  FROM embeddings
       |  WHERE vec_id % $PqStride = 0
       |    AND vec_id < ${PqStride.toLong * PqK}),
       |js AS (SELECT unnest(range(0, $PqM)) AS j),
       |codes AS (
       |  SELECT vec_id AS neighbor_id, j, c FROM (
       |    SELECT e.vec_id, js.j, cb.c,
       |      row_number() OVER (PARTITION BY e.vec_id, js.j
       |        ORDER BY round(${sliceL2("e.embedding", "cb.cbv", "js.j")}, 6)
       |          ASC, cb.c) AS rn
       |    FROM embeddings e CROSS JOIN js CROSS JOIN cb) t
       |  WHERE rn = 1),
       |assign AS (
       |  SELECT vec_id AS neighbor_id, cid FROM (
       |    SELECT e.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY e.vec_id
       |        ORDER BY round(${duckCos("e.embedding", "c.cv")}, 6) DESC,
       |                 c.cid) AS rn
       |    FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1),
       |probe AS (
       |  SELECT vec_id AS query_id, cid FROM (
       |    SELECT q.vec_id, c.cid,
       |      row_number() OVER (PARTITION BY q.vec_id
       |        ORDER BY round(${duckCos("q.embedding", "c.cv")}, 6) DESC,
       |                 c.cid) AS rn
       |    FROM embeddings q CROSS JOIN cent c
       |    WHERE q.vec_id < $NumQueryVectors) t WHERE rn <= $IvfNProbe),
       |dists AS (
       |  SELECT p.query_id, a.neighbor_id,
       |    CAST(SUM(CAST(round(${sliceL2("q.embedding", "cb.cbv", "k.j")}, 6)
       |      AS DECIMAL(28,6))) AS DOUBLE) AS dist
       |  FROM probe p
       |  JOIN assign a ON a.cid = p.cid AND a.neighbor_id <> p.query_id
       |  JOIN codes k ON k.neighbor_id = a.neighbor_id
       |  JOIN cb ON cb.c = k.c
       |  JOIN embeddings q ON q.vec_id = p.query_id
       |  GROUP BY p.query_id, a.neighbor_id)
       |SELECT query_id, neighbor_id, rank, dist FROM (
       |  SELECT query_id, neighbor_id, dist,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY dist ASC, neighbor_id) AS rank
       |  FROM dists) t
       |WHERE rank <= $TopK
       |ORDER BY query_id, rank""".stripMargin
  }

  val defs: Seq[QueryDef] = Seq(

    // ---- text quality / stats ----------------------------------------
    QueryDef(
      "q_text_stats",
      s"""SELECT doc_id,
         |  length(text) AS n_chars_m,
         |  len($W) AS n_words,
         |  len(regexp_extract_all(lower(text), '[a-z]+|[0-9]|[^a-z0-9 ]')) AS n_tokens,
         |  len(regexp_extract_all(text, '[.,;:!?]')) AS n_punct,
         |  ${duckStopRatio(W, stopwords.head._2)} AS stop_ratio,
         |  list_reduce(list_transform($W, x -> length(x)), (a, b) -> a + b)::DOUBLE
         |    / len($W) AS avg_word_len
         |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.operators.Par.spread(docs(s, dir))
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"),
          TextOps.nChars(col("text")).as("n_chars_m"),
          size(col("ws")).as("n_words"),
          TextOps.tokenCount(col("text")).as("n_tokens"),
          TextOps.punctCount(col("text")).as("n_punct"),
          TextOps.wordRatio("ws", stopwords.head._2).as("stop_ratio"),
          TextOps.avgWordLen("ws").as("avg_word_len"))
        .orderBy("doc_id")
    },

    // ---- language ID -------------------------------------------------
    QueryDef(
      "q_lang_id", {
        val scores = stopwords.map { case (l, list) =>
          l -> duckStopRatio(W, list)
        }
        val chain = scores.map { case (l, s) =>
          val beats = scores.filter(_._1 != l)
            .map { case (_, o) => s"($s) >= ($o)" }.mkString(" AND ")
          s"WHEN ($s) > 0 AND $beats THEN '$l'"
        }.mkString("\n    ")
        s"""SELECT doc_id, lang,
           |  CASE WHEN len(regexp_extract_all(text, '[\\x{4e00}-\\x{9fff}]'))::DOUBLE
           |            / length(text) >= $CjkRatio THEN 'zh'
           |    $chain
           |    ELSE 'und' END AS pred_lang
           |FROM documents ORDER BY doc_id""".stripMargin
      }) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"), col("lang"),
          TextOps.langId(col("text"), "ws").as("pred_lang"))
        .orderBy("doc_id")
    },

    // ---- document fingerprint + exact dedup --------------------------
    QueryDef(
      "q_dedup_exact",
      """SELECT doc_id,
        |  md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g')) AS fingerprint,
        |  count(*) OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) AS group_size,
        |  min(doc_id) OVER (PARTITION BY md5(regexp_replace(trim(lower(text)), '\s+', ' ', 'g'))) AS representative
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.exact(docs(s, dir), "doc_id", "text")
        .toDF("doc_id", "fingerprint", "group_size", "representative")
        .orderBy("doc_id")
    },

    // ---- MinHash+LSH near-dup vs brute-force jaccard oracle ----------
    QueryDef(
      "q_dedup_minhash",
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $MinhashJaccard
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Dedup.minhashPairs(docs(s, dir), "doc_id", "text")
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // ---- dedup group assignment: connected components over the
    // near-dup pair graph (iterative min-label propagation in Spark) —
    // the oracle computes the transitive closure with a recursive CTE
    // and labels every node with its component minimum, so the
    // fixpoint itself is differentially proven, not just the pairs ---
    QueryDef(
      "q_dedup_groups",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |      >= $MinhashJaccard),
         |edges AS (
         |  SELECT a_id AS s, b_id AS d FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |closure(id, r) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT c.id, e.d FROM closure c JOIN edges e ON c.r = e.s),
         |lab AS (SELECT id, min(r) AS rep FROM closure GROUP BY id)
         |SELECT l.id AS doc_id, l.rep,
         |  CAST(cnt.n AS BIGINT) AS group_size
         |FROM lab l JOIN (SELECT rep, count(*) AS n FROM lab GROUP BY rep) cnt
         |  USING (rep)
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val groups = Dedup.dedupGroups(
        Dedup.minhashPairs(docs(s, dir), "doc_id", "text"))
      groups.withColumn("group_size",
          count(lit(1)).over(org.apache.spark.sql.expressions.Window
            .partitionBy("rep")))
        .select(col("id").as("doc_id"), col("rep"), col("group_size"))
        .orderBy("doc_id")
    },

    // ---- quality-aware dedup: each near-dup component keeps its
    // best-scoring doc (score desc, id) instead of the minimum id —
    // the oracle recomputes the transitive closure AND every quality
    // score from scratch -------------------------------------------
    QueryDef(
      "q_dedup_best",
      s"""WITH RECURSIVE sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |  WHERE len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
         |      >= $MinhashJaccard),
         |edges AS (
         |  SELECT a_id AS s, b_id AS d FROM pairs
         |  UNION SELECT b_id, a_id FROM pairs),
         |closure(id, r) AS (
         |  SELECT s, s FROM edges
         |  UNION
         |  SELECT c.id, e.d FROM closure c JOIN edges e ON c.r = e.s),
         |lab AS (SELECT id, min(r) AS rep FROM closure GROUP BY id),
         |w AS (SELECT doc_id, $W AS ws FROM documents),
         |tok AS (SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM w),
         |scr AS (
         |  SELECT doc_id,
         |    CAST(sum(CAST(floor(
         |      (((((${duckHash("t")} % $QcBuckets) * $QcWeightA + $QcWeightB)
         |         % $QcWeightMod - ${QcWeightMod / 2}) / ${QcWeightMod / 2}.0)
         |        / dl) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS score_p
         |  FROM tok GROUP BY doc_id),
         |g AS (
         |  SELECT d.doc_id, coalesce(l.rep, d.doc_id) AS grp, s.score_p
         |  FROM documents d
         |  LEFT JOIN lab l ON d.doc_id = l.id
         |  JOIN scr s ON s.doc_id = d.doc_id)
         |SELECT doc_id, grp, score_p,
         |  row_number() OVER (PARTITION BY grp
         |    ORDER BY score_p DESC, doc_id) = 1 AS keep
         |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val score = Classifier.scoreRule(d, "doc_id", "text")
        .select(col("id").as("__sid"), col("score_p").as("__score"))
      val withScore = d.join(score, col("doc_id") === col("__sid"))
      Dedup.keepBestPerGroup(withScore, "doc_id", col("__score"),
          Dedup.minhashPairs(d, "doc_id", "text"))
        .withColumnRenamed("score", "score_p")
        .orderBy("doc_id")
    },

    // ---- incremental corpus dedup: new batch vs stored signatures ----
    // The realistic 100 TB shape: the corpus's MinHash signatures are
    // precomputed state, a new batch arrives, and only batch-touching
    // pairs are found — corpus docs are never re-shingled and corpus–
    // corpus pairs never re-emitted. The oracle brute-forces jaccard
    // over every batch-touching pair, so the differential proves the
    // band join finds them all (same ~4e-10 FN bound as q_dedup_minhash).
    QueryDef(
      "q_dedup_incremental",
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE (a.doc_id % 10 = 9 OR b.doc_id % 10 = 9)
         |  AND len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $MinhashJaccard
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val corpusSigs = Dedup.minhashSignatures(
        d.filter(col("doc_id") % 10 =!= 9), "doc_id", "text")
      Dedup.incrementalMinhashPairs(corpusSigs,
          d.filter(col("doc_id") % 10 === 9), "doc_id", "text")
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // ---- SimHash near-dup vs brute-force hamming oracle --------------
    QueryDef(
      "q_dedup_simhash",
      s"""WITH sim AS (
         |  SELECT doc_id, ${duckSimhash(duckHashAll(W))} AS simhash
         |  FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  bit_count(xor(a.simhash, b.simhash)) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= $SimhashMaxHamming
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Dedup.simhashPairs(docs(s, dir), "doc_id", "text")
        .select(col("a_id"), col("b_id"), col("hamming").cast("long"))
        .orderBy("a_id", "b_id")
    },

    // ---- n-gram jaccard via inverted index vs brute-force oracle -----
    QueryDef(
      "q_dedup_ngram",
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s)) > 0
         |  AND len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairs(docs(s, dir), "doc_id", "text", 0.5)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // ---- df-capped ngram join: the vocabulary-concentration control.
    // Shingles in more than NgramMaxDf docs are dropped from every set
    // BEFORE similarity (posting lists — and the quadratic per-token
    // candidate term — bounded at maxDf rows); jaccard is exact over
    // the capped universe, which the oracle rebuilds from scratch -----
    QueryDef(
      "q_dedup_ngram_capped",
      s"""WITH sh0 AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s FROM documents),
         |tok AS (SELECT doc_id, unnest(s) AS g FROM sh0),
         |dfreq AS (
         |  SELECT g FROM tok GROUP BY g HAVING count(*) <= $NgramMaxDf),
         |sh AS (
         |  SELECT doc_id, list(g) AS s
         |  FROM tok JOIN dfreq USING (g) GROUP BY doc_id)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE len(list_intersect(a.s, b.s)) > 0
         |  AND len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.5
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Dedup.ngramJaccardPairsCapped(docs(s, dir), "doc_id", "text", 0.5,
          NgramMaxDf)
        .select(col("a_id"), col("b_id"), round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // ---- embedding near-dup pairs ------------------------------------
    QueryDef(
      "q_dedup_embedding",
      s"""SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
         |FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
         |WHERE ${duckCos("a.embedding", "b.embedding")} >= $CosineNearDup
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Similarity.cosinePairs(embs(s, dir), "vec_id", "embedding")
        .orderBy("a_id", "b_id")
    },

    // ---- LSH-bucketed embedding near-dup: the corpus-scale path ------
    // The oracle brute-forces the SAME candidate contract (share ≥1
    // hyperplane-LSH band, then exact cosine ≥ τ), so the differential
    // proves the banded join end-to-end: signature arithmetic, band
    // keying, pair dedup, and verification. The contract itself is the
    // honest one for cosine LSH at τ=0.45: hyperplane bits match with
    // p = 1 − θ/π ≈ 0.65 at the threshold, so a minhash-style 1e-9
    // zero-miss bound would need hundreds of low-entropy 4-bit bands —
    // superquadratic candidate volume, worse than the exact join. Real
    // engines ship tunable-recall LSH; recall vs. the exact pass is
    // asserted in PipelineSpec, and q_dedup_embedding keeps the exact
    // all-pairs semantics oracle-green for small corpora.
    QueryDef(
      "q_dedup_embedding_lsh",
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, ${duckSig("embedding")} AS sig
         |  FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
         |FROM sig a JOIN sig b ON a.vec_id < b.vec_id
         |WHERE ${duckBandMatch("a.sig", "b.sig")}
         |  AND round(${duckCos("a.embedding", "b.embedding")}, 6) >= $CosineNearDup
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Similarity.lshCosinePairs(embs(s, dir), "vec_id", "embedding")
        .orderBy("a_id", "b_id")
    },

    // ---- WIDE auto-shape LSH: the same banded join judged at the
    // shape the auto-sizer actually picks at corpus scale —
    // lshAutoParams(4096) = (9 bands × 8 bits), pinned by
    // PipelineSpec — so the graded artifact covers the production
    // path (cosinePairsAuto), not just the fixed 4×4 contract whose
    // 16-value key space goes quadratic past ~10k vectors. Oracle =
    // brute force over the identical 72-plane band keys. ------------
    QueryDef(
      "q_dedup_embedding_lsh_wide",
      s"""WITH sig AS (
         |  SELECT vec_id, embedding,
         |    ${duckBandKeyList("embedding", LshWideBands, LshWideRows)}
         |      AS bks
         |  FROM embeddings)
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id,
         |  round(${duckCos("a.embedding", "b.embedding")}, 6) AS cos
         |FROM sig a JOIN sig b ON a.vec_id < b.vec_id
         |WHERE ${duckBandListMatch("a.bks", "b.bks", LshWideBands)}
         |  AND round(${duckCos("a.embedding", "b.embedding")}, 6) >= $CosineNearDup
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Similarity.lshCosinePairsScaled(embs(s, dir), "vec_id", "embedding",
          CosineNearDup, LshWideBands, LshWideRows)
        .orderBy("a_id", "b_id")
    },

    // ---- exact cosine top-k ------------------------------------------
    QueryDef(
      "q_sim_topk",
      s"""SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |  row_number() OVER (PARTITION BY q.vec_id
         |    ORDER BY round(${duckCos("q.embedding", "c.embedding")}, 6) DESC,
         |             c.vec_id) AS rank,
         |  round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos
         |FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |WHERE q.vec_id < $NumQueryVectors
         |QUALIFY rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      Similarity.bruteForceTopK(
          e.filter(col("vec_id") < NumQueryVectors), e, "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },

    // ---- PII scrubbing (corpus hygiene) ------------------------------
    QueryDef(
      "q_text_scrub",
      """SELECT doc_id,
        |  regexp_replace(regexp_replace(
        |    'reach u' || CAST(doc_id AS VARCHAR) || '@mail.example or +1 (555) 010-7788 re: ' || substring(text, 1, 40),
        |    '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
        |    '\+?[0-9][0-9() -]{7,}[0-9]', '<PHONE>', 'g') AS clean
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("raw", concat(lit("reach u"), col("doc_id").cast("string"),
          lit("@mail.example or +1 (555) 010-7788 re: "),
          substring(col("text"), 1, 40)))
        .select(col("doc_id"), TextOps.scrubPii(col("raw")).as("clean"))
        .orderBy("doc_id")
    },

    // ---- winnowing document fingerprint (rolling-hash k-grams,
    //      window minima — Schleimer et al. SIGMOD'03). The oracle
    //      recomputes each window hash as a per-window fold; the Spark
    //      side rolls in O(n) — identical residues mod M, and the
    //      sorted-distinct-minima fingerprint is order-rule-free. ------
    QueryDef(
      "q_text_winnow",
      s"""WITH h AS (
         |  SELECT doc_id,
         |    list_transform(range(length(text) - $WinnowK + 1),
         |      i -> list_reduce(
         |        list_prepend(CAST(0 AS BIGINT),
         |          list_transform(range($WinnowK),
         |            j -> CAST(unicode(text[i + j + 1]) AS BIGINT))),
         |        (a, c) -> (a * $WinnowB + c) % $WinnowM)) AS hs
         |  FROM documents),
         |f AS (
         |  SELECT doc_id,
         |    CASE WHEN len(hs) = 0 THEN CAST([] AS BIGINT[])
         |         WHEN len(hs) <= $WinnowW THEN [list_min(hs)]
         |         ELSE list_sort(list_distinct(
         |           list_transform(range(len(hs) - $WinnowW + 1),
         |             j -> list_min(hs[j + 1:j + $WinnowW]))))
         |    END AS fp
         |  FROM h)
         |SELECT doc_id,
         |  coalesce(array_to_string(fp, ','), '') AS fp_str,
         |  len(fp) AS fp_len,
         |  fp[1] AS fp_min, fp[len(fp)] AS fp_max
         |FROM f ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // The fingerprint is rendered as a comma-joined string (not a raw
      // array column): the driver's comparator sorts every column in
      // pandas, and list-typed cells are unhashable there. Joining keeps
      // the full fingerprint in the differential.
      docs(s, dir)
        .select(col("doc_id"),
          TextOps.winnowFingerprint(col("text")).as("fp"))
        .select(col("doc_id"),
          array_join(col("fp").cast("array<string>"), ",").as("fp_str"),
          size(col("fp")).as("fp_len"),
          when(size(col("fp")) > 0, element_at(col("fp"), 1)).as("fp_min"),
          when(size(col("fp")) > 0, element_at(col("fp"), size(col("fp"))))
            .as("fp_max"))
        .orderBy("doc_id")
    },

    // ---- TF-IDF top terms (classic corpus weighting) -----------------
    QueryDef(
      "q_text_tfidf",
      s"""WITH tok AS (
         |  SELECT doc_id, unnest(string_split(lower(text), ' ')) AS w
         |  FROM documents),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
         |n AS (SELECT count(*) AS n FROM documents)
         |SELECT doc_id, w, tf, df, round(score, 9) AS score FROM (
         |  SELECT tf.doc_id, tf.w, tf.tf, dfreq.df,
         |    tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) AS score,
         |    row_number() OVER (PARTITION BY tf.doc_id
         |      ORDER BY tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) DESC, tf.w) AS rk
         |  FROM tf JOIN dfreq ON tf.w = dfreq.w CROSS JOIN n) ranked
         |WHERE rk <= 3 AND doc_id < 100
         |ORDER BY doc_id, w""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      d.sparkSession.sql("SELECT 1").count() // ensure session
      Tables.registerAll(s, dir)
      s.sql(
        s"""WITH tok AS (
           |  SELECT doc_id, w FROM (
           |    SELECT doc_id, explode(split(lower(text), ' ')) AS w
           |    FROM documents)),
           |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
           |dfreq AS (SELECT w, count(DISTINCT doc_id) AS df FROM tok GROUP BY w),
           |n AS (SELECT count(*) AS n FROM documents)
           |SELECT doc_id, w, tf, df, round(score, 9) AS score FROM (
           |  SELECT tf.doc_id, tf.w, tf.tf, dfreq.df,
           |    tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) AS score,
           |    row_number() OVER (PARTITION BY tf.doc_id
           |      ORDER BY tf.tf * ln((n.n + 1.0) / (dfreq.df + 1.0)) DESC, tf.w) AS rk
           |  FROM tf JOIN dfreq ON tf.w = dfreq.w CROSS JOIN n) ranked
           |WHERE rk <= 3 AND doc_id < 100
           |ORDER BY doc_id, w""".stripMargin)
    },

    // ---- SemDeDup semantic dedup: deterministic centroid clustering,
    // in-cluster cosine pairs ≥ τ drop the higher id. The oracle
    // rebuilds the identical clustering (stride centroids, round-6
    // cosine argmax with cid tie-break) and the identical drop rule,
    // so assignment AND the dedup decision are differentially proven
    // for every row. --------------------------------------------------
    QueryDef(
      "q_dedup_semantic",
      s"""WITH cent AS (
         |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
         |  WHERE vec_id % $IvfCentroidStride = 0
         |    AND vec_id < ${IvfCentroidStride.toLong * IvfCentroids}),
         |assign AS (
         |  SELECT vec_id AS id, cid FROM (
         |    SELECT e.vec_id, c.cid,
         |      row_number() OVER (PARTITION BY e.vec_id
         |        ORDER BY round(${duckCos("e.embedding", "c.cv")}, 6) DESC,
         |                 c.cid) AS rn
         |    FROM embeddings e CROSS JOIN cent c) t WHERE rn = 1)
         |SELECT a.id, a.cid,
         |  EXISTS (
         |    SELECT 1 FROM assign b
         |    JOIN embeddings ea ON ea.vec_id = a.id
         |    JOIN embeddings eb ON eb.vec_id = b.id
         |    WHERE b.cid = a.cid AND b.id < a.id
         |      AND round(${duckCos("ea.embedding", "eb.embedding")}, 6)
         |            >= $CosineNearDup) AS dup
         |FROM assign a ORDER BY a.id""".stripMargin) { (s, dir) =>
      Similarity.semanticDedup(embs(s, dir), "vec_id", "embedding")
        .orderBy("id")
    },

    // ---- temperature-weighted domain mixing (α-sampling): rates from
    // one count aggregate, acceptance by portable hash. The oracle
    // recomputes the identical per-domain rate table (same operation
    // order, round-9) and the identical hash rule, so the mix is
    // differentially proven row-for-row, not just by size. -------------
    QueryDef(
      "q_corpus_mix",
      s"""WITH c AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
         |t AS (SELECT sum(nd) AS n, sum(sqrt(nd)) AS s FROM c),
         |r AS (
         |  SELECT lang,
         |    CAST(floor(least(1.0,
         |      round(0.3 * n * sqrt(nd) / (s * nd), 9)) * 1000000.0) AS BIGINT)
         |      AS thr
         |  FROM c CROSS JOIN t)
         |SELECT d.doc_id, d.lang FROM documents d JOIN r USING (lang)
         |WHERE ${duckHash("'m7' || d.doc_id::VARCHAR")} % 1000000 < r.thr
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      Sampling.mixTemperature(docs(s, dir), "lang", "doc_id", 0.3, "m7")
        .select("doc_id", "lang")
        .orderBy("doc_id")
    },

    // ---- temperature mixing with repetition (upsampling): tail
    // domains emit multiple epochs. Oracle rebuilds the identical
    // rate table and expands copies with range() — row-for-row
    // including the epoch numbers. --------------------------------------
    QueryDef(
      "q_corpus_mix_epochs",
      s"""WITH c AS (SELECT lang, count(*) AS nd FROM documents GROUP BY lang),
         |t AS (SELECT sum(nd) AS n, sum(sqrt(nd)) AS s FROM c),
         |r AS (
         |  SELECT lang,
         |    CAST(floor(round(1.2 * n * sqrt(nd) / (s * nd), 9)) AS BIGINT)
         |      AS base,
         |    CAST(floor((round(1.2 * n * sqrt(nd) / (s * nd), 9)
         |      - floor(round(1.2 * n * sqrt(nd) / (s * nd), 9))) * 1000000.0)
         |      AS BIGINT) AS extra_thr
         |  FROM c CROSS JOIN t),
         |x AS (
         |  SELECT d.doc_id, d.lang,
         |    r.base + CASE WHEN ${duckHash("'e9' || d.doc_id::VARCHAR")}
         |      % 1000000 < r.extra_thr THEN 1 ELSE 0 END AS copies
         |  FROM documents d JOIN r USING (lang))
         |SELECT doc_id, lang, CAST(e.epoch AS BIGINT) AS epoch
         |FROM x, unnest(range(1, copies + 1)) AS e(epoch)
         |WHERE copies > 0
         |ORDER BY doc_id, epoch""".stripMargin) { (s, dir) =>
      Sampling.mixEpochs(docs(s, dir), "lang", "doc_id", 1.2, "e9")
        .select("doc_id", "lang", "epoch")
        .orderBy("doc_id", "epoch")
    },

    // ---- training-sequence packing: deterministic order, bucketed
    // cumulative token offsets, contiguous bin assignment. The oracle
    // recomputes the identical (bucket, hash, id) order, per-bucket
    // running sums, and bucket prefix offsets — start offsets and bin
    // numbers prove row-for-row. ---------------------------------------
    QueryDef(
      "q_corpus_pack",
      s"""WITH base AS (
         |  SELECT doc_id,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |    ${duckHash("'pk' || doc_id::VARCHAR")} % 8 AS bucket,
         |    ${duckHash("'pk' || doc_id::VARCHAR")} AS hk
         |  FROM documents),
         |cum AS (
         |  SELECT doc_id, n_tokens, bucket,
         |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY hk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_in_bucket
         |  FROM base),
         |tot AS (SELECT bucket, SUM(n_tokens) AS btotal FROM base
         |        GROUP BY bucket),
         |pre AS (
         |  SELECT bucket, COALESCE(SUM(btotal) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS prefix
         |  FROM tot)
         |SELECT c.doc_id, c.n_tokens,
         |  CAST(p.prefix + c.cum_in_bucket - c.n_tokens AS BIGINT) AS start_tok,
         |  CAST((p.prefix + c.cum_in_bucket - c.n_tokens) // 512 AS BIGINT) AS bin,
         |  CAST((p.prefix + c.cum_in_bucket - c.n_tokens) % 512 AS BIGINT) AS bin_offset
         |FROM cum c JOIN pre p USING (bucket)
         |ORDER BY c.doc_id""".stripMargin) { (s, dir) =>
      Pack.packSequences(docs(s, dir), "doc_id", "text",
          seqLen = 512, buckets = 8, seed = "pk")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- deterministic stratified sampling ---------------------------
    QueryDef(
      "q_corpus_sample",
      s"""SELECT lang, doc_id FROM (
         |  SELECT lang, doc_id, row_number() OVER (PARTITION BY lang
         |    ORDER BY ${duckHash("'s42' || doc_id::VARCHAR")}, doc_id) AS rk
         |  FROM documents) t
         |WHERE rk <= 20 ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
      Sampling.stratified(docs(s, dir), "lang", "doc_id", 20, "s42")
        .select("lang", "doc_id")
        .orderBy("lang", "doc_id")
    },

    // ---- mergeable HLL sketches: per-type user/event sketches plus
    // the register-wise-max union ('_all'); the oracle rebuilds every
    // register from the portable hash, sums them as the integer
    // Σ 2^(52−M_b) (exact, order-independent), and re-derives the
    // estimate with the identical double expression ------------------
    QueryDef(
      "q_stats_hll", {
        def est0(s: String): String =
          s"""((CAST(0.7213 AS DOUBLE) / (CAST(1 AS DOUBLE)
             |  + CAST(1.079 AS DOUBLE) / 512.0)) * 262144.0
             |  * (4503599627370496.0 / CAST($s AS DOUBLE)))""".stripMargin
        def estSql(s: String, v: String): String =
          s"""CASE WHEN ${est0(s)} <= 1280.0 AND $v > 0
             |  THEN round(512.0 * ln(512.0 / CAST($v AS DOUBLE)), 6)
             |  ELSE round(${est0(s)}, 6) END""".stripMargin
        def rho(h: String): String =
          s"""MAX(CASE WHEN $h // 512 = 0 THEN 52
             |    ELSE 52 - length(printf('%b', $h // 512)) END)"""
            .stripMargin
        def leg(name: String, hcol: String): String =
          s"""r$name AS (
             |  SELECT event_type, $hcol % 512 AS b, ${rho(hcol)} AS m
             |  FROM h GROUP BY 1, 2),
             |f$name AS (
             |  SELECT g.event_type, g.b, COALESCE(r.m, 0) AS m
             |  FROM grid g LEFT JOIN r$name r
             |    ON r.event_type = g.event_type AND r.b = g.b),
             |m$name AS (SELECT b, MAX(m) AS m FROM f$name GROUP BY b),
             |a$name AS (
             |  SELECT grp, CAST(SUM(1::BIGINT << (52 - m)) AS BIGINT) AS s,
             |    CAST(SUM(CASE WHEN m = 0 THEN 1 ELSE 0 END) AS INT) AS v
             |  FROM (SELECT event_type AS grp, m FROM f$name
             |        UNION ALL SELECT '_all', m FROM m$name) t
             |  GROUP BY 1)""".stripMargin
        s"""WITH h AS (
           |  SELECT event_type,
           |    ('0x' || substring(md5('hll' || user_id::VARCHAR), 1, 15))
           |      ::BIGINT AS hu,
           |    ('0x' || substring(md5('hll' || event_id::VARCHAR), 1, 15))
           |      ::BIGINT AS he
           |  FROM events),
           |types AS (SELECT DISTINCT event_type FROM events),
           |grid AS (SELECT t.event_type, g.r AS b
           |         FROM types t CROSS JOIN range(0, 512) g(r)),
           |${leg("u", "hu")},
           |${leg("e", "he")}
           |SELECT au.grp, au.s AS u_s, au.v AS u_v,
           |  ${estSql("au.s", "au.v")} AS u_est,
           |  ae.s AS e_s, ae.v AS e_v,
           |  ${estSql("ae.s", "ae.v")} AS e_est
           |FROM au JOIN ae ON au.grp = ae.grp
           |ORDER BY au.grp""".stripMargin
      }) { (s, dir) =>
      import org.apache.spark.sql.GraftBridge.{column => gc, expression => ge}
      def sk(c: Column) = gc(graft.functions.HllSketchAgg(
        ge(c.cast("string"))).toAggregateExpression())
      def comb(c: Column) = gc(graft.functions.HllCombineAgg(
        ge(c)).toAggregateExpression())
      def st(c: Column) = gc(graft.functions.HllStats(ge(c)))
      val base = Tables.df(s, dir, "events").groupBy(col("event_type"))
        .agg(sk(col("user_id")).as("sku"), sk(col("event_id")).as("ske"))
      val per = base.select(col("event_type").as("grp"),
        st(col("sku")).as("su"), st(col("ske")).as("se"))
      val all = base.agg(comb(col("sku")).as("sku"),
          comb(col("ske")).as("ske"))
        .select(lit("_all").as("grp"),
          st(col("sku")).as("su"), st(col("ske")).as("se"))
      per.unionByName(all).select(col("grp"),
          col("su.s").as("u_s"), col("su.v").as("u_v"),
          col("su.est").as("u_est"),
          col("se.s").as("e_s"), col("se.v").as("e_v"),
          col("se.est").as("e_est"))
        .orderBy("grp")
    },

    // ---- weighted sampling without replacement (Efraimidis–Spirakis):
    // token-count weights, portable-hash uniforms, ln(u)/w key
    // quantized to an integer micro-unit BIGINT (floor(x·1e6+0.5) —
    // exactly-rounded IEEE ops only) so both engines select the
    // identical 100 winners — the oracle recomputes every key ---------
    QueryDef(
      "q_corpus_sample_weighted",
      s"""WITH m AS (
         |  SELECT doc_id,
         |    CAST(floor(ln((${duckHash("'sw1' || doc_id::VARCHAR")} + 1)
         |          / 1152921504606846976.0)
         |      / (len(regexp_extract_all(lower(text),
         |           '[a-z]+|[0-9]|[^a-z0-9 ]')) + 1)
         |      * 1e6 + 0.5) AS BIGINT) AS es_key
         |  FROM documents),
         |s AS (SELECT doc_id, es_key FROM m
         |      ORDER BY es_key DESC, doc_id LIMIT 100)
         |SELECT doc_id, es_key
         |FROM s ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Sampling.sampleWeighted(docs(s, dir), "doc_id",
          (TextOps.tokenCount(col("text")) + lit(1)).cast("double"),
          k = 100, seed = "sw1")
        .select(col("doc_id"), col("es_key"))
        .orderBy("doc_id")
    },

    // ---- per-group weighted sampling (per-language quotas): same
    // A-ES keys, k largest within each lang -----------------------------
    QueryDef(
      "q_corpus_sample_weighted_by",
      s"""WITH m AS (
         |  SELECT lang, doc_id,
         |    CAST(floor(ln((${duckHash("'swg' || doc_id::VARCHAR")} + 1)
         |          / 1152921504606846976.0)
         |      / (len(regexp_extract_all(lower(text),
         |           '[a-z]+|[0-9]|[^a-z0-9 ]')) + 1)
         |      * 1e6 + 0.5) AS BIGINT) AS es_key
         |  FROM documents),
         |r AS (
         |  SELECT lang, doc_id, es_key, row_number() OVER (
         |    PARTITION BY lang ORDER BY es_key DESC, doc_id) AS rk
         |  FROM m)
         |SELECT lang, doc_id, es_key
         |FROM r WHERE rk <= 15 ORDER BY lang, doc_id""".stripMargin) {
      (s, dir) =>
      Sampling.sampleWeightedBy(docs(s, dir), "lang", "doc_id",
          (TextOps.tokenCount(col("text")) + lit(1)).cast("double"),
          kPerGroup = 15, seed = "swg")
        .select(col("lang"), col("doc_id"), col("es_key"))
        .orderBy("lang", "doc_id")
    },

    // ---- token-budget selection: greedy prefix of the quality
    // ordering (stop-ratio score, ids break ties) until the global
    // token budget fills — the oracle recomputes the serial cumsum the
    // two-phase parallel prefix in Sampling.selectByBudget must equal
    // row-for-row -----------------------------------------------------
    QueryDef(
      "q_corpus_budget",
      s"""WITH m AS (
         |  SELECT doc_id, ${duckStopRatio(W, stopwords.head._2)} AS score,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |c AS (
         |  SELECT doc_id, score, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY score DESC, doc_id)
         |      AS BIGINT) AS cum_tokens
         |  FROM m)
         |SELECT doc_id, score, n_tokens, cum_tokens,
         |  cum_tokens <= 20000 AS selected
         |FROM c ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir).withColumn("ws", TextOps.words(col("text")))
      Sampling.selectByBudget(d, "doc_id",
          TextOps.wordRatio("ws", stopwords.head._2),
          TextOps.tokenCount(col("text")), budget = 20000L)
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- LSH ANN top-k — oracle brute-forces the same band contract
    // (see q_dedup_embedding_lsh): rank-by-cosine within the candidates
    // that share ≥1 signature band with the query. Recall vs. the exact
    // top-k is asserted separately in PipelineSpec.
    QueryDef(
      "q_sim_lsh",
      s"""WITH sig AS (
         |  SELECT vec_id, embedding, ${duckSig("embedding")} AS sig
         |  FROM embeddings)
         |SELECT query_id, neighbor_id, rank, cos FROM (
         |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
         |    round(${duckCos("q.embedding", "c.embedding")}, 6) AS cos,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${duckCos("q.embedding", "c.embedding")}, 6) DESC,
         |               c.vec_id) AS rank
         |  FROM sig q JOIN sig c
         |    ON q.vec_id <> c.vec_id AND ${duckBandMatch("q.sig", "c.sig")}
         |  WHERE q.vec_id < $NumQueryVectors) t
         |WHERE rank <= $TopK
         |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val e = embs(s, dir)
      Similarity.lshTopK(
          e.filter(col("vec_id") < NumQueryVectors), e, "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },

    // ---- IVF ANN: inverted-file probe, the partition-pruned scale
    // path next to LSH. The oracle rebuilds the identical index from
    // the deterministic centroid rule (stride over vec_id) with the
    // same round-6 cosine and tie-breaks, so assignment, probing and
    // re-ranking are all differentially proven, not just row counts.
    QueryDef(
      "q_sim_ivf",
      ivfOracle) { (s, dir) =>
      val e = embs(s, dir)
      Similarity.ivfTopK(
          e.filter(col("vec_id") < NumQueryVectors), e, "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },

    // ---- persisted IVF index lifecycle ([[AnnIndex]]): TRAIN+BUILD on
    // the id prefix (which contains every stride-rule centroid id),
    // APPEND the remainder against the persisted centroids WITHOUT
    // re-training, then answer top-k from the PERSISTED tables alone.
    // The oracle is q_sim_ivf's from-scratch rebuild — identical rows
    // prove the persisted artifacts and the incremental append change
    // nothing about the answer.
    QueryDef(
      "q_sim_ivf_persisted",
      ivfOracle) { (s, dir) =>
      val e = embs(s, dir)
      val eng = graft.LakeEngine(s)
      val base = java.nio.file.Files
        .createTempDirectory("annidx").toString
      // the prefix covers every candidate centroid id (vec_id < 496),
      // so building on it trains the same quantizer the oracle derives
      // from the full corpus; everything after is pure append
      val split = IvfCentroidStride.toLong * IvfCentroids
      AnnIndex.buildIvf(eng, "annp", base,
        e.filter(col("vec_id") < split), "vec_id", "embedding")
      AnnIndex.appendIvf(eng, "annp",
        e.filter(col("vec_id") >= split), "vec_id", "embedding")
      AnnIndex.ivfTopK(eng, "annp",
          e.filter(col("vec_id") < NumQueryVectors), "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },

    // ---- IVF-PQ: coarse inverted lists + product-quantized codes +
    // asymmetric distance re-rank. The oracle rebuilds the stride-rule
    // codebooks, re-derives every vector's argmin code per subspace,
    // and recomputes every ADC distance as the exact DECIMAL(28,6)
    // sum of round-6 slice distances — the full index replayed from
    // scratch in SQL. -------------------------------------------------
    QueryDef(
      "q_sim_ivfpq",
      ivfPqOracle) { (s, dir) =>
      val e = embs(s, dir)
      Similarity.ivfPqTopK(
          e.filter(col("vec_id") < NumQueryVectors), e, "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },

    // ---- persisted IVF-PQ lifecycle: centroids, sub-quantizer
    // codebooks and PQ-coded postings persist as lake tables; the
    // remainder appends its CODES against the persisted codebooks (no
    // re-training); query = ADC over the probed persisted lists. Same
    // from-scratch oracle as q_sim_ivfpq — identical rows prove the
    // persisted artifacts round-trip the quantizers exactly.
    QueryDef(
      "q_sim_ivfpq_persisted",
      ivfPqOracle) { (s, dir) =>
      val e = embs(s, dir)
      val eng = graft.LakeEngine(s)
      val base = java.nio.file.Files
        .createTempDirectory("annidxpq").toString
      // the prefix covers every centroid id (< 496) AND every codebook
      // id (< PqStride*PqK = 448), so training on it equals the
      // oracle's full-corpus stride rule
      val split = IvfCentroidStride.toLong * IvfCentroids
      AnnIndex.buildIvfPq(eng, "annpq", base,
        e.filter(col("vec_id") < split), "vec_id", "embedding")
      AnnIndex.appendIvfPq(eng, "annpq",
        e.filter(col("vec_id") >= split), "vec_id", "embedding")
      AnnIndex.ivfPqTopK(eng, "annpq",
          e.filter(col("vec_id") < NumQueryVectors), "vec_id", "embedding")
        .orderBy("query_id", "rank")
    },


    // ---- distributed Lloyd's k-means, differentially proven: the
    // oracle replays both iterations — stride seed, round-6 cosine
    // argmax with lowest-cid tie-break, DECIMAL-exact per-dimension
    // sums narrowed through the same double→float pipeline — so the
    // final centroids compare bit-for-bit, per dimension. This is the
    // production centroid path feeding semanticDedup/ivfTopK. --------
    QueryDef(
      "q_sim_kmeans", {
        def assign(n: Int, cSrc: String): String =
          s"""a$n AS (
             |  SELECT id, cid, v FROM (
             |    SELECT e.vec_id AS id, c.cid, e.embedding AS v,
             |      row_number() OVER (PARTITION BY e.vec_id
             |        ORDER BY round(${duckCos("e.embedding", "c.cv")}, 6) DESC,
             |                 c.cid) AS rn
             |    FROM embeddings e CROSS JOIN $cSrc c) t WHERE rn = 1)"""
            .stripMargin
        def means(n: Int): String =
          s"""m$n AS (
             |  SELECT cid, CAST(i AS INT) AS pos,
             |    CAST(CAST(sum(CAST(round(v[i + 1]::DOUBLE * 16777216.0)
             |        AS BIGINT)) AS DOUBLE)
             |      / (count(*) * 16777216.0) AS REAL) AS m
             |  FROM a$n, unnest(range(0, $EmbeddingDim)) AS t(i)
             |  GROUP BY cid, i),
             |c$n AS (SELECT cid, list(m ORDER BY pos) AS cv
             |        FROM m$n GROUP BY cid)""".stripMargin
        s"""WITH c0 AS (
           |  SELECT vec_id AS cid, embedding AS cv FROM embeddings
           |  WHERE vec_id % $IvfCentroidStride = 0
           |    AND vec_id < ${IvfCentroidStride.toLong * IvfCentroids}),
           |${assign(1, "c0")},
           |${means(1)},
           |${assign(2, "c1")},
           |${means(2)}
           |SELECT cid, pos, m FROM m2
           |ORDER BY cid, pos""".stripMargin
      }) { (s, dir) =>
      Similarity.kmeans(embs(s, dir), "vec_id", "embedding",
          k = IvfCentroids, iters = 2)
        .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "m")))
        .orderBy("cid", "pos")
    },

    // ---- Gopher-style repetition metrics: scan-local lambda
    // expressions, zero shuffles at any corpus size ------------------
    QueryDef(
      "q_text_repetition",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, ws,
         |    CASE WHEN len(ws) >= 2
         |      THEN list_transform(range(1, len(ws)),
         |        i -> ws[i] || ' ' || ws[i + 1])
         |      ELSE [] END AS bg
         |  FROM w)
         |SELECT doc_id,
         |  1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup_word_ratio,
         |  CASE WHEN len(bg) = 0 THEN 0.0
         |    ELSE list_max(list_transform(list_distinct(bg),
         |        x -> len(list_filter(bg, y -> y = x))))::DOUBLE / len(bg)
         |    END AS top_bigram_ratio
         |FROM g ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .withColumn("bg", TextOps.bigrams("ws"))
        .select(col("doc_id"),
          TextOps.dupWordRatio("ws").as("dup_word_ratio"),
          TextOps.topBigramRatio("bg").as("top_bigram_ratio"))
        .orderBy("doc_id")
    },

    // ---- C4/Gopher-style quality filter: keep/drop + reason tags ----
    QueryDef(
      "q_text_quality_filter",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |m AS (
         |  SELECT doc_id,
         |    len(ws) AS n_words,
         |    1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup_ratio,
         |    list_reduce(list_transform(ws, x -> length(x)),
         |      (a, b) -> a + b)::DOUBLE / len(ws) AS awl
         |  FROM w)
         |SELECT doc_id,
         |  (n_words >= 20 AND dup_ratio <= 0.55
         |    AND awl >= 2.0 AND awl <= 10.0) AS keep,
         |  concat(
         |    CASE WHEN n_words < 20 THEN 'short;' ELSE '' END,
         |    CASE WHEN dup_ratio > 0.55 THEN 'repetitive;' ELSE '' END,
         |    CASE WHEN awl < 2.0 OR awl > 10.0 THEN 'word_len;' ELSE '' END
         |  ) AS reasons
         |FROM m ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .withColumn("n_words", size(col("ws")))
        .withColumn("dup_ratio", TextOps.dupWordRatio("ws"))
        .withColumn("awl", TextOps.avgWordLen("ws"))
        .select(col("doc_id"),
          (col("n_words") >= 20 && col("dup_ratio") <= 0.55 &&
            col("awl") >= 2.0 && col("awl") <= 10.0).as("keep"),
          concat(
            when(col("n_words") < 20, lit("short;")).otherwise(lit("")),
            when(col("dup_ratio") > 0.55, lit("repetitive;")).otherwise(lit("")),
            when(col("awl") < 2.0 || col("awl") > 10.0, lit("word_len;"))
              .otherwise(lit(""))).as("reasons"))
        .orderBy("doc_id")
    },

    // ---- overlapping chunking (RAG/training prep): size-12 windows
    // every 8 words, one row per chunk; scan-local + explode ---------
    QueryDef(
      "q_text_chunks",
      """WITH w AS (
        |  SELECT doc_id, string_split(lower(text), ' ') AS ws
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, unnest(list_transform(
        |    range(0, greatest(0, CAST(ceil((len(ws) - 12) / 8.0)
        |      AS INT)) + 1),
        |    i -> {'chunk_no': i,
        |          'chunk_text': array_to_string(ws[i*8+1 : i*8+12], ' ')}))
        |    AS c
        |  FROM w)
        |SELECT doc_id, c.chunk_no AS chunk_no, c.chunk_text AS chunk_text
        |FROM e ORDER BY doc_id, chunk_no""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"),
          explode(TextOps.chunks("ws", size = 12, stride = 8)).as("c"))
        .select(col("doc_id"), col("c.chunk_no").cast("long").as("chunk_no"),
          col("c.chunk_text"))
        .orderBy("doc_id", "chunk_no")
    },

    // ---- line-level cross-corpus dedup (CCNet/FineWeb boilerplate
    // filter): fixed 10-word segments stand in for lines (the fixture
    // corpus is single-line); any segment whose normalized 60-bit hash
    // occurs in >1 distinct docs is removed from EVERY doc, survivors
    // reassemble in original order --------------------------------------
    QueryDef(
      "q_dedup_lines",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |l AS (
         |  SELECT doc_id, u.line_no AS line_no, u.line AS line,
         |    ${duckHash(
              "regexp_replace(trim(lower(u.line)), '\\s+', ' ', 'g')")} AS lh
         |  FROM (SELECT doc_id, unnest(list_transform(
         |    range(0, CAST(ceil(len(ws) / 10.0) AS INT)),
         |    i -> {'line_no': i,
         |          'line': array_to_string(ws[i*10+1 : i*10+10], ' ')})) AS u
         |  FROM w) t),
         |hot AS (SELECT lh FROM l GROUP BY lh HAVING count(DISTINCT doc_id) > 1),
         |kept AS (SELECT * FROM l WHERE lh NOT IN (SELECT lh FROM hot)),
         |reb AS (
         |  SELECT doc_id,
         |    array_to_string(list(line ORDER BY line_no), ' ') AS clean_text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT w.doc_id,
         |  coalesce(reb.clean_text, '') AS clean_text,
         |  coalesce(reb.n_kept, 0) AS n_kept,
         |  CAST(ceil(len(w.ws) / 10.0) AS BIGINT) - coalesce(reb.n_kept, 0)
         |    AS n_removed
         |FROM w LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      val d = docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .withColumn("lines", expr(
          """transform(sequence(0, cast(ceil(size(ws) / 10.0) as int) - 1),
            |  i -> array_join(slice(ws, i * 10 + 1, 10), ' '))""".stripMargin))
      Dedup.dedupLines(d, "doc_id", col("lines"), maxDocs = 1, lineSep = " ")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- incremental line dedup: clean a new batch (doc_id % 10 = 9)
    // against persisted corpus line frequencies — corpus docs never
    // re-read; hot rule counts corpus + batch docs, identical to the
    // full-corpus filter (PipelineSpec pins that equality) ------------
    QueryDef(
      "q_dedup_lines_incremental",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |l AS (
         |  SELECT doc_id, u.line_no AS line_no, u.line AS line,
         |    ${duckHash(
              "regexp_replace(trim(lower(u.line)), '\\s+', ' ', 'g')")} AS lh
         |  FROM (SELECT doc_id, unnest(list_transform(
         |    range(0, CAST(ceil(len(ws) / 10.0) AS INT)),
         |    i -> {'line_no': i,
         |          'line': array_to_string(ws[i*10+1 : i*10+10], ' ')})) AS u
         |  FROM w) t),
         |cdf AS (SELECT lh, count(DISTINCT doc_id) AS docs FROM l
         |        WHERE doc_id % 10 <> 9 GROUP BY lh),
         |bdf AS (SELECT lh, count(DISTINCT doc_id) AS bdocs FROM l
         |        WHERE doc_id % 10 = 9 GROUP BY lh),
         |hot AS (SELECT bdf.lh FROM bdf LEFT JOIN cdf USING (lh)
         |        WHERE coalesce(cdf.docs, 0) + bdf.bdocs > 1),
         |kept AS (SELECT * FROM l WHERE doc_id % 10 = 9
         |         AND lh NOT IN (SELECT lh FROM hot)),
         |reb AS (
         |  SELECT doc_id, array_to_string(list(line ORDER BY line_no), ' ')
         |    AS clean_text, count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT w.doc_id,
         |  coalesce(reb.clean_text, '') AS clean_text,
         |  coalesce(reb.n_kept, 0) AS n_kept,
         |  CAST(ceil(len(w.ws) / 10.0) AS BIGINT) - coalesce(reb.n_kept, 0)
         |    AS n_removed
         |FROM w LEFT JOIN reb USING (doc_id)
         |WHERE w.doc_id % 10 = 9 ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .withColumn("lines", expr(
          """transform(sequence(0, cast(ceil(size(ws) / 10.0) as int) - 1),
            |  i -> array_join(slice(ws, i * 10 + 1, 10), ' '))""".stripMargin))
      val state = Dedup.lineStats(
        d.filter(col("doc_id") % 10 =!= 9), "doc_id", col("lines"))
      Dedup.dedupLinesIncremental(state, d.filter(col("doc_id") % 10 === 9),
          "doc_id", col("lines"), maxDocs = 1, lineSep = " ")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- Unicode NFC normalization: decomposed accents injected
    // deterministically (e -> e + U+0301 combining acute), then
    // canonicalized back; the JDK and DuckDB's utf8proc implement the
    // same Unicode algorithm, so strings and codepoint lengths match
    // exactly (len_nfc must equal len_raw) ------------------------------
    QueryDef(
      "q_text_normalize",
      """SELECT doc_id,
        |  nfc_normalize(replace(text, 'e', 'e' || chr(769))) AS nfc_text,
        |  CAST(length(text) AS BIGINT) AS len_raw,
        |  CAST(length(replace(text, 'e', 'e' || chr(769))) AS BIGINT)
        |    AS len_marked,
        |  CAST(length(nfc_normalize(replace(text, 'e', 'e' || chr(769))))
        |    AS BIGINT) AS len_nfc
        |FROM documents ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val marked = regexp_replace(col("text"), "e", "é")
      docs(s, dir).select(col("doc_id"),
          TextOps.normalizeNfc(marked).as("nfc_text"),
          length(col("text")).cast("long").as("len_raw"),
          length(marked).cast("long").as("len_marked"),
          length(TextOps.normalizeNfc(marked)).cast("long").as("len_nfc"))
        .orderBy("doc_id")
    },

    // ---- BPE tokenizer training + encode: merges train distributed on
    // the corpus itself, every word encodes scan-locally, and the token
    // sequence must concatenate back to its exact word (DuckDB replays
    // the identity side). Merge-choice correctness is proven separately
    // by PipelineSpec's sequential-reference differential — this query
    // pins the ENCODER's structure corpus-wide (no dropped/duplicated/
    // mangled symbols on any of the ~30k word instances) --------------
    QueryDef(
      "q_bpe_roundtrip",
      """SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.w AS w_rt
        |FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(ws)),
        |    i -> {'pos': i, 'w': ws[i+1]})) AS u
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |        FROM documents) t) s
        |WHERE length(u.w) > 0
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      val merges = Bpe.train(docs(s, dir), "text", BpeMerges)
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          array_join(Bpe.encodeWord(col("w"), merges), "").as("w_rt"))
        .orderBy("doc_id", "pos")
    },

    // ---- WordPiece tokenizer roundtrip: train the likelihood-scored
    // merge vocabulary in-engine, greedy-longest-match encode every
    // word instance, strip the ## continuation markers and reassemble
    // — the corpus-wide structural pin (training is proven
    // vocab-for-vocab against a sequential reference in PipelineSpec;
    // the alphabet covers every corpus char, so no word ever
    // collapses to [UNK] here) -----------------------------------------
    QueryDef(
      "q_wordpiece_roundtrip",
      """SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.w AS w_rt
        |FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(ws)),
        |    i -> {'pos': i, 'w': ws[i+1]})) AS u
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |        FROM documents) t) s
        |WHERE length(u.w) > 0
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      val vocab = WordPiece.train(docs(s, dir), "text", BpeMerges)
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .withColumn("toks", WordPiece.encodeWord(col("w"), vocab))
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          expr("""array_join(transform(toks, (p, i) ->
            |  CASE WHEN i = 0 THEN p ELSE substring(p, 3) END), '')"""
            .stripMargin).as("w_rt"))
        .orderBy("doc_id", "pos")
    },

    // ---- unigram-LM tokenizer (SentencePiece) roundtrip: train the
    // EM-pruned unigram model in-engine, Viterbi-encode every word
    // instance, reassemble — same corpus-wide structural pin as the
    // BPE twin (training itself is proven round-for-round against a
    // sequential reference in PipelineSpec) --------------------------
    QueryDef(
      "q_unigram_roundtrip",
      """SELECT doc_id, CAST(u.pos AS BIGINT) AS pos, u.w AS w_rt
        |FROM (
        |  SELECT doc_id, unnest(list_transform(range(0, len(ws)),
        |    i -> {'pos': i, 'w': ws[i+1]})) AS u
        |  FROM (SELECT doc_id, string_split(lower(text), ' ') AS ws
        |        FROM documents) t) s
        |WHERE length(u.w) > 0
        |ORDER BY doc_id, pos""".stripMargin) { (s, dir) =>
      val vocab = Unigram.train(docs(s, dir), "text")
      docs(s, dir)
        .withColumn("ws", TextOps.words(col("text")))
        .select(col("doc_id"), posexplode(col("ws")).as(Seq("pos", "w")))
        .filter(length(col("w")) > 0)
        .select(col("doc_id"), col("pos").cast("long").as("pos"),
          array_join(Unigram.segment(col("w"), vocab), "").as("w_rt"))
        .orderBy("doc_id", "pos")
    },

    // ---- int8 embedding quantization: 4× storage cut with bounded
    // error; floor(v·scale + 0.5) so the oracle matches bit-for-bit --
    QueryDef(
      "q_embedding_quantize",
      s"""SELECT vec_id, array_to_string(
         |  CASE WHEN list_max(list_transform(embedding, v -> abs(v::DOUBLE))) = 0.0
         |    THEN list_transform(embedding, v -> 0)
         |    ELSE list_transform(embedding, v -> CAST(floor(
         |      v::DOUBLE *
         |        (127.0 / list_max(list_transform(embedding, x -> abs(x::DOUBLE))))
         |      + 0.5) AS INT))
         |    END, ',') AS q8
         |FROM embeddings ORDER BY vec_id""".stripMargin) { (s, dir) =>
      embs(s, dir)
        .select(col("vec_id"),
          array_join(Similarity.quantizeInt8("embedding"), ",").as("q8"))
        .orderBy("vec_id")
    },

    // ---- end-to-end curation: quality gate → exact dedup →
    // deterministic subsample, the full pre-tokenization pass as ONE
    // judged query with a complete SQL oracle ------------------------
    QueryDef(
      "q_pipeline_curate",
      s"""WITH w AS (
         |  SELECT doc_id, text, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, text, len(ws) AS n_words,
         |    1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup,
         |    list_reduce(list_transform(ws, x -> length(x)),
         |      (a, b) -> a + b)::DOUBLE / len(ws) AS awl
         |  FROM w),
         |q AS (
         |  SELECT doc_id, n_words,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM m
         |  WHERE n_words >= 20 AND dup <= 0.55
         |    AND awl >= 2.0 AND awl <= 10.0),
         |d AS (
         |  SELECT doc_id, fingerprint, n_words,
         |    min(doc_id) OVER (PARTITION BY fingerprint) AS rep
         |  FROM q)
         |SELECT doc_id, fingerprint, n_words FROM d
         |WHERE doc_id = rep
         |  AND ${duckHash("'c42' || doc_id::VARCHAR")} % 4 = 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curate.curate(docs(s, dir), "doc_id", "text", sampleMod = 4, "c42")
        .orderBy("doc_id")
    },

    // ---- curation with the ML gate: the hashed-feature classifier
    // replaces the C4/Gopher rules, folded scan-locally (BIGINT
    // pico-unit sum is exact ⇒ order-independent ⇒ the oracle's
    // list_sum of the same per-token integers is the identical gate);
    // dedup + sample stages unchanged, so the whole composition still
    // has ONE window shuffle and zero joins ---------------------------
    QueryDef(
      "q_pipeline_curate_ml",
      s"""WITH w AS (
         |  SELECT doc_id, text, $W AS ws FROM documents),
         |g AS (
         |  SELECT doc_id, text, len(ws) AS n_words
         |  FROM w
         |  WHERE list_sum(list_transform(ws, t -> CAST(floor(
         |      ((${duckHash("t")} % $QcBuckets * $QcWeightA + $QcWeightB)
         |         % $QcWeightMod - ${QcWeightMod / 2})
         |        / ${QcWeightMod / 2}.0 / len(ws) * 1e12 + 0.5)
         |      AS BIGINT))) >= 0),
         |q AS (
         |  SELECT doc_id, n_words,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM g),
         |d AS (
         |  SELECT doc_id, fingerprint, n_words,
         |    min(doc_id) OVER (PARTITION BY fingerprint) AS rep
         |  FROM q)
         |SELECT doc_id, fingerprint, n_words FROM d
         |WHERE doc_id = rep
         |  AND ${duckHash("'ml42' || doc_id::VARCHAR")} % 4 = 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curate.curateMl(docs(s, dir), "doc_id", "text", sampleMod = 4, "ml42")
        .orderBy("doc_id")
    },

    // ---- full training-prep composition: quality gate → exact dedup
    // → temperature mix (rates from the CLEAN corpus) → sequence
    // packing. Every stage is replayed in one SQL oracle, so the whole
    // 4-stage pipeline is differentially proven end-to-end, including
    // the pack offsets of the mixed survivors. ------------------------
    QueryDef(
      "q_pipeline_train",
      s"""WITH w AS (
         |  SELECT doc_id, lang, text,
         |    string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |m AS (
         |  SELECT doc_id, lang, text, len(ws) AS n_words,
         |    1.0 - len(list_distinct(ws))::DOUBLE / len(ws) AS dup,
         |    list_reduce(list_transform(ws, x -> length(x)),
         |      (a, b) -> a + b)::DOUBLE / len(ws) AS awl
         |  FROM w),
         |q AS (
         |  SELECT doc_id, lang, text,
         |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM m
         |  WHERE n_words >= 20 AND dup <= 0.55
         |    AND awl >= 2.0 AND awl <= 10.0),
         |clean AS (
         |  SELECT doc_id, lang, text FROM (
         |    SELECT doc_id, lang, text,
         |      min(doc_id) OVER (PARTITION BY fingerprint) AS rep
         |    FROM q) d WHERE doc_id = rep),
         |c AS (SELECT lang, count(*) AS nd FROM clean GROUP BY lang),
         |t AS (SELECT sum(nd) AS n, sum(sqrt(nd)) AS s FROM c),
         |r AS (
         |  SELECT lang,
         |    CAST(floor(least(1.0,
         |      round(0.5 * n * sqrt(nd) / (s * nd), 9)) * 1000000.0) AS BIGINT)
         |      AS thr
         |  FROM c CROSS JOIN t),
         |mixed AS (
         |  SELECT d.doc_id, d.lang, d.text FROM clean d JOIN r USING (lang)
         |  WHERE ${duckHash("'tr' || d.doc_id::VARCHAR")} % 1000000 < r.thr),
         |base AS (
         |  SELECT doc_id, lang,
         |    CAST(len(regexp_extract_all(lower(text),
         |      '[a-z]+|[0-9]|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
         |    ${duckHash("'trp' || doc_id::VARCHAR")} % 8 AS bucket,
         |    ${duckHash("'trp' || doc_id::VARCHAR")} AS hk
         |  FROM mixed),
         |cum AS (
         |  SELECT doc_id, lang, n_tokens, bucket,
         |    SUM(n_tokens) OVER (PARTITION BY bucket ORDER BY hk, doc_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
         |      AS cum_in_bucket
         |  FROM base),
         |tot AS (SELECT bucket, SUM(n_tokens) AS btotal FROM base
         |        GROUP BY bucket),
         |pre AS (
         |  SELECT bucket, COALESCE(SUM(btotal) OVER (ORDER BY bucket
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |    AS prefix
         |  FROM tot)
         |SELECT cc.doc_id, cc.lang, cc.n_tokens,
         |  CAST(p.prefix + cc.cum_in_bucket - cc.n_tokens AS BIGINT) AS start_tok,
         |  CAST((p.prefix + cc.cum_in_bucket - cc.n_tokens) // 384 AS BIGINT) AS bin,
         |  CAST((p.prefix + cc.cum_in_bucket - cc.n_tokens) % 384 AS BIGINT) AS bin_offset
         |FROM cum cc JOIN pre p USING (bucket)
         |ORDER BY cc.doc_id""".stripMargin) { (s, dir) =>
      Curate.curateForTraining(docs(s, dir), "doc_id", "text", "lang",
          targetFrac = 0.5, seqLen = 384, seed = "tr")
        .withColumnRenamed("id", "doc_id")
        .select("doc_id", "lang", "n_tokens", "start_tok", "bin",
          "bin_offset")
        .orderBy("doc_id")
    },

    // ---- benchmark decontamination: corpus docs sharing any 5-gram
    // with the "benchmark" slice (doc_id % 41 = 0). The oracle is the
    // same broadcast-join semantics brute-forced in SQL, so the
    // differential proves both the n-gram extraction and the overlap
    // rule end-to-end ------------------------------------------------
    QueryDef(
      "q_decontaminate",
      s"""WITH bench AS (
         |  SELECT DISTINCT unnest(${duckShingles(W, DecontamN)}) AS g
         |  FROM documents WHERE doc_id % $DecontamSlice = 0),
         |hits AS (
         |  SELECT doc_id, count(*) AS n
         |  FROM (SELECT doc_id, unnest(${duckShingles(W, DecontamN)}) AS g
         |        FROM documents WHERE doc_id % $DecontamSlice <> 0) c
         |  JOIN bench USING (g)
         |  GROUP BY doc_id)
         |SELECT d.doc_id,
         |  coalesce(h.n, 0) AS contaminated_ngrams,
         |  coalesce(h.n, 0) > 0 AS contaminated
         |FROM documents d LEFT JOIN hits h USING (doc_id)
         |WHERE d.doc_id % $DecontamSlice <> 0
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      Decontaminate.scan(
          d.filter(col("doc_id") % DecontamSlice =!= 0), "doc_id", "text",
          d.filter(col("doc_id") % DecontamSlice === 0), "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- dataset-level overlap report: per source-pair distinct-
    // shingle Jaccard + both containments — the "how much do these two
    // datasets overlap" number a curator reads before mixing crawls or
    // diffing dataset versions. Exact path judged here; the KMV-sketch
    // scale path is spec-pinned against it (CorpusOverlapSpec) --------
    QueryDef(
      "q_corpus_overlap",
      s"""WITH sh AS (
         |  SELECT DISTINCT source AS slice, unnest(${duckShingles(W)}) AS g
         |  FROM documents),
         |sizes AS (SELECT slice, count(*) AS n FROM sh GROUP BY slice),
         |inter AS (
         |  SELECT a.slice AS a_slice, b.slice AS b_slice,
         |    count(*) AS common
         |  FROM sh a JOIN sh b USING (g) WHERE a.slice < b.slice
         |  GROUP BY 1, 2)
         |SELECT a_slice, b_slice,
         |  CAST(sa.n AS BIGINT) AS a_size, CAST(sb.n AS BIGINT) AS b_size,
         |  CAST(common AS BIGINT) AS common,
         |  round(common::DOUBLE / (sa.n + sb.n - common), 6) AS jaccard,
         |  round(common::DOUBLE / sa.n, 6) AS containment_a,
         |  round(common::DOUBLE / sb.n, 6) AS containment_b
         |FROM inter
         |JOIN sizes sa ON sa.slice = a_slice
         |JOIN sizes sb ON sb.slice = b_slice
         |ORDER BY a_slice, b_slice""".stripMargin) { (s, dir) =>
      CorpusOverlap.overlapExact(docs(s, dir), "source", "text")
    },

    // ---- train/eval split leakage audit: near-dup pairs (exact
    // jaccard ≥ threshold, found via the banded MinHash join) that
    // cross the deterministic hash split — each row is a contaminated
    // eval doc. Brute-force oracle ⇒ the differential again proves
    // LSH candidate recall, now composed with the split rule ---------
    QueryDef(
      "q_split_leakage",
      s"""WITH sh AS (
         |  SELECT doc_id, ${duckShingles(W)} AS s,
         |    CASE WHEN ${duckHash("'sp1' || doc_id::VARCHAR")} % $SplitBuckets
         |        < $SplitTrainBuckets THEN 'train' ELSE 'eval' END AS split
         |  FROM documents)
         |SELECT a.doc_id AS a_id, b.doc_id AS b_id,
         |  a.split AS a_split, b.split AS b_split,
         |  round(len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))), 6) AS jaccard
         |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
         |WHERE a.split <> b.split
         |  AND len(list_intersect(a.s, b.s))::DOUBLE /
         |    (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= $MinhashJaccard
         |ORDER BY a_id, b_id""".stripMargin) { (s, dir) =>
      Sampling.splitLeakage(docs(s, dir), "doc_id", "text", "sp1")
        .select(col("a_id"), col("b_id"), col("a_split"), col("b_split"),
          round(col("jaccard"), 6).as("jaccard"))
        .orderBy("a_id", "b_id")
    },

    // ---- bigram-LM coverage: score each doc against the top-500
    // corpus bigram model (two-pass: bounded model aggregated then
    // broadcast; one corpus re-scan). Integer counts + one per-row
    // division keep the differential bit-exact -----------------------
    QueryDef(
      "q_text_lm_coverage",
      s"""WITH w AS (
         |  SELECT doc_id, string_split(lower(text), ' ') AS ws
         |  FROM documents),
         |bg AS (
         |  SELECT doc_id,
         |    CASE WHEN len(ws) >= 2
         |      THEN list_transform(range(1, len(ws)),
         |        i -> ws[i] || ' ' || ws[i + 1])
         |      ELSE [] END AS bgs
         |  FROM w),
         |e AS (SELECT doc_id, unnest(bgs) AS g FROM bg),
         |model AS (
         |  SELECT g FROM e GROUP BY g
         |  ORDER BY count(*) DESC, g LIMIT $LmModelK),
         |cov AS (
         |  SELECT e.doc_id, count(*) AS total, count(m.g) AS covered
         |  FROM e LEFT JOIN model m ON e.g = m.g
         |  GROUP BY e.doc_id)
         |SELECT d.doc_id,
         |  coalesce(c.total, 0) AS total_bigrams,
         |  coalesce(c.covered, 0) AS covered_bigrams,
         |  CASE WHEN coalesce(c.total, 0) > 0
         |    THEN c.covered::DOUBLE / c.total ELSE 0.0 END AS lm_coverage
         |FROM documents d LEFT JOIN cov c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      LangModel.coverage(d, "doc_id", "text", LangModel.bigramModel(d, "text"))
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- corpus health report: the one-shot profile a pipeline runs
    // before training — sizes, per-domain/lang counts, exact-dup mass,
    // and token-length deciles (scale-exact quantile operator), all as
    // one (metric, key, value) frame ---------------------------------
    QueryDef(
      "q_corpus_report",
      """WITH w AS (
        |  SELECT doc_id, lang, source,
        |    len(string_split(lower(text), ' ')) AS n_words,
        |    md5(regexp_replace(trim(lower(text)), '\\s+', ' ', 'g')) AS fp
        |  FROM documents),
        |q AS (SELECT quantile_cont(CAST(n_words AS DOUBLE),
        |    [0.1, 0.5, 0.9]) AS vs FROM w)
        |SELECT 'docs' AS metric, 'total' AS key,
        |  CAST(count(*) AS DOUBLE) AS value FROM w
        |UNION ALL
        |SELECT 'tokens', 'total', CAST(sum(n_words) AS DOUBLE) FROM w
        |UNION ALL
        |SELECT 'dedup', 'exact_dup_docs',
        |  CAST(count(*) - count(DISTINCT fp) AS DOUBLE) FROM w
        |UNION ALL
        |SELECT 'lang', lang, CAST(count(*) AS DOUBLE) FROM w GROUP BY lang
        |UNION ALL
        |SELECT 'source', source, CAST(count(*) AS DOUBLE) FROM w
        |GROUP BY source
        |UNION ALL
        |SELECT 'len_q', CAST(u.q AS VARCHAR), round(q.vs[u.i], 6)
        |FROM (SELECT unnest([0.1, 0.5, 0.9]) AS q,
        |        unnest([1, 2, 3]) AS i) u, q
        |ORDER BY metric, key""".stripMargin) { (s, dir) =>
      import s.implicits._
      val d = docs(s, dir)
        .withColumn("n_words", size(TextOps.words(col("text"))))
        .withColumn("fp", TextOps.fingerprint(col("text")))
      val totals = d.agg(
        count(lit(1)).cast("double").as("docs"),
        sum("n_words").cast("double").as("tokens"),
        (count(lit(1)) - countDistinct("fp")).cast("double").as("dups"))
      val head = totals.select(explode(array(
        struct(lit("docs").as("metric"), lit("total").as("key"),
          col("docs").as("value")),
        struct(lit("tokens").as("metric"), lit("total").as("key"),
          col("tokens").as("value")),
        struct(lit("dedup").as("metric"), lit("exact_dup_docs").as("key"),
          col("dups").as("value"))))
          .as("r")).select("r.*")
      val byLang = d.groupBy(col("lang").as("key"))
        .agg(count(lit(1)).cast("double").as("value"))
        .select(lit("lang").as("metric"), col("key"), col("value"))
      val bySource = d.groupBy(col("source").as("key"))
        .agg(count(lit(1)).cast("double").as("value"))
        .select(lit("source").as("metric"), col("key"), col("value"))
      val qs = Seq(0.1, 0.5, 0.9)
      val deciles = qs.zip(Stats.exactQuantiles(d, "n_words", qs))
        .toDF("q", "v")
        .select(lit("len_q").as("metric"), col("q").cast("string").as("key"),
          round(col("v"), 6).as("value"))
      head.union(byLang).union(bySource).union(deciles)
        .orderBy("metric", "key")
    },

    // ---- character-entropy quality signal (the RefinedWeb-style
    // gibberish/repetition detector): per-doc Shannon entropy over
    // code-point counts in the integer micro-unit contract — each
    // ln(n) quantized as lnµ(n) = floor(ln(n)·1e6+0.5) BIGINT, then
    // entropy_lu = lnµ(L)·L − Σ n·lnµ(n) is EXACT integer arithmetic
    // (= H·L in micro-nats): no decimal cast, no division, nothing an
    // engine build can round differently ----------------------------
    QueryDef(
      "q_text_entropy",
      """WITH ch AS (
        |  SELECT doc_id, unnest(regexp_extract_all(text, '[\s\S]')) AS c
        |  FROM documents WHERE length(text) > 0),
        |cc AS (SELECT doc_id, c, count(*) AS n FROM ch GROUP BY doc_id, c),
        |agg AS (
        |  SELECT doc_id, CAST(sum(n) AS BIGINT) AS L,
        |    CAST(sum(n * CAST(floor(ln(n::DOUBLE) * 1e6 + 0.5) AS BIGINT))
        |      AS BIGINT) AS s
        |  FROM cc GROUP BY doc_id)
        |SELECT doc_id, L AS n_chars_ent,
        |  CAST(floor(ln(L::DOUBLE) * 1e6 + 0.5) AS BIGINT) * L - s
        |    AS entropy_lu
        |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
      docs(s, dir).filter(length(col("text")) > 0)
        .select(col("doc_id"),
          length(col("text")).cast("long").as("n_chars_ent"),
          TextOps.charEntropy(col("text")).as("entropy_lu"))
        .orderBy("doc_id")
    },

    // ---- stupid-backoff trigram perplexity (Brants et al. 2007 +
    // the CCNet head/middle/tail split): the oracle retrains the
    // whole pruned prefix-closed model from scratch and rescores every
    // trigram — per-position ln(S) is quantized to an integer
    // micro-unit BIGINT via floor(ln·1e6+0.5) (exactly-rounded IEEE
    // ops only — no double→DECIMAL cast, whose rounding rule is an
    // engine-build property), the BIGINT sum is order-independent, and
    // the tercile comes from plain NTILE (the Spark side derives the
    // same bucket arithmetically from a parallel-prefix global rank —
    // no serial window) --------------------------------------------
    QueryDef(
      "q_text_perplexity",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
         |tok AS (SELECT unnest(ws) AS w FROM w),
         |corpus AS (SELECT count(*) AS n FROM tok),
         |uni AS (
         |  SELECT w, count(*) AS cu FROM tok GROUP BY w
         |  ORDER BY cu DESC, w LIMIT $LmUniK),
         |bg AS (SELECT unnest(CASE WHEN len(ws) >= 2
         |    THEN list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])
         |    ELSE [] END) AS g2 FROM w),
         |bi0 AS (SELECT g2, count(*) AS cb FROM bg GROUP BY g2
         |  ORDER BY cb DESC, g2 LIMIT $LmBiK),
         |bi AS (
         |  SELECT b.g2, b.cb, u.cu FROM bi0 b
         |  JOIN uni u ON string_split(b.g2, ' ')[1] = u.w),
         |tg AS (SELECT unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         |    ELSE [] END) AS g3 FROM w),
         |tri0 AS (SELECT g3, count(*) AS ct FROM tg GROUP BY g3
         |  ORDER BY ct DESC, g3 LIMIT $LmTriK),
         |tri AS (
         |  SELECT t.g3, t.ct, b.cb FROM tri0 t
         |  JOIN bi b ON string_split(t.g3, ' ')[1] || ' ' ||
         |    string_split(t.g3, ' ')[2] = b.g2),
         |trip AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         |    ELSE [] END) AS g3 FROM w),
         |sc AS (
         |  SELECT p.doc_id,
         |    coalesce(t.ct::DOUBLE / t.cb,
         |      ($LmBackoff)::DOUBLE * coalesce(b.cb::DOUBLE / b.cu,
         |        ($LmBackoff)::DOUBLE * coalesce(u.cu::DOUBLE / corpus.n,
         |          (1.0)::DOUBLE / corpus.n))) AS s
         |  FROM trip p
         |  LEFT JOIN tri t ON p.g3 = t.g3
         |  LEFT JOIN bi b ON string_split(p.g3, ' ')[2] || ' ' ||
         |    string_split(p.g3, ' ')[3] = b.g2
         |  LEFT JOIN uni u ON string_split(p.g3, ' ')[3] = u.w
         |  CROSS JOIN corpus),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_scored,
         |    CAST(sum(CAST(floor(ln(s) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS lp
         |  FROM sc GROUP BY doc_id)
         |SELECT doc_id, n_scored, lp AS logprob_u,
         |  CAST(ntile($LmPplBuckets) OVER (
         |    ORDER BY CAST(lp AS DOUBLE) / n_scored DESC, doc_id) AS INT)
         |    AS ppl_bucket
         |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val m = LangModel.trainBackoff(d, "text")
      LangModel.perplexity(d, "doc_id", "text", m)
        .select(col("id").as("doc_id"), col("n_scored"),
          col("logprob_u"), col("ppl_bucket"))
        .orderBy("doc_id")
    },

    // ---- DSIR importance resampling (Xie et al. 2023): the oracle
    // rebuilds the hashed-bigram bucket space, both smoothed
    // distributions, every per-bucket log ratio (quantized to an
    // integer micro-unit BIGINT via floor(x·1e6+0.5) — exactly-rounded
    // IEEE ops only, same contract as perplexity), every per-doc
    // importance sum, and the top-k selection ----------------------
    QueryDef(
      "q_dsir_select",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
         |bg AS (
         |  SELECT doc_id, unnest(CASE WHEN len(ws) >= 2
         |    THEN list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])
         |    ELSE [] END) AS g
         |  FROM w),
         |bkt AS (SELECT doc_id, ${duckHash("g")} % $DsirBuckets AS b FROM bg),
         |tc AS (SELECT b, count(*) AS ct FROM bkt
         |  WHERE doc_id % $DsirTargetStride = $DsirTargetSel GROUP BY b),
         |rc AS (SELECT b, count(*) AS cr FROM bkt GROUP BY b),
         |tn AS (SELECT count(*) AS nt FROM bkt
         |  WHERE doc_id % $DsirTargetStride = $DsirTargetSel),
         |rn AS (SELECT count(*) AS nr FROM bkt),
         |lam AS (
         |  SELECT coalesce(tc.b, rc.b) AS b,
         |    CAST(floor(
         |      (ln((coalesce(tc.ct, 0) + 1)::DOUBLE / (tn.nt + $DsirBuckets))
         |       - ln((coalesce(rc.cr, 0) + 1)::DOUBLE / (rn.nr + $DsirBuckets)))
         |      * 1e6 + 0.5) AS BIGINT) AS lam
         |  FROM tc FULL OUTER JOIN rc ON tc.b = rc.b
         |  CROSS JOIN tn CROSS JOIN rn),
         |sc AS (
         |  SELECT k.doc_id, count(*) AS n_grams,
         |    CAST(sum(l.lam) AS BIGINT) AS importance_u
         |  FROM bkt k JOIN lam l ON k.b = l.b GROUP BY k.doc_id)
         |SELECT doc_id, n_grams, importance_u,
         |  rank() OVER (ORDER BY importance_u DESC, doc_id) <= $DsirKeep
         |    AS selected
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val target =
        d.filter(col("doc_id") % DsirTargetStride === DsirTargetSel)
      val lam = Dsir.importanceTable(target, d, "text")
      Dsir.select(d, "doc_id", "text", lam)
        .select(col("id").as("doc_id"), col("n_grams"),
          col("importance_u"), col("selected"))
        .orderBy("doc_id")
    },

    // ---- UniMax language sampling: the oracle replays the
    // water-filling allocation with a recursive CTE (same IEEE
    // divisions in the same order), then the per-language
    // hash-ordered partial-epoch prefix ----------------------------
    QueryDef(
      "q_corpus_unimax",
      s"""WITH RECURSIVE w AS (
         |  SELECT doc_id, lang, len($W) AS nt FROM documents),
         |langs AS (
         |  SELECT lang, sum(nt) AS nl,
         |    row_number() OVER (ORDER BY sum(nt), lang) AS i,
         |    count(*) OVER () AS k
         |  FROM w GROUP BY lang),
         |wf(i, lang, nl, quota, rem) AS (
         |  SELECT i, lang, nl,
         |    least(($UniMaxEpochs * nl)::DOUBLE, ($UniMaxBudget)::DOUBLE / k),
         |    ($UniMaxBudget)::DOUBLE -
         |      least(($UniMaxEpochs * nl)::DOUBLE, ($UniMaxBudget)::DOUBLE / k)
         |  FROM langs WHERE i = 1
         |  UNION ALL
         |  SELECT l.i, l.lang, l.nl,
         |    least(($UniMaxEpochs * l.nl)::DOUBLE, f.rem / (l.k - l.i + 1)),
         |    f.rem -
         |      least(($UniMaxEpochs * l.nl)::DOUBLE, f.rem / (l.k - l.i + 1))
         |  FROM wf f JOIN langs l ON l.i = f.i + 1),
         |q AS (
         |  SELECT lang, CAST(floor(quota / nl) AS INT) AS full_epochs,
         |    quota - floor(quota / nl) * nl AS partial_quota
         |  FROM wf),
         |c AS (
         |  SELECT doc_id, lang, nt,
         |    sum(nt) OVER (PARTITION BY lang
         |      ORDER BY ${duckHash("'um7' || doc_id::VARCHAR")}, doc_id)
         |      AS cum
         |  FROM w)
         |SELECT c.doc_id, c.lang, CAST(c.nt AS BIGINT) AS n_tokens,
         |  q.full_epochs, c.cum <= q.partial_quota AS in_partial
         |FROM c JOIN q USING (lang) ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
        Sampling.mixUniMax(docs(s, dir), "lang", "doc_id",
            size(TextOps.words(col("text"))), UniMaxBudget,
            UniMaxEpochs, "um7")
          .select(col("id").as("doc_id"), col("lang"), col("n_tokens"),
            col("full_epochs"), col("in_partial"))
          .orderBy("doc_id")
    },

    // ---- curation with the CCNet perplexity gate: the oracle
    // retrains the backoff model, rescores the corpus, takes the
    // head+middle terciles, and replays dedup + sample — the whole
    // composed pass differentially pinned end-to-end ---------------
    QueryDef(
      "q_pipeline_curate_ppl",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
         |tok AS (SELECT unnest(ws) AS w FROM w),
         |corpus AS (SELECT count(*) AS n FROM tok),
         |uni AS (
         |  SELECT w, count(*) AS cu FROM tok GROUP BY w
         |  ORDER BY cu DESC, w LIMIT $LmUniK),
         |bg AS (SELECT unnest(CASE WHEN len(ws) >= 2
         |    THEN list_transform(range(1, len(ws)),
         |      i -> ws[i] || ' ' || ws[i+1])
         |    ELSE [] END) AS g2 FROM w),
         |bi0 AS (SELECT g2, count(*) AS cb FROM bg GROUP BY g2
         |  ORDER BY cb DESC, g2 LIMIT $LmBiK),
         |bi AS (
         |  SELECT b.g2, b.cb, u.cu FROM bi0 b
         |  JOIN uni u ON string_split(b.g2, ' ')[1] = u.w),
         |tg AS (SELECT unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         |    ELSE [] END) AS g3 FROM w),
         |tri0 AS (SELECT g3, count(*) AS ct FROM tg GROUP BY g3
         |  ORDER BY ct DESC, g3 LIMIT $LmTriK),
         |tri AS (
         |  SELECT t.g3, t.ct, b.cb FROM tri0 t
         |  JOIN bi b ON string_split(t.g3, ' ')[1] || ' ' ||
         |    string_split(t.g3, ' ')[2] = b.g2),
         |trip AS (SELECT doc_id, unnest(CASE WHEN len(ws) >= 3
         |    THEN list_transform(range(1, len(ws) - 1),
         |      i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])
         |    ELSE [] END) AS g3 FROM w),
         |sc AS (
         |  SELECT p.doc_id,
         |    coalesce(t.ct::DOUBLE / t.cb,
         |      ($LmBackoff)::DOUBLE * coalesce(b.cb::DOUBLE / b.cu,
         |        ($LmBackoff)::DOUBLE * coalesce(u.cu::DOUBLE / corpus.n,
         |          (1.0)::DOUBLE / corpus.n))) AS s
         |  FROM trip p
         |  LEFT JOIN tri t ON p.g3 = t.g3
         |  LEFT JOIN bi b ON string_split(p.g3, ' ')[2] || ' ' ||
         |    string_split(p.g3, ' ')[3] = b.g2
         |  LEFT JOIN uni u ON string_split(p.g3, ' ')[3] = u.w
         |  CROSS JOIN corpus),
         |agg AS (
         |  SELECT doc_id, count(*) AS n_scored,
         |    CAST(sum(CAST(floor(ln(s) * 1e6 + 0.5) AS BIGINT)) AS BIGINT)
         |      AS lp
         |  FROM sc GROUP BY doc_id),
         |pb AS (
         |  SELECT doc_id, ntile($LmPplBuckets) OVER (
         |    ORDER BY CAST(lp AS DOUBLE) / n_scored DESC, doc_id) AS bkt
         |  FROM agg),
         |k AS (SELECT doc_id FROM pb WHERE bkt <= $PplKeepBuckets),
         |f AS (
         |  SELECT d.doc_id, len(string_split(lower(d.text), ' '))
         |      AS n_words,
         |    md5(regexp_replace(trim(lower(d.text)), '\\s+', ' ', 'g'))
         |      AS fingerprint
         |  FROM documents d JOIN k USING (doc_id)),
         |dd AS (
         |  SELECT doc_id, fingerprint, n_words,
         |    min(doc_id) OVER (PARTITION BY fingerprint) AS rep
         |  FROM f)
         |SELECT doc_id, fingerprint, n_words FROM dd
         |WHERE doc_id = rep
         |  AND ${duckHash("'p42' || doc_id::VARCHAR")} % 3 = 0
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Curate.curatePpl(docs(s, dir), "doc_id", "text",
        sampleMod = 3, "p42")
        .orderBy("doc_id")
    },

    // ---- hashed-feature linear quality classifier: the oracle
    // rebuilds every score from scratch — same portable md5 bucket,
    // same integer weight rule, per-token w/dl contributions from the
    // same double expression tree quantized to integer pico-units
    // (floor(x·1e12+0.5) BIGINT — exactly-rounded IEEE ops only, no
    // engine-build-dependent double→DECIMAL cast), BIGINT accumulation
    // (exact ⇒ order-independent ⇒ engine-exact); the keep label
    // thresholds the integer (≡ sigmoid ≥ 0.5 without exp()'s drift) --
    QueryDef(
      "q_quality_classifier",
      s"""WITH w AS (SELECT doc_id, $W AS ws FROM documents),
         |tok AS (
         |  SELECT doc_id, len(ws) AS dl, unnest(ws) AS t FROM w),
         |sc AS (
         |  SELECT doc_id,
         |    CAST(sum(CAST(floor(
         |      (((((${duckHash("t")} % $QcBuckets) * $QcWeightA + $QcWeightB)
         |         % $QcWeightMod - ${QcWeightMod / 2}) / ${QcWeightMod / 2}.0)
         |        / dl) * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS score_p
         |  FROM tok GROUP BY doc_id)
         |SELECT doc_id, score_p, score_p >= 0 AS keep
         |FROM sc ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Classifier.scoreRule(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- multimodal: REAL decoders under a REAL oracle. Each doc's
    // text bytes (pure ASCII in the fixture, so ord(char) == byte) are
    // laid out as a well-formed binary P6 PPM; the Spark side parses
    // the header and folds the pixel bytes with the production decoder
    // while DuckDB recomputes width/height/mean straight from the
    // construction rule — a genuine differential on the byte-level
    // parser, not an echo of the construction. Sums of pixel bytes are
    // exact integers, so mean_intensity is the same IEEE division in
    // both engines (bit-exact, not band-checked). ----------------------
    QueryDef(
      "q_multimodal_decode",
      """SELECT doc_id AS media_id,
        |  CAST(4 + doc_id % 5 AS INT) AS width,
        |  CAST(3 + doc_id % 4 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  list_sum(list_transform(regexp_extract_all(
        |      substring(repeat(text, 4), 1,
        |        CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INT)),
        |      '[\s\S]'), c -> ord(c)))::DOUBLE
        |    / ((4 + doc_id % 5) * (3 + doc_id % 4) * 3) AS mean_intensity
        |FROM documents
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(ppmDocs(s, dir), "doc_id", "ppm",
        "image/ppm")
      Multimodal.decodeImageStub(media).orderBy("media_id")
    },

    // ---- REAL nearest-neighbor image resize, composed end-to-end:
    // the same constructed P6 payloads resize on the ACTUAL pixel
    // grid (source pixel (x·w÷outW, y·h÷outH), integer division) to a
    // well-formed 3×2 P6, which the production decoder then re-parses
    // — the oracle replays the exact NN index arithmetic over the
    // construction rule, so header re-emission, sampling indices, and
    // the re-decode are all differentially proven. Integer byte sums
    // over a constant 18 samples ⇒ the mean is the same IEEE division
    // in both engines. -------------------------------------------------
    QueryDef(
      "q_multimodal_resize",
      """WITH src AS (
        |  SELECT doc_id,
        |    CAST(4 + doc_id % 5 AS BIGINT) AS w,
        |    CAST(3 + doc_id % 4 AS BIGINT) AS h,
        |    substring(repeat(text, 4), 1,
        |      CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INT)) AS pix
        |  FROM documents)
        |SELECT doc_id AS media_id,
        |  CAST(3 AS INT) AS width, CAST(2 AS INT) AS height,
        |  CAST(3 AS INT) AS channels,
        |  list_sum(list_transform(range(0, 18), i ->
        |    ord(substring(pix,
        |      CAST((((i // 3) // 3 * h // 2) * w
        |        + ((i // 3) % 3 * w // 3)) * 3 + (i % 3) + 1 AS INT),
        |      1))))::DOUBLE / 18 AS mean_intensity
        |FROM src
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(ppmDocs(s, dir), "doc_id", "ppm",
        "image/ppm")
      Multimodal.decodeImageStub(Multimodal.resizePpm(media, 3, 2))
        .orderBy("media_id")
    },

    // ---- WAV twin of the above: text bytes become little-endian
    // 16-bit PCM samples inside a spec-correct RIFF container (44-byte
    // header built via hex/unhex, 64 Hz mono). Every per-sample square
    // (k/32768)² is a dyadic rational needing ≤30 mantissa bits and the
    // few-hundred-term sum stays far under 2^22, so the accumulations
    // are EXACT in both engines and rms/peak/duration compare
    // bit-for-bit. ----------------------------------------------------
    QueryDef(
      "q_multimodal_audio",
      """WITH p AS (
        |  SELECT doc_id, least(length(text), 400) // 2 AS ns,
        |    regexp_extract_all(substring(text, 1,
        |      (least(length(text), 400) // 2) * 2), '[\s\S]') AS cs
        |  FROM documents),
        |s AS (
        |  SELECT doc_id, ns,
        |    list_transform(range(0, ns), i ->
        |      (ord(cs[2*i+1]) + 256 * ord(cs[2*i+2])) / 32768.0) AS sm
        |  FROM p)
        |SELECT doc_id AS media_id,
        |  CAST(1 AS INT) AS channels,
        |  CAST(64 AS INT) AS sample_rate,
        |  CAST(ns AS BIGINT) AS n_samples,
        |  ns / 64.0 AS duration_s,
        |  sqrt(list_sum(list_transform(sm, x -> x * x)) / ns) AS rms,
        |  list_max(sm) AS peak
        |FROM s
        |ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(wavDocs(s, dir), "doc_id", "wav",
        "audio/wav")
      Multimodal.decodeWav(media).orderBy("media_id")
    },

    // ---- acoustic fingerprint (audio twin of the dHash): the same
    // spec-correct WAV payloads split into 64 equal sample windows,
    // per-window energy summed as EXACT integers, 63 adjacent-window
    // comparisons packed into a BIGINT — the oracle recomputes every
    // window energy and every bit from the construction rule --------
    QueryDef(
      "q_multimodal_audiofp",
      """WITH p AS (
        |  SELECT doc_id, least(length(text), 400) // 2 AS ns,
        |    regexp_extract_all(substring(text, 1,
        |      (least(length(text), 400) // 2) * 2), '[\s\S]') AS cs
        |  FROM documents),
        |e AS (
        |  SELECT doc_id, list_transform(range(0, 64), w ->
        |    coalesce(list_sum(list_transform(
        |      range(ns * w // 64, ns * (w + 1) // 64), i ->
        |        (ord(cs[2*i+1]) + 256 * ord(cs[2*i+2]))
        |          * (ord(cs[2*i+1]) + 256 * ord(cs[2*i+2])))),
        |      0)) AS es
        |  FROM p)
        |SELECT doc_id AS media_id,
        |  list_reduce(list_prepend(CAST(0 AS BIGINT),
        |    list_transform(range(0, 63), k -> CASE
        |      WHEN es[k + 1] > es[k + 2]
        |      THEN (CAST(1 AS BIGINT) << CAST(k AS INT))
        |      ELSE CAST(0 AS BIGINT) END)),
        |    (a, v) -> a | v) AS afp
        |FROM e ORDER BY media_id""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(wavDocs(s, dir), "doc_id", "wav",
        "audio/wav")
      Multimodal.audioFingerprint(media)
        .select(col("media_id"), col("afp"))
        .orderBy("media_id")
    },

    // ---- perceptual image near-dup (difference hash): each
    // constructed P6 image NN-downsamples to a 9×8 luminance grid
    // whose 63 adjacent-pixel comparisons pack into a BIGINT; pairs
    // within hamming ≤ 3 meet on the 4-band pigeonhole equi join
    // (EXACT — ≤3 flipped bits leave ≥1 of 4 disjoint bands equal).
    // The oracle brute-forces every hash and every pair from the
    // construction rule, so banding recall is proven, not assumed. --
    QueryDef(
      "q_multimodal_dhash", {
        def g(gx: String, gy: String): String = {
          val base = s"((($gy) * h // 8) * w + (($gx) * w // 9)) * 3"
          s"""((ord(substring(pix, CAST($base + 1 AS INT), 1))
             |  + ord(substring(pix, CAST($base + 2 AS INT), 1))
             |  + ord(substring(pix, CAST($base + 3 AS INT), 1))) // 3)"""
            .stripMargin
        }
        s"""WITH src AS (
           |  SELECT doc_id,
           |    CAST(4 + doc_id % 5 AS BIGINT) AS w,
           |    CAST(3 + doc_id % 4 AS BIGINT) AS h,
           |    substring(repeat(text, 4), 1,
           |      CAST((4 + doc_id % 5) * (3 + doc_id % 4) * 3 AS INT))
           |      AS pix
           |  FROM documents),
           |hs AS (
           |  SELECT doc_id, list_reduce(list_prepend(CAST(0 AS BIGINT),
           |    list_transform(range(0, 63), b -> CASE WHEN
           |      ${g("b % 8", "b // 8")} > ${g("b % 8 + 1", "b // 8")}
           |      THEN (CAST(1 AS BIGINT) << CAST(b AS INT))
           |      ELSE CAST(0 AS BIGINT) END)),
           |    (a, v) -> a | v) AS dh
           |  FROM src)
           |SELECT p.doc_id AS a_id, q.doc_id AS b_id,
           |  CAST(bit_count(xor(p.dh, q.dh)) AS INT) AS hamming
           |FROM hs p JOIN hs q ON p.doc_id < q.doc_id
           |WHERE bit_count(xor(p.dh, q.dh)) <= 3
           |ORDER BY a_id, b_id""".stripMargin
      }) { (s, dir) =>
      val media = Multimodal.asMedia(ppmDocs(s, dir), "doc_id", "ppm",
        "image/ppm")
      Multimodal.dhashPairs(Multimodal.dHash(media), maxHamming = 3)
        .orderBy("a_id", "b_id")
    },

    // ---- video-shaped composition: a 4-frame "video" of constant-
    // size P6 frames (11-byte header + 4×3×3 pixels = 47 bytes/frame)
    // is frame-sampled at stride 2 and every kept frame REALLY decoded
    // — frame slicing, header re-parse, and per-frame means all
    // differentially proven against the construction rule. ------------
    QueryDef(
      "q_multimodal_video",
      """SELECT doc_id AS media_id, CAST(f // 2 AS INT) AS frame_no,
        |  CAST(4 AS INT) AS width, CAST(3 AS INT) AS height,
        |  list_sum(list_transform(range(0, 36), i ->
        |    ord(substring(repeat(text, 8),
        |      CAST(f * 36 + i + 1 AS INT), 1))))::DOUBLE / 36
        |    AS mean_intensity
        |FROM documents, unnest([0, 2]) AS t(f)
        |ORDER BY media_id, frame_no""".stripMargin) { (s, dir) =>
      val video = docs(s, dir).selectExpr("doc_id",
        """concat_ws('', transform(sequence(0, 3), f ->
          |  concat('P6
4 3
255
',
          |    substring(repeat(text, 8), f * 36 + 1, 36)))) as vid"""
          .stripMargin)
      val media = Multimodal.asMedia(video, "doc_id", "vid", "video/fake")
      val frames = Multimodal.frameSample(media, frameBytes = 47, stride = 2)
      val perFrame = frames.select(
        (col("media_id") * lit(10L) + col("frame_no")).as("media_id"),
        col("frame").as("payload"))
      Multimodal.decodeImageStub(perFrame)
        .select((col("media_id") / lit(10L)).cast("long").as("media_id"),
          (col("media_id") % lit(10L)).cast("int").as("frame_no"),
          col("width"), col("height"), col("mean_intensity"))
        .orderBy("media_id", "frame_no")
    },

    // ---- frame sampling: the chunk/stride/tail arithmetic is fully
    // SQL-expressible, so the formerly rows-only check is now a real
    // differential (frame_no = index within the kept stride, tail
    // frame carries the remainder bytes). ------------------------------
    QueryDef(
      "q_multimodal_frames",
      """SELECT doc_id AS media_id,
        |  CAST(i // 2 AS INT) AS frame_no,
        |  CAST(least(64, length(text) - i * 64) AS BIGINT) AS frame_bytes
        |FROM documents,
        |  unnest(range(0, greatest(length(text) // 64 - 1, 0) + 1)) AS t(i)
        |WHERE i % 2 = 0
        |ORDER BY media_id, frame_no""".stripMargin) { (s, dir) =>
      val media = Multimodal.asMedia(docs(s, dir), "doc_id", "text", "vid/fake")
      Multimodal.frameSample(media, frameBytes = 64, stride = 2)
        .select(col("media_id"), col("frame_no"), col("frame_bytes"))
        .orderBy("media_id", "frame_no")
    },

    // ---- duplicate-substring spans (Lee et al. substring dedup): the
    // oracle groups rolling windows by their RAW TEXT and replays the
    // same island merge, so the hash-grouped Spark path is proven
    // against the definitionally-exact computation — duplicate-window
    // detection, span merging, and the per-doc accounting all
    // differentially verified. ----------------------------------------
    QueryDef(
      "q_dedup_spans",
      s"""WITH w AS (
         |  SELECT doc_id, $W AS ws FROM documents),
         |win AS (
         |  SELECT doc_id, i AS pos,
         |    array_to_string(ws[i+1:i+$SpanWindow], ' ') AS wtext
         |  FROM w, unnest(range(0, greatest(len(ws) - ${SpanWindow - 1}, 0))) AS t(i)),
         |dup AS (SELECT wtext FROM win GROUP BY wtext HAVING count(*) >= 2),
         |hit AS (SELECT doc_id, pos FROM win JOIN dup USING (wtext)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |              <= $SpanWindow THEN 0 ELSE 1 END AS fresh
         |  FROM hit),
         |sp AS (
         |  SELECT doc_id, pos,
         |    sum(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span, min(pos) AS s0,
         |    max(pos) + ${SpanWindow - 1} AS e0, count(*) AS nw
         |  FROM sp GROUP BY doc_id, span)
         |SELECT doc_id,
         |  CAST(count(*) AS BIGINT) AS n_spans,
         |  CAST(sum(nw) AS BIGINT) AS n_windows,
         |  CAST(sum(e0 - s0 + 1) AS BIGINT) AS dup_tokens,
         |  CAST(max(e0 - s0 + 1) AS BIGINT) AS max_span
         |FROM spans GROUP BY doc_id ORDER BY doc_id""".stripMargin) { (s, dir) =>
      Dedup.duplicateSpans(docs(s, dir), "doc_id", "text")
        .withColumn("span_tokens", col("end_pos") - col("start_pos") + 1)
        .groupBy(col("id").as("doc_id"))
        .agg(count(lit(1)).as("n_spans"),
          sum(col("n_windows")).as("n_windows"),
          sum(col("span_tokens")).as("dup_tokens"),
          max(col("span_tokens")).as("max_span"))
        .orderBy("doc_id")
    },

    // ---- span CUT: the applying side of q_dedup_spans — duplicate
    // spans removed from every doc, survivors reassembled in order;
    // the oracle replays detection AND the cut from scratch ----------
    QueryDef(
      "q_dedup_spans_cut",
      s"""WITH w AS (
         |  SELECT doc_id, $W AS ws FROM documents),
         |win AS (
         |  SELECT doc_id, i AS pos,
         |    array_to_string(ws[i+1:i+$SpanWindow], ' ') AS wtext
         |  FROM w, unnest(range(0, greatest(len(ws) - ${SpanWindow - 1}, 0))) AS t(i)),
         |dup AS (SELECT wtext FROM win GROUP BY wtext HAVING count(*) >= 2),
         |hit AS (SELECT doc_id, pos FROM win JOIN dup USING (wtext)),
         |isl AS (
         |  SELECT doc_id, pos,
         |    CASE WHEN pos - lag(pos) OVER (PARTITION BY doc_id ORDER BY pos)
         |              <= $SpanWindow THEN 0 ELSE 1 END AS fresh
         |  FROM hit),
         |sp AS (
         |  SELECT doc_id, pos,
         |    sum(fresh) OVER (PARTITION BY doc_id ORDER BY pos) AS span
         |  FROM isl),
         |spans AS (
         |  SELECT doc_id, span, min(pos) AS s0,
         |    max(pos) + ${SpanWindow - 1} AS e0
         |  FROM sp GROUP BY doc_id, span),
         |tok AS (
         |  SELECT doc_id, i AS pos, ws[i+1] AS wd
         |  FROM w, unnest(range(0, len(ws))) AS t(i)),
         |kept AS (
         |  SELECT tok.* FROM tok WHERE NOT EXISTS (
         |    SELECT 1 FROM spans s WHERE s.doc_id = tok.doc_id
         |      AND tok.pos BETWEEN s.s0 AND s.e0)),
         |reb AS (
         |  SELECT doc_id,
         |    array_to_string(list(wd ORDER BY pos), ' ') AS clean_text,
         |    count(*) AS n_kept
         |  FROM kept GROUP BY doc_id)
         |SELECT w.doc_id,
         |  coalesce(reb.clean_text, '') AS clean_text,
         |  CAST(coalesce(reb.n_kept, 0) AS BIGINT) AS n_kept,
         |  CAST(len(w.ws) - coalesce(reb.n_kept, 0) AS BIGINT) AS n_cut
         |FROM w LEFT JOIN reb USING (doc_id) ORDER BY doc_id""".stripMargin) {
      (s, dir) =>
      Dedup.cutSpans(docs(s, dir), "doc_id", "text")
        .withColumnRenamed("id", "doc_id")
        .orderBy("doc_id")
    },

    // ---- BM25 top-k retrieval: fixture-derived queries (first words
    // of every stride-selected doc), contributions built from the same
    // expression tree with the same double literals on both engines,
    // quantized to integer micro-units (floor(x·1e6+0.5) BIGINT) and
    // summed exactly, rank on the exact integer score. The oracle
    // recomputes tf/df/dl/avgdl and every score from scratch. ---------
    QueryDef(
      "q_search_bm25",
      s"""WITH w AS (
         |  SELECT doc_id, $W AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |corpus AS (
         |  SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
         |q AS (
         |  SELECT doc_id AS query_id, list_distinct(ws[1:$Bm25QueryLen]) AS qws
         |  FROM w WHERE doc_id % $Bm25QueryStride = $Bm25QuerySel),
         |qt AS (SELECT query_id, unnest(qws) AS w FROM q),
         |contrib AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    CAST(floor((ln((1.0)::DOUBLE + (corpus.n - dfreq.df + (0.5)::DOUBLE)
         |            / (dfreq.df + (0.5)::DOUBLE))
         |      * ((tf.tf * (${Bm25K1 + 1})::DOUBLE)
         |         / (tf.tf + ($Bm25K1)::DOUBLE * ((${1.0 - Bm25B})::DOUBLE
         |            + (($Bm25B)::DOUBLE * dl.dl) / corpus.avgdl))))
         |      * 1e6 + 0.5) AS BIGINT) AS c
         |  FROM tf JOIN qt USING (w) JOIN dfreq USING (w)
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN corpus),
         |scored AS (
         |  SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS sd
         |  FROM contrib GROUP BY query_id, doc_id),
         |ranked AS (
         |  SELECT query_id, doc_id, sd,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY sd DESC, doc_id) AS rk
         |  FROM scored)
         |SELECT query_id, doc_id, CAST(rk AS BIGINT) AS rk,
         |  sd AS score_u
         |FROM ranked WHERE rk <= $Bm25TopK
         |ORDER BY query_id, doc_id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val q = d.filter(col("doc_id") % Bm25QueryStride === Bm25QuerySel)
        .select(col("doc_id").as("query_id"),
          expr(s"array_join(slice(split(lower(text), ' '), 1, $Bm25QueryLen), ' ')")
            .as("qtext"))
      Search.bm25TopK(d, "doc_id", "text", q, "query_id", "qtext")
        .select(col("query_id"), col("id").as("doc_id"), col("rk"),
          col("sd").as("score_u"))
        .orderBy("query_id", "doc_id")
    },

    // ---- hybrid retrieval: BM25 + exact-cosine legs fused with
    // Reciprocal Rank Fusion (Cormack et al. 2009) — the oracle
    // replays BOTH legs from scratch and the 1/(60+rank) fusion in
    // integer pico-units (floor(x·1e12+0.5) BIGINT — libm-free, so
    // bit-identical in any engine); queries are ids
    // 0..NumQueryVectors-1 so the lexical and vector sides share a
    // query set ----------------------------------------------------
    QueryDef(
      "q_search_hybrid",
      s"""WITH w AS (
         |  SELECT doc_id, $W AS ws FROM documents),
         |tok AS (SELECT doc_id, unnest(ws) AS w FROM w),
         |tf AS (SELECT doc_id, w, count(*) AS tf FROM tok GROUP BY doc_id, w),
         |dl AS (SELECT doc_id, count(*) AS dl FROM tok GROUP BY doc_id),
         |dfreq AS (SELECT w, count(*) AS df FROM tf GROUP BY w),
         |corpus AS (
         |  SELECT count(*) AS n, sum(dl)::DOUBLE / count(*) AS avgdl FROM dl),
         |q AS (
         |  SELECT doc_id AS query_id, list_distinct(ws[1:$Bm25QueryLen]) AS qws
         |  FROM w WHERE doc_id < $NumQueryVectors),
         |qt AS (SELECT query_id, unnest(qws) AS w FROM q),
         |contrib AS (
         |  SELECT qt.query_id, tf.doc_id,
         |    CAST(floor((ln((1.0)::DOUBLE + (corpus.n - dfreq.df + (0.5)::DOUBLE)
         |            / (dfreq.df + (0.5)::DOUBLE))
         |      * ((tf.tf * (${Bm25K1 + 1})::DOUBLE)
         |         / (tf.tf + ($Bm25K1)::DOUBLE * ((${1.0 - Bm25B})::DOUBLE
         |            + (($Bm25B)::DOUBLE * dl.dl) / corpus.avgdl))))
         |      * 1e6 + 0.5) AS BIGINT) AS c
         |  FROM tf JOIN qt USING (w) JOIN dfreq USING (w)
         |  JOIN dl ON dl.doc_id = tf.doc_id
         |  CROSS JOIN corpus),
         |lex AS (
         |  SELECT query_id, doc_id AS id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY c DESC, doc_id) AS rank
         |  FROM (SELECT query_id, doc_id, CAST(sum(c) AS BIGINT) AS c
         |        FROM contrib GROUP BY query_id, doc_id) s),
         |vec AS (
         |  SELECT q.vec_id AS query_id, c.vec_id AS id,
         |    row_number() OVER (PARTITION BY q.vec_id
         |      ORDER BY round(${duckCos("q.embedding", "c.embedding")}, 6)
         |        DESC, c.vec_id) AS rank
         |  FROM embeddings q JOIN embeddings c ON q.vec_id <> c.vec_id
         |  WHERE q.vec_id < $NumQueryVectors),
         |leg_c AS (
         |  SELECT query_id, id,
         |    CAST(floor(((1.0)::DOUBLE / ((60.0)::DOUBLE + rank))
         |      * 1e12 + 0.5) AS BIGINT) AS c
         |  FROM lex WHERE rank <= $Bm25TopK
         |  UNION ALL
         |  SELECT query_id, id,
         |    CAST(floor(((1.0)::DOUBLE / ((60.0)::DOUBLE + rank))
         |      * 1e12 + 0.5) AS BIGINT) AS c
         |  FROM vec WHERE rank <= $TopK),
         |fused AS (
         |  SELECT query_id, id, CAST(sum(c) AS BIGINT) AS rrf,
         |    CAST(count(*) AS INT) AS legs
         |  FROM leg_c GROUP BY query_id, id),
         |fin AS (
         |  SELECT query_id, id, rrf, legs,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY rrf DESC, id) AS hybrid_rank
         |  FROM fused)
         |SELECT query_id, id, rrf AS rrf_p, legs,
         |  CAST(hybrid_rank AS BIGINT) AS hybrid_rank
         |FROM fin WHERE hybrid_rank <= $Bm25TopK
         |ORDER BY query_id, id""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val q20 = d.filter(col("doc_id") < NumQueryVectors)
        .select(col("doc_id").as("query_id"),
          expr(s"array_join(slice(split(lower(text), ' '), 1, $Bm25QueryLen), ' ')")
            .as("qtext"))
      val lex = Search.bm25TopK(d, "doc_id", "text", q20,
          "query_id", "qtext")
        .select(col("query_id"), col("id"), col("rk").as("rank"))
      val e = embs(s, dir)
      val vec = Similarity.bruteForceTopK(
          e.filter(col("vec_id") < NumQueryVectors), e, "vec_id", "embedding")
        .select(col("query_id"), col("neighbor_id").as("id"), col("rank"))
      Search.rrfFuse(Seq(lex, vec), topK = Bm25TopK)
        .select(col("query_id"), col("id"),
          col("rrf").as("rrf_p"), col("legs"),
          col("hybrid_rank"))
        .orderBy("query_id", "id")
    })
}
