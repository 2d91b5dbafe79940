package graft.operators

/** Shared constants for the training-data pipeline operators
  * (SURVEY.md §7 M6). Everything here is used by BOTH the Spark
  * implementation and the DuckDB oracle SQL, so the two sides stay in
  * lock-step: hashes are derived from md5 (available and identical in
  * both engines), permutations are affine maps modulo a Mersenne prime
  * (pure 64-bit integer arithmetic — no engine-specific hash).
  */
object PipelineParams {

  /** 2^31-1; (a*(h%P)+b)%P never overflows a signed 64-bit long. */
  val P: Long = 2147483647L

  /** MinHash signature length / banding (b*r = k). r=2 keeps candidate
    * volume subquadratic at scale; with b=32 the probability of missing
    * a pair at jaccard 0.7 is (1-0.49)^32 ≈ 4e-10 — effectively exact,
    * which is what lets the DuckDB oracle be brute-force jaccard.
    */
  val MinhashK = 64
  val MinhashR = 2
  val MinhashBands = 32
  val MinhashJaccard = 0.7

  /** Deterministic affine permutation parameters in [1, P-1]. */
  val (hashA, hashB): (Seq[Long], Seq[Long]) = {
    val rnd = new scala.util.Random(42)
    def gen() = Seq.fill(MinhashK)(1L + (rnd.nextLong().abs % (P - 1)))
    (gen(), gen())
  }

  /** Word-shingle width for jaccard/minhash. */
  val ShingleN = 3

  /** SimHash width: 60 bits = the 15-hex-char md5 prefix that fits a
    * signed long exactly in both engines. 4 bands of 15 bits: by
    * pigeonhole, hamming ≤ 3 GUARANTEES at least one identical band,
    * so the band-join candidate set provably contains every true pair
    * (no LSH false negatives — the oracle can brute-force).
    */
  val SimhashBits = 60
  val SimhashBands = 4
  val SimhashBandBits = 15
  val SimhashMaxHamming = 3

  /** Embedding near-dup / ANN parameters. */
  val CosineNearDup = 0.45
  val TopK = 5
  val NumQueryVectors = 20

  /** IVF ANN: deterministic centroid rule (`vec_id % stride == 0`, first
    * `IvfCentroids` hits) so the differential oracle can reconstruct the
    * identical index; `IvfNProbe` inverted lists probed per query. At
    * corpus scale, centroid count should grow ~sqrt(n) (k-means-refined
    * centroids slot into the same operator — only the centroid frame
    * changes).
    */
  val IvfCentroidStride = 31
  val IvfCentroids = 16
  val IvfNProbe = 4

  /** Product quantization (IVF-PQ): `PqM` subspaces of
    * EmbeddingDim/PqM dims, `PqK` codebook entries per subspace taken
    * by the deterministic stride rule (same trick as the IVF
    * centroids, so the oracle rebuilds the identical codebooks).
    * 2-dim subspaces with 64 entries measure 0.44 recall@5 on the
    * fixture vs the 0.51 ceiling of the IVF probing itself (synthetic
    * near-uniform vectors are the hard case for PQ); 32 byte codes vs
    * 256 raw bytes per vector = 8x shuffle compression.
    */
  val PqM = 32
  val PqK = 64
  val PqStride = 7

  /** Cosine-LSH: hyperplane signatures, `LshBands` bands of `LshRowsPerBand`
    * bits each; deterministic planes from a fixed seed.
    */
  val LshPlanes = 16
  val LshBands = 4
  val LshRowsPerBand = 4
  val EmbeddingDim = 64

  lazy val hyperplanes: Seq[Seq[Double]] = hyperplanesN(LshPlanes)

  /** First `count` planes of the seed-7 stream — a prefix extension of
    * [[hyperplanes]], so wider signatures (the auto-sized scale path)
    * agree bit-for-bit with the fixed 16-plane contract on the bits
    * they share.
    */
  def hyperplanesN(count: Int): Seq[Seq[Double]] = {
    val rnd = new scala.util.Random(7)
    Seq.fill(count)(Seq.fill(EmbeddingDim)(rnd.nextDouble() * 2 - 1))
  }

  /** The judged WIDE LSH shape: exactly
    * [[graft.operators.Similarity.lshAutoParams]](4096) — the
    * auto-sizer's pick one power of two past the exact-join cutoff —
    * pinned here so the judged artifact and the production path share
    * a shape (asserted in PipelineSpec).
    */
  val LshWideBands = 9
  val LshWideRows = 8

  /** Target expected LSH bucket occupancy for the auto-sized path:
    * candidate volume per band is (occupancy² / 2) × keys, so holding
    * occupancy constant as the corpus grows is what keeps the banded
    * join linear instead of quadratic.
    */
  val LshTargetBucket = 16

  /** Winnowing fingerprint (Schleimer/Wilkerson/Aiken, SIGMOD'03):
    * k-gram polynomial rolling hashes over code points, window-min
    * selection. The fingerprint is the SORTED DISTINCT SET of window
    * minima — a value set, independent of which tied position a
    * winnowing rule would pick, so the Spark rolling computation and
    * the DuckDB fold oracle agree exactly.
    */
  val WinnowK = 7
  val WinnowW = 8
  val WinnowB = 257L
  val WinnowM = 1000000007L

  /** Benchmark decontamination: n-gram width (wider than [[ShingleN]]
    * so incidental trigram collisions don't flag whole documents) and
    * the doc_id-slice rule carving the fixture "benchmark" set for the
    * judged query.
    */
  val DecontamN = 5
  val DecontamSlice = 41

  /** Deterministic train/eval split: md5 bucket on (seed, id);
    * buckets below [[SplitTrainBuckets]] train, the rest eval.
    */
  val SplitBuckets = 10
  val SplitTrainBuckets = 8

  /** Bigram-LM coverage: the model is the top-K corpus bigrams
    * (K fixed ⇒ broadcastable at any corpus size).
    */
  val LmModelK = 500

  /** Stupid-backoff trigram LM (Brants et al. 2007, "Large Language
    * Models in Machine Translation"): pruned top-K model per order
    * (prefix-closed, so every kept n-gram's context count is in the
    * model), the paper's backoff factor, and the CCNet-style
    * perplexity tercile split (head/middle/tail).
    */
  val LmUniK = 2000
  val LmBiK = 3000
  val LmTriK = 3000
  val LmBackoff = 0.4
  val LmPplBuckets = 3

  /** CCNet-style curation keeps the head+middle perplexity buckets. */
  val PplKeepBuckets = 2

  /** Duplicate-substring spans: sliding-window width in tokens. The
    * paper's threshold is 50 BPE tokens; the fixture docs are ~40-200
    * words, so 8 words keeps the judged query's span population
    * non-trivial while the operator takes the width as a parameter.
    */
  val SpanWindow = 8

  /** BM25 retrieval: Okapi parameters at their literature defaults,
    * top-k depth, and the deterministic fixture-query rule (every
    * doc_id ≡ [[Bm25QuerySel]] (mod [[Bm25QueryStride]]) contributes
    * its first [[Bm25QueryLen]] words as a query — scales with the
    * corpus, no hand-written query list).
    */
  val Bm25K1 = 1.2
  val Bm25B = 0.75
  val Bm25TopK = 5
  val Bm25QueryLen = 4
  val Bm25QueryStride = 1013
  val Bm25QuerySel = 7

  /** Unigram-LM tokenizer (SentencePiece, Kudo 2018): seed-substring
    * pool size, final vocabulary target (single characters always
    * kept, multi-char pieces pruned toward the target), max piece
    * width, EM round count, per-round multi-piece survival fraction,
    * and the encode-time floor for never-seen characters (the floor
    * can never flip a segmentation choice — see UnigramSegment).
    */
  val UnigramSeedSize = 2000
  val UnigramVocab = 400
  val UnigramMaxPiece = 6
  val UnigramEmIters = 3
  val UnigramShrink = 0.6
  val UnigramUnkScore = -100.0

  /** UniMax language sampling (Chung et al. 2023): total token budget
    * and the per-language epoch cap for the judged fixture query.
    */
  val UniMaxBudget = 20000L
  val UniMaxEpochs = 2

  /** DSIR importance resampling (Xie et al. 2023, arXiv:2302.03169):
    * hashed-bigram feature space size, selection depth, and the
    * deterministic judged-query target-domain rule (doc_id ≡ sel mod
    * stride — the operator itself takes any target frame).
    */
  val DsirBuckets = 1024
  val DsirKeep = 100
  val DsirTargetStride = 7
  val DsirTargetSel = 3

  /** df cap for the judged capped ngram-join query: drops the top ~1%
    * hottest shingles at sf0.01 (df distribution 1..7, p99 = 4), so
    * the query exercises real cap behavior while most pairs survive.
    */
  val NgramMaxDf = 4L

  /** Hashed-feature linear classifier: bucket count (the fixed feature
    * space) and the judged deterministic weight rule
    * w(b) = ((b·A + B) mod M − M/2) / (M/2) — integer arithmetic, so
    * the oracle rebuilds the identical weight table.
    */
  val QcBuckets = 1024
  val QcWeightA = 37L
  val QcWeightB = 11L
  val QcWeightMod = 200L

  /** Tiny per-language stopword profiles for the n-gram/stopword
    * language-ID heuristic; CJK is detected by codepoint-class ratio.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "zu", "mit", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "des", "dans", "que", "pour"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "que", "por"))

  val CjkRatio = 0.3

  // ---- SQL literal rendering (shared by both dialects) -----------------

  /** BPE tokenizer training: merge-table size for the judged roundtrip
    * query (the operator takes it as a parameter).
    */
  val BpeMerges = 24

  def sparkLongArray(xs: Seq[Long]): String =
    xs.mkString("array(", "L,", "L)")

  def duckLongList(xs: Seq[Long]): String = xs.mkString("[", ",", "]")

  def sparkStringArray(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("array(", ",", ")")

  def duckStringList(xs: Seq[String]): String =
    xs.map(s => s"'$s'").mkString("[", ",", "]")

  def sparkDoubleArray(xs: Seq[Double]): String =
    xs.map(d => s"${d}D").mkString("array(", ",", ")")
}
