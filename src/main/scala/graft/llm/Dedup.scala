package graft.llm

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tables.Tables

/** Deduplication operators over `documents` (north-star LLM-pipeline
  * surface): exact hash dedup, n-gram Jaccard near-dup, MinHash+LSH,
  * SimHash, and embedding-cosine near-dup.
  *
  * Scale design: every variant is shuffle-bounded by (shingle → doc) or
  * (bucket → doc) inverted-index joins — candidate generation never goes
  * all-pairs. The MinHash signatures, bands, and SimHash bit votes are all
  * native column expressions (codegen'd), so signature computation is a
  * map-only stage over the corpus.
  */
object Dedup {

  private def toks(text: Column): Column = TextStats.tokens(text)

  /** q_dedup_exact: exact duplicate grouping on normalized text (lowercase,
    * collapsed whitespace), keyed by md5. One hash-groupBy — the canonical
    * 100 TB exact-dedup shape (key is a 128-bit digest, never the text). */
  def qDedupExact(spark: SparkSession, d: String): DataFrame = {
    val norm = regexp_replace(lower(trim(col("text"))), "\\s+", " ")
    Tables.documents(spark, d)
      .select(col("doc_id"), md5(norm).as("content_key"))
      .groupBy(col("content_key"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))
  }

  /** Inverted index (shingle-hash, doc_id), distinct per doc. The shingle
    * is the custom codegen expression [[graft.functions.ShingleHashes]] —
    * distinct 64-bit hashes straight from the token array, so the index
    * shuffles 8-byte longs, never shingle strings. */
  private def shingleIndex(spark: SparkSession, d: String, n: Int): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    Tables.documents(spark, d)
      .select(col("doc_id"),
        explode(call_function("graft_shingle_hashes", toks(col("text")), lit(n)))
          .as("shingle"))
  }

  /** q_dedup_ngram: exact n-gram Jaccard near-dup pairs via the inverted
    * index — pairs sharing ≥1 trigram, scored |A∩B| / |A∪B|, kept above
    * `threshold`. The join is on `shingle` (co-partitioned by the shuffle),
    * so cost is Σ bucket² over shingle buckets, not corpus² — and shingle
    * order n is the knob that keeps buckets small (trigrams over this
    * corpus: avg df ≈ 10 vs ≈ 275 for bigrams ⇒ ~26× fewer join rows).
    * Shingles are compared by 64-bit hash (collision-free at any realistic
    * per-document shingle count; the DuckDB oracle compares the strings
    * themselves and the jaccard values hash-match). */
  def ngramJaccardPairs(spark: SparkSession, d: String, n: Int, threshold: Double): DataFrame = {
    val idx = shingleIndex(spark, d, n)
    val sizes = idx.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val shared = idx.as("a")
      .join(idx.as("b"),
        col("a.shingle") === col("b.shingle") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("shared"))
    shared
      .join(sizes.select(col("doc_id"), col("n_sh").as("size_a")), col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sizes.select(col("doc_id"), col("n_sh").as("size_b")), col("doc_b") === col("doc_id"))
      .drop("doc_id")
      .select(col("doc_a"), col("doc_b"),
        (col("shared").cast("double") /
          (col("size_a") + col("size_b") - col("shared"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  def qDedupNgram(spark: SparkSession, d: String): DataFrame =
    ngramJaccardPairs(spark, d, n = 3, threshold = 0.2)
      .orderBy(col("doc_a"), col("doc_b"))

  /** MinHash signature over PRE-HASHED shingles (`hashes` =
    * `transform(sh, xxhash64)`): the k hash functions re-hash the 64-bit
    * base value with the function index as seed material — hashing 8-byte
    * longs k times is far cheaper than hashing the shingle STRINGS k times
    * for the same collision behavior (and stays in ANSI-safe arithmetic).
    * Callers must materialize the base-hash column before this
    * (CollapseProject would otherwise inline the string hashing back into
    * every lambda). */
  def minhashSignature(hashes: Column, k: Int): Column =
    transform(sequence(lit(0), lit(k - 1)),
      i => array_min(transform(hashes, h => xxhash64(h, i))))

  /** q_dedup_minhash: MinHash(k=32) + LSH banding (4 bands × 8 rows —
    * band-collision probability j⁸ keeps the candidate set near-dup-only
    * even on this homogeneous corpus).
    * Candidates = pairs sharing any band hash; verified with the exact
    * n-gram Jaccard of their shingle sets. Output: verified near-dup pairs
    * with estimated (signature-agreement) and exact Jaccard.
    * No SQL oracle (the LSH path is approximate by design); the exact side
    * is covered by q_dedup_ngram, and DedupSpec checks recall on planted
    * near-duplicates. */
  def qDedupMinhash(spark: SparkSession, d: String): DataFrame = {
    val k = 32
    val bands = 4
    val rowsPerBand = k / bands
    // Two materialization steps: (1) distinct shingle hashes per doc — the
    // custom ShingleHashes expression, one codegen'd pass over the token
    // array (the transform/slice/concat_ws HOF composition it replaces ran
    // interpreted, ~7 s at sf0.1); (2) the k-function signature from the
    // base hashes. Without the checkpoints, the self-join + verify joins
    // below reference the signature plan 4× and nested-HOF expressions
    // re-run per reference (measured 131 s vs 10 s at sf0.1). At cluster
    // scale this is the persisted signature table every LSH pipeline
    // builds first. Exact-jaccard verification also runs on the hash sets
    // (order-insensitive; same values as string sets absent 64-bit
    // collisions).
    graft.functions.GraftFunctions.register(spark)
    val hashed = Tables.documents(spark, d)
      .select(col("doc_id"),
        call_function("graft_shingle_hashes", toks(col("text")), lit(3)).as("hv"))
      .filter(size(col("hv")) > 0)
      .localCheckpoint(true)
    val docs = hashed
      .withColumn("sig", minhashSignature(col("hv"), k))
      .withColumnRenamed("hv", "sh")
      .localCheckpoint(true)
    // (band_id, band_hash) buckets; join within buckets for candidates.
    // Band buckets carry only (doc_id, band) — signatures and shingle sets
    // are re-attached per side AFTER candidate dedup, so the quadratic part
    // of the join shuffles 16 bytes per row, not 32-long signatures.
    val banded = docs.select(col("doc_id"),
      explode(transform(sequence(lit(0), lit(bands - 1)),
        b => struct(b.as("band_id"),
          xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))).as("band_hash"))))
        .as("band"))
      .select(col("doc_id"), col("band.band_id"), col("band.band_hash"))
    val candidates = banded.as("a")
      .join(banded.as("b"),
        col("a.band_id") === col("b.band_id") &&
          col("a.band_hash") === col("b.band_hash") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
    // Verify candidates exactly (join back signatures + shingle sets).
    val sides = docs.select(col("doc_id"), col("sig"), col("sh"))
    val withSets = candidates
      .join(sides.select(col("doc_id"), col("sig").as("sig_a"), col("sh").as("sh_a")),
        col("doc_a") === col("doc_id"))
      .drop("doc_id")
      .join(sides.select(col("doc_id"), col("sig").as("sig_b"), col("sh").as("sh_b")),
        col("doc_b") === col("doc_id"))
      .drop("doc_id")
    withSets
      .withColumn("est_jaccard",
        aggregate(zip_with(col("sig_a"), col("sig_b"), (x, y) => (x === y).cast("int")),
          lit(0), (acc, x) => acc + x).cast("double") / k)
      .withColumn("inter", size(array_intersect(col("sh_a"), col("sh_b"))))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"),
        (col("inter").cast("double") /
          (size(col("sh_a")) + size(col("sh_b")) - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= 0.2)
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** 64-bit SimHash from the token multiset: for each bit position, the bit
    * is 1 iff the weighted vote Σ(±1 per token hash bit) is positive.
    * Composed-HOF reference formulation kept for the spec cross-check; the
    * query path uses the codegen [[graft.functions.SimHash64]] expression
    * (identical values — same xxhash64 token hashes, same vote rule). */
  def simhash(tokens: Column): Column = {
    val hashes = transform(tokens, t => xxhash64(t))
    aggregate(
      sequence(lit(0), lit(63)),
      lit(0L),
      (acc, bit) => {
        val vote = aggregate(hashes, lit(0),
          (v, h) => v + when(call_function("shiftright", h, bit).bitwiseAND(1) === 1, 1).otherwise(-1))
        acc.bitwiseOR(when(vote > 0, call_function("shiftleft", lit(1L), bit)).otherwise(0L))
      })
  }

  /** q_dedup_simhash: SimHash near-dup — band the 64-bit fingerprint into
    * 4×16-bit chunks (any identical chunk → candidate; guarantees recall for
    * Hamming distance ≤ 3), verify with popcount of the XOR. */
  def qDedupSimhash(spark: SparkSession, d: String): DataFrame = {
    graft.functions.GraftFunctions.register(spark)
    // Materialized for the same multi-reference reason as qDedupMinhash.
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"),
        call_function("graft_simhash", toks(col("text"))).as("sh"))
      .localCheckpoint(true)
    val banded = docs.select(col("doc_id"), col("sh"),
      explode(transform(sequence(lit(0), lit(3)),
        b => struct(b.as("chunk_id"),
          call_function("shiftright", col("sh"), b * 16).bitwiseAND(0xFFFFL).as("chunk")))).as("c"))
      .select(col("doc_id"), col("sh"), col("c.chunk_id"), col("c.chunk"))
    banded.as("a")
      .join(banded.as("b"),
        col("a.chunk_id") === col("b.chunk_id") && col("a.chunk") === col("b.chunk") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.sh").as("sh_a"), col("b.sh").as("sh_b"))
      .dropDuplicates("doc_a", "doc_b")
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= 3)
      .select(col("doc_a"), col("doc_b"), col("hamming").cast("int").as("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** q_dedup_embed: embedding-cosine near-dup via random-hyperplane LSH —
    * 8 signature bits over the 64-dim embeddings (hash-derived deterministic
    * hyperplanes), candidates within a bucket, verified cosine above
    * threshold. (This synthetic corpus has no true near-dups — max pairwise
    * cosine ≈ 0.51 — so the threshold is 0.3 to exercise the verify path;
    * a production near-dup filter would use ≥ 0.95.) Brute-force equivalent
    * is Similarity.bruteForceTopK; LlmSpec cross-checks against it. */
  def qDedupEmbed(spark: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(spark, d)
      .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    val bucketed = emb.withColumn("bucket", Similarity.hyperplaneBucket(col("v"), bits = 8))
    val pairs = bucketed.as("a")
      .join(bucketed.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        Similarity.cosine(col("a.v"), col("b.v")).as("cos"))
    pairs.filter(col("cos") >= 0.3)
      .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
      .orderBy(col("id_a"), col("id_b"))
  }

  val oracles: Map[String, String] = Map(
    "q_dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS content_key,
        |  min(doc_id) AS keep_id, count(*) AS n_copies
        |FROM documents GROUP BY 1 ORDER BY keep_id""".stripMargin,
    "q_dedup_ngram" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    list_filter(string_split_regex(text, '\s+'), x -> len(x) > 0) AS toks
        |  FROM documents),
        |idx AS (
        |  SELECT doc_id, unnest(list_distinct(
        |    CASE WHEN len(toks) >= 3 THEN
        |      list_transform(range(1, len(toks) - 1), i -> array_to_string(toks[i:i+2], ' '))
        |    ELSE [] END)) AS shingle
        |  FROM t),
        |sizes AS (SELECT doc_id, count(*) AS n_sh FROM idx GROUP BY doc_id),
        |shared AS (
        |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS shared
        |  FROM idx a JOIN idx b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
        |  GROUP BY 1, 2)
        |SELECT doc_a, doc_b,
        |  CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) AS jaccard
        |FROM shared
        |JOIN sizes sa ON doc_a = sa.doc_id
        |JOIN sizes sb ON doc_b = sb.doc_id
        |WHERE CAST(shared AS DOUBLE) / (sa.n_sh + sb.n_sh - shared) >= 0.2
        |ORDER BY doc_a, doc_b""".stripMargin,
  )
}
