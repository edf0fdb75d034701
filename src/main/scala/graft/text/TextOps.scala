package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-pipeline primitives for large-scale training-data curation:
  * normalization, shingling, MinHash+LSH, SimHash, fingerprinting.
  *
  * Everything is built from codegen'd `org.apache.spark.sql.functions`
  * (higher-order array functions + xxhash64) — no UDFs — so the whole
  * pipeline stays inside WholeStageCodegen and scales linearly: the only
  * shuffles are the final LSH bucket joins / groupBys on band keys.
  */
object TextOps {

  /** Whitespace-collapse + lowercase normalization. */
  def normText(c: Column): Column =
    lower(trim(regexp_replace(c, "\\s+", " ")))

  /** Whitespace tokens of the normalized text. Delegates to the native
    * one-pass tokenizer (graft.functions.NormTokensExpr) — the
    * regex-chain form ran three regex/string passes per row;
    * value-identical including the all-whitespace → [""] edge case
    * (proven in HashExprsSpec).
    */
  def tokens(c: Column): Column =
    graft.functions.GraftFunctions.normTokens(c)

  /** `tokens` wrapped in the §4.4 opacity barrier (r21): use when the
    * aliased column is consumed by a min-length filter right above —
    * un-wrapped, predicate pushdown substitutes the tokenizer into the
    * pushed Filter and every row is tokenized TWICE (once to take
    * size(), once in the surviving projection). The barrier costs the
    * early row prune, which these corpus screens never had in practice
    * (nearly every document passes the min-token gate). Values are
    * identical — only the plan shape moves. */
  def tokensOnce(c: Column): Column =
    graft.functions.GraftFunctions.opaque(tokens(c))

  /** Distinct word n-gram shingles from a `toks` array column (requires
    * size(toks) >= n; callers filter). 0-based array indexing.
    */
  def shingles(toksCol: String, n: Int): Column = {
    val parts = (0 until n).map(j => s"$toksCol[i + $j]").mkString(", ")
    expr(s"array_distinct(transform(sequence(0, size($toksCol) - $n), " +
      s"i -> concat_ws(' ', $parts)))")
  }

  /** MinHash signature: for slot i, min over shingles of
    * xxhash64(shingle, i + 1) — k independent permutation
    * approximations in one projection (no shuffle). Delegates to the
    * native one-pass Catalyst expression (graft.functions): the HOF
    * form re-hashed every shingle k times and allocated an array per
    * `transform`; the native kernel hashes bytes once per shingle
    * (value-identical — proven in HashExprsSpec).
    */
  def minhashSignature(shCol: String, k: Int): Column =
    graft.functions.GraftFunctions.minhashSignature(col(shCol), k)

  /** Fused tokens → n-gram-shingle MinHash signature: skips the
    * intermediate shingle-string array entirely (min is
    * duplicate-insensitive so the distinct step drops too) —
    * value-identical to `minhashSignature(shingles(toks, n), k)`,
    * proven in HashExprsSpec.
    */
  def minhashOfShingles(toksCol: String, n: Int, k: Int): Column =
    graft.functions.GraftFunctions.minhashShingles(col(toksCol), n, k)

  /** LSH candidate pairs from precomputed signatures: split the k-long
    * `sig` column into `bands` bands, bucket docs by (band index, band
    * hash), self-join buckets. Returns (id_a, id_b, n_bands_matching).
    * The band groupBy/join are the only shuffles; bucket skew is bounded
    * because band hashes are uniform. Takes the signature as a column
    * (rather than recomputing from shingles) so the k-minhash
    * projection — the expensive part — is evaluated once and shared
    * with Jaccard estimation.
    */
  /** Banded bucket codes of native minhash signatures — the shared
    * projection of the symmetric pair engine (lshCandidates) and the
    * asymmetric screens (d58's eval-vs-corpus decontamination). */
  def lshBandCodes(sigs: DataFrame, idCol: String,
      k: Int, bands: Int): DataFrame = {
    require(k % bands == 0, s"k=$k not divisible by bands=$bands")
    val r = k / bands
    sigs.select(col(idCol).as("doc"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), " +
        s"b -> aggregate(slice(sig, b * $r + 1, $r), cast(b as bigint), " +
        s"(a, v) -> xxhash64(a, v)))"))
        .as(Seq("band", "bucket")))
  }

  def lshCandidates(sigs: DataFrame, idCol: String,
      k: Int, bands: Int): DataFrame = {
    val banded = lshBandCodes(sigs, idCol, k, bands)
    banded.as("x").join(banded.as("y"),
        col("x.band") === col("y.band") &&
        col("x.bucket") === col("y.bucket") &&
        col("x.doc") < col("y.doc"))
      .groupBy(col("x.doc").as("id_a"), col("y.doc").as("id_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Estimated Jaccard from full signatures for a candidate pair set
    * (columns id_a, id_b): fraction of agreeing minhash slots.
    */
  def estimateJaccard(cands: DataFrame, sigs: DataFrame, idCol: String,
      k: Int): DataFrame = {
    val sa = sigs.select(col(idCol).as("id_a"), col("sig").as("sig_a"))
    val sb = sigs.select(col(idCol).as("id_b"), col("sig").as("sig_b"))
    cands.join(sa, "id_a").join(sb, "id_b")
      .withColumn("est_jaccard",
        expr(s"size(filter(zip_with(sig_a, sig_b, (x, y) -> x = y), " +
          s"v -> v)) / cast($k as double)"))
      .drop("sig_a", "sig_b")
  }

  /** 64-bit SimHash over token xxhash64 values: per bit, sign of the
    * sum of ±1 contributions. Delegates to the native one-pass Catalyst
    * expression (graft.functions) — the HOF form allocated a 64-wide
    * array per token (value-identical — proven in HashExprsSpec).
    */
  def simhash64(toksCol: String): Column =
    graft.functions.GraftFunctions.simhash64(col(toksCol))

  /** Hamming distance between two BIGINT simhashes. */
  def hamming64(a: Column, b: Column): Column =
    bit_count(a.bitwiseXOR(b))

  /** SimHash blocking codes: `bands` contiguous bit-slices of the 64-bit
    * simhash (standard multi-band blocking). Near-dup pairs within
    * hamming distance h are guaranteed to share at least one band when
    * h < bands (pigeonhole), and recall stays high well past that; a
    * single-prefix bucket both misses pairs whose differing bits land in
    * the prefix and goes quadratic inside 2^16 buckets at corpus scale.
    * Returns array<bigint> of per-band codes (band index folded in so
    * codes from different bands never collide).
    */
  def simhashBands(sim: Column, bands: Int): Column = {
    require(64 % bands == 0, s"bands=$bands must divide 64")
    val w = 64 / bands
    val mask = if (w == 64) -1L else (1L << w) - 1L
    val codes = (0 until bands).map { b =>
      shiftright(sim, b * w).bitwiseAND(lit(mask)) + lit(b.toLong << w)
    }
    array(codes: _*)
  }

  /** Content-defined document fingerprint: xxhash64 of the normalized
    * text plus a winnowing-style min-shingle-hash (robust to reordering
    * of a few tokens at the edges).
    */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String)
      : DataFrame = {
    docs.select(col(idCol), tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 3)
      .withColumn("sh", shingles("toks", 3))
      .select(col(idCol),
        xxhash64(concat_ws(" ", col("toks"))).as("full_hash"),
        expr("array_min(transform(sh, t -> xxhash64(t)))").as("min_shingle_hash"),
        expr("array_max(transform(sh, t -> xxhash64(t)))").as("max_shingle_hash"))
  }

  /** Token-window exact substring dedup (Lee et al., ACL 2022, at
    * chunk granularity): cut each doc into fixed w-token windows, elect
    * the GLOBAL first occurrence of each window text (lowest (doc,
    * idx), integer-encoded so the argmin is one BIGINT min) as keeper,
    * and report the per-doc duplicate-span audit. One explode, one
    * hash agg keyed by the high-cardinality chunk text, one chunk-key
    * join back, one per-doc agg — never all-pairs, no window/sort.
    * `idCol` must be a non-negative integer id; chunk_idx must fit in
    * the 1e6 encode slot (docs up to 1M·w tokens).
    */
  /** Shared frame for the chunk-dedup family: every chunk occurrence
    * (id, chunk_idx, chunk) joined with its chunk's global keeper
    * encoding. One explode, one chunk-key agg, one chunk-key join. */
  private def chunkKeepers(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    val ch = docs
      .filter(length(trim(col(textCol))) > 0)
      .select(col(idCol), tokens(col(textCol)).as("toks"))
      .select(col(idCol), posexplode(expr(
        s"transform(sequence(0, cast(ceil(size(toks) / $w.0) as int) - 1), " +
          s"i -> concat_ws(' ', slice(toks, i * $w + 1, $w)))"))
        .as(Seq("chunk_idx", "chunk")))
    val keeper = ch.groupBy(col("chunk"))
      .agg(min(col(idCol) * 1000000L + col("chunk_idx")).as("keeper"))
    ch.join(keeper, "chunk")
  }

  def chunkDedup(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    chunkKeepers(docs, idCol, textCol, w)
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_chunks"),
        sum(when(col(idCol) * 1000000L + col("chunk_idx") =!= col("keeper"), 1L)
          .otherwise(0L)).as("n_dup_chunks"))
      .select(col(idCol), col("n_chunks"), col("n_dup_chunks"),
        (col("n_dup_chunks").cast("double") / col("n_chunks")).as("dup_ratio"))
  }

  /** The APPLY form of [[chunkDedup]]: drop every non-keeper chunk
    * occurrence and reassemble what survives of each document (kept
    * chunks in original order, space-joined). A document whose every
    * chunk is owned elsewhere disappears — that IS the dedup decision
    * at w-chunk granularity. Reassembly is a per-doc sort of its own
    * ≤ len/w chunks (bounded by document size, the d16/d17 per-doc
    * assumption) — no global sort.
    */
  def chunkDedupApply(docs: DataFrame, idCol: String, textCol: String,
      w: Int): DataFrame = {
    chunkKeepers(docs, idCol, textCol, w)
      .filter(col(idCol) * 1000000L + col("chunk_idx") === col("keeper"))
      .groupBy(col(idCol))
      .agg(
        array_join(
          transform(
            array_sort(collect_list(struct(col("chunk_idx"), col("chunk")))),
            x => x.getField("chunk")), " ").as("clean_text"),
        count(lit(1)).as("n_kept"))
  }
}
