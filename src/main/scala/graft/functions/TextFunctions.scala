package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis column functions for the documents pipeline.
  *
  * Covers the reference's word chunker (`rag_demo/ingest.py:22-25`),
  * chunk-id synthesis (`rag_demo/ingest.py:34`, deterministic variant per
  * SURVEY.md O13), and the north-star text-analysis extensions (token
  * counting, quality scoring, language-ID heuristic, fingerprinting).
  * Everything is built from codegen'd builtins — no UDFs.
  */
object TextFunctions {

  /** Whitespace tokenization (reference: `text.split()` at ingest.py:23).
    * Blank text tokenizes to an empty array (Spark's split would yield
    * [""]; Python's str.split() yields []).
    */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  /** Non-overlapping n-token chunks as an array column — the reference's
    * `chunk(text, n)` generator (`rag_demo/ingest.py:22-25`): last chunk may
    * be short, empty text yields no chunks.
    */
  def chunks(text: Column, n: Int): Column = {
    require(n > 0)
    val toks = tokens(text)
    val nChunks = ceil(size(toks).cast("double") / n).cast("int")
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * n + 1, lit(n)), " ")))
  }

  /** Sliding-window chunks: n-token windows every `stride` tokens
    * (stride < n ⇒ overlap) — the RAG chunking variant that keeps
    * context spanning a boundary retrievable (the reference's chunker
    * is the stride = n special case). Window count covers every token
    * with no fully-contained tail: 1 window when len ≤ n, else
    * ceil((len − n)/stride) + 1 (the last window may start off-stride
    * content-wise but never duplicates a suffix of its predecessor
    * entirely). Empty text → no chunks.
    */
  def chunksSliding(text: Column, n: Int, stride: Int): Column = {
    require(n > 0 && stride > 0 && stride <= n,
      s"need 0 < stride <= n, got n=$n stride=$stride")
    val toks = tokens(text)
    val len = size(toks)
    val nChunks = when(len <= n, lit(1))
      .otherwise(ceil((len - lit(n)).cast("double") / stride).cast("int")
        + lit(1))
    when(len === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nChunks - 1),
        i => array_join(slice(toks, i * stride + 1, lit(n)), " ")))
  }

  /** Deterministic chunk id: `{docId}::chunk{idx}::{md5(chunk)[:8]}` —
    * reproducible replacement for the reference's uuid4 suffix
    * (`rag_demo/ingest.py:34`).
    */
  def chunkId(docId: Column, idx: Column, chunk: Column): Column =
    concat_ws("::", docId.cast("string"),
      concat(lit("chunk"), idx.cast("string")),
      substring(md5(chunk.cast("binary")), 1, 8))

  /** Canonical document fingerprint: md5 of whitespace-collapsed,
    * lower-cased text. Exact-dedup key.
    */
  def fingerprint(text: Column): Column =
    md5(lower(trim(regexp_replace(text, "\\s+", " "))).cast("binary"))

  /** Stopword hit count within a token array (codegen'd higher-order fn). */
  def stopwordHits(toks: Column, stopwords: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(stopwords)))

  val EnStopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")
  val EsStopwords: Seq[String] = Seq("el", "la", "de", "los", "las", "y", "en")
  val DeStopwords: Seq[String] = Seq("der", "die", "das", "und", "ist", "ein")

  /** N-gram-free language-ID heuristic: stopword-list vote with a
    * deterministic tie order (es > de > en requires a strict majority).
    */
  def langId(text: Column): Column = {
    val toks = tokens(lower(text))
    val en = stopwordHits(toks, EnStopwords)
    val es = stopwordHits(toks, EsStopwords)
    val de = stopwordHits(toks, DeStopwords)
    when(es > en && es >= de, lit("es"))
      .when(de > en && de > es, lit("de"))
      .otherwise(lit("en"))
  }

  /** MOJIBAKE artifact patterns: the classic UTF-8-bytes-read-as-
    * Latin-1/cp1252 signatures — "Ã" + continuation (é è ü …), the
    * "â€¦"-family punctuation (’ “ ” … –), and stray "Â" before
    * NBSP/punctuation. Fixed alternation, no lookaround — identical
    * under Java regex and RE2, so the oracle counts with the same
    * pattern.
    */
  val MojibakePattern: String =
    "\u00c3[\\x{0080}-\\x{00ff}]|\u00e2\u20ac|\u00c2[\\x{00a0}-\\x{00bf}]"

  /** Mojibake artifact count per document — the crawl-hygiene signal
    * that catches double-encoded text BEFORE it poisons tokenizers and
    * dedup shingles (a mojibake'd copy of a page hashes differently
    * from the clean one, defeating exact dedup). Pure per-row regex
    * count at scan speed.
    */
  def mojibakeCount(text: Column): Column =
    size(regexp_extract_all(text, lit(MojibakePattern), lit(0)))
      .cast("long")

  /** REPAIR double-encoded text: re-encode the chars as Latin-1 bytes
    * and strictly re-decode as UTF-8 — the inverse of the corruption.
    * Applied only when the round trip fully succeeds AND the text
    * actually shows artifacts; anything else passes through unchanged
    * (repair must never corrupt clean text). Driver-free per-row
    * compute via a deterministic JVM kernel (charset transcode has no
    * Column-function equivalent); spec-tested on real mojibake
    * round-trips.
    */
  def repairMojibake(s: String): String = {
    if (s == null) return null
    val hasArtifact = java.util.regex.Pattern.compile(MojibakePattern)
      .matcher(s).find()
    if (!hasArtifact) return s
    def via(cs: java.nio.charset.Charset): Option[String] =
      try {
        val enc = cs.newEncoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
          .onMalformedInput(java.nio.charset.CodingErrorAction.REPORT)
          .onUnmappableCharacter(java.nio.charset.CodingErrorAction.REPORT)
        Some(dec.decode(enc.encode(java.nio.CharBuffer.wrap(s))).toString)
      } catch {
        case _: java.nio.charset.CharacterCodingException => None
      }
    // cp1252 first (the common corruption — bytes 0x80-0x9F map to
    // punctuation), Latin-1 as fallback (straight byte identity)
    via(java.nio.charset.Charset.forName("windows-1252"))
      .orElse(via(java.nio.charset.StandardCharsets.ISO_8859_1))
      .getOrElse(s)
  }

  /** Sentence segmentation: split on terminator runs followed by
    * whitespace ("[.!?]+\\s+") — deliberately lookaround-free so Java
    * regex and RE2 segment identically; empties (leading separators)
    * drop. The final sentence keeps its terminator (nothing follows to
    * split on) — a stable, declared contract rather than a lossy
    * normalize.
    */
  def sentenceSplit(text: Column): Column =
    filter(
      when(length(trim(text)) === 0, array().cast("array<string>"))
        .otherwise(split(trim(text), "[.!?]+\\s+")),
      s => s =!= "")

  /** SENTENCE-budget chunking — the default RAG text splitter
    * (LangChain-style): sentences stay whole and are grouped by token
    * budget, so retrieval units never cut mid-sentence (the failure of
    * fixed token windows) while staying near the embedding model's
    * length sweet spot. Assignment is by cumulative token offset:
    * sentence i lands in chunk floor(tokens_before_i / maxTokens) — a
    * prefix-sum (order-proof, engine-replayable), not a greedy reset,
    * so a chunk may overflow by at most one sentence.
    *
    * DataFrame-level on purpose: the sentence array and its per-
    * sentence token counts must be STAGED as columns (filter barriers
    * between projections) — a single Column expression would carry the
    * split chain inside the prefix-sum lambda and re-evaluate it per
    * element (the CollapseProject trap q_groundedness hit). Pure
    * per-row compute; returns one row per sentence:
    * (input columns…, sent_idx, sent, n_tokens, chunk_idx).
    */
  def sentenceChunkRows(df: org.apache.spark.sql.DataFrame, textCol: String,
                        maxTokens: Int): org.apache.spark.sql.DataFrame = {
    require(maxTokens >= 1, s"maxTokens must be >= 1, got $maxTokens")
    val keep = df.columns.filter(_ != textCol).map(col).toSeq
    // Collapse discipline: every staged array is passed through AGAIN at
    // top level wherever a later lambda consumes it — references inside
    // LambdaFunctions are invisible to CollapseProject's multi-use
    // guard, so a lambda-only consumer lets the projection collapse and
    // the producing expression re-evaluate per element. No filters
    // either (pushdown would substitute the whole chain into the scan
    // predicate); empty docs fall out of posexplode on their own.
    val chunkStructs = when(size(col("__sents")) === 0,
      array().cast(
        "array<struct<sent:string,n_tokens:bigint,chunk_idx:bigint>>"))
      .otherwise(transform(sequence(lit(1), size(col("__sents"))), i =>
        struct(
          element_at(col("__sents"), i).as("sent"),
          element_at(col("__ns"), i).cast("long").as("n_tokens"),
          floor(aggregate(slice(col("__ns"), lit(1), i - 1), lit(0L),
            (acc, v) => acc + v) / maxTokens).cast("long")
            .as("chunk_idx"))))
    df.select(keep :+ sentenceSplit(col(textCol)).as("__sents"): _*)
      .select(keep ++ Seq(col("__sents"),
        when(size(col("__sents")) === 0, array().cast("array<int>"))
          .otherwise(transform(col("__sents"),
            s => size(split(s, "\\s+")))).as("__ns")): _*)
      .select(keep ++ Seq(col("__sents"), col("__ns"),
        posexplode(chunkStructs)) : _*)
      .withColumnRenamed("pos", "sent_idx")
      .select(keep ++ Seq(col("sent_idx"), col("col.sent").as("sent"),
        col("col.n_tokens").as("n_tokens"),
        col("col.chunk_idx").as("chunk_idx")): _*)
  }

  /** BPE-style subword-ish token count: runs of letters, runs of digits,
    * or single non-alphanumeric glyphs — the cheap, regex-only
    * approximation of a GPT-2-flavored pre-tokenizer used for corpus
    * token accounting (the character classes are chosen to mean the same
    * thing in Java regex and RE2, so the DuckDB oracle replicates it).
    */
  def bpeTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Bundled BPE merge vocabulary: ~30 common-English pair merges in
    * priority order ("left|right", rank = position). Small by design —
    * the point is the real merge-table algorithm (`BpeEncode`), not
    * vocabulary coverage; a production vocab drops in unchanged.
    */
  val BpeMerges: Seq[String] = Seq(
    "t|h", "th|e", "i|n", "a|n", "an|d", "e|r", "o|n", "r|e", "a|t", "e|n",
    "o|r", "e|s", "s|t", "a|r", "o|u", "i|t", "i|s", "h|e", "t|o", "o|f",
    "in|g", "e|d", "c|o", "co|m", "l|e", "m|e", "d|e", "s|e", "u|n", "th|is")

  /** True BPE tokenization of a (lower-case, [a-z]-only) word — the
    * native single-loop kernel. See `BpeEncode` for the algorithm
    * contract shared with `bpeEncodeHof` and the q_bpe_real oracle.
    */
  def bpeEncode(word: Column): Column =
    graft.expressions.BpeExpression.bpeEncodeF(word, BpeMerges)

  /** Declarative HOF spec for `bpeEncode`: a bounded fold — `maxIters`
    * steps of "merge the leftmost occurrence of the lowest-rank adjacent
    * pair", each a pure array rewrite; steps after convergence are
    * no-ops. `maxIters` must be ≥ length(word) − 1 for full convergence.
    * Agreement with the native kernel is tested in TextFunctionsSpec.
    */
  def bpeEncodeHof(word: Column, maxIters: Int = 30): Column = {
    val ranks = map_from_arrays(
      typedLit(BpeMerges), typedLit(BpeMerges.indices.map(identity)))
    val init = when(length(word) === 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(1), length(word)),
        i => word.substr(i, lit(1))))
    aggregate(sequence(lit(1), lit(maxIters)), init, (toks, _) => {
      val n = size(toks)
      val pairRanks = transform(sequence(lit(1), n - 1), i =>
        coalesce(
          try_element_at(ranks,
            concat(element_at(toks, i), lit("|"), element_at(toks, i + 1))),
          lit(999999)))
      val rmin = array_min(pairRanks)
      val idx = array_position(pairRanks, rmin).cast("int")
      when(n < 2 || rmin === 999999, toks)
        .otherwise(concat(
          slice(toks, lit(1), idx - 1),
          array(concat(element_at(toks, idx), element_at(toks, idx + 1))),
          slice(toks, idx + 2, n - idx - 1)))
    })
  }

  /** Polynomial rolling hash (Rabin–Karp) over the token sequence:
    * h = fold(tokens, 0, (acc, t) → (acc·31 + h32(t)) mod 1e9+7) with
    * h32(t) = first 32 bits of md5(t). Order-sensitive — unlike the
    * set-shaped `fingerprint`, token REORDERING changes the value.
    * Intermediate acc·31 + h32 < 2³⁶ so the long arithmetic never
    * overflows, and every stage is md5-replicable in the oracle.
    */
  def rollingHash(text: Column): Column = {
    val h32 = (t: Column) => conv(substring(md5(t.cast("binary")), 1, 8), 16, 10).cast("long")
    aggregate(tokens(text), lit(0L),
      (acc, t) => pmod(acc * 31L + h32(t), lit(1000000007L)))
  }

  /** Word n-gram list WITH duplicates and in document order — repetition
    * analysis needs occurrence counts, unlike `Dedup.shingles` which
    * dedups and sorts for set semantics.
    */
  def ngrams(text: Column, n: Int): Column = ngramsOfTokens(tokens(text), n)

  /** `ngrams` over an already-tokenized column (lets pipelines tokenize
    * once per row instead of once per consumer expression).
    */
  def ngramsOfTokens(toks: Column, n: Int): Column = {
    require(n > 0)
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        j => array_join(slice(toks, j + 1, lit(n)), " ")))
  }

  /** Fraction of array elements that are repeats (1 − distinct/total);
    * empty array → 0. One of the Gopher/MassiveText repetition filters
    * (Rae et al. 2021, table A1) used to drop boilerplate-heavy docs.
    */
  def dupFraction(arr: Column): Column =
    when(size(arr) === 0, lit(0.0))
      .otherwise(lit(1.0) -
        size(array_distinct(arr)).cast("double") / size(arr).cast("double"))

  /** Highest occurrence count of any single element (0 for empty).
    * Integer-only arithmetic — bit-identical across engines regardless
    * of evaluation order. Native one-pass kernel (`RepeatStats`);
    * `maxRepeatHof` below is the declarative spec (agreement-tested).
    */
  def maxRepeat(arr: Column): Column =
    graft.expressions.RepeatStats.repeatStatsF(arr)
      .getField("max_repeat").cast("long")

  /** Declarative spec for `maxRepeat` — O(d·n) interpreted lambda evals
    * (one full rescan per distinct element); never use on the hot path.
    */
  def maxRepeatHof(arr: Column): Column =
    when(size(arr) === 0, lit(0L))
      .otherwise(array_max(transform(array_distinct(arr),
        g => size(filter(arr, x => x === g)))).cast("long"))

  /** Fraction of characters inside tokens that occur ≥ 2 times — the
    * "fraction of characters in duplicated content" Gopher signal.
    * Numerator and denominator are exact integer counts (order-proof);
    * only the final division is floating point. Native one-pass kernel;
    * `repeatedCharFractionHof` is the spec.
    */
  def repeatedCharFraction(toks: Column): Column = {
    val s = graft.expressions.RepeatStats.repeatStatsF(toks)
    when(s.getField("total_chars") === 0, lit(0.0))
      .otherwise(s.getField("rep_chars").cast("double") /
        s.getField("total_chars").cast("double"))
  }

  /** Declarative spec for `repeatedCharFraction` (same O(d·n) caveat). */
  def repeatedCharFractionHof(toks: Column): Column = {
    val totalChars = aggregate(toks, lit(0L), (a, t) => a + length(t))
    val repChars = aggregate(array_distinct(toks), lit(0L), (a, t) => {
      val cnt = size(filter(toks, x => x === t))
      a + when(cnt >= 2, (length(t) * cnt).cast("long")).otherwise(lit(0L))
    })
    when(totalChars === 0, lit(0.0))
      .otherwise(repChars.cast("double") / totalChars.cast("double"))
  }

  /** PII patterns, written to mean the same thing in Java regex (Spark)
    * and RE2 (the DuckDB oracle): character classes and counted repeats
    * only — no backreferences, no lookaround (RE2 has neither). The
    * phone pattern is deliberately aggressive (any 8+ run of digits,
    * separators, parens): for training-data hygiene a false <PHONE> on a
    * serial number is cheaper than a leaked number.
    */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"
  val PhoneRe = "\\+?[0-9][0-9()\\s\\-]{6,}[0-9]"

  /** PII redaction for corpus cleaning: emails → `<EMAIL>`, IPv4 →
    * `<IP>`, phone-shaped runs → `<PHONE>`, in that order (emails and
    * IPs contain characters the later patterns can then no longer
    * mis-match). Pure codegen'd `regexp_replace` chain — per-row, no
    * shuffle, runs at scan speed over 100 TB.
    */
  def redactPii(text: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(text, EmailRe, "<EMAIL>"),
        Ipv4Re, "<IP>"),
      PhoneRe, "<PHONE>")

  /** Total PII matches (emails + IPv4s + phone-shaped runs) in the raw
    * text — the audit metric beside `redactPii`.
    */
  def piiCount(text: Column): Column =
    (regexp_count(text, lit(EmailRe)) + regexp_count(text, lit(Ipv4Re)) +
      regexp_count(text, lit(PhoneRe))).cast("long")

  /** Deterministic MLM-style token masking (BERT-family pretraining
    * prep): token at position i of document `id` is replaced by
    * `[MASK]` iff md5(`id:i:salt`) mod 100 < pct — a pure hash gate, so
    * masking is reproducible across runs, partitionings, and engines
    * (no RNG state to seed or checkpoint; the same discipline as
    * `Sampling.hashSample`). Per-row transform, scan speed; returns the
    * masked token array (reassemble/count downstream).
    */
  def maskTokens(id: Column, text: Column, pct: Int, salt: String): Column = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    val toks = tokens(text)
    // empty-doc guard: sequence(0, max(size-1, 0)) is [0] for an empty
    // token array, and zip_with would pad a phantom masked token
    when(size(toks) === 0, array().cast("array<string>"))
      .otherwise(zip_with(toks, sequence(lit(0), greatest(size(toks) - 1, lit(0))),
        (t, i) => {
          val gate = conv(substring(
            md5(concat(id.cast("string"), lit(":"), i.cast("string"),
              lit(":"), lit(salt)).cast("binary")), 1, 15), 16, 10)
            .cast("long") % 100
          when(gate < pct, lit("[MASK]")).otherwise(t)
        }))
  }

  /** T5-style span corruption (Raffel et al. 2020 §3.1.4) as a
    * deterministic struct (inputs, targets): contiguous token spans are
    * cut from the input and replaced by numbered sentinels; the targets
    * sequence lists each sentinel followed by the tokens it hides — the
    * (inputs → targets) pair a span-corruption LM trains on.
    *
    * Determinism (no RNG state, identical under task retries and in the
    * oracle): position p's GATE fires when md5(id:p:salt) mod 100 < pct;
    * p STARTS a span iff its gate fires and neither of the two previous
    * gates fired, and a span covers p..p+spanLen−1 (fixed spanLen = 3).
    * The look-back rule resolves overlaps per-position — no sequential
    * scan — so start/covered/sentinel-index are all pure array
    * expressions (the same per-(id:pos) gating family as `maskTokens`;
    * T5's randomized span lengths are sacrificed for replicability).
    * Zero shuffle at any corpus size.
    *
    * Appends `inputs` and `targets` columns. The hot path is the native
    * single-pass kernel (`expressions/SpanCorruptExpression` — one
    * virtual call and n md5s per row); `spanCorruptDfHof` below is the
    * bit-identical declarative spec, agreement-tested per round in
    * TextFunctionsSpec.
    */
  def spanCorruptDf(df: org.apache.spark.sql.DataFrame, idCol: String,
                    textCol: String, pct: Int, salt: String):
      org.apache.spark.sql.DataFrame =
    df.withColumn("__sc",
        graft.expressions.SpanCorruptExpression.spanCorruptF(
          col(idCol), col(textCol), pct, salt))
      .withColumn("inputs", col("__sc.inputs"))
      .withColumn("targets", col("__sc.targets"))
      .drop("__sc")

  /** Declarative staged-HOF spec of `spanCorruptDf` (same output,
    * interpreted lambdas — readable, but the suite's slowest query
    * before the native kernel replaced it on the hot path): the gate
    * bits, span starts, and start positions materialize as real
    * intermediate columns so each is evaluated once per row; a
    * single-Column formulation re-evaluated the md5 transform at every
    * reference — measured 5× slower again at sf0.1.
    */
  private[graft] def spanCorruptDfHof(df: org.apache.spark.sql.DataFrame,
                                      idCol: String, textCol: String,
                                      pct: Int, salt: String):
      org.apache.spark.sql.DataFrame = {
    val (gates, starts, startPos, inputs, targets) =
      spanCorruptStages(col(idCol), col(textCol), pct, salt)
    df.withColumn("__sc_gates", gates)
      .withColumn("__sc_starts", starts)
      .withColumn("__sc_startpos", startPos)
      .withColumn("inputs", inputs)
      .withColumn("targets", targets)
      .drop("__sc_gates", "__sc_starts", "__sc_startpos")
  }

  /** Shared stage expressions for span corruption. Returns (gates,
    * starts, start-positions, inputs, targets) where the last two
    * reference the first three via the `__sc_*` column names — callers
    * must bind them (as `spanCorruptDfHof` does) or pay re-evaluation.
    */
  private def spanCorruptStages(id: Column, text: Column, pct: Int,
                                salt: String):
      (Column, Column, Column, Column, Column) = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    val spanLen = 3
    val toks = tokens(text)
    val n = size(toks)
    def gate(p: Column): Column =
      conv(substring(
        md5(concat(id.cast("string"), lit(":"), p.cast("string"),
          lit(":"), lit(salt)).cast("binary")), 1, 15), 16, 10)
        .cast("long") % 100 < pct
    // empty-doc guard: sequence(1, 0) generates a DESCENDING [1, 0]
    // instead of an empty range, so position 0 would reach the slice
    // below with length -1 (a runtime error under ANSI)
    val positions =
      when(n >= 1, sequence(lit(1), n)).otherwise(array().cast("array<int>"))
    // gate bits as ONE array column: exactly n md5 calls per row
    val gates = transform(positions, p => gate(p))
    def gAt(arr: Column, p: Column): Column =
      when(p >= 1, coalesce(element_at(arr, p.cast("int")), lit(false)))
        .otherwise(lit(false))
    val gatesCol = col("__sc_gates")
    val starts = transform(positions, p =>
      gAt(gatesCol, p) && !gAt(gatesCol, p - 1) && !gAt(gatesCol, p - 2))
    val startsCol = col("__sc_starts")
    def sAt(p: Column): Column = gAt(startsCol, p)
    // positions where a span starts, in order: sentinel index at a
    // start position p is its 0-based rank in this (short) array.
    // A per-position prefix COUNT would be O(n²) per row; the lookup
    // below runs only at actual start positions → O(n + starts²)
    val startPos = filter(positions, p => sAt(p))
    val startPosCol = col("__sc_startpos")
    def sentinel(p: Column): Column =
      concat(lit("<extra_id_"),
        (array_position(startPosCol, p) - 1).cast("string"), lit(">"))
    val inputs = flatten(transform(positions, p =>
      when(sAt(p), array(sentinel(p)))
        .when(sAt(p - 1) || sAt(p - 2), array().cast("array<string>"))
        .otherwise(array(element_at(toks, p)))))
    val targets = flatten(transform(positions, p =>
      when(sAt(p),
        concat(array(sentinel(p)),
          slice(toks, p, least(lit(spanLen), n - p + 1))))
        .otherwise(array().cast("array<string>"))))
    def joined(c: Column): Column =
      when(n === 0, lit("")).otherwise(array_join(c, " "))
    (gates, starts, startPos, joined(inputs), joined(targets))
  }

  /** Flesch reading ease (Flesch 1948) from three regex counts —
    * words (whitespace tokens), sentences (runs of [.!?]), syllables
    * (vowel-letter groups, the standard heuristic):
    *   206.835 − 1.015·(W/S) − 84.6·(Y/W)
    * with S and W floored at 1 so fragments don't divide by zero.
    * Returns a struct (n_words, n_sentences, n_syllables, flesch);
    * integer counts + one rounded double formula, so the score is
    * engine-exact. Pure per-row codegen compute — scan speed at any
    * corpus size.
    */
  def fleschScore(text: Column): Column = {
    val w = size(tokens(text)).cast("long")
    val s = size(regexp_extract_all(text, lit("[.!?]+"), lit(0))).cast("long")
    val y = size(regexp_extract_all(lower(text), lit("[aeiouy]+"), lit(0)))
      .cast("long")
    val w1 = greatest(w, lit(1L)).cast("double")
    val s1 = greatest(s, lit(1L)).cast("double")
    struct(w.as("n_words"), s.as("n_sentences"), y.as("n_syllables"),
      round(lit(206.835) - lit(1.015) * (w1 / s1)
        - lit(84.6) * (y.cast("double") / w1), 4).as("flesch"))
  }

  /** Punctuation character count. */
  def punctCount(text: Column): Column =
    length(text) - length(regexp_replace(text, "[.,;:!?]", ""))

  /** Composite quality score in [0,1]: length saturation × (0.7 + 0.3 ×
    * stopword presence). Mirrored exactly in the DuckDB oracle.
    */
  def qualityScore(text: Column): Column = qualityScoreOfTokens(tokens(text))

  /** `qualityScore` over an already-tokenized column. */
  def qualityScoreOfTokens(toks: Column): Column = {
    val nTok = size(toks).cast("double")
    val stopRatio = stopwordHits(toks, EnStopwords).cast("double") /
      greatest(nTok, lit(1.0))
    least(nTok / 100.0, lit(1.0)) * (lit(0.7) + lit(0.3) * stopRatio)
  }

  /** C4-style line keep predicate (Raffel et al. 2020 §2.2 heuristics):
    * a line survives when it ends in terminal punctuation, has at least
    * `minWords` words, and does not mention javascript (case-folded).
    */
  def c4KeepLine(line: Column, minWords: Int = 3): Column =
    trim(line).rlike("[.!?\"]$") &&
      size(split(trim(line), "\\s+")) >= minWords &&
      !lower(line).contains("javascript")

  /** C4-style page cleaning: drop boilerplate LINES (see `c4KeepLine`),
    * keep the survivors newline-joined. Pure per-row array pipeline —
    * no shuffle, runs at scan speed; pair with `c4PageOk` for the
    * page-level gate.
    */
  def c4CleanLines(text: Column, minWords: Int = 3): Column =
    array_join(filter(split(text, "\n"), l => c4KeepLine(l, minWords)), "\n")

  /** C4-style page-level gate: no lorem-ipsum placeholder text, no curly
    * brace (code leak), and at least `minLines` surviving lines (the
    * fixture-scale stand-in for C4's ≥5-sentence page rule).
    */
  def c4PageOk(text: Column, minLines: Int = 2, minWords: Int = 3): Column =
    !lower(text).contains("lorem ipsum") && !text.contains("{") &&
      size(filter(split(text, "\n"), l => c4KeepLine(l, minWords))) >= minLines

  /** HTML → visible text — the raw-crawl extraction step that feeds
    * every downstream text filter (the trafilatura/jusText role, reduced
    * to its deterministic core): drop `<script>`/`<style>` ELEMENTS with
    * their contents (their text is never page content), drop comments,
    * strip every remaining tag to a space (so `</p><p>` word-separates
    * rather than concatenates), decode the six entities that survive in
    * text-bearing HTML (`&lt; &gt; &quot; &#39; &nbsp; &amp;` — amp
    * LAST, the standard order that keeps `&amp;lt;` → `&lt;` literal),
    * then collapse whitespace. A pure regexp_replace chain over built-in
    * functions: whole-stage codegen, scan speed, zero shuffle; mirrored
    * 1:1 in the `q_html_extract` oracle. `(?is)` flags + non-greedy
    * bodies are shared Java-regex/RE2 syntax, so both engines execute
    * the identical pattern.
    */
  def extractHtmlText(html: Column): Column = {
    // balanced elements first, then an unterminated-tail fallback: a
    // truncated crawl page whose <script>/<style> never closes would
    // otherwise leak its whole JS/CSS body into the "text" (a </script>
    // inside a JS string still ends the element early — the documented
    // residual of regex-bounded extraction). The opening-tag pattern
    // `([^>]*[^/>])?>` refuses SELF-CLOSING tags (<script src="a"/> has
    // no body, so treating it as an opener would swallow real content up
    // to an unrelated close tag, or the whole page in the tail pass);
    // the generic tag strip below removes the self-closing tag itself.
    val noScript = regexp_replace(
      regexp_replace(html, "(?is)<script\\b([^>]*[^/>])?>.*?</script>", " "),
      "(?is)<script\\b([^>]*[^/>])?>.*$", " ")
    val noStyle = regexp_replace(
      regexp_replace(noScript, "(?is)<style\\b([^>]*[^/>])?>.*?</style>", " "),
      "(?is)<style\\b([^>]*[^/>])?>.*$", " ")
    val noComment = regexp_replace(noStyle, "(?s)<!--.*?-->", " ")
    val noTags = regexp_replace(noComment, "(?s)<[^>]*>", " ")
    val decoded = Seq("&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (ent, ch)) => replace(c, lit(ent), lit(ch)) }
    trim(regexp_replace(decoded, "\\s+", " "))
  }

  /** Character-level Shannon entropy in micro-nats (exact integer) —
    * the gibberish / filler detector. Native kernel; see
    * `expressions.CharEntropy` for semantics and quantization.
    */
  def charEntropyMicro(text: Column): Column =
    graft.expressions.CharEntropy.charEntropyF(text)

  /** Declarative spec for `charEntropyMicro` — O(distinct·len)
    * interpreted lambda evals; never use on the hot path. Splitting on
    * the empty regex leaves a trailing "" element (Java split with
    * limit -1), filtered out before counting.
    */
  def charEntropyMicroHof(text: Column): Column = {
    val chars = filter(split(text, ""), c => length(c) > 0)
    val n = size(chars).cast("double")
    when(size(chars) === 0, lit(0L))
      .otherwise(aggregate(
        transform(array_distinct(chars), g => {
          val k = size(filter(chars, x => x === g)).cast("double")
          floor(k / n * log(n / k) * lit(1000000.0) + lit(0.5)).cast("long")
        }),
        lit(0L), (acc, x) => acc + x))
  }

  /** Stopwords for the Gopher rules — a compact version of the "contains
    * at least 2 common English stopwords" list (Rae et al. 2021 §A1.1).
    */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with", "a", "in")

  /** Gopher-style document quality signals (Rae et al. 2021 §A1.1) as one
    * struct column: word count, mean word length, fraction of words
    * containing an alphabetic character, symbol-to-word ratio (`#` /
    * `...`), stopword occurrence count, and the composite `keep` flag
    * with the published bounds (50 ≤ words ≤ 100k, 3 ≤ mean length ≤ 10,
    * alpha fraction > 0.8, symbol ratio < 0.1, ≥ 2 stopword hits).
    * Ratios are quantized to 4 dp BEFORE the bound checks so borderline
    * docs gate identically across engines. Pure per-row codegen'd column
    * expressions over the whitespace tokenization — zero shuffle, scan
    * speed; the standard first-pass page filter a 100 TB crawl applies
    * before any pairwise work.
    */
  def gopherStats(text: Column): Column = {
    val toks = tokens(lower(text))
    val n = size(toks)
    val nd = n.cast("double")
    def r4(c: Column): Column = round(c, 4) + lit(0.0)
    val meanWlen = r4(aggregate(toks, lit(0L), (acc, t) => acc + length(t))
      .cast("double") / nd)
    val alphaFrac = r4(size(filter(toks, t => t.rlike("[a-z]"))).cast("double") / nd)
    val symRatio = r4(size(filter(toks,
      t => t.contains("#") || t.contains("..."))).cast("double") / nd)
    val stopHits = stopwordHits(toks, GopherStopwords)
    val keep = n.geq(50) && n.leq(100000) &&
      meanWlen.geq(3.0) && meanWlen.leq(10.0) &&
      alphaFrac.gt(0.8) && symRatio.lt(0.1) && stopHits.geq(2)
    when(n === 0,
      struct(lit(0L).as("n_words"), lit(0.0).as("mean_wlen"),
        lit(0.0).as("alpha_frac"), lit(0.0).as("sym_ratio"),
        lit(0L).as("stop_hits"), lit(false).as("keep")))
      .otherwise(struct(n.cast("long").as("n_words"), meanWlen.as("mean_wlen"),
        alphaFrac.as("alpha_frac"), symRatio.as("sym_ratio"),
        stopHits.cast("long").as("stop_hits"), keep.as("keep")))
  }
}
