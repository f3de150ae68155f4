package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis primitives for large-scale training-data pipelines:
  * tokenization, language-ID heuristic, quality scoring, document
  * fingerprinting. All are pure `org.apache.spark.sql.functions` column
  * expressions (whole-stage-codegen'd; no UDFs), built on arithmetic that
  * is reproducible in ANSI SQL — so every op has a DuckDB oracle.
  *
  * Hash discipline: polynomial hashes mod a 31-bit prime with small
  * multipliers keep every intermediate < 2^62, so they are exact under
  * Spark's default ANSI overflow checking and portable to any engine with
  * 64-bit integers. For scale-path speed, callers can swap `polyHash` for
  * `xxhash64` (not oracle-portable).
  */
object TextOps {

  /** Modulus for portable polynomial hashes (prime, < 2^31). */
  val P = 1000003L
  val B = 131L

  /** Whitespace tokens of trimmed text; empty text → empty array. */
  def tokens(text: Column): Column =
    when(length(trim(text)) === 0, array().cast("array<string>"))
      .otherwise(split(trim(text), "\\s+"))

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** Overlapping token-window chunks — the context-window packing step a
    * training pipeline runs between cleaning and tokenization: windows of
    * `win` whitespace tokens starting every `stride` tokens (stride < win
    * ⇒ overlap), the final window truncated at the document end. Returns
    * `array<struct<chunk_idx, n_chunk_tokens, chunk_text>>`; empty text →
    * empty array (no chunks, not one empty chunk).
    *
    * Scale shape: a pure per-row higher-order-function expression
    * (sequence → transform → slice) — whole-stage-codegen'd, zero shuffle,
    * zero UDF; exploding it is a narrow flatMap. Chunk boundaries depend
    * only on the row, so the op is partition- and scale-invariant. */
  def chunks(text: Column, win: Int, stride: Int): Column = {
    require(win > 0 && stride > 0, s"win=$win stride=$stride must be positive")
    val t = tokens(text)
    val n = size(t)
    val starts = when(n === 0, array().cast("array<int>"))
      .otherwise(sequence(lit(0), n - 1, lit(stride)))
    transform(starts, (s0, i) => struct(
      i.cast("long").as("chunk_idx"),
      least(lit(win), n - s0).cast("long").as("n_chunk_tokens"),
      array_join(slice(t, s0 + 1, lit(win)), " ").as("chunk_text")))
  }

  /** PII patterns — deliberately lookahead-free and built from character
    * classes only, so Java regex (Spark codegen) and RE2 (DuckDB) agree
    * match for match. Conservative by design: training-data pipelines
    * over-redact rather than leak. */
  val emailPattern: String = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+[.][A-Za-z0-9.-]*[A-Za-z]{2}"
  val phonePattern: String = "[+][0-9]{1,3}[- ][0-9]{3}[- ][0-9]{3,4}[- ][0-9]{3,4}"

  /** Redacted text: emails → <EMAIL>, then phones → <PHONE> (fixed order —
    * redaction must be deterministic, and an email can contain digits a
    * phone pattern might otherwise nibble). Pure codegen'd regexp_replace,
    * row-local, zero shuffle. */
  def piiRedact(text: Column): Column =
    regexp_replace(regexp_replace(text, emailPattern, "<EMAIL>"),
      phonePattern, "<PHONE>")

  /** (n_emails, n_phones) found by the same patterns — the audit counters
    * a redaction pass reports. */
  def piiCounts(text: Column): (Column, Column) =
    (coalesce(regexp_count(text, lit(emailPattern)), lit(0)).cast("long"),
      coalesce(regexp_count(text, lit(phonePattern)), lit(0)).cast("long"))

  /** GPT-2-flavored BPE pre-tokenizer pattern: contraction suffixes,
    * space-prefixed letter runs, digit runs, punctuation runs. Deliberately
    * lookahead-free so Java regex (Spark) and RE2 (DuckDB) agree match for
    * match — the whitespace-tail lookahead of the original GPT-2 pattern
    * is RE2-unsupported and only affects trailing-space tokens, which a
    * COUNT does not need. Whitespace is an EXPLICIT class, not `\s`:
    * Java's `\s` includes vertical tab (U+000B) while RE2's does not, so
    * `\s` would silently diverge the two engines on that one character. */
  val bpePattern: String =
    "'(?:s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^ \\t\\n\\x0B\\f\\r\\p{L}\\p{N}]+"

  /** BPE-ish token count (the subword-tokenizer-shaped complement of the
    * whitespace [[tokenCount]]): number of pre-tokenizer matches. */
  def tokenCountBpe(text: Column): Column =
    coalesce(regexp_count(text, lit(bpePattern)), lit(0)).cast("long")

  /** Portable polynomial string hash: fold codepoints with
    * acc = (acc*131 + code) mod P. Works on lambda variables (usable
    * inside nested higher-order functions).
    *
    * ASCII-only portability: Spark's `ascii()` and DuckDB's `unicode()`
    * agree on ASCII input but can diverge on multibyte characters — the
    * bit-for-bit oracle parity this hash exists for holds for ASCII
    * corpora (all driver fixtures). Normalize or strip non-ASCII before
    * hashing if that ever changes. For the production scale path use
    * [[fastHash]] (xxhash64) instead — ~10× cheaper, not SQL-portable. */
  def polyHash(s: Column): Column = graft.functions.PolyHash(s)

  /** The original pure-`functions` formulation of [[polyHash]] (split →
    * transform → aggregate). Identical results; kept as the equality oracle
    * for the native expression and as the no-custom-code fallback. The
    * native form is one codegen'd loop; this one allocates a per-character
    * array and evaluates three nested HOFs per string. */
  def polyHashHof(s: Column): Column =
    aggregate(
      transform(split(s, ""), ch => ascii(ch).cast("long")),
      lit(0L),
      (acc, code) => (acc * B + pmod(code, lit(P))) % P)

  /** Production-path string hash: xxhash64 folded into [0, P) so every
    * downstream minhash/band expression (built for < 2^62 arithmetic) works
    * unchanged. One codegen'd call per string — no per-character array like
    * [[polyHash]] (measured ~10× cheaper on 3-gram shingle workloads). NOT
    * reproducible in DuckDB; the oracle-gated queries keep polyHash. */
  def fastHash(s: Column): Column = pmod(xxhash64(s), lit(P))

  /** Document fingerprint: polynomial rolling hash of the normalized text
    * (lowercased, whitespace collapsed) — an order-sensitive exact-dup /
    * shift-detection key. */
  def fingerprint(text: Column): Column =
    polyHash(regexp_replace(lower(trim(text)), "\\s+", " "))

  /** Count of tokens that appear in a marker set. */
  def markerCount(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(markers))).cast("long")

  val enMarkers = Seq("the", "a", "of", "and", "is", "to", "in")
  val deMarkers = Seq("der", "die", "das", "und", "ist", "ein")
  val frMarkers = Seq("le", "la", "et", "les", "des", "un")
  val esMarkers = Seq("el", "los", "las", "y", "es", "un")

  /** n-gram language-ID heuristic: argmax of per-language stopword hits
    * over the token stream, ties broken in fixed order en>de>fr>es, with
    * 'und' (unknown) when nothing matches. Deliberately simple and exactly
    * reproducible in SQL. */
  def langId(text: Column): Column = {
    val t = tokens(text)
    val en = markerCount(t, enMarkers)
    val de = markerCount(t, deMarkers)
    val fr = markerCount(t, frMarkers)
    val es = markerCount(t, esMarkers)
    when(en === 0 && de === 0 && fr === 0 && es === 0, lit("und"))
      .when(en >= de && en >= fr && en >= es, lit("en"))
      .when(de >= fr && de >= es, lit("de"))
      .when(fr >= es, lit("fr"))
      .otherwise(lit("es"))
  }

  /** Heuristic quality score in [0,1]: blend of length band, mean word
    * length band, punctuation sparsity and stopword presence. Fixed
    * IEEE-754 evaluation order → bit-identical across engines. */
  def qualityScore(text: Column): Column = {
    val t = tokens(text)
    val nTok = size(t).cast("double")
    val chars = length(trim(text)).cast("double")
    val punct = (length(trim(text)) -
      length(regexp_replace(trim(text), "[^A-Za-z0-9\\s]", ""))).cast("double")
    val stop = markerCount(t, enMarkers).cast("double")
    val lenScore = when(nTok >= 20 && nTok <= 1000, lit(1.0))
      .when(nTok > 0, lit(0.5)).otherwise(lit(0.0))
    val wordLen = when(nTok > 0, chars / nTok).otherwise(lit(0.0))
    val wordScore = when(wordLen >= 3.0 && wordLen <= 12.0, lit(1.0)).otherwise(lit(0.5))
    val punctScore = when(chars > 0, lit(1.0) - punct / chars).otherwise(lit(0.0))
    val stopScore = when(nTok > 0, least(stop * lit(4.0) / nTok, lit(1.0))).otherwise(lit(0.0))
    lenScore * 0.3 + wordScore * 0.2 + punctScore * 0.3 + stopScore * 0.2
  }

  /** All n-token windows of a token array, WITHOUT de-duplication (the
    * repetition metrics need multiplicity; [[graft.dedup.Dedup.shingles]]
    * deliberately distincts). */
  def ngramsAll(toks: Column, n: Int): Column =
    when(size(toks) < n, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))

  /** Gopher-style repetition metrics (Rae et al. 2021 §A1.1, token-level —
    * the fixtures are single-line so the line-level variants are vacuous
    * here): fraction of token occurrences that are repeats of an earlier
    * token. 0 for empty docs. */
  def dupTokenFrac(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(t)).cast("double") / size(t).cast("double"))
  }

  /** Fraction of the token stream taken by the single most frequent token
    * (ties irrelevant — only the max count matters). Per-doc O(n·distinct),
    * bounded by document length — never a cross-document shuffle. */
  def topTokenFrac(text: Column): Column = {
    val t = tokens(text)
    val counts = transform(array_distinct(t),
      x => size(filter(t, y => y === x)).cast("long"))
    when(size(t) === 0, lit(0.0))
      .otherwise(array_max(counts).cast("double") / size(t).cast("double"))
  }

  /** Fraction of n-gram occurrences that are repeats (the duplicate-n-gram
    * character-fraction proxy at token granularity). */
  def dupNgramFrac(text: Column, n: Int): Column = {
    val g = ngramsAll(tokens(text), n)
    when(size(g) === 0, lit(0.0)).otherwise(
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g).cast("double"))
  }

  /** Gopher-style document-level curation rules (Rae et al. 2021 §A1.1),
    * composed into the single keep/drop decision a filtering pass makes.
    * Returns a fail-mask bitset — bit set ⇔ rule FAILED, 0 ⇔ keep:
    *
    *  - bit 0: token count outside [minTok, maxTok]
    *  - bit 1: no stopword marker present ([[enMarkers]])
    *  - bit 2: duplicate-token fraction above 1/2 (2·distinct < n)
    *  - bit 3: mean word length outside [4, 5] chars (4n ≤ alpha ≤ 5n)
    *
    * Every rule is an INTEGER comparison (counts and cross-multiplied
    * bounds, never a float ratio), so the mask is bit-identical across
    * engines and the DuckDB oracle replays it exactly. A mask, not a
    * boolean, because production curation wants per-rule attrition
    * accounting (which rule killed how many docs), not just the verdict.
    * Pure row-local codegen'd expressions: zero shuffle, zero UDF —
    * at 100 TB this is a map-only scan whose cost is the parquet read. */
  def curationFailMask(text: Column, minTok: Int = 20, maxTok: Int = 80): Column = {
    val t = tokens(text)
    val n = size(t).cast("long")
    val nd = size(array_distinct(t)).cast("long")
    val stop = markerCount(t, enMarkers)
    val alpha = length(regexp_replace(trim(text), "\\s", "")).cast("long")
    val lenFail = when(n >= minTok && n <= maxTok, lit(0L)).otherwise(lit(1L))
    val stopFail = when(stop >= 1, lit(0L)).otherwise(lit(2L))
    val dupFail = when(nd * 2 >= n, lit(0L)).otherwise(lit(4L))
    val wlFail = when(alpha >= n * 4 && alpha <= n * 5, lit(0L)).otherwise(lit(8L))
    lenFail + stopFail + dupFail + wlFail
  }

  /** Frozen LINEAR quality classifier (the DCLM/fastText-style
    * "classifier filtering" stage — the learned-model complement of
    * [[curationFailMask]]'s hard rules): an integer logit over the same
    * codegen'd row-local features, with weights trained offline and
    * frozen. Integer arithmetic end to end, so the DuckDB oracle replays
    * the logit exactly; like every scoring op here, application is a
    * map-only scan — zero shuffle, zero UDF at 100 TB. */
  def qualityLogit(text: Column): Column = {
    val t = tokens(text)
    val n = size(t).cast("long")
    val nd = size(array_distinct(t)).cast("long")
    val stop = markerCount(t, enMarkers).cast("long")
    val alpha = length(regexp_replace(trim(text), "\\s", "")).cast("long")
    lit(7L) * stop + lit(2L) * nd - lit(5L) * n + alpha
  }

  /** C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    * lines with at least `minWords` whitespace words that end in a
    * terminal period; everything else (navigation stubs, truncated
    * fragments, boilerplate shards) is excised and the survivors are
    * re-joined. Returns (n_lines, n_kept, clean_text).
    *
    * Row-local higher-order functions only (split → filter → array_join):
    * zero shuffle, whole-stage-codegen'd — the intra-document complement
    * of [[graft.dedup.Dedup]]'s corpus-level substring excision. */
  def lineFilter(text: Column, minWords: Int = 5): (Column, Column, Column) = {
    val lines = split(text, "\n")
    val kept = filter(lines, x =>
      size(split(trim(x), "\\s+")) >= minWords && endswith(x, lit(".")))
    (size(lines).cast("long"), size(kept).cast("long"), array_join(kept, "\n"))
  }
}
